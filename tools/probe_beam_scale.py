"""Probe: where does the non-inline graph search spend time at N=4M?

The crossover bench child timed out (>44 min) inside the FIRST
hidx.search(b=2048, ef=64) at 4M x 128 (inline table disabled above
QDRANT_TPU_INLINE_MAX_BYTES -> beam_search_level on the f32 block).
This times each phase separately at configurable N/B/EF.

Usage: python tools/probe_beam_scale.py [N] [B] [EF]
"""

import faulthandler
import sys
import time

faulthandler.dump_traceback_later(180, repeat=True, file=sys.stderr)
sys.path.insert(0, ".")

import numpy as np  # noqa: E402

t0 = time.perf_counter()


def lap(msg):
    global t0
    t = time.perf_counter()
    print(f"[{t - t0:7.1f}s] {msg}", file=sys.stderr, flush=True)
    t0 = t


n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
b = int(sys.argv[2]) if len(sys.argv) > 2 else 256
ef = int(sys.argv[3]) if len(sys.argv) > 3 else 64

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qdrant_tpu.index.hnsw import HnswIndex  # noqa: E402
from qdrant_tpu.ops import hnsw as hnsw_ops  # noqa: E402
from qdrant_tpu.storage.vectors import DeviceVectorStore  # noqa: E402
from qdrant_tpu.types import Distance, HnswConfig  # noqa: E402

rng = np.random.default_rng(0)
d = 128
n_pad = (n + 4095) // 4096 * 4096
key = jax.random.PRNGKey(0)
vecs = jax.random.normal(key, (n_pad, d), dtype=jnp.float32)
jax.block_until_ready(vecs)
lap("datagen")

store = DeviceVectorStore(vecs, Distance.EUCLID, count=n)
hidx = HnswIndex(store, HnswConfig(), seed=7)
hidx.build(batch_size=4096)
lap("build")

q = rng.standard_normal((b, d)).astype(np.float32)

# phase 1: links0 device handle
l0 = hidx._links0_device()
jax.block_until_ready(l0)
lap("links0_device")
rk = hidx._rank_device()
jax.block_until_ready(rk)
lap("rank_device")

inline = hidx._inline_state()
lap(f"inline_state -> {'table' if inline else 'DISABLED'}")

q_dev = jnp.asarray(q)
vectors, _ = store.device_block()
entries = jnp.full((b,), hidx.entry, dtype=jnp.int32)
cur_scores = hnsw_ops.score_ids_batch(q_dev, vectors, entries[:, None], 1)[:, 0]
jax.block_until_ready(cur_scores)
lap("entry scores")

upper = hidx._upper_device()
if upper is not None:
    entries, cur_scores = hnsw_ops.greedy_descend_stack(
        q_dev, vectors, upper, rk, hidx._stack_counts(), entries, cur_scores, 1
    )
    jax.block_until_ready((entries, cur_scores))
lap("greedy descend")

bs, bi = hnsw_ops.beam_search_level(
    q_dev, vectors, l0, entries[:, None], None, ef, 2 * ef + 16, 1,
    compact_of=rk,
)
jax.block_until_ready((bs, bi))
lap(f"beam_search_level FIRST (b={b}, ef={ef})")

for i in range(3):
    bs, bi = hnsw_ops.beam_search_level(
        q_dev, vectors, l0, entries[:, None], None, ef, 2 * ef + 16, 1,
        compact_of=rk,
    )
    jax.block_until_ready((bs, bi))
    lap(f"beam_search_level rep{i}")

s, ids = hidx.search(q, k=10, ef=ef)
lap("hidx.search FIRST")
s, ids = hidx.search(q, k=10, ef=ef)
lap("hidx.search rep")
print("done", file=sys.stderr, flush=True)
