"""Honest (post-barrier) build-knob A/B: expand / batch / efc at N x D.

All round-4 build microbenchmarks were DISPATCH-timed (async jit); with
build() now blocking, this re-measures the real per-point cost. The beam
body's quadratic dedup work scales as iters * (expand*m0)^2 ~ efc *
expand * m0^2 — LINEAR in expand — so the r4 'expand=8 beats 4' result
may invert under honest timing.

Usage: python tools/profile_build_knobs.py [N] [D] [expand,expand,...]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/qdrant_tpu_jax_cache")

from qdrant_tpu.storage.vectors import DeviceVectorStore  # noqa: E402
from qdrant_tpu.types import Distance, HnswConfig  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 1536
    expands = (
        [int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3 else [8, 4]
    )
    n_pad = (n + 4095) // 4096 * 4096
    key = jax.random.PRNGKey(0)
    vecs = jax.random.normal(key, (n_pad, d), dtype=jnp.float32)
    jax.block_until_ready(vecs)
    print(f"data {n}x{d} ready", file=sys.stderr, flush=True)

    from qdrant_tpu.index.hnsw import HnswIndex

    # shared truth for recall checks (blockwise exact dot)
    rng = np.random.default_rng(1)
    nq = 256
    q = np.asarray(vecs[:nq]) + 0.05 * rng.standard_normal(
        (nq, d)
    ).astype(np.float32)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import importlib

    bench = importlib.import_module("bench")
    mask = jnp.arange(n_pad) < n
    truth = bench.device_truth_ids(q, vecs, 10, mask)
    print("truth ready", file=sys.stderr, flush=True)

    for e in expands:
        os.environ["QDRANT_TPU_BUILD_EXPAND"] = str(e)
        store = DeviceVectorStore(vecs, Distance.DOT, count=n)
        hidx = HnswIndex(store, HnswConfig(), seed=7)
        t0 = time.perf_counter()
        hidx.build(batch_size=4096)
        dt = time.perf_counter() - t0
        _, ids = hidx.search(q, k=10, ef=128)
        rec = bench.recall(ids, truth)
        print(
            f"expand={e}: build {dt:.1f}s ({dt / n * 1e6:.0f} us/pt) "
            f"recall@10(ef=128)={rec:.4f}",
            file=sys.stderr, flush=True,
        )
        del hidx, store


if __name__ == "__main__":
    main()
