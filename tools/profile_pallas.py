"""Round-4 pallas scan profiling: fused scan(+rescore) marginal throughput.

profile_scan2 findings (this round): the XLA formulations are ALL bounded
at ~25 ms/batch by the [B, blk] f32 score block round-tripping HBM —
matmul-only [N,D] rows 25.4 ms, pre-transposed [D,N] 28.3 ms, one giant
matmul 25.1 ms (= 4.2 GB score write at ~167 GB/s). The pallas kernel
keeps scores in VMEM; this script measures it end-to-end (fused exact
rescore) and sweeps (blk, qt, slots), bf16 and int8.

Timings are PIPELINED MARGINAL (8 batches in flight) — single-call sync
pays a ~25 ms tunnel RTT that serving hides.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from qdrant_tpu.ops.pallas_scan import (
    pallas_scan_topk, pallas_scan_rescore, NEG_INF,
)

N, D, B = 1_000_000, 128, 1024
n_pad = (N + 8192 - 1) // 8192 * 8192

key = jax.random.PRNGKey(0)
@jax.jit
def gen(key):
    vf = jax.random.normal(key, (n_pad, D), dtype=jnp.float32)
    vsq = (vf * vf).sum(1)
    return vf, vf.astype(jnp.bfloat16), 2.0 * vf.astype(jnp.bfloat16), vsq
vf32, v_dot, v_eu, vsq = gen(key)
bias_eu = -vsq  # all rows valid
bias_dot = jnp.zeros_like(vsq)
qs = list(jax.random.normal(jax.random.PRNGKey(1), (8, B, D), dtype=jnp.float32))
jax.block_until_ready(qs[-1])

# int8 codes
sc = 3.6 / 127.0
ci8 = jnp.clip(jnp.round(vf32 / sc), -127, 127).astype(jnp.int8)
qs_i8 = [jnp.clip(jnp.round(q / sc), -127, 127).astype(jnp.int8) for q in qs]
jax.block_until_ready(qs_i8[-1])


def sync(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    np.asarray(leaf[:8, :8] if leaf.ndim == 2 else leaf)


def marginal(fn, tag, reps=3, args=None):
    a = args or qs
    try:
        sync(fn(a[0]))
    except Exception as e:
        print(f"{tag:40s}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
        return None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(q) for q in a]
        for o in outs:
            sync(o)
        ts.append(time.perf_counter() - t0)
    t = min(ts) / len(a) * 1e3
    print(f"{tag:40s}: {t:7.2f} ms/batch -> {B/t*1e3:7.0f} QPS", flush=True)
    return t


# ---- 1. current default params, candidates only (k=32) ----
marginal(lambda q: pallas_scan_topk(q, v_eu, bias_eu, 32),
         "topk32 blk4096 qt256 s16 (current)")

# ---- 2. fused rescore, euclid ----
marginal(lambda q: pallas_scan_rescore(q, q, v_eu, bias_eu, vf32, 32, 10,
                                       euclid=True),
         "fused rescore kf=32 (current params)")

# ---- 3. sweep ----
for blk, qt, slots in ((4096, 512, 16), (8192, 256, 16), (8192, 512, 8),
                       (2048, 512, 16), (4096, 1024, 8), (2048, 1024, 8),
                       (4096, 256, 8)):
    marginal(
        lambda q, b=blk, t=qt, s=slots: pallas_scan_rescore(
            q, q, v_eu, bias_eu, vf32, 32, 10, blk=b, qt=t, slots=s,
            euclid=True),
        f"fused rescore blk{blk} qt{qt} s{slots}")

# ---- 4. int8 fused rescore ----
s2 = jnp.float32(2.0 * sc * sc)
def i8_run(i, blk=4096, qt=256, slots=16):
    return pallas_scan_rescore(
        qs[i], qs_i8[i], ci8, bias_eu, vf32, 32, 10, scale_sq=s2,
        blk=blk, qt=qt, slots=slots, euclid=True, int8_mode=True)
marginal(lambda i: i8_run(i), "int8 fused rescore (current params)",
         args=list(range(8)))
for blk, qt, slots in ((8192, 512, 8), (4096, 512, 16), (8192, 256, 16)):
    marginal(lambda i, b=blk, t=qt, s=slots: i8_run(i, b, t, s),
             f"int8 fused rescore blk{blk} qt{qt} s{slots}",
             args=list(range(8)))
