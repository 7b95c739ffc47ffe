import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from qdrant_tpu.ops.scan import DEFAULT_BLOCK, scan_search_rescore
from qdrant_tpu.ops.pallas_scan import (
    pallas_scan_topk, pallas_scan_rescore, pad_for_pallas, DEFAULT_BLK, NEG_INF)

N, D, B = 1_000_000, 128, 1024
rng = np.random.default_rng(0)

def pipelined(fn, qs, reps=3):
    np.asarray(jax.tree_util.tree_leaves(fn(qs[0]))[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(q) for q in qs]
        for o in outs: np.asarray(jax.tree_util.tree_leaves(o)[0])
        ts.append(time.perf_counter()-t0)
    t = min(ts)
    return t / len(qs) * 1e3

qs_dev = [jnp.asarray(np.asarray(rng.standard_normal((B, D)), dtype=np.float32)) for _ in range(8)]

# XLA path
n_pad = (N + DEFAULT_BLOCK - 1) // DEFAULT_BLOCK * DEFAULT_BLOCK
vh = rng.standard_normal((n_pad, D), dtype=np.float32)
v = jnp.asarray(vh, dtype=jnp.bfloat16)
vf32 = jnp.asarray(vh)
vsq = jnp.asarray((vh*vh).sum(1).astype(np.float32))
mask = jnp.asarray(np.ones(n_pad, np.int8))
t = pipelined(lambda q: scan_search_rescore(q, v, vsq, mask, vf32, DEFAULT_BLOCK, 32, 10, True), qs_dev)
print(f"XLA scan+rescore marginal    : {t:7.2f} ms/batch -> {B/t*1e3:7.0f} QPS")

# Pallas path (euclid: v pre-scaled by 2, bias = -||v||^2)
np_pal = pad_for_pallas(n_pad)
v2 = jnp.asarray(2.0*vh, dtype=jnp.bfloat16)
bias = jnp.asarray((-(vh*vh).sum(1)).astype(np.float32))
t = pipelined(lambda q: pallas_scan_topk(q, v2, bias, 32), qs_dev)
print(f"Pallas scan_topk marginal    : {t:7.2f} ms/batch -> {B/t*1e3:7.0f} QPS")
t = pipelined(lambda q: pallas_scan_rescore(q, q, v2, bias, vf32, 32, 10, euclid=True), qs_dev)
print(f"Pallas scan+rescore marginal : {t:7.2f} ms/batch -> {B/t*1e3:7.0f} QPS")
# blk sweep
for blk in (2048, 4096, 8192):
    try:
        t = pipelined(lambda q: pallas_scan_rescore(q, q, v2, bias, vf32, 32, 10, blk=blk, euclid=True), qs_dev)
        print(f"  blk={blk:5d}                 : {t:7.2f} ms/batch -> {B/t*1e3:7.0f} QPS")
    except Exception as e:
        print(f"  blk={blk}: {type(e).__name__} {str(e)[:80]}")
# qt sweep
for qt in (128, 256, 512):
    try:
        t = pipelined(lambda q: pallas_scan_rescore(q, q, v2, bias, vf32, 32, 10, qt=qt, euclid=True), qs_dev)
        print(f"  qt={qt:5d}                  : {t:7.2f} ms/batch -> {B/t*1e3:7.0f} QPS")
    except Exception as e:
        print(f"  qt={qt}: {type(e).__name__} {str(e)[:80]}")
