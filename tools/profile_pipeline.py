import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from qdrant_tpu.ops.scan import DEFAULT_BLOCK, scan_search_rescore

N, D, B = 1_000_000, 128, 1024
BLK = DEFAULT_BLOCK
rng = np.random.default_rng(0)
n_pad = (N + BLK - 1) // BLK * BLK
v = jnp.asarray(rng.standard_normal((n_pad, D), dtype=np.float32), dtype=jnp.bfloat16)
vf32 = v.astype(jnp.float32)
vsq = jnp.asarray(rng.standard_normal(n_pad).astype(np.float32))
mask = jnp.asarray(np.ones(n_pad, np.int8))
qs_host = [np.asarray(rng.standard_normal((B, D)), dtype=np.float32) for _ in range(8)]
qs_dev = [jnp.asarray(q) for q in qs_host]

def run(q):
    return scan_search_rescore(q, v, vsq, mask, vf32, BLK, 32, 10, True)

# warm
np.asarray(run(qs_dev[0])[1])

# 1) single sync call (device-resident queries)
ts = []
for _ in range(3):
    t0 = time.perf_counter(); np.asarray(run(qs_dev[0])[1]); ts.append(time.perf_counter()-t0)
t1 = min(ts)
print(f"single call sync          : {t1*1e3:8.2f} ms -> {B/t1:.0f} QPS")

# 2) pipelined depth-8, device-resident queries
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    outs = [run(q) for q in qs_dev]
    for o in outs: np.asarray(o[1])
    ts.append(time.perf_counter()-t0)
t8 = min(ts)
print(f"pipelined x8 (dev qs)     : {t8*1e3:8.2f} ms -> {8*B/t8:.0f} QPS")

# 3) pipelined depth-8 with per-batch host upload (realistic serving)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    outs = [run(jnp.asarray(q)) for q in qs_host]
    for o in outs: np.asarray(o[1])
    ts.append(time.perf_counter()-t0)
t8u = min(ts)
print(f"pipelined x8 (host upload): {t8u*1e3:8.2f} ms -> {8*B/t8u:.0f} QPS")

# 4) 10 trivial dispatches vs 1 (is dispatch blocking?)
triv = jax.jit(lambda x: x + 1.0)
x0 = jnp.float32(3.0)
np.asarray(triv(x0))
t0 = time.perf_counter(); np.asarray(triv(x0)); ta = time.perf_counter()-t0
t0 = time.perf_counter()
y = x0
for _ in range(10): y = triv(y)
np.asarray(y)
tb = time.perf_counter()-t0
print(f"1 trivial={ta*1e3:.2f} ms, 10 chained trivial={tb*1e3:.2f} ms")
