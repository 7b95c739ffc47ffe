import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from qdrant_tpu.ops.scan import DEFAULT_BLOCK, scan_search, scan_search_rescore

N, D, B = 1_000_000, 128, 1024
BLK = DEFAULT_BLOCK
rng = np.random.default_rng(0)
n_pad = (N + BLK - 1) // BLK * BLK

v = jnp.asarray(rng.standard_normal((n_pad, D), dtype=np.float32), dtype=jnp.bfloat16)
vf32 = v.astype(jnp.float32)
vsq = jnp.asarray(rng.standard_normal(n_pad).astype(np.float32))
mask = jnp.asarray(np.ones(n_pad, np.int8))
q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))

def sync_time(fn, reps=5):
    np.asarray(jax.tree_util.tree_leaves(fn())[0])  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3

trivial = jax.jit(lambda x: x + 1.0)
x0 = jnp.float32(3.0)
print(f"trivial jit + download   : {sync_time(lambda: trivial(x0)):8.2f} ms")

@jax.jit
def mm_only(q, v):
    qb = q.astype(jnp.bfloat16)
    nb = v.shape[0] // BLK
    vb = v.reshape(nb, BLK, v.shape[1])
    def body(c, vblk):
        s = jax.lax.dot_general(qb, vblk, (((1,),(1,)),((),())), preferred_element_type=jnp.float32)
        return c + s[:, :1].sum(), None
    tot, _ = jax.lax.scan(body, jnp.float32(0), vb, unroll=4)
    return tot

print(f"matmul scan + download   : {sync_time(lambda: mm_only(q, v)):8.2f} ms")
print(f"scan_search + download   : {sync_time(lambda: scan_search(q, v, vsq, mask, BLK, 10)):8.2f} ms")
print(f"scan+rescore + download  : {sync_time(lambda: scan_search_rescore(q, v, vsq, mask, vf32, BLK, 32, 10, True)):8.2f} ms")
# upload cost: fresh queries each call (like the product path does)
qh = np.asarray(q)
def with_upload():
    return scan_search_rescore(jnp.asarray(qh), v, vsq, mask, vf32, BLK, 32, 10, True)
print(f"upload+scan+rescore+down : {sync_time(with_upload):8.2f} ms")
