import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from qdrant_tpu.ops.scan import DEFAULT_BLOCK, SCAN_UNROLL, LANES, scan_search

N, D, B = 1_000_000, 128, 1024
BLK = DEFAULT_BLOCK
rng = np.random.default_rng(0)
n_pad = (N + BLK - 1) // BLK * BLK
nb = n_pad // BLK
g = BLK // LANES
vh = rng.standard_normal((n_pad, D), dtype=np.float32)
v = jnp.asarray(vh, dtype=jnp.bfloat16)
vsq = jnp.asarray((vh*vh).sum(1).astype(np.float32))
mask = jnp.asarray(np.ones(n_pad, np.int8))
v_blocks = v.reshape(nb, BLK, D)
vsq_b = vsq.reshape(nb, BLK)
mask_b = mask.reshape(nb, BLK)
qs = [jnp.asarray(np.asarray(rng.standard_normal((B, D)), dtype=np.float32)) for _ in range(8)]

def pipelined(fn, reps=3):
    np.asarray(jax.tree_util.tree_leaves(fn(qs[0]))[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(q) for q in qs]
        for o in outs: np.asarray(jax.tree_util.tree_leaves(o)[0])
        ts.append(time.perf_counter()-t0)
    return min(ts) / len(qs) * 1e3

@jax.jit
def mm_only(q):
    qb = q.astype(jnp.bfloat16)
    def body(c, vblk):
        s = jax.lax.dot_general(qb, vblk, (((1,),(1,)),((),())), preferred_element_type=jnp.float32)
        return c + s[:, :1].sum(), None
    tot, _ = jax.lax.scan(body, jnp.float32(0), v_blocks, unroll=SCAN_UNROLL)
    return tot
print(f"A matmul only   : {pipelined(mm_only):7.2f} ms/batch")

@jax.jit
def mm_only_bf16out(q):
    qb = q.astype(jnp.bfloat16)
    def body(c, vblk):
        s = jax.lax.dot_general(qb, vblk, (((1,),(1,)),((),())), preferred_element_type=jnp.bfloat16)
        return c + s[:, :1].sum().astype(jnp.float32), None
    tot, _ = jax.lax.scan(body, jnp.float32(0), v_blocks, unroll=SCAN_UNROLL)
    return tot
print(f"A2 matmul bf16out: {pipelined(mm_only_bf16out):7.2f} ms/batch")

@jax.jit
def mm_max(q):
    qb = q.astype(jnp.bfloat16)
    def body(c, inp):
        vblk, vsqb, mb = inp
        s = 2.0*jax.lax.dot_general(qb, vblk, (((1,),(1,)),((),())), preferred_element_type=jnp.float32) - vsqb[None,:]
        s = jnp.where(mb[None,:] != 0, s, -jnp.inf)
        return c, jnp.max(s.reshape(B, g, LANES), axis=1)
    _, ms = jax.lax.scan(body, None, (v_blocks, vsq_b, mask_b), unroll=SCAN_UNROLL)
    return ms
print(f"B +mask+groupmax: {pipelined(mm_max):7.2f} ms/batch")

@jax.jit
def mm_max_arg(q):
    qb = q.astype(jnp.bfloat16)
    def body(c, inp):
        vblk, vsqb, mb = inp
        s = 2.0*jax.lax.dot_general(qb, vblk, (((1,),(1,)),((),())), preferred_element_type=jnp.float32) - vsqb[None,:]
        s = jnp.where(mb[None,:] != 0, s, -jnp.inf)
        s3 = s.reshape(B, g, LANES)
        return c, (jnp.max(s3, axis=1), jnp.argmax(s3, axis=1).astype(jnp.int32))
    _, out = jax.lax.scan(body, None, (v_blocks, vsq_b, mask_b), unroll=SCAN_UNROLL)
    return out
print(f"C +argmax       : {pipelined(mm_max_arg):7.2f} ms/batch")
print(f"D scan_search   : {pipelined(lambda q: scan_search(q, v, vsq, mask, BLK, 10)):7.2f} ms/batch")

# smaller batch sweep: is it batch-linear?
for bb in (256, 512):
    qs_s = [q[:bb] for q in qs]
    def f(q): return scan_search(q, v, vsq, mask, BLK, 10)
    np.asarray(f(qs_s[0])[0])
    ts=[]
    for _ in range(3):
        t0=time.perf_counter()
        outs=[f(q) for q in qs_s]
        for o in outs: np.asarray(o[0])
        ts.append(time.perf_counter()-t0)
    t=min(ts)/len(qs_s)*1e3
    print(f"D scan_search B={bb}: {t:7.2f} ms/batch -> {bb/t*1e3:7.0f} QPS")
