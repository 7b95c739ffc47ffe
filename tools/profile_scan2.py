"""Round-4 dense-scan kernel experiments: find the true floor at 1M x 128.

Findings so far (profile_phases.py): matmul-only with the current [N, D]
row-major layout costs 26.5 ms/batch at B=1024 (9.9 TFLOP/s vs ~41 peak) —
the epilogue is NOT the bottleneck; the matmul layout is. Hypothesis: the
rhs [blk, D] with D minor forces a per-block relayout into MXU [D, blk]
tiles every batch. Pre-transposing V to [D, N] once should eliminate it.

All timings are PIPELINED MARGINAL times (8 batches in flight, sync via a
tiny [8,8] slice download) — single-call sync here pays a ~25 ms tunnel RTT
that a serving pipeline hides.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import numpy as np
import jax, jax.numpy as jnp

N, D, B = 1_000_000, 128, 1024
BLK = 8192
LANES = 128
rng = np.random.default_rng(0)
n_pad = (N + BLK - 1) // BLK * BLK
nb = n_pad // BLK
g = BLK // LANES

# ALL test data generated ON DEVICE — uploading 1M x 128 through the axon
# tunnel costs minutes; jax.random on-chip is instant
key = jax.random.PRNGKey(0)
@jax.jit
def gen(key):
    vf = jax.random.normal(key, (n_pad, D), dtype=jnp.float32)
    return (vf.astype(jnp.bfloat16), vf.T.astype(jnp.bfloat16),
            (vf * vf).sum(1), vf)
v, vT, vsq, vf32 = gen(key)
mask = jnp.ones(n_pad, jnp.int8)
qs = list(jax.random.normal(jax.random.PRNGKey(1), (8, B, D), dtype=jnp.float32))
jax.block_until_ready(qs[-1])


def sync(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    np.asarray(leaf[:8, :8] if leaf.ndim == 2 else leaf)


def marginal(fn, reps=3, tag=""):
    sync(fn(qs[0]))  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(q) for q in qs]
        for o in outs:
            sync(o)
        ts.append(time.perf_counter() - t0)
    t = min(ts) / len(qs) * 1e3
    print(f"{tag:34s}: {t:7.2f} ms/batch -> {B/t*1e3:7.0f} QPS", flush=True)
    return t


# ---- A. matmul only, current layout (baseline) --------------------------
v_blocks = v.reshape(nb, BLK, D)

@jax.jit
def mm_rows(q):
    qb = q.astype(jnp.bfloat16)
    def body(c, vblk):
        s = jax.lax.dot_general(qb, vblk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return c + s[:, :1], None
    tot, _ = jax.lax.scan(body, jnp.zeros((B, 1), jnp.float32), v_blocks, unroll=4)
    return tot

marginal(mm_rows, tag="A matmul [N,D] rows (baseline)")

# ---- B. matmul only, pre-transposed [D, N] ------------------------------
vT_blocks = vT.reshape(D, nb, BLK).transpose(1, 0, 2)  # [nb, D, BLK]

@jax.jit
def mm_T(q):
    qb = q.astype(jnp.bfloat16)
    def body(c, vblk):  # vblk [D, BLK]
        s = jax.lax.dot_general(qb, vblk, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return c + s[:, :1], None
    tot, _ = jax.lax.scan(body, jnp.zeros((B, 1), jnp.float32), vT_blocks, unroll=4)
    return tot

marginal(mm_T, tag="B matmul [D,N] transposed")

# ---- C. one giant matmul q @ vT (no scan) --------------------------------
@jax.jit
def mm_giant(q):
    qb = q.astype(jnp.bfloat16)
    s = jax.lax.dot_general(qb, vT, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return s[:, :1]

marginal(mm_giant, tag="C one giant matmul q@vT")

# ---- D. transposed matmul + fused group-max epilogue ---------------------
vsq_b = vsq.reshape(nb, g, LANES)
mask_b = mask.reshape(nb, g, LANES)

@jax.jit
def scanT_max(q):
    qb = q.astype(jnp.bfloat16)
    def body(c, inp):
        vblk, vsq3, m3 = inp
        s = 2.0 * jax.lax.dot_general(qb, vblk, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        s3 = s.reshape(B, g, LANES) - vsq3[None]
        s3 = jnp.where(m3[None] != 0, s3, -jnp.inf)
        return c, (jnp.max(s3, axis=1), jnp.argmax(s3, axis=1).astype(jnp.int32))
    _, out = jax.lax.scan(body, None, (vT_blocks, vsq_b, mask_b), unroll=4)
    return out

marginal(scanT_max, tag="D transposed + max/argmax")

# ---- E. full scan_search semantics, transposed --------------------------
@functools.partial(jax.jit, static_argnames=("k",))
def scanT_full(q, k=32):
    ms, ams = scanT_max(q)
    lane = jnp.arange(LANES, dtype=jnp.int32)
    ids = (jnp.arange(nb, dtype=jnp.int32)[:, None, None] * BLK
           + ams * LANES + lane[None, None, :])
    flat_s = jnp.moveaxis(ms, 0, 1).reshape(B, -1)
    flat_i = jnp.moveaxis(ids, 0, 1).reshape(B, -1)
    top_s, ti = jax.lax.top_k(flat_s, k)
    return top_s, jnp.take_along_axis(flat_i, ti, axis=1)

marginal(scanT_full, tag="E transposed full+topk32")

# ---- F. reference: current scan_search ----------------------------------
from qdrant_tpu.ops.scan import scan_search, scan_search_rescore
marginal(lambda q: scan_search(q, v, vsq, mask, BLK, 32),
         tag="F current scan_search k=32")

# ---- G. current fused scan+rescore (the product path) -------------------
marginal(lambda q: scan_search_rescore(q, v, vsq, mask, vf32, BLK, 32, 10, True),
         tag="G current scan+rescore")

# ---- H. int8 transposed matmul ------------------------------------------
ci8T = jnp.clip(jnp.round(vT.astype(jnp.float32) * 32), -127, 127).astype(jnp.int8)
ci8T_blocks = ci8T.reshape(D, nb, BLK).transpose(1, 0, 2)

@jax.jit
def mmT_i8(q):
    qi = jnp.clip(jnp.round(q * 32), -127, 127).astype(jnp.int8)
    def body(c, vblk):
        s = jax.lax.dot_general(qi, vblk, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return c + s[:, :1], None
    tot, _ = jax.lax.scan(body, jnp.zeros((B, 1), jnp.int32), ci8T_blocks, unroll=4)
    return tot

marginal(mmT_i8, tag="H int8 transposed matmul")

# ---- I. batch scaling with the best variant ------------------------------
for bb in (2048, 4096):
    qs_big = [jnp.concatenate([q] * (bb // B), axis=0) for q in qs[:4]]
    def fn(q):
        qb = q.astype(jnp.bfloat16)
        def body(c, inp):
            vblk, vsq3, m3 = inp
            s = 2.0 * jax.lax.dot_general(qb, vblk, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
            s3 = s.reshape(bb, g, LANES) - vsq3[None]
            s3 = jnp.where(m3[None] != 0, s3, -jnp.inf)
            return c, (jnp.max(s3, axis=1), jnp.argmax(s3, axis=1).astype(jnp.int32))
        _, out = jax.lax.scan(body, None, (vT_blocks, vsq_b, mask_b), unroll=4)
        return out
    fnj = jax.jit(fn)
    sync(fnj(qs_big[0]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fnj(q) for q in qs_big]
        for o in outs:
            sync(o)
        ts.append(time.perf_counter() - t0)
    t = min(ts) / len(qs_big) * 1e3
    print(f"I transposed+max B={bb:5d}           : {t:7.2f} ms/batch -> {bb/t*1e3:7.0f} QPS", flush=True)
