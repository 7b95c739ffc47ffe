"""Where-the-time-goes breakdown of the dense scan serving path.

VERDICT r3 #4: 49.4 ms per 1,024-query batch at 1M x 128 vs ~1.3 ms of
matmul — ~97% of the serving path is non-matmul overhead. This script
times each phase of the compiled program in isolation on the real chip:

  A. matmul only (scan over blocks, no epilogue)
  B. + mask + group max (no argmax)
  C. + argmax (the full scan body)
  D. full scan_search (stack carry + moveaxis + lax.top_k)
  E. scan_search_rescore (fused rescore tail)
  F. PlainIndex.search end-to-end (host padding + download)

plus reduction-tail variants (approx_max_k, iterative max, second-stage
group reduce) to pick the fastest exact-enough top-k.

Usage: python tools/profile_scan.py [N] [D] [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D = int(sys.argv[2]) if len(sys.argv) > 2 else 128
B = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

import jax
import jax.numpy as jnp
import functools

from qdrant_tpu.ops.scan import DEFAULT_BLOCK, SCAN_UNROLL, LANES, scan_search, scan_search_rescore

BLK = DEFAULT_BLOCK


def timeit(fn, reps=5):
    r = fn()
    jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    n_pad = (N + BLK - 1) // BLK * BLK
    nb = n_pad // BLK
    g = BLK // LANES
    print(f"N={N} (pad {n_pad}, {nb} blocks) D={D} B={B} blk={BLK}")

    v = jnp.asarray(rng.standard_normal((n_pad, D), dtype=np.float32), dtype=jnp.bfloat16)
    vsq = jnp.asarray(rng.standard_normal(n_pad).astype(np.float32))
    mask = jnp.asarray(np.ones(n_pad, np.int8))
    q = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))
    qb = q.astype(jnp.bfloat16)
    v_blocks = v.reshape(nb, BLK, D)
    vsq_b = vsq.reshape(nb, BLK)
    mask_b = mask.reshape(nb, BLK)

    # ---- A: matmul only ------------------------------------------------
    @jax.jit
    def mm_only(qb, v_blocks):
        def body(carry, vblk):
            s = jax.lax.dot_general(qb, vblk, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return carry + s[:, :1].sum(), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), v_blocks, unroll=SCAN_UNROLL)
        return tot

    print(f"A matmul only           : {timeit(lambda: mm_only(qb, v_blocks)):8.2f} ms")

    # ---- B: + mask + group max ----------------------------------------
    @jax.jit
    def mm_max(qb, v_blocks, vsq_b, mask_b):
        def body(carry, inp):
            vblk, vsqb, mb = inp
            s = 2.0 * jax.lax.dot_general(qb, vblk, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32) - vsqb[None, :]
            s = jnp.where(mb[None, :] != 0, s, -jnp.inf)
            s3 = s.reshape(B, g, LANES)
            return carry, jnp.max(s3, axis=1)
        _, ms = jax.lax.scan(body, None, (v_blocks, vsq_b, mask_b), unroll=SCAN_UNROLL)
        return ms

    print(f"B + mask + group max    : {timeit(lambda: mm_max(qb, v_blocks, vsq_b, mask_b)):8.2f} ms")

    # ---- C: + argmax (current scan body) -------------------------------
    @jax.jit
    def mm_max_arg(qb, v_blocks, vsq_b, mask_b):
        def body(carry, inp):
            vblk, vsqb, mb = inp
            s = 2.0 * jax.lax.dot_general(qb, vblk, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32) - vsqb[None, :]
            s = jnp.where(mb[None, :] != 0, s, -jnp.inf)
            s3 = s.reshape(B, g, LANES)
            return carry, (jnp.max(s3, axis=1), jnp.argmax(s3, axis=1).astype(jnp.int32))
        _, out = jax.lax.scan(body, None, (v_blocks, vsq_b, mask_b), unroll=SCAN_UNROLL)
        return out

    print(f"C + argmax              : {timeit(lambda: mm_max_arg(qb, v_blocks, vsq_b, mask_b)):8.2f} ms")

    # ---- D: full scan_search -------------------------------------------
    print(f"D scan_search (top_k)   : {timeit(lambda: scan_search(q, v, vsq, mask, BLK, 10)):8.2f} ms")

    # ---- E: fused scan + rescore ----------------------------------------
    vf32 = v.astype(jnp.float32)
    print(f"E scan_search_rescore   : {timeit(lambda: scan_search_rescore(q, v, vsq, mask, vf32, BLK, 32, 10, True)):8.2f} ms")

    # ---- tail variants: what does the [B, nb*128] -> [B, k] tail cost? --
    ms_, ams_ = mm_max_arg(qb, v_blocks, vsq_b, mask_b)
    jax.block_until_ready((ms_, ams_))

    @jax.jit
    def tail_topk(ms, ams):
        lane = jnp.arange(LANES, dtype=jnp.int32)
        ids = (jnp.arange(nb, dtype=jnp.int32)[:, None, None] * BLK + ams * LANES + lane[None, None, :])
        flat_s = jnp.moveaxis(ms, 0, 1).reshape(B, -1)
        flat_i = jnp.moveaxis(ids, 0, 1).reshape(B, -1)
        top_s, ti = jax.lax.top_k(flat_s, 10)
        return top_s, jnp.take_along_axis(flat_i, ti, axis=1)

    print(f"  tail lax.top_k        : {timeit(lambda: tail_topk(ms_, ams_)):8.2f} ms")

    @jax.jit
    def tail_approx(ms, ams):
        lane = jnp.arange(LANES, dtype=jnp.int32)
        ids = (jnp.arange(nb, dtype=jnp.int32)[:, None, None] * BLK + ams * LANES + lane[None, None, :])
        flat_s = jnp.moveaxis(ms, 0, 1).reshape(B, -1)
        flat_i = jnp.moveaxis(ids, 0, 1).reshape(B, -1)
        top_s, ti = jax.lax.approx_max_k(flat_s, 10)
        return top_s, jnp.take_along_axis(flat_i, ti.astype(jnp.int32), axis=1)

    print(f"  tail approx_max_k     : {timeit(lambda: tail_approx(ms_, ams_)):8.2f} ms")

    @jax.jit
    def tail_iter(ms, ams):
        lane = jnp.arange(LANES, dtype=jnp.int32)
        ids = (jnp.arange(nb, dtype=jnp.int32)[:, None, None] * BLK + ams * LANES + lane[None, None, :])
        flat_s = jnp.moveaxis(ms, 0, 1).reshape(B, -1)
        flat_i = jnp.moveaxis(ids, 0, 1).reshape(B, -1)
        def one(carry, _):
            s, = carry
            m = jnp.max(s, axis=1)
            am = jnp.argmax(s, axis=1)
            s = s.at[jnp.arange(B), am].set(-jnp.inf)
            return (s,), (m, am)
        (_,), (tops, topi) = jax.lax.scan(one, (flat_s,), None, length=10)
        top_i = jnp.take_along_axis(flat_i, topi.T.astype(jnp.int32), axis=1)
        return tops.T, top_i

    print(f"  tail iterative argmax : {timeit(lambda: tail_iter(ms_, ams_)):8.2f} ms")

    # ---- F: end-to-end PlainIndex --------------------------------------
    from qdrant_tpu.storage.vectors import DenseVectorStore
    from qdrant_tpu.index.plain import PlainIndex
    from qdrant_tpu.types import Distance

    data = np.asarray(rng.standard_normal((N, D)), dtype=np.float32)
    store = DenseVectorStore(D, Distance.EUCLID)
    store.add(data)
    store.scan_index(); store.device_block()
    idx = PlainIndex(store)
    qh = np.asarray(q)
    t = timeit(lambda: idx.search(qh, k=10), reps=5)
    print(f"F PlainIndex.search e2e : {t:8.2f} ms  ({B / t * 1e3:.0f} QPS)")


if __name__ == "__main__":
    main()
