"""Calibrate timing honesty through the axon tunnel.

If block_until_ready returns before execution, per-call times won't scale
with N. Cross-check three barriers (block_until_ready, device_get, float())
and a plain matmul of known cost.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from qdrant_tpu.ops.pallas_scan import pallas_scan_survivors

D, B = 128, 2048
print("device:", jax.devices()[0])


def timeit(fn, barrier, iters=4):
    jax.block_until_ready(fn())
    barrier(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
        barrier(out)
    return (time.perf_counter() - t0) / iters * 1e3


bar_block = lambda o: jax.block_until_ready(o)
bar_get = lambda o: jax.device_get(o[0] if isinstance(o, tuple) else o)

for N in (1_048_576, 4_194_304):
    v = jax.random.normal(jax.random.PRNGKey(0), (N, D), dtype=jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, D), dtype=jnp.float32)
    bias = jnp.zeros((N,), jnp.float32)
    jax.block_until_ready((v, q, bias))

    # plain matmul reference: 2*B*N*D flops, reads N*D*2 bytes
    mm = jax.jit(lambda q, v: (q.astype(jnp.bfloat16) @ v.T).max(axis=1))
    ms_b = timeit(lambda: mm(q, v), bar_block)
    ms_g = timeit(lambda: mm(q, v), bar_get)
    gb = N * D * 2 / 1e9
    fl = 2 * B * N * D / 1e12
    print(f"N={N}: matmul+rowmax block={ms_b:.2f}ms get={ms_g:.2f}ms "
          f"({gb:.2f} GB, {fl:.2f} TFLOP -> {fl/(ms_g/1e3):.0f} TFLOP/s)")

    for qt, blk, slots in ((256, 2048, 8), (256, 1024, 16)):
        fn = lambda: pallas_scan_survivors(
            q, v, bias, jnp.float32(1.0), blk=blk, qt=qt, slots=slots)
        ms_b = timeit(fn, bar_block)
        ms_g = timeit(fn, bar_get)
        print(f"N={N}: pallas qt={qt} blk={blk} s={slots} "
              f"block={ms_b:.2f}ms get={ms_g:.2f}ms")
