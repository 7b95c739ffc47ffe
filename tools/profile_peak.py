"""Measure this chip's actual MXU peak + HBM bandwidth (pipelined)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

key = jax.random.PRNGKey(0)
a = jax.random.normal(key, (8192, 8192), dtype=jnp.bfloat16)
b = jax.random.normal(key, (8192, 8192), dtype=jnp.bfloat16)
ai = (a * 16).astype(jnp.int8)
bi = (b * 16).astype(jnp.int8)
big = jax.random.normal(key, (8192, 16384), dtype=jnp.float32)  # 512 MB

@jax.jit
def mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

@jax.jit
def mm_i8(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

@jax.jit
def rsum(x):
    return x.sum()

def timeit(fn, args, reps=10, tag="", flops=None, bytes_=None):
    o = fn(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(outs[-1])
    t = (time.perf_counter() - t0) / reps
    msg = f"{tag:28s}: {t*1e3:8.2f} ms"
    if flops: msg += f"  -> {flops/t/1e12:6.1f} TFLOP/s"
    if bytes_: msg += f"  -> {bytes_/t/1e9:6.1f} GB/s"
    print(msg, flush=True)

F = 2 * 8192**3
timeit(mm, (a, b), tag="bf16 8k^3 matmul", flops=F)
timeit(mm_i8, (ai, bi), tag="int8 8k^3 matmul", flops=F)
timeit(rsum, (big,), tag="f32 512MB reduce", bytes_=512 * 2**20)
