"""Pallas fused-scan roofline sweep (VERDICT r4 weak #6).

v5e roofline for the 1M x 128 bf16 scan at B queries:
  * MXU: B * N * D * 2 FLOP @ ~197 TFLOP/s bf16
  * HBM: the [N, D] bf16 block streams once PER QUERY TILE (grid dim 0), so
    bytes = (B/qt) * N * D * 2 @ ~819 GB/s
At B=2048, qt=256 that is ~2.7 ms MXU / ~2.4 ms HBM — the measured 29 ms
(round 4) is ~10x off the light, i.e. the kernel is bound by neither: the
VPU epilogue (bias add + strided argmax + slot merge over [qt, blk] f32)
dominates. This sweep times (blk, qt, slots) x {bf16, int8} to find the
config that minimizes epilogue passes per streamed byte.

Usage: python tools/profile_pallas_sweep.py [N] [D] [B]
"""

import itertools
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qdrant_tpu.ops.pallas_scan import pallas_scan_topk  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    k = 10

    rng = np.random.default_rng(0)
    n_pad = (n + 16383) // 16384 * 16384
    q_np = rng.standard_normal((b, d), dtype=np.float32)

    # device-side datagen (host is 1 throttled vCPU)
    key = jax.random.PRNGKey(0)
    v32 = jax.random.normal(key, (n_pad, d), dtype=jnp.float32)
    v_bf = (2.0 * v32).astype(jnp.bfloat16)
    bias = -(v32 * v32).sum(axis=1)
    bias = jnp.where(jnp.arange(n_pad) < n, bias, np.float32(np.finfo(np.float32).min))
    v_i8 = jnp.clip(jnp.round(v32 / 0.03), -127, 127).astype(jnp.int8)
    q = jnp.asarray(q_np)
    q_i8 = jnp.asarray(np.clip(np.round(q_np / 0.03), -127, 127).astype(np.int8))
    jax.block_until_ready((v_bf, bias, v_i8))
    print(f"data ready: {n_pad}x{d}, B={b}", flush=True)

    def bench(fn, reps=5):
        jax.block_until_ready(fn())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    flop = b * n_pad * d * 2
    results = []
    for blk, qt, slots in itertools.product(
        (2048, 4096, 8192, 16384), (256, 512, 1024, 2048), (8, 16)
    ):
        if qt > b or n_pad % blk or b % qt:
            continue
        vmem_mb = (qt * slots * 128 * 8 + qt * blk * 4 + blk * d * 2) / 1e6
        if vmem_mb > 96:
            continue
        try:
            t = bench(
                lambda: pallas_scan_topk(
                    q, v_bf, bias, k, None, blk=blk, qt=qt, slots=slots
                )
            )
        except Exception as e:
            print(f"bf16 blk={blk} qt={qt} s={slots}: FAIL {type(e).__name__}", flush=True)
            continue
        hbm_gb = (b / qt) * n_pad * d * 2 / 1e9
        res = (
            f"bf16 blk={blk:5d} qt={qt:4d} s={slots:2d}: {t * 1e3:7.2f} ms "
            f"{b / t:9.0f} qps  mfu={flop / t / 197e12:5.1%} "
            f"hbm={hbm_gb / t / 819:5.1%}"
        )
        print(res, flush=True)
        results.append((t, res))

    for blk, qt in itertools.product((4096, 8192, 16384), (512, 1024, 2048)):
        if qt > b or n_pad % blk or b % qt:
            continue
        try:
            t = bench(
                lambda: pallas_scan_topk(
                    q_i8, v_i8, bias, k, jnp.float32(0.03 * 0.03),
                    blk=blk, qt=qt, slots=16, int8_mode=True,
                )
            )
        except Exception as e:
            print(f"int8 blk={blk} qt={qt}: FAIL {type(e).__name__}", flush=True)
            continue
        hbm_gb = (b / qt) * n_pad * d / 1e9
        res = (
            f"int8 blk={blk:5d} qt={qt:4d} s=16: {t * 1e3:7.2f} ms "
            f"{b / t:9.0f} qps  mfu={flop / t / 394e12:5.1%} "
            f"hbm={hbm_gb / t / 819:5.1%}"
        )
        print(res, flush=True)
        results.append((t, res))

    results.sort()
    print("\nbest:", results[0][1] if results else "none")


if __name__ == "__main__":
    main()
