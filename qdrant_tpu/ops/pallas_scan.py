"""Pallas fused full-scan kernel: MXU scoring + in-VMEM running top-k.

The XLA `lax.scan` formulation (ops/scan.py) tops out ~30k QPS at 1M x 128
because each step's lane-group winners are stacked to HBM ([nb, B, 128] ~
128 MB) and a 16k-wide `top_k` sort runs at the end. This kernel keeps the
whole reduction on-chip (reference hot path being replaced:
lib/segment/src/vector_storage/raw_scorer.rs:39 `score_points` +
plain_vector_index full scan):

  * grid (query-tile, vector-block); vector blocks stream HBM->VMEM through
    the Pallas pipeline (double-buffered automatically),
  * per block: one bf16 (or int8) MXU matmul -> [QT, BLK] f32 scores that
    never leave VMEM; the entire scoring epilogue is ONE fused bias add
    (euclid pre-scales vectors by 2 at upload so the matmul yields 2*q.v,
    and bias = -||v||^2 + deleted-mask NEG_INF),
  * strided lane-group reduction [QT, G, 128] -> max over G keeps one
    survivor per 128-row group (same trade as ops/scan.py),
  * a slot ring of running winners in VMEM scratch: block j's winners merge
    elementwise-max into slot j % S — an O(QT*128) merge per block, no sort,
  * the only HBM output is [B, S*128] survivor scores + ids; the final
    exact `top_k` over those runs in XLA outside the kernel.

Exactness: two of the true top-k collide only if they fall in the same
(slot, lane) class — survivors are S*128 uniform bins (S=16 -> 2048 bins;
measured recall@10 0.995 at N=1M). Callers needing exact results rescore
the survivors (pallas_scan_rescore).

Measured honestly (queued-K kernels, scalar readback, null-RTT subtracted;
tools/profile_pallas_sweep.py): 2,048 x 1M x 128 bf16 euclid in 3.2 ms at
qt=512/slots=8/blk=8192 — ~84% of the 2.7 ms bf16 compute floor (2*B*N*D =
524 GFLOP at 197 TFLOP/s), i.e. compute-bound; the 4 passes over the 256 MB
block cost only 1.25 ms of the ~819 GB/s HBM bandwidth. (The round-4
"~167 GB/s roofline" note here was dispatch-inclusive timing — see
ARCHITECTURE.md round-5 re-profile.)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
DEFAULT_BLK = 4096
DEFAULT_QT = 256
DEFAULT_SLOTS = 16
NEG_INF = float(np.finfo(np.float32).min)


def _scan_kernel(scale_ref, q_ref, v_ref, bias_ref, top_s, top_i,
                 *, blk: int, slots: int, int8_mode: bool):
    # The running winners accumulate directly in the OUTPUT refs: their
    # index_map is constant in the vector-block grid dimension, so the tile
    # stays VMEM-resident across all blocks of one query tile and is written
    # back once.  (A separate VMEM scratch would double the footprint — the
    # [qt, slots*128] f32+i32 pair is 8 MB at qt=1024 — and capped blk at
    # 4096; measured on v5e the scratch-free kernel compiles at blk=8192,
    # cutting per-step fixed overhead ~2x.)
    import jax.experimental.pallas as pl

    nb = pl.program_id(1)

    @pl.when(nb == 0)
    def _init():
        top_s[:] = jnp.full_like(top_s, NEG_INF)
        top_i[:] = jnp.full_like(top_i, -1)

    bt = q_ref.shape[0]
    g = blk // LANES

    if int8_mode:
        # SQ codes: f32 score = scale^2 * (q_i8 . v_i8); scale is a traced
        # scalar (SMEM) so per-segment scales don't fragment the compile cache
        s = jax.lax.dot_general(
            q_ref[:], v_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * scale_ref[0, 0]
    else:
        s = jax.lax.dot_general(
            q_ref[:], v_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # Lane-group running argmax: one compare + two selects per element
    # (the earlier max / == / iota / where-min chain was 6 VPU ops per
    # element and cost 2/3 of kernel time — measured floor on v5e: the
    # matmul alone is 3.1 ms per 2048x1M batch, the old epilogue +5.9 ms).
    # (statically unrolled: Mosaic has no dynamic_slice on values, and the
    # trip count g = blk/128 is a small compile-time constant)
    bmax = s[:, :LANES] + bias_ref[:, :LANES]
    idx_in_g = jnp.zeros((bt, LANES), jnp.int32)
    for j in range(1, g):
        sj = s[:, j * LANES:(j + 1) * LANES] \
            + bias_ref[:, j * LANES:(j + 1) * LANES]
        better = sj > bmax
        bmax = jnp.where(better, sj, bmax)
        idx_in_g = jnp.where(better, j, idx_in_g)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bt, LANES), 1)
    row_id = nb * blk + idx_in_g * LANES + lane

    slot = jax.lax.rem(nb, slots)
    cur_s = top_s[:, pl.ds(slot * LANES, LANES)]
    cur_i = top_i[:, pl.ds(slot * LANES, LANES)]
    better = bmax > cur_s
    top_s[:, pl.ds(slot * LANES, LANES)] = jnp.where(better, bmax, cur_s)
    top_i[:, pl.ds(slot * LANES, LANES)] = jnp.where(better, row_id, cur_i)


@functools.partial(
    jax.jit,
    static_argnames=("blk", "qt", "slots", "int8_mode", "interpret"),
)
def pallas_scan_survivors(
    queries: jax.Array,  # [B, D]: bf16-able f32, or int8 codes (int8_mode)
    vectors: jax.Array,  # [N, D] bf16 (pre-scaled by 2 for euclid) or int8
    bias: jax.Array,  # [N] f32: -||v||^2 (euclid) + NEG_INF where deleted
    scale_sq: jax.Array = None,  # scalar f32 (int8 mode: scale^2, x2 if euclid)
    blk: int = DEFAULT_BLK,
    qt: int = DEFAULT_QT,
    slots: int = DEFAULT_SLOTS,
    int8_mode: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """-> (survivor scores [B, slots*128], survivor ids [B, slots*128])."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d = queries.shape
    n = vectors.shape[0]
    width = slots * LANES
    q_in = queries if int8_mode else queries.astype(jnp.bfloat16)
    bias2 = bias.reshape(1, n)
    if scale_sq is None:
        scale_sq = jnp.float32(1.0)
    scale2 = jnp.asarray(scale_sq, dtype=jnp.float32).reshape(1, 1)

    kernel = functools.partial(
        _scan_kernel, blk=blk, slots=slots, int8_mode=int8_mode
    )
    grid = (b // qt, n // blk)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda qb, nb: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((qt, d), lambda qb, nb: (qb, 0)),
            pl.BlockSpec((blk, d), lambda qb, nb: (nb, 0)),
            pl.BlockSpec((1, blk), lambda qb, nb: (0, nb)),
        ],
        out_specs=(
            pl.BlockSpec((qt, width), lambda qb, nb: (qb, 0)),
            pl.BlockSpec((qt, width), lambda qb, nb: (qb, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, width), jnp.float32),
            jax.ShapeDtypeStruct((b, width), jnp.int32),
        ),
        interpret=interpret,
    )(scale2, q_in, vectors, bias2)
    return out_s, out_i


@functools.partial(
    jax.jit,
    static_argnames=("k", "blk", "qt", "slots", "int8_mode", "interpret"),
)
def pallas_scan_topk(
    queries: jax.Array,
    vectors: jax.Array,
    bias: jax.Array,
    k: int,
    scale_sq: jax.Array = None,
    blk: int = DEFAULT_BLK,
    qt: int = DEFAULT_QT,
    slots: int = DEFAULT_SLOTS,
    int8_mode: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused survivors + final exact top-k -> (scores [B,k], ids [B,k])."""
    s, i = pallas_scan_survivors(
        queries, vectors, bias, scale_sq, blk, qt, slots, int8_mode, interpret
    )
    top_s, ti = jax.lax.top_k(s, k)
    top_i = jnp.take_along_axis(i, ti, axis=1)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    top_s = jnp.where(top_i >= 0, top_s, -jnp.inf)
    return top_s, top_i


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_fetch", "k", "blk", "qt", "slots", "euclid", "int8_mode",
        "interpret",
    ),
)
def pallas_scan_rescore(
    queries: jax.Array,  # [B, D] f32 (distance-preprocessed, un-scaled)
    scan_queries: jax.Array,  # [B, D] what the kernel scores with (f32/int8)
    vectors: jax.Array,  # [N, D] bf16 pre-scaled / int8 codes
    bias: jax.Array,  # [N] f32
    vectors_f32: jax.Array,  # [Nf, D] f32, same row space — rescore source
    k_fetch: int,
    k: int,
    scale_sq: jax.Array = None,
    blk: int = DEFAULT_BLK,
    qt: int = DEFAULT_QT,
    slots: int = DEFAULT_SLOTS,
    euclid: bool = False,
    int8_mode: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused pallas scan + exact f32 rescore of the oversampled winners —
    the quantized-search oversample+rescore semantics
    (reference: index/vector_index_search_common.rs:48-93)."""
    _, cand = pallas_scan_topk(
        scan_queries, vectors, bias, k_fetch, scale_sq, blk, qt, slots,
        int8_mode, interpret,
    )
    safe = jnp.maximum(cand, 0)
    cv = jnp.take(vectors_f32, safe, axis=0).astype(jnp.float32)
    q = queries[:, : cv.shape[-1]]
    if euclid:
        diff = q[:, None, :] - cv
        re = -jnp.sum(diff * diff, axis=-1)
    else:
        re = jnp.einsum("bd,bkd->bk", q, cv, preferred_element_type=jnp.float32)
    re = jnp.where(cand >= 0, re, -jnp.inf)
    top_s, ti = jax.lax.top_k(re, k)
    top_i = jnp.take_along_axis(cand, ti, axis=1)
    top_i = jnp.where(jnp.isfinite(top_s), top_i, -1)
    return top_s, top_i


def pad_for_pallas(n: int, blk: int = DEFAULT_BLK) -> int:
    """Rows must be a multiple of blk."""
    return max((n + blk - 1) // blk * blk, blk)


def pallas_qt_slots(
    b_pad: int, k_need: int, blk: int, d_pad: int, itemsize: int = 2
) -> Tuple[int, int]:
    """Query-tile + survivor-slot choice for the scan grid, from the v5e
    sweep (tools/profile_pallas_sweep.py, honest queued-K timing):

      * qt=512/slots=8 runs the 2,048x1M x128 batch in 3.2 ms vs 4.2 ms at
        qt=256/slots=16 — half the vector-block re-reads and a better MXU
        aspect; slots=16 at qt=512 does not compile (VMEM), so the wider
        tile halves the survivor bins (1024): callers needing k_fetch >
        1024, and small batches, stay on the 256/16 shape.
      * the score tile [qt, blk] f32 + double-buffered vector tile +
        [qt, slots*128] f32+i32 outputs must fit ~14 MB of scoped VMEM
        (measured compile boundary; 16 MB hardware window).
    """
    if b_pad % 512 == 0 and k_need <= 8 * LANES:
        vmem = (
            512 * blk * 4
            + 2 * blk * d_pad * itemsize
            + 512 * 8 * LANES * 8
            + 512 * d_pad * itemsize
        )
        if vmem <= 14 * (1 << 20):
            return 512, 8
    if b_pad % DEFAULT_QT == 0:
        return DEFAULT_QT, DEFAULT_SLOTS
    if b_pad % 128 == 0:
        return 128, DEFAULT_SLOTS
    return b_pad, DEFAULT_SLOTS


def pallas_block_for(d: int, itemsize: int = 2, qt: int = DEFAULT_QT) -> int:
    """Largest vector-block size whose per-grid-step VMEM footprint — the
    double-buffered [blk, d] vector tile plus the [qt, blk] f32 score tile
    — fits the ~16 MB scoped-VMEM window with headroom for the
    [qt, slots*128] running-winner scratch. The tuned DEFAULT_BLK=4096
    holds for d=128 bf16; at d=1536 the same block is a 25 MB stack frame
    and the kernel fails to COMPILE (scoped-vmem OOM, measured on v5e), so
    high-dimensional blocks shrink to 1024."""
    budget = 8 << 20
    blk = budget // (2 * d * itemsize + 4 * qt)
    blk = min(DEFAULT_BLK, blk // LANES * LANES)
    return max(blk, LANES)


def is_tpu_backend() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
