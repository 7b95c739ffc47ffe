"""Sparse vector scoring: segmented SpMV over an HBM-resident inverted index.

Reference: lib/sparse/ (inverted index + WAND-style pruned posting merge,
lib/sparse/src/index/search_context.rs:25-80). The TPU formulation replaces
the per-posting merge loop with fixed-shape gathers + one scatter-add:

  * The sealed inverted index is a flat CSR in HBM: `flat_ids [L]`,
    `flat_weights [L]`, with per-dimension (start, len). Postings are sorted
    by weight descending when sealed, so a fixed posting window cap keeps the
    heaviest entries (the analogue of the reference's max_next_weight
    pruning).
  * A query gathers a [T, P] window per term (dynamic_slice with static P),
    multiplies by query weights, scatter-adds into a dense [N] accumulator,
    then top-k on device.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float(-np.inf)


@functools.partial(jax.jit, static_argnames=("window", "n_points"))
def score_sparse_batch(
    flat_ids: jax.Array,  # [L] int32 point offsets, concatenated postings
    flat_weights: jax.Array,  # [L] f32
    dim_starts: jax.Array,  # [B, T] int32 posting start per query term (-1 = absent)
    dim_lens: jax.Array,  # [B, T] int32 posting length
    query_weights: jax.Array,  # [B, T] f32 (0 = padded term)
    window: int,  # static posting window cap P
    n_points: int,  # static accumulator size
    valid_mask: Optional[jax.Array] = None,  # [n_points] bool
) -> jax.Array:
    """→ [B, n_points] scores (0 where no overlap; -inf where masked)."""

    def one_query(starts, lens, qw):
        def one_term(start, ln, w):
            s = jnp.maximum(start, 0)
            ids = jax.lax.dynamic_slice(flat_ids, (s,), (window,))
            ws = jax.lax.dynamic_slice(flat_weights, (s,), (window,))
            pos = jax.lax.broadcasted_iota(jnp.int32, (window, 1), 0)[:, 0]
            ok = (pos < ln) & (start >= 0)
            ids = jnp.where(ok, ids, n_points)  # out-of-range → dropped
            contrib = jnp.where(ok, ws * w, 0.0)
            return ids, contrib

        ids, contribs = jax.vmap(one_term)(starts, lens, qw)  # [T, P]
        acc = jnp.zeros((n_points,), dtype=jnp.float32)
        acc = acc.at[ids.reshape(-1)].add(contribs.reshape(-1), mode="drop")
        return acc

    scores = jax.vmap(one_query)(dim_starts, dim_lens, query_weights)
    if valid_mask is not None:
        scores = jnp.where(valid_mask[None, :], scores, NEG_INF)
    return scores


LANES = 128
HOT_BLOCK = 8192
SCAN_UNROLL = 4


@functools.partial(jax.jit, static_argnames=())
def rescore_sparse_packed(
    cand_ids: jax.Array,  # [B, C] int32 point offsets (-1 padded)
    fwd_rows: jax.Array,  # [N_pad, 2J] int32: [tids (-1 pad) | f32 bits]
    qvec: jax.Array,  # [B, V] f32 dense query over compact term ids
) -> jax.Array:
    """Exact f32 candidate rescore over the PACKED forward table: term ids
    and f32 weight bit patterns live side by side in one int32 row, so each
    candidate costs ONE row gather instead of two (TPU row gathers carry a
    fixed per-gather cost that dominated the two-table variant)."""
    j = fwd_rows.shape[1] // 2
    safe = jnp.maximum(cand_ids, 0)
    rows = jnp.take(fwd_rows, safe, axis=0)  # [B, C, 2J]
    terms = rows[..., :j]
    weights = jax.lax.bitcast_convert_type(rows[..., j:], jnp.float32)

    def one(qv, t, w):
        contrib = jnp.where(t >= 0, jnp.take(qv, jnp.maximum(t, 0)), 0.0)
        return jnp.sum(contrib * w, axis=-1)

    scores = jax.vmap(one)(qvec, terms, weights)  # [B, C]
    return jnp.where(cand_ids >= 0, scores, NEG_INF)


@functools.partial(jax.jit, static_argnames=())
def build_hot_matrix(
    flat_ids: jax.Array,  # [L] int32 point offsets (pad tail allowed)
    flat_weights: jax.Array,  # [L] f32 (pad tail zero)
    dim_starts: jax.Array,  # [U] int32 posting start per sorted dim
    hot_col_of_dim: jax.Array,  # [U] int32 hot column per dim (-1 = cold)
    hot_init: jax.Array,  # [N_pad, H] f32 zeros (donated)
) -> jax.Array:
    """Seal-time build of the dense hot-term matrix from the device CSR.

    Each posting maps to its dim by a device-side searchsorted over the dim
    start table, then scatters its weight into (point_row, hot_column). Cold
    postings (hot column -1) and pad-tail postings (weight 0) are no-ops.
    One-time cost: ~0.4 s for 45M hot postings at 1M rows (v5e)."""
    n_pad = hot_init.shape[0]
    pos = jnp.arange(flat_ids.shape[0], dtype=jnp.int32)
    dim_idx = (
        jnp.searchsorted(dim_starts, pos, side="right").astype(jnp.int32) - 1
    )
    col = jnp.take(hot_col_of_dim, jnp.clip(dim_idx, 0), axis=0)
    valid = col >= 0
    rows = jnp.where(valid, flat_ids, n_pad)  # OOB rows are dropped
    w = jnp.where(valid, flat_weights, 0.0).astype(hot_init.dtype)
    return hot_init.at[rows, jnp.maximum(col, 0)].add(w, mode="drop")


@functools.partial(
    jax.jit, static_argnames=("u_pad", "e_pad", "k_fetch", "k")
)
def sparse_hybrid_search(
    hot: jax.Array,  # [N_pad, H] f32 dense hot-term matrix
    qhot: jax.Array,  # [B, H] f32 query weights over hot columns (host-built)
    flat_ids: jax.Array,  # [Lw] int32 top-W window CSR: point offsets
    flat_weights: jax.Array,  # [Lw] f32 window CSR: posting weights
    cold_starts: jax.Array,  # [B, Tc] int32 window start per cold term
    cold_lens: jax.Array,  # [B, Tc] int32 window length taken per term (0 pad)
    cold_qw: jax.Array,  # [B, Tc] f32 query weight per cold term
    fwd_cold: jax.Array,  # [N_pad, 2*Jc] int32 packed [cold tids | f32 bits]
    q_tids: jax.Array,  # [B, Tq] int32 compact term ids, -1 pad (ALL terms)
    q_w: jax.Array,  # [B, Tq] f32 query weights (idf-remapped)
    valid_mask: jax.Array,  # [N_pad] bool
    u_pad: int,  # static dense query width (compact term space)
    e_pad: int,  # static per-query cold window entry budget
    k_fetch: int,  # static candidate count
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Hot-dense + windowed-cold SELECTION, exact candidate RESCORE — one
    compiled program per shape bucket.

    TPU-first inversion of the reference's WAND posting merge
    (lib/sparse/src/index/search_context.rs:25-80), shaped by measured
    per-element costs on the hardware (element-granular HBM gathers
    ~19 ns, scatter-adds ~50-200 ns — both catastrophic at
    postings-per-batch scale, while MXU matmuls and contiguous row
    gathers are effectively free):

      * SELECTION: the top-H document-frequency terms live as a dense
        [N, H] f32 matrix scored block-wise on the MXU with
        Precision.HIGHEST (exact to f32 rounding). Cold terms contribute
        through a bounded WINDOW of their heaviest postings (postings are
        weight-descending per dim at seal — the window is the analogue of
        the reference's max_next_weight pruning): per-term (start, len,
        qw) descriptors expand to entry positions on device via a
        vectorized searchsorted over per-query prefix sums. Window
        truncation only perturbs CANDIDATE CHOICE, never reported scores.
      * RESCORE: the top k_fetch candidates get exact f32 scores:
        s_hot from a contiguous hot-row gather + einsum, s_cold from the
        cold-only packed forward rows (a doc's hot entries live in the
        hot matrix, so rows carry only its ~¼ cold entries) against a
        dense per-query term vector scatter-built on device — B·kf·Jc
        element gathers instead of postings-scale work."""
    b, h = qhot.shape
    n_pad = hot.shape[0]
    blk = min(HOT_BLOCK, n_pad)
    nb = n_pad // blk
    g = blk // LANES
    prec = jax.lax.Precision.HIGHEST
    jc = fwd_cold.shape[1] // 2

    # ---- dense per-query term vector (compact tid space) ----
    def one_qdense(tids, w):
        v = jnp.zeros((u_pad,), dtype=jnp.float32)
        safe_t = jnp.where(tids >= 0, tids, u_pad)
        return v.at[safe_t].add(jnp.where(tids >= 0, w, 0.0), mode="drop")

    qdense = jax.vmap(one_qdense)(q_tids, q_w)  # [B, u_pad]

    # ---- cold window accumulator: entry expansion + scatter-add ----
    cum = jnp.cumsum(cold_lens, axis=1)  # [B, Tc]
    ent = jnp.arange(e_pad, dtype=jnp.int32)

    def one_query(starts, lens, qw, cum_q):
        tot = cum_q[-1]
        term = jnp.searchsorted(cum_q, ent, side="right").astype(jnp.int32)
        term_c = jnp.minimum(term, cum_q.shape[0] - 1)
        base = cum_q - lens  # entry offset where each term begins
        within = ent - jnp.take(base, term_c)
        pos = jnp.take(starts, term_c) + within
        ok = ent < tot
        ids = jnp.where(ok, jnp.take(flat_ids, jnp.maximum(pos, 0)), n_pad)
        contrib = jnp.where(
            ok,
            jnp.take(flat_weights, jnp.maximum(pos, 0)) * jnp.take(qw, term_c),
            0.0,
        )
        acc = jnp.zeros((n_pad,), dtype=jnp.float32)
        return acc.at[ids].add(contrib, mode="drop")

    acc = jax.vmap(one_query)(cold_starts, cold_lens, cold_qw, cum)
    acc_b = acc.reshape(b, nb, blk).transpose(1, 0, 2)  # [nb, B, blk]
    hot_b = hot.reshape(nb, blk, h)
    mask_b = valid_mask.reshape(nb, blk)

    def body(carry, inp):
        hblk, ablk, mb = inp
        s = (
            jax.lax.dot_general(
                qhot,
                hblk,
                (((1,), (1,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32,
            )
            + ablk
        )
        s = jnp.where((mb[None, :]) & (s != 0.0), s, NEG_INF)
        s3 = s.reshape(b, g, LANES)
        return carry, (
            jnp.max(s3, axis=1),
            jnp.argmax(s3, axis=1).astype(jnp.int32),
        )

    _, (ms, ams) = jax.lax.scan(
        body, None, (hot_b, acc_b, mask_b), unroll=min(SCAN_UNROLL, nb)
    )
    lane = jnp.arange(LANES, dtype=jnp.int32)
    ids = (
        jnp.arange(nb, dtype=jnp.int32)[:, None, None] * blk
        + ams * LANES
        + lane[None, None, :]
    )
    flat_s = jnp.moveaxis(ms, 0, 1).reshape(b, -1)
    flat_i = jnp.moveaxis(ids, 0, 1).reshape(b, -1)
    kf = min(k_fetch, flat_s.shape[1])
    top_s, ti = jax.lax.top_k(flat_s, kf)
    cand = jnp.take_along_axis(flat_i, ti, axis=1)
    cand = jnp.where(jnp.isfinite(top_s), cand, -1)

    # ---- exact f32 rescore of the candidates ----
    safe = jnp.maximum(cand, 0)
    rows = jnp.take(hot, safe, axis=0)  # [B, kf, H] contiguous row gather
    s_hot = jnp.einsum("bkh,bh->bk", rows, qhot, precision=prec)
    fr = jnp.take(fwd_cold, safe, axis=0)  # [B, kf, 2Jc]
    ct = fr[..., :jc]
    cw = jax.lax.bitcast_convert_type(fr[..., jc:], jnp.float32)

    def one_rescore(qv, t, w):
        qc = jnp.where(t >= 0, jnp.take(qv, jnp.maximum(t, 0)), 0.0)
        return jnp.sum(qc * w, axis=-1)

    s_cold = jax.vmap(one_rescore)(qdense, ct, cw)  # [B, kf]
    exact = s_hot + s_cold
    exact = jnp.where((cand >= 0) & (exact != 0.0), exact, NEG_INF)
    k_eff = min(k, kf)
    out_s, oi = jax.lax.top_k(exact, k_eff)
    out_i = jnp.take_along_axis(cand, oi, axis=1)
    out_i = jnp.where(jnp.isfinite(out_s), out_i, -1)
    return out_s, out_i


@functools.partial(jax.jit, static_argnames=("window", "n_points", "k"))
def sparse_search(
    flat_ids: jax.Array,
    flat_weights: jax.Array,
    dim_starts: jax.Array,
    dim_lens: jax.Array,
    query_weights: jax.Array,
    window: int,
    n_points: int,
    k: int,
    valid_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    scores = score_sparse_batch(
        flat_ids,
        flat_weights,
        dim_starts,
        dim_lens,
        query_weights,
        window,
        n_points,
        valid_mask,
    )
    # zero score = no overlap → exclude from results
    scores = jnp.where(scores != 0.0, scores, NEG_INF)
    return jax.lax.top_k(scores, k)
