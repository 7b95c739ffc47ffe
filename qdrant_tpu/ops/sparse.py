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


@functools.partial(jax.jit, static_argnames=())
def rescore_sparse_candidates(
    cand_ids: jax.Array,  # [B, C] int32 point offsets (-1 padded)
    row_terms: jax.Array,  # [N_pad, J] int32 compact term ids (-1 padded)
    row_weights: jax.Array,  # [N_pad, J] f32
    qvec: jax.Array,  # [B, V] f32 dense query over compact term ids
) -> jax.Array:
    """Exact sparse scores of the candidates: gather each candidate's
    forward row and dot it against the dense query vector. The windowed
    first pass may mis-rank points whose contributions lie beyond the
    posting windows; this recovers the exact ordering for the candidate
    set (the TPU rendering of the reference's exact posting merge over a
    pruned candidate stream, search_context.rs:25-80)."""
    safe = jnp.maximum(cand_ids, 0)
    terms = jnp.take(row_terms, safe, axis=0)  # [B, C, J]
    weights = jnp.take(row_weights, safe, axis=0)  # [B, C, J]

    def one(qv, t, w):
        contrib = jnp.where(t >= 0, jnp.take(qv, jnp.maximum(t, 0)), 0.0)
        return jnp.sum(contrib * w, axis=-1)

    scores = jax.vmap(one)(qvec, terms, weights)  # [B, C]
    return jnp.where(cand_ids >= 0, scores, NEG_INF)


LANES = 128
HOT_BLOCK = 8192
SCAN_UNROLL = 4


@functools.partial(jax.jit, static_argnames=())
def build_hot_matrix(
    flat_ids: jax.Array,  # [L] int32 point offsets (pad tail allowed)
    flat_weights: jax.Array,  # [L] f32 (pad tail zero)
    dim_starts: jax.Array,  # [U] int32 posting start per sorted dim
    hot_col_of_dim: jax.Array,  # [U] int32 hot column per dim (-1 = cold)
    hot_init: jax.Array,  # [N_pad, H] bf16 zeros (donated)
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
    w = jnp.where(valid, flat_weights, 0.0).astype(jnp.bfloat16)
    return hot_init.at[rows, jnp.maximum(col, 0)].add(w, mode="drop")


@functools.partial(
    jax.jit, static_argnames=("window", "v_pad", "k_fetch", "k", "bf16_dot")
)
def sparse_hybrid_search(
    hot: jax.Array,  # [N_pad, H] bf16 dense hot-term matrix
    hot_tids: jax.Array,  # [H] int32 compact term id per hot column (-1 pad)
    flat_ids: jax.Array,  # [L] int32 (cold CSR gathers)
    flat_weights: jax.Array,  # [L] f32
    q_tids: jax.Array,  # [B, Tq] int32 compact term ids (-1 pad)
    q_w: jax.Array,  # [B, Tq] f32
    cold_starts: jax.Array,  # [B, T] int32 posting-chunk starts (-1 pad)
    cold_lens: jax.Array,  # [B, T] int32 chunk lengths
    cold_qw: jax.Array,  # [B, T] f32 query weight per chunk
    row_terms: jax.Array,  # [N_pad, J] int32 forward rows (-1 pad)
    row_weights: jax.Array,  # [N_pad, J] f32
    valid_mask: jax.Array,  # [N_pad] bool
    window: int,  # static cold chunk size
    v_pad: int,  # static compact vocab size
    k_fetch: int,  # static candidate count
    k: int,
    bf16_dot: bool = True,  # False on CPU backends (no bf16 DotThunk)
) -> Tuple[jax.Array, jax.Array]:
    """Hot-dense + cold-sparse hybrid sparse search, fused with the exact
    forward-row rescore — ONE compiled program per shape bucket.

    TPU-first inversion of the reference's WAND posting merge
    (lib/sparse/src/index/search_context.rs:25-80): the top-H
    highest-document-frequency terms live as a dense [N, H] bf16 matrix and
    are scored on the MXU in one matmul (where FLOPs are ~free); the
    remaining cold terms — whose postings are short by construction (every
    cold posting list is shorter than the H-th hottest) — go through a
    small exact gather + scatter-add. The sum is an (almost) exact score
    for EVERY point, streamed block-wise with the strided group-reduction
    top-k of ops/scan.py, and the k_fetch winners are exactly rescored in
    f32 against the forward rows inside the same program."""
    b, n_pad = q_tids.shape[0], hot.shape[0]
    h = hot.shape[1]
    blk = min(HOT_BLOCK, n_pad)
    nb = n_pad // blk
    g = blk // LANES

    # dense query over the compact vocabulary (for hot gather + rescore)
    qv_valid = q_tids >= 0
    qvec = jnp.zeros((b, v_pad), jnp.float32)
    brow = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], q_tids.shape)
    qvec = qvec.at[
        brow.reshape(-1),
        jnp.where(qv_valid, q_tids, 0).reshape(-1),
    ].add(jnp.where(qv_valid, q_w, 0.0).reshape(-1), mode="drop")

    qhot = jnp.take(qvec, jnp.maximum(hot_tids, 0), axis=1)  # [B, H]
    qhot = jnp.where(hot_tids[None, :] >= 0, qhot, 0.0)
    qhot_b = qhot.astype(jnp.bfloat16 if bf16_dot else jnp.float32)

    # cold accumulator [B, N_pad] via windowed gathers + scatter-add
    def one_query(starts, lens, qw):
        def one_chunk(start, ln, w):
            s = jnp.maximum(start, 0)
            ids = jax.lax.dynamic_slice(flat_ids, (s,), (window,))
            ws = jax.lax.dynamic_slice(flat_weights, (s,), (window,))
            pos = jax.lax.broadcasted_iota(jnp.int32, (window, 1), 0)[:, 0]
            ok = (pos < ln) & (start >= 0)
            ids = jnp.where(ok, ids, n_pad)
            contrib = jnp.where(ok, ws * w, 0.0)
            return ids, contrib

        ids, contribs = jax.vmap(one_chunk)(starts, lens, qw)  # [T, P]
        acc = jnp.zeros((n_pad,), dtype=jnp.float32)
        return acc.at[ids.reshape(-1)].add(contribs.reshape(-1), mode="drop")

    acc = jax.vmap(one_query)(cold_starts, cold_lens, cold_qw)  # [B, N_pad]
    acc_b = acc.reshape(b, nb, blk).transpose(1, 0, 2)  # [nb, B, blk]
    hot_b = hot.reshape(nb, blk, h)
    mask_b = valid_mask.reshape(nb, blk)

    def body(carry, inp):
        hblk, ablk, mb = inp
        if not bf16_dot:
            hblk = hblk.astype(jnp.float32)
        s = (
            jax.lax.dot_general(
                qhot_b,
                hblk,
                (((1,), (1,)), ((), ())),
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

    # fused exact f32 rescore against forward rows
    exact = rescore_sparse_candidates(cand, row_terms, row_weights, qvec)
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
