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
