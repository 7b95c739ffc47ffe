"""Dense distance scoring as MXU matmuls.

Replaces the reference's SIMD metric kernels (reference:
lib/segment/src/spaces/{simple_avx.rs,simple_sse.rs,simple_neon.rs} and
metric_f16/cpp/neon.c) with batched matrix products over tiled vector blocks —
the TPU-idiomatic formulation: a batch of queries [B, D] against a segment's
vector block [N, D] is a single `Q @ V.T` on the MXU.

Internal score convention: **larger is always better**.
  * dot / cosine: the similarity itself (cosine vectors are pre-normalized at
    insert time, as the reference does in `Metric::preprocess`).
  * euclid: negative *squared* distance (monotonic; sqrt applied only at the
    API boundary, matching the reference's postprocess).
  * manhattan: negative L1 distance.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Distance

NEG_INF = float(-np.inf)


def preprocess_vectors(vectors: np.ndarray, distance: Distance) -> np.ndarray:
    """Host-side insert-time preprocessing (normalize for cosine)."""
    if distance is Distance.COSINE:
        norms = np.linalg.norm(vectors, axis=-1, keepdims=True)
        norms = np.where(norms == 0.0, 1.0, norms)
        return (vectors / norms).astype(np.float32)
    return np.asarray(vectors, dtype=np.float32)


@functools.partial(jax.jit, static_argnames=("distance",))
def score_dense(
    queries: jax.Array,  # [B, D] float32
    vectors: jax.Array,  # [N, D] storage dtype
    distance: str,
    valid_mask: Optional[jax.Array] = None,  # [N] bool
) -> jax.Array:
    """Score a batch of queries against a full vector block → [B, N] scores."""
    dist = Distance(distance)
    compute_dtype = vectors.dtype if vectors.dtype != jnp.uint8 else jnp.float32
    q = queries.astype(compute_dtype)
    v = vectors.astype(compute_dtype)

    if dist in (Distance.DOT, Distance.COSINE):
        scores = jax.lax.dot_general(
            q, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    elif dist is Distance.EUCLID:
        qv = jax.lax.dot_general(
            q, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        q32 = queries.astype(jnp.float32)
        v32 = vectors.astype(jnp.float32)
        q_sq = jnp.sum(q32 * q32, axis=-1, keepdims=True)  # [B, 1]
        v_sq = jnp.sum(v32 * v32, axis=-1)  # [N]
        scores = 2.0 * qv - q_sq - v_sq[None, :]  # = -||q - v||^2
    elif dist is Distance.MANHATTAN:
        # No matmul formulation exists for L1; chunk over N on the VPU.
        q32 = queries.astype(jnp.float32)
        v32 = vectors.astype(jnp.float32)
        n = v32.shape[0]
        chunk = 2048
        pad = (-n) % chunk
        v_pad = jnp.pad(v32, ((0, pad), (0, 0)))
        v_chunks = v_pad.reshape(-1, chunk, v32.shape[1])

        def body(carry, v_c):
            s = -jnp.sum(jnp.abs(q32[:, None, :] - v_c[None, :, :]), axis=-1)
            return carry, s

        _, out = jax.lax.scan(body, None, v_chunks)
        scores = jnp.moveaxis(out, 0, 1).reshape(q32.shape[0], -1)[:, :n]
    else:  # pragma: no cover
        raise ValueError(f"unknown distance {distance}")

    if valid_mask is not None:
        scores = jnp.where(valid_mask[None, :], scores, NEG_INF)
    return scores


@functools.partial(jax.jit, static_argnames=("k",))
def topk(scores: jax.Array, k: int):
    """Top-k over the last axis → (scores [B, k], indices [B, k])."""
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnames=("distance", "k"))
def score_and_topk(
    queries: jax.Array,
    vectors: jax.Array,
    distance: str,
    k: int,
    valid_mask: Optional[jax.Array] = None,
) -> tuple:
    """Fused full-scan search: scores + top-k in one compiled program.

    This is the TPU equivalent of the reference's plain full-scan index
    (reference: lib/segment/src/index/plain_vector_index/). XLA fuses the
    masking into the matmul epilogue; top_k runs on-device so only [B, k]
    leaves the chip.
    """
    scores = score_dense(queries, vectors, distance, valid_mask)
    return jax.lax.top_k(scores, k)


def _gather_rows(vectors: jax.Array, ids: jax.Array) -> jax.Array:
    safe = jnp.maximum(ids, 0)
    return jnp.take(vectors, safe, axis=0)  # [B, K, D]


@functools.partial(jax.jit, static_argnames=("distance",))
def score_ids_batch(
    queries: jax.Array,  # [B, D] float32
    vectors: jax.Array,  # [N, D]
    ids: jax.Array,  # [B, K] int32, -1 = invalid
    distance: str,
) -> jax.Array:
    dist = Distance(distance)
    cand = _gather_rows(vectors, ids)  # [B, K, D]
    compute_dtype = cand.dtype if cand.dtype != jnp.uint8 else jnp.float32
    q = queries.astype(compute_dtype)
    c = cand.astype(compute_dtype)
    if dist in (Distance.DOT, Distance.COSINE):
        scores = jnp.einsum("bd,bkd->bk", q, c, preferred_element_type=jnp.float32)
    elif dist is Distance.EUCLID:
        diff = q[:, None, :].astype(jnp.float32) - c.astype(jnp.float32)
        scores = -jnp.sum(diff * diff, axis=-1)
    elif dist is Distance.MANHATTAN:
        diff = q[:, None, :].astype(jnp.float32) - c.astype(jnp.float32)
        scores = -jnp.sum(jnp.abs(diff), axis=-1)
    else:  # pragma: no cover
        raise ValueError(f"unknown distance {distance}")
    return jnp.where(ids >= 0, scores, NEG_INF)


@functools.partial(jax.jit, static_argnames=("distance",))
def pairwise_scores(
    a: jax.Array,  # [B, Ka, D]
    b: jax.Array,  # [B, Kb, D]
    distance: str,
) -> jax.Array:
    """Batched pairwise scores [B, Ka, Kb] — used by the HNSW build heuristic."""
    dist = Distance(distance)
    a32 = a.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    if dist in (Distance.DOT, Distance.COSINE):
        return jnp.einsum("bad,bkd->bak", a32, b32, preferred_element_type=jnp.float32)
    if dist is Distance.EUCLID:
        ab = jnp.einsum("bad,bkd->bak", a32, b32, preferred_element_type=jnp.float32)
        a_sq = jnp.sum(a32 * a32, axis=-1)  # [B, Ka]
        b_sq = jnp.sum(b32 * b32, axis=-1)  # [B, Kb]
        return 2.0 * ab - a_sq[:, :, None] - b_sq[:, None, :]
    if dist is Distance.MANHATTAN:
        diff = a32[:, :, None, :] - b32[:, None, :, :]
        return -jnp.sum(jnp.abs(diff), axis=-1)
    raise ValueError(f"unknown distance {distance}")  # pragma: no cover


@functools.partial(jax.jit, static_argnames=("distance",))
def score_multivector_maxsim(
    query: jax.Array,  # [T, D] query token matrix
    vectors: jax.Array,  # [N, S, D] padded per-point token matrices
    token_mask: jax.Array,  # [N, S] bool — valid tokens
    distance: str,
    valid_mask: Optional[jax.Array] = None,  # [N]
) -> jax.Array:
    """ColBERT-style late-interaction max-sim scoring (reference:
    lib/segment/src/vector_storage/query_scorer/multi_metric_query_scorer.rs:64).

    score(q, v) = sum_t max_s sim(q_t, v_s); one einsum → [N, T, S] then a
    masked max+sum reduction, all fused by XLA.
    """
    dist = Distance(distance)
    q32 = query.astype(jnp.float32)
    v32 = vectors.astype(jnp.float32)
    if dist in (Distance.DOT, Distance.COSINE):
        sims = jnp.einsum("td,nsd->nts", q32, v32, preferred_element_type=jnp.float32)
    elif dist is Distance.EUCLID:
        qv = jnp.einsum("td,nsd->nts", q32, v32, preferred_element_type=jnp.float32)
        q_sq = jnp.sum(q32 * q32, axis=-1)  # [T]
        v_sq = jnp.sum(v32 * v32, axis=-1)  # [N, S]
        sims = 2.0 * qv - q_sq[None, :, None] - v_sq[:, None, :]
    else:
        diff = q32[None, :, None, :] - v32[:, None, :, :]
        sims = -jnp.sum(jnp.abs(diff), axis=-1)
    sims = jnp.where(token_mask[:, None, :], sims, NEG_INF)
    best = jnp.max(sims, axis=-1)  # [N, T]
    scores = jnp.sum(jnp.where(jnp.isfinite(best), best, 0.0), axis=-1)  # [N]
    any_token = jnp.any(token_mask, axis=-1)
    scores = jnp.where(any_token, scores, NEG_INF)
    if valid_mask is not None:
        scores = jnp.where(valid_mask, scores, NEG_INF)
    return scores
