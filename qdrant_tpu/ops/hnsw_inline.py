"""HNSW beam search over link rows with inlined quantized vectors.

The round-1 beam (ops/hnsw.py::beam_search_level) gathers every neighbor's
f32 vector row-by-row — at B=1024, e_x=4, M=32, D=128 that is ~256 MB of
HBM gather traffic per iteration (plus materialized intermediates), which
caps the graph path at ~3k QPS on a 167 GB/s chip. This module stores, for
every graph node, its M neighbor ids AND their int8 SQ codes + f32 norms in
ONE contiguous byte row:

    row = [ids: M x int32 | norms: M x f32 | codes: M x D x int8]

so neighbor expansion is e_x fat-row gathers per query instead of e_x*M
vector gathers — the TPU rendering of the reference's
`CompressedWithVectors` link format, which inlines quantized vectors next
to links for exactly this reason
(reference: lib/segment/src/index/hnsw_index/graph_links/format.rs:11-14).

Traversal scores are int8 (MXU); the final beam is exactly rescored from
the f32 vectors (one [B, ef]-row gather), matching the engine's quantized
oversample+rescore semantics (index/vector_index_search_common.rs:48).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float(-np.inf)


def pack_linkcodes(
    links: np.ndarray,  # [R, M] int32 global neighbor ids, -1 padded
    codes: np.ndarray,  # [N, D] int8 SQ codes (global row space)
    norms: np.ndarray,  # [N] f32 — ||v||^2 of the original vectors
) -> np.ndarray:
    """Host-side assembly of the fused link+code table -> [R, W] int8.

    W = M*4 (ids) + M*4 (norms) + M*D (codes). Padded (-1) neighbors carry
    zero codes and zero norms; their id slot stays -1 so the kernel masks
    them out.
    """
    r, m = links.shape
    d = codes.shape[1]
    safe = np.maximum(links, 0)
    ok = links >= 0
    nb_codes = np.where(ok[:, :, None], codes[safe], 0).astype(np.int8)
    nb_norms = np.where(ok, norms[safe], 0.0).astype(np.float32)
    out = np.empty((r, 4 * m + 4 * m + m * d), dtype=np.int8)
    ids32 = np.ascontiguousarray(links, dtype=np.int32)
    out[:, : 4 * m] = ids32.view(np.int8).reshape(r, 4 * m)
    nrm32 = np.ascontiguousarray(nb_norms, dtype=np.float32)
    out[:, 4 * m : 8 * m] = nrm32.view(np.int8).reshape(r, 4 * m)
    out[:, 8 * m :] = nb_codes.reshape(r, m * d)
    return out


def pack_linkcode_rows(
    links_rows: np.ndarray, codes: np.ndarray, norms: np.ndarray
) -> np.ndarray:
    """pack_linkcodes for a subset of rows (incremental table updates)."""
    return pack_linkcodes(links_rows, codes, norms)


@jax.jit
def pack_linkcodes_device(
    links: jax.Array,  # [R, M] int32 device adjacency
    codes: jax.Array,  # [N, D] int8 SQ codes (device)
    norms: jax.Array,  # [N] f32 (device)
) -> jax.Array:
    """Device-side assembly of the fused table — same layout as
    pack_linkcodes. After a device graph build the adjacency lives only on
    device; assembling there avoids both the adjacency download (~0.1 MB/s
    through the axon tunnel) and the multi-GB host table upload."""
    r, m = links.shape
    d = codes.shape[1]
    safe = jnp.maximum(links, 0)
    ok = links >= 0
    nb_codes = jnp.where(
        ok[:, :, None], jnp.take(codes, safe, axis=0), 0
    ).astype(jnp.int8)
    nb_norms = jnp.where(ok, jnp.take(norms, safe), 0.0).astype(jnp.float32)
    ids8 = jax.lax.bitcast_convert_type(links, jnp.int8).reshape(r, 4 * m)
    nrm8 = jax.lax.bitcast_convert_type(nb_norms, jnp.int8).reshape(r, 4 * m)
    return jnp.concatenate(
        [ids8, nrm8, nb_codes.reshape(r, m * d)], axis=1
    )


@functools.partial(
    jax.jit,
    static_argnames=("m", "d", "ef", "iters", "expand", "euclid", "k"),
)
def beam_search_inline(
    q_f32: jax.Array,  # [B, D] f32 distance-preprocessed queries
    q_i8: jax.Array,  # [B, D] int8 SQ-encoded queries
    table: jax.Array,  # [R, W] int8 fused link+code rows
    scale_sq: jax.Array,  # scalar f32: scale^2 (x2 when euclid)
    compact_of: jax.Array,  # [N] int32 global id -> table row
    vectors_f32: jax.Array,  # [Nf, D] f32 — exact rescore source
    entry_ids: jax.Array,  # [B, E] int32
    filter_bias: Optional[jax.Array],  # [N] f32: 0 allowed / NEG_INF excluded
    m: int,
    d: int,
    ef: int,
    iters: int,
    expand: int,
    euclid: bool,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """-> (exact scores [B, k], global ids [B, k]); -1 padded."""
    b = q_f32.shape[0]
    e_x = expand
    kk = e_x * m

    q_sq = jnp.sum(q_f32 * q_f32, axis=-1, keepdims=True)  # [B, 1]

    def score_entries(ids):
        """Exact f32 scores, same convention as ops/distances.py
        (euclid = -(q-v)^2, not the rank-equivalent 2qv - v^2)."""
        cand = jnp.take(vectors_f32, jnp.maximum(ids, 0), axis=0)
        qv = jnp.einsum(
            "bd,bkd->bk", q_f32, cand.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if euclid:
            s = 2.0 * qv - jnp.sum(cand * cand, axis=-1) - q_sq
        else:
            s = qv
        return jnp.where(ids >= 0, s, NEG_INF)

    entry_scores = score_entries(entry_ids)
    e = entry_ids.shape[1]
    pad = max(ef - e, 0)
    beam_ids = jnp.pad(entry_ids, ((0, 0), (0, pad)), constant_values=-1)[:, :ef]
    beam_scores = jnp.pad(
        entry_scores, ((0, 0), (0, pad)), constant_values=NEG_INF
    )[:, :ef]
    beam_exp = beam_ids < 0

    # filtered search keeps TWO sets (reference: filtered HNSW traverses
    # filtered-out points but never returns them — the candidate heap is
    # unfiltered, the result heap is filtered): the beam navigates the full
    # graph; res_* accumulates only filter-passing encounters. Biasing the
    # beam itself walls off every filtered-out region and collapses recall
    # at mid selectivity (measured 0.46@10% on 1M).
    if filter_bias is not None:
        ent_bias = jnp.take(filter_bias, jnp.maximum(beam_ids, 0))
        res_scores = jnp.where(
            beam_ids >= 0, beam_scores + ent_bias, NEG_INF
        )
        res_ids = jnp.where(jnp.isfinite(res_scores), beam_ids, -1)
    else:
        res_scores = res_ids = None

    def cond(st):
        bi, bs, be, it, _rs, _ri = st
        return jnp.logical_and(
            jnp.any(jnp.logical_and(~be, bi >= 0)), it < iters
        )

    def body(st):
        beam_ids, beam_scores, beam_exp, it, res_s, res_i = st
        cand_ok = jnp.logical_and(~beam_exp, beam_ids >= 0)
        pick_scores = jnp.where(cand_ok, beam_scores, NEG_INF)
        top_pick, pick_idx = jax.lax.top_k(pick_scores, e_x)
        pick_ids = jnp.take_along_axis(beam_ids, pick_idx, axis=1)
        pick_ids = jnp.where(jnp.isfinite(top_pick), pick_ids, -1)
        # mark picked slots expanded (comparison mask, no scatter)
        pos0 = jax.lax.broadcasted_iota(jnp.int32, (b, ef), 1)
        hit = jnp.any(
            (pos0[:, None, :] == pick_idx[:, :, None])
            & jnp.isfinite(top_pick)[:, :, None],
            axis=1,
        )
        beam_exp = jnp.logical_or(beam_exp, hit)

        rows = jnp.take(compact_of, jnp.maximum(pick_ids, 0))
        rows = jnp.where(pick_ids >= 0, rows, 0)
        fat = jnp.take(table, jnp.maximum(rows, 0), axis=0)  # [B, e_x, W]
        ids_b = fat[:, :, : 4 * m].reshape(b, e_x, m, 4)
        neigh = jax.lax.bitcast_convert_type(ids_b, jnp.int32).reshape(b, kk)
        norms_b = fat[:, :, 4 * m : 8 * m].reshape(b, e_x, m, 4)
        nb_norms = jax.lax.bitcast_convert_type(norms_b, jnp.float32).reshape(
            b, kk
        )
        nb_codes = fat[:, :, 8 * m :].reshape(b, kk, d)
        # picked slot invalid -> neutralize its neighbors
        valid_pick = (pick_ids >= 0)[:, :, None]
        neigh = jnp.where(
            jnp.broadcast_to(valid_pick, (b, e_x, m)).reshape(b, kk), neigh, -1
        )

        dots = jax.lax.dot_general(
            q_i8, nb_codes, (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * scale_sq
        # same -(q-v)^2 convention as the exact entry scores so beam
        # eviction compares like with like
        n_scores = dots - nb_norms - q_sq if euclid else dots
        n_scores = jnp.where(neigh >= 0, n_scores, NEG_INF)

        # dedup against the current beam + within the expansion itself
        # (parallel expansion of adjacent nodes yields heavily overlapping
        # neighbor sets; without intra-expansion dedup the beam floods with
        # duplicates and effective ef collapses). The visited RING of the
        # classic beam is dropped: beam-dedup alone suffices once the beam
        # itself is duplicate-free (measured equal recall at expand=1).
        dup_beam = jnp.any(neigh[:, :, None] == beam_ids[:, None, :], axis=2)
        pos = jax.lax.broadcasted_iota(jnp.int32, (b, kk), 1)
        first_pos = jnp.where(
            neigh[:, :, None] == neigh[:, None, :], pos[:, None, :], kk
        ).min(axis=2)
        n_scores = jnp.where(dup_beam | (first_pos < pos), NEG_INF, n_scores)
        neigh = jnp.where(jnp.isfinite(n_scores), neigh, -1)

        if res_s is not None:
            allowed = n_scores + jnp.take(
                filter_bias, jnp.maximum(neigh, 0)
            )
            ra_s = jnp.concatenate([res_s, allowed], axis=1)
            ra_i = jnp.concatenate([res_i, neigh], axis=1)
            res_s, ri = jax.lax.top_k(ra_s, ef)
            res_i = jnp.take_along_axis(ra_i, ri, axis=1)
            res_i = jnp.where(jnp.isfinite(res_s), res_i, -1)

        all_ids = jnp.concatenate([beam_ids, neigh], axis=1)
        all_scores = jnp.concatenate([beam_scores, n_scores], axis=1)
        all_exp = jnp.concatenate(
            [beam_exp, jnp.zeros_like(neigh, dtype=bool)], axis=1
        )
        top_scores, top_idx = jax.lax.top_k(all_scores, ef)
        new_ids = jnp.take_along_axis(all_ids, top_idx, axis=1)
        new_exp = jnp.take_along_axis(all_exp, top_idx, axis=1)
        new_exp = jnp.where(new_ids < 0, True, new_exp)
        return new_ids, top_scores, new_exp, it + 1, res_s, res_i

    st = (beam_ids, beam_scores, beam_exp, jnp.int32(0), res_scores, res_ids)
    beam_ids, beam_scores, _, _, res_scores, res_ids = jax.lax.while_loop(
        cond, body, st
    )

    # exact f32 rescore of the final set (one [B, ef]-row gather); filtered
    # searches rank the result accumulator, not the traversal beam
    out_ids = beam_ids if filter_bias is None else res_ids
    re = score_entries(out_ids)
    if filter_bias is not None:
        re = re + jnp.take(filter_bias, jnp.maximum(out_ids, 0))
        # the result set may hold duplicates (a node can re-enter after beam
        # eviction): keep each id's first occurrence only
        pos = jax.lax.broadcasted_iota(jnp.int32, out_ids.shape, 1)
        first = jnp.where(
            out_ids[:, :, None] == out_ids[:, None, :], pos[:, None, :],
            out_ids.shape[1],
        ).min(axis=2)
        re = jnp.where(first < pos, NEG_INF, re)
    top_s, ti = jax.lax.top_k(re, k)
    top_i = jnp.take_along_axis(out_ids, ti, axis=1)
    top_i = jnp.where(jnp.isfinite(top_s), top_i, -1)
    return top_s, top_i
