"""Batched HNSW graph traversal on TPU.

Replaces the reference's pointer-chasing, per-query graph search (reference:
lib/segment/src/index/hnsw_index/graph_layers.rs:108-243 `search_on_level`
and the Vulkan shader suite under index/hnsw_index/gpu/shaders/) with a
*batched, fixed-shape* formulation:

  * B queries advance in lockstep through a `lax.while_loop`.
  * Adjacency is a fixed-degree HBM-resident table `links [N, M]` (int32,
    -1-padded) — the TPU analogue of the reference's bitpacked CSR
    (graph_links/mod.rs:45-80); fixed degree turns neighbor expansion into a
    single gather of shape [B, M].
  * The beam (result set of size ef) is a sorted array updated with
    `lax.top_k` over the concat of beam + new candidates each step.
  * Visited handling: a per-query ring of expanded ids (one per iteration)
    plus dedup against the current beam — the dense-batch replacement for the
    reference's pooled visited bitsets (index/visited_pool.rs).

Scores follow the engine-wide convention: larger is better.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .distances import score_ids_batch

NEG_INF = float(-np.inf)


@functools.partial(jax.jit, static_argnames=("distance", "max_steps"))
def greedy_descend_level(
    queries: jax.Array,  # [B, D] f32 (preprocessed)
    vectors: jax.Array,  # [N, D]
    links: jax.Array,  # [Nl, M] int32 level-l adjacency (compact ids → global ids)
    compact_of: jax.Array,  # [N] int32 global id → compact id on this level (-1 absent)
    cur_ids: jax.Array,  # [B] int32 current (global) node per query
    cur_scores: jax.Array,  # [B] f32
    distance: str,
    max_steps: int = 128,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy best-neighbor descent on one upper level (reference:
    graph_layers.rs:247 `search_entry`), batched over queries."""

    def cond(state):
        _, _, improved, step = state
        return jnp.logical_and(jnp.any(improved), step < max_steps)

    def body(state):
        ids, scores, _, step = state
        compact = jnp.take(compact_of, ids)  # [B]
        neigh = jnp.take(links, jnp.maximum(compact, 0), axis=0)  # [B, M]
        neigh = jnp.where(compact[:, None] >= 0, neigh, -1)
        n_scores = score_ids_batch(queries, vectors, neigh, distance)  # [B, M]
        best = jnp.argmax(n_scores, axis=1)  # [B]
        best_score = jnp.take_along_axis(n_scores, best[:, None], axis=1)[:, 0]
        best_id = jnp.take_along_axis(neigh, best[:, None], axis=1)[:, 0]
        improved = best_score > scores
        new_ids = jnp.where(improved, best_id, ids)
        new_scores = jnp.where(improved, best_score, scores)
        return new_ids, new_scores, improved, step + 1

    init = (cur_ids, cur_scores, jnp.ones_like(cur_ids, dtype=bool), jnp.int32(0))
    ids, scores, _, _ = jax.lax.while_loop(cond, body, init)
    return ids, scores


@functools.partial(jax.jit, static_argnames=("distance", "max_steps"))
def greedy_descend_stack(
    queries: jax.Array,  # [B, D] f32
    vectors: jax.Array,  # [N, D]
    links_stack: jax.Array,  # [L, R, M] int32 — levels top..1, same row space
    compact_of: jax.Array,  # [N] int32 global id → row (level-sort rank)
    level_counts: jax.Array,  # [L] int32 — nodes on each stacked level
    cur_ids: jax.Array,  # [B] int32
    cur_scores: jax.Array,  # [B] f32
    distance: str,
    max_steps: int = 128,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy descent through ALL upper levels in one compiled program.

    The per-level loop is unrolled (L is small and static); each level runs
    the same while_loop as `greedy_descend_level`. Fusing levels removes
    L-1 host→device round trips per query batch — significant when the
    host↔TPU link has millisecond latency.
    """
    n_levels = links_stack.shape[0]
    for i in range(n_levels):
        links = links_stack[i]
        count = level_counts[i]

        def cond(state):
            _, _, improved, step = state
            return jnp.logical_and(jnp.any(improved), step < max_steps)

        def body(state):
            ids, scores, _, step = state
            row = jnp.take(compact_of, ids)
            ok = jnp.logical_and(row >= 0, row < count)
            neigh = jnp.take(links, jnp.maximum(row, 0), axis=0)
            neigh = jnp.where(ok[:, None], neigh, -1)
            n_scores = score_ids_batch(queries, vectors, neigh, distance)
            best = jnp.argmax(n_scores, axis=1)
            best_score = jnp.take_along_axis(n_scores, best[:, None], axis=1)[:, 0]
            best_id = jnp.take_along_axis(neigh, best[:, None], axis=1)[:, 0]
            improved = best_score > scores
            return (
                jnp.where(improved, best_id, ids),
                jnp.where(improved, best_score, scores),
                improved,
                step + 1,
            )

        init = (cur_ids, cur_scores, jnp.ones_like(cur_ids, dtype=bool), jnp.int32(0))
        cur_ids, cur_scores, _, _ = jax.lax.while_loop(cond, body, init)
    return cur_ids, cur_scores


@functools.partial(
    jax.jit, static_argnames=("ef", "max_iters", "distance", "expand")
)
def beam_search_acorn(
    queries: jax.Array,  # [B, D] f32
    vectors: jax.Array,  # [N, D]
    links: jax.Array,  # [Nl, M] int32
    entry_ids: jax.Array,  # [B, E] int32
    filter_mask: jax.Array,  # [N] bool — required
    ef: int,
    max_iters: int,
    distance: str,
    compact_of: Optional[jax.Array] = None,
    expand: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """Filtered beam search in the spirit of ACORN (reference:
    graph_layers.rs:154-243 2-hop filtered search): the beam traverses the
    UNFILTERED graph (so low-selectivity filters cannot strand it), while a
    separate result set accumulates only filter-matching candidates. The
    dense-batch equivalent of routing through non-matching nodes.
    """
    b = queries.shape[0]
    m = links.shape[1]
    e_x = expand
    iters = max(max_iters // e_x, 8)

    entry_scores = score_ids_batch(queries, vectors, entry_ids, distance)
    e = entry_ids.shape[1]
    pad = max(ef - e, 0)
    beam_ids = jnp.pad(entry_ids, ((0, 0), (0, pad)), constant_values=-1)[:, :ef]
    beam_scores = jnp.pad(entry_scores, ((0, 0), (0, pad)), constant_values=NEG_INF)[
        :, :ef
    ]
    order = jnp.argsort(-beam_scores, axis=1)
    beam_ids = jnp.take_along_axis(beam_ids, order, axis=1)
    beam_scores = jnp.take_along_axis(beam_scores, order, axis=1)
    beam_exp = beam_ids < 0
    visited = jnp.full((b, iters * e_x), -1, dtype=jnp.int32)
    # matching-results accumulator, seeded from matching entries
    ent_ok = jnp.take(filter_mask, jnp.maximum(beam_ids, 0)) & (beam_ids >= 0)
    res_ids = jnp.where(ent_ok, beam_ids, -1)
    res_scores = jnp.where(ent_ok, beam_scores, NEG_INF)

    def cond(state):
        beam_ids, beam_scores, beam_exp, visited, res_ids, res_scores, it = state
        has_cand = jnp.any(jnp.logical_and(~beam_exp, beam_ids >= 0))
        return jnp.logical_and(has_cand, it < iters)

    def body(state):
        beam_ids, beam_scores, beam_exp, visited, res_ids, res_scores, it = state
        cand_ok = jnp.logical_and(~beam_exp, beam_ids >= 0)
        pick_scores = jnp.where(cand_ok, beam_scores, NEG_INF)
        top_pick, pick_idx = jax.lax.top_k(pick_scores, e_x)
        pick_ids = jnp.take_along_axis(beam_ids, pick_idx, axis=1)
        pick_ids = jnp.where(jnp.isfinite(top_pick), pick_ids, -1)
        hit = jnp.zeros_like(beam_exp)
        hit = hit.at[jnp.arange(b)[:, None], pick_idx].set(jnp.isfinite(top_pick))
        beam_exp = jnp.logical_or(beam_exp, hit)
        visited = jax.lax.dynamic_update_slice(visited, pick_ids, (0, it * e_x))

        if compact_of is not None:
            row = jnp.take(compact_of, jnp.maximum(pick_ids, 0))
            row = jnp.where(pick_ids >= 0, row, -1)
        else:
            row = pick_ids
        neigh = jnp.take(links, jnp.maximum(row, 0), axis=0)
        neigh = jnp.where(row[:, :, None] >= 0, neigh, -1).reshape(b, e_x * m)

        dup_beam = jnp.any(neigh[:, :, None] == beam_ids[:, None, :], axis=2)
        dup_vis = jnp.any(neigh[:, :, None] == visited[:, None, :], axis=2)
        pos = jax.lax.broadcasted_iota(jnp.int32, (b, e_x * m), 1)
        first_pos = jnp.where(
            neigh[:, :, None] == neigh[:, None, :], pos[:, None, :], e_x * m
        ).min(axis=2)
        neigh = jnp.where(dup_beam | dup_vis | (first_pos < pos), -1, neigh)

        n_scores = score_ids_batch(queries, vectors, neigh, distance)

        # beam merge: UNfiltered traversal
        all_ids = jnp.concatenate([beam_ids, neigh], axis=1)
        all_scores = jnp.concatenate([beam_scores, n_scores], axis=1)
        all_exp = jnp.concatenate([beam_exp, jnp.zeros_like(neigh, dtype=bool)], axis=1)
        top_scores, top_idx = jax.lax.top_k(all_scores, ef)
        new_ids = jnp.take_along_axis(all_ids, top_idx, axis=1)
        new_exp = jnp.take_along_axis(all_exp, top_idx, axis=1)
        new_exp = jnp.where(new_ids < 0, True, new_exp)

        # results merge: matching candidates only (dedup vs current results)
        n_ok = jnp.take(filter_mask, jnp.maximum(neigh, 0)) & (neigh >= 0)
        dup_res = jnp.any(neigh[:, :, None] == res_ids[:, None, :], axis=2)
        cand_res = jnp.where(n_ok & ~dup_res, neigh, -1)
        cand_scores = jnp.where(cand_res >= 0, n_scores, NEG_INF)
        r_ids = jnp.concatenate([res_ids, cand_res], axis=1)
        r_scores = jnp.concatenate([res_scores, cand_scores], axis=1)
        rtop, ridx = jax.lax.top_k(r_scores, ef)
        res_ids_new = jnp.take_along_axis(r_ids, ridx, axis=1)
        res_ids_new = jnp.where(jnp.isfinite(rtop), res_ids_new, -1)

        return new_ids, top_scores, new_exp, visited, res_ids_new, rtop, it + 1

    state = (
        beam_ids,
        beam_scores,
        beam_exp,
        visited,
        res_ids,
        res_scores,
        jnp.int32(0),
    )
    _, _, _, _, res_ids, res_scores, _ = jax.lax.while_loop(cond, body, state)
    return res_scores, res_ids


def beam_search_level(
    queries: jax.Array,  # [B, D] f32
    vectors: jax.Array,  # [N, D]
    links: jax.Array,  # [Nl, M] int32 (-1 padded), rows indexed by compact id
    entry_ids: jax.Array,  # [B, E] int32 initial candidates (-1 padded)
    filter_mask: Optional[jax.Array],  # [N] bool — nodes allowed in results/expansion
    ef: int,
    max_iters: int,
    distance: str,
    compact_of: Optional[jax.Array] = None,  # [N] int32 global→row in `links`
    expand: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """Batched beam search on one level → (scores [B, ef], ids [B, ef]).

    Mirrors `search_on_level` (graph_layers.rs:108-148) with a TPU twist:
    each iteration expands the `expand` best unexpanded beam entries at once
    (same total neighbor gathers, ~expand× fewer loop iterations — the
    per-iteration gather-dispatch overhead dominates on TPU). Filtered-out
    nodes are skipped entirely (FilteredScorer.check_vector semantics,
    point_scorer.rs:79); entry points are scored even if filtered out so
    traversal can start anywhere — the host drops non-matching entries.
    """
    b = queries.shape[0]
    m = links.shape[1]
    e_x = expand
    iters = max(max_iters // e_x, 8)

    entry_scores = score_ids_batch(queries, vectors, entry_ids, distance)  # [B, E]

    e = entry_ids.shape[1]
    pad = max(ef - e, 0)
    beam_ids = jnp.pad(entry_ids, ((0, 0), (0, pad)), constant_values=-1)[:, :ef]
    beam_scores = jnp.pad(
        entry_scores, ((0, 0), (0, pad)), constant_values=NEG_INF
    )[:, :ef]
    order = jnp.argsort(-beam_scores, axis=1)
    beam_ids = jnp.take_along_axis(beam_ids, order, axis=1)
    beam_scores = jnp.take_along_axis(beam_scores, order, axis=1)
    beam_exp = beam_ids < 0  # invalid slots count as expanded
    visited = jnp.full((b, iters * e_x), -1, dtype=jnp.int32)

    if filter_mask is None:
        filter_mask = jnp.ones(vectors.shape[0], dtype=bool)

    def cond(state):
        beam_ids, beam_scores, beam_exp, visited, it = state
        has_cand = jnp.any(jnp.logical_and(~beam_exp, beam_ids >= 0))
        return jnp.logical_and(has_cand, it < iters)

    def body(state):
        beam_ids, beam_scores, beam_exp, visited, it = state
        cand_ok = jnp.logical_and(~beam_exp, beam_ids >= 0)  # [B, ef]
        pick_scores = jnp.where(cand_ok, beam_scores, NEG_INF)
        top_pick, pick_idx = jax.lax.top_k(pick_scores, e_x)  # [B, e_x]
        pick_ids = jnp.take_along_axis(beam_ids, pick_idx, axis=1)
        pick_ids = jnp.where(jnp.isfinite(top_pick), pick_ids, -1)

        # mark all picked slots expanded + record visits
        hit = jnp.zeros_like(beam_exp)
        hit = hit.at[
            jnp.arange(b)[:, None], pick_idx
        ].set(jnp.isfinite(top_pick))
        beam_exp = jnp.logical_or(beam_exp, hit)
        visited = jax.lax.dynamic_update_slice(visited, pick_ids, (0, it * e_x))

        # expand neighbors of all picked nodes (via the level's compact map)
        if compact_of is not None:
            row = jnp.take(compact_of, jnp.maximum(pick_ids, 0))
            row = jnp.where(pick_ids >= 0, row, -1)
        else:
            row = pick_ids
        neigh = jnp.take(links, jnp.maximum(row, 0), axis=0)  # [B, e_x, M]
        neigh = jnp.where(row[:, :, None] >= 0, neigh, -1).reshape(b, e_x * m)

        # drop neighbors failing the filter (not scored, not traversed)
        n_ok = jnp.take(filter_mask, jnp.maximum(neigh, 0))
        neigh = jnp.where(jnp.logical_and(neigh >= 0, n_ok), neigh, -1)

        # dedup against beam, visited set, and within the expansion itself
        dup_beam = jnp.any(neigh[:, :, None] == beam_ids[:, None, :], axis=2)
        dup_vis = jnp.any(neigh[:, :, None] == visited[:, None, :], axis=2)
        pos = jax.lax.broadcasted_iota(jnp.int32, (b, e_x * m), 1)
        first_pos = jnp.where(
            neigh[:, :, None] == neigh[:, None, :], pos[:, None, :], e_x * m
        ).min(axis=2)
        dup_self = first_pos < pos
        neigh = jnp.where(dup_beam | dup_vis | dup_self, -1, neigh)

        n_scores = score_ids_batch(queries, vectors, neigh, distance)  # [B, e_x*M]

        all_ids = jnp.concatenate([beam_ids, neigh], axis=1)
        all_scores = jnp.concatenate([beam_scores, n_scores], axis=1)
        all_exp = jnp.concatenate(
            [beam_exp, jnp.zeros_like(neigh, dtype=bool)], axis=1
        )
        top_scores, top_idx = jax.lax.top_k(all_scores, ef)
        new_ids = jnp.take_along_axis(all_ids, top_idx, axis=1)
        new_exp = jnp.take_along_axis(all_exp, top_idx, axis=1)
        new_exp = jnp.where(new_ids < 0, True, new_exp)

        return new_ids, top_scores, new_exp, visited, it + 1

    state = (beam_ids, beam_scores, beam_exp, visited, jnp.int32(0))
    beam_ids, beam_scores, _, _, _ = jax.lax.while_loop(cond, body, state)
    return beam_scores, beam_ids


@functools.partial(jax.jit, static_argnames=("m",))
def heuristic_select(
    cand_ids: jax.Array,  # [B, C] int32 sorted by score desc, -1 padded
    cand_scores: jax.Array,  # [B, C] score(candidate, base point)
    cand_pairwise: jax.Array,  # [B, C, C] score(candidate_i, candidate_j)
    m: int,
) -> jax.Array:
    """Batched HNSW neighbor-selection heuristic → selected ids [B, m].

    Reference: graph_layers_builder.rs:532-556 / links_container.rs —
    iterating candidates nearest-first, keep candidate c iff for every
    already-selected s: score(c, base) > score(c, s) (equivalently in
    distance terms: c is closer to the base than to any selected neighbor).
    Implemented as a `lax.scan` over the candidate axis with a running
    selected mask; all B rows advance in lockstep.
    """
    b, c = cand_ids.shape

    def step(carry, i):
        sel_mask, count = carry  # [B, C] bool, [B] int32
        pair_i = jax.lax.dynamic_slice_in_dim(cand_pairwise, i, 1, axis=1)[:, 0, :]
        # max score(c_i, s) over selected s
        masked = jnp.where(sel_mask, pair_i, NEG_INF)  # [B, C]
        closest_sel = jnp.max(masked, axis=1)  # [B]
        score_i = jax.lax.dynamic_slice_in_dim(cand_scores, i, 1, axis=1)[:, 0]
        id_i = jax.lax.dynamic_slice_in_dim(cand_ids, i, 1, axis=1)[:, 0]
        keep = (
            (id_i >= 0)
            & (count < m)
            & (score_i > closest_sel)
        )
        sel_mask = sel_mask.at[:, i].set(keep)
        count = count + keep.astype(jnp.int32)
        return (sel_mask, count), None

    init = (jnp.zeros((b, c), dtype=bool), jnp.zeros((b,), dtype=jnp.int32))
    (sel_mask, _), _ = jax.lax.scan(step, init, jnp.arange(c))

    # order: heuristic picks first (by candidate order), then the best pruned
    # candidates to fill remaining slots (hnswlib keep_pruned_connections —
    # without the fill, high-dim rows stay half-empty and recall suffers)
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, c), 1)
    valid = cand_ids >= 0
    key = jnp.where(
        sel_mask, 2 * c - pos, jnp.where(valid, c - pos, -1)
    )
    m_eff = min(m, c)
    _, idx = jax.lax.top_k(key, m_eff)
    out = jnp.take_along_axis(cand_ids, idx, axis=1)
    taken = jnp.take_along_axis(key, idx, axis=1) >= 0
    out = jnp.where(taken, out, -1)
    if m_eff < m:
        out = jnp.pad(out, ((0, 0), (0, m - m_eff)), constant_values=-1)
    return out


@functools.partial(jax.jit, static_argnames=("m",))
def simple_select(cand_ids: jax.Array, cand_scores: jax.Array, m: int) -> jax.Array:
    """Keep the m best candidates (no diversity heuristic) — used for upper
    levels with small M, mirroring the reference's plain selection fallback."""
    m_eff = min(m, cand_ids.shape[1])
    _, idx = jax.lax.top_k(cand_scores, m_eff)
    out = jnp.take_along_axis(cand_ids, idx, axis=1)
    sc = jnp.take_along_axis(cand_scores, idx, axis=1)
    out = jnp.where(jnp.isfinite(sc), out, -1)
    if m_eff < m:
        out = jnp.pad(out, ((0, 0), (0, m - m_eff)), constant_values=-1)
    return out


@functools.partial(jax.jit, static_argnames=("m", "distance"))
def select_neighbors(
    cand_ids: jax.Array,  # [B, C] int32 sorted by score desc (beam output)
    cand_scores: jax.Array,  # [B, C] score(candidate, new point)
    vectors: jax.Array,  # [N, D]
    m: int,
    distance: str,
) -> jax.Array:
    """Forward-link selection for a batch of newly inserted points."""
    cand_vecs = jnp.take(vectors, jnp.maximum(cand_ids, 0), axis=0)  # [B, C, D]
    from .distances import pairwise_scores

    pair = pairwise_scores(cand_vecs, cand_vecs, distance)  # [B, C, C]
    return heuristic_select(cand_ids, cand_scores, pair, m)


@functools.partial(jax.jit, static_argnames=("m", "distance"))
def reprune_rows(
    nb_ids: jax.Array,  # [K] int32 overflowed neighbor nodes
    cand_ids: jax.Array,  # [K, C] int32 existing links + incoming points, -1 pad
    vectors: jax.Array,  # [N, D]
    m: int,
    distance: str,
) -> jax.Array:
    """Re-apply the selection heuristic to overflowed link rows → [K, m].

    The batched equivalent of the reference's on-overflow link shrink during
    insertion (graph_layers_builder.rs:417 link_new_point's reverse step).
    """
    nb_vecs = jnp.take(vectors, nb_ids, axis=0).astype(jnp.float32)  # [K, D]
    scores = score_ids_batch(nb_vecs, vectors, cand_ids, distance)  # [K, C]
    order = jnp.argsort(-scores, axis=1)
    sorted_ids = jnp.take_along_axis(cand_ids, order, axis=1)
    sorted_scores = jnp.take_along_axis(scores, order, axis=1)
    from .distances import pairwise_scores

    sorted_vecs = jnp.take(vectors, jnp.maximum(sorted_ids, 0), axis=0)
    pair = pairwise_scores(sorted_vecs, sorted_vecs, distance)
    return heuristic_select(sorted_ids, sorted_scores, pair, m)


_scatter_rows_donated = jax.jit(
    lambda links, ids, rows: links.at[ids].set(rows), donate_argnums=0
)


def scatter_link_rows(links: jax.Array, ids, rows) -> jax.Array:
    """Functional in-place update of the device adjacency table (donated)."""
    return _scatter_rows_donated(
        links, jnp.asarray(np.asarray(ids, dtype=np.int32)), jnp.asarray(np.asarray(rows, dtype=np.int32))
    )
