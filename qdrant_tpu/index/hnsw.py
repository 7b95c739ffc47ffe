"""TPU-native HNSW index: batched build + batched beam-search queries.

Reference behavior: lib/segment/src/index/hnsw_index/ (hnsw.rs, graph_layers.rs,
graph_layers_builder.rs) and the GPU batched builder
(gpu/gpu_graph_builder.rs:19-60). Re-architected for TPU:

  * Fixed-degree adjacency tables per level (`[count_l, M]` int32, -1-padded)
    live in HBM; level membership via a single `rank` permutation (points
    sorted by level, so "first count_l ranks" = "on level l"), the dense
    equivalent of the reference's level-sorted CSR reindex
    (graph_links/mod.rs:45-80).
  * Build follows the GPU builder's scheme: geometric level assignment,
    a brute-force-linked seed set, then batches of points inserted in
    lockstep — batched beam search for candidates, heuristic selection and
    reverse-link pruning all run on device; the host only computes scatter
    indices.
  * Queries: batched greedy descent on upper levels, batched beam search on
    level 0, filter masks fused in (see ops/hnsw.py).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hnsw as hnsw_ops
from ..ops.distances import preprocess_vectors
from ..storage.vectors import DenseVectorStore
from ..types import Distance, HnswConfig


def _pow2_at_least(x: int, minimum: int = 8) -> int:
    p = minimum
    while p < x:
        p *= 2
    return p


def _pad_rows(arr: np.ndarray, rows: int, fill) -> np.ndarray:
    if arr.shape[0] >= rows:
        return arr[:rows]
    pad_shape = (rows - arr.shape[0],) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, dtype=arr.dtype)], axis=0)


class HnswIndex:
    def __init__(self, store: DenseVectorStore, config: HnswConfig, seed: int = 42):
        self.store = store
        self.config = config
        self.seed = seed
        self.distance: Distance = store.distance
        # graph state (populated by build/load)
        self.levels: Optional[np.ndarray] = None  # [n] int32, -1 = not in graph
        self.rank: Optional[np.ndarray] = None  # [n] int32 level-sort permutation rank
        self.entry: int = -1
        self.max_level: int = -1
        self.level_counts: Dict[int, int] = {}
        self.links_host: Dict[int, np.ndarray] = {}  # level → [rows, M_l] int32
        self.link_counts: Dict[int, np.ndarray] = {}  # level → [rows] int32
        self._links_dev: Dict[int, jax.Array] = {}
        self._rank_dev: Optional[jax.Array] = None

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _m_at(self, level: int) -> int:
        return self.config.m0 if level == 0 else self.config.m

    def _links_dev_at(self, level: int) -> jax.Array:
        if level not in self._links_dev:
            self._links_dev[level] = jnp.asarray(self.links_host[level])
        return self._links_dev[level]

    def _rank_device(self) -> jax.Array:
        if self._rank_dev is None:
            cap = self.store.device_block()[0].shape[0]
            rank = _pad_rows(self.rank, cap, -1)
            self._rank_dev = jnp.asarray(rank)
        return self._rank_dev

    def _scatter(self, level: int, rows: np.ndarray, values: np.ndarray) -> None:
        """Write full link rows on host mirror + device."""
        self.links_host[level][rows] = values
        self.link_counts[level][rows] = (values >= 0).sum(axis=1).astype(np.int32)
        if level in self._links_dev:
            self._links_dev[level] = hnsw_ops.scatter_link_rows(
                self._links_dev[level], rows, values
            )

    def _row_of(self, level: int, ids: np.ndarray) -> np.ndarray:
        """Global ids → link-table rows at `level` (level 0 = identity)."""
        if level == 0:
            return ids
        return self.rank[ids]

    # ------------------------------------------------------------------
    # build
    # ------------------------------------------------------------------

    def build(
        self,
        batch_size: int = 1024,
        ef_construct: Optional[int] = None,
        progress_fn=None,
    ) -> None:
        """Build the graph over all non-deleted points in the store."""
        n = len(self.store)
        efc = ef_construct or self.config.ef_construct
        m = self.config.m
        rng = np.random.default_rng(self.seed)

        alive = ~self.store.deleted_mask
        alive_ids = np.nonzero(alive)[0].astype(np.int32)
        n_alive = len(alive_ids)

        # geometric level assignment (reference: graph_layers_builder.rs:388-396)
        ml = 1.0 / np.log(max(m, 2))
        u = rng.random(n_alive)
        levels_alive = np.floor(-np.log(np.clip(u, 1e-12, 1.0)) * ml).astype(np.int32)

        self.levels = np.full(n, -1, dtype=np.int32)
        self.levels[alive_ids] = levels_alive

        if n_alive == 0:
            self.rank = np.full(n, -1, dtype=np.int32)
            self.entry = -1
            self.max_level = -1
            self.level_counts = {}
            self.links_host = {}
            self.link_counts = {}
            return

        # sort by level desc with random tiebreak
        tiebreak = rng.random(n_alive)
        order = alive_ids[np.lexsort((tiebreak, -levels_alive))]
        self.rank = np.full(n, -1, dtype=np.int32)
        self.rank[order] = np.arange(len(order), dtype=np.int32)
        self.entry = int(order[0])
        self.max_level = int(self.levels[self.entry])

        self.level_counts = {
            l: int((levels_alive >= l).sum()) for l in range(self.max_level + 1)
        }
        self.links_host = {}
        self.link_counts = {}
        for l in range(self.max_level + 1):
            rows = n if l == 0 else self.level_counts[l]
            rows_pad = _pow2_at_least(max(rows, 1))
            self.links_host[l] = np.full((rows_pad, self._m_at(l)), -1, dtype=np.int32)
            self.link_counts[l] = np.zeros(rows_pad, dtype=np.int32)
        self._links_dev = {}
        self._rank_dev = None

        vectors, _ = self.store.device_block()
        dist = self.distance.value

        # ---- seed graph: brute-force link the first points --------------
        n_seed = min(n_alive, max(2 * efc, 128))
        seed_ids = order[:n_seed]
        self._build_seed_graph(seed_ids, vectors, dist)

        # ---- batched insertion ------------------------------------------
        inserted = n_seed
        cur_batch = 128
        while inserted < n_alive:
            bsz = min(cur_batch, n_alive - inserted)
            batch = order[inserted : inserted + bsz]
            self._insert_batch(batch, vectors, efc, dist)
            inserted += bsz
            cur_batch = min(cur_batch * 2, batch_size)
            if progress_fn:
                progress_fn(inserted, n_alive)

    def _build_seed_graph(self, seed_ids: np.ndarray, vectors, dist: str) -> None:
        """All-pairs heuristic linking of the seed set on device."""
        from ..ops.distances import pairwise_scores

        s = len(seed_ids)
        seed_dev = jnp.asarray(seed_ids)
        seed_vecs = jnp.take(vectors, seed_dev, axis=0)[None]  # [1, S, D]
        pair = pairwise_scores(seed_vecs, seed_vecs, dist)[0]  # [S, S]
        pair_np = np.array(pair, dtype=np.float32)  # writable copy
        np.fill_diagonal(pair_np, -np.inf)

        seed_levels = self.levels[seed_ids]
        for l in range(0, int(seed_levels.max()) + 1):
            members = np.nonzero(seed_levels >= l)[0]
            if len(members) == 0:
                continue
            m_l = self._m_at(l)
            sub = pair_np[np.ix_(members, members)]  # [K, K]
            order_idx = np.argsort(-sub, axis=1)
            k = len(members)
            cand_ids = seed_ids[members[order_idx]].astype(np.int32)  # [K, K] global
            cand_ids[~np.isfinite(np.take_along_axis(sub, order_idx, axis=1))] = -1
            c_pad = _pow2_at_least(k, 16)
            cand_pad = _pad_rows(cand_ids.T, c_pad, -1).T  # pad candidate axis
            scores_pad = _pad_rows(
                np.take_along_axis(sub, order_idx, axis=1).T, c_pad, -np.inf
            ).T
            sel = hnsw_ops.reprune_rows(
                jnp.asarray(seed_ids[members]),
                jnp.asarray(cand_pad),
                vectors,
                m_l,
                dist,
            )
            sel_np = np.asarray(sel, dtype=np.int32)
            rows = self._row_of(l, seed_ids[members])
            self._scatter(l, rows, sel_np)

    def _insert_batch(self, batch: np.ndarray, vectors, efc: int, dist: str) -> None:
        b = len(batch)
        b_pad = _pow2_at_least(b, 8)
        qs = self.store.get_batch(batch).astype(np.float32)  # already preprocessed
        qs = _pad_rows(qs, b_pad, 0.0)
        q_dev = jnp.asarray(qs)
        batch_levels = self.levels[batch]  # desc sorted
        batch_max = int(batch_levels[0])
        rank_dev = self._rank_device()

        # entry state
        ents = np.full((b_pad, 1), -1, dtype=np.int32)
        ents[:b, 0] = self.entry
        ent_is_beam = False
        ent_dev = jnp.asarray(ents)

        for l in range(self.max_level, -1, -1):
            kl = int((batch_levels >= l).sum())
            links_l = self._links_dev_at(l)
            compact = None if l == 0 else rank_dev
            if kl == 0:
                # pure descent level: greedy from current single entry
                cur = ent_dev[:, 0]
                cur_scores = hnsw_ops.score_ids_batch(
                    q_dev, vectors, cur[:, None], dist
                )[:, 0]
                if l > 0:
                    cur, _ = hnsw_ops.greedy_descend_level(
                        q_dev, vectors, links_l, rank_dev, cur, cur_scores, dist
                    )
                ent_dev = cur[:, None]
                ent_is_beam = False
                continue

            # beam-search this level for candidate neighbors
            max_iters = int(efc * 1.2) + 16
            beam_scores, beam_ids = hnsw_ops.beam_search_level(
                q_dev,
                vectors,
                links_l,
                ent_dev,
                None,
                efc,
                max_iters,
                dist,
                compact_of=compact,
            )
            m_l = self._m_at(l)
            sel = hnsw_ops.select_neighbors(beam_ids, beam_scores, vectors, m_l, dist)
            sel_np = np.asarray(sel, dtype=np.int32)[:kl]

            # forward links
            rows = self._row_of(l, batch[:kl])
            self._scatter(l, rows, sel_np)
            # reverse links
            self._apply_reverse_links(l, batch[:kl], sel_np, vectors, dist)

            ent_dev = beam_ids
            ent_is_beam = True

    def _apply_reverse_links(
        self, level: int, points: np.ndarray, sel: np.ndarray, vectors, dist: str
    ) -> None:
        """Add `points` to their selected neighbors' link rows, repruning
        overflowed rows with the device heuristic."""
        cap = self._m_at(level)
        nb_flat = sel.reshape(-1)
        p_flat = np.repeat(points.astype(np.int32), sel.shape[1])
        ok = nb_flat >= 0
        nb_flat, p_flat = nb_flat[ok], p_flat[ok]
        if len(nb_flat) == 0:
            return

        max_inc_per_round = 2 * cap
        while len(nb_flat) > 0:
            sort_idx = np.argsort(nb_flat, kind="stable")
            nb_s, p_s = nb_flat[sort_idx], p_flat[sort_idx]
            uniq, starts, counts = np.unique(nb_s, return_index=True, return_counts=True)
            within = np.arange(len(nb_s)) - np.repeat(starts, counts)
            # defer pairs beyond the per-round cap to the next round
            defer = within >= max_inc_per_round
            next_nb, next_p = nb_s[defer], p_s[defer]
            nb_s, p_s, within = nb_s[~defer], p_s[~defer], within[~defer]
            uniq, starts, counts = np.unique(nb_s, return_index=True, return_counts=True)

            rows_u = self._row_of(level, uniq)
            cur_counts = self.link_counts[level][rows_u]
            free = cap - cur_counts
            fits = counts <= free

            # --- direct placement (no overflow) ---
            fit_mask_pairs = np.repeat(fits, counts)
            if fit_mask_pairs.any():
                nb_fit = nb_s[fit_mask_pairs]
                p_fit = p_s[fit_mask_pairs]
                within_fit = within[fit_mask_pairs]
                rows_fit = self._row_of(level, nb_fit)
                slots = self.link_counts[level][rows_fit] + within_fit
                self.links_host[level][rows_fit, slots] = p_fit
                # update counts per unique nb
                u_fit = uniq[fits]
                self.link_counts[level][self._row_of(level, u_fit)] += counts[fits].astype(
                    np.int32
                )
                if level in self._links_dev:
                    upd_rows = self._row_of(level, u_fit)
                    self._links_dev[level] = hnsw_ops.scatter_link_rows(
                        self._links_dev[level], upd_rows, self.links_host[level][upd_rows]
                    )

            # --- overflow: device reprune ---
            over = ~fits
            if over.any():
                u_over = uniq[over]
                k = len(u_over)
                rows_over = self._row_of(level, u_over)
                inc_max = int(counts[over].max())
                c_total = cap + inc_max
                cands = np.full((k, c_total), -1, dtype=np.int32)
                cands[:, :cap] = self.links_host[level][rows_over]
                # place incoming
                over_pair = np.repeat(over, counts)
                nb_o, p_o, w_o = nb_s[over_pair], p_s[over_pair], within[over_pair]
                nb_to_k = {int(v): i for i, v in enumerate(u_over)}
                k_idx = np.fromiter((nb_to_k[int(v)] for v in nb_o), dtype=np.int64)
                cands[k_idx, cap + w_o] = p_o

                k_pad = _pow2_at_least(k, 8)
                c_pad = _pow2_at_least(c_total, 16)
                cands_p = np.full((k_pad, c_pad), -1, dtype=np.int32)
                cands_p[:k, :c_total] = cands
                nb_p = np.zeros(k_pad, dtype=np.int32)
                nb_p[:k] = u_over
                new_rows = np.asarray(
                    hnsw_ops.reprune_rows(
                        jnp.asarray(nb_p), jnp.asarray(cands_p), vectors, cap, dist
                    ),
                    dtype=np.int32,
                )[:k]
                self._scatter(level, rows_over, new_rows)

            nb_flat, p_flat = next_nb, next_p

    # ------------------------------------------------------------------
    # search
    # ------------------------------------------------------------------

    def search(
        self,
        queries: np.ndarray,  # [B, D] raw queries
        k: int,
        ef: Optional[int] = None,
        filter_mask: Optional[np.ndarray] = None,  # [n] bool
    ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (scores [B, k], offsets [B, k]), -1 padded."""
        if self.entry < 0:
            return (
                np.full((len(np.atleast_2d(queries)), k), -np.inf, dtype=np.float32),
                np.full((len(np.atleast_2d(queries)), k), -1, dtype=np.int32),
            )
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        b = queries.shape[0]
        b_pad = _pow2_at_least(b, 8)
        q = _pad_rows(preprocess_vectors(queries, self.distance), b_pad, 0.0)
        q_dev = jnp.asarray(q)
        vectors, _ = self.store.device_block()
        dist = self.distance.value
        ef_eff = max(ef or self.config.ef_construct, k)

        rank_dev = self._rank_device()
        cur = jnp.full((b_pad,), self.entry, dtype=jnp.int32)
        cur_scores = hnsw_ops.score_ids_batch(q_dev, vectors, cur[:, None], dist)[:, 0]
        for l in range(self.max_level, 0, -1):
            cur, cur_scores = hnsw_ops.greedy_descend_level(
                q_dev, vectors, self._links_dev_at(l), rank_dev, cur, cur_scores, dist
            )

        mask_dev = None
        if filter_mask is not None:
            cap = vectors.shape[0]
            fm = np.zeros(cap, dtype=bool)
            fm[: len(filter_mask)] = filter_mask
            mask_dev = jnp.asarray(fm)

        max_iters = 2 * ef_eff + 16
        beam_scores, beam_ids = hnsw_ops.beam_search_level(
            q_dev,
            vectors,
            self._links_dev_at(0),
            cur[:, None],
            mask_dev,
            ef_eff,
            max_iters,
            dist,
        )
        scores = np.asarray(beam_scores, dtype=np.float32)[:b]
        ids = np.asarray(beam_ids, dtype=np.int32)[:b]
        # entries bypass the filter inside the kernel; enforce it here
        if filter_mask is not None:
            ok = (ids >= 0) & filter_mask[np.maximum(ids, 0)]
            scores = np.where(ok, scores, -np.inf)
            ids = np.where(ok, ids, -1)
            order = np.argsort(-scores, axis=1, kind="stable")
            scores = np.take_along_axis(scores, order, axis=1)
            ids = np.take_along_axis(ids, order, axis=1)
        ids = np.where(np.isfinite(scores), ids, -1)
        if k <= scores.shape[1]:
            return scores[:, :k], ids[:, :k]
        pad = k - scores.shape[1]
        return (
            np.pad(scores, ((0, 0), (0, pad)), constant_values=-np.inf),
            np.pad(ids, ((0, 0), (0, pad)), constant_values=-1),
        )

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        arrays = {"levels": self.levels, "rank": self.rank}
        for l, links in self.links_host.items():
            arrays[f"links_{l}"] = links
            arrays[f"counts_{l}"] = self.link_counts[l]
        np.savez_compressed(os.path.join(path, "hnsw_graph.npz"), **arrays)
        with open(os.path.join(path, "hnsw_meta.json"), "w") as f:
            json.dump(
                {
                    "entry": self.entry,
                    "max_level": self.max_level,
                    "level_counts": self.level_counts,
                    "m": self.config.m,
                    "ef_construct": self.config.ef_construct,
                },
                f,
            )

    @classmethod
    def load(cls, path: str, store: DenseVectorStore, config: HnswConfig) -> "HnswIndex":
        idx = cls(store, config)
        with open(os.path.join(path, "hnsw_meta.json")) as f:
            meta = json.load(f)
        idx.entry = meta["entry"]
        idx.max_level = meta["max_level"]
        idx.level_counts = {int(k): v for k, v in meta["level_counts"].items()}
        data = np.load(os.path.join(path, "hnsw_graph.npz"))
        idx.levels = data["levels"]
        idx.rank = data["rank"]
        for l in range(idx.max_level + 1):
            idx.links_host[l] = data[f"links_{l}"]
            idx.link_counts[l] = data[f"counts_{l}"]
        return idx
