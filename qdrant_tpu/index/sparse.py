"""Sparse vector storage + inverted index.

Reference: lib/sparse/ (InvertedIndexRam / compressed / mmap variants,
vector storage in lib/segment's sparse storages) and the IDF modifier
(lib/segment/src/index/vector_index_base.rs:57 fill_idf_statistics).

Host keeps per-point sparse rows (mutable, append-only); sealing compacts a
CSR inverted index whose flat arrays are shipped to HBM for the segmented-
SpMV search kernel (ops/sparse.py). A mutable RAM postings dict serves
un-sealed points exactly, mirroring the reference's plain sparse search.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sparse import sparse_search
from ..types import SparseVector

# posting window cap on device: longest postings are truncated to the
# heaviest `WINDOW` entries (weight-sorted), qdrant-style pruning analogue
DEFAULT_WINDOW = 4096


class SparseVectorStore:
    """Per-point sparse rows, host-resident."""

    def __init__(self):
        self._indices: List[Optional[np.ndarray]] = []
        self._values: List[Optional[np.ndarray]] = []
        self._count = 0
        self._deleted_count = 0

    def __len__(self) -> int:
        return self._count

    @property
    def deleted_count(self) -> int:
        return self._deleted_count

    @property
    def available_count(self) -> int:
        return self._count - self._deleted_count

    def add(self, vectors: List[SparseVector]) -> np.ndarray:
        offsets = []
        for vec in vectors:
            sv = vec.sorted()
            self._indices.append(np.asarray(sv.indices, dtype=np.int64))
            self._values.append(np.asarray(sv.values, dtype=np.float32))
            offsets.append(self._count)
            self._count += 1
        return np.asarray(offsets, dtype=np.int32)

    def set(self, offset: int, vector: SparseVector) -> None:
        sv = vector.sorted()
        if self._indices[offset] is None:
            self._deleted_count -= 1
        self._indices[offset] = np.asarray(sv.indices, dtype=np.int64)
        self._values[offset] = np.asarray(sv.values, dtype=np.float32)

    def delete(self, offset: int) -> bool:
        if offset >= self._count or self._indices[offset] is None:
            return False
        self._indices[offset] = None
        self._values[offset] = None
        self._deleted_count += 1
        return True

    def is_deleted(self, offset: int) -> bool:
        return offset >= self._count or self._indices[offset] is None

    def get(self, offset: int) -> Optional[SparseVector]:
        if self.is_deleted(offset):
            return None
        return SparseVector(
            self._indices[offset].tolist(), self._values[offset].tolist()
        )

    def iter_rows(self):
        for off in range(self._count):
            if self._indices[off] is not None:
                yield off, self._indices[off], self._values[off]

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        lens = np.asarray(
            [0 if i is None else len(i) for i in self._indices], dtype=np.int64
        )
        deleted = np.asarray([i is None for i in self._indices], dtype=bool)
        if self._count:
            all_idx = np.concatenate(
                [i for i in self._indices if i is not None]
                or [np.zeros(0, dtype=np.int32)]
            )
            all_val = np.concatenate(
                [v for v in self._values if v is not None]
                or [np.zeros(0, dtype=np.float32)]
            )
        else:
            all_idx = np.zeros(0, dtype=np.int32)
            all_val = np.zeros(0, dtype=np.float32)
        np.savez(
            os.path.join(path, "sparse.npz"),
            lens=lens,
            deleted=deleted,
            indices=all_idx,
            values=all_val,
        )

    @classmethod
    def load(cls, path: str) -> "SparseVectorStore":
        store = cls()
        file = os.path.join(path, "sparse.npz")
        if not os.path.exists(file):
            return store
        data = np.load(file)
        lens, deleted = data["lens"], data["deleted"]
        all_idx, all_val = data["indices"], data["values"]
        pos = 0
        for i, ln in enumerate(lens):
            if deleted[i]:
                store._indices.append(None)
                store._values.append(None)
                store._deleted_count += 1
            else:
                store._indices.append(all_idx[pos : pos + ln].copy())
                store._values.append(all_val[pos : pos + ln].copy())
            pos += int(ln)
            store._count += 1
        return store


class SparseIndex:
    """Inverted index over a SparseVectorStore with a device CSR mirror."""

    def __init__(self, store: SparseVectorStore, modifier: Optional[str] = None):
        self.store = store
        self.modifier = modifier  # None | "idf"
        self._dev: Optional[Tuple] = None
        self._dirty = True

    def invalidate(self) -> None:
        self._dirty = True

    def _build_csr(self):
        """Compact postings (dim → [offsets, weights] weight-sorted desc).

        Dimensions are arbitrary u32 ids (hashed vocabularies like BM25's
        murmur3 tokens), so the dim table is a dict dim → (start, len)
        rather than a dense array. Fully vectorized: one lexsort over all
        (dim, -|w|) pairs — the per-posting python-dict version cost minutes
        at SPLADE scale (1M rows × ~64 nnz)."""
        rows = list(self.store.iter_rows())
        if not rows:
            return (
                np.zeros(0, dtype=np.int32),
                np.zeros(0, dtype=np.float32),
                {},
            )
        all_dims = np.concatenate([r[1] for r in rows])
        all_w = np.concatenate([r[2] for r in rows]).astype(np.float32)
        all_offs = np.repeat(
            np.asarray([r[0] for r in rows], dtype=np.int32),
            np.asarray([len(r[1]) for r in rows], dtype=np.int64),
        )
        order = np.lexsort((-np.abs(all_w), all_dims))
        flat_ids = all_offs[order]
        flat_w = all_w[order]
        dims_sorted = all_dims[order]
        uniq, starts, counts = np.unique(
            dims_sorted, return_index=True, return_counts=True
        )
        dim_table: Dict[int, Tuple[int, int]] = {
            int(d): (int(s), int(c))
            for d, s, c in zip(uniq, starts, counts)
        }
        return flat_ids, flat_w, dim_table

    def _device(self):
        if self._dirty or self._dev is None:
            flat_ids, flat_w, dim_table = self._build_csr()
            # pad flat arrays so any window slice is in-bounds
            pad = DEFAULT_WINDOW
            flat_ids = np.concatenate(
                [flat_ids, np.full(pad, len(self.store), dtype=np.int32)]
            )
            flat_w = np.concatenate([flat_w, np.zeros(pad, dtype=np.float32)])
            n_pad = max(8, 1 << (max(len(self.store), 1) - 1).bit_length())
            self._dev = (
                jnp.asarray(flat_ids),
                jnp.asarray(flat_w),
                dim_table,
                n_pad,
            )
            # per-dim chunk max-weights (postings are weight-sorted, so a
            # chunk's max is its first entry) — drives impact-ordered chunk
            # selection at query time (the WAND max_next_weight analogue,
            # search_context.rs:25-80)
            self._chunk_maxes = {}
            w_host = flat_w[: len(flat_w) - DEFAULT_WINDOW]
            for d, (start, ln) in dim_table.items():
                pos = np.arange(start, start + ln, DEFAULT_WINDOW)
                self._chunk_maxes[d] = np.abs(w_host[pos])
            self._dirty = False
            self._fwd = None  # forward rows rebuild lazily
        return self._dev

    def _forward_device(self):
        """Device forward rows [N_pad, J] (compact term ids + weights) for
        exact candidate rescoring. Term ids are the rank of each dim in the
        sorted dim table; rows longer than J keep their J heaviest entries.
        Returns None when the store is empty or the table would exceed the
        HBM budget (rescore then falls back to windowed scores)."""
        if getattr(self, "_fwd", None) is not None:
            return self._fwd
        flat_ids, flat_w, dim_table, n_pad = self._device()
        if not dim_table:
            return None
        sorted_dims = np.asarray(sorted(dim_table), dtype=np.int64)
        tid_of = {int(d): i for i, d in enumerate(sorted_dims)}
        rows = list(self.store.iter_rows())
        lens = [len(r[1]) for r in rows] or [1]
        j_need = int(np.percentile(lens, 99.5)) if lens else 1
        j = max(8, 1 << (max(j_need, 1) - 1).bit_length())
        j = min(j, 512)
        budget = int(
            os.environ.get("QDRANT_TPU_SPARSE_FWD_MAX_BYTES", 2_000_000_000)
        )
        if n_pad * j * 8 > budget:
            self._fwd = None
            return None
        terms = np.full((n_pad, j), -1, dtype=np.int32)
        weights = np.zeros((n_pad, j), dtype=np.float32)
        if rows:
            # fully vectorized: one searchsorted over every posting, then a
            # (row, within-row-position) scatter (a 1M-row python loop here
            # cost ~half the SPLADE-scale index build time)
            all_dims = np.concatenate([r[1] for r in rows])
            all_w = np.concatenate([r[2] for r in rows]).astype(np.float32)
            row_lens = np.asarray([len(r[1]) for r in rows], dtype=np.int64)
            all_offs = np.repeat(
                np.asarray([r[0] for r in rows], dtype=np.int64), row_lens
            )
            tids = np.searchsorted(sorted_dims, all_dims)
            tids = np.clip(tids, 0, len(sorted_dims) - 1)
            valid = sorted_dims[tids] == all_dims
            starts = np.concatenate([[0], np.cumsum(row_lens)[:-1]])
            within = np.arange(len(all_dims)) - np.repeat(starts, row_lens)
            keep = valid & (within < j)  # rows beyond J keep their first J
            terms[all_offs[keep], within[keep]] = tids[keep].astype(np.int32)
            weights[all_offs[keep], within[keep]] = all_w[keep]
        self._fwd = (jnp.asarray(terms), jnp.asarray(weights), tid_of)
        return self._fwd

    def idf(self, dim: int) -> float:
        """BM25-style IDF (reference: idf_statistics / modifier=idf)."""
        _, _, dim_table, _ = self._device()
        n = self.store.available_count
        df = dim_table.get(int(dim), (0, 0))[1]
        return math.log(((n - df + 0.5) / (df + 0.5)) + 1.0)

    def remap_query(self, query: SparseVector) -> SparseVector:
        if self.modifier == "idf":
            return SparseVector(
                list(query.indices),
                [w * self.idf(d) for d, w in zip(query.indices, query.values)],
            )
        return query

    def search(
        self,
        queries: List[SparseVector],
        k: int,
        filter_mask: Optional[np.ndarray] = None,
        window: int = DEFAULT_WINDOW,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (scores [B, k], offsets [B, k]); -1 = no result.

        Two-phase (reference: search_context.rs exact merge with
        max_next_weight pruning): a windowed SpMV over the heaviest
        postings yields candidates, then the top max(4k, 128) candidates
        are EXACTLY rescored against the device forward rows, recovering
        the ordering that posting-window truncation loses on hot SPLADE
        terms. QDRANT_TPU_SPARSE_EXACT=1 instead chunks EVERY posting
        through the SpMV (exact scores for all points, higher cost).
        QDRANT_TPU_SPARSE_RESCORE=0 disables phase 2."""
        flat_ids, flat_w, dim_table, n_pad = self._device()
        b = len(queries)
        queries = [self.remap_query(q) for q in queries]
        from ..utils.flags import flag_env

        exact = flag_env("sparse_exact_search", "QDRANT_TPU_SPARSE_EXACT")
        rescore = (
            not exact
            and os.environ.get("QDRANT_TPU_SPARSE_RESCORE", "1") != "0"
        )

        entries = []  # per query: [(start, len, weight), ...] posting chunks
        max_chunks = int(
            os.environ.get("QDRANT_TPU_SPARSE_MAX_CHUNKS", 4096)
        )
        # candidate-generation budget: how many posting chunks each query
        # may touch, allocated across terms by IMPACT (query weight x chunk
        # max weight — the WAND max_next_weight bound). One chunk per term
        # only covers each term's heaviest postings; at SPLADE scale the
        # true top-k accumulate from mid-weight postings of many terms, so
        # the budget must reach deep chunks of impactful terms (measured:
        # first-chunk-only candidate recall collapses to 0.26 at 1M).
        budget = int(os.environ.get("QDRANT_TPU_SPARSE_CHUNK_BUDGET", 512))
        for q in queries:
            row = []
            if exact:
                for d, w in zip(q.indices, q.values):
                    entry = dim_table.get(int(d))
                    if entry is None:
                        continue
                    start, ln = entry
                    off = 0
                    while off < ln and len(row) < max_chunks:
                        row.append((start + off, min(window, ln - off), w))
                        off += window
            else:
                chunks = []  # (impact, start, len, w)
                for d, w in zip(q.indices, q.values):
                    entry = dim_table.get(int(d))
                    if entry is None:
                        continue
                    start, ln = entry
                    maxes = self._chunk_maxes.get(int(d))
                    n_ch = len(maxes) if maxes is not None else 1
                    for j in range(n_ch):
                        off = j * window
                        impact = abs(w) * (
                            float(maxes[j]) if maxes is not None else 1.0
                        )
                        chunks.append(
                            (impact, start + off, min(window, ln - off), w)
                        )
                chunks.sort(key=lambda t: -t[0])
                row = [(s, ln, w) for _imp, s, ln, w in chunks[:budget]]
            entries.append(row)
        t_max = max([len(r) for r in entries] + [1])
        t_pad = max(8, 1 << (t_max - 1).bit_length())
        q_starts = np.full((b, t_pad), -1, dtype=np.int32)
        q_lens = np.zeros((b, t_pad), dtype=np.int32)
        q_w = np.zeros((b, t_pad), dtype=np.float32)
        for i, row in enumerate(entries):
            for j, (s, ln, w) in enumerate(row):
                q_starts[i, j] = s
                q_lens[i, j] = ln
                q_w[i, j] = w

        fwd = self._forward_device() if rescore else None
        c_min = int(os.environ.get("QDRANT_TPU_SPARSE_CANDIDATES", 512))
        k_fetch = (
            min(max(4 * k, c_min), n_pad) if fwd is not None else min(k, n_pad)
        )
        scores, ids = sparse_search(
            flat_ids,
            flat_w,
            jnp.asarray(q_starts),
            jnp.asarray(q_lens),
            jnp.asarray(q_w),
            window,
            n_pad,
            k_fetch,
            _mask_to_dev(filter_mask, n_pad, len(self.store)),
        )
        if fwd is not None:
            from ..ops.sparse import rescore_sparse_candidates

            row_terms, row_weights, tid_of = fwd
            v = len(tid_of)
            qvec = np.zeros((b, v), dtype=np.float32)
            for i, q in enumerate(queries):
                for d, w in zip(q.indices, q.values):
                    tid = tid_of.get(int(d))
                    if tid is not None:
                        qvec[i, tid] += w
            cand = jnp.where(
                jnp.isfinite(scores), ids, -1
            )
            exact_scores = rescore_sparse_candidates(
                cand, row_terms, row_weights, jnp.asarray(qvec)
            )
            k_eff = min(k, k_fetch)
            top_s, ti = jax.lax.top_k(exact_scores, k_eff)
            scores = top_s
            ids = jnp.take_along_axis(cand, ti, axis=1)
        else:
            k_eff = min(k, n_pad)
            scores, ids = scores[:, :k_eff], ids[:, :k_eff]
        scores = np.asarray(scores, dtype=np.float32)
        ids = np.asarray(ids, dtype=np.int32)
        ids = np.where(np.isfinite(scores), ids, -1)
        if k_eff < k:
            scores = np.pad(scores, ((0, 0), (0, k - k_eff)), constant_values=-np.inf)
            ids = np.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
        return scores, ids


def _mask_to_dev(filter_mask: Optional[np.ndarray], n_pad: int, n: int):
    mask = np.zeros(n_pad, dtype=bool)
    if filter_mask is not None:
        mask[: len(filter_mask)] = filter_mask[:n_pad]
    else:
        mask[:n] = True
    return jnp.asarray(mask)
