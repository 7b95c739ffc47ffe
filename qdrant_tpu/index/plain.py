"""Plain (exact full-scan) vector index.

Reference: lib/segment/src/index/plain_vector_index/ (584 LoC). On TPU this
is one fused program: Q @ V.T on the MXU + masking + on-device top-k; only
[B, k] scores/ids return to the host.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.distances import preprocess_vectors, score_and_topk, score_ids_batch
from ..storage.vectors import DenseVectorStore
from ..types import Distance

# Above this size, full materialization of [B, N] scores + full top_k is
# slower than the blocked-scan group-reduction kernel (ops/scan.py).
SCAN_THRESHOLD = 65536


class PlainIndex:
    def __init__(self, store: DenseVectorStore):
        self.store = store

    def search(
        self,
        queries: np.ndarray,  # [B, D] raw (un-preprocessed) queries
        k: int,
        filter_mask: Optional[np.ndarray] = None,  # [n] bool over offsets
    ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (scores [B, k], offsets [B, k]); offset -1 = no result."""
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        q = preprocess_vectors(queries, self.store.distance)
        if (
            len(self.store) >= SCAN_THRESHOLD
            and self.store.distance is not Distance.MANHATTAN
        ):
            return self._scan_search(q, k, filter_mask)
        vectors, valid = self.store.device_block()
        if filter_mask is not None:
            fm = np.zeros(vectors.shape[0], dtype=bool)
            fm[: len(filter_mask)] = filter_mask
            valid = jnp.logical_and(valid, jnp.asarray(fm))
        k_eff = min(k, int(vectors.shape[0]))
        scores, ids = score_and_topk(
            jnp.asarray(q), vectors, self.store.distance.value, k_eff, valid
        )
        scores = np.asarray(scores)
        ids = np.asarray(ids).astype(np.int32)
        ids = np.where(np.isfinite(scores), ids, -1)
        if k_eff < k:
            pad_s = np.full((scores.shape[0], k - k_eff), -np.inf, dtype=scores.dtype)
            pad_i = np.full((ids.shape[0], k - k_eff), -1, dtype=ids.dtype)
            scores = np.concatenate([scores, pad_s], axis=1)
            ids = np.concatenate([ids, pad_i], axis=1)
        return scores, ids

    def _scan_search(
        self, q: np.ndarray, k: int, filter_mask: Optional[np.ndarray]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Large-N path: blocked-scan group-reduction + exact f32 rescore of
        an oversampled candidate set (recovers exact ordering from the bf16
        scan scores)."""
        import jax

        from ..ops.scan import scan_search_rescore

        scan = self.store.scan_index()
        mask_dev = scan._mask
        if filter_mask is not None:
            combined = (~self.store.deleted_mask) & np.asarray(
                filter_mask[: len(self.store)], dtype=bool
            )
            mask_dev = scan.mask_device(combined)
        if scan.mesh is not None:
            # multi-device: SPMD sharded scan + per-shard rescore + ICI merge
            b = q.shape[0]
            b_pad = max(8, (b + 7) // 8 * 8)
            qp = np.zeros((b_pad, scan.d_pad), dtype=np.float32)
            qp[:b, : q.shape[1]] = q
            return scan._search_mesh(qp, q, b, k, mask_dev)
        k_fetch = min(max(2 * k, k + 8), scan.n)
        k_eff = min(k, k_fetch)
        vectors, _ = self.store.device_block()
        b = q.shape[0]
        b_pad = max(8, (b + 7) // 8 * 8)
        qp = np.zeros((b_pad, scan.d_pad), dtype=np.float32)
        qp[:b, : q.shape[1]] = q
        euclid = self.store.distance in (Distance.EUCLID,)
        if scan.use_pallas:
            # Pallas fused scan (bf16 in-kernel scores) → exact f32 rescore;
            # candidates stay device-resident between the two dispatches
            from ..ops.scan import rescore_topk

            _, cand = scan.pallas_candidates(qp, k_fetch, mask_dev)
            top_s, top_i = rescore_topk(
                jnp.asarray(q), cand, vectors, k_eff, euclid
            )
            scores = np.asarray(top_s, dtype=np.float32)[:b]
            ids = np.asarray(top_i, dtype=np.int32)[:b]
            ids = np.where(np.isfinite(scores), ids, -1)
            if k_eff < k:
                scores = np.pad(
                    scores, ((0, 0), (0, k - k_eff)), constant_values=-np.inf
                )
                ids = np.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
            return scores, ids
        top_s, top_i = scan_search_rescore(
            jnp.asarray(qp),
            scan._v,
            scan._vsq,
            mask_dev,
            vectors,  # rescore precision = storage dtype (f32 by default)
            scan.block,
            k_fetch,
            k_eff,
            euclid,
        )
        scores, ids = jax.device_get((top_s, top_i))
        scores = np.asarray(scores, dtype=np.float32)[:b]
        ids = np.asarray(ids, dtype=np.int32)[:b]
        ids = np.where(np.isfinite(scores), ids, -1)
        if k_eff < k:
            scores = np.pad(
                scores, ((0, 0), (0, k - k_eff)), constant_values=-np.inf
            )
            ids = np.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
        return scores, ids
