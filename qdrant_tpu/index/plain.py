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


def finalize_device_result(
    scores_host, ids_host, b: int, k_eff: int, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Convert fetched device search output to the host (scores, ids)
    convention: trim padding rows, -1 out ids without a finite score, pad
    columns up to k. Shared by the sync, pipelined, and segment-dispatch
    paths so they cannot drift."""
    scores = np.asarray(scores_host, dtype=np.float32)[:b]
    ids = np.asarray(ids_host, dtype=np.int32)[:b]
    ids = np.where(np.isfinite(scores), ids, -1)
    if k_eff < k:
        scores = np.pad(
            scores, ((0, 0), (0, k - k_eff)), constant_values=-np.inf
        )
        ids = np.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return scores, ids


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
        scores_dev, ids_dev, b, k_eff = self.search_device(
            queries, k, filter_mask
        )
        return finalize_device_result(scores_dev, ids_dev, b, k_eff, k)

    def search_many(
        self,
        batches,  # iterable of [B_i, D] query batches
        k: int,
        filter_mask: Optional[np.ndarray] = None,
    ):
        """Pipelined multi-batch search: dispatch every batch before syncing
        any result, then fetch ALL results in one `jax.device_get` (a single
        host↔device round trip instead of one per batch — on a tunneled
        link each fresh-result download costs a full ~28 ms RTT, 3x the 1M
        scan itself). → list of (scores [B_i, k], ids [B_i, k]).

        This is the sustained-throughput serving shape: the micro-batcher /
        batch-search API hands every in-flight batch here and the device
        pipelines uploads, scans, and downloads."""
        import jax

        outs = [self.search_device(q, k, filter_mask) for q in batches]
        fetched = jax.device_get([(s, i) for s, i, _, _ in outs])
        return [
            finalize_device_result(s, i, b, k_eff, k)
            for (s, i), (_, _, b, k_eff) in zip(fetched, outs)
        ]

    def search_device(
        self,
        queries: np.ndarray,
        k: int,
        filter_mask: Optional[np.ndarray] = None,
    ):
        """Async variant: dispatches the search and returns DEVICE-resident
        (scores [B', k_eff], ids [B', k_eff], b, k_eff) without blocking on
        the result. Serving paths keep several batches in flight so device
        compute and the host↔device link pipeline instead of serializing
        (one synchronous round trip costs ~25 ms on a tunneled link — more
        than the 1M-row scan itself). Scores are exact (euclid: -(q-v)²)."""
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        q = preprocess_vectors(queries, self.store.distance)
        b = q.shape[0]
        if (
            len(self.store) >= SCAN_THRESHOLD
            and self.store.distance is not Distance.MANHATTAN
        ):
            return self._scan_search_device(q, k, filter_mask)
        vectors, valid = self.store.device_block()
        if filter_mask is not None:
            fm = np.zeros(vectors.shape[0], dtype=bool)
            fm[: len(filter_mask)] = filter_mask
            valid = jnp.logical_and(valid, jnp.asarray(fm))
        k_eff = min(k, int(vectors.shape[0]))
        scores, ids = score_and_topk(
            jnp.asarray(q), vectors, self.store.distance.value, k_eff, valid
        )
        return scores, ids, b, k_eff

    def _scan_search_device(
        self, q: np.ndarray, k: int, filter_mask: Optional[np.ndarray]
    ):
        """Large-N path: blocked-scan group-reduction + exact f32 rescore of
        an oversampled candidate set (recovers exact ordering from the bf16
        scan scores). One fused program; output stays on device."""
        from ..ops.scan import scan_search_rescore

        scan = self.store.scan_index()
        mask_dev = scan._mask
        if filter_mask is not None:
            combined = (~self.store.deleted_mask) & np.asarray(
                filter_mask[: len(self.store)], dtype=bool
            )
            mask_dev = scan.mask_device_cached(combined)
        b = q.shape[0]
        b_pad = max(8, (b + 7) // 8 * 8)
        qp = np.zeros((b_pad, scan.d_pad), dtype=np.float32)
        qp[:b, : q.shape[1]] = q
        if scan.mesh is not None:
            # multi-device: SPMD sharded scan + per-shard rescore + ICI merge
            s, ids = scan._search_mesh_device(qp, k, mask_dev)
            return s, ids, b, min(k, scan.n)
        k_fetch = min(max(2 * k, k + 8), scan.n)
        k_eff = min(k, k_fetch)
        vectors, _ = self.store.device_block()
        euclid = self.store.distance in (Distance.EUCLID,)
        if scan.use_pallas:
            # Pallas fused scan (bf16 in-kernel scores, VMEM-resident — the
            # XLA formulation is HBM-bound on its [B, blk] f32 score block)
            # + exact f32 rescore, ONE compiled program
            from ..ops.pallas_scan import pallas_scan_rescore

            qp_dev = jnp.asarray(qp)  # ONE upload (it is both scan + rescore query)
            qt, slots = scan.pallas_grid(b_pad, k_fetch)
            top_s, top_i = pallas_scan_rescore(
                qp_dev,
                qp_dev,
                scan._v,
                mask_dev,
                vectors,
                k_fetch,
                k_eff,
                blk=scan.block,
                qt=qt,
                slots=slots,
                euclid=euclid,
            )
            return top_s, top_i, b, k_eff
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
        return top_s, top_i, b, k_eff
