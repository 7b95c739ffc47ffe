"""Plain (exact full-scan) vector index.

Reference: lib/segment/src/index/plain_vector_index/ (584 LoC). On TPU this
is one fused program: Q @ V.T on the MXU + masking + on-device top-k; only
[B, k] scores/ids return to the host.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.distances import preprocess_vectors, score_and_topk
from ..storage.vectors import DenseVectorStore
from ..types import Distance


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
