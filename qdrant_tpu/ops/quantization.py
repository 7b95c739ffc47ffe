"""Quantized vector encoding + scoring on TPU.

Reference: lib/quantization/ (SQ-u8 encoded_vectors_u8.rs, PQ kmeans
encoded_vectors_pq.rs, BQ encoded_vectors_binary.rs) whose scoring runs in
hand-written SIMD C (lib/quantization/cpp/{sse.c,avx2.c,neon.c}). The TPU
formulation replaces u8×u8 SIMD dot products with int8 MXU matmuls:

  * SQ  — symmetric int8 per segment (quantile-clipped scale); score is one
    `q_i8 @ V_i8.T` int32 matmul scaled back to f32.
  * BQ  — sign bits held as int8 ±1 on device (packed bits on disk); score is
    the same MXU matmul (the XOR-popcount trick is a CPU-ism).
  * PQ  — per-subspace 256-centroid codebooks (k-means on host), query-time
    lookup tables; scores via LUT gathers summed over subspaces.

All quantized search goes through oversampling + f32 rescoring, mirroring
lib/segment/src/index/vector_index_search_common.rs:48.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Distance

NEG_INF = float(-np.inf)


# ---------------------------------------------------------------------------
# Scalar (int8) quantization
# ---------------------------------------------------------------------------


class ScalarQuantized:
    """Symmetric int8 quantization with quantile-clipped global scale."""

    def __init__(self, codes: np.ndarray, scale: float, norms_sq: np.ndarray):
        self.codes = codes  # [N, D] int8
        self.scale = float(scale)
        self.norms_sq = norms_sq  # [N] f32 — exact ||v||² of ORIGINAL vectors
        self._dev: Optional[Tuple[jax.Array, jax.Array]] = None

    @classmethod
    def encode(cls, vectors: np.ndarray, quantile: float = 0.99) -> "ScalarQuantized":
        v = np.asarray(vectors, dtype=np.float32)
        if v.size:
            bound = np.quantile(np.abs(v), quantile)
            bound = max(float(bound), 1e-12)
        else:
            bound = 1.0
        scale = bound / 127.0
        codes = np.clip(np.round(v / scale), -127, 127).astype(np.int8)
        norms_sq = (v * v).sum(axis=1).astype(np.float32)
        return cls(codes, scale, norms_sq)

    def device(self) -> Tuple[jax.Array, jax.Array]:
        if self._dev is None:
            self._dev = (jnp.asarray(self.codes), jnp.asarray(self.norms_sq))
        return self._dev

    def encode_queries(self, queries: np.ndarray) -> np.ndarray:
        return np.clip(np.round(queries / self.scale), -127, 127).astype(np.int8)

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.savez(
            os.path.join(path, "sq.npz"),
            codes=self.codes,
            scale=np.float64(self.scale),
            norms_sq=self.norms_sq,
        )

    @classmethod
    def load(cls, path: str) -> "ScalarQuantized":
        data = np.load(os.path.join(path, "sq.npz"))
        return cls(data["codes"], float(data["scale"]), data["norms_sq"])


@functools.partial(jax.jit, static_argnames=("distance",))
def score_sq(
    q_codes: jax.Array,  # [B, D] int8 quantized queries
    q_norms_sq: jax.Array,  # [B] f32 exact ||q||²
    codes: jax.Array,  # [N, D] int8
    norms_sq: jax.Array,  # [N] f32
    scale: jax.Array,  # scalar f32
    distance: str,
    valid_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Int8 MXU scoring → [B, N] f32 approximate scores."""
    dist = Distance(distance)
    dots = jax.lax.dot_general(
        q_codes,
        codes,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (scale * scale)
    if dist in (Distance.DOT, Distance.COSINE):
        scores = dots
    elif dist is Distance.EUCLID:
        scores = 2.0 * dots - q_norms_sq[:, None] - norms_sq[None, :]
    else:  # MANHATTAN has no exact matmul form; L2 proxy preserves ranking
        scores = 2.0 * dots - q_norms_sq[:, None] - norms_sq[None, :]
    if valid_mask is not None:
        scores = jnp.where(valid_mask[None, :], scores, NEG_INF)
    return scores


# ---------------------------------------------------------------------------
# Binary quantization
# ---------------------------------------------------------------------------


class BinaryQuantized:
    """Sign-bit quantization; device representation is int8 ±1.

    On-disk form is bit-packed (32× compression, like the reference);
    the HBM-resident ±1 int8 trades 4× memory for direct MXU scoring.
    """

    def __init__(self, signs: np.ndarray):
        self.signs = signs  # [N, D] int8 in {-1, +1}
        self._dev: Optional[jax.Array] = None

    @classmethod
    def encode(cls, vectors: np.ndarray) -> "BinaryQuantized":
        v = np.asarray(vectors, dtype=np.float32)
        signs = np.where(v >= 0, 1, -1).astype(np.int8)
        return cls(signs)

    def device(self) -> jax.Array:
        if self._dev is None:
            self._dev = jnp.asarray(self.signs)
        return self._dev

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        packed = np.packbits((self.signs > 0).astype(np.uint8), axis=1)
        np.savez(
            os.path.join(path, "bq.npz"), packed=packed, dim=np.int32(self.signs.shape[1])
        )

    @classmethod
    def load(cls, path: str) -> "BinaryQuantized":
        data = np.load(os.path.join(path, "bq.npz"))
        dim = int(data["dim"])
        bits = np.unpackbits(data["packed"], axis=1)[:, :dim]
        signs = np.where(bits > 0, 1, -1).astype(np.int8)
        return cls(signs)


@functools.partial(jax.jit, static_argnames=("distance",))
def score_bq(
    queries: jax.Array,  # [B, D] f32 raw (preprocessed) queries
    signs: jax.Array,  # [N, D] int8 ±1
    distance: str,
    valid_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Asymmetric binary scoring: f32 query against ±1 vectors (one matmul).

    For euclid, -||q - s||² ranks identically to dot(q, s) up to per-point
    constant D, so a single formulation serves all metrics.
    """
    scores = jax.lax.dot_general(
        queries.astype(jnp.float32),
        signs.astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if valid_mask is not None:
        scores = jnp.where(valid_mask[None, :], scores, NEG_INF)
    return scores


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------


def _kmeans(data: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Plain Lloyd k-means (vectorized numpy) for PQ codebook training."""
    rng = np.random.default_rng(seed)
    n = data.shape[0]
    if n <= k:
        centroids = np.zeros((k, data.shape[1]), dtype=np.float32)
        centroids[:n] = data
        return centroids
    centroids = data[rng.choice(n, size=k, replace=False)].astype(np.float32)
    for _ in range(iters):
        d2 = (
            (data * data).sum(1)[:, None]
            - 2.0 * data @ centroids.T
            + (centroids * centroids).sum(1)[None, :]
        )
        assign = d2.argmin(1)
        for c in range(k):
            members = data[assign == c]
            if len(members):
                centroids[c] = members.mean(0)
    return centroids


class ProductQuantized:
    """PQ codes + codebooks (reference: lib/quantization PQ, kmeans)."""

    CODEBOOK = 256

    def __init__(self, codes: np.ndarray, codebooks: np.ndarray):
        self.codes = codes  # [N, S] uint8
        self.codebooks = codebooks  # [S, 256, sub_dim] f32
        self._dev: Optional[jax.Array] = None

    @classmethod
    def encode(
        cls,
        vectors: np.ndarray,
        compression: str = "x16",
        sample: int = 20_000,
        iters: int = 12,
        seed: int = 7,
    ) -> "ProductQuantized":
        v = np.asarray(vectors, dtype=np.float32)
        n, d = v.shape
        # compression xR: R float32s (4R bytes) represented per 1 byte code
        ratio = int(compression.lstrip("x"))
        sub_dim = max(ratio // 4, 1)
        s = (d + sub_dim - 1) // sub_dim
        pad = s * sub_dim - d
        if pad:
            v = np.concatenate([v, np.zeros((n, pad), dtype=np.float32)], axis=1)
        rng = np.random.default_rng(seed)
        idx = rng.choice(n, size=min(n, sample), replace=False) if n else np.array([], int)
        codebooks = np.zeros((s, cls.CODEBOOK, sub_dim), dtype=np.float32)
        codes = np.zeros((n, s), dtype=np.uint8)
        for si in range(s):
            block = v[:, si * sub_dim : (si + 1) * sub_dim]
            codebooks[si] = _kmeans(block[idx], cls.CODEBOOK, iters, seed + si)
            d2 = (
                (block * block).sum(1)[:, None]
                - 2.0 * block @ codebooks[si].T
                + (codebooks[si] * codebooks[si]).sum(1)[None, :]
            )
            codes[:, si] = d2.argmin(1).astype(np.uint8)
        return cls(codes, codebooks)

    @property
    def sub_dim(self) -> int:
        return self.codebooks.shape[2]

    def device(self) -> jax.Array:
        if self._dev is None:
            self._dev = jnp.asarray(self.codes.astype(np.int32))
        return self._dev

    def query_lut(self, queries: np.ndarray, distance: Distance) -> np.ndarray:
        """Per-query lookup tables [B, S, 256] of sub-scores."""
        q = np.asarray(queries, dtype=np.float32)
        b, d = q.shape
        s, k, sub = self.codebooks.shape
        pad = s * sub - d
        if pad:
            q = np.concatenate([q, np.zeros((b, pad), dtype=np.float32)], axis=1)
        qs = q.reshape(b, s, sub)
        if distance in (Distance.DOT, Distance.COSINE):
            lut = np.einsum("bsd,skd->bsk", qs, self.codebooks)
        elif distance is Distance.EUCLID:
            diff = qs[:, :, None, :] - self.codebooks[None, :, :, :]
            lut = -(diff * diff).sum(-1)
        else:  # MANHATTAN
            diff = qs[:, :, None, :] - self.codebooks[None, :, :, :]
            lut = -np.abs(diff).sum(-1)
        return lut.astype(np.float32)

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.savez(os.path.join(path, "pq.npz"), codes=self.codes, codebooks=self.codebooks)

    @classmethod
    def load(cls, path: str) -> "ProductQuantized":
        data = np.load(os.path.join(path, "pq.npz"))
        return cls(data["codes"], data["codebooks"])


@jax.jit
def score_pq(
    lut: jax.Array,  # [B, S, 256] f32 query LUTs
    codes: jax.Array,  # [N, S] int32
    valid_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """PQ scoring: per-subspace LUT gather summed over subspaces → [B, N]."""
    b, s, k = lut.shape
    # flatten LUT per query: index = subspace*256 + code
    flat = lut.reshape(b, s * k)
    offsets = jax.lax.broadcasted_iota(jnp.int32, codes.shape, 1) * k  # [N, S]
    idx = codes + offsets  # [N, S]

    def per_query(lut_q):
        return jnp.take(lut_q, idx).sum(axis=1)  # [N]

    scores = jax.vmap(per_query)(flat)  # [B, N]
    if valid_mask is not None:
        scores = jnp.where(valid_mask[None, :], scores, NEG_INF)
    return scores
