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
            # quantile over a value sample — exact quantile over N×D floats is
            # host-bound (100s at 200k×1536); 1M samples is statistically ample
            flat = v.reshape(-1)
            if flat.size > 1_000_000:
                rng = np.random.default_rng(0)
                flat = flat[rng.integers(0, flat.size, 1_000_000)]
            bound = np.quantile(np.abs(flat), quantile)
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

    def scan_device(self, block: int):
        """Block-padded device arrays for the large-N scan path
        → (codes [N_pad, D], norms [N_pad], n_pad)."""
        if getattr(self, "_scan_dev", None) is None or self._scan_dev[2] % block:
            n, d = self.codes.shape
            n_pad = max((n + block - 1) // block * block, block)
            codes = np.zeros((n_pad, d), dtype=np.int8)
            codes[:n] = self.codes
            norms = np.zeros(n_pad, dtype=np.float32)
            norms[:n] = self.norms_sq
            self._scan_dev = (jnp.asarray(codes), jnp.asarray(norms), n_pad)
        return self._scan_dev

    def pallas_device(self, block: int = 4096):
        """Device arrays for the fused Pallas int8 scan (ops/pallas_scan.py)
        → (codes [n_pad, d_pad] int8 device, norms [n_pad] f32 host, n_pad).
        Rows padded to the kernel block, dims to the 128-lane width."""
        if getattr(self, "_pallas_dev", None) is None:
            n, d = self.codes.shape
            n_pad = max((n + block - 1) // block * block, block)
            d_pad = max((d + 127) // 128 * 128, 128)
            codes = np.zeros((n_pad, d_pad), dtype=np.int8)
            codes[:n, :d] = self.codes
            norms = np.zeros(n_pad, dtype=np.float32)
            norms[:n] = self.norms_sq
            self._pallas_dev = (jnp.asarray(codes), norms, n_pad)
        return self._pallas_dev

    def memory_usage_bytes(self):
        from ..utils.memsize import sizeof_attrs

        return sizeof_attrs(
            self, "codes", "norms_sq", "_dev", "_scan_dev", "_pallas_dev"
        )

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

    def memory_usage_bytes(self):
        from ..utils.memsize import sizeof_attrs

        return sizeof_attrs(self, "signs", "_dev")

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


# ---------------------------------------------------------------------------
# Turbo quantization (rotation + low-bit Lloyd-Max)
# ---------------------------------------------------------------------------

# Lloyd-Max reconstruction levels for a unit gaussian per bit width; decision
# thresholds are the midpoints between adjacent levels. "1.5 bits" = 3 levels.
_LM_LEVELS = {
    1: np.array([-0.7979, 0.7979]),
    1.5: np.array([-1.224, 0.0, 1.224]),
    2: np.array([-1.510, -0.4528, 0.4528, 1.510]),
    4: np.array(
        [
            -2.733, -2.069, -1.618, -1.256, -0.9424, -0.6568, -0.3881,
            -0.1284, 0.1284, 0.3881, 0.6568, 0.9424, 1.256, 1.618, 2.069,
            2.733,
        ]
    ),
}


def _lloyd_max(bits) -> tuple:
    levels = _LM_LEVELS[bits]
    thresholds = (levels[:-1] + levels[1:]) / 2.0
    return thresholds, levels


def _hadamard_rotation(dim: int, seed: int) -> np.ndarray:
    """Randomized orthogonal rotation: D_pad×D_pad scaled Hadamard with random
    sign flips (reference: turboquant/simd/hadamard.rs fast rotation; here a
    dense orthogonal matrix applied as one matmul — MXU-friendly)."""
    n = 1
    while n < dim:
        n *= 2
    h = np.array([[1.0]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    h = h / np.sqrt(n)
    rng = np.random.default_rng(seed)
    signs = rng.choice([-1.0, 1.0], size=n)
    return (h * signs[None, :]).astype(np.float32)  # orthogonal


class TurboQuantized:
    """TurboQuant: rotate vectors with a randomized Hadamard, normalize per
    vector, quantize each dim to 1/2/4-bit Lloyd-Max levels.

    Reference: lib/quantization/src/turboquant/ (rotation + asymmetric
    low-bit scoring). Device representation stores the LEVEL INDEX per dim
    as int8 (1 byte/dim in HBM; disk form packs to `bits`). Scoring is
    asymmetric: the f32 (rotated) query hits reconstruction levels via a
    single MXU matmul — dot(q_rot, recon(v)) = Σ q_i · level[code_i] · σ_v,
    expressed as (q_rot @ codesᵀ-style) with level values folded in.
    """

    def __init__(self, codes: np.ndarray, scales: np.ndarray, rotation_seed: int,
                 bits: int, norms_sq: np.ndarray, dim: int):
        self.codes = codes  # [N, D_pad] int8 level indices
        self.scales = scales  # [N] f32 per-vector scale (std of rotated vec)
        self.rotation_seed = rotation_seed
        self.bits = bits
        self.norms_sq = norms_sq  # [N] exact ||v||² of ORIGINAL vectors
        self.dim = dim
        self._dev = None
        self._rot = None

    @classmethod
    def encode(cls, vectors: np.ndarray, bits: int = 4, seed: int = 13) -> "TurboQuantized":
        v = np.asarray(vectors, dtype=np.float32)
        n, dim = v.shape
        rot = _hadamard_rotation(dim, seed)
        d_pad = rot.shape[0]
        vp = np.zeros((n, d_pad), dtype=np.float32)
        vp[:, :dim] = v
        r = vp @ rot  # rotated: approximately gaussian per dim
        scales = r.std(axis=1) + 1e-12
        thresholds, levels = _lloyd_max(bits)
        codes = np.searchsorted(thresholds, r / scales[:, None]).astype(np.int8)
        norms_sq = (v * v).sum(axis=1).astype(np.float32)
        return cls(codes, scales.astype(np.float32), seed, bits, norms_sq, dim)

    def rotation(self) -> np.ndarray:
        if self._rot is None:
            self._rot = _hadamard_rotation(self.dim, self.rotation_seed)
        return self._rot

    def device(self):
        if self._dev is None:
            _, levels = _lloyd_max(self.bits)
            # fold reconstruction levels into a bf16 matrix of level values
            recon = levels[self.codes.astype(np.int64)].astype(np.float32)
            self._dev = (
                jnp.asarray(recon, dtype=jnp.bfloat16),
                jnp.asarray(self.scales),
                jnp.asarray(self.norms_sq),
            )
        return self._dev

    def memory_usage_bytes(self):
        from ..utils.memsize import sizeof_attrs

        return sizeof_attrs(
            self, "codes", "scales", "norms_sq", "_dev", "_rot", "_flat_dev"
        )

    def rotate_queries(self, queries: np.ndarray) -> np.ndarray:
        q = np.asarray(queries, dtype=np.float32)
        rot = self.rotation()
        qp = np.zeros((q.shape[0], rot.shape[0]), dtype=np.float32)
        qp[:, : self.dim] = q
        return qp @ rot

    @property
    def pack_factor(self) -> int:
        """Level indices per device byte (TQ-as-primary residency)."""
        return {4: 2, 2: 4, 1.5: 4, 1: 8}.get(self.bits, 1)

    def flat_device(self, block: int):
        """TQ-as-primary device arrays for the zero-copy flat scan
        (reference: TurboVectorStorageImpl, vector_storage/turbo/mod.rs:1-29
        — TQ codes ARE the storage, not a sidecar): level indices packed
        `pack_factor` per byte, so a 10M x 1536(->2048 rotated) collection
        is 10.2 GB at 4-bit on one 16 GB chip where int8 SQ (15.4 GB + f32
        impossibility) is marginal.
        → (packed [N_pad, D_pad/p] uint8, scales [N_pad], norms [N_pad],
           levels [L] f32, n_pad)."""
        if getattr(self, "_flat_dev", None) is None or self._flat_dev[4] % block:
            n, d_pad = self.codes.shape
            p = self.pack_factor
            n_pad = max((n + block - 1) // block * block, block)
            c = np.zeros((n_pad, d_pad), dtype=np.uint8)
            c[:n] = self.codes.astype(np.uint8)
            if p > 1:
                # HALF-SPLIT packing: byte column j holds dims
                # {j, j + d/p, j + 2d/p, ...} so the kernel's unpack is a
                # CONTIGUOUS concat of p sub-ranges. The previous stride-
                # interleave (dims 2j, 2j+1 in one byte) forced XLA to give
                # the packed parameter a column-major layout inside
                # scan_search_tq_flat and COPY the whole argument — +9.56 GB
                # at 10M x 2048, the round-3/4 "second copy" OOM.
                w = 8 // p
                half = d_pad // p
                packed = np.zeros((n_pad, half), dtype=np.uint8)
                for j in range(p):
                    packed |= c[:, j * half : (j + 1) * half] << ((p - 1 - j) * w)
            else:
                packed = c
            scales = np.zeros(n_pad, dtype=np.float32)
            scales[:n] = self.scales
            norms = np.zeros(n_pad, dtype=np.float32)
            norms[:n] = self.norms_sq
            _, levels = _lloyd_max(self.bits)
            self._flat_dev = (
                jnp.asarray(packed),
                jnp.asarray(scales),
                jnp.asarray(norms),
                jnp.asarray(levels.astype(np.float32)),
                n_pad,
            )
        return self._flat_dev

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        # pack level indices to `bits` on disk
        if self.bits == 4:
            packed = (self.codes[:, 0::2].astype(np.uint8) << 4) | (
                self.codes[:, 1::2].astype(np.uint8) & 0xF
            )
        elif self.bits in (2, 1.5):
            c = self.codes.astype(np.uint8)
            packed = (c[:, 0::4] << 6) | (c[:, 1::4] << 4) | (c[:, 2::4] << 2) | c[:, 3::4]
        else:
            packed = np.packbits(self.codes.astype(np.uint8), axis=1)
        np.savez(
            os.path.join(path, "tq.npz"),
            packed=packed,
            scales=self.scales,
            norms_sq=self.norms_sq,
            bits=np.float64(self.bits),
            seed=np.int32(self.rotation_seed),
            dim=np.int32(self.dim),
            d_pad=np.int32(self.codes.shape[1]),
        )

    @classmethod
    def load(cls, path: str) -> "TurboQuantized":
        data = np.load(os.path.join(path, "tq.npz"))
        bits = float(data["bits"])
        bits = int(bits) if bits in (1.0, 2.0, 4.0) else bits
        d_pad = int(data["d_pad"])
        packed = data["packed"]
        if bits == 4:
            codes = np.zeros((packed.shape[0], d_pad), dtype=np.int8)
            codes[:, 0::2] = (packed >> 4) & 0xF
            codes[:, 1::2] = packed & 0xF
        elif bits in (2, 1.5):
            codes = np.zeros((packed.shape[0], d_pad), dtype=np.int8)
            codes[:, 0::4] = (packed >> 6) & 0x3
            codes[:, 1::4] = (packed >> 4) & 0x3
            codes[:, 2::4] = (packed >> 2) & 0x3
            codes[:, 3::4] = packed & 0x3
        else:
            codes = np.unpackbits(packed, axis=1)[:, :d_pad].astype(np.int8)
        return cls(
            codes,
            data["scales"],
            int(data["seed"]),
            bits,
            data["norms_sq"],
            int(data["dim"]),
        )


@functools.partial(jax.jit, static_argnames=("distance",))
def score_tq(
    q_rot: jax.Array,  # [B, D_pad] f32 rotated queries
    recon: jax.Array,  # [N, D_pad] bf16 reconstruction levels (unit scale)
    scales: jax.Array,  # [N] f32 per-vector scale
    norms_sq: jax.Array,  # [N] f32 exact original norms
    distance: str,
    valid_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Asymmetric TurboQuant scoring: rotation preserves dot products, so
    dot(q, v) ≈ scale_v · dot(q_rot, recon_v) — one bf16 MXU matmul."""
    dist = Distance(distance)
    dots = jax.lax.dot_general(
        q_rot.astype(jnp.bfloat16),
        recon,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scales[None, :]
    if dist in (Distance.DOT, Distance.COSINE):
        scores = dots
    else:  # euclid / manhattan proxy
        q_sq = jnp.sum(q_rot * q_rot, axis=1, keepdims=True)
        scores = 2.0 * dots - q_sq - norms_sq[None, :]
    if valid_mask is not None:
        scores = jnp.where(valid_mask[None, :], scores, NEG_INF)
    return scores


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

    def memory_usage_bytes(self):
        from ..utils.memsize import sizeof_attrs

        return sizeof_attrs(self, "codes", "codebooks", "_dev")

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
