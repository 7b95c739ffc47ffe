"""Dense / multi vector storage: host-resident numpy with an HBM mirror.

The reference keeps 25+ vector-storage variants (reference:
lib/segment/src/vector_storage/vector_storage_base.rs:607). The TPU design
collapses them: the source of truth is a float32 numpy array on the host
(appendable, mmap-able for persistence); searches run against a lazily
synchronized device block in the configured scoring dtype (f32/bf16), padded
to a tiled capacity so XLA compiles one program shape per capacity class.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Datatype, Distance
from ..ops.distances import preprocess_vectors

_MIN_CAP = 1024


def _round_capacity(n: int) -> int:
    """Round capacity up to the next power-of-two block ≥ _MIN_CAP.

    Power-of-two capacity classes keep the number of distinct XLA program
    shapes logarithmic in collection size.
    """
    cap = _MIN_CAP
    while cap < n:
        cap *= 2
    return cap


_DTYPE_MAP = {
    Datatype.FLOAT32: jnp.float32,
    Datatype.BFLOAT16: jnp.bfloat16,
    Datatype.FLOAT16: jnp.float16,
    Datatype.UINT8: jnp.uint8,
}


class DenseVectorStore:
    """Appendable dense vector storage with a device mirror.

    Host truth: float32 [cap, D] + deleted bitmap. Device mirror: [cap, D] in
    `datatype` + validity mask, rebuilt on demand after mutations (cheap for
    the small mutable segments; sealed segments sync exactly once).
    """

    def __init__(
        self,
        dim: int,
        distance: Distance,
        datatype: Datatype = Datatype.FLOAT32,
        on_disk: bool = False,
        storage_dir: Optional[str] = None,
    ):
        self.dim = dim
        self.distance = distance
        self.datatype = datatype
        # on_disk: the f32 truth lives in a disk-backed memmap instead of
        # anonymous RAM (reference: the mmap / appendable-mmap storages,
        # vector_storage_base.rs:607-649). With a quantized config the
        # segment then keeps ONLY codes in HBM and rescores by gathering
        # candidate rows from this memmap — a 10M x 1536 collection fits
        # one 16 GB chip that way (codes resident, f32 paged from disk).
        self.on_disk = on_disk
        self._disk_dir = storage_dir
        self._disk_path: Optional[str] = None
        self._data = np.zeros((0, dim), dtype=np.float32)
        self._deleted = np.zeros((0,), dtype=bool)
        self._count = 0
        self._deleted_count = 0
        # device mirror
        self._dev: Optional[jax.Array] = None
        self._dev_mask: Optional[jax.Array] = None
        self._scan = None
        self._scan_version = None
        self._dirty = True

    # -- host mutation ------------------------------------------------------

    def __len__(self) -> int:
        return self._count

    @property
    def deleted_count(self) -> int:
        return self._deleted_count

    @property
    def available_count(self) -> int:
        return self._count - self._deleted_count

    def _alloc(self, cap: int) -> np.ndarray:
        if not self.on_disk:
            return np.zeros((cap, self.dim), dtype=np.float32)
        if self._disk_dir is None:
            import tempfile

            self._disk_dir = tempfile.mkdtemp(prefix="qtpu_vecs_")
        os.makedirs(self._disk_dir, exist_ok=True)
        path = os.path.join(self._disk_dir, f"vectors_{cap}.f32")
        mm = np.memmap(path, dtype=np.float32, mode="w+", shape=(cap, self.dim))
        old = self._disk_path
        self._disk_path = path
        if old is not None and old != path:
            try:
                os.unlink(old)
            except OSError:
                pass
        return mm

    def _ensure_capacity(self, n: int) -> None:
        if n <= self._data.shape[0]:
            return
        cap = _round_capacity(n)
        data = self._alloc(cap)
        data[: self._count] = self._data[: self._count]
        self._data = data
        deleted = np.zeros((cap,), dtype=bool)
        deleted[: self._count] = self._deleted[: self._count]
        self._deleted = deleted

    def add(self, vectors: np.ndarray) -> np.ndarray:
        """Append preprocessed vectors; returns assigned offsets (int32)."""
        vectors = np.atleast_2d(np.asarray(vectors, dtype=np.float32))
        if vectors.shape[1] != self.dim:
            raise ValueError(
                f"vector dim {vectors.shape[1]} != storage dim {self.dim}"
            )
        vectors = preprocess_vectors(vectors, self.distance)
        n = vectors.shape[0]
        self._ensure_capacity(self._count + n)
        offsets = np.arange(self._count, self._count + n, dtype=np.int32)
        self._data[self._count : self._count + n] = vectors
        self._count += n
        self._dirty = True
        return offsets

    def set(self, offset: int, vector: np.ndarray) -> None:
        v = preprocess_vectors(
            np.asarray(vector, dtype=np.float32)[None, :], self.distance
        )[0]
        self._data[offset] = v
        if self._deleted[offset]:
            self._deleted[offset] = False
            self._deleted_count -= 1
        self._dirty = True

    def delete(self, offset: int) -> bool:
        if offset >= self._count or self._deleted[offset]:
            return False
        self._deleted[offset] = True
        self._deleted_count += 1
        self._dirty = True
        return True

    def is_deleted(self, offset: int) -> bool:
        return bool(self._deleted[offset])

    def get(self, offset: int) -> np.ndarray:
        return self._data[offset]

    def get_batch(self, offsets: np.ndarray) -> np.ndarray:
        return self._data[np.asarray(offsets, dtype=np.int64)]

    @property
    def host_array(self) -> np.ndarray:
        """Valid rows [count, D] (includes deleted rows; mask separately)."""
        return self._data[: self._count]

    @property
    def deleted_mask(self) -> np.ndarray:
        return self._deleted[: self._count]

    # -- device mirror ------------------------------------------------------

    def device_block(self) -> Tuple[jax.Array, jax.Array]:
        """→ (vectors [cap, D] in scoring dtype, valid_mask [cap] bool)."""
        if self._dirty or self._dev is None:
            cap = max(_MIN_CAP, self._data.shape[0])
            data = self._data
            if data.shape[0] < cap:
                data = np.zeros((cap, self.dim), dtype=np.float32)
                data[: self._count] = self._data[: self._count]
            mask = np.zeros((cap,), dtype=bool)
            mask[: self._count] = ~self._deleted[: self._count]
            self._dev = jnp.asarray(data, dtype=_DTYPE_MAP[self.datatype])
            self._dev_mask = jnp.asarray(mask)
            self._dirty = False
        return self._dev, self._dev_mask

    def drop_device(self) -> None:
        self._dev = None
        self._dev_mask = None
        self._scan = None
        self._dirty = True

    def memory_usage_bytes(self):
        """Host/device/disk bytes for this store incl. its device mirror
        and cached scan searcher (reference: VectorStorage size metrics
        feed telemetry + optimizer decisions)."""
        from ..utils.memsize import merge, sizeof, sizeof_attrs

        return merge(
            sizeof_attrs(self, "_data", "_deleted", "_dev", "_dev_mask"),
            sizeof(getattr(self, "_scan", None)),
        )

    def scan_index(self):
        """Cached blocked-scan searcher (ops/scan.py) over this store's
        current contents — rebuilt lazily after mutations."""
        from ..ops.scan import ScanIndex
        from ..types import Distance

        if getattr(self, "_scan", None) is None or self._scan_version != (
            self._count,
            self._deleted_count,
        ):
            valid = np.zeros(self._count, dtype=bool)
            valid[:] = ~self._deleted[: self._count]
            self._scan = ScanIndex(
                self.host_array,
                valid_mask=valid,
                euclid=self.distance
                in (Distance.EUCLID, Distance.MANHATTAN),
            )
            self._scan_version = (self._count, self._deleted_count)
        return self._scan

    # -- persistence --------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        if self.on_disk:
            # stream the memmap straight to the segment dir (never pull the
            # whole block through RAM) + a tiny meta record; load() memmaps
            # it back in place — restart cost is O(1), not O(bytes)
            if isinstance(self._data, np.memmap):
                self._data.flush()
            dst = os.path.join(path, "vectors.f32")
            out = np.memmap(
                dst, dtype=np.float32, mode="w+",
                shape=(max(self._count, 1), self.dim),
            )
            step = 1 << 16
            for i in range(0, self._count, step):
                end = min(i + step, self._count)
                out[i:end] = self._data[i:end]
            out.flush()
            with open(os.path.join(path, "vectors.meta"), "w") as f:
                f.write(f"{self._count} {self.dim} on_disk")
            np.save(os.path.join(path, "deleted.npy"), self._deleted[: self._count])
            return
        np.save(os.path.join(path, "vectors.npy"), self._data[: self._count])
        np.save(os.path.join(path, "deleted.npy"), self._deleted[: self._count])

    @classmethod
    def load(
        cls, path: str, dim: int, distance: Distance, datatype: Datatype,
        on_disk: bool = False,
    ) -> "DenseVectorStore":
        meta = os.path.join(path, "vectors.meta")
        if os.path.exists(meta):
            with open(meta) as f:
                n = int(f.read().split()[0])
            store = cls(dim, distance, datatype, on_disk=True, storage_dir=path)
            deleted = np.load(os.path.join(path, "deleted.npy"))
            if n:
                store._data = np.memmap(
                    os.path.join(path, "vectors.f32"), dtype=np.float32,
                    mode="r+", shape=(n, dim),
                )
                store._disk_path = None  # segment-owned file: never unlink
            store._deleted = deleted.copy()
            store._count = n
            store._deleted_count = int(deleted.sum())
            return store
        store = cls(dim, distance, datatype, on_disk=on_disk)
        # on_disk downgrade of a RAM-format save (low_memory_mode): stream
        # npy -> memmap without materializing the block in RAM
        data = np.load(
            os.path.join(path, "vectors.npy"),
            mmap_mode="r" if on_disk else None,
        )
        deleted = np.load(os.path.join(path, "deleted.npy"))
        n = data.shape[0]
        store._ensure_capacity(n)
        store._data[:n] = data
        store._deleted[:n] = deleted
        store._count = n
        store._deleted_count = int(deleted.sum())
        return store


class DeviceVectorStore(DenseVectorStore):
    """Sealed dense store whose vector truth ALREADY LIVES ON DEVICE.

    Device-native ingestion path: when the vectors are produced on-chip (an
    embedding model running on the same TPU, a device-side dataset
    generator, a shard transfer landing directly in HBM) the [N, D] block
    never round-trips the host link. The engine's few host-row reads (HNSW
    seed graph ≤512 rows, exact candidate rescore) are served by an optional
    `host_fetch(offsets) -> [k, D] f32` callable, falling back to a device
    gather + download of just those rows.

    Reference contrast: qdrant's storages are all host/disk-backed
    (vector_storage_base.rs:607) — on TPU the authoritative copy can be HBM.
    Sealed: `add`/`set` raise; build a new store to mutate membership.
    """

    def __init__(
        self,
        dev_vectors: jax.Array,  # [cap, D] (distance-preprocessed) on device
        distance: Distance,
        count: Optional[int] = None,
        host_fetch=None,
        datatype: Datatype = Datatype.FLOAT32,
    ):
        super().__init__(int(dev_vectors.shape[1]), distance, datatype)
        cap = int(dev_vectors.shape[0])
        n = int(count if count is not None else cap)
        if not (0 <= n <= cap):
            raise ValueError(f"count {n} outside device block rows {cap}")
        self._count = n
        self._deleted = np.zeros(n, dtype=bool)
        self._host_fetch = host_fetch
        mask = np.zeros(cap, dtype=bool)
        mask[:n] = True
        self._dev = dev_vectors.astype(_DTYPE_MAP[datatype])
        self._dev_mask = jnp.asarray(mask)
        self._dirty = False

    def add(self, vectors):  # pragma: no cover - sealed
        raise NotImplementedError("DeviceVectorStore is sealed (device-native)")

    def set(self, offset, vector):  # pragma: no cover - sealed
        raise NotImplementedError("DeviceVectorStore is sealed (device-native)")

    def delete(self, offset: int) -> bool:
        # membership changes must reach the static device mask, or
        # device_block() keeps scoring deleted rows for any caller that
        # relies on the store's own validity (small-store PlainIndex path,
        # HNSW alive defaults)
        ok = super().delete(offset)
        if ok:
            cap = int(self._dev.shape[0])
            mask = np.zeros(cap, dtype=bool)
            mask[: self._count] = ~self._deleted[: self._count]
            self._dev_mask = jnp.asarray(mask)
            self._dirty = False
        return ok

    def device_block(self) -> Tuple[jax.Array, jax.Array]:
        return self._dev, self._dev_mask

    def get(self, offset: int) -> np.ndarray:
        return self.get_batch(np.asarray([offset]))[0]

    def get_batch(self, offsets: np.ndarray) -> np.ndarray:
        offsets = np.asarray(offsets, dtype=np.int64)
        if self._host_fetch is not None:
            rows = np.asarray(self._host_fetch(offsets), dtype=np.float32)
        else:
            rows = np.asarray(
                jnp.take(self._dev, jnp.asarray(offsets), axis=0),
                dtype=np.float32,
            )
        return rows

    @property
    def host_array(self) -> np.ndarray:
        # O(count) host materialization — only debug/persistence consumers
        return self.get_batch(np.arange(self._count))

    def scan_index(self):
        from ..ops.scan import ScanIndex

        if getattr(self, "_scan", None) is None or self._scan_version != (
            self._count,
            self._deleted_count,
        ):
            # pass the FULL device block: a [:count] device slice is a COPY
            # (measured: +6.15 GB at 1M x 1536 — an OOM next to the master);
            # pad rows beyond count stay invalid via the short mask
            self._scan = ScanIndex(
                self._dev,
                valid_mask=~self._deleted[: self._count],
                euclid=self.distance
                in (Distance.EUCLID, Distance.MANHATTAN),
            )
            self._scan_version = (self._count, self._deleted_count)
        return self._scan

    def memory_usage_bytes(self):
        from ..utils.memsize import merge, sizeof, sizeof_attrs

        return merge(
            sizeof_attrs(self, "_dev", "_dev_mask", "_deleted"),
            sizeof(getattr(self, "_scan", None)),
        )


class MultiVectorStore:
    """Storage for multi-vectors (token matrices, ColBERT-style).

    Flat layout: one big [total_tokens, D] float32 array + per-point
    (start, len) ranges — the TPU search path re-packs per-point matrices
    into padded [N, S_max, D] blocks on demand.
    (reference: lib/segment/src/vector_storage/ multi-dense variants)
    """

    def __init__(self, dim: int, distance: Distance, datatype: Datatype = Datatype.FLOAT32):
        self.dim = dim
        self.distance = distance
        self.datatype = datatype
        self._flat = np.zeros((0, dim), dtype=np.float32)
        self._flat_count = 0
        self._ranges = np.zeros((0, 2), dtype=np.int64)  # (start, len)
        self._count = 0
        self._deleted = np.zeros((0,), dtype=bool)
        self._deleted_count = 0
        self._dev = None
        self._dirty = True

    def __len__(self) -> int:
        return self._count

    @property
    def deleted_count(self) -> int:
        return self._deleted_count

    @property
    def available_count(self) -> int:
        return self._count - self._deleted_count

    def memory_usage_bytes(self):
        from ..utils.memsize import sizeof_attrs

        return sizeof_attrs(self, "_flat", "_ranges", "_deleted", "_dev")

    def add(self, matrices) -> np.ndarray:
        offsets = []
        for mat in matrices:
            mat = np.atleast_2d(np.asarray(mat, dtype=np.float32))
            if mat.shape[1] != self.dim:
                raise ValueError(f"multivector dim {mat.shape[1]} != {self.dim}")
            mat = preprocess_vectors(mat, self.distance)
            t = mat.shape[0]
            if self._flat_count + t > self._flat.shape[0]:
                cap = _round_capacity(self._flat_count + t)
                flat = np.zeros((cap, self.dim), dtype=np.float32)
                flat[: self._flat_count] = self._flat[: self._flat_count]
                self._flat = flat
            self._flat[self._flat_count : self._flat_count + t] = mat
            if self._count + 1 > self._ranges.shape[0]:
                cap = _round_capacity(self._count + 1)
                ranges = np.zeros((cap, 2), dtype=np.int64)
                ranges[: self._count] = self._ranges[: self._count]
                self._ranges = ranges
                deleted = np.zeros((cap,), dtype=bool)
                deleted[: self._count] = self._deleted[: self._count]
                self._deleted = deleted
            self._ranges[self._count] = (self._flat_count, t)
            offsets.append(self._count)
            self._flat_count += t
            self._count += 1
        self._dirty = True
        return np.asarray(offsets, dtype=np.int32)

    def set(self, offset: int, matrix) -> None:
        # Append new token block; old block becomes garbage (reclaimed on rebuild).
        new_off = self.add([matrix])[0]
        self._ranges[offset] = self._ranges[new_off]
        self._count -= 1  # drop the temporary tail point
        if self._deleted[offset]:
            self._deleted[offset] = False
            self._deleted_count -= 1
        self._dirty = True

    def delete(self, offset: int) -> bool:
        if offset >= self._count or self._deleted[offset]:
            return False
        self._deleted[offset] = True
        self._deleted_count += 1
        self._dirty = True
        return True

    def is_deleted(self, offset: int) -> bool:
        return bool(self._deleted[offset])

    def get(self, offset: int) -> np.ndarray:
        start, ln = self._ranges[offset]
        return self._flat[start : start + ln]

    @property
    def max_tokens(self) -> int:
        if self._count == 0:
            return 0
        return int(self._ranges[: self._count, 1].max())

    def padded_block(self) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """→ (tokens [N, S, D], token_mask [N, S], valid_mask [N]) device arrays."""
        if self._dirty or self._dev is None:
            n = max(1, self._count)
            s = max(1, self.max_tokens)
            # pad token dim to a multiple of 8 (f32 sublane) for layout
            s = (s + 7) // 8 * 8
            out = np.zeros((n, s, self.dim), dtype=np.float32)
            tok_mask = np.zeros((n, s), dtype=bool)
            for i in range(self._count):
                start, ln = self._ranges[i]
                out[i, :ln] = self._flat[start : start + ln]
                tok_mask[i, :ln] = True
            valid = np.zeros((n,), dtype=bool)
            valid[: self._count] = ~self._deleted[: self._count]
            self._dev = (
                jnp.asarray(out, dtype=_DTYPE_MAP[self.datatype]),
                jnp.asarray(tok_mask),
                jnp.asarray(valid),
            )
            self._dirty = False
        return self._dev

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "mv_flat.npy"), self._flat[: self._flat_count])
        np.save(os.path.join(path, "mv_ranges.npy"), self._ranges[: self._count])
        np.save(os.path.join(path, "mv_deleted.npy"), self._deleted[: self._count])

    @classmethod
    def load(cls, path: str, dim: int, distance: Distance, datatype: Datatype) -> "MultiVectorStore":
        store = cls(dim, distance, datatype)
        flat = np.load(os.path.join(path, "mv_flat.npy"))
        ranges = np.load(os.path.join(path, "mv_ranges.npy"))
        deleted = np.load(os.path.join(path, "mv_deleted.npy"))
        store._flat = flat.copy()
        store._flat_count = flat.shape[0]
        n = ranges.shape[0]
        store._ranges = ranges.copy()
        store._deleted = deleted.copy()
        store._count = n
        store._deleted_count = int(deleted.sum())
        return store


class PooledMultiVectorStore:
    """Dense single-vector view of a MultiVectorStore: mean-pooled token
    matrices, distance-preprocessed. Serves as the HNSW proxy store for
    multivectors — on TPU the graph walks pooled vectors (1 row per point,
    gather-friendly) and the exact max-sim rescore runs on the oversampled
    winners, instead of the reference's max-sim-native graph traversal
    (multi_metric_query_scorer.rs): token-wise graph gathers would multiply
    the gather-wall cost by tokens-per-point."""

    def __init__(self, multi: "MultiVectorStore"):
        from ..ops.distances import preprocess_vectors

        self.multi = multi
        self.dim = multi.dim
        self.distance = multi.distance
        self.datatype = Datatype.FLOAT32
        n = len(multi)
        pooled = np.zeros((n, multi.dim), dtype=np.float32)
        for i in range(n):
            start, ln = multi._ranges[i]
            if ln > 0:
                pooled[i] = multi._flat[start : start + ln].mean(axis=0)
        self._host = preprocess_vectors(pooled, multi.distance) if n else pooled
        self._dev = None

    def __len__(self) -> int:
        return len(self.multi)

    @property
    def available_count(self) -> int:
        return self.multi.available_count

    @property
    def deleted_mask(self) -> np.ndarray:
        return self.multi._deleted[: len(self.multi)]

    @property
    def host_array(self) -> np.ndarray:
        return self._host

    def get_batch(self, ids: np.ndarray) -> np.ndarray:
        return self._host[np.asarray(ids, dtype=np.int64)]

    def device_block(self):
        if self._dev is None:
            n = max(1, len(self._host))
            cap = 1 << (n - 1).bit_length() if n > 1 else 1
            cap = max(cap, 8)
            buf = np.zeros((cap, self.dim), dtype=np.float32)
            buf[: len(self._host)] = self._host
            mask = np.zeros(cap, dtype=bool)
            mask[: len(self.multi)] = ~self.deleted_mask
            self._dev = (jnp.asarray(buf), jnp.asarray(mask))
        return self._dev
