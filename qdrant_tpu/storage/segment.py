"""Segment: the per-shard storage + index unit.

Reference: lib/segment/src/segment/ (Segment struct mod.rs:65, entry.rs) —
id tracker + named vector storages + payload storage/index + per-vector
search index, with versioned idempotent ops keyed by op_num.

TPU redesign: appendable segments answer searches exactly (MXU full scan —
the plain path); sealed segments carry an HNSW graph and optional quantized
encodings. Filters compile to offset bitmasks fused into every search path.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

from ..index.hnsw import HnswIndex
from ..index.payload_index import StructPayloadIndex
from ..index.plain import PlainIndex
from ..index.sparse import SparseIndex, SparseVectorStore
from ..ops import quantization as qops
from ..ops.distances import (
    preprocess_vectors,
    score_ids_batch,
    score_multivector_maxsim,
)
from ..types import (
    BinaryQuantizationConfig,
    Distance,
    TurboQuantizationConfig,
    CollectionParams,
    Datatype,
    Filter,
    HnswConfig,
    PayloadIndexParams,
    PointId,
    ProductQuantizationConfig,
    ScalarQuantizationConfig,
    SparseVector,
    VectorParams,
    DEFAULT_VECTOR_NAME,
)
from .id_tracker import IdTracker
from .payload import PayloadStorage
from .vectors import DenseVectorStore, MultiVectorStore
from ..utils import hw_counter
from ..utils.budget import BUDGET

import functools

import jax.numpy as jnp


def _with_search_budget(fn):
    """Register the call as an in-flight search so optimizer builds yield
    the device between batches (utils/budget.py; reference: ResourceBudget,
    lib/common/common/src/budget.rs)."""

    @functools.wraps(fn)
    def wrapper(*a, **kw):
        with BUDGET.search():
            return fn(*a, **kw)

    return wrapper


DEFAULT_FULL_SCAN_THRESHOLD = 10_000

# MEASURED scan-vs-graph crossover (v5e, BENCH_r05 crossover_4m_sift128):
# at 4M x 128 the exact MXU scan sustains 42.3k QPS @ recall 0.998 while
# the graph's >=0.95-recall operating point (ef=256) delivers 655 QPS —
# a 65x gap in the scan's favor. Scan cost is linear in rows, so equal
# throughput extrapolates to 4M x (42290/655) ~ 258M rows — but a single
# chip's HBM runs out of residency long before that (~30M rows at 128-d
# f32, ~60M bf16, less at higher dims). Conclusion, on the record: ON TPU
# THE EXACT SCAN WINS AT EVERY ROW COUNT THAT FITS HBM — the opposite of
# the CPU reference, where the graph wins from ~10k points
# (hnsw/read_view/dispatch.rs:111-170). The graph's product roles are the
# beyond-HBM/tiered path, filtered-graph regimes, and explicit
# params.hnsw_ef requests; this constant now marks the extrapolated
# equal-throughput point rather than a practical routing threshold (the
# residency/tiered checks fire first).
GRAPH_CROSSOVER_ROWS = int(
    os.environ.get("QDRANT_TPU_GRAPH_CROSSOVER_ROWS", 258_000_000)
)

# Load-time memory mode (reference: /root/reference/config/config.yaml:49-63
# `storage.low_memory_mode`): a recovery knob for nodes that crash-loop on
# OOM. Only affects how segments LOAD — persisted configuration is not
# modified.
#   disabled    — load segments as persisted (default)
#   no_resident — downgrade dense vector truth to on-disk memmaps even when
#                 the segment was saved RAM-resident
#   no_populate — no_resident + drop any eager device mirrors after load
#                 (the TPU analogue of skipping mmap prefault: HBM is only
#                 populated when a search actually needs the block)
LOW_MEMORY_MODES = ("disabled", "no_resident", "no_populate")
_LOW_MEMORY_MODE = "disabled"


def set_low_memory_mode(mode: str) -> None:
    global _LOW_MEMORY_MODE
    mode = (mode or "disabled").lower()
    if mode not in LOW_MEMORY_MODES:
        raise ValueError(
            f"unknown low_memory_mode {mode!r}; expected one of {LOW_MEMORY_MODES}"
        )
    _LOW_MEMORY_MODE = mode


def low_memory_mode() -> str:
    return _LOW_MEMORY_MODE


# On-disk segment format version (reference: lib/segment StorageVersion +
# tests/e2e_tests/test_data_compatibility.py). Bump when segment.json or a
# store layout changes shape; add an upgrade step to _migrate_segment_meta.
# v1 = un-versioned layout (rounds 1-2, no format_version field).
# v2 = current (adds the field itself; layout unchanged).
SEGMENT_FORMAT_VERSION = 2


class SegmentFormatError(Exception):
    pass


def _migrate_segment_meta(meta: dict, path: str) -> dict:
    """Load-time migration hook: upgrade older on-disk metas in place,
    refuse newer ones with a clear error instead of misreading them."""
    fv = int(meta.get("format_version", 1))
    if fv > SEGMENT_FORMAT_VERSION:
        raise SegmentFormatError(
            f"segment at {path} has format v{fv}, newer than this build's "
            f"v{SEGMENT_FORMAT_VERSION} — upgrade qdrant-tpu to read it"
        )
    if fv < 2:
        # v1 → v2: field added, layout identical — stamp and continue
        meta["format_version"] = 2
    return meta
DEFAULT_OVERSAMPLING = 3.0
# minimum store size for the blocked/flat scan kernels (below this the
# single-matmul scorers win; patchable in tests)
FLAT_SCAN_MIN_N = 65536


class SearchParams:
    def __init__(
        self,
        hnsw_ef: Optional[int] = None,
        exact: bool = False,
        quantization_ignore: bool = False,
        quantization_rescore: bool = True,
        quantization_oversampling: Optional[float] = None,
        acorn_enable: Optional[bool] = None,
        acorn_max_selectivity: float = 0.4,
    ):
        self.hnsw_ef = hnsw_ef
        self.exact = exact
        self.quantization_ignore = quantization_ignore
        self.quantization_rescore = quantization_rescore
        self.quantization_oversampling = quantization_oversampling
        self.acorn_enable = acorn_enable
        self.acorn_max_selectivity = acorn_max_selectivity

    @staticmethod
    def from_dict(d: Optional[dict]) -> "SearchParams":
        d = d or {}
        q = d.get("quantization") or {}
        a = d.get("acorn") or {}
        return SearchParams(
            hnsw_ef=d.get("hnsw_ef"),
            exact=bool(d.get("exact", False)),
            quantization_ignore=bool(q.get("ignore", False)),
            quantization_rescore=bool(q.get("rescore", True)),
            quantization_oversampling=q.get("oversampling"),
            acorn_enable=a.get("enable"),
            acorn_max_selectivity=float(a.get("max_selectivity", 0.4)),
        )


class Segment:
    def __init__(self, params: CollectionParams, appendable: bool = True):
        self.params = params
        self.appendable = appendable
        self.version = 0  # max applied op_num
        self.id_tracker = IdTracker()
        self.payload_storage = PayloadStorage()
        # deferred write-visibility (reference: DeferredBehavior,
        # lib/common/common/src/types.rs:102-116 + entry_point.rs:95-186):
        # offsets here are written but invisible to reads until confirmed
        self.deferred: set = set()
        self.dense: Dict[str, DenseVectorStore] = {}
        self.multi: Dict[str, MultiVectorStore] = {}
        self.sparse: Dict[str, SparseVectorStore] = {}
        self.hnsw: Dict[str, HnswIndex] = {}
        # filterable-HNSW payload-block subgraphs:
        # vector name → {(field, value_repr): HnswIndex over that block}
        # (reference: hnsw/build.rs:364-530 additional payload-block graphs)
        self.hnsw_multi: Dict[str, HnswIndex] = {}
        self.hnsw_blocks: Dict[str, Dict[Tuple[str, str], HnswIndex]] = {}
        self.quantized: Dict[str, Any] = {}
        self.sparse_index: Dict[str, SparseIndex] = {}
        for name, vp in params.vectors.items():
            if vp.multivector_config is not None:
                self.multi[name] = MultiVectorStore(vp.size, vp.distance, vp.datatype)
            else:
                self.dense[name] = DenseVectorStore(
                    vp.size, vp.distance, vp.datatype, on_disk=vp.on_disk
                )
        for name, sp in params.sparse_vectors.items():
            self.sparse[name] = SparseVectorStore()
            self.sparse_index[name] = SparseIndex(self.sparse[name], sp.modifier)
        self.payload_index = StructPayloadIndex(
            self.payload_storage, self.id_tracker, self._has_vector
        )

    # ------------------------------------------------------------------
    # live vector-name management (reference: vector_name_api.rs —
    # PUT/DELETE /collections/{c}/vectors/{name})
    # ------------------------------------------------------------------

    def add_vector_name(self, name: str, vp: VectorParams) -> None:
        """Add a named dense/multi vector to a live segment: existing
        points get deleted placeholder rows (the same lockstep-offset
        scheme upserts use for absent named vectors)."""
        if name in self.dense or name in self.multi or name in self.sparse:
            return  # idempotent: WAL replay re-applies the op after load
        self.params.vectors[name] = vp
        n = self.total_offsets
        if vp.multivector_config is not None:
            store = MultiVectorStore(vp.size, vp.distance, vp.datatype)
            for _ in range(n):
                store.add([np.zeros((1, vp.size), dtype=np.float32)])
                store.delete(len(store) - 1)
            self.multi[name] = store
        else:
            store = DenseVectorStore(
                vp.size, vp.distance, vp.datatype, on_disk=vp.on_disk
            )
            if n:
                offs = store.add(np.zeros((n, vp.size), dtype=np.float32))
                for off in offs:
                    store.delete(int(off))
            self.dense[name] = store

    def drop_vector_name(self, name: str) -> None:
        if name not in self.dense and name not in self.multi:
            return  # idempotent under WAL replay
        self.params.vectors.pop(name, None)
        self.dense.pop(name, None)
        self.multi.pop(name, None)
        self.hnsw.pop(name, None)
        self.hnsw_multi.pop(name, None)
        self.hnsw_blocks.pop(name, None)
        self.quantized.pop(name, None)

    # ------------------------------------------------------------------
    # introspection
    # ------------------------------------------------------------------

    def __len__(self) -> int:
        return len(self.id_tracker)

    def memory_usage_bytes(self) -> Dict[str, Any]:
        """Host/device/disk byte accounting over every store and index in
        this segment (reference: qdrant sizes storages for telemetry and
        optimizer placement decisions; lib/segment SegmentInfo ram/disk
        sizes). → totals + a per-component breakdown."""
        from ..utils.memsize import merge, sizeof, total

        parts = {
            "dense": merge(*(sizeof(s) for s in self.dense.values())),
            "multi": merge(*(sizeof(s) for s in self.multi.values())),
            "sparse_index": merge(
                *(sizeof(i) for i in self.sparse_index.values())
            ),
            "quantized": merge(*(sizeof(q) for q in self.quantized.values())),
            "hnsw": merge(
                *(sizeof(h) for h in self.hnsw.values()),
                *(sizeof(h) for h in self.hnsw_multi.values()),
                *(
                    sizeof(h)
                    for blocks in self.hnsw_blocks.values()
                    for h in blocks.values()
                ),
            ),
            "payload_index": sizeof(self.payload_index),
            "payload_storage": sizeof(self.payload_storage),
        }
        out: Dict[str, Any] = merge(*parts.values())
        out["total_bytes"] = total(out)
        out["breakdown"] = {
            k: v for k, v in parts.items() if total(v) > 0
        }
        return out

    @property
    def total_offsets(self) -> int:
        """Upper bound on internal offsets (including deleted slots)."""
        counts = (
            [len(s) for s in self.dense.values()]
            + [len(s) for s in self.multi.values()]
            + [len(s) for s in self.sparse.values()]
        )
        return max(counts, default=0)

    def _has_vector(self, name: str, offset: int) -> bool:
        if name in self.dense:
            store = self.dense[name]
            return offset < len(store) and not store.is_deleted(offset)
        if name in self.multi:
            store = self.multi[name]
            return offset < len(store) and not store.is_deleted(offset)
        if name in self.sparse:
            return not self.sparse[name].is_deleted(offset)
        return False

    def available_point_count(self) -> int:
        return len(self.id_tracker)

    # ------------------------------------------------------------------
    # write ops (idempotent by op_num; reference: segment/entry.rs)
    # ------------------------------------------------------------------

    def point_version(self, external_id: PointId) -> Optional[int]:
        internal = self.id_tracker.internal_id(external_id)
        if internal is None:
            return None
        return self.id_tracker.version(internal)

    def _stale(self, external_id: PointId, op_num: int) -> bool:
        internal = self.id_tracker.internal_id(external_id)
        if internal is None:
            return False
        return self.id_tracker.version(internal) > op_num

    def upsert_point(
        self,
        op_num: int,
        external_id: PointId,
        vectors: Dict[str, Any],
        payload: Optional[Dict[str, Any]] = None,
        deferred: bool = False,
    ) -> bool:
        if self._stale(external_id, op_num):
            return False
        internal = self.id_tracker.internal_id(external_id)
        new_offset = self._next_offset() if internal is None else internal

        for name, store in self.dense.items():
            vec = vectors.get(name)
            if vec is not None:
                arr = np.asarray(vec, dtype=np.float32)
                if internal is None:
                    off = store.add(arr[None, :])[0]
                    assert off == new_offset, (off, new_offset)
                else:
                    store.set(internal, arr)
            elif internal is None:
                # keep offsets aligned across stores: add a deleted placeholder
                off = store.add(np.zeros((1, store.dim), dtype=np.float32))[0]
                store.delete(off)
        for name, store in self.multi.items():
            vec = vectors.get(name)
            if vec is not None:
                if internal is None:
                    store.add([np.asarray(vec, dtype=np.float32)])
                else:
                    store.set(internal, np.asarray(vec, dtype=np.float32))
            elif internal is None:
                off = store.add([np.zeros((1, store.dim), dtype=np.float32)])[0]
                store.delete(off)
        for name, store in self.sparse.items():
            vec = vectors.get(name)
            if vec is not None:
                sv = vec if isinstance(vec, SparseVector) else SparseVector.from_dict(vec)
                if internal is None:
                    store.add([sv])
                else:
                    store.set(internal, sv)
                self.sparse_index[name].invalidate()
            elif internal is None:
                store.add([SparseVector([], [])])
                store.delete(len(store) - 1)

        self.id_tracker.link(external_id, new_offset, op_num)
        if deferred:
            self.deferred.add(new_offset)
        else:
            self.deferred.discard(new_offset)
        if payload is not None:
            self.payload_storage.overwrite(new_offset, payload)
            self.payload_index.update_point(new_offset, payload)
        elif internal is None:
            self.payload_storage.overwrite(new_offset, None)
        self.version = max(self.version, op_num)
        # new points invalidate a sealed graph's coverage; mark non-appendable
        # segments dirty so the optimizer rebuilds (reference: proxy segments)
        return True

    def bulk_ingest(
        self,
        op_num: int,
        ids: List[PointId],
        dense: Dict[str, np.ndarray],  # name → [N, D] f32
        payloads: Optional[List[Optional[dict]]] = None,
    ) -> int:
        """Array-native bulk load of FRESH points into an appendable
        segment: one numpy append per dense store + one bulk id-tracker
        link, instead of N python upserts (the per-point path costs ~100 µs
        of interpreter time each — minutes per million points on a small
        host). Reference analogue: batch upserts / snapshot bulk recovery
        (the reference streams raw storage bytes on transfers,
        entry_point.rs:439-452 upsert_point_raw). Callers ensure ids are
        not already present (the shard routes bulk loads at fresh offsets
        and flushes immediately — shard.bulk_ingest)."""
        if not self.appendable:
            raise ValueError("bulk_ingest requires an appendable segment")
        n = len(ids)
        if n == 0:
            return 0
        start = self._next_offset()
        for name, store in self.dense.items():
            vecs = dense.get(name)
            if vecs is not None:
                if len(vecs) != n:
                    raise ValueError(
                        f"bulk_ingest: {len(vecs)} vectors for {n} ids"
                    )
                offs = store.add(np.asarray(vecs, dtype=np.float32))
                assert offs[0] == start, (offs[0], start)
            else:
                pad = np.zeros((n, store.dim), dtype=np.float32)
                offs = store.add(pad)
                for off in offs:
                    store.delete(int(off))
        for name, store in self.multi.items():
            for _ in range(n):
                off = store.add([np.zeros((1, store.dim), dtype=np.float32)])[0]
                store.delete(off)
        for name, store in self.sparse.items():
            if hasattr(store, "add_flat"):
                store.add_flat(
                    np.zeros(n, dtype=np.int64),
                    np.zeros(0, dtype=np.int64),
                    np.zeros(0, dtype=np.float32),
                )
            else:  # pragma: no cover - all sparse stores support add_flat
                for _ in range(n):
                    store.add([SparseVector([], [])])
            self.sparse_index[name].invalidate()
        self.id_tracker.bulk_link_fresh(list(ids), start, op_num)
        if payloads is not None:
            for i, payload in enumerate(payloads):
                if payload:
                    self.payload_storage.overwrite(start + i, payload)
                    self.payload_index.update_point(start + i, payload)
        self.version = max(self.version, op_num)
        return n

    def _next_offset(self) -> int:
        return self.total_offsets

    def delete_point(self, op_num: int, external_id: PointId) -> bool:
        if self._stale(external_id, op_num):
            return False
        internal = self.id_tracker.drop(external_id)
        if internal is None:
            return False
        for store in self.dense.values():
            store.delete(internal)
        for store in self.multi.values():
            store.delete(internal)
        for name, store in self.sparse.items():
            if store.delete(internal):
                self.sparse_index[name].invalidate()
        self.payload_index.remove_point(internal)
        self.payload_storage.clear(internal)
        self.version = max(self.version, op_num)
        return True

    def update_vectors(
        self, op_num: int, external_id: PointId, vectors: Dict[str, Any]
    ) -> bool:
        if self._stale(external_id, op_num):
            return False
        internal = self.id_tracker.internal_id(external_id)
        if internal is None:
            return False
        for name, vec in vectors.items():
            if name in self.dense:
                self.dense[name].set(internal, np.asarray(vec, dtype=np.float32))
            elif name in self.multi:
                self.multi[name].set(internal, np.asarray(vec, dtype=np.float32))
            elif name in self.sparse:
                sv = vec if isinstance(vec, SparseVector) else SparseVector.from_dict(vec)
                self.sparse[name].set(internal, sv)
                self.sparse_index[name].invalidate()
        self.id_tracker.set_version(internal, op_num)
        self.version = max(self.version, op_num)
        return True

    def delete_vectors(
        self, op_num: int, external_id: PointId, names: List[str]
    ) -> bool:
        if self._stale(external_id, op_num):
            return False
        internal = self.id_tracker.internal_id(external_id)
        if internal is None:
            return False
        for name in names:
            if name in self.dense:
                self.dense[name].delete(internal)
            elif name in self.multi:
                self.multi[name].delete(internal)
            elif name in self.sparse:
                if self.sparse[name].delete(internal):
                    self.sparse_index[name].invalidate()
        self.id_tracker.set_version(internal, op_num)
        self.version = max(self.version, op_num)
        return True

    def set_payload(
        self,
        op_num: int,
        external_id: PointId,
        payload: Dict[str, Any],
        key: Optional[str] = None,
    ) -> bool:
        if self._stale(external_id, op_num):
            return False
        internal = self.id_tracker.internal_id(external_id)
        if internal is None:
            return False
        if key:
            self.payload_storage.set_by_key(internal, payload, key)
        else:
            self.payload_storage.set(internal, payload)
        self.payload_index.update_point(internal, self.payload_storage.get(internal))
        self.id_tracker.set_version(internal, op_num)
        self.version = max(self.version, op_num)
        return True

    def overwrite_payload(
        self, op_num: int, external_id: PointId, payload: Optional[Dict[str, Any]]
    ) -> bool:
        if self._stale(external_id, op_num):
            return False
        internal = self.id_tracker.internal_id(external_id)
        if internal is None:
            return False
        self.payload_storage.overwrite(internal, payload)
        self.payload_index.update_point(internal, self.payload_storage.get(internal))
        self.id_tracker.set_version(internal, op_num)
        self.version = max(self.version, op_num)
        return True

    def delete_payload_key(self, op_num: int, external_id: PointId, key: str) -> bool:
        if self._stale(external_id, op_num):
            return False
        internal = self.id_tracker.internal_id(external_id)
        if internal is None:
            return False
        self.payload_storage.delete_key(internal, key)
        self.payload_index.update_point(internal, self.payload_storage.get(internal))
        self.id_tracker.set_version(internal, op_num)
        self.version = max(self.version, op_num)
        return True

    def clear_payload(self, op_num: int, external_id: PointId) -> bool:
        if self._stale(external_id, op_num):
            return False
        internal = self.id_tracker.internal_id(external_id)
        if internal is None:
            return False
        self.payload_storage.clear(internal)
        self.payload_index.remove_point(internal)
        self.id_tracker.set_version(internal, op_num)
        self.version = max(self.version, op_num)
        return True

    def create_field_index(self, field: str, params: PayloadIndexParams) -> None:
        self.payload_index.set_indexed(field, params)

    def delete_field_index(self, field: str) -> None:
        self.payload_index.drop_index(field)

    # ------------------------------------------------------------------
    # reads
    # ------------------------------------------------------------------

    def get_payload(self, external_id: PointId) -> Optional[Dict[str, Any]]:
        internal = self.id_tracker.internal_id(external_id)
        if internal is None:
            return None
        return self.payload_storage.get(internal)

    def get_vectors(self, external_id: PointId) -> Optional[Dict[str, Any]]:
        internal = self.id_tracker.internal_id(external_id)
        if internal is None:
            return None
        out: Dict[str, Any] = {}
        for name, store in self.dense.items():
            if internal < len(store) and not store.is_deleted(internal):
                out[name] = store.get(internal).tolist()
        for name, store in self.multi.items():
            if internal < len(store) and not store.is_deleted(internal):
                out[name] = store.get(internal).tolist()
        for name, store in self.sparse.items():
            sv = store.get(internal)
            if sv is not None:
                out[name] = sv.to_dict()
        return out

    def filter_mask(self, flt: Optional[Filter]) -> Optional[np.ndarray]:
        return self.payload_index.filter_mask(flt, self.total_offsets)

    def facet_counts(
        self, key: str, flt: Optional[Filter] = None
    ) -> Optional[Dict[Any, int]]:
        """Index-backed facet counts (reference: facets read the keyword
        index postings, segment/src/index/.../facet_index.rs). Returns None
        when the field has no map index — callers fall back to the payload
        scan. Postings are maintained on every update/delete, so their
        lengths are exact without touching payload storage."""
        fi = self.payload_index.field_indexes.get(key)
        if fi is None or fi.map_index is None:
            return None
        mask = self.filter_mask(flt)
        # postings include deferred (unconfirmed) and stale offsets — the
        # payload-scan fallback excludes them via alive visibility, so the
        # fast path must intersect with alive too or facet results diverge
        # while deferred writes are in flight
        alive = self.alive_mask()
        if mask is None:
            mask = alive
        else:
            mask = mask[: len(alive)] & alive[: len(mask)]
        counts: Dict[Any, int] = {}
        for value, offs in fi.map_index.postings.items():
            arr = np.fromiter(offs, dtype=np.int64, count=len(offs))
            arr = arr[arr < len(mask)]
            c = int(mask[arr].sum())
            if c:
                counts[value] = c
        return counts

    def alive_mask(self) -> np.ndarray:
        """Mask of offsets currently linked to an external id and visible
        (deferred heads excluded until confirmed)."""
        n = self.total_offsets
        mask = np.zeros(n, dtype=bool)
        ids = self.id_tracker.internal_ids_array()
        if len(ids):
            mask[ids[ids < n]] = True
        for off in self.deferred:
            if off < n:
                mask[off] = False
        return mask

    def confirm_deferred(self, op_num: int, external_id: PointId) -> bool:
        """Make a deferred point visible to reads."""
        internal = self.id_tracker.internal_id(external_id)
        if internal is None or internal not in self.deferred:
            return False
        self.deferred.discard(internal)
        self.id_tracker.set_version(internal, op_num)
        self.version = max(self.version, op_num)
        return True

    @property
    def num_deferred_points(self) -> int:
        return len(self.deferred)

    # ------------------------------------------------------------------
    # search
    # ------------------------------------------------------------------

    @_with_search_budget
    def search_dense(
        self,
        name: str,
        queries: np.ndarray,  # [B, D] raw
        k: int,
        flt: Optional[Filter] = None,
        params: Optional[SearchParams] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (scores [B, k] internal convention, offsets [B, k])."""
        return self.finish_dispatch(
            self._search_dense_dispatch(name, queries, k, flt, params)
        )

    @_with_search_budget
    def search_dense_dispatch(
        self,
        name: str,
        queries: np.ndarray,
        k: int,
        flt: Optional[Filter] = None,
        params: Optional[SearchParams] = None,
    ):
        """Async dispatch: starts the device program and returns an opaque
        handle WITHOUT blocking on the result. Callers keep several batches
        in flight and sync them with ONE `jax.device_get` via
        `sync_dispatches` — the pipelined serving shape (one host↔device
        round trip per window instead of per batch). Branches that compute
        host-side (graph beam, quantized two-stage) fall back to synchronous
        execution inside the handle; pipelining degrades gracefully."""
        return self._search_dense_dispatch(name, queries, k, flt, params)

    @staticmethod
    def finish_dispatch(handle, fetched=None) -> Tuple[np.ndarray, np.ndarray]:
        """Resolve a search_dense_dispatch handle to host (scores, ids)."""
        if handle[0] == "host":
            return handle[1]
        from ..index.plain import finalize_device_result

        _, (s_dev, i_dev, b, k_eff), k = handle
        s_host, i_host = fetched if fetched is not None else (s_dev, i_dev)
        return finalize_device_result(s_host, i_host, b, k_eff, k)

    @staticmethod
    def sync_dispatches(handles) -> list:
        """Fetch every device-resident handle with ONE jax.device_get and
        finish all handles in order → [(scores, ids)]."""
        import jax

        dev_pos = [i for i, h in enumerate(handles) if h[0] == "dev"]
        fetched = (
            jax.device_get([(handles[i][1][0], handles[i][1][1]) for i in dev_pos])
            if dev_pos
            else []
        )
        by_pos = dict(zip(dev_pos, fetched))
        return [
            Segment.finish_dispatch(h, by_pos.get(i))
            for i, h in enumerate(handles)
        ]

    def _search_dense_dispatch(
        self,
        name: str,
        queries: np.ndarray,
        k: int,
        flt: Optional[Filter] = None,
        params: Optional[SearchParams] = None,
    ):
        params = params or SearchParams()
        store = self.dense.get(name)
        if store is None:
            raise ValueError(f"vector {name!r} does not exist in this collection")
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        if queries.shape[1] != store.dim:
            raise ValueError(
                f"Wrong input: vector dimension {queries.shape[1]} does not "
                f"match the collection dimensionality {store.dim}"
            )
        n = self.total_offsets
        if n == 0:
            b = len(np.atleast_2d(queries))
            return (
                "host",
                (
                    np.full((b, k), -np.inf, dtype=np.float32),
                    np.full((b, k), -1, dtype=np.int32),
                ),
            )
        fmask = self.filter_mask(flt)
        alive = self.alive_mask()
        combined = alive if fmask is None else (alive & fmask)
        hw_counter.add(
            vectors_scored=int(combined.sum()),
            dims=store.dim,
            filter_evals=1 if fmask is not None else 0,
        )

        vp = self.params.vectors[name]
        hnsw = self.hnsw.get(name)
        ef = params.hnsw_ef or max(k, 64)

        # filterable HNSW: a match-value filter covered by a payload-block
        # subgraph searches that block's graph directly (same crossover gate
        # as the main graph: below it the masked scan is exact and faster)
        if (
            hnsw is not None
            and not params.exact
            and flt is not None
            and (
                params.hnsw_ef is not None
                or len(combined) >= GRAPH_CROSSOVER_ROWS
            )
        ):
            for field, vkey in _block_conditions(flt):
                sub = self.hnsw_blocks.get(name, {}).get((field, vkey))
                if sub is not None:
                    return (
                        "host",
                        sub.search(queries, k, ef=ef, filter_mask=combined),
                    )

        use_graph = (
            hnsw is not None
            and not params.exact
            and self._should_use_graph(
                vp, combined, fmask is not None,
                explicit_ef=params.hnsw_ef is not None,
            )
        )
        quant = None if params.quantization_ignore else self.quantized.get(name)

        if use_graph:
            # ACORN dispatch: low-selectivity filters traverse the unfiltered
            # graph (reference: hnsw/read_view/search.rs:60-86 gate)
            acorn = False
            if fmask is not None and params.acorn_enable is not False:
                selectivity = combined.sum() / max(len(combined), 1)
                acorn = bool(
                    params.acorn_enable
                    or selectivity <= params.acorn_max_selectivity
                )
            return (
                "host",
                hnsw.search(queries, k, ef=ef, filter_mask=combined, acorn=acorn),
            )
        if quant is not None and not params.exact:
            return (
                "host",
                self._search_quantized(name, quant, queries, k, combined, params),
            )
        return ("dev", PlainIndex(store).search_device(queries, k, combined), k)

    def _should_use_graph(
        self,
        vp: VectorParams,
        combined_mask: np.ndarray,
        filtered: bool,
        explicit_ef: bool = False,
    ) -> bool:
        """Cost-model dispatch. Two gates, both scan-favoring:

        * filtered: small filtered cardinality → exact scan of matching
          points (reference semantics, hnsw/read_view/dispatch.rs:111-170).
        * unfiltered: below the measured scan-vs-graph crossover row count
          (GRAPH_CROSSOVER_ROWS) the batched MXU scan is both faster AND
          exact, so the graph only takes over above it — unless the caller
          asked for the graph explicitly by setting params.hnsw_ef.
        """
        threshold = (
            vp.hnsw_config.full_scan_threshold
            if vp.hnsw_config
            else DEFAULT_FULL_SCAN_THRESHOLD
        )
        cardinality = int(combined_mask.sum())
        if filtered and cardinality < threshold:
            return False
        if explicit_ef:
            return True
        # the masked scan scores every row whatever the filter matches, so
        # the crossover gate is on total rows for both cases
        return len(combined_mask) >= GRAPH_CROSSOVER_ROWS

    def _host_rescore(
        self, store, q: np.ndarray, cand: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact f32 rescore of per-query candidates by gathering their rows
        from the HOST tier (disk memmap) — the quantized-primary path's
        second stage (reference: on-disk original vectors + always_ram
        quantized codes, vector_storage/quantized/quantized_vectors.rs:52).
        Scores use the engine's exact conventions (-(q-v)^2 / dot)."""
        b = q.shape[0]
        cand = np.asarray(cand, dtype=np.int32)
        n = len(store)
        dist = store.distance
        # one stacked gather + one BLAS pass for the whole batch: a
        # per-query python loop costs ~8 ms/query in interpreter overhead
        # alone on this class of host — at B=64 that is the entire latency
        # budget of the quantized-primary path's second stage
        c = cand.shape[1]
        valid = (cand >= 0) & (cand < n)
        safe = np.where(valid, cand, 0)
        rows = np.asarray(
            store.get_batch(safe.ravel()), dtype=np.float32
        ).reshape(b, c, -1)
        if dist is Distance.EUCLID:
            d = rows - q[:, None, :]
            sc = -np.einsum("bcd,bcd->bc", d, d)
        elif dist is Distance.MANHATTAN:
            sc = -np.abs(rows - q[:, None, :]).sum(axis=2)
        else:
            sc = np.einsum("bcd,bd->bc", rows, q)
        sc = np.where(valid, sc, -np.inf)
        kk = min(k, c)
        part = np.argpartition(-sc, kk - 1, axis=1)[:, :kk]
        psc = np.take_along_axis(sc, part, axis=1)
        order = np.argsort(-psc, axis=1, kind="stable")
        top = np.take_along_axis(part, order, axis=1)
        s_out = np.full((b, k), -np.inf, dtype=np.float32)
        i_out = np.full((b, k), -1, dtype=np.int32)
        s_out[:, :kk] = np.take_along_axis(sc, top, axis=1)
        i_out[:, :kk] = np.take_along_axis(cand, top, axis=1)
        i_out[:, :kk] = np.where(
            np.isfinite(s_out[:, :kk]), i_out[:, :kk], -1
        )
        return s_out, i_out

    def _search_sq_pallas(
        self, quant, store, q: np.ndarray, k: int, k_over: int,
        mask: np.ndarray, params: SearchParams,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """SQ large-N on TPU: fused Pallas int8 scan (ops/pallas_scan.py) +
        optional exact f32 rescore of the oversampled winners."""
        import jax.numpy as jnp

        from ..ops import pallas_scan as ps

        d_pad = max((store.dim + 127) // 128 * 128, 128)
        # int8 codes: the VMEM-scaled block (see ops/pallas_scan.py —
        # the fixed 4096 default fails to compile past ~512 dims)
        blk = ps.pallas_block_for(d_pad, itemsize=1)
        codes_dev, norms_host, n_pad = quant.pallas_device(block=blk)
        assert codes_dev.shape[1] == d_pad
        euclid = store.distance in (Distance.EUCLID, Distance.MANHATTAN)
        mask_pad = np.zeros(n_pad, dtype=bool)
        mask_pad[: len(mask)] = mask[:n_pad]
        bias = np.where(
            mask_pad, -norms_host if euclid else 0.0, ps.NEG_INF
        ).astype(np.float32)
        scale_sq = jnp.float32(
            (2.0 if euclid else 1.0) * quant.scale * quant.scale
        )
        b = q.shape[0]
        b_pad = max(8, (b + 7) // 8 * 8)
        if b_pad >= 128 and b_pad % 128:
            b_pad = (b_pad + 127) // 128 * 128
        q_codes = np.zeros((b_pad, d_pad), dtype=np.int8)
        q_codes[:b, : q.shape[1]] = quant.encode_queries(q)
        k_over = min(max(k_over, 128), 1024)
        qt, slots = ps.pallas_qt_slots(b_pad, k_over, blk, d_pad, itemsize=1)
        if params.quantization_rescore:
            vectors_f32, _ = store.device_block()
            q_f32 = np.zeros((b_pad, vectors_f32.shape[1]), dtype=np.float32)
            q_f32[:b, : q.shape[1]] = q
            top_s, top_i = ps.pallas_scan_rescore(
                jnp.asarray(q_f32),
                jnp.asarray(q_codes),
                codes_dev,
                jnp.asarray(bias),
                vectors_f32.astype(jnp.float32)
                if vectors_f32.dtype != jnp.float32
                else vectors_f32,
                k_over,
                min(k, k_over),
                scale_sq=scale_sq,
                blk=blk,
                qt=qt,
                slots=slots,
                euclid=euclid,
                int8_mode=True,
            )
            s = np.asarray(top_s, dtype=np.float32)[:b]
            i = np.asarray(top_i, dtype=np.int32)[:b]
        else:
            top_s, top_i = ps.pallas_scan_topk(
                jnp.asarray(q_codes),
                codes_dev,
                jnp.asarray(bias),
                min(k, k_over),
                scale_sq=scale_sq,
                blk=blk,
                qt=qt,
                slots=slots,
                int8_mode=True,
            )
            s = np.asarray(top_s, dtype=np.float32)[:b]
            i = np.asarray(top_i, dtype=np.int32)[:b]
            if euclid:
                q_sq = (q * q).sum(axis=1, keepdims=True)
                s = np.where(i >= 0, s - q_sq, -np.inf)
        if s.shape[1] < k:
            pad = k - s.shape[1]
            s = np.pad(s, ((0, 0), (0, pad)), constant_values=-np.inf)
            i = np.pad(i, ((0, 0), (0, pad)), constant_values=-1)
        return s, i

    def _search_quantized(
        self,
        name: str,
        quant: Any,
        queries: np.ndarray,
        k: int,
        mask: np.ndarray,
        params: SearchParams,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Quantized full scan + oversampled f32 rescore (reference:
        vector_index_search_common.rs:48 get_oversampled_top)."""
        store = self.dense[name]
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        q = preprocess_vectors(queries, store.distance)
        oversampling = params.quantization_oversampling or DEFAULT_OVERSAMPLING
        k_over = min(max(int(k * oversampling), k), max(int(mask.sum()), 1))

        if isinstance(quant, qops.ScalarQuantized) and len(store) >= FLAT_SCAN_MIN_N:
            import os as _os

            from ..ops.pallas_scan import is_tpu_backend

            from ..utils.flags import flag_env

            if is_tpu_backend() and flag_env("pallas_scan", "QDRANT_TPU_PALLAS"):
                if not store.on_disk:
                    return self._search_sq_pallas(
                        quant, store, q, k, k_over, mask, params
                    )
            # large-N: blocked int8 scan (group-reduction top-k) + f32 rescore
            from ..ops.scan import DEFAULT_BLOCK, scan_search_sq

            codes_dev, norms_dev, n_pad = quant.scan_device(DEFAULT_BLOCK)
            mask_pad = np.zeros(n_pad, dtype=np.int8)
            mask_pad[: len(mask)] = mask[:n_pad]
            q_codes = quant.encode_queries(q)
            q_norms = (q * q).sum(axis=1).astype(np.float32)
            scores = None
            # group reduction keeps one winner per 128 rows — widen the
            # candidate set so the f32 rescore recovers full recall
            k_over = min(max(k_over, 128), max(int(mask.sum()), 1))
            euclid = store.distance in (Distance.EUCLID, Distance.MANHATTAN)
            if params.quantization_rescore and store.on_disk:
                # int8 scan for candidates; exact rescore from the host
                # tier. Flat (zero-copy) scan: the codes block may fill
                # most of HBM in the quantized-primary tier, and the
                # lax.scan formulation would materialize a second copy.
                from ..ops.scan import scan_search_sq_flat

                top_s, cand = scan_search_sq_flat(
                    jnp.asarray(q_codes),
                    jnp.asarray(q_norms),
                    codes_dev,
                    norms_dev,
                    jnp.float32(quant.scale),
                    jnp.asarray(mask_pad),
                    DEFAULT_BLOCK,
                    k_over,
                    euclid=euclid,
                )
                cand_np = np.where(
                    np.isfinite(np.asarray(top_s)),
                    np.asarray(cand, dtype=np.int32),
                    -1,
                )
                return self._host_rescore(store, q, cand_np, k)
            if params.quantization_rescore:
                from ..ops.scan import scan_search_sq_rescore

                vectors_f32, _ = store.device_block()
                top_s, top_i = scan_search_sq_rescore(
                    jnp.asarray(q_codes),
                    jnp.asarray(q_norms),
                    codes_dev,
                    norms_dev,
                    jnp.float32(quant.scale),
                    jnp.asarray(mask_pad),
                    jnp.asarray(q),
                    vectors_f32.astype(jnp.float32)
                    if vectors_f32.dtype != jnp.float32
                    else vectors_f32,
                    DEFAULT_BLOCK,
                    k_over,
                    min(k, k_over),
                    euclid,
                )
                s = np.asarray(top_s, dtype=np.float32)
                i = np.asarray(top_i, dtype=np.int32)
                if s.shape[1] < k:
                    pad = k - s.shape[1]
                    s = np.pad(s, ((0, 0), (0, pad)), constant_values=-np.inf)
                    i = np.pad(i, ((0, 0), (0, pad)), constant_values=-1)
                return s, i
            top_scores, top_ids = scan_search_sq(
                jnp.asarray(q_codes),
                jnp.asarray(q_norms),
                codes_dev,
                norms_dev,
                jnp.float32(quant.scale),
                jnp.asarray(mask_pad),
                DEFAULT_BLOCK,
                k_over,
                euclid=euclid,
            )
        elif isinstance(quant, qops.ScalarQuantized):
            codes_dev, norms_dev = quant.device()
            cap = codes_dev.shape[0]
            mask_pad = np.zeros(cap, dtype=bool)
            mask_pad[: len(mask)] = mask[:cap]
            q_codes = quant.encode_queries(q)
            q_norms = (q * q).sum(axis=1).astype(np.float32)
            scores = qops.score_sq(
                jnp.asarray(q_codes),
                jnp.asarray(q_norms),
                codes_dev,
                norms_dev,
                jnp.float32(quant.scale),
                store.distance.value,
                jnp.asarray(mask_pad),
            )
        elif isinstance(quant, qops.BinaryQuantized):
            signs = quant.device()
            cap = signs.shape[0]
            mask_pad = np.zeros(cap, dtype=bool)
            mask_pad[: len(mask)] = mask[:cap]
            scores = qops.score_bq(
                jnp.asarray(q), signs, store.distance.value, jnp.asarray(mask_pad)
            )
        elif isinstance(quant, qops.TurboQuantized):
            euclid = store.distance in (Distance.EUCLID, Distance.MANHATTAN)
            if store.on_disk and len(store) >= FLAT_SCAN_MIN_N:
                # TQ-as-primary tier (reference: vector_storage/turbo/
                # mod.rs:1-29): packed low-bit codes are the ONLY device
                # residency (bits/8 bytes per rotated dim); candidates
                # rescore exactly from the host f32 memmap
                from ..ops.scan import DEFAULT_BLOCK, scan_search_tq_flat

                packed, scales_d, norms_d, levels_d, n_pad = (
                    quant.flat_device(DEFAULT_BLOCK)
                )
                mask_pad = np.zeros(n_pad, dtype=np.int8)
                mask_pad[: len(mask)] = mask[:n_pad]
                k_over = min(max(k_over, 128), max(int(mask.sum()), 1))
                q_rot = quant.rotate_queries(q)
                bits_w = {4: 4, 2: 2, 1.5: 2, 1: 1}[quant.bits]
                top_s, cand = scan_search_tq_flat(
                    jnp.asarray(q_rot),
                    jnp.asarray((q * q).sum(axis=1).astype(np.float32)),
                    packed,
                    scales_d,
                    norms_d,
                    levels_d,
                    jnp.asarray(mask_pad),
                    DEFAULT_BLOCK,
                    k_over,
                    euclid=euclid,
                    pack=quant.pack_factor,
                    bits_w=bits_w,
                )
                top_s_np = np.asarray(top_s)
                cand_np = np.where(
                    np.isfinite(top_s_np),
                    np.asarray(cand, dtype=np.int32),
                    -1,
                )
                if not params.quantization_rescore:
                    # codes-only scores (the latency knob) — same gate as
                    # the SQ path
                    return top_s_np[:, :k], cand_np[:, :k]
                return self._host_rescore(store, q, cand_np, k)
            recon, scales, norms = quant.device()
            cap = recon.shape[0]
            mask_pad = np.zeros(cap, dtype=bool)
            mask_pad[: len(mask)] = mask[:cap]
            scores = qops.score_tq(
                jnp.asarray(quant.rotate_queries(q)),
                recon,
                scales,
                norms,
                store.distance.value,
                jnp.asarray(mask_pad),
            )
        elif isinstance(quant, qops.ProductQuantized):
            codes = quant.device()
            cap = codes.shape[0]
            mask_pad = np.zeros(cap, dtype=bool)
            mask_pad[: len(mask)] = mask[:cap]
            lut = quant.query_lut(q, store.distance)
            scores = qops.score_pq(jnp.asarray(lut), codes, jnp.asarray(mask_pad))
        else:  # pragma: no cover
            raise ValueError(f"unknown quantization {type(quant)}")

        import jax.lax

        if scores is not None:
            top_scores, top_ids = jax.lax.top_k(scores, k_over)
        if not params.quantization_rescore:
            s = np.asarray(top_scores)[:, :k]
            i = np.asarray(top_ids, dtype=np.int32)[:, :k]
            return s, np.where(np.isfinite(s), i, -1)

        if store.on_disk:
            # quantized-primary tier: exact rescore gathers candidate rows
            # from the host memmap — the f32 block never enters HBM
            cand = np.where(
                np.isfinite(np.asarray(top_scores)),
                np.asarray(top_ids, dtype=np.int32),
                -1,
            )
            return self._host_rescore(store, q, cand, k)

        # f32 rescore of the oversampled candidates
        vectors, _ = store.device_block()
        cand = jnp.where(jnp.isfinite(top_scores), top_ids, -1).astype(jnp.int32)
        re_scores = score_ids_batch(jnp.asarray(q), vectors, cand, store.distance.value)
        re_top, re_idx = jax.lax.top_k(re_scores, min(k, k_over))
        final_ids = jnp.take_along_axis(cand, re_idx, axis=1)
        s = np.asarray(re_top, dtype=np.float32)
        i = np.asarray(final_ids, dtype=np.int32)
        i = np.where(np.isfinite(s), i, -1)
        if s.shape[1] < k:
            pad = k - s.shape[1]
            s = np.pad(s, ((0, 0), (0, pad)), constant_values=-np.inf)
            i = np.pad(i, ((0, 0), (0, pad)), constant_values=-1)
        return s, i

    @_with_search_budget
    def search_multi(
        self,
        name: str,
        query: np.ndarray,  # [T, D] query token matrix
        k: int,
        flt: Optional[Filter] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        store = self.multi[name]
        if len(store) == 0:
            return (
                np.full((1, k), -np.inf, dtype=np.float32),
                np.full((1, k), -1, dtype=np.int32),
            )
        fmask = self.filter_mask(flt)
        alive = self.alive_mask()
        combined = alive if fmask is None else (alive & fmask)
        tokens, token_mask, valid = store.padded_block()
        n = tokens.shape[0]
        comb_pad = np.zeros(n, dtype=bool)
        comb_pad[: len(combined)] = combined[:n]
        valid = jnp.logical_and(valid, jnp.asarray(comb_pad))
        q = preprocess_vectors(
            np.atleast_2d(np.asarray(query, dtype=np.float32)), store.distance
        )
        idx = self.hnsw_multi.get(name)
        vp = self.params.vectors[name]
        threshold = (
            vp.hnsw_config.full_scan_threshold
            if vp.hnsw_config
            else DEFAULT_FULL_SCAN_THRESHOLD
        )
        if idx is not None and len(store) >= threshold:
            # pooled graph walk → exact max-sim rescore of oversampled winners
            pooled_q = preprocess_vectors(
                np.asarray(query, dtype=np.float32).mean(axis=0, keepdims=True),
                store.distance,
            )
            k_over = min(max(4 * k, 64), max(int(combined.sum()), 1))
            _, cand = idx.search(pooled_q, k_over, filter_mask=combined)
            cand_ids = cand[0][cand[0] >= 0]
            if cand_ids.size:
                sub_tokens = jnp.take(tokens, jnp.asarray(cand_ids), axis=0)
                sub_tmask = jnp.take(token_mask, jnp.asarray(cand_ids), axis=0)
                sub_valid = jnp.take(valid, jnp.asarray(cand_ids), axis=0)
                sub_scores = score_multivector_maxsim(
                    jnp.asarray(q), sub_tokens, sub_tmask,
                    store.distance.value, sub_valid,
                )
                import jax.lax as _lax

                kk = min(k, int(cand_ids.size))
                top_s, ti = _lax.top_k(sub_scores, kk)
                s = np.full((1, k), -np.inf, dtype=np.float32)
                i = np.full((1, k), -1, dtype=np.int32)
                s[0, :kk] = np.asarray(top_s, dtype=np.float32)
                i[0, :kk] = cand_ids[np.asarray(ti, dtype=np.int64)]
                i[0] = np.where(np.isfinite(s[0]), i[0], -1)
                return s, i
        scores = score_multivector_maxsim(
            jnp.asarray(q), tokens, token_mask, store.distance.value, valid
        )
        import jax.lax

        k_eff = min(k, n)
        top_s, top_i = jax.lax.top_k(scores, k_eff)
        s = np.asarray(top_s, dtype=np.float32)[None, :]
        i = np.asarray(top_i, dtype=np.int32)[None, :]
        i = np.where(np.isfinite(s), i, -1)
        if k_eff < k:
            s = np.pad(s, ((0, 0), (0, k - k_eff)), constant_values=-np.inf)
            i = np.pad(i, ((0, 0), (0, k - k_eff)), constant_values=-1)
        return s, i

    @_with_search_budget
    def search_sparse(
        self,
        name: str,
        queries: List[SparseVector],
        k: int,
        flt: Optional[Filter] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        fmask = self.filter_mask(flt)
        alive = self.alive_mask()
        combined = alive if fmask is None else (alive & fmask)
        return self.sparse_index[name].search(queries, k, filter_mask=combined)

    def search_sparse_many(
        self,
        name: str,
        batches: List[List[SparseVector]],
        k: int,
        flt: Optional[Filter] = None,
    ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Pipelined multi-batch sparse search (one device sync per window;
        index/sparse.py::SparseIndex.search_many)."""
        fmask = self.filter_mask(flt)
        alive = self.alive_mask()
        combined = alive if fmask is None else (alive & fmask)
        return self.sparse_index[name].search_many(
            batches, k, filter_mask=combined
        )

    # ------------------------------------------------------------------
    # seal: build indexes + quantization (reference: SegmentBuilder::build)
    # ------------------------------------------------------------------

    def build_indexes(self, default_hnsw: Optional[HnswConfig] = None) -> None:
        # multivector stores: HNSW over the pooled proxy (see
        # PooledMultiVectorStore — pooled graph walk + exact max-sim rescore)
        for name, vp in self.params.vectors.items():
            mstore = self.multi.get(name)
            if mstore is None or mstore.available_count == 0:
                continue
            from .vectors import PooledMultiVectorStore

            cfg = vp.hnsw_config or default_hnsw or HnswConfig()
            proxy = PooledMultiVectorStore(mstore)
            idx = HnswIndex(proxy, cfg)
            idx.build()
            self.hnsw_multi[name] = idx
        for name, vp in self.params.vectors.items():
            if name not in self.dense:
                continue
            store = self.dense[name]
            cfg = vp.hnsw_config or default_hnsw or HnswConfig()
            # quantized-primary tier skips the graph: codes-only HBM
            # residency serves through the quantized scan + host-memmap
            # rescore; a graph would force the f32 block onto the device
            if store.available_count > 0 and not store.on_disk:
                # multi-device: per-shard sub-graphs served as one SPMD
                # fan-out over the mesh (index/hnsw.py::ShardedHnswIndex),
                # mirroring the sharded scan gate in ops/scan.py. Payload-
                # block subgraphs below stay single-device (they are small
                # by construction: bounded by full_scan_threshold blocks).
                import jax as _jax

                from ..index.hnsw import ShardedHnswIndex

                use_mesh = (
                    _jax.device_count() > 1
                    and os.environ.get("QDRANT_TPU_MESH", "1") != "0"
                )
                idx = (
                    ShardedHnswIndex(store, cfg)
                    if use_mesh
                    else HnswIndex(store, cfg)
                )
                idx.build()
                self.hnsw[name] = idx
                # payload-block subgraphs for filterable search
                blocks = self.payload_index.payload_blocks(cfg.full_scan_threshold)
                if blocks:
                    sub_m = cfg.payload_m or cfg.m
                    sub_cfg = HnswConfig(
                        m=sub_m,
                        ef_construct=cfg.ef_construct,
                        full_scan_threshold=cfg.full_scan_threshold,
                    )
                    for field, value, offsets in blocks:
                        sub = HnswIndex(store, sub_cfg, subset=offsets)
                        sub.build()
                        self.hnsw_blocks.setdefault(name, {})[
                            (field, repr(value))
                        ] = sub
            qc = vp.quantization_config
            if qc is not None and len(store) > 0:
                data = store.host_array
                if isinstance(qc, ScalarQuantizationConfig):
                    self.quantized[name] = qops.ScalarQuantized.encode(
                        data, qc.quantile or 0.99
                    )
                elif isinstance(qc, BinaryQuantizationConfig):
                    self.quantized[name] = qops.BinaryQuantized.encode(data)
                elif isinstance(qc, ProductQuantizationConfig):
                    self.quantized[name] = qops.ProductQuantized.encode(
                        data, qc.compression
                    )
                elif isinstance(qc, TurboQuantizationConfig):
                    bits = {"bits1": 1, "bits1_5": 1.5, "bits2": 2, "bits4": 4}[
                        qc.bits
                    ]
                    self.quantized[name] = qops.TurboQuantized.encode(data, bits=bits)
        self.appendable = False

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        meta = {
            "format_version": SEGMENT_FORMAT_VERSION,
            "version": self.version,
            "appendable": self.appendable,
            "params": self.params.to_dict(),
            "payload_indexes": {
                k: v.to_dict() for k, v in self.payload_index.indexed_fields().items()
            },
            "deferred": sorted(self.deferred),
            "hnsw": list(self.hnsw.keys()),
            "hnsw_multi": list(self.hnsw_multi.keys()),
            "hnsw_blocks": {
                name: [
                    [field, vkey, f"hnsw_block_{_safe(name)}_{i}"]
                    for i, (field, vkey) in enumerate(blocks.keys())
                ]
                for name, blocks in self.hnsw_blocks.items()
            },
            "quantized": {
                name: type(q).__name__ for name, q in self.quantized.items()
            },
            "payload_backend": (
                "gridstore"
                if self.params.on_disk_payload
                and not isinstance(self.payload_storage, PayloadStorage)
                else "memory"
            ),
        }
        with open(os.path.join(path, "segment.json"), "w") as f:
            json.dump(meta, f)
        self.id_tracker.save(path)
        if self.params.on_disk_payload and isinstance(
            self.payload_storage, PayloadStorage
        ):
            # on_disk_payload: move payload JSON out of RAM into the native
            # page store at persist time (reference: Gridstore-backed
            # on-disk payload storage). Falls back to msgpack without the
            # native toolchain.
            try:
                from .payload import GridPayloadStorage

                self.payload_storage = GridPayloadStorage.from_memory(
                    os.path.join(path, "payload_grid"), self.payload_storage
                )
                with open(os.path.join(path, "segment.json")) as f:
                    m2 = json.load(f)
                m2["payload_backend"] = "gridstore"
                with open(os.path.join(path, "segment.json"), "w") as f:
                    json.dump(m2, f)
            except Exception:
                pass
        self.payload_storage.save(path)
        for name, store in self.dense.items():
            store.save(os.path.join(path, f"dense_{_safe(name)}"))
        for name, store in self.multi.items():
            store.save(os.path.join(path, f"multi_{_safe(name)}"))
        for name, store in self.sparse.items():
            store.save(os.path.join(path, f"sparse_{_safe(name)}"))
        for name, idx in self.hnsw.items():
            idx.save(os.path.join(path, f"hnsw_{_safe(name)}"))
        for name, idx in self.hnsw_multi.items():
            idx.save(os.path.join(path, f"hnsw_multi_{_safe(name)}"))
        for name, blocks in self.hnsw_blocks.items():
            for i, sub in enumerate(blocks.values()):
                sub.save(os.path.join(path, f"hnsw_block_{_safe(name)}_{i}"))
        for name, q in self.quantized.items():
            q.save(os.path.join(path, f"quant_{_safe(name)}"))

    @classmethod
    def load(cls, path: str) -> "Segment":
        with open(os.path.join(path, "segment.json")) as f:
            meta = json.load(f)
        meta = _migrate_segment_meta(meta, path)
        params = CollectionParams.from_dict(meta["params"])
        seg = cls(params, appendable=meta["appendable"])
        seg.version = meta["version"]
        seg.deferred = set(meta.get("deferred", []))
        seg.id_tracker = IdTracker.load(path)
        if meta.get("payload_backend") == "gridstore":
            from .payload import GridPayloadStorage

            seg.payload_storage = GridPayloadStorage.load(path)
        else:
            seg.payload_storage = PayloadStorage.load(path)
        for name, vp in params.vectors.items():
            sub = os.path.join(path, f"dense_{_safe(name)}")
            if vp.multivector_config is not None:
                msub = os.path.join(path, f"multi_{_safe(name)}")
                if os.path.exists(msub):
                    seg.multi[name] = MultiVectorStore.load(
                        msub, vp.size, vp.distance, vp.datatype
                    )
            elif os.path.exists(sub):
                # low_memory_mode != disabled: force the f32 truth onto a
                # disk memmap even if the segment was saved RAM-resident
                # (reference: config.yaml:49-63 no_resident/no_populate)
                seg.dense[name] = DenseVectorStore.load(
                    sub, vp.size, vp.distance, vp.datatype,
                    on_disk=vp.on_disk or _LOW_MEMORY_MODE != "disabled",
                )
        for name, sp in params.sparse_vectors.items():
            sub = os.path.join(path, f"sparse_{_safe(name)}")
            seg.sparse[name] = SparseVectorStore.load(sub)
            seg.sparse_index[name] = SparseIndex(seg.sparse[name], sp.modifier)
        seg.payload_index = StructPayloadIndex(
            seg.payload_storage, seg.id_tracker, seg._has_vector
        )
        for field, pdict in meta.get("payload_indexes", {}).items():
            seg.payload_index.set_indexed(field, PayloadIndexParams.from_dict(pdict))
        for name in meta.get("hnsw", []):
            from ..index.hnsw import load_hnsw_any

            vp = params.vectors[name]
            cfg = vp.hnsw_config or HnswConfig()
            seg.hnsw[name] = load_hnsw_any(
                os.path.join(path, f"hnsw_{_safe(name)}"), seg.dense[name], cfg
            )
        for name in meta.get("hnsw_multi", []):
            from .vectors import PooledMultiVectorStore

            mstore = seg.multi.get(name)
            if mstore is None:
                continue
            vp = params.vectors[name]
            cfg = vp.hnsw_config or HnswConfig()
            seg.hnsw_multi[name] = HnswIndex.load(
                os.path.join(path, f"hnsw_multi_{_safe(name)}"),
                PooledMultiVectorStore(mstore),
                cfg,
            )
        for name, blocks in meta.get("hnsw_blocks", {}).items():
            vp = params.vectors[name]
            cfg = vp.hnsw_config or HnswConfig()
            sub_cfg = HnswConfig(
                m=cfg.payload_m or cfg.m,
                ef_construct=cfg.ef_construct,
                full_scan_threshold=cfg.full_scan_threshold,
            )
            for field, vkey, dirname in blocks:
                seg.hnsw_blocks.setdefault(name, {})[(field, vkey)] = HnswIndex.load(
                    os.path.join(path, dirname), seg.dense[name], sub_cfg
                )
        for name, qtype in meta.get("quantized", {}).items():
            qpath = os.path.join(path, f"quant_{_safe(name)}")
            if qtype == "TurboQuantized":
                seg.quantized[name] = qops.TurboQuantized.load(qpath)
            elif qtype == "ScalarQuantized":
                seg.quantized[name] = qops.ScalarQuantized.load(qpath)
            elif qtype == "BinaryQuantized":
                seg.quantized[name] = qops.BinaryQuantized.load(qpath)
            elif qtype == "ProductQuantized":
                seg.quantized[name] = qops.ProductQuantized.load(qpath)
        if _LOW_MEMORY_MODE == "no_populate":
            # TPU analogue of "skip mmap prefault": drop any device mirrors
            # created during load so HBM fills only on first search
            for store in seg.dense.values():
                store.drop_device()
        return seg


def _safe(name: str) -> str:
    return name if name else "_default"


def _block_conditions(flt: Filter):
    """Yield (field, value_repr) for plain match-value must conditions —
    candidates for payload-block subgraph dispatch."""
    if flt is None:
        return
    from ..types import FieldCondition, MatchValue

    for cond in flt.must:
        if (
            isinstance(cond, FieldCondition)
            and isinstance(cond.match, MatchValue)
            and cond.range is None
            and cond.geo_bounding_box is None
            and cond.geo_radius is None
            and cond.geo_polygon is None
            and cond.values_count is None
        ):
            yield cond.key, repr(cond.match.value)
