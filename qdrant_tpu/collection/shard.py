"""LocalShard: WAL + segment lifecycle + scatter-gather search.

Reference: lib/collection/src/shards/local_shard/ (WAL replay, update
pipeline shard_ops.rs:61) + lib/shard/src/segment_holder/ + the optimizer
policies (lib/collection/src/collection_manager/optimizers/ and
lib/shard/src/optimizers/segment_optimizer.rs:489):

  * updates append to the WAL, then apply to segments (idempotent per-point
    by op_num);
  * one appendable segment receives new points (searched exactly via MXU full
    scan); the optimizer seals it into an indexed immutable segment when it
    crosses the indexing threshold (indexing_optimizer), vacuums segments
    with many deletes (vacuum_optimizer), and merges small sealed segments
    (merge_optimizer);
  * searches fan out over all segments and merge top-k (the host analogue of
    segments_searcher.rs:212; cross-device fan-out lives in parallel/).
"""

from __future__ import annotations

import os
import shutil
import threading
import time
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..cluster.clock import ClockMap, ClockTag
from ..storage.segment import SearchParams, Segment
from ..storage.wal import open_wal
from ..types import (
    CollectionParams,
    Filter,
    HnswConfig,
    OptimizersConfig,
    PayloadIndexParams,
    PointId,
    SparseVector,
    normalize_point_id,
    parse_filter,
)


class ShardUpdateError(Exception):
    pass


class LocalShard:
    def __init__(
        self,
        path: str,
        params: CollectionParams,
        optimizers: Optional[OptimizersConfig] = None,
        wal_sync: bool = True,
    ):
        self.path = path
        self.params = params
        self.optimizers = optimizers or OptimizersConfig()
        # fsync the WAL before acknowledging writes (WalConfig.wal_sync)
        self.wal_sync = wal_sync
        os.makedirs(path, exist_ok=True)
        # coarse per-shard lock: updates/optimizer/flush are exclusive with
        # searches (reference: per-segment RwLocks; coarse is correct and
        # cheap under the GIL — finer granularity is a later optimization)
        self._lock = threading.RLock()
        self.wal = open_wal(os.path.join(path, "wal"))
        # causal clock tracking for replicated writes (reference:
        # local_shard/clock_map.rs); persisted with the shard
        self.clock_map = self._load_clock_map()
        self.segments: List[Segment] = []
        self._segment_dirs: Dict[int, str] = {}  # id(segment) → dir name
        self._seg_counter = 0
        # when True, updates never run the optimizer inline — a background
        # loop (TableOfContent._flush_loop) drives maybe_optimize() instead,
        # so seal/merge/vacuum index builds don't stall the write path
        # (reference: update_handler.rs optimizer worker pool)
        self.defer_optimizers = False
        self._load_segments()
        if not any(s.appendable for s in self.segments):
            self._add_segment(self._fresh_appendable())
        self._replay_wal()

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    def _segments_root(self) -> str:
        return os.path.join(self.path, "segments")

    def _load_segments(self) -> None:
        root = self._segments_root()
        if not os.path.isdir(root):
            os.makedirs(root, exist_ok=True)
            return
        for name in sorted(os.listdir(root)):
            seg_path = os.path.join(root, name)
            if os.path.isfile(os.path.join(seg_path, "segment.json")):
                seg = Segment.load(seg_path)
                self.segments.append(seg)
                self._segment_dirs[id(seg)] = name
                num = int(name.split("_")[-1])
                self._seg_counter = max(self._seg_counter, num + 1)

    def _add_segment(self, seg: Segment) -> None:
        name = f"seg_{self._seg_counter:06d}"
        self._seg_counter += 1
        self.segments.append(seg)
        self._segment_dirs[id(seg)] = name

    def _replay_wal(self) -> None:
        from_version = min((s.version for s in self.segments), default=0) + 1
        for op_num, op in self.wal.read_from(from_version):
            self._apply(op_num, op)

    def _fresh_appendable(self) -> Segment:
        # a new appendable is up to date with everything already applied:
        # stamping it with the newest segment version keeps WAL replay
        # (which starts at min(segment versions)+1) from re-running the
        # whole log every restart
        seg = Segment(self.params, appendable=True)
        seg.version = max((s.version for s in self.segments), default=0)
        return seg

    @property
    def appendable_segment(self) -> Segment:
        for seg in self.segments:
            if seg.appendable:
                return seg
        seg = self._fresh_appendable()
        self._add_segment(seg)
        return seg

    # ------------------------------------------------------------------
    # update pipeline
    # ------------------------------------------------------------------

    def update(
        self,
        op: Dict[str, Any],
        wait: bool = True,
        clock_tag: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, Any]:
        with self._lock:
            if clock_tag is not None:
                tag = ClockTag.from_dict(clock_tag)
                accepted, current_tick = self.clock_map.advance_result(tag)
                if not accepted:
                    # echo the shard's tick so the sender can advance + retry
                    return {
                        "operation_id": 0,
                        "status": "stale",
                        "current_tick": current_tick,
                    }
                op = {**op, "clock_tag": clock_tag}
            op_num = self.wal.append(op)
            if self.wal_sync and wait:
                self.wal.sync()
            self._apply(op_num, op)
        if wait and not self.defer_optimizers:
            self.maybe_optimize()
        return {
            "operation_id": op_num,
            "status": "completed" if wait else "acknowledged",
        }

    def _load_clock_map(self) -> ClockMap:
        import json as _json

        file = os.path.join(self.path, "clock_map.json")
        if os.path.exists(file):
            try:
                with open(file) as f:
                    return ClockMap.from_dict(_json.load(f))
            except (OSError, ValueError):
                pass
        return ClockMap()

    def _save_clock_map(self) -> None:
        import json as _json

        with open(os.path.join(self.path, "clock_map.json"), "w") as f:
            _json.dump(self.clock_map.to_dict(), f)

    def recovery_point(self) -> Dict[str, int]:
        """Serializable clock cut for WAL-delta transfers (reference:
        RecoveryPoint in clock_map.rs)."""
        return self.clock_map.to_dict()

    def wal_ops_since(self, recovery: Dict[str, int]):
        """Yield (op, clock_tag) for WAL records with clocks NEWER than the
        target's recovery point — the WAL-delta payload
        (reference: collection/src/wal_delta.rs)."""
        for _, op in self.wal.read_from(1):
            tag = op.get("clock_tag") if isinstance(op, dict) else None
            if not tag:
                continue
            key = f"{tag['peer_id']}:{tag['clock_id']}"
            if int(tag["clock_tick"]) > int(recovery.get(key, 0)):
                yield op, tag

    def _find_point(self, external_id: PointId) -> Optional[Segment]:
        for seg in self.segments:
            if seg.id_tracker.contains(external_id):
                return seg
        return None

    def _resolve_selector(self, op: Dict[str, Any]) -> List[PointId]:
        """Point selector: explicit ids or a filter (reference PointsSelector)."""
        if op.get("ids") is not None:
            return [normalize_point_id(p) for p in op["ids"]]
        flt = parse_filter(op.get("filter"))
        out: List[PointId] = []
        for seg in self.segments:
            mask = seg.filter_mask(flt)
            for ext in list(seg.id_tracker.external_ids()):
                internal = seg.id_tracker.internal_id(ext)
                if internal is None:
                    continue
                if mask is None or (internal < len(mask) and mask[internal]):
                    out.append(ext)
        return out

    def _apply(self, op_num: int, op: Dict[str, Any]) -> None:
        replay_tag = op.get("clock_tag")
        if replay_tag:
            self.clock_map.advance(
                ClockTag.from_dict({**replay_tag, "force": True})
            )
        t = op["type"]
        if t == "upsert":
            deferred = bool(op.get("deferred", False))
            for point in op["points"]:
                ext = normalize_point_id(point["id"])
                vectors = _decode_vectors(point.get("vectors") or {})
                payload = point.get("payload")
                target = self._find_point(ext)
                appendable = self.appendable_segment
                if target is not None:
                    cur = target.point_version(ext)
                    if cur is not None and op_num < cur:
                        # stale (replayed) upsert: a newer op already touched
                        # this point — moving it anyway would duplicate it in
                        # the appendable segment while the versioned delete
                        # on the old segment no-ops
                        continue
                if target is not None and target is not appendable:
                    # move point into the appendable segment (copy-on-write
                    # semantics of the reference's proxy segments)
                    old_payload = target.get_payload(ext)
                    old_vectors = target.get_vectors(ext) or {}
                    merged = {**_decode_vectors(old_vectors), **vectors}
                    target.delete_point(op_num, ext)
                    appendable.upsert_point(
                        op_num,
                        ext,
                        merged,
                        payload if payload is not None else old_payload,
                        deferred=deferred,
                    )
                else:
                    appendable.upsert_point(op_num, ext, vectors, payload, deferred=deferred)
        elif t == "confirm_deferred":
            for ext in self._resolve_selector(op):
                seg = self._find_point(ext)
                if seg is not None:
                    seg.confirm_deferred(op_num, ext)
        elif t == "delete":
            for ext in self._resolve_selector(op):
                seg = self._find_point(ext)
                if seg is not None:
                    seg.delete_point(op_num, ext)
        elif t == "update_vectors":
            for point in op["points"]:
                ext = normalize_point_id(point["id"])
                seg = self._find_point(ext)
                if seg is not None:
                    seg.update_vectors(op_num, ext, _decode_vectors(point["vectors"]))
        elif t == "delete_vectors":
            names = op["names"]
            for ext in self._resolve_selector(op):
                seg = self._find_point(ext)
                if seg is not None:
                    seg.delete_vectors(op_num, ext, names)
        elif t == "set_payload":
            for ext in self._resolve_selector(op):
                seg = self._find_point(ext)
                if seg is not None:
                    seg.set_payload(op_num, ext, op["payload"], op.get("key"))
        elif t == "overwrite_payload":
            for ext in self._resolve_selector(op):
                seg = self._find_point(ext)
                if seg is not None:
                    seg.overwrite_payload(op_num, ext, op["payload"])
        elif t == "delete_payload":
            for ext in self._resolve_selector(op):
                seg = self._find_point(ext)
                if seg is not None:
                    for key in op["keys"]:
                        seg.delete_payload_key(op_num, ext, key)
        elif t == "clear_payload":
            for ext in self._resolve_selector(op):
                seg = self._find_point(ext)
                if seg is not None:
                    seg.clear_payload(op_num, ext)
        elif t == "create_field_index":
            params = PayloadIndexParams.from_dict(op["params"])
            for seg in self.segments:
                seg.create_field_index(op["field"], params)
        elif t == "delete_field_index":
            for seg in self.segments:
                seg.delete_field_index(op["field"])
        elif t == "create_vector_name":
            # live named-vector addition (reference: vector_name_api.rs,
            # routed through the update plane like field indexes)
            from ..types import VectorParams

            vp = VectorParams.from_dict(op["params"])
            for seg in self.segments:
                seg.add_vector_name(op["name"], vp)
        elif t == "delete_vector_name":
            for seg in self.segments:
                seg.drop_vector_name(op["name"])
        elif t == "bulk_ingest_marker":
            # bulk loads flush their segment before returning; a replayed
            # marker means the crash hit before the flush — the data is
            # gone with the process and the load is re-run by the caller
            # (at-most-once semantics, shard.bulk_ingest)
            pass
        else:
            raise ShardUpdateError(f"unknown operation type {t!r}")

    # ------------------------------------------------------------------
    # reads
    # ------------------------------------------------------------------

    def point_count(self) -> int:
        return sum(len(s) for s in self.segments)

    def count(self, flt: Optional[Filter]) -> int:
        if flt is None:
            return self.point_count()
        total = 0
        for seg in self.segments:
            mask = seg.filter_mask(flt)
            alive = seg.alive_mask()
            total += int((alive & mask).sum()) if mask is not None else int(alive.sum())
        return total

    def retrieve(self, ids: List[PointId]) -> List[Tuple[PointId, Segment, int]]:
        """→ [(external_id, segment, internal_offset)] for existing points."""
        out = []
        for ext in ids:
            seg = self._find_point(ext)
            if seg is not None:
                out.append((ext, seg, seg.id_tracker.internal_id(ext)))
        return out

    def search_dense(
        self,
        name: str,
        queries: np.ndarray,
        k: int,
        flt: Optional[Filter] = None,
        params: Optional[SearchParams] = None,
    ) -> List[List[Tuple[float, PointId, int]]]:
        """→ per query: [(score, external_id, version)] merged over segments."""
        with self._lock:
            return self._search_dense_locked(name, queries, k, flt, params)

    def search_dense_many(
        self,
        name: str,
        batches: List[np.ndarray],
        k: int,
        flt: Optional[Filter] = None,
        params: Optional[SearchParams] = None,
    ) -> List[List[List[Tuple[float, PointId, int]]]]:
        """Pipelined multi-batch dense search: every (batch × segment)
        device program is dispatched before ANY result is synced, then all
        results return in ONE `jax.device_get` (Segment.sync_dispatches).
        On a tunneled host↔device link one synchronous round trip costs
        more than a 1M-row scan itself, so depth-D pipelining multiplies
        sustained throughput (reference analogue: the threadpool fan-out
        that keeps the engine saturated under concurrent load,
        segments_searcher.rs:212-306). → one result list per batch."""
        with self._lock:
            batches = [
                np.atleast_2d(np.asarray(q, dtype=np.float32)) for q in batches
            ]
            active = [
                seg for seg in self.segments
                if name in seg.dense and len(seg) > 0
            ]
            handles = []
            for q in batches:
                for seg in active:
                    handles.append(
                        seg.search_dense_dispatch(name, q, k, flt, params)
                    )
            resolved = Segment.sync_dispatches(handles)
            out_all: List[List[List[Tuple[float, PointId, int]]]] = []
            hi = 0
            for q in batches:
                b = q.shape[0]
                merged: List[Dict[PointId, Tuple[float, int]]] = [
                    dict() for _ in range(b)
                ]
                for seg in active:
                    scores, ids = resolved[hi]
                    hi += 1
                    for qi in range(b):
                        for s, off in zip(scores[qi], ids[qi]):
                            if off < 0 or not np.isfinite(s):
                                continue
                            ext = seg.id_tracker.external_id(int(off))
                            if ext is None:
                                continue
                            ver = seg.id_tracker.version(int(off))
                            prev = merged[qi].get(ext)
                            if prev is None or ver > prev[1]:
                                merged[qi][ext] = (float(s), ver)
                out = []
                for qi in range(b):
                    items = [
                        (s, ext, ver) for ext, (s, ver) in merged[qi].items()
                    ]
                    items.sort(key=lambda t: -t[0])
                    out.append(items[:k])
                out_all.append(out)
            return out_all

    def _search_dense_locked(
        self,
        name: str,
        queries: np.ndarray,
        k: int,
        flt: Optional[Filter] = None,
        params: Optional[SearchParams] = None,
    ) -> List[List[Tuple[float, PointId, int]]]:
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        b = queries.shape[0]
        merged: List[Dict[PointId, Tuple[float, int]]] = [dict() for _ in range(b)]
        active = [
            seg
            for seg in self.segments
            if name in seg.dense and len(seg) > 0
        ]
        # probabilistic limit subsampling (reference:
        # segments_searcher.rs:212-306): with many segments, each is asked
        # only for the Poisson quantile of its point share instead of the
        # full k; segments whose sampled result may hide better points
        # re-run unsampled below.
        use_sampling = len(active) > 1 and k >= 32
        seg_limits: Dict[int, int] = {}
        seg_lowest: Dict[int, np.ndarray] = {}
        seg_counts: Dict[int, np.ndarray] = {}
        if use_sampling:
            from .sampling import sampling_limit

            total = sum(len(s) for s in active)
            ef_limit = params.hnsw_ef if params is not None else None
            for i, seg in enumerate(active):
                seg_limits[i] = sampling_limit(
                    k, ef_limit, len(seg), total, len(active)
                )

        def merge_one(seg, scores, ids, qi_iter):
            for qi in qi_iter:
                for s, off in zip(scores[qi], ids[qi]):
                    if off < 0 or not np.isfinite(s):
                        continue
                    ext = seg.id_tracker.external_id(int(off))
                    if ext is None:
                        continue
                    ver = seg.id_tracker.version(int(off))
                    prev = merged[qi].get(ext)
                    if prev is None or ver > prev[1]:
                        merged[qi][ext] = (float(s), ver)

        def run_seg(i_seg):
            i, seg = i_seg
            k_i = seg_limits.get(i, k)
            return i, seg, seg.search_dense(name, queries, k_i, flt, params)

        if len(active) > 1:
            # overlap the per-segment device calls: each dispatch pays a
            # host↔device round trip, and a fragmented shard issuing them
            # sequentially multiplies that latency by the segment count
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(len(active), 8)) as tp:
                results = list(tp.map(run_seg, enumerate(active)))
        else:
            results = [run_seg(p) for p in enumerate(active)]
        for i, seg, (scores, ids) in results:
            if use_sampling:
                finite = np.isfinite(scores)
                seg_counts[i] = finite.sum(axis=1)
                low = np.where(finite, scores, np.inf).min(axis=1)
                seg_lowest[i] = low
            merge_one(seg, scores, ids, range(b))

        if use_sampling:
            # kth-best merged score per query (the sampling validity bar)
            kth = np.full(b, -np.inf, dtype=np.float64)
            for qi in range(b):
                if len(merged[qi]) >= k:
                    vals = sorted(
                        (s for s, _v in merged[qi].values()), reverse=True
                    )
                    kth[qi] = vals[k - 1]
            for i, seg in enumerate(active):
                k_i = seg_limits.get(i, k)
                if k_i >= k:
                    continue
                saturated = (seg_counts[i] >= k_i) & (
                    seg_lowest[i] >= kth
                )
                if not saturated.any():
                    continue
                # the sampled window may have cut real winners: re-run the
                # affected queries on this segment without sampling
                sub = np.nonzero(saturated)[0]
                scores, ids = seg.search_dense(
                    name, queries[sub], k, flt, params
                )
                remap = {int(j): int(orig) for j, orig in enumerate(sub)}
                for j in range(len(sub)):
                    qi = remap[j]
                    for s, off in zip(scores[j], ids[j]):
                        if off < 0 or not np.isfinite(s):
                            continue
                        ext = seg.id_tracker.external_id(int(off))
                        if ext is None:
                            continue
                        ver = seg.id_tracker.version(int(off))
                        prev = merged[qi].get(ext)
                        if prev is None or ver > prev[1]:
                            merged[qi][ext] = (float(s), ver)

        out = []
        for qi in range(b):
            items = [(s, ext, ver) for ext, (s, ver) in merged[qi].items()]
            items.sort(key=lambda t: -t[0])
            out.append(items[:k])
        return out

    def search_sparse(
        self,
        name: str,
        queries: List[SparseVector],
        k: int,
        flt: Optional[Filter] = None,
    ) -> List[List[Tuple[float, PointId, int]]]:
        merged: List[Dict[PointId, Tuple[float, int]]] = [dict() for _ in queries]
        for seg in self.segments:
            if name not in seg.sparse or len(seg) == 0:
                continue
            scores, ids = seg.search_sparse(name, queries, k, flt)
            for qi in range(len(queries)):
                for s, off in zip(scores[qi], ids[qi]):
                    if off < 0 or not np.isfinite(s):
                        continue
                    ext = seg.id_tracker.external_id(int(off))
                    if ext is None:
                        continue
                    ver = seg.id_tracker.version(int(off))
                    prev = merged[qi].get(ext)
                    if prev is None or ver > prev[1]:
                        merged[qi][ext] = (float(s), ver)
        out = []
        for qi in range(len(queries)):
            items = [(s, ext, ver) for ext, (s, ver) in merged[qi].items()]
            items.sort(key=lambda t: -t[0])
            out.append(items[:k])
        return out

    def search_sparse_many(
        self,
        name: str,
        batches: List[List[SparseVector]],
        k: int,
        flt: Optional[Filter] = None,
    ) -> List[List[List[Tuple[float, PointId, int]]]]:
        """Pipelined multi-batch sparse search: each segment syncs one
        device window for ALL batches (segment.search_sparse_many) instead
        of one round trip per batch. → one result list per batch."""
        active = [
            seg for seg in self.segments
            if name in seg.sparse and len(seg) > 0
        ]
        per_seg = [
            seg.search_sparse_many(name, batches, k, flt) for seg in active
        ]
        out_all: List[List[List[Tuple[float, PointId, int]]]] = []
        for bi, batch in enumerate(batches):
            merged: List[Dict[PointId, Tuple[float, int]]] = [
                dict() for _ in batch
            ]
            for seg, seg_results in zip(active, per_seg):
                scores, ids = seg_results[bi]
                for qi in range(len(batch)):
                    for s, off in zip(scores[qi], ids[qi]):
                        if off < 0 or not np.isfinite(s):
                            continue
                        ext = seg.id_tracker.external_id(int(off))
                        if ext is None:
                            continue
                        ver = seg.id_tracker.version(int(off))
                        prev = merged[qi].get(ext)
                        if prev is None or ver > prev[1]:
                            merged[qi][ext] = (float(s), ver)
            out = []
            for qi in range(len(batch)):
                items = [
                    (s, ext, ver) for ext, (s, ver) in merged[qi].items()
                ]
                items.sort(key=lambda t: -t[0])
                out.append(items[:k])
            out_all.append(out)
        return out_all

    def search_multi(
        self,
        name: str,
        query: np.ndarray,
        k: int,
        flt: Optional[Filter] = None,
    ) -> List[Tuple[float, PointId, int]]:
        merged: Dict[PointId, Tuple[float, int]] = {}
        for seg in self.segments:
            if name not in seg.multi or len(seg) == 0:
                continue
            scores, ids = seg.search_multi(name, query, k, flt)
            for s, off in zip(scores[0], ids[0]):
                if off < 0 or not np.isfinite(s):
                    continue
                ext = seg.id_tracker.external_id(int(off))
                if ext is None:
                    continue
                ver = seg.id_tracker.version(int(off))
                prev = merged.get(ext)
                if prev is None or ver > prev[1]:
                    merged[ext] = (float(s), ver)
        items = [(s, ext, ver) for ext, (s, ver) in merged.items()]
        items.sort(key=lambda t: -t[0])
        return items[:k]

    def scroll_ids(
        self,
        limit: int,
        offset_id: Optional[PointId] = None,
        flt: Optional[Filter] = None,
    ) -> List[PointId]:
        """Points ordered by external id (ints first, then UUIDs)."""
        all_ids: List[PointId] = []
        for seg in self.segments:
            mask = seg.filter_mask(flt)
            for ext in seg.id_tracker.iter_sorted_external():
                internal = seg.id_tracker.internal_id(ext)
                if mask is None or (internal is not None and internal < len(mask) and mask[internal]):
                    all_ids.append(ext)
        ints = sorted(x for x in all_ids if isinstance(x, int))
        strs = sorted(x for x in all_ids if isinstance(x, str))
        ordered = ints + strs
        if offset_id is not None:
            key = (0, offset_id, "") if isinstance(offset_id, int) else (1, 0, offset_id)

            def at_least(x):
                kx = (0, x, "") if isinstance(x, int) else (1, 0, x)
                return kx >= key

            ordered = [x for x in ordered if at_least(x)]
        return ordered[:limit]

    # ------------------------------------------------------------------
    # optimizer (reference: optimizers/segment_optimizer.rs plan/execute)
    # ------------------------------------------------------------------

    def maybe_optimize(self) -> bool:
        """Run one optimization cycle: plan under the shard lock, defragment
        under the lock (host copy, fast), build indexes with the lock RELEASED
        (the long TPU phase), then swap in the result iff no write raced the
        victims (segment version check) — otherwise replan. Bounded replans;
        anything left resumes on the next cycle."""
        did = False
        for _ in range(8):
            with self._lock:
                plan = self._plan_optimization()
                if plan is None:
                    break
                victims, appendable, need_index = plan
                new_seg = self._defragment_into(victims, appendable=appendable)
                versions = [v.version for v in victims]
            if need_index:
                from ..utils.budget import BUDGET
                from ..utils.debug import WATCHDOG

                # permit-gated, lock released — writes proceed, and the
                # builder yields the device to searches between batches
                with WATCHDOG.section("optimizer.build_indexes"):
                    with BUDGET.acquire_build():
                        new_seg.build_indexes()
            with self._lock:
                if any(v not in self.segments for v in victims) or [
                    v.version for v in victims
                ] != versions:
                    continue  # a write landed on a victim mid-build — replan
                self._swap(victims, new_seg)
            did = True
        return did

    def _plan_optimization(self):
        """→ (victim segments, result appendable?, build index?) or None."""
        # indexing: seal a big appendable segment
        for seg in self.segments:
            if (
                seg.appendable
                and seg.available_point_count() >= self.optimizers.indexing_threshold
            ):
                return [seg], False, True
        # merge: too many sealed segments → combine the smallest ones
        # (reference: merge_optimizer)
        max_segments = self.optimizers.default_segment_number or 8
        sealed = [s for s in self.segments if not s.appendable]
        if len(sealed) > max_segments:
            sealed.sort(key=lambda s: len(s))
            victims = sealed[: len(sealed) - max_segments + 1]
            return victims, False, any(bool(v.hnsw) for v in victims)
        # vacuum: rebuild sealed segments with too many deletes
        for seg in self.segments:
            total = seg.total_offsets
            if (
                not seg.appendable
                and total >= self.optimizers.vacuum_min_vector_number
                and total > 0
            ):
                if 1.0 - (len(seg) / total) > self.optimizers.deleted_threshold:
                    return [seg], not bool(seg.hnsw), bool(seg.hnsw)
        return None

    def _defragment_into(self, sources: List[Segment], appendable: bool) -> Segment:
        """New segment from the live points of `sources` (drops deleted rows —
        the reference SegmentBuilder::update collect phase)."""
        seg = Segment(self.params, appendable=appendable)
        for src in sources:
            for field, p in src.payload_index.indexed_fields().items():
                if field not in seg.payload_index.indexed_fields():
                    seg.create_field_index(field, p)
            for ext in src.id_tracker.iter_sorted_external():
                internal = src.id_tracker.internal_id(ext)
                if internal is None:
                    continue
                version = src.id_tracker.version(internal)
                vectors = _decode_vectors(src.get_vectors(ext) or {})
                payload = src.get_payload(ext)
                seg.upsert_point(version, ext, vectors, payload)
        seg.version = max((s.version for s in sources), default=0)
        return seg

    def _swap(self, old: List[Segment], new: Segment) -> None:
        remaining = [s for s in self.segments if s not in old]
        for seg in old:
            name = self._segment_dirs.pop(id(seg), None)
            if name:
                full = os.path.join(self._segments_root(), name)
                if os.path.isdir(full):
                    shutil.rmtree(full)
        # single reference assignment: unlocked readers iterating the old
        # list keep a consistent snapshot
        self.segments = remaining
        self._add_segment(new)
        self.flush()

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------

    def bulk_ingest(
        self,
        ids: List[PointId],
        dense: Dict[str, np.ndarray],
        payloads: Optional[List[Optional[dict]]] = None,
    ) -> Dict[str, Any]:
        """Array-native bulk load with at-most-once durability: a marker op
        lands in the WAL (vector payloads do not ride the log — a million
        128-d rows is ~0.5 GB of msgpack), the appendable segment ingests
        the arrays, and the segments flush before returning. On a crash
        mid-ingest the marker replays as a no-op (segment.version already
        covers it or the data is absent entirely) — the caller re-runs the
        load, same contract as the reference's snapshot-based bulk
        recovery."""
        with self._lock:
            existing = [
                pid for pid in ids
                if any(s.id_tracker.contains(pid) for s in self.segments)
            ]
            if existing:
                raise ShardUpdateError(
                    f"bulk_ingest: {len(existing)} ids already exist "
                    f"(first: {existing[0]!r})"
                )
            op_num = self.wal.append(
                {
                    "type": "bulk_ingest_marker",
                    "n": len(ids),
                    "names": sorted(dense),
                }
            )
            seg = self.appendable_segment
            seg.bulk_ingest(op_num, ids, dense, payloads)
            self._flush_locked()
        return {"operation_id": op_num, "status": "completed"}

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def _flush_locked(self) -> None:
        root = self._segments_root()
        os.makedirs(root, exist_ok=True)
        for seg in self.segments:
            name = self._segment_dirs[id(seg)]
            seg_dir = os.path.join(root, name)
            seg.save(seg_dir)
            if self.wal_sync:
                _fsync_tree(seg_dir)
        persisted = min((s.version for s in self.segments), default=0)
        # segments are durably on disk — only now may the covering WAL
        # records be dropped (otherwise a kernel crash between save and ack
        # loses acknowledged writes)
        self.wal.ack(persisted)
        self._save_clock_map()

    def close(self) -> None:
        self.flush()
        self.wal.close()

    # ------------------------------------------------------------------
    # shard snapshots (reference: ShardSnapshots service + snapshot transfer)
    # ------------------------------------------------------------------

    def create_snapshot_bytes(self) -> bytes:
        """Flush and tar the shard directory → snapshot bytes."""
        import io
        import tarfile

        self.flush()
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            tar.add(self._segments_root(), arcname="segments")
        return buf.getvalue()

    def restore_snapshot_bytes(self, data: bytes) -> None:
        """Replace this shard's contents with a snapshot (in place)."""
        import io
        import tarfile

        root = self._segments_root()
        shutil.rmtree(root, ignore_errors=True)
        with tarfile.open(fileobj=io.BytesIO(data), mode="r") as tar:
            tar.extractall(self.path, filter="data")
        # reset state and reload from the restored segments
        self.segments = []
        self._segment_dirs = {}
        self._seg_counter = 0
        self._load_segments()
        if not any(s.appendable for s in self.segments):
            self._add_segment(Segment(self.params, appendable=True))
        # snapshot supersedes local WAL history
        self.wal.ack(self.wal.next_op_num - 1)


def _fsync_tree(path: str) -> None:
    """fsync every regular file under `path` (segment durability barrier)."""
    for dirpath, _, filenames in os.walk(path):
        for fname in filenames:
            try:
                fd = os.open(os.path.join(dirpath, fname), os.O_RDONLY)
                try:
                    os.fsync(fd)
                finally:
                    os.close(fd)
            except OSError:
                pass


def _decode_vectors(vectors: Dict[str, Any]) -> Dict[str, Any]:
    """WAL/REST vector payloads → engine types. Document objects
    ({"text": ..., "model": "bm25"}) embed server-side (reference:
    src/common/inference/bm25_inference.rs)."""
    out: Dict[str, Any] = {}
    for name, v in vectors.items():
        if isinstance(v, dict) and "indices" in v:
            out[name] = SparseVector.from_dict(v)
        elif isinstance(v, dict) and "text" in v:
            from ..utils.bm25 import Bm25

            out[name] = Bm25(**(v.get("options") or {})).embed_document(v["text"])
        elif isinstance(v, SparseVector):
            out[name] = v
        else:
            out[name] = v
    return out
