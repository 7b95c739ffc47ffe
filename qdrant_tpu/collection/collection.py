"""Collection: shard routing + point ops façade + info.

Reference: lib/collection/src/collection/ (Collection mod.rs:68, shard
holder, hash-ring routing in operations/point_ops.rs:63 split_by_shard).
Each collection owns `shard_number` LocalShards (device-parallel execution
over a TPU mesh lives in parallel/mesh.py; host-side multi-node replication
is the cluster layer's job).
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import tarfile
import time
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..storage.segment import SearchParams
from ..types import (
    RateLimitError,
    CollectionParams,
    FieldCondition,
    Filter,
    HnswConfig,
    IsEmptyCondition,
    IsNullCondition,
    NestedCondition,
    OptimizersConfig,
    PayloadIndexParams,
    PointId,
    SparseVector,
    StrictModeConfig,
    StrictModeError,
    WalConfig,
    normalize_point_id,
    parse_filter,
)
from .hash_ring import HashRing
from .shard import LocalShard


def _canonical_key(value: Any) -> str:
    """Deterministic, value-based serialization for micro-batch coalescing
    keys. Numpy arrays serialize by full value (repr truncates them)."""

    def _default(o):
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, np.generic):
            return o.item()
        if dataclasses.is_dataclass(o):
            return dataclasses.asdict(o)
        if isinstance(o, (set, frozenset, tuple)):
            return sorted(map(str, o)) if isinstance(o, (set, frozenset)) else list(o)
        return repr(o)

    return json.dumps(value, sort_keys=True, default=_default)


def _normalize_point_vectors(p: Dict[str, Any]) -> Dict[str, Any]:
    """Accept the REST wire form (`vector`: bare list | named map) next to
    the internal form (`vectors`: named map). The embedded API previously
    required `vectors`; a point carrying only `vector` silently ingested as
    vector-less (every row placeholder-deleted) — a data-loss footgun."""
    if p.get("vectors") is not None or "vector" not in p:
        return p
    vec = p.get("vector")
    if isinstance(vec, dict) and "indices" not in vec:
        vectors = vec  # named map
    elif vec is None:
        vectors = {}
    else:
        vectors = {"": vec}
    out = dict(p)
    out.pop("vector", None)
    out["vectors"] = vectors
    return out


class CollectionError(Exception):
    status_code = 400


class NotFoundError(CollectionError):
    status_code = 404


class Collection:
    def __init__(
        self,
        name: str,
        path: str,
        params: CollectionParams,
        hnsw_config: Optional[HnswConfig] = None,
        optimizers_config: Optional[OptimizersConfig] = None,
        wal_config: Optional[WalConfig] = None,
        strict_mode_config: Optional[StrictModeConfig] = None,
        placement: Optional[Dict[int, List[int]]] = None,
        this_peer_id: Optional[int] = None,
    ):
        self.name = name
        self.path = path
        self.params = params
        self.hnsw_config = hnsw_config or HnswConfig()
        self.optimizers_config = optimizers_config or OptimizersConfig()
        self.defer_optimizers = False
        self.wal_config = wal_config or WalConfig()
        self.strict_mode_config = strict_mode_config or StrictModeConfig()
        self._rate_limiters: Dict[str, Any] = {}
        self.created_at = time.time()
        os.makedirs(path, exist_ok=True)
        # default per-vector hnsw config from collection default
        for vp in self.params.vectors.values():
            if vp.hnsw_config is None:
                vp.hnsw_config = self.hnsw_config

        # consensus-decided shard placement (reference: the
        # ShardDistributionProposal embedded in CreateCollection meta ops,
        # collection_meta_ops.rs:488-511): shard_id → peer ids holding a
        # replica. Empty = every shard is local (standalone node).
        self.placement: Dict[int, List[int]] = {
            int(k): list(v) for k, v in (placement or {}).items()
        }
        self.this_peer_id = this_peer_id
        self.shards: Dict[int, LocalShard] = {}
        # cluster mode: shard_id → ShardReplicaSet routing writes to peers
        # (attached by cluster.node.ClusterNode when replication is on)
        self.replica_sets: Dict[int, Any] = {}
        # cluster mode: shard_id → RemoteShardHandle for shards this peer
        # does NOT hold (attached by ClusterNode; reads fan out over HTTP)
        self.remote_shards: Dict[int, Any] = {}
        # local shards mid-transfer: readable remotely only
        self.partial_local: set = set()
        self.ring = HashRing()
        # custom sharding: shard_key → shard ids
        self.shard_keys: Dict[Any, List[int]] = {}
        self._next_shard_id = 0
        if params.sharding_method != "custom":
            for shard_id in range(params.shard_number):
                if self.is_local_shard(shard_id):
                    self._create_shard(shard_id)
                self.ring.add(shard_id)
            self._next_shard_id = params.shard_number
        self.save_config()

    def is_local_shard(self, shard_id: int) -> bool:
        if not self.placement or self.this_peer_id is None:
            return True
        return self.this_peer_id in self.placement.get(shard_id, [])

    def all_shard_ids(self) -> List[int]:
        if self.params.sharding_method == "custom":
            return [s for ids in self.shard_keys.values() for s in ids]
        return sorted(
            set(self.shards.keys())
            | set(self.placement.keys())
            | set(range(self.params.shard_number))
        )

    # ------------------------------------------------------------------
    # shards
    # ------------------------------------------------------------------

    def _shard_path(self, shard_id: int) -> str:
        return os.path.join(self.path, "shards", str(shard_id))

    def _create_shard(self, shard_id: int) -> LocalShard:
        shard = LocalShard(
            self._shard_path(shard_id),
            self.params,
            self.optimizers_config,
            wal_sync=self.wal_config.wal_sync,
        )
        shard.defer_optimizers = self.defer_optimizers
        self.shards[shard_id] = shard
        return shard

    def create_shard_key(self, key: Any, shards_number: int = 1) -> None:
        if self.params.sharding_method != "custom":
            raise CollectionError("collection does not use custom sharding")
        if key in self.shard_keys:
            raise CollectionError(f"shard key {key!r} already exists")
        ids = []
        for _ in range(shards_number):
            sid = self._next_shard_id
            self._next_shard_id += 1
            self._create_shard(sid)
            ids.append(sid)
        self.shard_keys[key] = ids
        self.save_config()

    def delete_shard_key(self, key: Any) -> None:
        ids = self.shard_keys.pop(key, None)
        if ids is None:
            raise NotFoundError(f"shard key {key!r} not found")
        for sid in ids:
            shard = self.shards.pop(sid, None)
            if shard:
                shard.close()
                shutil.rmtree(self._shard_path(sid), ignore_errors=True)
        self.save_config()

    def _read_target(self, sid: int):
        """Read handle for a shard id: the local shard when this peer holds
        it, else the attached remote handle (reference: RemoteShard reads,
        shards/remote_shard.rs). A local shard still receiving its transfer
        (partial) serves reads from a remote ACTIVE holder instead."""
        if sid in self.partial_local:
            remote = self.remote_shards.get(sid)
            if remote is not None:
                return remote
        if (
            self.placement
            and self.this_peer_id is not None
            and sid in self.placement
            and self.this_peer_id not in self.placement[sid]
        ):
            # placement is authoritative: a local shard that consensus moved
            # away while this peer was down is a stale orphan — serve the
            # placed peers' copy instead
            remote = self.remote_shards.get(sid)
            if remote is not None:
                return remote
        shard = self.shards.get(sid)
        if shard is not None:
            return shard
        remote = self.remote_shards.get(sid)
        if remote is None:
            raise CollectionError(
                f"shard {sid} of {self.name!r} is not on this peer and no "
                f"remote route is attached"
            )
        return remote

    def _shards_for_read(self, shard_key: Any = None) -> List[Any]:
        if shard_key is None:
            return [self._read_target(s) for s in self.all_shard_ids()]
        keys = shard_key if isinstance(shard_key, list) else [shard_key]
        out = []
        for k in keys:
            if k not in self.shard_keys:
                raise NotFoundError(f"shard key {k!r} not found")
            out.extend(self._read_target(s) for s in self.shard_keys[k])
        return out

    def _route_sid(self, point_id: PointId, shard_key: Any = None) -> int:
        if self.params.sharding_method == "custom":
            if shard_key is None:
                raise CollectionError("custom sharding requires shard_key")
            if shard_key not in self.shard_keys:
                raise NotFoundError(f"shard key {shard_key!r} not found")
            ids = self.shard_keys[shard_key]
            ring = HashRing()
            for s in ids:
                ring.add(s)
            return ring.get(point_id)
        return self.ring.get(point_id)

    def _apply_shard_update(
        self, sid: int, op: Dict[str, Any], wait: bool, ordering: str
    ) -> Dict[str, Any]:
        """One shard's slice of an update: replica-set fan-out when attached,
        plain local apply, or forward to a peer that holds the shard.
        Placement is authoritative — a stale orphan replica left behind by a
        consensus move never absorbs writes."""
        placed_away = (
            self.placement
            and self.this_peer_id is not None
            and sid in self.placement
            and self.this_peer_id not in self.placement[sid]
        )
        if not placed_away:
            rs = self.replica_sets.get(sid)
            if rs is not None:
                return rs.update(op, ordering=ordering)
            shard = self.shards.get(sid)
            if shard is not None:
                return shard.update(op, wait=wait)
        remote = self.remote_shards.get(sid)
        if remote is None:
            raise CollectionError(
                f"shard {sid} of {self.name!r} is not on this peer and no "
                f"remote route is attached"
            )
        return remote.forward_update(op)

    # ------------------------------------------------------------------
    # updates (split by shard; reference point_ops.rs:63)
    # ------------------------------------------------------------------

    # ------------------------------------------------------------------
    # strict mode enforcement (reference: StrictModeConfig checks in toc)
    # ------------------------------------------------------------------

    def _indexed_fields(self) -> set:
        fields = set()
        for shard in self.shards.values():
            for seg in shard.segments:
                fields.update(seg.payload_index.indexed_fields().keys())
        return fields

    def check_strict_filter(self, flt: Optional[Filter], for_update: bool = False) -> None:
        sm = self.strict_mode_config
        if not sm.enabled or flt is None:
            return
        conds: List[Any] = []

        def walk(f: Filter):
            for c in list(f.must) + list(f.should) + list(f.must_not) + (
                f.min_should[0] if f.min_should else []
            ):
                if isinstance(c, Filter):
                    walk(c)
                else:
                    conds.append(c)

        walk(flt)
        if sm.filter_max_conditions and len(conds) > sm.filter_max_conditions:
            raise StrictModeError(
                f"filter has {len(conds)} conditions, limit is {sm.filter_max_conditions}"
            )
        flag = (
            sm.unindexed_filtering_update if for_update else sm.unindexed_filtering_retrieve
        )
        if flag is False:
            indexed = self._indexed_fields()
            for c in conds:
                key = None
                if isinstance(c, FieldCondition):
                    key = c.key
                elif isinstance(c, (IsEmptyCondition,)):
                    key = c.is_empty_key
                elif isinstance(c, (IsNullCondition,)):
                    key = c.is_null_key
                elif isinstance(c, NestedCondition):
                    key = c.key
                if key is not None and key not in indexed:
                    raise StrictModeError(
                        f"Index required but not found for \"{key}\""
                    )

    def _rate_limiter(self, kind: str):
        sm = self.strict_mode_config
        rate = sm.read_rate_limit if kind == "read" else sm.write_rate_limit
        if not rate:
            return None
        from ..utils.rate_limiter import RateLimiter

        lim = self._rate_limiters.get(kind)
        if lim is None or lim.rate != float(rate):
            lim = RateLimiter(rate)
            self._rate_limiters[kind] = lim
        return lim

    def check_rate_limit(self, kind: str, cost: float = 1.0) -> None:
        if not self.strict_mode_config.enabled:
            return
        lim = self._rate_limiter(kind)
        if lim is not None and not lim.try_consume(cost):
            raise RateLimitError(
                f"Rate limiting exceeded: {kind} operations limit is "
                f"{int(lim.rate)} per minute"
            )

    def check_strict_query(
        self, limit: int, hnsw_ef: Optional[int], exact: bool, flt: Optional[Filter]
    ) -> None:
        sm = self.strict_mode_config
        if not sm.enabled:
            return
        self.check_rate_limit("read")
        if sm.max_query_limit and limit > sm.max_query_limit:
            raise StrictModeError(
                f"limit {limit} exceeds strict mode max_query_limit {sm.max_query_limit}"
            )
        if sm.search_max_hnsw_ef and hnsw_ef and hnsw_ef > sm.search_max_hnsw_ef:
            raise StrictModeError(
                f"hnsw_ef {hnsw_ef} exceeds strict mode limit {sm.search_max_hnsw_ef}"
            )
        if sm.search_allow_exact is False and exact:
            raise StrictModeError("exact search is disabled by strict mode")
        self.check_strict_filter(flt)

    def check_strict_upsert(self, n_points: int) -> None:
        sm = self.strict_mode_config
        if not sm.enabled:
            return
        self.check_rate_limit("write", cost=max(1.0, float(n_points)))
        if sm.upsert_max_batchsize and n_points > sm.upsert_max_batchsize:
            raise StrictModeError(
                f"batch of {n_points} exceeds strict mode upsert_max_batchsize "
                f"{sm.upsert_max_batchsize}"
            )
        if sm.max_collection_vector_size_bytes:
            total = sum(
                shard_seg.dense[name].host_array.nbytes
                for shard in self.shards.values()
                for shard_seg in shard.segments
                for name in shard_seg.dense
            )
            if total > sm.max_collection_vector_size_bytes:
                raise StrictModeError(
                    f"collection vector storage {total} bytes exceeds strict "
                    f"mode limit {sm.max_collection_vector_size_bytes}"
                )
        if sm.max_points_count:
            total = sum(s.point_count() for s in self.shards.values())
            if total + n_points > sm.max_points_count:
                raise StrictModeError(
                    f"collection would exceed strict mode max_points_count "
                    f"{sm.max_points_count}"
                )

    @staticmethod
    def _resolve_inference(points: List[Dict[str, Any]]) -> None:
        """Replace remote-model Document/Image/InferenceObject inputs with
        their embeddings BEFORE the op hits the WAL — replaying a log must
        never call back out to the inference service (reference: inference
        resolves in the API conversion layer, src/common/inference/
        update_requests.rs). Local BM25 documents stay as-is (deterministic
        to re-embed at apply time)."""
        from ..utils.inference import embed_value

        def needs_remote(v) -> bool:
            if not isinstance(v, dict):
                return False
            if "image" in v or "object" in v:
                return True
            if "text" in v and isinstance(v.get("text"), str):
                model = (v.get("model") or "").lower()
                return model not in ("", "bm25", "qdrant/bm25")
            return False

        for p in points:
            vecs = p.get("vectors")
            if isinstance(vecs, dict):
                for name, v in list(vecs.items()):
                    if needs_remote(v):
                        vecs[name] = embed_value(v, inference="update")

    def upsert(
        self,
        points: List[Dict[str, Any]],
        shard_key: Any = None,
        wait: bool = True,
        ordering: str = "weak",
    ) -> Dict[str, Any]:
        self.check_strict_upsert(len(points))
        self._resolve_inference(points)
        points = [_normalize_point_vectors(p) for p in points]
        by_shard: Dict[int, List[dict]] = {}
        for p in points:
            pid = normalize_point_id(p["id"])
            sid = self._route_sid(pid, shard_key or p.get("shard_key"))
            by_shard.setdefault(sid, []).append(p)
        result = {}
        for sid, pts in by_shard.items():
            result = self._apply_shard_update(
                sid, {"type": "upsert", "points": pts}, wait, ordering
            )
        return result

    def update_op(
        self,
        op: Dict[str, Any],
        shard_key: Any = None,
        wait: bool = True,
        ordering: str = "weak",
    ) -> Dict[str, Any]:
        """Route a non-upsert update op: by ids when present, else broadcast."""
        result: Dict[str, Any] = {"operation_id": 0, "status": "completed"}
        if op.get("ids") is not None and self.params.sharding_method != "custom":
            by_shard: Dict[int, List[PointId]] = {}
            for pid in op["ids"]:
                pid = normalize_point_id(pid)
                sid = self._route_sid(pid, shard_key)
                by_shard.setdefault(sid, []).append(pid)
            for sid, ids in by_shard.items():
                sub = dict(op)
                sub["ids"] = ids
                result = self._apply_shard_update(sid, sub, wait, ordering)
        else:
            if shard_key is None:
                sids = self.all_shard_ids()
            else:
                keys = shard_key if isinstance(shard_key, list) else [shard_key]
                sids = []
                for k in keys:
                    if k not in self.shard_keys:
                        raise NotFoundError(f"shard key {k!r} not found")
                    sids.extend(self.shard_keys[k])
            for sid in sids:
                result = self._apply_shard_update(sid, dict(op), wait, ordering)
        return result

    def create_payload_index(
        self, field: str, params: PayloadIndexParams, wait: bool = True
    ) -> Dict[str, Any]:
        return self.update_op(
            {"type": "create_field_index", "field": field, "params": params.to_dict()},
            wait=wait,
        )

    def delete_payload_index(self, field: str, wait: bool = True) -> Dict[str, Any]:
        return self.update_op(
            {"type": "delete_field_index", "field": field}, wait=wait
        )

    def create_vector_name(
        self, name: str, vp: "VectorParams", wait: bool = True
    ) -> Dict[str, Any]:
        """Add a named vector to a live collection (reference:
        vector_name_api.rs PUT /collections/{c}/vectors/{name})."""
        if name in self.params.vectors:
            raise CollectionError(f"vector {name!r} already exists")
        out = self.update_op(
            {"type": "create_vector_name", "name": name,
             "params": vp.to_dict()},
            wait=wait,
        )
        self.params.vectors[name] = vp
        self.save_config()
        return out

    def delete_vector_name(self, name: str, wait: bool = True) -> Dict[str, Any]:
        if name not in self.params.vectors:
            raise NotFoundError(f"vector {name!r} does not exist")
        out = self.update_op(
            {"type": "delete_vector_name", "name": name}, wait=wait
        )
        self.params.vectors.pop(name, None)
        self.save_config()
        return out

    # ------------------------------------------------------------------
    # reads
    # ------------------------------------------------------------------

    def count(self, flt: Optional[Filter] = None, shard_key: Any = None) -> int:
        return sum(s.count(flt) for s in self._shards_for_read(shard_key))

    def retrieve(
        self, ids: List[PointId], shard_key: Any = None
    ) -> List[Tuple[PointId, Any, int]]:
        out = []
        for shard in self._shards_for_read(shard_key):
            if not hasattr(shard, "retrieve"):  # remote handles hydrate via
                continue  # get_payload_and_vectors / get_records instead
            out.extend(shard.retrieve([normalize_point_id(i) for i in ids]))
        return out

    def _remote_record(self, point_id: PointId) -> Optional[dict]:
        """Fetch a point's materialized record from whichever peer holds its
        shard (placement mode only; None when the point is local/absent)."""
        if not self.remote_shards:
            return None
        try:
            sid = self._route_sid(point_id)
            handles = [self.remote_shards[sid]] if sid in self.remote_shards else []
        except CollectionError:
            handles = list(self.remote_shards.values())
        for handle in handles:
            recs = handle.get_records([point_id])
            if recs:
                return recs[0]
        return None

    def get_point_vector(self, point_id: PointId, name: str) -> Optional[Any]:
        for shard in self.shards.values():
            seg = shard._find_point(normalize_point_id(point_id))
            if seg is not None:
                vectors = seg.get_vectors(point_id)
                if vectors and name in vectors:
                    return vectors[name]
        rec = self._remote_record(normalize_point_id(point_id))
        if rec and name in (rec.get("vectors") or {}):
            return rec["vectors"][name]
        return None

    def get_payload_and_vectors(
        self, point_id: PointId
    ) -> Tuple[Optional[dict], Optional[dict]]:
        for shard in self.shards.values():
            seg = shard._find_point(point_id)
            if seg is not None:
                return seg.get_payload(point_id), seg.get_vectors(point_id)
        rec = self._remote_record(point_id)
        if rec is not None:
            return rec.get("payload"), rec.get("vectors")
        return None, None

    def point_version(self, point_id: PointId) -> int:
        for shard in self.shards.values():
            seg = shard._find_point(point_id)
            if seg is not None:
                internal = seg.id_tracker.internal_id(point_id)
                return seg.id_tracker.version(internal)
        rec = self._remote_record(point_id)
        if rec is not None:
            return int(rec.get("version", 0))
        return 0

    def search_dense(
        self,
        name: str,
        queries: np.ndarray,
        k: int,
        flt: Optional[Filter] = None,
        params: Optional[SearchParams] = None,
        shard_key: Any = None,
    ) -> List[List[Tuple[float, PointId, int]]]:
        """Dense search; concurrent callers with compatible shapes coalesce
        into one padded device batch (utils/microbatch.py) — the TPU-native
        analogue of the reference's threadpool fan-out for many independent
        clients."""
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        batcher = self._microbatcher()
        if batcher is not None:
            # canonical value-based key: repr() of dataclasses containing
            # numpy arrays is identity/truncation-based and could coalesce
            # requests with DIFFERENT filters into one device batch
            key = (
                "dense",
                name,
                k,
                _canonical_key(
                    None if flt is None else dataclasses.asdict(flt)
                ),
                _canonical_key(getattr(params, "__dict__", None)),
                _canonical_key(shard_key),
            )
            rows = [queries[i] for i in range(queries.shape[0])]

            def _pad(all_rows):
                # pad the coalesced batch to a power-of-two row count: the
                # device programs compile per batch shape, and unpadded
                # coalescing would compile one program per distinct batch
                # size (each ~tens of seconds through the device link)
                n = len(all_rows)
                pad = max(8, 1 << (n - 1).bit_length())
                return np.stack(list(all_rows) + [all_rows[0]] * (pad - n))

            def exec_batch(all_rows):
                res = self._search_dense_exec(
                    name, _pad(all_rows), k, flt, params, shard_key
                )
                return res[: len(all_rows)]

            def exec_many(row_lists):
                # pipelined window: dispatch every chunk's device program,
                # sync all with one device_get (shard.search_dense_many)
                res = self._search_dense_many_exec(
                    name, [_pad(c) for c in row_lists], k, flt, params,
                    shard_key,
                )
                return [r[: len(c)] for r, c in zip(res, row_lists)]

            return batcher.run(key, rows, exec_batch, exec_many_fn=exec_many)
        return self._search_dense_exec(name, queries, k, flt, params, shard_key)

    def _microbatcher(self):
        from ..utils.flags import flag_env

        if not flag_env("micro_batching", "QDRANT_TPU_MICROBATCH"):
            return None
        b = getattr(self, "_batcher", None)
        if b is None:
            from ..utils.microbatch import MicroBatcher

            b = self._batcher = MicroBatcher()
        return b

    def bulk_ingest(
        self,
        ids: List[PointId],
        dense: Dict[str, np.ndarray],
        payloads: Optional[List[Optional[dict]]] = None,
        shard_key: Any = None,
    ) -> Dict[str, Any]:
        """Array-native bulk load (shard.bulk_ingest): ids route by the
        hash ring in one pass, each shard ingests its slice as numpy
        appends + one flush. The per-point upsert path costs ~100 µs of
        interpreter+WAL time per point — this is the product path for
        loading millions of vectors."""
        ids_norm = [normalize_point_id(p) for p in ids]
        # route each point through the shard router; group per shard
        groups: Dict[int, List[int]] = {}
        for i, pid in enumerate(ids_norm):
            sid = self._route_sid(pid, shard_key)
            groups.setdefault(sid, []).append(i)
        results = []
        for sid, rows in groups.items():
            shard = self.shards.get(sid)
            if shard is None:
                raise CollectionError(
                    f"bulk_ingest: shard {sid} is not local to this peer"
                )
            sel = np.asarray(rows, dtype=np.int64)
            results.append(
                shard.bulk_ingest(
                    [ids_norm[i] for i in rows],
                    {name: np.asarray(v)[sel] for name, v in dense.items()},
                    None if payloads is None else [payloads[i] for i in rows],
                )
            )
        return {
            "operation_id": max(r["operation_id"] for r in results),
            "status": "completed",
        }

    def _search_dense_many_exec(
        self,
        name: str,
        batches: List[np.ndarray],
        k: int,
        flt: Optional[Filter] = None,
        params: Optional[SearchParams] = None,
        shard_key: Any = None,
    ) -> List[List[List[Tuple[float, PointId, int]]]]:
        """Pipelined multi-batch dense search → one result list per batch.
        Single-shard reads ride shard.search_dense_many (every batch's
        device work in flight before one sync); multi-shard reads fall back
        to sequential per-batch execution (the cross-shard merge already
        amortizes device dispatches across segments)."""
        vp = self.params.vectors.get(name)
        if vp is None:
            raise CollectionError(
                f"Wrong input: vector {name!r} does not exist in collection "
                f"{self.name!r}"
            )
        for q in batches:
            if q.shape[1] != vp.size:
                raise CollectionError(
                    f"Wrong input: vector dimension {q.shape[1]} does not "
                    f"match the collection dimensionality {vp.size}"
                )
        shards = self._shards_for_read(shard_key)
        if len(shards) == 1 and hasattr(shards[0], "search_dense_many"):
            return shards[0].search_dense_many(name, batches, k, flt, params)
        return [
            self._search_dense_exec(name, q, k, flt, params, shard_key)
            for q in batches
        ]

    def _search_dense_exec(
        self,
        name: str,
        queries: np.ndarray,
        k: int,
        flt: Optional[Filter] = None,
        params: Optional[SearchParams] = None,
        shard_key: Any = None,
    ) -> List[List[Tuple[float, PointId, int]]]:
        vp = self.params.vectors.get(name)
        if vp is None:
            raise CollectionError(
                f"Wrong input: vector {name!r} does not exist in collection "
                f"{self.name!r}"
            )
        if queries.shape[1] != vp.size:
            raise CollectionError(
                f"Wrong input: vector dimension {queries.shape[1]} does not "
                f"match the collection dimensionality {vp.size}"
            )
        merged: List[Dict[PointId, Tuple[float, int]]] = [
            dict() for _ in range(queries.shape[0])
        ]
        for shard in self._shards_for_read(shard_key):
            res = shard.search_dense(name, queries, k, flt, params)
            for qi, items in enumerate(res):
                for s, ext, ver in items:
                    prev = merged[qi].get(ext)
                    if prev is None or ver > prev[1]:
                        merged[qi][ext] = (s, ver)
        out = []
        for qi in range(queries.shape[0]):
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
        shard_key: Any = None,
    ) -> List[List[Tuple[float, PointId, int]]]:
        """Sparse search; like search_dense, concurrent callers coalesce
        into batches and queue backlogs drain as depth-D pipelined windows
        (one device sync per window — the tunneled-link RTT otherwise caps
        single-batch sparse throughput)."""
        batcher = self._microbatcher()
        if batcher is not None:
            key = (
                "sparse",
                name,
                k,
                _canonical_key(
                    None if flt is None else dataclasses.asdict(flt)
                ),
                _canonical_key(shard_key),
            )

            def exec_batch(all_rows):
                return self._search_sparse_exec(
                    name, list(all_rows), k, flt, shard_key
                )

            def exec_many(row_lists):
                return self._search_sparse_many_exec(
                    name, [list(c) for c in row_lists], k, flt, shard_key
                )

            return batcher.run(
                key, list(queries), exec_batch, exec_many_fn=exec_many
            )
        return self._search_sparse_exec(name, queries, k, flt, shard_key)

    def _search_sparse_many_exec(
        self,
        name: str,
        batches: List[List[SparseVector]],
        k: int,
        flt: Optional[Filter] = None,
        shard_key: Any = None,
    ) -> List[List[List[Tuple[float, PointId, int]]]]:
        shards = self._shards_for_read(shard_key)
        if len(shards) == 1 and hasattr(shards[0], "search_sparse_many"):
            return shards[0].search_sparse_many(name, batches, k, flt)
        return [
            self._search_sparse_exec(name, q, k, flt, shard_key)
            for q in batches
        ]

    def _search_sparse_exec(
        self,
        name: str,
        queries: List[SparseVector],
        k: int,
        flt: Optional[Filter] = None,
        shard_key: Any = None,
    ) -> List[List[Tuple[float, PointId, int]]]:
        merged: List[Dict[PointId, Tuple[float, int]]] = [dict() for _ in queries]
        for shard in self._shards_for_read(shard_key):
            res = shard.search_sparse(name, queries, k, flt)
            for qi, items in enumerate(res):
                for s, ext, ver in items:
                    prev = merged[qi].get(ext)
                    if prev is None or ver > prev[1]:
                        merged[qi][ext] = (s, ver)
        out = []
        for qi in range(len(queries)):
            items = [(s, ext, ver) for ext, (s, ver) in merged[qi].items()]
            items.sort(key=lambda t: -t[0])
            out.append(items[:k])
        return out

    def search_multi(
        self,
        name: str,
        query: np.ndarray,
        k: int,
        flt: Optional[Filter] = None,
        shard_key: Any = None,
    ) -> List[Tuple[float, PointId, int]]:
        merged: Dict[PointId, Tuple[float, int]] = {}
        for shard in self._shards_for_read(shard_key):
            for s, ext, ver in shard.search_multi(name, query, k, flt):
                prev = merged.get(ext)
                if prev is None or ver > prev[1]:
                    merged[ext] = (s, ver)
        items = [(s, ext, ver) for ext, (s, ver) in merged.items()]
        items.sort(key=lambda t: -t[0])
        return items[:k]

    def scroll_ids(
        self,
        limit: int,
        offset_id: Optional[PointId] = None,
        flt: Optional[Filter] = None,
        shard_key: Any = None,
    ) -> List[PointId]:
        all_ids: List[PointId] = []
        for shard in self._shards_for_read(shard_key):
            all_ids.extend(shard.scroll_ids(limit * 2 + 64, offset_id, flt))
        ints = sorted(x for x in all_ids if isinstance(x, int))
        strs = sorted(x for x in all_ids if isinstance(x, str))
        return (ints + strs)[:limit]

    def facet(
        self,
        key: str,
        limit: int = 10,
        flt: Optional[Filter] = None,
        shard_key: Any = None,
    ) -> List[Tuple[Any, int]]:
        """Facet value counts over a payload field (reference: facets API)."""
        from ..utils import json_path

        counts: Dict[Any, int] = {}
        for shard in self._shards_for_read(shard_key):
            for seg in shard.segments:
                # fast path: field has a map index — counts come straight
                # off the postings without deserializing any payload
                # (reference: facet_index over the keyword index)
                indexed = (
                    seg.facet_counts(key, flt)
                    if hasattr(seg, "facet_counts")
                    else None
                )
                if indexed is not None:
                    for v, c in indexed.items():
                        counts[v] = counts.get(v, 0) + c
                    continue
                mask = seg.filter_mask(flt)
                alive = seg.alive_mask()
                for off, payload in seg.payload_storage.iter_items():
                    if off >= len(alive) or not alive[off]:
                        continue
                    if mask is not None and (off >= len(mask) or not mask[off]):
                        continue
                    for v in set(
                        x
                        for x in json_path.get_leaf_values(payload, key)
                        if isinstance(x, (str, int, bool))
                    ):
                        counts[v] = counts.get(v, 0) + 1
        items = sorted(counts.items(), key=lambda t: (-t[1], str(t[0])))
        return items[:limit]

    # ------------------------------------------------------------------
    # resharding (reference: shards/resharding.rs + dual hash ring)
    # ------------------------------------------------------------------

    def reshard_prepare(self, new_shard_number: int) -> None:
        """Phase 1 of resharding: extend the placement map to the new shard
        ids (deterministic round-robin over the placement's peer universe,
        so every peer computes the same layout from the committed op) and
        materialize the new shards this peer will hold. Runs on every peer
        BEFORE any point moves, so the movers' forwarded writes have a
        destination."""
        if self.params.sharding_method == "custom":
            raise CollectionError("resharding requires auto sharding")
        if new_shard_number < 1:
            raise CollectionError("shard_number must be >= 1")
        if self.placement:
            peers = sorted(set().union(*self.placement.values()))
            rf = max(1, min(self.params.replication_factor, len(peers)))
            for sid in range(new_shard_number):
                if sid not in self.placement:
                    self.placement[sid] = [
                        peers[(sid + j) % len(peers)] for j in range(rf)
                    ]
            for sid in range(new_shard_number):
                if self.is_local_shard(sid) and sid not in self.shards:
                    self._create_shard(sid)
        else:
            for sid in range(new_shard_number):
                if sid not in self.shards:
                    self._create_shard(sid)
        self.save_config()

    def reshard_move(self, new_shard_number: int) -> int:
        """Phase 2 of resharding: re-route every local point through the new
        ring, moving the ones whose shard changed (forwarded writes reach
        peers that hold the target shard; a short retry loop covers peers
        that have not applied reshard_prepare yet), then commit the ring.
        → number of points moved from this peer's shards."""
        import time as _time

        old_ids = set(self.shards.keys())
        new_ring = HashRing()
        for sid in range(new_shard_number):
            new_ring.add(sid)

        moved = 0
        for sid in list(old_ids):
            shard = self.shards[sid]
            batch: List[dict] = []
            for ext in shard.scroll_ids(limit=10**9):
                target = new_ring.get(ext)
                if target == sid:
                    continue
                seg = shard._find_point(ext)
                if seg is None:
                    continue
                batch.append(
                    {
                        "id": ext,
                        "vectors": seg.get_vectors(ext) or {},
                        "payload": seg.get_payload(ext),
                        "_target": target,
                    }
                )
            by_target: Dict[int, List[dict]] = {}
            for p in batch:
                by_target.setdefault(p.pop("_target"), []).append(p)
            for target, pts in by_target.items():
                op = {"type": "upsert", "points": pts}
                for attempt in range(40):
                    try:
                        self._apply_shard_update(op=op, sid=target, wait=True,
                                                 ordering="weak")
                        break
                    except (CollectionError, ConnectionError):
                        # target peer may not have applied reshard_prepare
                        # yet — bounded retry (committed ops apply in order
                        # on every peer, just not at the same instant)
                        if attempt == 39:
                            raise
                        _time.sleep(0.25)
                shard.update({"type": "delete", "ids": [p["id"] for p in pts]})
                moved += len(pts)

        # drop shards beyond the new count (scale down)
        for sid in sorted(old_ids):
            if sid >= new_shard_number:
                s = self.shards.pop(sid)
                s.close()
                self.replica_sets.pop(sid, None)
                shutil.rmtree(self._shard_path(sid), ignore_errors=True)
        for sid in list(self.placement):
            if sid >= new_shard_number:
                del self.placement[sid]
        for sid in list(self.remote_shards):
            if sid >= new_shard_number:
                del self.remote_shards[sid]
        self.ring = new_ring
        self.params.shard_number = new_shard_number
        self.save_config()
        return moved

    def reshard(self, new_shard_number: int) -> int:
        """Single-node resharding (cluster mode drives prepare/move as two
        steps with replica re-wiring in between — consensus.py)."""
        self.reshard_prepare(new_shard_number)
        return self.reshard_move(new_shard_number)

    # ------------------------------------------------------------------
    # info / persistence
    # ------------------------------------------------------------------

    def info(self) -> Dict[str, Any]:
        points = sum(s.point_count() for s in self.shards.values())
        segments = sum(len(s.segments) for s in self.shards.values())
        indexed = sum(
            len(seg)
            for s in self.shards.values()
            for seg in s.segments
            if seg.hnsw or seg.hnsw_multi or seg.quantized
        )
        status = "green"
        return {
            "status": status,
            "optimizer_status": "ok",
            "points_count": points,
            "indexed_vectors_count": indexed,
            "segments_count": segments,
            "config": {
                "params": self.params.to_dict(),
                "hnsw_config": self.hnsw_config.to_dict(),
                "optimizer_config": self.optimizers_config.to_dict(),
                "wal_config": self.wal_config.to_dict(),
                "strict_mode_config": self.strict_mode_config.to_dict(),
            },
            "payload_schema": self._payload_schema(),
        }

    def _payload_schema(self) -> Dict[str, Any]:
        schema: Dict[str, Any] = {}
        for shard in self.shards.values():
            for seg in shard.segments:
                for field, params in seg.payload_index.indexed_fields().items():
                    count = 0
                    fi = seg.payload_index.field_indexes.get(field)
                    if fi:
                        count += fi.points_count()
                    if field in schema:
                        schema[field]["points"] += count
                    else:
                        schema[field] = {
                            "data_type": params.type.value,
                            "points": count,
                        }
        return schema

    def save_config(self) -> None:
        from ..storage.segment import SEGMENT_FORMAT_VERSION

        cfg = {
            "format_version": SEGMENT_FORMAT_VERSION,
            "name": self.name,
            "params": self.params.to_dict(),
            "hnsw_config": self.hnsw_config.to_dict(),
            "optimizers_config": self.optimizers_config.to_dict(),
            "wal_config": self.wal_config.to_dict(),
            "strict_mode_config": self.strict_mode_config.to_dict(),
            "shard_keys": [[repr(k), k, v] for k, v in self.shard_keys.items()],
            "next_shard_id": self._next_shard_id,
            "created_at": self.created_at,
            "placement": {str(k): v for k, v in self.placement.items()},
            "this_peer_id": self.this_peer_id,
        }
        with open(os.path.join(self.path, "collection.json"), "w") as f:
            json.dump(cfg, f)

    @classmethod
    def load(cls, name: str, path: str) -> "Collection":
        with open(os.path.join(path, "collection.json")) as f:
            cfg = json.load(f)
        from ..storage.segment import SEGMENT_FORMAT_VERSION, SegmentFormatError

        fv = int(cfg.get("format_version", 1))
        if fv > SEGMENT_FORMAT_VERSION:
            raise SegmentFormatError(
                f"collection {name} has storage format v{fv}, newer than this "
                f"build's v{SEGMENT_FORMAT_VERSION} — upgrade qdrant-tpu"
            )
        params = CollectionParams.from_dict(cfg["params"])
        coll = cls.__new__(cls)
        coll.name = name
        coll.path = path
        coll.params = params
        coll.hnsw_config = HnswConfig.from_dict(cfg.get("hnsw_config"))
        coll.optimizers_config = OptimizersConfig.from_dict(cfg.get("optimizers_config"))
        coll.defer_optimizers = False
        coll.wal_config = WalConfig.from_dict(cfg.get("wal_config"))
        coll._rate_limiters = {}
        coll.strict_mode_config = StrictModeConfig.from_dict(
            cfg.get("strict_mode_config")
        )
        coll.created_at = cfg.get("created_at", time.time())
        coll.shards = {}
        coll.replica_sets = {}
        coll.remote_shards = {}
        coll.partial_local = set()
        coll.placement = {
            int(k): list(v) for k, v in (cfg.get("placement") or {}).items()
        }
        coll.this_peer_id = cfg.get("this_peer_id")
        coll.ring = HashRing()
        coll.shard_keys = {}
        for _, key, ids in cfg.get("shard_keys", []):
            coll.shard_keys[key] = ids
        coll._next_shard_id = cfg.get("next_shard_id", params.shard_number)
        shards_root = os.path.join(path, "shards")
        if os.path.isdir(shards_root):
            for sub in sorted(os.listdir(shards_root), key=lambda x: int(x)):
                sid = int(sub)
                coll.shards[sid] = LocalShard(
                    os.path.join(shards_root, sub),
                    params,
                    coll.optimizers_config,
                    wal_sync=coll.wal_config.wal_sync,
                )
                coll.shards[sid].defer_optimizers = coll.defer_optimizers
        if params.sharding_method != "custom":
            if coll.placement:
                # placement mode: the ring spans ALL shard ids, including
                # the ones other peers hold
                for sid in sorted(
                    set(range(params.shard_number)) | set(coll.placement)
                ):
                    coll.ring.add(sid)
            else:
                for sid in coll.shards:
                    coll.ring.add(sid)
        return coll

    def flush(self) -> None:
        for shard in self.shards.values():
            shard.flush()

    def close(self) -> None:
        for shard in self.shards.values():
            shard.close()

    def drop(self) -> None:
        self.close()
        shutil.rmtree(self.path, ignore_errors=True)

    # ------------------------------------------------------------------
    # snapshots (reference: segment/snapshot.rs + collection snapshots)
    # ------------------------------------------------------------------

    def create_snapshot(self, snapshots_dir: str) -> str:
        self.flush()
        os.makedirs(snapshots_dir, exist_ok=True)
        stamp = time.strftime("%Y-%m-%d-%H-%M-%S")
        fname = f"{self.name}-{stamp}.snapshot"
        full = os.path.join(snapshots_dir, fname)
        with tarfile.open(full, "w") as tar:
            tar.add(self.path, arcname=".")
        return fname

    @classmethod
    def restore_snapshot(cls, snapshot_path: str, name: str, target_path: str) -> "Collection":
        os.makedirs(target_path, exist_ok=True)
        with tarfile.open(snapshot_path, "r") as tar:
            tar.extractall(target_path, filter="data")
        return cls.load(name, target_path)
