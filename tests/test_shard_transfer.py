import numpy as np

from qdrant_tpu.cluster.replica_set import LocalReplica, ReplicaState, ShardReplicaSet
from qdrant_tpu.cluster.transfer import (
    ForwardProxyReplica,
    stream_records,
    transfer_shard_stream_records,
)
from qdrant_tpu.collection.shard import LocalShard
from qdrant_tpu.types import CollectionParams, Distance, VectorParams


def make_shard(tmp_path, name):
    params = CollectionParams(
        vectors={"": VectorParams(size=8, distance=Distance.EUCLID)}
    )
    return LocalShard(str(tmp_path / name), params)


def upsert_op(i, vec, payload=None):
    p = {"id": i, "vectors": {"": vec}}
    if payload:
        p["payload"] = payload
    return {"type": "upsert", "points": [p]}


def test_stream_records_copies_everything(tmp_path):
    src = make_shard(tmp_path, "src")
    dst = make_shard(tmp_path, "dst")
    rng = np.random.default_rng(0)
    data = rng.normal(size=(25, 8)).astype(np.float32)
    for i in range(25):
        src.update(upsert_op(i, data[i].tolist(), {"n": i}))
    n = stream_records(src, LocalReplica(dst), batch_size=7)
    assert n == 25
    assert dst.point_count() == 25
    seg = dst._find_point(13)
    assert seg.get_payload(13) == {"n": 13}
    res = dst.search_dense("", data[:2], k=1)
    assert [r[0][1] for r in res] == [0, 1]


def test_forward_proxy_forwards_live_writes(tmp_path):
    src = make_shard(tmp_path, "src")
    dst = make_shard(tmp_path, "dst")
    proxy = ForwardProxyReplica(LocalReplica(src), LocalReplica(dst))
    proxy.update_with_clock(upsert_op(1, [1.0] * 8), None)
    assert src.point_count() == 1
    assert dst.point_count() == 1


def test_full_transfer_with_concurrent_write(tmp_path):
    src = make_shard(tmp_path, "src")
    dst = make_shard(tmp_path, "dst")
    rng = np.random.default_rng(1)
    for i in range(10):
        src.update(upsert_op(i, rng.normal(size=8).tolist()))

    rs = ShardReplicaSet(0, this_peer_id=1, local=LocalReplica(src))
    n = transfer_shard_stream_records(rs, 2, LocalReplica(dst), batch_size=4)
    assert n == 10
    assert dst.point_count() == 10
    assert rs.states[2] is ReplicaState.ACTIVE

    # post-transfer: replicated write reaches both
    rs.update(upsert_op(99, [0.5] * 8))
    assert src.point_count() == 11
    assert dst.point_count() == 11


def test_snapshot_transfer_with_queued_writes(tmp_path):
    from qdrant_tpu.cluster.transfer import transfer_shard_snapshot

    src = make_shard(tmp_path, "snap_src")
    dst = make_shard(tmp_path, "snap_dst")
    rng = np.random.default_rng(5)
    for i in range(12):
        src.update(upsert_op(i, rng.normal(size=8).tolist(), {"n": i}))

    rs = ShardReplicaSet(0, this_peer_id=1, local=LocalReplica(src))
    n = transfer_shard_snapshot(rs, 2, LocalReplica(dst))
    assert n == 12
    assert dst.point_count() == 12
    assert dst._find_point(7).get_payload(7) == {"n": 7}
    assert rs.states[2] is ReplicaState.ACTIVE
    # replicated write after transfer reaches both
    rs.update(upsert_op(50, [0.5] * 8))
    assert dst.point_count() == 13


def test_wal_delta_transfer_catches_up_stale_replica(tmp_path):
    """A replica that missed some clock-tagged writes catches up from the
    source's WAL tail only (no full copy)."""
    from qdrant_tpu.cluster.transfer import transfer_wal_delta

    src = make_shard(tmp_path, "wd_src")
    dst = make_shard(tmp_path, "wd_dst")
    rng = np.random.default_rng(8)
    rs = ShardReplicaSet(0, this_peer_id=1, local=LocalReplica(src))
    rs.add_replica(2, LocalReplica(dst), ReplicaState.ACTIVE)

    # both replicas receive the first writes
    for i in range(5):
        rs.update(upsert_op(i, rng.normal(size=8).tolist()))
    assert dst.point_count() == 5

    # peer 2 goes down; writes continue on peer 1 only
    rs.set_replica_state(2, ReplicaState.DEAD)
    recovery = dst.recovery_point()
    for i in range(5, 12):
        rs.update(upsert_op(i, rng.normal(size=8).tolist()))
    assert src.point_count() == 12 and dst.point_count() == 5

    # catch up via wal delta: only the 7 missed ops replay
    replayed = transfer_wal_delta(rs, 2, LocalReplica(dst), recovery)
    assert replayed == 7
    assert dst.point_count() == 12
    assert rs.states[2] is ReplicaState.ACTIVE

    # replaying again is a no-op (clock map rejects stale ticks)
    replayed2 = transfer_wal_delta(rs, 2, LocalReplica(dst), recovery)
    assert dst.point_count() == 12
