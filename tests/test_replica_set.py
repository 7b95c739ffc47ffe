import numpy as np
import pytest

from qdrant_tpu.cluster.clock import ClockMap, ClockSet, ClockTag, missing_clocks
from qdrant_tpu.cluster.replica_set import (
    LocalReplica,
    ReplicaError,
    ReplicaState,
    ShardOperations,
    ShardReplicaSet,
)
from qdrant_tpu.collection.shard import LocalShard
from qdrant_tpu.types import CollectionParams, Distance, VectorParams


def make_shard(tmp_path, name):
    params = CollectionParams(
        vectors={"": VectorParams(size=8, distance=Distance.EUCLID)}
    )
    return LocalShard(str(tmp_path / name), params)


def upsert_op(i, vec):
    return {"type": "upsert", "points": [{"id": i, "vectors": {"": vec}}]}


def test_clock_map_stale_rejection():
    cm = ClockMap()
    assert cm.advance(ClockTag(1, 0, 1))
    assert cm.advance(ClockTag(1, 0, 2))
    assert not cm.advance(ClockTag(1, 0, 2))  # same tick → stale
    assert not cm.advance(ClockTag(1, 0, 1))  # older → stale
    assert cm.advance(ClockTag(1, 0, 1, force=True))  # force overrides
    assert cm.advance(ClockTag(2, 0, 1))  # different peer independent
    rp = cm.recovery_point()
    assert rp[(1, 0)] == 2 and rp[(2, 0)] == 1


def test_clock_set_leases_independent_clocks():
    cs = ClockSet(peer_id=7)
    id1, c1 = cs.lease()
    id2, c2 = cs.lease()
    assert id1 != id2
    t1 = cs.tag_for(id1)
    t2 = cs.tag_for(id2)
    assert t1.clock_id != t2.clock_id
    cs.release(id1)
    id3, _ = cs.lease()
    assert id3 == id1  # reused


def test_missing_clocks():
    src = {(1, 0): 5, (2, 0): 3}
    dst = {(1, 0): 5, (2, 0): 1}
    assert missing_clocks(src, dst) == {(2, 0): 1}


def test_replicated_write_lands_on_all(tmp_path):
    s1 = make_shard(tmp_path, "a")
    s2 = make_shard(tmp_path, "b")
    rs = ShardReplicaSet(0, this_peer_id=1, local=LocalReplica(s1))
    rs.add_replica(2, LocalReplica(s2), ReplicaState.ACTIVE)

    rng = np.random.default_rng(0)
    for i in range(5):
        rs.update(upsert_op(i, rng.normal(size=8).tolist()))
    assert s1.point_count() == 5
    assert s2.point_count() == 5


class FailingReplica(ShardOperations):
    def update_with_clock(self, op, tag):
        raise ConnectionError("peer down")

    def search_dense(self, *a, **k):
        raise ConnectionError("peer down")

    def count(self, flt):
        raise ConnectionError("peer down")


def test_failed_replica_disabled_and_write_succeeds(tmp_path):
    s1 = make_shard(tmp_path, "a")
    failures = []
    rs = ShardReplicaSet(
        0,
        this_peer_id=1,
        local=LocalReplica(s1),
        on_replica_failure=lambda shard, peer: failures.append((shard, peer)),
    )
    rs.add_replica(2, FailingReplica(), ReplicaState.ACTIVE)
    rs.update(upsert_op(1, [0.0] * 8))
    assert s1.point_count() == 1
    assert 2 in rs.locally_disabled
    assert failures == [(0, 2)]
    # subsequent writes skip the dead peer without error
    rs.update(upsert_op(2, [0.0] * 8))
    assert s1.point_count() == 2


def test_write_consistency_factor(tmp_path):
    s1 = make_shard(tmp_path, "a")
    rs = ShardReplicaSet(
        0, this_peer_id=1, local=LocalReplica(s1), write_consistency_factor=2
    )
    rs.add_replica(2, FailingReplica(), ReplicaState.ACTIVE)
    with pytest.raises(ReplicaError):
        rs.update(upsert_op(1, [0.0] * 8))


def test_read_fallback(tmp_path):
    s2 = make_shard(tmp_path, "b")
    rng = np.random.default_rng(1)
    data = rng.normal(size=(3, 8)).astype(np.float32)
    for i in range(3):
        s2.update(upsert_op(i, data[i].tolist()))

    rs = ShardReplicaSet(0, this_peer_id=1)  # no local replica
    rs.add_replica(2, FailingReplica(), ReplicaState.ACTIVE)
    rs.add_replica(3, LocalReplica(s2), ReplicaState.ACTIVE)
    res = rs.search_dense("", data[:1], 1)
    assert res[0][0][1] == 0
    assert 2 in rs.locally_disabled
    assert rs.count(None) == 3


def test_stale_clock_write_skipped(tmp_path):
    s1 = make_shard(tmp_path, "a")
    replica = LocalReplica(s1)
    tag = ClockTag(peer_id=9, clock_id=0, clock_tick=5)
    replica.update_with_clock(upsert_op(1, [1.0] * 8), tag.to_dict())
    assert s1.point_count() == 1
    # replay with the same tick: rejected, no duplicate application
    res = replica.update_with_clock(upsert_op(1, [2.0] * 8), tag.to_dict())
    assert res["status"] == "stale"
    seg = s1._find_point(1)
    vec = seg.get_vectors(1)[""]
    assert vec[0] == 1.0  # old value kept


def test_replica_states():
    assert ReplicaState.ACTIVE.is_updatable and ReplicaState.ACTIVE.is_readable
    assert ReplicaState.PARTIAL.is_updatable and not ReplicaState.PARTIAL.is_readable
    assert not ReplicaState.DEAD.is_updatable
    assert ReplicaState.LISTENER.is_updatable


def test_read_consistency_resolution(tmp_path):
    s1 = make_shard(tmp_path, "a")
    s2 = make_shard(tmp_path, "b")
    rng = np.random.default_rng(9)
    data = rng.normal(size=(4, 8)).astype(np.float32)
    # replica 2 has a NEWER version of point 0 (divergence)
    for i in range(4):
        s1.update(upsert_op(i, data[i].tolist()))
        s2.update(upsert_op(i, data[i].tolist()))
    newer = (data[0] * 0.9).tolist()
    s2.update(upsert_op(0, newer))

    rs = ShardReplicaSet(0, this_peer_id=1, local=LocalReplica(s1))
    rs.add_replica(2, LocalReplica(s2), ReplicaState.ACTIVE)

    res = rs.search_dense("", data[:1], 4, consistency=2)
    # resolution keeps the highest-version record for point 0
    entry = next(t for t in res[0] if t[1] == 0)
    assert entry[2] == 5  # the newer version from replica 2 (s1 has version 1)
    assert rs.count(None, consistency=2) == 4


def test_write_ordering_leader_selection(tmp_path):
    """Weak → this peer; medium → highest ALIVE replica; strong → highest
    replica even if dead (reference: update.rs:218-238)."""
    from qdrant_tpu.cluster.replica_set import (
        LocalReplica,
        ReplicaState,
        ShardReplicaSet,
    )

    class _Fwd:
        def __init__(self):
            self.forwarded = []

        def forward_update(self, op):
            self.forwarded.append(op)
            return {"status": "completed", "operation_id": 99}

    shard = make_shard(tmp_path, "ord")
    rs = ShardReplicaSet(0, this_peer_id=2, local=LocalReplica(shard))
    remote5 = _Fwd()
    rs.add_replica(5, remote5, ReplicaState.ACTIVE)
    rs.add_replica(9, _Fwd(), ReplicaState.DEAD)

    assert rs.leader_for("weak") == 2
    assert rs.leader_for("medium") == 5   # 9 is dead
    assert rs.leader_for("strong") == 9   # highest regardless

    res = rs.update({"type": "delete", "ids": [1]}, ordering="medium")
    assert res["operation_id"] == 99
    assert remote5.forwarded  # executed on the leader, not locally
    # weak executes locally (fans out; remote forward not used)
    rs.states[5] = ReplicaState.DEAD
    rs.update({"type": "delete", "ids": [1]}, ordering="weak")


def test_restarted_sender_clock_catches_up(tmp_path):
    """A peer restart resets its ClockSet to 0 while shards remember higher
    ticks. The stale rejection must echo the shard's tick so the sender
    advances and the retried write is applied with a FRESH (higher) tick —
    not force-applied below the recovery point (ADVICE r1 #3)."""
    shard = make_shard(tmp_path, "a")
    rs = ShardReplicaSet(0, this_peer_id=1, local=LocalReplica(shard))
    for i in range(5):
        rs.update(upsert_op(i, [float(i)] * 8))
    high = max(shard.clock_map.recovery_point().values())
    assert high == 5

    # simulate sender restart: fresh ClockSet starting at 0
    rs.clock_set = ClockSet(1)
    res = rs.update(upsert_op(99, [9.0] * 8))
    assert res["status"] == "completed"
    # the write advanced the shard's clock PAST the old high-water mark, so
    # wal_ops_since(old recovery point) includes it (WAL-delta correctness)
    new_high = max(shard.clock_map.recovery_point().values())
    assert new_high > high
    old_recovery = {"1:0": high}
    delta_ids = [
        p["id"]
        for op, _ in shard.wal_ops_since(old_recovery)
        for p in op.get("points", [])
    ]
    assert 99 in delta_ids


def test_stale_result_echoes_current_tick(tmp_path):
    shard = make_shard(tmp_path, "a")
    res = shard.update(upsert_op(1, [0.0] * 8), clock_tag={"peer_id": 1, "clock_id": 0, "clock_tick": 7})
    assert res["status"] == "completed"
    stale = shard.update(upsert_op(2, [0.0] * 8), clock_tag={"peer_id": 1, "clock_id": 0, "clock_tick": 3})
    assert stale["status"] == "stale"
    assert stale["current_tick"] == 7
