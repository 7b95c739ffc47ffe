"""Cross-peer replication over HTTP: two live servers, a replica set
spanning them, and a stream-records transfer through the internal API —
the real-network version of the in-process cluster tests."""

import numpy as np
import pytest

from qdrant_tpu.api.rest import RestServer
from qdrant_tpu.api.toc import TableOfContent
from qdrant_tpu.cluster.remote import RemoteReplica
from qdrant_tpu.cluster.replica_set import (
    LocalReplica,
    ReplicaState,
    ShardReplicaSet,
)
from qdrant_tpu.cluster.transfer import transfer_shard_stream_records
from qdrant_tpu.types import parse_filter


@pytest.fixture
def two_peers(tmp_path):
    peers = []
    for i in (1, 2):
        toc = TableOfContent(str(tmp_path / f"peer{i}"))
        toc.create_collection(
            "repl", {"vectors": {"size": 8, "distance": "Euclid"}}
        )
        srv = RestServer(toc, port=0)
        srv.start_background()
        peers.append((toc, srv))
    yield peers
    for toc, srv in peers:
        srv.shutdown()
        toc.close()


def test_replication_over_http(two_peers):
    (toc1, _), (toc2, srv2) = two_peers
    local = LocalReplica(toc1.get_collection("repl").shards[0])
    remote = RemoteReplica(f"http://127.0.0.1:{srv2.port}", "repl", 0)

    rs = ShardReplicaSet(0, this_peer_id=1, local=local)
    rs.add_replica(2, remote, ReplicaState.ACTIVE)

    rng = np.random.default_rng(0)
    data = rng.normal(size=(12, 8)).astype(np.float32)
    for i in range(12):
        rs.update(
            {
                "type": "upsert",
                "points": [
                    {"id": i, "vectors": {"": data[i].tolist()}, "payload": {"i": i}}
                ],
            }
        )
    # both peers hold the data
    assert toc1.get_collection("repl").count() == 12
    assert toc2.get_collection("repl").count() == 12

    # remote reads work (search / count / scroll / filter)
    res = remote.search_dense("", data[:2], 1)
    assert [r[0][1] for r in res] == [0, 1]
    assert remote.count(None) == 12
    assert remote.scroll_ids(5) == [0, 1, 2, 3, 4]
    flt = parse_filter({"must": [{"key": "i", "range": {"gte": 10}}]})
    assert remote.count(flt) == 2

    # stale clock replay over the wire is rejected remotely too
    from qdrant_tpu.cluster.clock import ClockTag

    tag = ClockTag(peer_id=1, clock_id=0, clock_tick=1)
    out = remote.update_with_clock(
        {"type": "upsert", "points": [{"id": 0, "vectors": {"": [9.0] * 8}}]},
        tag.to_dict(),
    )
    assert out["status"] == "stale"


def test_transfer_over_http(two_peers):
    (toc1, _), (toc2, srv2) = two_peers
    shard1 = toc1.get_collection("repl").shards[0]
    rng = np.random.default_rng(1)
    data = rng.normal(size=(15, 8)).astype(np.float32)
    for i in range(15):
        shard1.update(
            {"type": "upsert", "points": [{"id": i, "vectors": {"": data[i].tolist()}}]}
        )

    rs = ShardReplicaSet(0, this_peer_id=1, local=LocalReplica(shard1))
    remote = RemoteReplica(f"http://127.0.0.1:{srv2.port}", "repl", 0)
    n = transfer_shard_stream_records(rs, 2, remote, batch_size=4)
    assert n == 15
    assert toc2.get_collection("repl").count() == 15
    # post-transfer replicated write reaches the remote peer
    rs.update({"type": "upsert", "points": [{"id": 99, "vectors": {"": [0.1] * 8}}]})
    assert toc2.get_collection("repl").count() == 16


def test_remote_failure_detection(two_peers):
    (toc1, _), _ = two_peers
    local = LocalReplica(toc1.get_collection("repl").shards[0])
    dead = RemoteReplica("http://127.0.0.1:1", "repl", 0, timeout=0.5)
    rs = ShardReplicaSet(0, this_peer_id=1, local=local)
    rs.add_replica(9, dead, ReplicaState.ACTIVE)
    rs.update({"type": "upsert", "points": [{"id": 1, "vectors": {"": [0.0] * 8}}]})
    assert 9 in rs.locally_disabled  # unreachable peer deactivated
    assert toc1.get_collection("repl").count() == 1


def test_snapshot_transfer_over_http(two_peers):
    from qdrant_tpu.cluster.transfer import transfer_shard_snapshot

    (toc1, _), (toc2, srv2) = two_peers
    shard1 = toc1.get_collection("repl").shards[0]
    rng = np.random.default_rng(3)
    for i in range(9):
        shard1.update(
            {"type": "upsert", "points": [{"id": i, "vectors": {"": rng.normal(size=8).tolist()}}]}
        )
    rs = ShardReplicaSet(0, this_peer_id=1, local=LocalReplica(shard1))
    remote = RemoteReplica(f"http://127.0.0.1:{srv2.port}", "repl", 0)
    n = transfer_shard_snapshot(rs, 2, remote)
    assert n == 9
    assert toc2.get_collection("repl").count() == 9
    rs.update({"type": "upsert", "points": [{"id": 99, "vectors": {"": [0.2] * 8}}]})
    assert toc2.get_collection("repl").count() == 10
