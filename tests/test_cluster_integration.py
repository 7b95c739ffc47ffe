"""Multi-peer cluster integration: consensus + replication + recovery.

The in-process analogue of the reference's tests/consensus_tests (which
spawn real OS processes): three peers with independent storage, metadata
through Raft, point writes through a clock-tagged replica set, peer failure
→ deactivation, and recovery of a fresh peer via stream-records transfer.
"""

import numpy as np
import pytest

from qdrant_tpu.api.toc import TableOfContent
from qdrant_tpu.cluster.consensus import ConsensusManager, Dispatcher
from qdrant_tpu.cluster.raft import RaftNode
from qdrant_tpu.cluster.replica_set import (
    LocalReplica,
    ReplicaState,
    ShardReplicaSet,
)
from qdrant_tpu.cluster.transfer import transfer_shard_stream_records

from tests.test_raft import Network, run_until_leader


class Peer:
    def __init__(self, peer_id, net, tmp_path):
        self.peer_id = peer_id
        self.toc = TableOfContent(str(tmp_path / f"peer{peer_id}"))
        self.manager = ConsensusManager(self.toc)
        self.raft = RaftNode(
            peer_id,
            [1, 2, 3],
            net.transport_for(peer_id),
            apply_fn=self.manager.apply,
            seed=peer_id,
        )
        net.nodes[peer_id] = self.raft

    def local_replica(self, collection, shard_id=0):
        coll = self.toc.get_collection(collection)
        return LocalReplica(coll.shards[shard_id])

    def close(self):
        self.toc.close()


@pytest.fixture
def cluster(tmp_path):
    net = Network()
    peers = {i: Peer(i, net, tmp_path) for i in [1, 2, 3]}
    leader = run_until_leader(net)
    yield net, peers, leader
    for p in peers.values():
        p.close()


def test_full_cluster_flow(cluster, tmp_path):
    net, peers, leader = cluster

    # 1) create the collection through consensus on every peer
    dispatcher = Dispatcher(peers[leader.node_id].toc, raft=leader)
    dispatcher.submit(
        {
            "type": "create_collection",
            "name": "dist",
            "spec": {"vectors": {"size": 8, "distance": "Euclid"}},
        }
    )
    net.tick_all(5)
    for p in peers.values():
        assert p.toc.has_collection("dist")

    # 2) replica set over peers 1+2 (peer 3 joins later via transfer)
    rs = ShardReplicaSet(
        0, this_peer_id=1, local=peers[1].local_replica("dist")
    )
    rs.add_replica(2, peers[2].local_replica("dist"), ReplicaState.ACTIVE)

    rng = np.random.default_rng(0)
    data = rng.normal(size=(20, 8)).astype(np.float32)
    for i in range(20):
        rs.update(
            {"type": "upsert", "points": [{"id": i, "vectors": {"": data[i].tolist()}}]}
        )
    for pid in (1, 2):
        assert peers[pid].toc.get_collection("dist").count() == 20

    # 3) peer 3 joins: stream-records transfer while a write lands mid-flight
    replica3 = peers[3].local_replica("dist")
    n = transfer_shard_stream_records(rs, 3, replica3, batch_size=6)
    assert n == 20
    rs.update(
        {"type": "upsert", "points": [{"id": 99, "vectors": {"": [0.5] * 8}}]}
    )
    assert peers[3].toc.get_collection("dist").count() == 21

    # 4) peer 2 dies: writes keep working, peer 2 gets locally disabled,
    #    and the consensus records the state change
    failures = []
    rs.on_replica_failure = lambda shard, peer: failures.append(peer)

    class Dead:
        def update_with_clock(self, op, tag):
            raise ConnectionError("down")

    rs.replicas[2] = Dead()
    rs.update(
        {"type": "upsert", "points": [{"id": 100, "vectors": {"": [1.0] * 8}}]}
    )
    assert 2 in rs.locally_disabled and failures == [2]
    dispatcher.submit(
        {
            "type": "set_shard_replica_state",
            "collection": "dist",
            "shard": 0,
            "peer": 2,
            "state": "Dead",
        }
    )
    net.tick_all(5)
    assert {"type": "set_shard_replica_state", "collection": "dist", "shard": 0,
            "peer": 2, "state": "Dead"} in peers[3].manager.applied_ops

    # 5) reads still served (local + peer 3)
    res = rs.search_dense("", data[:1], 1)
    assert res[0][0][1] == 0
    assert peers[1].toc.get_collection("dist").count() == 22
    assert peers[3].toc.get_collection("dist").count() == 22
