"""Cluster metadata consensus: meta ops replicate to every peer's ToC."""

from qdrant_tpu.api.toc import TableOfContent
from qdrant_tpu.cluster.consensus import ConsensusManager, Dispatcher
from qdrant_tpu.cluster.raft import LEADER, RaftNode

from tests.test_raft import Network, leader_of, run_until_leader


def test_dispatcher_single_node(tmp_path):
    toc = TableOfContent(str(tmp_path / "s"))
    d = Dispatcher(toc)
    d.submit(
        {
            "type": "create_collection",
            "name": "c1",
            "spec": {"vectors": {"size": 4, "distance": "Dot"}},
        }
    )
    assert toc.has_collection("c1")
    d.submit({"type": "delete_collection", "name": "c1"})
    assert not toc.has_collection("c1")
    toc.close()


def test_meta_ops_replicate_across_cluster(tmp_path):
    net = Network()
    tocs = {}
    managers = {}
    for i in [1, 2, 3]:
        tocs[i] = TableOfContent(str(tmp_path / f"peer{i}"))
        managers[i] = ConsensusManager(tocs[i])
        net.nodes[i] = RaftNode(
            i,
            [1, 2, 3],
            net.transport_for(i),
            apply_fn=managers[i].apply,
            seed=i,
        )
    leader = run_until_leader(net)
    dispatcher = Dispatcher(tocs[leader.node_id], raft=leader)

    dispatcher.submit(
        {
            "type": "create_collection",
            "name": "shared",
            "spec": {"vectors": {"size": 8, "distance": "Cosine"}},
        }
    )
    dispatcher.submit(
        {
            "type": "update_aliases",
            "actions": [
                {"create_alias": {"collection_name": "shared", "alias_name": "nick"}}
            ],
        }
    )
    net.tick_all(5)
    for i in [1, 2, 3]:
        assert tocs[i].has_collection("shared"), f"peer {i}"
        assert tocs[i].resolve_name("nick") == "shared"
    for toc in tocs.values():
        toc.close()
