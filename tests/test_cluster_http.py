"""Three-peer cluster with Raft over REAL HTTP transport: metadata ops go
through consensus and materialize on every peer; leader hints on followers."""

import json
import time
import urllib.request

import pytest

from qdrant_tpu.api.rest import RestServer
from qdrant_tpu.api.toc import TableOfContent
from qdrant_tpu.cluster.node import ClusterNode


def call(port, method, path, body=None, expect=200):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as resp:
            assert resp.status == expect
            return json.loads(resp.read())
    except urllib.error.HTTPError as e:
        assert e.code == expect, e.read()
        return json.loads(e.read() or b"{}")


@pytest.fixture
def cluster(tmp_path):
    # three REST servers; raft messages travel over their HTTP endpoints
    servers, tocs, nodes = [], [], []
    for i in (1, 2, 3):
        toc = TableOfContent(str(tmp_path / f"p{i}"))
        srv = RestServer(toc, port=0)
        srv.start_background()
        servers.append(srv)
        tocs.append(toc)
    urls = {i + 1: f"http://127.0.0.1:{servers[i].port}" for i in range(3)}
    for i in (1, 2, 3):
        node = ClusterNode(i, tocs[i - 1], urls, tick_period=0.02)
        node.start()
        nodes.append(node)
    # wait for a leader
    deadline = time.time() + 10
    leader = None
    while time.time() < deadline:
        leaders = [n for n in nodes if n.raft.role == "leader"]
        if len(leaders) == 1:
            leader = leaders[0]
            break
        time.sleep(0.05)
    assert leader is not None, "no leader elected over HTTP transport"
    yield servers, tocs, nodes, leader
    for n in nodes:
        n.stop()
    for s in servers:
        s.shutdown()
    for t in tocs:
        t.close()


def test_consensus_over_http(cluster):
    servers, tocs, nodes, leader = cluster
    leader_port = servers[leader.peer_id - 1].port

    # cluster info reflects raft state
    info = call(leader_port, "GET", "/cluster")["result"]
    assert info["status"] == "enabled"
    assert info["raft_info"]["role"] == "leader"

    # create a collection on the leader → replicates to all peers
    call(
        leader_port,
        "PUT",
        "/collections/shared",
        {"vectors": {"size": 4, "distance": "Dot"}},
    )
    deadline = time.time() + 10
    while time.time() < deadline:
        if all(t.has_collection("shared") for t in tocs):
            break
        time.sleep(0.05)
    assert all(t.has_collection("shared") for t in tocs)

    # a follower rejects meta ops with a leader hint
    follower = next(n for n in nodes if n is not leader)
    f_port = servers[follower.peer_id - 1].port
    out = call(
        f_port,
        "PUT",
        "/collections/other",
        {"vectors": {"size": 4, "distance": "Dot"}},
        expect=503,
    )
    assert str(leader.peer_id) in out["status"]["error"]

    # delete through consensus as well
    call(leader_port, "DELETE", "/collections/shared")
    deadline = time.time() + 10
    while time.time() < deadline:
        if not any(t.has_collection("shared") for t in tocs):
            break
        time.sleep(0.05)
    assert not any(t.has_collection("shared") for t in tocs)


def test_replicated_collection_end_to_end(cluster):
    """Consensus-created replicated collection: an upsert through one peer's
    public REST API lands on every peer; reads are served locally anywhere."""
    servers, tocs, nodes, leader = cluster
    leader_port = servers[leader.peer_id - 1].port
    call(
        leader_port,
        "PUT",
        "/collections/repl2",
        {"vectors": {"size": 4, "distance": "Euclid"}, "replication_factor": 3},
    )
    deadline = time.time() + 10
    while time.time() < deadline:
        if all(t.has_collection("repl2") for t in tocs):
            break
        time.sleep(0.05)
    # replication attached on every peer
    for t in tocs:
        assert t.get_collection("repl2").replica_sets, "replica sets not attached"

    # write through the leader's public API
    call(
        leader_port,
        "PUT",
        "/collections/repl2/points",
        {
            "points": [
                {"id": i, "vector": [float(i), 0, 0, 0], "payload": {"i": i}}
                for i in range(6)
            ]
        },
    )
    for t in tocs:
        assert t.get_collection("repl2").count() == 6

    # read from a follower's public API — served from its local replica
    follower = next(n for n in nodes if n is not leader)
    f_port = servers[follower.peer_id - 1].port
    out = call(
        f_port,
        "POST",
        "/collections/repl2/points/search",
        {"vector": [3.0, 0, 0, 0], "limit": 1, "with_payload": True},
    )["result"]
    assert out[0]["id"] == 3

    # delete through a follower's API fans out too
    call(f_port, "POST", "/collections/repl2/points/delete", {"points": [0]})
    for t in tocs:
        assert t.get_collection("repl2").count() == 5


def test_peer_bootstrap_joins_cluster(cluster, tmp_path):
    """A fourth peer bootstraps via POST /cluster/bootstrap: membership
    commits through consensus and the joiner receives existing collections
    through snapshot/log catch-up."""
    servers, tocs, nodes, leader = cluster
    leader_port = servers[leader.peer_id - 1].port

    call(leader_port, "PUT", "/collections/boot", {
        "vectors": {"size": 4, "distance": "Dot"}})
    deadline = time.time() + 10
    while time.time() < deadline and not all(
        t.has_collection("boot") for t in tocs):
        time.sleep(0.05)

    # new peer: own toc + rest server, announces itself to the leader
    toc4 = TableOfContent(str(tmp_path / "p4"))
    srv4 = RestServer(toc4, port=0)
    srv4.start_background()
    me = 4
    my_url = f"http://127.0.0.1:{srv4.port}"
    resp = call(leader_port, "POST", "/cluster/bootstrap",
                {"peer_id": me, "url": my_url})["result"]
    peers = {int(k): v for k, v in resp["peers"].items()}
    peers[me] = my_url
    node4 = ClusterNode(me, toc4, peers, tick_period=0.02)
    node4.start()
    try:
        # existing peers learn the new member through the committed op
        deadline = time.time() + 10
        while time.time() < deadline and not all(
            4 in n.transport.peer_urls for n in nodes):
            time.sleep(0.05)
        assert all(4 in n.transport.peer_urls for n in nodes)
        # the joiner catches up on the collection metadata
        deadline = time.time() + 15
        while time.time() < deadline and not toc4.has_collection("boot"):
            time.sleep(0.05)
        assert toc4.has_collection("boot")
        # and subsequent consensus ops reach it too
        call(leader_port, "PUT", "/collections/boot2", {
            "vectors": {"size": 4, "distance": "Dot"}})
        deadline = time.time() + 10
        while time.time() < deadline and not toc4.has_collection("boot2"):
            time.sleep(0.05)
        assert toc4.has_collection("boot2")
    finally:
        node4.stop()
        srv4.shutdown()
        toc4.close()


def test_resharding_through_consensus(cluster):
    """start_resharding scales the collection on every peer through the
    committed reshard op; points survive and stay routable."""
    servers, tocs, nodes, leader = cluster
    leader_port = servers[leader.peer_id - 1].port
    call(leader_port, "PUT", "/collections/rs", {
        "vectors": {"size": 4, "distance": "Dot"}, "shard_number": 2})
    deadline = time.time() + 10
    while time.time() < deadline and not all(t.has_collection("rs") for t in tocs):
        time.sleep(0.05)
    call(leader_port, "PUT", "/collections/rs/points?wait=true", {
        "points": [{"id": i, "vector": [1.0 * i, 0, 0, 0]} for i in range(30)]})
    r = call(leader_port, "POST", "/collections/rs/cluster",
             {"start_resharding": {"direction": "up"}})
    assert r["result"] is True
    deadline = time.time() + 15
    while time.time() < deadline and not all(
        len(t.get_collection("rs").shards) == 3 for t in tocs):
        time.sleep(0.1)
    for t in tocs:
        assert len(t.get_collection("rs").shards) == 3
    # points intact on the proposing peer and routable
    cnt = call(leader_port, "POST", "/collections/rs/points/count", {})
    assert cnt["result"]["count"] == 30
    pt = call(leader_port, "GET", "/collections/rs/points/17")
    assert pt["result"]["id"] == 17
