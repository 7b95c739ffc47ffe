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
