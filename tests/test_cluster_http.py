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
        if all(
            t.has_collection("repl2") and t.get_collection("repl2").replica_sets
            for t in tocs
        ):
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
    """start_resharding scales a placement-distributed collection through
    the committed reshard op: every peer extends the SAME placement, the new
    shard materializes on its assigned peer, moved points stay routable."""
    servers, tocs, nodes, leader = cluster
    leader_port = servers[leader.peer_id - 1].port
    call(leader_port, "PUT", "/collections/rs", {
        "vectors": {"size": 4, "distance": "Dot"}, "shard_number": 2})
    deadline = time.time() + 10
    while time.time() < deadline and not all(t.has_collection("rs") for t in tocs):
        time.sleep(0.05)
    call(leader_port, "PUT", "/collections/rs/points?wait=true", {
        "points": [{"id": i, "vector": [1.0 * i, 0, 0, 0]} for i in range(30)]})
    # consensus-driven placement: 2 shards spread over distinct peers
    placements = [t.get_collection("rs").placement for t in tocs]
    assert all(p == placements[0] for p in placements)
    assert len(placements[0]) == 2
    r = call(leader_port, "POST", "/collections/rs/cluster",
             {"start_resharding": {"direction": "up"}})
    assert r["result"] is True
    deadline = time.time() + 20
    def shard_total():
        return sum(len(t.get_collection("rs").shards) for t in tocs)
    while time.time() < deadline and not (
        all(len(t.get_collection("rs").placement) == 3 for t in tocs)
        and shard_total() == 3
    ):
        time.sleep(0.1)
    for t in tocs:
        assert len(t.get_collection("rs").placement) == 3
    # each shard lives on exactly one peer (rf=1): 3 local shards total
    assert shard_total() == 3
    # points intact and routable from every peer (remote reads included)
    deadline = time.time() + 15
    while time.time() < deadline and call(
        leader_port, "POST", "/collections/rs/points/count", {}
    )["result"]["count"] != 30:
        time.sleep(0.2)
    for srv in servers:
        cnt = call(srv.port, "POST", "/collections/rs/points/count", {})
        assert cnt["result"]["count"] == 30
        pt = call(srv.port, "GET", "/collections/rs/points/17")
        assert pt["result"]["id"] == 17


def test_consensus_shard_placement(cluster):
    """A 6-shard rf=1 collection is PLACED, not replicated: each peer holds
    2 shards, reads fan out to remote shards with the same results from any
    peer, writes forward to whichever peer owns the target shard."""
    servers, tocs, nodes, leader = cluster
    leader_port = servers[leader.peer_id - 1].port
    call(leader_port, "PUT", "/collections/placed", {
        "vectors": {"size": 4, "distance": "Dot"}, "shard_number": 6})
    deadline = time.time() + 10
    while time.time() < deadline and not all(
            t.has_collection("placed") for t in tocs):
        time.sleep(0.05)

    # identical placement everywhere; 2 local shards per peer, 6 total
    placements = [t.get_collection("placed").placement for t in tocs]
    assert all(p == placements[0] for p in placements)
    assert len(placements[0]) == 6
    per_peer = [len(t.get_collection("placed").shards) for t in tocs]
    assert per_peer == [2, 2, 2]
    for t in tocs:
        coll = t.get_collection("placed")
        assert len(coll.remote_shards) == 4  # routes to the other shards

    # writes through ANY peer reach the right shard owner
    call(servers[0].port, "PUT", "/collections/placed/points?wait=true", {
        "points": [{"id": i, "vector": [float(i), 0, 0, 0],
                    "payload": {"i": i}} for i in range(40)]})
    total_local = sum(
        s.point_count()
        for t in tocs
        for s in t.get_collection("placed").shards.values())
    assert total_local == 40  # each point stored exactly once cluster-wide

    # reads from every peer see the full collection (remote fan-out)
    for srv in servers:
        cnt = call(srv.port, "POST", "/collections/placed/points/count", {})
        assert cnt["result"]["count"] == 40
        pt = call(srv.port, "GET", "/collections/placed/points/17")
        assert pt["result"]["id"] == 17
        assert pt["result"]["payload"] == {"i": 17}
        res = call(srv.port, "POST", "/collections/placed/points/search",
                   {"vector": [17.0, 0, 0, 0], "limit": 3})
        got = [hit["id"] for hit in res["result"]]
        assert got[0] == 39  # dot-product favors the largest vector


def test_placement_with_replication(cluster):
    """shard_number=3, rf=2: every shard on exactly 2 peers; a write through
    any peer lands on both owners (fan-out), reads work from all peers."""
    servers, tocs, nodes, leader = cluster
    leader_port = servers[leader.peer_id - 1].port
    call(leader_port, "PUT", "/collections/pl2", {
        "vectors": {"size": 4, "distance": "Dot"}, "shard_number": 3,
        "replication_factor": 2})
    deadline = time.time() + 10
    while time.time() < deadline and not all(
            t.has_collection("pl2") for t in tocs):
        time.sleep(0.05)
    placements = [t.get_collection("pl2").placement for t in tocs]
    assert all(p == placements[0] for p in placements)
    assert all(len(peers) == 2 for peers in placements[0].values())
    per_peer = [len(t.get_collection("pl2").shards) for t in tocs]
    assert sorted(per_peer) == [2, 2, 2]  # 3 shards x 2 replicas / 3 peers

    call(servers[1].port, "PUT", "/collections/pl2/points?wait=true", {
        "points": [{"id": i, "vector": [float(i), 0, 0, 0]}
                   for i in range(30)]})
    # every point stored exactly twice cluster-wide
    deadline = time.time() + 10
    def total_local():
        return sum(s.point_count() for t in tocs
                   for s in t.get_collection("pl2").shards.values())
    while time.time() < deadline and total_local() != 60:
        time.sleep(0.1)
    assert total_local() == 60
    for srv in servers:
        cnt = call(srv.port, "POST", "/collections/pl2/points/count", {})
        assert cnt["result"]["count"] == 30


def test_dead_peer_rereplication(cluster):
    """Kill a peer holding replicas: the failed write confirms the replica
    Dead through consensus, the leader moves it to a live peer, and the
    stream transfer restores full replication (reference semantics:
    SetShardReplicaState → Dead + transfer/driver.rs)."""
    servers, tocs, nodes, leader = cluster
    leader_port = servers[leader.peer_id - 1].port
    call(leader_port, "PUT", "/collections/heal", {
        "vectors": {"size": 4, "distance": "Dot"}, "shard_number": 3,
        "replication_factor": 2})
    deadline = time.time() + 10
    while time.time() < deadline and not all(
            t.has_collection("heal") for t in tocs):
        time.sleep(0.05)

    call(leader_port, "PUT", "/collections/heal/points?wait=true", {
        "points": [{"id": i, "vector": [float(i), 0, 0, 0]}
                   for i in range(30)]})

    victim = next(n for n in nodes if n is not leader)
    victim_idx = victim.peer_id - 1
    live = [n for n in nodes if n is not victim]
    live_tocs = [t for i, t in enumerate(tocs) if i != victim_idx]
    live_servers = [s for i, s in enumerate(servers) if i != victim_idx]
    # the victim holds replicas of some shards
    assert tocs[victim_idx].get_collection("heal").shards
    victim.stop()
    servers[victim_idx].shutdown()

    # writes keep succeeding (wcf=1) and flag the dead replica
    call(leader_port, "PUT", "/collections/heal/points?wait=true", {
        "points": [{"id": 100 + i, "vector": [float(i), 1, 0, 0]}
                   for i in range(30)]})

    # repair: placement drops the victim, data re-replicates to live peers
    deadline = time.time() + 45
    def healed():
        for t in live_tocs:
            pl = t.get_collection("heal").placement
            if any(victim.peer_id in peers for peers in pl.values()):
                return False
        total = sum(s.point_count() for t in live_tocs
                    for s in t.get_collection("heal").shards.values())
        return total == 120  # 60 points x 2 replicas on the 2 live peers
    while time.time() < deadline and not healed():
        time.sleep(0.25)
    assert healed(), {
        "placements": [t.get_collection("heal").placement for t in live_tocs],
        "local": [
            {sid: s.point_count()
             for sid, s in t.get_collection("heal").shards.items()}
            for t in live_tocs
        ],
    }
    for srv in live_servers:
        cnt = call(srv.port, "POST", "/collections/heal/points/count", {})
        assert cnt["result"]["count"] == 60


def test_single_to_cluster_migration(tmp_path):
    """A collection created on a single node BEFORE clustering is proposed
    into consensus at cluster start: every peer learns it with the data
    pinned to the original node, and reads work cluster-wide (reference:
    src/migrations/single_to_cluster.rs handle_existing_collections)."""
    # node 1 starts life standalone with data
    toc1 = TableOfContent(str(tmp_path / "p1"))
    toc1.create_collection("legacy", {
        "vectors": {"size": 4, "distance": "Dot"}, "shard_number": 2})
    coll = toc1.get_collection("legacy")
    coll.upsert([{"id": i, "vector": [float(i), 0, 0, 0]} for i in range(20)])

    servers, tocs, nodes = [], [toc1], []
    srv1 = RestServer(toc1, port=0)
    srv1.start_background()
    servers.append(srv1)
    for i in (2, 3):
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
    try:
        deadline = time.time() + 20
        while time.time() < deadline and not all(
                t.has_collection("legacy") for t in tocs):
            time.sleep(0.1)
        assert all(t.has_collection("legacy") for t in tocs)
        # data pinned to peer 1; peers 2/3 route remotely
        for t in tocs[1:]:
            assert not t.get_collection("legacy").shards
            assert t.get_collection("legacy").placement
        deadline = time.time() + 10
        while time.time() < deadline:
            try:
                counts = [
                    call(s.port, "POST", "/collections/legacy/points/count",
                         {})["result"]["count"]
                    for s in servers
                ]
                if counts == [20, 20, 20]:
                    break
            except AssertionError:
                pass
            time.sleep(0.2)
        assert counts == [20, 20, 20]
    finally:
        for n in nodes:
            n.stop()
        for s in servers:
            s.shutdown()
        for t in tocs:
            t.close()


def test_peer_restart_rejoin_consistency(cluster, tmp_path):
    """Kill a peer mid-life, write while it is down, restart it from its
    storage dir on the same port: WAL replay restores its local data, raft
    catch-up restores metadata, and reads are consistent cluster-wide
    (reference: consensus_tests/test_recover_dead_node.py +
    test_cluster_rejoin.py)."""
    servers, tocs, nodes, leader = cluster
    leader_port = servers[leader.peer_id - 1].port
    call(leader_port, "PUT", "/collections/rj", {
        "vectors": {"size": 4, "distance": "Dot"}, "shard_number": 3,
        "replication_factor": 2})
    deadline = time.time() + 10
    while time.time() < deadline and not all(
            t.has_collection("rj") for t in tocs):
        time.sleep(0.05)
    call(leader_port, "PUT", "/collections/rj/points?wait=true", {
        "points": [{"id": i, "vector": [float(i), 0, 0, 0]}
                   for i in range(20)]})

    victim = next(n for n in nodes if n is not leader)
    v_idx = victim.peer_id - 1
    v_port = servers[v_idx].port
    v_storage = tocs[v_idx].storage_path
    victim.stop()
    servers[v_idx].shutdown()
    tocs[v_idx].close()

    # writes while the peer is down (fan-out marks it locally disabled)
    call(leader_port, "PUT", "/collections/rj/points?wait=true", {
        "points": [{"id": 100 + i, "vector": [0, float(i), 0, 0]}
                   for i in range(20)]})

    # restart from the same storage on the same port
    toc_r = TableOfContent(v_storage)
    srv_r = RestServer(toc_r, port=v_port)
    srv_r.start_background()
    urls = {n.peer_id: f"http://127.0.0.1:{servers[n.peer_id - 1].port}"
            for n in nodes}
    node_r = ClusterNode(victim.peer_id, toc_r, urls, tick_period=0.02)
    node_r.start()
    try:
        # WAL replay restored the pre-kill local data
        assert toc_r.has_collection("rj")
        local = sum(
            s.point_count()
            for s in toc_r.get_collection("rj").shards.values())
        assert local > 0  # its replica survived the restart
        # reads through the restarted peer see the FULL collection
        deadline = time.time() + 20
        cnt = -1
        while time.time() < deadline:
            try:
                cnt = call(v_port, "POST", "/collections/rj/points/count",
                           {})["result"]["count"]
                if cnt == 40:
                    break
            except AssertionError:
                pass
            time.sleep(0.2)
        assert cnt == 40
        # and the whole cluster agrees
        for n in nodes:
            if n is victim:
                continue
            port = servers[n.peer_id - 1].port
            assert call(port, "POST", "/collections/rj/points/count",
                        {})["result"]["count"] == 40
    finally:
        node_r.stop()
        srv_r.shutdown()
        toc_r.close()


def test_public_cluster_shard_ops(cluster):
    """Public POST /collections/{name}/cluster operations (reference:
    cluster_api.rs update_collection_cluster + cluster_ops.rs):
    replicate_shard copies a shard to a new peer, move_shard relocates one,
    drop_replica removes a copy (never the last), abort_transfer cancels."""
    servers, tocs, nodes, leader = cluster
    leader_port = servers[leader.peer_id - 1].port
    call(leader_port, "PUT", "/collections/ops", {
        "vectors": {"size": 4, "distance": "Dot"}, "shard_number": 2})
    deadline = time.time() + 10
    while time.time() < deadline and not all(
            t.has_collection("ops") for t in tocs):
        time.sleep(0.05)
    call(leader_port, "PUT", "/collections/ops/points?wait=true", {
        "points": [{"id": i, "vector": [float(i), 0, 0, 0]}
                   for i in range(20)]})

    placement = tocs[leader.peer_id - 1].get_collection("ops").placement
    sid = 0
    holder = placement[sid][0]
    target = next(p for p in (1, 2, 3) if p not in placement[sid])

    # --- replicate_shard: add a copy on `target`, data streams over ---
    call(leader_port, "POST", "/collections/ops/cluster", {
        "replicate_shard": {"shard_id": sid, "from_peer_id": holder,
                            "to_peer_id": target}})
    shard_pts = tocs[holder - 1].get_collection("ops").shards[sid].point_count()
    deadline = time.time() + 30

    def replicated():
        for t in tocs:
            pl = t.get_collection("ops").placement.get(sid, [])
            if sorted(pl) != sorted([holder, target]):
                return False
        tgt = tocs[target - 1].get_collection("ops").shards.get(sid)
        return tgt is not None and tgt.point_count() == shard_pts

    while time.time() < deadline and not replicated():
        time.sleep(0.2)
    assert replicated(), {
        "placements": [t.get_collection("ops").placement for t in tocs]}

    # the transfer target serves reads; cluster info lists both holders
    info = call(servers[target - 1].port, "GET",
                "/collections/ops/cluster")["result"]
    assert any(s["shard_id"] == sid for s in info["local_shards"])

    # --- drop_replica: back down to one holder; local data removed ---
    call(leader_port, "POST", "/collections/ops/cluster", {
        "drop_replica": {"shard_id": sid, "peer_id": target}})
    deadline = time.time() + 20

    def dropped():
        for t in tocs:
            if t.get_collection("ops").placement.get(sid, []) != [holder]:
                return False
        return sid not in tocs[target - 1].get_collection("ops").shards

    while time.time() < deadline and not dropped():
        time.sleep(0.2)
    assert dropped(), {
        "placements": [t.get_collection("ops").placement for t in tocs]}

    # --- dropping the LAST replica is refused ---
    out = call(leader_port, "POST", "/collections/ops/cluster", {
        "drop_replica": {"shard_id": sid, "peer_id": holder}}, expect=400)
    assert "only replica" in out["status"]["error"]

    # --- move_shard: relocate shard 1 to a peer that lacks it ---
    sid2 = 1
    holder2 = placement[sid2][0]
    target2 = next(p for p in (1, 2, 3) if p not in placement[sid2])
    pts2 = tocs[holder2 - 1].get_collection("ops").shards[sid2].point_count()
    call(leader_port, "POST", "/collections/ops/cluster", {
        "move_shard": {"shard_id": sid2, "from_peer_id": holder2,
                       "to_peer_id": target2}})
    deadline = time.time() + 30

    def moved():
        for t in tocs:
            if t.get_collection("ops").placement.get(sid2, []) != [target2]:
                return False
        tgt = tocs[target2 - 1].get_collection("ops").shards.get(sid2)
        return tgt is not None and tgt.point_count() == pts2

    while time.time() < deadline and not moved():
        time.sleep(0.2)
    assert moved(), {
        "placements": [t.get_collection("ops").placement for t in tocs]}

    # full collection still readable from every peer after all the moves
    for srv in servers:
        cnt = call(srv.port, "POST", "/collections/ops/points/count", {})
        assert cnt["result"]["count"] == 20

    # --- abort_transfer with nothing in flight → False, not an error ---
    out = call(leader_port, "POST", "/collections/ops/cluster", {
        "abort_transfer": {"shard_id": sid, "from_peer_id": holder,
                           "to_peer_id": target}})
    assert out["result"] is False

    # --- validation errors ---
    call(leader_port, "POST", "/collections/ops/cluster", {
        "move_shard": {"shard_id": 99, "from_peer_id": 1, "to_peer_id": 2}},
        expect=404)
    out = call(leader_port, "POST", "/collections/ops/cluster", {
        "replicate_shard": {"shard_id": sid, "to_peer_id": holder}},
        expect=400)
    assert "already holds" in out["status"]["error"]
