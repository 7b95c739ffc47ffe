"""Consensus fault matrix over live HTTP peers (reference:
tests/consensus_tests/test_resharding*.py, test_shard_snapshot_transfer.py,
test_recover_dead_node.py): resharding under concurrent writes, transfer
abort mid-stream with cleanup, and a lagging peer catching up through a
compacted log (install_snapshot) under load."""

import threading
import time

from qdrant_tpu.api.rest import RestServer
from qdrant_tpu.api.toc import TableOfContent
from qdrant_tpu.cluster.node import ClusterNode

from test_cluster_http import call, cluster  # noqa: F401  (fixture)


def _wait(pred, seconds, step=0.1):
    deadline = time.time() + seconds
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(step)
    return pred()


def test_resharding_under_concurrent_writes(cluster):
    """start_resharding while writers keep hitting every peer: all acked
    points remain exactly-once readable after the ring change."""
    servers, tocs, nodes, leader = cluster
    leader_port = servers[leader.peer_id - 1].port
    call(leader_port, "PUT", "/collections/rw", {
        "vectors": {"size": 4, "distance": "Dot"}, "shard_number": 2})
    assert _wait(lambda: all(t.has_collection("rw") for t in tocs), 10, 0.05)
    call(leader_port, "PUT", "/collections/rw/points?wait=true", {
        "points": [{"id": i, "vector": [float(i), 0, 0, 0]}
                   for i in range(50)]})

    acked = []
    stop = threading.Event()
    errors = []

    def writer(wid):
        i = 0
        while not stop.is_set():
            pid = 1000 + wid * 10_000 + i
            port = servers[(wid + i) % len(servers)].port
            try:
                out = call(port, "PUT",
                           "/collections/rw/points?wait=true",
                           {"points": [{"id": pid,
                                        "vector": [1.0, float(wid), 0, 0]}]})
                if out.get("status") == "ok":
                    acked.append(pid)
            except Exception as exc:  # transient routing during reshard
                errors.append(str(exc))
            i += 1
            time.sleep(0.01)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(3)]
    for t in threads:
        t.start()
    time.sleep(0.3)
    r = call(leader_port, "POST", "/collections/rw/cluster",
             {"start_resharding": {"direction": "up"}})
    assert r["result"] is True
    assert _wait(
        lambda: all(len(t.get_collection("rw").placement) == 3 for t in tocs)
        and sum(len(t.get_collection("rw").shards) for t in tocs) == 3,
        30,
    )
    time.sleep(0.5)  # let a few post-reshard writes land
    stop.set()
    for t in threads:
        t.join(timeout=5)

    expected = 50 + len(set(acked))
    def settled():
        try:
            return all(
                call(s.port, "POST", "/collections/rw/points/count",
                     {})["result"]["count"] == expected
                for s in servers
            )
        except Exception:
            return False
    assert _wait(settled, 20, 0.25), {
        "expected": expected,
        "counts": [call(s.port, "POST", "/collections/rw/points/count",
                        {})["result"]["count"] for s in servers],
    }
    # every acked write is individually readable through any peer
    for pid in list(set(acked))[:25]:
        out = call(leader_port, "GET", f"/collections/rw/points/{pid}")
        assert out["result"]["id"] == pid


def test_transfer_abort_mid_stream_cleans_up(cluster):
    """abort_transfer during a replicate stream: the half-copied replica is
    dropped through consensus, placement reverts to the source, and a later
    replicate completes normally."""
    servers, tocs, nodes, leader = cluster
    leader_port = servers[leader.peer_id - 1].port
    # shard_number=2 → consensus-placed shards (single-shard rf=1 keeps the
    # legacy everywhere-local layout with nothing to transfer)
    call(leader_port, "PUT", "/collections/ab", {
        "vectors": {"size": 4, "distance": "Dot"}, "shard_number": 2})
    assert _wait(lambda: all(t.has_collection("ab") for t in tocs), 10, 0.05)
    assert _wait(
        lambda: tocs[leader.peer_id - 1].get_collection("ab").placement.get(0),
        10, 0.05)
    # enough points that the 100-per-batch HTTP stream takes ~a second
    for s in range(0, 12_000, 1000):
        call(leader_port, "PUT", "/collections/ab/points?wait=true", {
            "points": [{"id": s + i, "vector": [float(s + i), 0, 0, 0]}
                       for i in range(1000)]})

    placement = tocs[leader.peer_id - 1].get_collection("ab").placement
    holder = placement[0][0]
    shard0_count = tocs[holder - 1].get_collection("ab").shards[0].point_count()
    target = next(p for p in (1, 2, 3) if p not in placement[0])
    call(leader_port, "POST", "/collections/ab/cluster", {
        "replicate_shard": {"shard_id": 0, "from_peer_id": holder,
                            "to_peer_id": target}})
    # abort from the driving peer while the stream is in flight
    driver_port = servers[holder - 1].port
    aborted = False
    deadline = time.time() + 10
    while time.time() < deadline:
        out = call(driver_port, "POST", "/collections/ab/cluster", {
            "abort_transfer": {"shard_id": 0, "from_peer_id": holder,
                               "to_peer_id": target}})
        if out["result"] is True:
            aborted = True
            break
        # not started yet — but may also have already finished
        pl = tocs[target - 1].get_collection("ab").placement.get(0, [])
        sh = tocs[target - 1].get_collection("ab").shards.get(0)
        if target in pl and sh is not None and sh.point_count() == shard0_count:
            break  # transfer already completed; abort window missed
        time.sleep(0.01)

    if aborted:
        # cleanup: target drops the partial replica, placement reverts
        assert _wait(
            lambda: all(
                t.get_collection("ab").placement.get(0, []) == [holder]
                for t in tocs
            ) and 0 not in tocs[target - 1].get_collection("ab").shards,
            20,
        ), {"placements": [t.get_collection("ab").placement for t in tocs]}
        # no transfer left registered anywhere
        assert _wait(
            lambda: all(not n.active_transfers for n in nodes), 10)

    # reads never see partial data — full count from every peer
    for s in servers:
        assert call(s.port, "POST", "/collections/ab/points/count",
                    {})["result"]["count"] == 12_000

    # a fresh replicate completes and serves the full copy
    call(leader_port, "POST", "/collections/ab/cluster", {
        "replicate_shard": {"shard_id": 0, "from_peer_id": holder,
                            "to_peer_id": target}})
    assert _wait(
        lambda: (
            tocs[target - 1].get_collection("ab").shards.get(0) is not None
            and tocs[target - 1].get_collection("ab").shards[0].point_count()
            == shard0_count
        ),
        40,
    )


def test_lagging_peer_snapshot_install_under_load(cluster, tmp_path):
    """Kill a peer, drive the raft log past the compaction threshold while
    writing points, restart the peer: it must catch up via install_snapshot
    (its missing entries are compacted away) and converge on metadata AND
    data while the load continues."""
    servers, tocs, nodes, leader = cluster
    for n in nodes:
        n.raft.compact_threshold = 16
    leader_port = servers[leader.peer_id - 1].port
    call(leader_port, "PUT", "/collections/lag", {
        "vectors": {"size": 4, "distance": "Dot"}, "shard_number": 2,
        "replication_factor": 2})
    assert _wait(lambda: all(t.has_collection("lag") for t in tocs), 10, 0.05)
    call(leader_port, "PUT", "/collections/lag/points?wait=true", {
        "points": [{"id": i, "vector": [float(i), 0, 0, 0]}
                   for i in range(20)]})

    victim = next(n for n in nodes if n is not leader)
    v_idx = victim.peer_id - 1
    v_port = servers[v_idx].port
    v_storage = tocs[v_idx].storage_path
    victim.stop()
    servers[v_idx].shutdown()
    tocs[v_idx].close()

    # drive the log far past compact_threshold with alias churn + writes
    for i in range(40):
        call(leader_port, "POST", "/collections/aliases", {
            "actions": [{"create_alias": {
                "collection_name": "lag",
                "alias_name": f"lag-alias-{i % 3}"}}]})
    call(leader_port, "PUT", "/collections/lag/points?wait=true", {
        "points": [{"id": 100 + i, "vector": [0, float(i), 0, 0]}
                   for i in range(20)]})
    assert _wait(lambda: leader.raft.snapshot_index > 0, 10), \
        "log never compacted — snapshot-install path not exercised"

    # restart the victim; keep writing while it catches up
    toc_r = TableOfContent(v_storage)
    srv_r = RestServer(toc_r, port=v_port)
    srv_r.start_background()
    urls = {n.peer_id: f"http://127.0.0.1:{servers[n.peer_id - 1].port}"
            for n in nodes}
    node_r = ClusterNode(victim.peer_id, toc_r, urls, tick_period=0.02)
    node_r.raft.compact_threshold = 16
    node_r.start()
    try:
        call(leader_port, "PUT", "/collections/lag/points?wait=true", {
            "points": [{"id": 200 + i, "vector": [0, 0, float(i), 0]}
                       for i in range(20)]})
        # metadata caught up through the installed snapshot
        assert _wait(
            lambda: node_r.raft.snapshot_index > 0
            and toc_r.aliases.get("lag-alias-0") == "lag",
            25,
        ), {"snap": node_r.raft.snapshot_index, "aliases": dict(toc_r.aliases)}
        # data converges: full count visible through the restarted peer
        def caught_up():
            try:
                return call(v_port, "POST", "/collections/lag/points/count",
                            {})["result"]["count"] == 60
            except Exception:
                return False
        assert _wait(caught_up, 30, 0.25)
    finally:
        node_r.stop()
        srv_r.shutdown()
