"""Raft consensus tests with a controllable in-process network — the
pattern of the reference's tests/consensus_tests (real peers, injected
failures), here with deliverable-message control instead of SIGKILL."""

import pytest

from qdrant_tpu.cluster.raft import LEADER, FOLLOWER, NotLeader, RaftNode


class Network:
    """Delivers messages between nodes; supports partitioning nodes off."""

    def __init__(self):
        self.nodes = {}
        self.down = set()
        self.queue = []

    def transport_for(self, node_id):
        def send(peer, msg):
            self.queue.append((node_id, peer, msg))

        return send

    def deliver_all(self):
        while self.queue:
            src, dst, msg = self.queue.pop(0)
            if src in self.down or dst in self.down:
                continue
            if dst in self.nodes:
                self.nodes[dst].receive(msg)

    def tick_all(self, n=1):
        for _ in range(n):
            for node_id, node in self.nodes.items():
                if node_id not in self.down:
                    node.tick()
            self.deliver_all()


def make_cluster(net, ids, applied, path=None):
    for i in ids:
        net.nodes[i] = RaftNode(
            i,
            list(ids),
            net.transport_for(i),
            apply_fn=lambda op, i=i: applied.setdefault(i, []).append(op),
            storage_path=f"{path}/{i}" if path else None,
            seed=i,
        )


def leader_of(net):
    leaders = [n for n in net.nodes.values() if n.role == LEADER and n.node_id not in net.down]
    return leaders[0] if len(leaders) == 1 else None


def run_until_leader(net, max_ticks=200):
    for _ in range(max_ticks):
        net.tick_all()
        l = leader_of(net)
        if l is not None:
            # ensure followers acknowledged
            net.tick_all(3)
            if leader_of(net) is l:
                return l
    raise AssertionError("no leader elected")


def test_single_node_commits_immediately():
    applied = {}
    node = RaftNode(1, [1], lambda p, m: None, lambda op: applied.setdefault(1, []).append(op))
    assert node.role == LEADER
    node.propose({"op": "create", "name": "c1"})
    assert applied[1] == [{"op": "create", "name": "c1"}]


def test_three_node_election_and_replication():
    net = Network()
    applied = {}
    make_cluster(net, [1, 2, 3], applied)
    leader = run_until_leader(net)

    leader.propose({"op": "create", "name": "a"})
    leader.propose({"op": "create", "name": "b"})
    net.tick_all(5)
    for i in [1, 2, 3]:
        assert applied.get(i) == [
            {"op": "create", "name": "a"},
            {"op": "create", "name": "b"},
        ], f"node {i}"


def test_follower_rejects_propose():
    net = Network()
    applied = {}
    make_cluster(net, [1, 2, 3], applied)
    leader = run_until_leader(net)
    follower = next(n for n in net.nodes.values() if n is not leader)
    with pytest.raises(NotLeader) as e:
        follower.propose({"op": "x"})
    assert e.value.leader_id == leader.node_id


def test_leader_failure_reelection_and_catchup():
    net = Network()
    applied = {}
    make_cluster(net, [1, 2, 3], applied)
    leader = run_until_leader(net)
    leader.propose({"op": 1})
    net.tick_all(5)

    # kill the leader
    net.down.add(leader.node_id)
    new_leader = run_until_leader(net)
    assert new_leader is not leader
    new_leader.propose({"op": 2})
    net.tick_all(5)
    alive = [i for i in [1, 2, 3] if i != leader.node_id]
    for i in alive:
        assert applied[i] == [{"op": 1}, {"op": 2}]

    # old leader comes back: catches up, steps down
    net.down.clear()
    net.tick_all(10)
    assert applied[leader.node_id] == [{"op": 1}, {"op": 2}]
    assert leader.role == FOLLOWER


def test_minority_partition_cannot_commit():
    net = Network()
    applied = {}
    make_cluster(net, [1, 2, 3], applied)
    leader = run_until_leader(net)
    # partition the leader off with no followers
    others = [i for i in [1, 2, 3] if i != leader.node_id]
    net.down.update(others)
    idx = leader.propose({"op": "lost?"})
    net.tick_all(10)
    assert leader.commit_index < idx  # cannot commit without majority


def test_persistence_restart(tmp_path):
    net = Network()
    applied = {}
    make_cluster(net, [1, 2, 3], applied, path=str(tmp_path))
    leader = run_until_leader(net)
    leader.propose({"op": "durable"})
    net.tick_all(5)
    nid = leader.node_id

    # restart the leader node from disk
    replay = {}
    node2 = RaftNode(
        nid,
        [1, 2, 3],
        net.transport_for(nid),
        apply_fn=lambda op: replay.setdefault(nid, []).append(op),
        storage_path=f"{tmp_path}/{nid}",
        seed=nid,
    )
    assert replay[nid] == [{"op": "durable"}]
    assert node2.term >= leader.term
    assert node2.commit_index == leader.commit_index


def test_log_compaction_and_snapshot_join(tmp_path):
    """Leader compacts its log past the threshold; a peer that joins later
    (empty log, behind the snapshot boundary) catches up via
    install_snapshot + remaining entries."""
    net = Network()
    applied = {}
    states = {}

    def mk(i, ids):
        net.nodes[i] = RaftNode(
            i,
            ids,
            net.transport_for(i),
            apply_fn=lambda op, i=i: applied.setdefault(i, []).append(op),
            snapshot_fn=lambda i=i: {"count": len(applied.get(i, []))},
            restore_fn=lambda data, i=i: states.__setitem__(i, data),
            compact_threshold=10,
            seed=i,
        )

    for i in (1, 2):
        mk(i, [1, 2])
    leader = run_until_leader(net)
    for k in range(25):
        leader = leader_of(net) or leader
        leader.propose({"n": k})
        net.tick_all(2)
    net.tick_all(10)
    # both nodes compacted: retained log well under total proposals
    assert leader.snapshot_index >= 10
    assert len(leader.log) < 25
    assert len(applied[1]) == 25 and len(applied[2]) == 25

    # late joiner: becomes a peer, starts empty → snapshot install
    mk(3, [1, 2, 3])
    for n in net.nodes.values():
        n.add_peer(3)
    net.tick_all(30)
    n3 = net.nodes[3]
    assert n3.snapshot_index == leader.snapshot_index
    assert states.get(3, {}).get("count", 0) >= 10  # restored from snapshot
    # entries after the snapshot replayed normally
    assert len(applied.get(3, [])) == 25 - n3.snapshot_index

    # new proposals replicate to all three
    leader = leader_of(net)
    leader.propose({"n": 99})
    net.tick_all(5)
    assert applied[3][-1] == {"n": 99}


def test_compaction_persistence_restart(tmp_path):
    """Snapshot + truncated log survive restart: restore_fn runs, then the
    retained suffix replays."""
    applied = {}
    states = {}
    net = Network()
    net.nodes[1] = RaftNode(
        1, [1], net.transport_for(1),
        apply_fn=lambda op: applied.setdefault(1, []).append(op),
        snapshot_fn=lambda: {"count": len(applied.get(1, []))},
        restore_fn=lambda d: states.__setitem__(1, d),
        compact_threshold=5,
        storage_path=str(tmp_path / "n1"),
        seed=1,
    )
    for k in range(12):
        net.nodes[1].propose({"n": k})
    assert net.nodes[1].snapshot_index >= 5
    applied2 = {}
    states2 = {}
    reloaded = RaftNode(
        1, [1], net.transport_for(1),
        apply_fn=lambda op: applied2.setdefault(1, []).append(op),
        snapshot_fn=lambda: {"count": 0},
        restore_fn=lambda d: states2.__setitem__(1, d),
        compact_threshold=5,
        storage_path=str(tmp_path / "n1"),
        seed=1,
    )
    assert states2[1]["count"] >= 5  # snapshot restored
    # replayed suffix + snapshot covers all 12 ops
    assert states2[1]["count"] + len(applied2.get(1, [])) == 12


# ----------------------------------------------------------------------
# pre-vote + learners (raft-rs behaviors the reference's consensus config
# enables: src/consensus.rs raft Config pre_vote, learner add-then-promote)
# ----------------------------------------------------------------------


def test_prevote_partitioned_node_does_not_disrupt_leader():
    """A node partitioned off and ticking must NOT inflate its term (the
    pre-vote poll fails without a majority), so on rejoin the stable
    leader keeps leading with no term churn."""
    net = Network()
    applied = {}
    make_cluster(net, [1, 2, 3], applied)
    leader = run_until_leader(net)
    stable_term = leader.term
    # partition off one follower and let it time out many times over
    victim = next(i for i in net.nodes if net.nodes[i] is not leader)
    net.down.add(victim)
    for _ in range(100):
        net.nodes[victim].tick()  # ticks alone; messages are dropped
    net.queue.clear()  # drop everything it tried to send while down
    assert net.nodes[victim].term == stable_term  # pre-vote never bumped it
    # rejoin: leader unchanged, same term
    net.down.clear()
    net.tick_all(10)
    assert leader.role == LEADER
    assert leader.term == stable_term


def test_prevote_still_elects_after_leader_death():
    net = Network()
    applied = {}
    make_cluster(net, [1, 2, 3], applied)
    first = run_until_leader(net)
    net.down.add(first.node_id)
    survivor_leader = None
    for _ in range(300):
        net.tick_all()
        leaders = [
            n for n in net.nodes.values()
            if n.role == LEADER and n.node_id not in net.down
        ]
        if leaders:
            survivor_leader = leaders[0]
            break
    assert survivor_leader is not None
    assert survivor_leader.term > first.term
    idx = survivor_leader.propose({"op": "after-failover"})
    net.tick_all(5)
    assert idx >= 1


def test_learner_replicates_but_does_not_vote_or_campaign():
    net = Network()
    applied = {}
    # two voters + one learner
    for i in (1, 2):
        net.nodes[i] = RaftNode(
            i, [1, 2], net.transport_for(i),
            apply_fn=lambda op, i=i: applied.setdefault(i, []).append(op),
            seed=i, learners=[3],
        )
    net.nodes[3] = RaftNode(
        3, [1, 2], net.transport_for(3),
        apply_fn=lambda op: applied.setdefault(3, []).append(op),
        seed=3, is_learner=True,
    )
    leader = run_until_leader(net)
    assert net.nodes[3].role != LEADER
    leader.propose({"op": "x"})
    net.tick_all(5)
    # learner applied the committed op
    assert applied.get(3) == [{"op": "x"}]
    # learner never campaigns even when fully isolated
    net.down.update({1, 2})
    for _ in range(200):
        net.nodes[3].tick()
    assert net.nodes[3].role == FOLLOWER


def test_learner_does_not_count_toward_quorum():
    """Leader + dead voter + live learner: entries must NOT commit (the
    learner's ack is not a vote)."""
    net = Network()
    applied = {}
    for i in (1, 2):
        net.nodes[i] = RaftNode(
            i, [1, 2], net.transport_for(i),
            apply_fn=lambda op, i=i: applied.setdefault(i, []).append(op),
            seed=i, learners=[3],
        )
    net.nodes[3] = RaftNode(
        3, [1, 2], net.transport_for(3),
        apply_fn=lambda op: applied.setdefault(3, []).append(op),
        seed=3, is_learner=True,
    )
    leader = run_until_leader(net)
    other = next(i for i in (1, 2) if net.nodes[i] is not leader)
    net.down.add(other)
    leader.propose({"op": "minority"})
    net.tick_all(10)
    assert applied.get(leader.node_id, []) == []  # not committed
    assert applied.get(3, []) == []  # learner got entries but no commit
    # the voter comes back -> commit proceeds
    net.down.clear()
    net.tick_all(10)
    assert applied.get(leader.node_id) == [{"op": "minority"}]
    assert applied.get(3) == [{"op": "minority"}]


def test_learner_promotion_enables_voting():
    net = Network()
    applied = {}
    for i in (1, 2):
        net.nodes[i] = RaftNode(
            i, [1, 2], net.transport_for(i),
            apply_fn=lambda op, i=i: applied.setdefault(i, []).append(op),
            seed=i, learners=[3],
        )
    net.nodes[3] = RaftNode(
        3, [1, 2], net.transport_for(3),
        apply_fn=lambda op: applied.setdefault(3, []).append(op),
        seed=3, is_learner=True,
    )
    leader = run_until_leader(net)
    leader.propose({"op": "seed"})
    net.tick_all(5)
    # promote on every node (in the product this flows through consensus)
    for n in net.nodes.values():
        n.promote_learner(3)
    assert not net.nodes[3].is_learner
    # kill the current leader: with 3 voters the remaining two elect
    net.down.add(leader.node_id)
    survivor = None
    for _ in range(300):
        net.tick_all()
        live = [
            n for n in net.nodes.values()
            if n.role == LEADER and n.node_id not in net.down
        ]
        if live:
            survivor = live[0]
            break
    assert survivor is not None
    survivor.propose({"op": "post-promotion"})
    net.tick_all(5)
    live_ids = [i for i in net.nodes if i not in net.down]
    for i in live_ids:
        assert {"op": "post-promotion"} in applied.get(i, [])
