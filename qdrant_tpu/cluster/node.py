"""ClusterNode: the composition root for a clustered peer.

Reference: src/main.rs cluster bootstrap + src/consensus.rs (the consensus
thread pumping raft ticks/messages). A ClusterNode owns this peer's
TableOfContent, its RaftNode (metadata consensus), a ConsensusManager
applying committed ops, and an HTTP transport that posts Raft messages to
peer REST servers (/cluster/raft/message). A background thread drives
ticks, like the reference's dedicated consensus OS thread.
"""

from __future__ import annotations

import json
import threading
import urllib.request
from typing import Dict, Optional

from ..api.toc import TableOfContent
from .consensus import ConsensusManager, Dispatcher
from .raft import RaftNode


class HttpRaftTransport:
    """Posts raft messages to peers' REST endpoints from a dedicated sender
    thread. Sends MUST be async: RaftNode invokes the transport while holding
    its state lock, and a synchronous send to a peer that is itself sending
    back deadlocks the cluster. Unreachable peers are dropped silently (raft
    tolerates message loss)."""

    def __init__(
        self,
        peer_urls: Dict[int, str],
        timeout: float = 2.0,
        api_key: Optional[str] = None,
    ):
        import queue

        self.peer_urls = dict(peer_urls)
        self.timeout = timeout
        self.api_key = api_key
        self._q: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._pump, daemon=True)
        self._thread.start()

    def __call__(self, peer_id: int, message: dict) -> None:
        self._q.put((peer_id, message))

    def _pump(self) -> None:
        while True:
            peer_id, message = self._q.get()
            url = self.peer_urls.get(peer_id)
            if url is None:
                continue
            req = urllib.request.Request(
                f"{url.rstrip('/')}/cluster/raft/message",
                data=json.dumps(message).encode(),
                method="POST",
            )
            req.add_header("Content-Type", "application/json")
            if self.api_key:
                req.add_header("api-key", self.api_key)
            try:
                urllib.request.urlopen(req, timeout=self.timeout).read()
            except OSError:
                pass  # peer down — raft retries via heartbeats


class ClusterNode:
    def __init__(
        self,
        peer_id: int,
        toc: TableOfContent,
        peer_urls: Dict[int, str],
        tick_period: float = 0.05,
        raft_storage: Optional[str] = None,
        api_key: Optional[str] = None,
    ):
        self.peer_id = peer_id
        self.toc = toc
        self.api_key = api_key
        self.manager = ConsensusManager(toc)
        self.transport = HttpRaftTransport(peer_urls, api_key=api_key)
        self.raft = RaftNode(
            peer_id,
            sorted(set(peer_urls.keys()) | {peer_id}),
            self.transport,
            apply_fn=self.manager.apply,
            storage_path=raft_storage,
            snapshot_fn=self.manager.snapshot_state,
            restore_fn=self.manager.restore_state,
        )
        self.dispatcher = Dispatcher(toc, raft=self.raft, manager=self.manager)
        self.tick_period = tick_period
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        # the REST server discovers the node through the toc
        toc.cluster_node = self
        for name in toc.list_collections():
            self.attach_replication(name)
        self.manager.on_collection_created = self.attach_replication
        self.manager.on_peer_added = self.add_peer

    def start(self) -> None:
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while not self._stop.wait(self.tick_period):
            self.raft.tick()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)

    def receive(self, message: dict) -> None:
        self.raft.receive(message)

    def attach_replication(self, collection_name: str) -> None:
        """Wire each shard into a ShardReplicaSet spanning all peers
        (full replication placement: every peer holds every shard —
        placement by consensus-assigned subsets arrives with resharding
        integration). Writes then fan out with clock tags; reads stay local."""
        from .remote import RemoteReplica
        from .replica_set import LocalReplica, ReplicaState, ShardReplicaSet

        try:
            coll = self.toc.get_collection(collection_name)
        except Exception:
            return
        if coll.params.replication_factor < 2:
            return
        for sid, shard in coll.shards.items():
            rs = ShardReplicaSet(
                sid,
                this_peer_id=self.peer_id,
                local=LocalReplica(shard),
                write_consistency_factor=coll.params.write_consistency_factor,
            )
            for peer_id, url in self.transport.peer_urls.items():
                if peer_id == self.peer_id:
                    continue
                rs.add_replica(
                    peer_id,
                    RemoteReplica(url, collection_name, sid, api_key=self.api_key),
                    ReplicaState.ACTIVE,
                )
            coll.replica_sets[sid] = rs

    def add_peer(self, peer_id: int, url: str) -> None:
        """Committed add_peer op: extend transport + raft membership and
        wire the new peer into every replicated collection."""
        if peer_id == self.peer_id:
            return
        self.transport.peer_urls[peer_id] = url
        self.raft.add_peer(peer_id)
        for name in self.toc.list_collections():
            self.attach_replication(name)

    def cluster_info(self) -> dict:
        return {
            "status": "enabled",
            "peer_id": self.peer_id,
            "peers": {
                str(p): {"uri": u} for p, u in self.transport.peer_urls.items()
            },
            "raft_info": {
                "term": self.raft.term,
                "commit": self.raft.commit_index,
                "pending_operations": len(self.raft.log) - self.raft.commit_index,
                "leader": self.raft.leader_id,
                "role": self.raft.role,
                "is_voter": True,
            },
        }
