"""Server-side query micro-batching.

The engine's kernels amortize beautifully over batched queries (one padded
MXU dispatch), but N concurrent single-query HTTP clients would otherwise
serialize into N tiny device calls (the GIL + per-dispatch ~tens of ms
through the device link). The reference amortizes with a CPU threadpool
fan-out; the TPU-native analogue is COALESCING: concurrent searches with
compatible shapes merge into one padded device batch.

Zero-added-latency design: there is no timer window. An exec lock
serializes device work per batcher; requests that arrive while a batch is
executing accumulate in a per-key queue, and whoever next acquires the lock
takes the WHOLE queue for its key as one batch. Under no load a request
runs immediately; under load batches form exactly as fast as the device
drains them.
"""

from __future__ import annotations

import threading
from typing import Any, Callable, Dict, List, Optional, Tuple


class _Item:
    __slots__ = ("rows", "event", "result", "error", "exec_fn")

    def __init__(self, rows):
        self.rows = rows  # caller's queries (list length = row count)
        self.event = threading.Event()
        self.result: Optional[list] = None
        self.error: Optional[BaseException] = None
        self.exec_fn = None


class MicroBatcher:
    def __init__(self, max_rows: int = 1024):
        self.max_rows = max_rows
        self._lock = threading.Lock()
        self._exec_lock = threading.Lock()
        self._pending: Dict[Any, List[_Item]] = {}

    def run(
        self,
        key: Any,
        rows: List[Any],
        exec_fn: Callable[[List[Any]], list],
    ) -> list:
        """Execute `exec_fn` over `rows` (+ any compatible queued rows),
        returning this caller's slice of the batched results. exec_fn
        receives the concatenated row list and must return one result per
        row, in order.

        Leader/follower structure: whoever grabs the exec lock DRAINS the
        queue (its key) in maximal batches until empty; everyone else waits
        only on their completion event. Followers must NOT queue on the
        exec lock itself — lock-queued wakeups throttle batch formation to
        a handful of arrivals per cycle (measured: batches stuck at ~8 with
        64 concurrent callers; draining leaders reach full coalescing)."""
        item = _Item(rows)
        item.exec_fn = exec_fn
        with self._lock:
            self._pending.setdefault(key, []).append(item)

        while not item.event.is_set():
            if self._exec_lock.acquire(blocking=False):
                try:
                    self._drain(key)
                finally:
                    self._exec_lock.release()
                if item.event.is_set():
                    break
            # another leader is executing; it drains everything queued —
            # the short timeout only covers the enqueue/release race
            item.event.wait(timeout=0.005)
        if item.error is not None:
            raise item.error
        return item.result

    def _drain(self, key: Any) -> None:
        while True:
            with self._lock:
                queue = self._pending.get(key, [])
                batch: List[_Item] = []
                taken_rows = 0
                while queue and (
                    not batch
                    or taken_rows + len(queue[0].rows) <= self.max_rows
                ):
                    it = queue.pop(0)
                    batch.append(it)
                    taken_rows += len(it.rows)
                if not queue:
                    self._pending.pop(key, None)
            if not batch:
                return
            self._execute(batch, batch[0].exec_fn)

    @staticmethod
    def _execute(batch: List[_Item], exec_fn) -> None:
        all_rows: List[Any] = []
        for it in batch:
            all_rows.extend(it.rows)
        try:
            results = exec_fn(all_rows)
            off = 0
            for it in batch:
                it.result = results[off : off + len(it.rows)]
                off += len(it.rows)
        except BaseException as e:  # propagate to every waiter
            for it in batch:
                it.error = e
        finally:
            for it in batch:
                it.event.set()
