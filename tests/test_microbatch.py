"""Server-side query micro-batching: concurrent single-query searches
coalesce into one padded device batch with unchanged per-caller results."""

import threading

import numpy as np

from qdrant_tpu.utils.microbatch import MicroBatcher


def test_concurrent_callers_coalesce():
    calls = []
    lock = threading.Lock()
    gate = threading.Event()

    def exec_fn(rows):
        with lock:
            calls.append(len(rows))
        if len(calls) == 1:
            gate.wait(5)  # hold the first batch so followers queue up
        return [r * 2 for r in rows]

    mb = MicroBatcher()
    results = {}

    def worker(i):
        results[i] = mb.run("k", [i], exec_fn)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(17)]
    threads[0].start()
    import time

    time.sleep(0.05)  # let worker 0 become leader and block in exec_fn
    for t in threads[1:]:
        t.start()
    time.sleep(0.15)  # followers enqueue behind the exec lock
    gate.set()
    for t in threads:
        t.join(10)
    assert all(results[i] == [2 * i] for i in range(17))
    # first call carried one row; the rest coalesced into few batches
    assert calls[0] == 1
    assert sum(calls) == 17
    assert len(calls) <= 6, calls  # 16 followers in a handful of batches


def test_distinct_keys_do_not_mix():
    mb = MicroBatcher()
    out1 = mb.run("a", [1, 2], lambda rows: [r + 10 for r in rows])
    out2 = mb.run("b", [3], lambda rows: [r * 100 for r in rows])
    assert out1 == [11, 12]
    assert out2 == [300]


def test_exception_propagates_to_all():
    mb = MicroBatcher()

    def boom(rows):
        raise ValueError("bad")

    try:
        mb.run("k", [1], boom)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_collection_search_coalesces(tmp_path):
    import os

    from qdrant_tpu.collection.collection import Collection
    from qdrant_tpu.types import CollectionParams, Distance, VectorParams

    params = CollectionParams(
        vectors={"": VectorParams(size=16, distance=Distance.DOT)},
        sparse_vectors={},
    )
    coll = Collection("mb", str(tmp_path / "mb"), params)
    rng = np.random.default_rng(0)
    data = rng.normal(size=(300, 16)).astype(np.float32)
    coll.upsert(
        [{"id": i, "vector": data[i].tolist()} for i in range(300)]
    )
    qs = rng.normal(size=(24, 16)).astype(np.float32)
    seq = [coll.search_dense("", qs[i : i + 1], 5)[0] for i in range(24)]

    results = [None] * 24

    def worker(i):
        results[i] = coll.search_dense("", qs[i : i + 1], 5)[0]

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(24)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    for i in range(24):
        assert [pid for _, pid, _ in results[i]] == [
            pid for _, pid, _ in seq[i]
        ]
