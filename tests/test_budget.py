"""Optimizer/serving resource budget (utils/budget.py; reference:
lib/common/common/src/budget.rs + src/main.rs:509-511)."""

import threading
import time

import numpy as np

from qdrant_tpu.utils.budget import BUDGET, ResourceBudget


def test_yield_waits_for_inflight_search(monkeypatch):
    monkeypatch.setenv("QDRANT_TPU_BUILD_THROTTLE_MS", "10")
    budget = ResourceBudget()
    release = threading.Event()

    def searcher():
        with budget.search():
            release.wait(2.0)

    t = threading.Thread(target=searcher)
    t.start()
    time.sleep(0.05)  # let the search enter
    start = time.monotonic()
    threading.Timer(0.15, release.set).start()
    yielded = budget.yield_to_searches()
    elapsed = time.monotonic() - start
    t.join()
    # the builder waited for the search (plus the recency window)
    assert yielded > 0.05
    assert elapsed >= 0.1


def test_yield_noop_when_idle_or_disabled(monkeypatch):
    monkeypatch.setenv("QDRANT_TPU_BUILD_THROTTLE_MS", "10")
    budget = ResourceBudget()
    start = time.monotonic()
    budget.yield_to_searches()
    assert time.monotonic() - start < 0.05  # idle: returns immediately

    monkeypatch.setenv("QDRANT_TPU_BUILD_THROTTLE_MS", "0")
    with budget.search():
        assert budget.yield_to_searches() == 0.0  # disabled: no wait


def test_build_permits_serialize(monkeypatch):
    budget = ResourceBudget(build_permits=1)
    order = []

    def builder(tag):
        with budget.acquire_build():
            order.append(("start", tag))
            time.sleep(0.05)
            order.append(("end", tag))

    ts = [threading.Thread(target=builder, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    # no interleaving: each build finishes before the next starts
    assert order[0][0] == "start" and order[1][0] == "end"
    assert order[2][0] == "start" and order[3][0] == "end"


def test_search_pressure_window():
    budget = ResourceBudget()
    assert not budget.search_pressure()  # fresh: no search ever ran
    with budget.search():
        assert budget.search_pressure()  # in flight
    assert budget.search_pressure(window_s=5.0)  # just finished
    assert not budget.search_pressure(window_s=0.0)  # window elapsed


def test_search_registers_inflight():
    from qdrant_tpu.storage.segment import Segment
    from qdrant_tpu.types import CollectionParams, Distance, VectorParams

    params = CollectionParams(
        vectors={"": VectorParams(size=4, distance=Distance.DOT)}
    )
    seg = Segment(params)
    seg.upsert_point(1, 1, {"": np.asarray([1.0, 0, 0, 0], np.float32)}, {})
    before = BUDGET.searches_inflight
    seg.search_dense("", np.asarray([[1.0, 0, 0, 0]], np.float32), k=1)
    # the context exited cleanly and recorded recency
    assert BUDGET.searches_inflight == before
    assert BUDGET._last_search > 0
