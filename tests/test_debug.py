"""Stall watchdog + data-consistency check (utils/debug.py; reference:
service_debug deadlock checker src/main.rs:331-366 and the
data-consistency-check feature)."""

import threading
import time

import numpy as np

from qdrant_tpu.utils.debug import (
    StallWatchdog,
    check_shard_consistency,
)


def test_watchdog_flags_stalled_section(caplog):
    wd = StallWatchdog()
    wd.threshold_s = 0.05
    entered = threading.Event()
    release = threading.Event()

    def stuck():
        with wd.section("test.stuck"):
            entered.set()
            release.wait(2.0)

    t = threading.Thread(target=stuck)
    t.start()
    entered.wait(1.0)
    time.sleep(0.1)
    import logging

    with caplog.at_level(logging.ERROR, logger="qdrant_tpu.utils.debug"):
        n = wd.check_once()
    release.set()
    t.join()
    assert n == 1
    assert wd.stalls_detected == 1
    assert "test.stuck" in caplog.text and "Thread" in caplog.text
    # closed sections no longer flag
    assert wd.check_once() == 0


def test_watchdog_config_roundtrip():
    wd = StallWatchdog()
    cfg = wd.configure({"enabled": True, "period_s": 1, "threshold_s": 2})
    assert cfg["enabled"] and cfg["period_s"] == 1 and cfg["threshold_s"] == 2
    with wd.section("open"):
        cfg = wd.config()
        assert cfg["open_sections"][0]["name"] == "open"
    wd._stop.set()


def test_consistency_check_detects_orphans():
    from qdrant_tpu.collection.shard import LocalShard
    from qdrant_tpu.types import CollectionParams, Distance, VectorParams

    params = CollectionParams(
        vectors={"": VectorParams(size=4, distance=Distance.DOT)}
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        shard = LocalShard(d, params)
        for i in range(5):
            shard.update(
                {
                    "type": "upsert",
                    "points": [
                        {"id": i, "vector": [float(i), 0, 0, 0], "payload": {}}
                    ],
                }
            )
        out = check_shard_consistency(shard)
        assert out["consistent"] and out["checked_points"] == 5

        # corrupt: break the id mapping of one point
        seg = shard.segments[0]
        internal = seg.id_tracker.internal_id(3)
        seg.id_tracker._ext_to_int[3] = internal + 100  # asymmetric now
        out = check_shard_consistency(shard)
        assert not out["consistent"]
        assert any("3" in p for p in out["problems"])
        shard.close()
