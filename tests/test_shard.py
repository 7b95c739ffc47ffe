import numpy as np

from qdrant_tpu.collection.shard import LocalShard
from qdrant_tpu.types import (
    CollectionParams,
    Distance,
    OptimizersConfig,
    SparseVectorParams,
    VectorParams,
)


def make_params(dim=16):
    return CollectionParams(
        vectors={"": VectorParams(size=dim, distance=Distance.EUCLID)},
        sparse_vectors={"sp": SparseVectorParams()},
    )


def upsert_op(ids, vectors, payloads=None):
    points = []
    for i, pid in enumerate(ids):
        p = {"id": pid, "vectors": {"": vectors[i].tolist()}}
        if payloads:
            p["payload"] = payloads[i]
        points.append(p)
    return {"type": "upsert", "points": points}


def test_shard_upsert_search_and_wal_replay(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(50, 16)).astype(np.float32)
    path = str(tmp_path / "shard")
    shard = LocalShard(path, make_params())
    shard.update(upsert_op(list(range(50)), data))
    res = shard.search_dense("", data[:3], k=1)
    assert [r[0][1] for r in res] == [0, 1, 2]
    shard.wal.sync()
    shard.wal.close()

    # reopen WITHOUT flush: WAL replay must restore everything
    shard2 = LocalShard(path, make_params())
    assert shard2.point_count() == 50
    res2 = shard2.search_dense("", data[:3], k=1)
    assert [r[0][1] for r in res2] == [0, 1, 2]


def test_shard_flush_and_reload(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.normal(size=(30, 16)).astype(np.float32)
    path = str(tmp_path / "shard")
    shard = LocalShard(path, make_params())
    shard.update(upsert_op(list(range(30)), data, [{"x": i} for i in range(30)]))
    shard.update({"type": "delete", "ids": [5, 6]})
    shard.close()

    shard2 = LocalShard(path, make_params())
    assert shard2.point_count() == 28
    seg = shard2._find_point(7)
    assert seg.get_payload(7) == {"x": 7}
    assert shard2._find_point(5) is None


def test_shard_update_moves_point_from_sealed(tmp_path):
    rng = np.random.default_rng(2)
    data = rng.normal(size=(60, 16)).astype(np.float32)
    path = str(tmp_path / "shard")
    opt = OptimizersConfig(indexing_threshold=50, vacuum_min_vector_number=10**9)
    shard = LocalShard(path, make_params(), opt)
    shard.update(upsert_op(list(range(60)), data))
    # optimizer sealed the appendable segment (60 >= 50)
    assert any(not s.appendable for s in shard.segments)

    # now upsert an existing point with a new vector: must move to appendable
    new_vec = rng.normal(size=16).astype(np.float32)
    shard.update(upsert_op([10], new_vec[None, :]))
    res = shard.search_dense("", new_vec[None, :], k=1)
    assert res[0][0][1] == 10
    assert shard.point_count() == 60


def test_shard_optimizer_vacuum(tmp_path):
    rng = np.random.default_rng(3)
    data = rng.normal(size=(40, 16)).astype(np.float32)
    opt = OptimizersConfig(
        indexing_threshold=30, vacuum_min_vector_number=10, deleted_threshold=0.2
    )
    shard = LocalShard(str(tmp_path / "s"), make_params(), opt)
    shard.update(upsert_op(list(range(40)), data))
    sealed = [s for s in shard.segments if not s.appendable]
    assert sealed
    # delete 30% of points → vacuum rebuild
    shard.update({"type": "delete", "ids": list(range(0, 12))})
    for seg in shard.segments:
        assert seg.total_offsets == len(seg)  # defragmented
    assert shard.point_count() == 28


def test_shard_payload_ops_and_filter_selector(tmp_path):
    rng = np.random.default_rng(4)
    data = rng.normal(size=(20, 16)).astype(np.float32)
    shard = LocalShard(str(tmp_path / "s"), make_params())
    shard.update(upsert_op(list(range(20)), data, [{"g": i % 2} for i in range(20)]))
    shard.update(
        {
            "type": "set_payload",
            "payload": {"marked": True},
            "filter": {"must": [{"key": "g", "match": {"value": 1}}]},
        }
    )
    seg = shard._find_point(3)
    assert seg.get_payload(3) == {"g": 1, "marked": True}
    assert shard._find_point(2) is not None
    assert shard._find_point(2).get_payload(2) == {"g": 0}
    from qdrant_tpu.types import parse_filter

    assert shard.count(parse_filter({"must": [{"key": "marked", "match": {"value": True}}]})) == 10


def test_shard_scroll(tmp_path):
    rng = np.random.default_rng(5)
    data = rng.normal(size=(15, 16)).astype(np.float32)
    shard = LocalShard(str(tmp_path / "s"), make_params())
    shard.update(upsert_op([i * 2 for i in range(15)], data))
    page1 = shard.scroll_ids(limit=5)
    assert page1 == [0, 2, 4, 6, 8]
    page2 = shard.scroll_ids(limit=5, offset_id=10)
    assert page2 == [10, 12, 14, 16, 18]


def test_deferred_points_visibility(tmp_path):
    """Deferred upserts are invisible to reads until confirmed (reference:
    tests/openapi/test_deferred_points.py semantics)."""
    rng = np.random.default_rng(7)
    data = rng.normal(size=(6, 16)).astype(np.float32)
    shard = LocalShard(str(tmp_path / "s"), make_params())
    shard.update(upsert_op([0, 1, 2], data[:3]))
    op = upsert_op([3, 4, 5], data[3:])
    op["deferred"] = True
    shard.update(op)

    # deferred points exist in the tracker but are invisible to search/count
    seg = shard._find_point(3)
    assert seg is not None
    assert seg.num_deferred_points == 3
    res = shard.search_dense("", data[3:4], k=6)
    visible = {pid for r in res for _, pid, _ in r}
    assert visible == {0, 1, 2}

    # confirm → visible
    shard.update({"type": "confirm_deferred", "ids": [3, 4, 5]})
    assert seg.num_deferred_points == 0
    res = shard.search_dense("", data[3:4], k=1)
    assert res[0][0][1] == 3


def test_merge_optimizer_combines_small_segments(tmp_path):
    rng = np.random.default_rng(9)
    opt = OptimizersConfig(
        indexing_threshold=10,
        vacuum_min_vector_number=10**9,
        default_segment_number=3,
    )
    shard = LocalShard(str(tmp_path / "s"), make_params(), opt)
    # each batch of 10 seals into its own segment → exceeds the cap → merge
    for batch in range(6):
        ids = list(range(batch * 10, batch * 10 + 10))
        shard.update(upsert_op(ids, rng.normal(size=(10, 16)).astype(np.float32)))
    sealed = [s for s in shard.segments if not s.appendable]
    assert len(sealed) <= 3
    assert shard.point_count() == 60
    # data intact post-merge
    seg = shard._find_point(37)
    assert seg is not None


def test_concurrent_updates_and_searches(tmp_path):
    """Thread-safety smoke: concurrent upserts + searches must not corrupt
    state (ThreadingHTTPServer serves requests on multiple threads)."""
    import threading

    rng = np.random.default_rng(12)
    shard = LocalShard(str(tmp_path / "s"), make_params())
    data = rng.normal(size=(200, 16)).astype(np.float32)
    errors = []

    def writer(base):
        try:
            for i in range(base, base + 50):
                shard.update(upsert_op([i], data[i - base][None, :]))
        except Exception as e:
            errors.append(e)

    def reader():
        try:
            for _ in range(30):
                shard.search_dense("", data[:2], k=3)
                shard.count(None)
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(b,)) for b in (0, 1000, 2000)]
    threads += [threading.Thread(target=reader) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert shard.point_count() == 150


def test_shard_defer_optimizers(tmp_path):
    """With defer_optimizers the write path never seals; the background
    pass (maybe_optimize) does, without losing points."""
    rng = np.random.default_rng(11)
    data = rng.normal(size=(60, 16)).astype(np.float32)
    opt = OptimizersConfig(indexing_threshold=50, vacuum_min_vector_number=10**9)
    shard = LocalShard(str(tmp_path / "s"), make_params(), opt)
    shard.defer_optimizers = True
    res = shard.update(upsert_op(list(range(60)), data))
    assert res["status"] == "completed" and res["operation_id"] == 1
    assert all(s.appendable for s in shard.segments)
    assert shard.maybe_optimize()
    assert any(not s.appendable for s in shard.segments)
    assert shard.point_count() == 60
    res = shard.search_dense("", data[:1], k=1)
    assert res[0][0][1] == 0


def test_wal_replay_no_duplicates_after_payload_bump(tmp_path):
    """Restart replay must not duplicate points whose version was bumped by a
    later set_payload: the stale upsert's move-delete no-ops (version guard)
    while the re-insert used to land a second copy in the appendable segment."""
    rng = np.random.default_rng(12)
    data = rng.normal(size=(40, 16)).astype(np.float32)
    path = str(tmp_path / "s")
    opt = OptimizersConfig(indexing_threshold=30, vacuum_min_vector_number=10**9)
    shard = LocalShard(path, make_params(), opt)
    shard.update(upsert_op(list(range(40)), data))  # seals at 30
    assert any(not s.appendable for s in shard.segments)
    shard.update({"type": "set_payload", "ids": list(range(10)), "payload": {"tier": 1}})
    shard.flush()
    # simulate a restart where one segment lags (forces WAL replay from 0)
    for seg in shard.segments:
        if seg.appendable:
            seg.version = 0
    shard.flush()
    shard2 = LocalShard(path, make_params(), opt)
    assert shard2.point_count() == 40
    # fresh appendable at startup must carry the newest version forward
    shard2.flush()
    shard3 = LocalShard(path, make_params(), opt)
    assert shard3.point_count() == 40
