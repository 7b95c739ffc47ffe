import numpy as np
import pytest

from qdrant_tpu.index.hnsw import HnswIndex
from qdrant_tpu.storage.vectors import DenseVectorStore
from qdrant_tpu.types import Distance, HnswConfig


def brute_topk(queries, data, k, distance):
    if distance is Distance.COSINE:
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        vn = data / np.linalg.norm(data, axis=1, keepdims=True)
        scores = qn @ vn.T
    elif distance is Distance.DOT:
        scores = queries @ data.T
    else:
        scores = -((queries[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    return np.argsort(-scores, axis=1)[:, :k]


def recall(ids, truth):
    hits = 0
    for row, t in zip(ids, truth):
        hits += len(set(row.tolist()) & set(t.tolist()))
    return hits / truth.size


@pytest.mark.parametrize("distance", [Distance.COSINE, Distance.EUCLID])
def test_hnsw_recall(distance):
    rng = np.random.default_rng(0)
    n, d, k = 3000, 32, 10
    data = rng.normal(size=(n, d)).astype(np.float32)
    store = DenseVectorStore(d, distance)
    store.add(data)
    idx = HnswIndex(store, HnswConfig(m=16, ef_construct=100), seed=1)
    idx.build(batch_size=256)

    queries = rng.normal(size=(20, d)).astype(np.float32)
    _, ids = idx.search(queries, k=k, ef=100)
    truth = brute_topk(queries, data, k, distance)
    r = recall(ids, truth)
    assert r >= 0.9, f"recall {r} too low"


def test_hnsw_filtered_search():
    rng = np.random.default_rng(1)
    n, d, k = 2000, 16, 5
    data = rng.normal(size=(n, d)).astype(np.float32)
    store = DenseVectorStore(d, Distance.EUCLID)
    store.add(data)
    idx = HnswIndex(store, HnswConfig(m=12, ef_construct=64), seed=2)
    idx.build(batch_size=256)

    mask = np.zeros(n, dtype=bool)
    mask[::2] = True  # 50% selectivity
    queries = rng.normal(size=(8, d)).astype(np.float32)
    scores, ids = idx.search(queries, k=k, ef=128, filter_mask=mask)
    valid = ids[ids >= 0]
    assert len(valid) > 0
    assert np.all(mask[valid])

    # recall vs filtered brute force
    scores_bf = -((queries[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    scores_bf[:, ~mask] = -np.inf
    truth = np.argsort(-scores_bf, axis=1)[:, :k]
    r = recall(ids, truth)
    assert r >= 0.93, f"filtered recall {r} too low"


def test_hnsw_save_load(tmp_path):
    rng = np.random.default_rng(2)
    n, d = 800, 16
    data = rng.normal(size=(n, d)).astype(np.float32)
    store = DenseVectorStore(d, Distance.COSINE)
    store.add(data)
    cfg = HnswConfig(m=8, ef_construct=48)
    idx = HnswIndex(store, cfg, seed=3)
    idx.build(batch_size=128)
    idx.save(str(tmp_path))

    loaded = HnswIndex.load(str(tmp_path), store, cfg)
    q = rng.normal(size=(4, d)).astype(np.float32)
    s1, i1 = idx.search(q, k=5, ef=64)
    s2, i2 = loaded.search(q, k=5, ef=64)
    np.testing.assert_array_equal(i1, i2)


def test_hnsw_with_deleted_points():
    rng = np.random.default_rng(3)
    n, d = 1000, 16
    data = rng.normal(size=(n, d)).astype(np.float32)
    store = DenseVectorStore(d, Distance.EUCLID)
    store.add(data)
    for off in range(0, 100):
        store.delete(off)
    idx = HnswIndex(store, HnswConfig(m=8, ef_construct=48), seed=4)
    idx.build(batch_size=128)
    q = rng.normal(size=(4, d)).astype(np.float32)
    _, ids = idx.search(q, k=10, ef=64)
    valid = ids[ids >= 0]
    assert np.all(valid >= 100)  # deleted points never in the graph


def test_device_build_path_with_refine(monkeypatch):
    """The device-resident builder (ops/hnsw_build.py, forced onto the CPU
    backend) + default refine pass reaches near-gold recall on iid-gaussian
    data — the graph-quality worst case (A/B in ARCHITECTURE.md)."""
    monkeypatch.setenv("QDRANT_TPU_DEVICE_BUILD", "force")
    rng = np.random.default_rng(11)
    n, d = 3000, 32
    data = rng.standard_normal((n, d), dtype=np.float32)
    q = rng.standard_normal((64, d), dtype=np.float32)
    store = DenseVectorStore(d, Distance.EUCLID)
    store.add(data)
    idx = HnswIndex(store, HnswConfig(m=8, ef_construct=64), seed=7)
    idx.build(batch_size=512)
    truth = brute_topk(q, data, 10, Distance.EUCLID)
    _, ids = idx.search(q, k=10, ef=96)
    assert recall(ids, truth) >= 0.93  # measured 0.977
