import numpy as np

from qdrant_tpu.index.plain import PlainIndex
from qdrant_tpu.storage.vectors import DenseVectorStore
from qdrant_tpu.types import Datatype, Distance


def test_plain_search_recall_exact():
    rng = np.random.default_rng(0)
    n, d = 2000, 64
    data = rng.normal(size=(n, d)).astype(np.float32)
    store = DenseVectorStore(d, Distance.COSINE)
    store.add(data)
    idx = PlainIndex(store)

    queries = rng.normal(size=(8, d)).astype(np.float32)
    scores, ids = idx.search(queries, k=10)

    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    vn = data / np.linalg.norm(data, axis=1, keepdims=True)
    want = np.argsort(-(qn @ vn.T), axis=1)[:, :10]
    # allow tie reordering: compare as sets
    for b in range(8):
        assert set(ids[b].tolist()) == set(want[b].tolist())


def test_plain_search_with_deletes_and_filter():
    rng = np.random.default_rng(1)
    n, d = 500, 32
    data = rng.normal(size=(n, d)).astype(np.float32)
    store = DenseVectorStore(d, Distance.DOT)
    store.add(data)
    store.delete(3)
    store.delete(7)
    idx = PlainIndex(store)

    mask = np.zeros(n, dtype=bool)
    mask[:50] = True
    scores, ids = idx.search(data[:2], k=5, filter_mask=mask)
    valid_ids = ids[ids >= 0]
    assert np.all(valid_ids < 50)
    assert 3 not in valid_ids and 7 not in valid_ids
    # top hit for query i should be i itself (dot with itself is large, usually)
    assert ids[0, 0] == 0 or 0 in ids[0]


def test_plain_search_k_larger_than_n():
    rng = np.random.default_rng(2)
    store = DenseVectorStore(8, Distance.EUCLID)
    store.add(rng.normal(size=(5, 8)).astype(np.float32))
    idx = PlainIndex(store)
    scores, ids = idx.search(rng.normal(size=(1, 8)), k=10)
    assert ids.shape == (1, 10)
    assert (ids >= 0).sum() == 5


def test_store_grows_and_persists(tmp_path):
    rng = np.random.default_rng(3)
    store = DenseVectorStore(16, Distance.COSINE, Datatype.FLOAT32)
    for _ in range(5):
        store.add(rng.normal(size=(300, 16)).astype(np.float32))
    assert len(store) == 1500
    store.delete(10)
    store.save(str(tmp_path))
    loaded = DenseVectorStore.load(str(tmp_path), 16, Distance.COSINE, Datatype.FLOAT32)
    assert len(loaded) == 1500
    assert loaded.deleted_count == 1
    np.testing.assert_allclose(loaded.get(42), store.get(42))


def test_search_many_matches_search():
    rng = np.random.default_rng(4)
    store = DenseVectorStore(32, Distance.EUCLID)
    store.add(rng.normal(size=(800, 32)).astype(np.float32))
    idx = PlainIndex(store)
    batches = [rng.normal(size=(b, 32)).astype(np.float32) for b in (7, 16, 3)]
    many = idx.search_many(batches, k=5)
    assert len(many) == 3
    for q, (s_m, i_m) in zip(batches, many):
        s1, i1 = idx.search(q, k=5)
        np.testing.assert_array_equal(i_m, i1)
        np.testing.assert_allclose(s_m, s1, rtol=1e-5)


def test_search_many_with_filter_and_device_store():
    rng = np.random.default_rng(5)
    data = rng.normal(size=(600, 16)).astype(np.float32)
    store = DenseVectorStore(16, Distance.DOT)
    store.add(data)
    idx = PlainIndex(store)
    mask = np.zeros(600, dtype=bool)
    mask[:200] = True
    [(s, ids)] = idx.search_many([data[:4]], k=3, filter_mask=mask)
    assert np.all(ids[ids >= 0] < 200)
