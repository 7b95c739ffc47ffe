"""Hybrid sparse search (hot-dense MXU + cold-sparse scatter) must agree
with the bit-exact chunked mode. Reference semantics:
lib/sparse/src/index/search_context.rs exact posting merge."""

import numpy as np
import pytest

from qdrant_tpu.index.sparse import SparseIndex, SparseVectorStore
from qdrant_tpu.types import SparseVector


def _zipf_store(rng, n, vocab, nnz=12):
    p = 1.0 / np.arange(1, vocab + 1) ** 0.9
    p /= p.sum()
    store = SparseVectorStore()
    vecs = []
    for _ in range(n):
        terms = np.unique(rng.choice(vocab, size=nnz, p=p))
        w = np.abs(rng.normal(1.0, 0.5, size=len(terms))).astype(np.float32) + 0.01
        vecs.append(SparseVector(terms.tolist(), w.tolist()))
    store.add(vecs)
    return store


def _queries(rng, vocab, b=16, nnz=8):
    p = 1.0 / np.arange(1, vocab + 1) ** 0.9
    p /= p.sum()
    out = []
    for _ in range(b):
        terms = np.unique(rng.choice(vocab, size=nnz, p=p))
        w = np.abs(rng.normal(1.0, 0.5, size=len(terms))).astype(np.float32)
        out.append(SparseVector(terms.tolist(), w.tolist()))
    return out


def _recall(ids, truth):
    hits = sum(
        len(set(ids[i][ids[i] >= 0].tolist()) & set(truth[i].tolist()))
        for i in range(len(truth))
    )
    return hits / truth.size


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    n, vocab = 30_000, 500
    store = _zipf_store(rng, n, vocab)
    queries = _queries(rng, vocab)
    return store, queries


def test_hybrid_matches_exact(corpus, monkeypatch):
    store, queries = corpus
    k = 10
    # exact truth via the bit-exact chunked mode
    monkeypatch.setenv("QDRANT_TPU_SPARSE_EXACT", "1")
    idx = SparseIndex(store)
    _, truth = idx.search(queries, k=k)
    monkeypatch.delenv("QDRANT_TPU_SPARSE_EXACT")

    # small hot budget → H=128 < U=500 so BOTH hot and cold paths exercise
    monkeypatch.setenv(
        "QDRANT_TPU_SPARSE_HOT_BYTES", str(4 * 32768 * 128)
    )
    idx2 = SparseIndex(store)
    assert idx2._hot_device() is not None
    hot_cols = int((idx2._hot[1] >= 0).sum())
    assert 0 < hot_cols < 500  # genuine hot/cold split
    scores, ids = idx2.search(queries, k=k)
    assert _recall(ids, truth) >= 0.98  # bf16 hot part may flip near-ties

    # scores are exact (f32 forward-row rescore inside the program)
    monkeypatch.setenv("QDRANT_TPU_SPARSE_EXACT", "1")
    s_exact, _ = idx.search(queries, k=k)
    np.testing.assert_allclose(scores[:, 0], s_exact[:, 0], rtol=1e-5)


def test_hybrid_all_hot(corpus, monkeypatch):
    """Big budget → every term hot; cold tensors stay empty padding."""
    store, queries = corpus
    monkeypatch.setenv("QDRANT_TPU_SPARSE_EXACT", "1")
    idx = SparseIndex(store)
    _, truth = idx.search(queries, k=10)
    monkeypatch.delenv("QDRANT_TPU_SPARSE_EXACT")

    idx2 = SparseIndex(store)
    assert idx2._hot_device() is not None
    _, ids = idx2.search(queries, k=10)
    assert _recall(ids, truth) >= 0.98


def test_hybrid_filter_mask(corpus):
    store, queries = corpus
    n = len(store)
    rng = np.random.default_rng(3)
    mask = rng.random(n) < 0.3
    idx = SparseIndex(store)
    if idx._hot_device() is None:
        pytest.skip("store below hybrid threshold")
    _, ids = idx.search(queries, k=10, filter_mask=mask)
    valid = ids[ids >= 0]
    assert np.all(mask[valid])


def test_hybrid_idf_modifier(corpus, monkeypatch):
    store, queries = corpus
    monkeypatch.setenv("QDRANT_TPU_SPARSE_EXACT", "1")
    idx = SparseIndex(store, modifier="idf")
    _, truth = idx.search(queries, k=10)
    monkeypatch.delenv("QDRANT_TPU_SPARSE_EXACT")

    idx2 = SparseIndex(store, modifier="idf")
    assert idx2._hot_device() is not None
    _, ids = idx2.search(queries, k=10)
    assert _recall(ids, truth) >= 0.97


def test_packed_csr_retention_matches_raw(corpus, monkeypatch):
    """Above QDRANT_TPU_SPARSE_PACK_MIN the host CSR ids are retained
    bitpacked only (index/postings.py); searches must be identical and
    the decoded flats exact."""
    store, queries = corpus

    raw = SparseIndex(store)
    monkeypatch.setenv("QDRANT_TPU_SPARSE_PACK_MIN", "1000000000")
    raw._device()
    assert raw._packed is None
    s_raw, i_raw = raw.search(queries, k=10)

    packed = SparseIndex(store)
    monkeypatch.setenv("QDRANT_TPU_SPARSE_PACK_MIN", "1")
    packed._device()
    assert packed._packed is not None
    assert packed._csr_host[0] is None  # raw ids dropped
    s_p, i_p = packed.search(queries, k=10)

    np.testing.assert_array_equal(i_raw, i_p)
    np.testing.assert_allclose(s_raw, s_p, rtol=1e-5)

    # decoded flats match the raw build exactly
    fi_raw, fw_raw = raw._csr_flats()
    fi_p, fw_p = packed._csr_flats()
    np.testing.assert_array_equal(fi_raw, fi_p)
    np.testing.assert_array_equal(fw_raw, fw_p)

    # memory accounting sees the packed payload, and it beats raw ids
    mem = packed.memory_usage_bytes()
    assert mem["host_bytes"] > 0
    assert packed._packed.packed_nbytes < fi_raw.nbytes


def test_search_many_matches_search(corpus):
    """Pipelined search_many (one device sync for the whole window) must
    return exactly what per-batch search returns."""
    store, queries = corpus
    idx = SparseIndex(store)
    k = 10
    batches = [queries[:6], queries[6:11], [], queries[11:]]
    want = [idx.search(b, k=k) if b else None for b in batches]
    got = idx.search_many(batches, k=k)
    assert len(got) == len(batches)
    for g, w, b in zip(got, want, batches):
        if not b:
            assert g[0].shape == (0, k) and g[1].shape == (0, k)
            continue
        np.testing.assert_array_equal(g[1], w[1])
        np.testing.assert_allclose(g[0], w[0], rtol=1e-5)


def test_search_many_with_filter(corpus):
    store, queries = corpus
    idx = SparseIndex(store)
    k = 10
    mask = np.zeros(len(store), dtype=bool)
    mask[::3] = True
    got = idx.search_many([queries[:4], queries[4:8]], k=k, filter_mask=mask)
    for scores, ids in got:
        live = ids[ids >= 0]
        assert live.size
        assert all(mask[i] for i in live.tolist())
