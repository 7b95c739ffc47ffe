"""Sparse recall with hot-term posting truncation: the windowed pass alone
mis-ranks points whose contributions fall outside the 4096-posting windows;
the exact candidate rescore (and the chunked-exact mode) recover them.
Reference semantics: lib/sparse/src/index/search_context.rs exact merge."""

import os

import numpy as np
import pytest

from qdrant_tpu.index.sparse import SparseIndex, SparseVectorStore
from qdrant_tpu.types import SparseVector


@pytest.fixture
def hot_term_index():
    rng = np.random.default_rng(7)
    n, vocab = 20_000, 300
    # tiny vocabulary → every term's postings vastly exceed the window
    store = SparseVectorStore()
    vecs = []
    for _ in range(n):
        terms = rng.choice(vocab, size=8, replace=False)
        w = np.abs(rng.normal(1.0, 0.5, size=8)).astype(np.float32) + 0.01
        vecs.append(SparseVector(sorted(terms.tolist()), w.tolist()))
    store.add(vecs)
    idx = SparseIndex(store)
    queries = []
    for _ in range(16):
        terms = rng.choice(vocab, size=6, replace=False)
        w = np.abs(rng.normal(1.0, 0.5, size=6)).astype(np.float32)
        queries.append(SparseVector(sorted(terms.tolist()), w.tolist()))
    # exact truth on host
    truth = []
    for q in queries:
        acc = np.zeros(n, np.float32)
        for off, idxs, vals in store.iter_rows():
            s = 0.0
            qmap = dict(zip(q.indices, q.values))
            for d, v in zip(idxs.tolist(), vals.tolist()):
                if d in qmap:
                    s += qmap[d] * v
            acc[off] = s
        truth.append(np.argsort(-acc)[:10])
    return idx, queries, np.asarray(truth)


def _recall(ids, truth):
    hits = sum(
        len(set(ids[i].tolist()) & set(truth[i].tolist()))
        for i in range(len(truth))
    )
    return hits / truth.size


def test_rescore_recovers_windowed_loss(hot_term_index, monkeypatch):
    idx, queries, truth = hot_term_index
    window = 256  # force heavy truncation at this scale

    monkeypatch.setenv("QDRANT_TPU_SPARSE_RESCORE", "0")
    _, ids_win = idx.search(queries, k=10, window=window)
    r_win = _recall(ids_win, truth)

    monkeypatch.setenv("QDRANT_TPU_SPARSE_RESCORE", "1")
    _, ids_resc = idx.search(queries, k=10, window=window)
    r_resc = _recall(ids_resc, truth)

    assert r_resc >= r_win
    assert r_resc >= 0.9, (r_win, r_resc)


def test_exact_chunked_matches_truth(hot_term_index, monkeypatch):
    idx, queries, truth = hot_term_index
    monkeypatch.setenv("QDRANT_TPU_SPARSE_EXACT", "1")
    scores, ids = idx.search(queries, k=10, window=256)
    assert _recall(ids, truth) == 1.0
