"""Multivector (ColBERT max-sim) end-to-end (style of reference
multivector_hnsw_test.rs, via the brute max-sim path)."""

import numpy as np

from qdrant_tpu.collection.collection import Collection
from qdrant_tpu.collection.query import QueryExecutor, QueryRequest
from qdrant_tpu.types import (
    CollectionParams,
    Distance,
    MultiVectorComparator,
    VectorParams,
)


def test_multivector_collection_query(tmp_path):
    params = CollectionParams(
        vectors={
            "colbert": VectorParams(
                size=8,
                distance=Distance.DOT,
                multivector_config=MultiVectorComparator.MAX_SIM,
            )
        }
    )
    c = Collection("mv", str(tmp_path / "mv"), params)
    rng = np.random.default_rng(0)
    points = []
    mats = []
    for i in range(20):
        t = rng.integers(2, 6)
        mat = rng.normal(size=(t, 8)).astype(np.float32)
        mats.append(mat)
        points.append({"id": i, "vectors": {"colbert": mat.tolist()}})
    c.upsert(points)
    assert c.count() == 20

    # query with point 7's own token matrix → top hit is 7
    ex = QueryExecutor(c)
    out = ex.query(
        QueryRequest(
            {"query": {"nearest": mats[7].tolist()}, "using": "colbert", "limit": 3}
        )
    )
    assert out[0]["id"] == 7

    # brute-force max-sim cross-check for a random query
    q = rng.normal(size=(3, 8)).astype(np.float32)
    out = ex.query(
        QueryRequest({"query": {"nearest": q.tolist()}, "using": "colbert", "limit": 5})
    )
    def maxsim(qm, vm):
        return (qm @ vm.T).max(axis=1).sum()
    want = sorted(range(20), key=lambda i: -maxsim(q, mats[i]))[:5]
    got = [o["id"] for o in out]
    assert got == want

    # retrieval returns the token matrix
    ex2 = ex.query(
        QueryRequest(
            {"query": {"nearest": q.tolist()}, "using": "colbert", "limit": 1,
             "with_vector": True}
        )
    )
    vec = ex2[0]["vector"]["colbert"]  # named vector → dict keyed by name
    assert isinstance(vec, list) and isinstance(vec[0], list)
    c.close()


def test_multivector_hnsw_proxy_graph(tmp_path):
    """Large multivector segments search via the pooled-proxy graph + exact
    max-sim rescore; results match the brute max-sim scan."""
    import numpy as np

    from qdrant_tpu.storage.segment import Segment
    from qdrant_tpu.types import (
        CollectionParams,
        Distance,
        HnswConfig,
        MultiVectorComparator,
        VectorParams,
    )

    rng = np.random.default_rng(3)
    n, d = 600, 16
    params = CollectionParams(
        vectors={
            "": VectorParams(
                size=d,
                distance=Distance.COSINE,
                multivector_config=MultiVectorComparator.MAX_SIM,
                hnsw_config=HnswConfig(m=8, ef_construct=64, full_scan_threshold=100),
            )
        }
    )
    seg = Segment(params)
    docs = []
    for i in range(n):
        t = int(rng.integers(2, 6))
        base = rng.standard_normal(d).astype(np.float32)
        doc = base[None, :] + 0.1 * rng.standard_normal((t, d)).astype(np.float32)
        docs.append(doc)
        seg.upsert_point(i + 1, i, {"": doc})
    seg.build_indexes()
    assert "" in seg.hnsw_multi

    q = docs[42] + 0.01 * rng.standard_normal(docs[42].shape).astype(np.float32)
    s, ids = seg.search_multi("", q, k=5)
    assert ids[0, 0] == 42

    # brute agreement on top-5 (drop the graph to force the scan)
    graph = seg.hnsw_multi.pop("")
    s2, ids2 = seg.search_multi("", q, k=5)
    assert set(ids[0].tolist()) & set(ids2[0].tolist()) >= set(ids2[0][:3].tolist())
    seg.hnsw_multi[""] = graph

    # persistence round trip
    seg.save(str(tmp_path / "seg"))
    loaded = Segment.load(str(tmp_path / "seg"))
    assert "" in loaded.hnsw_multi
    s3, ids3 = loaded.search_multi("", q, k=5)
    assert ids3[0, 0] == 42
