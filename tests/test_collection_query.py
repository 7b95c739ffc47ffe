import numpy as np
import pytest

from qdrant_tpu.collection.collection import Collection
from qdrant_tpu.collection.query import QueryExecutor, QueryRequest
from qdrant_tpu.types import (
    CollectionParams,
    Distance,
    SparseVectorParams,
    VectorParams,
    parse_filter,
)


@pytest.fixture
def coll(tmp_path):
    params = CollectionParams(
        vectors={
            "": VectorParams(size=8, distance=Distance.COSINE),
            "named": VectorParams(size=4, distance=Distance.EUCLID),
        },
        sparse_vectors={"sp": SparseVectorParams()},
        shard_number=2,
    )
    c = Collection("test", str(tmp_path / "c"), params)
    rng = np.random.default_rng(0)
    data = rng.normal(size=(40, 8)).astype(np.float32)
    named = rng.normal(size=(40, 4)).astype(np.float32)
    points = []
    for i in range(40):
        points.append(
            {
                "id": i,
                "vectors": {
                    "": data[i].tolist(),
                    "named": named[i].tolist(),
                    "sp": {"indices": [i % 5, 10 + i % 3], "values": [1.0, 2.0]},
                },
                "payload": {"group": f"g{i % 4}", "rank": i},
            }
        )
    c.upsert(points)
    c._test_data = data
    c._test_named = named
    yield c
    c.close()


def test_collection_sharded_search(coll):
    data = coll._test_data
    res = coll.search_dense("", data[:5], k=1)
    assert [r[0][1] for r in res] == [0, 1, 2, 3, 4]
    assert coll.count() == 40


def test_query_nearest_with_filter(coll):
    ex = QueryExecutor(coll)
    req = QueryRequest(
        {
            "query": coll._test_data[7].tolist(),
            "filter": {"must": [{"key": "group", "match": {"value": "g3"}}]},
            "limit": 5,
            "with_payload": True,
        }
    )
    out = ex.query(req)
    assert out[0]["id"] == 7
    assert all(o["payload"]["group"] == "g3" for o in out)


def test_query_by_point_id(coll):
    ex = QueryExecutor(coll)
    out = ex.query(QueryRequest({"query": 3, "limit": 3}))
    # point 3 itself is excluded
    assert all(o["id"] != 3 for o in out)


def test_query_sparse(coll):
    ex = QueryExecutor(coll)
    out = ex.query(
        QueryRequest(
            {"query": {"indices": [0, 10], "values": [1.0, 1.0]}, "using": "sp", "limit": 40}
        )
    )
    assert out  # ids with i%5==0 or i%3==0 present
    ids = [o["id"] for o in out]
    assert all(i % 5 == 0 or i % 3 == 0 for i in ids)


def test_query_fusion_rrf(coll):
    ex = QueryExecutor(coll)
    out = ex.query(
        QueryRequest(
            {
                "prefetch": [
                    {"query": coll._test_data[1].tolist(), "limit": 10},
                    {
                        "query": {"indices": [1], "values": [1.0]},
                        "using": "sp",
                        "limit": 10,
                    },
                ],
                "query": {"fusion": "rrf"},
                "limit": 5,
            }
        )
    )
    assert len(out) == 5


def test_query_prefetch_rescore(coll):
    ex = QueryExecutor(coll)
    out = ex.query(
        QueryRequest(
            {
                "prefetch": [{"query": coll._test_data[2].tolist(), "limit": 20}],
                "query": {"nearest": coll._test_named[2].tolist()},
                "using": "named",
                "limit": 5,
            }
        )
    )
    assert out[0]["id"] == 2  # rescoring by named vector puts 2 on top


def test_query_recommend_average(coll):
    ex = QueryExecutor(coll)
    out = ex.query(
        QueryRequest({"query": {"recommend": {"positive": [5, 6]}}, "limit": 5})
    )
    ids = [o["id"] for o in out]
    assert 5 not in ids and 6 not in ids


def test_query_recommend_best_score(coll):
    ex = QueryExecutor(coll)
    out = ex.query(
        QueryRequest(
            {
                "query": {
                    "recommend": {
                        "positive": [5],
                        "negative": [9],
                        "strategy": "best_score",
                    }
                },
                "limit": 5,
            }
        )
    )
    assert len(out) == 5


def test_query_discover_and_context(coll):
    ex = QueryExecutor(coll)
    out = ex.query(
        QueryRequest(
            {
                "query": {
                    "discover": {
                        "target": 4,
                        "context": [{"positive": 1, "negative": 2}],
                    }
                },
                "limit": 5,
            }
        )
    )
    assert len(out) == 5
    out2 = ex.query(
        QueryRequest(
            {
                "query": {"context": [{"positive": 1, "negative": 2}]},
                "limit": 5,
            }
        )
    )
    assert len(out2) == 5
    assert all(o["score"] <= 0 for o in out2)  # context scores are ≤ 0


def test_query_order_by(coll):
    ex = QueryExecutor(coll)
    out = ex.query(
        QueryRequest({"query": {"order_by": {"key": "rank", "direction": "desc"}}, "limit": 3})
    )
    assert [o["id"] for o in out] == [39, 38, 37]


def test_query_mmr(coll):
    ex = QueryExecutor(coll)
    out = ex.query(
        QueryRequest(
            {
                "query": {
                    "nearest": coll._test_data[0].tolist(),
                    "mmr": {"diversity": 0.5, "candidates_limit": 20},
                },
                "limit": 5,
            }
        )
    )
    assert len(out) == 5


def test_query_formula(coll):
    ex = QueryExecutor(coll)
    out = ex.query(
        QueryRequest(
            {
                "prefetch": [{"query": coll._test_data[0].tolist(), "limit": 10}],
                "query": {
                    "formula": {"sum": ["$score", {"mult": [0.1, "rank"]}]},
                },
                "limit": 10,
            }
        )
    )
    assert len(out) == 10
    # high-rank points boosted
    assert out[0]["id"] == max(o["id"] for o in out)


def test_query_groups(coll):
    ex = QueryExecutor(coll)
    req = QueryRequest(
        {
            "query": coll._test_data[0].tolist(),
            "group_by": "group",
            "limit": 4,
            "group_size": 2,
        }
    )
    groups = ex.query_groups(req)
    assert len(groups) == 4
    for g in groups:
        assert 1 <= len(g["hits"]) <= 2


def test_facet_and_scroll(coll):
    facets = coll.facet("group", limit=10)
    assert sorted(v for v, _ in facets) == ["g0", "g1", "g2", "g3"]
    assert all(c == 10 for _, c in facets)
    ids = coll.scroll_ids(limit=7)
    assert ids == [0, 1, 2, 3, 4, 5, 6]


def test_collection_save_load(coll, tmp_path):
    coll.flush()
    loaded = Collection.load("test", coll.path)
    assert loaded.count() == 40
    res = loaded.search_dense("", coll._test_data[:2], k=1)
    assert [r[0][1] for r in res] == [0, 1]
    loaded.close()


def test_collection_snapshot(coll, tmp_path):
    snap_dir = str(tmp_path / "snaps")
    fname = coll.create_snapshot(snap_dir)
    restored = Collection.restore_snapshot(
        str(tmp_path / "snaps" / fname), "restored", str(tmp_path / "restored")
    )
    assert restored.count() == 40
    restored.close()


def test_integer_vector_literal_not_treated_as_ids(coll):
    """Regression: a query vector with integer components (e.g. [1,0,...])
    must not exclude points with those ids from the results."""
    ex = QueryExecutor(coll)
    v = coll._test_data[1]
    q = [int(round(float(x))) for x in v]  # all-int literal vector
    out = ex.query(QueryRequest({"query": q, "limit": 3}))
    ids = [o["id"] for o in out]
    # nearest neighbor of (rounded) vector 1 should still include point 1
    assert 1 in ids or 0 in ids or len(ids) == 3  # and nothing was excluded
    out_full = ex.query(QueryRequest({"query": v.tolist(), "limit": 40}))
    assert len(out_full) == 40  # no spurious exclusions


def test_resharding_moves_points(tmp_path):
    params = CollectionParams(
        vectors={"": VectorParams(size=8, distance=Distance.COSINE)},
        shard_number=2,
    )
    c = Collection("rs", str(tmp_path / "rs"), params)
    rng = np.random.default_rng(11)
    data = rng.normal(size=(60, 8)).astype(np.float32)
    c.upsert(
        [{"id": i, "vectors": {"": data[i].tolist()}, "payload": {"i": i}} for i in range(60)]
    )
    moved = c.reshard(4)
    assert len(c.shards) == 4
    assert c.count() == 60
    assert moved > 0
    # every point routes to the shard that now holds it
    for i in range(60):
        target = c.ring.get(i)
        assert c.shards[target]._find_point(i) is not None
    res = c.search_dense("", data[:3], k=1)
    assert [r[0][1] for r in res] == [0, 1, 2]
    # scale down
    c.reshard(2)
    assert len(c.shards) == 2 and c.count() == 60
    c.close()


def test_facet_indexed_matches_scan_path(coll):
    """The postings-backed facet fast path must agree with the payload-scan
    fallback, including under filters and after deletes."""
    from qdrant_tpu.types import PayloadIndexParams, PayloadSchemaType

    rank_lt20 = parse_filter({"must": [{"key": "rank", "range": {"lt": 20}}]})
    scan = coll.facet("group", limit=10)
    scan_f = coll.facet("group", limit=10, flt=rank_lt20)
    coll.create_payload_index(
        "group", PayloadIndexParams(type=PayloadSchemaType.KEYWORD)
    )
    idx = coll.facet("group", limit=10)
    idx_f = coll.facet("group", limit=10, flt=rank_lt20)
    assert sorted(idx) == sorted(scan)
    assert sorted(idx_f) == sorted(scan_f)
    assert sum(c for _, c in idx_f) == 20
    # deletes reflect immediately in the indexed counts
    before = dict(coll.facet("group", limit=10))
    victim = coll.scroll_ids(1)[0]
    coll.update_op({"type": "delete", "ids": [victim]})
    after = dict(coll.facet("group", limit=10))
    assert sum(after.values()) == sum(before.values()) - 1
