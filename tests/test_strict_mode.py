import numpy as np
import pytest

from qdrant_tpu.collection.collection import Collection
from qdrant_tpu.collection.query import QueryExecutor, QueryRequest
from qdrant_tpu.types import (
    CollectionParams,
    Distance,
    StrictModeConfig,
    StrictModeError,
    VectorParams,
)


@pytest.fixture
def coll(tmp_path):
    params = CollectionParams(
        vectors={"": VectorParams(size=8, distance=Distance.DOT)}
    )
    c = Collection(
        "s",
        str(tmp_path / "c"),
        params,
        strict_mode_config=StrictModeConfig(
            enabled=True,
            max_query_limit=50,
            upsert_max_batchsize=10,
            search_max_hnsw_ef=256,
            unindexed_filtering_retrieve=False,
            filter_max_conditions=2,
            max_points_count=100,
        ),
    )
    rng = np.random.default_rng(0)
    data = rng.normal(size=(8, 8)).astype(np.float32)
    c.upsert([{"id": i, "vectors": {"": data[i].tolist()}} for i in range(8)])
    yield c
    c.close()


def test_upsert_batch_limit(coll):
    with pytest.raises(StrictModeError):
        coll.upsert(
            [{"id": 100 + i, "vectors": {"": [0.0] * 8}} for i in range(11)]
        )


def test_query_limit(coll):
    ex = QueryExecutor(coll)
    with pytest.raises(StrictModeError):
        ex.query(QueryRequest({"query": [0.0] * 8, "limit": 100}))
    ex.query(QueryRequest({"query": [0.0] * 8, "limit": 10}))  # ok


def test_hnsw_ef_limit(coll):
    ex = QueryExecutor(coll)
    with pytest.raises(StrictModeError):
        ex.query(
            QueryRequest(
                {"query": [0.0] * 8, "limit": 5, "params": {"hnsw_ef": 1000}}
            )
        )


def test_unindexed_filter_rejected(coll):
    ex = QueryExecutor(coll)
    with pytest.raises(StrictModeError):
        ex.query(
            QueryRequest(
                {
                    "query": [0.0] * 8,
                    "limit": 5,
                    "filter": {"must": [{"key": "city", "match": {"value": "x"}}]},
                }
            )
        )
    # after indexing the field it passes
    from qdrant_tpu.types import PayloadIndexParams, PayloadSchemaType

    coll.create_payload_index(
        "city", PayloadIndexParams(type=PayloadSchemaType.KEYWORD)
    )
    ex.query(
        QueryRequest(
            {
                "query": [0.0] * 8,
                "limit": 5,
                "filter": {"must": [{"key": "city", "match": {"value": "x"}}]},
            }
        )
    )


def test_filter_condition_count(coll):
    from qdrant_tpu.types import PayloadIndexParams, PayloadSchemaType

    coll.create_payload_index("a", PayloadIndexParams(type=PayloadSchemaType.KEYWORD))
    coll.create_payload_index("b", PayloadIndexParams(type=PayloadSchemaType.KEYWORD))
    coll.create_payload_index("c", PayloadIndexParams(type=PayloadSchemaType.KEYWORD))
    ex = QueryExecutor(coll)
    with pytest.raises(StrictModeError):
        ex.query(
            QueryRequest(
                {
                    "query": [0.0] * 8,
                    "limit": 5,
                    "filter": {
                        "must": [
                            {"key": "a", "match": {"value": 1}},
                            {"key": "b", "match": {"value": 1}},
                            {"key": "c", "match": {"value": 1}},
                        ]
                    },
                }
            )
        )


def test_strict_persisted(coll, tmp_path):
    coll.flush()
    loaded = Collection.load("s", coll.path)
    assert loaded.strict_mode_config.enabled
    assert loaded.strict_mode_config.max_query_limit == 50
    loaded.close()


def test_strict_mode_rate_limits(tmp_path):
    from qdrant_tpu.api.toc import TableOfContent
    from qdrant_tpu.types import RateLimitError

    toc = TableOfContent(str(tmp_path / "s"))
    toc.create_collection(
        "rl",
        {
            "vectors": {"size": 4, "distance": "Dot"},
            "strict_mode_config": {"enabled": True, "read_rate_limit": 2,
                                   "write_rate_limit": 3},
        },
    )
    coll = toc.get_collection("rl")
    coll.upsert([{"id": 1, "vectors": {"": [1, 0, 0, 0]}}])
    coll.upsert([{"id": 2, "vectors": {"": [0, 1, 0, 0]}}])
    with pytest.raises(RateLimitError):  # 4th write token unavailable
        coll.upsert([{"id": 3, "vectors": {"": [0, 0, 1, 0]}},
                     {"id": 4, "vectors": {"": [0, 0, 0, 1]}}])
    coll.check_strict_query(1, None, False, None)
    coll.check_strict_query(1, None, False, None)
    with pytest.raises(RateLimitError):
        coll.check_strict_query(1, None, False, None)
    assert RateLimitError.status_code == 429
    toc.close()


def test_strict_mode_search_batch_limit(tmp_path):
    from qdrant_tpu.api.rest import _check_batchsize
    from qdrant_tpu.api.toc import TableOfContent
    from qdrant_tpu.types import StrictModeError

    toc = TableOfContent(str(tmp_path / "s"))
    toc.create_collection(
        "sb",
        {
            "vectors": {"size": 4, "distance": "Dot"},
            "strict_mode_config": {"enabled": True, "search_max_batchsize": 2},
        },
    )
    coll = toc.get_collection("sb")
    _check_batchsize(coll, 2)
    with pytest.raises(StrictModeError):
        _check_batchsize(coll, 3)
    toc.close()
