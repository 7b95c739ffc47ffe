"""Array-native bulk ingest (the product path for loading millions of
vectors): parity with per-point upserts, persistence across restart, and
duplicate-id rejection."""

import numpy as np
import pytest

from qdrant_tpu.collection.collection import Collection
from qdrant_tpu.types import CollectionParams, Distance, VectorParams


def _params(d=16):
    return CollectionParams(
        vectors={"": VectorParams(size=d, distance=Distance.EUCLID)},
        sparse_vectors={},
    )


def test_bulk_ingest_matches_upsert(tmp_path):
    rng = np.random.default_rng(0)
    d, n = 16, 500
    data = rng.normal(size=(n, d)).astype(np.float32)
    qs = data[rng.integers(0, n, 8)] + 0.01

    coll_a = Collection("a", str(tmp_path / "a"), _params(d))
    coll_a.upsert([{"id": i, "vector": data[i].tolist()} for i in range(n)])
    coll_b = Collection("b", str(tmp_path / "b"), _params(d))
    coll_b.bulk_ingest(list(range(n)), {"": data})

    assert coll_b.count(None) == n
    res_a = coll_a.search_dense("", qs, 5)
    res_b = coll_b.search_dense("", qs, 5)
    for ra, rb in zip(res_a, res_b):
        assert [p for _, p, _ in ra] == [p for _, p, _ in rb]

    # retrieval works (id tracker linked)
    rec = coll_b.get_payload_and_vectors(123)
    assert rec is not None


def test_bulk_ingest_with_payloads_and_filter(tmp_path):
    rng = np.random.default_rng(1)
    d, n = 8, 300
    data = rng.normal(size=(n, d)).astype(np.float32)
    payloads = [{"color": "red" if i % 3 == 0 else "blue"} for i in range(n)]
    coll = Collection("p", str(tmp_path / "p"), _params(d))
    coll.bulk_ingest(list(range(n)), {"": data}, payloads=payloads)
    from qdrant_tpu.types import parse_filter

    flt = parse_filter({"must": [{"key": "color", "match": {"value": "red"}}]})
    res = coll.search_dense("", data[:4], 10, flt=flt)
    assert all(pid % 3 == 0 for r in res for _, pid, _ in r)
    assert coll.count(flt) == len([p for p in payloads if p["color"] == "red"])


def test_bulk_ingest_persists(tmp_path):
    rng = np.random.default_rng(2)
    d, n = 8, 200
    data = rng.normal(size=(n, d)).astype(np.float32)
    path = str(tmp_path / "r")
    coll = Collection("r", path, _params(d))
    coll.bulk_ingest(list(range(n)), {"": data})
    for shard in coll.shards.values():
        shard.close()

    coll2 = Collection("r", path, _params(d))
    assert coll2.count(None) == n
    res = coll2.search_dense("", data[5:6], 1)
    assert res[0][0][1] == 5


def test_bulk_ingest_rejects_duplicates(tmp_path):
    rng = np.random.default_rng(3)
    d = 8
    data = rng.normal(size=(10, d)).astype(np.float32)
    coll = Collection("d", str(tmp_path / "d"), _params(d))
    coll.bulk_ingest(list(range(10)), {"": data})
    from qdrant_tpu.collection.shard import ShardUpdateError

    with pytest.raises(ShardUpdateError):
        coll.bulk_ingest([5, 100], {"": data[:2]})
