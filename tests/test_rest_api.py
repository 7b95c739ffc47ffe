"""REST black-box tests (style of reference tests/openapi pytest suite)."""

import json
import urllib.request

import numpy as np
import pytest

from qdrant_tpu.api.rest import RestServer
from qdrant_tpu.api.toc import TableOfContent


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    toc = TableOfContent(str(tmp_path_factory.mktemp("storage")))
    srv = RestServer(toc, port=0)
    srv.start_background()
    yield srv
    srv.shutdown()
    toc.close()


def call(server, method, path, body=None, expect=200):
    url = f"http://127.0.0.1:{server.port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
            assert resp.status == expect, out
            return out
    except urllib.error.HTTPError as e:
        out = json.loads(e.read())
        assert e.code == expect, out
        return out


def test_service_endpoints(server):
    root = call(server, "GET", "/")
    assert "version" in root["result"]
    call(server, "GET", "/healthz")
    call(server, "GET", "/readyz")


def test_collection_lifecycle(server):
    res = call(
        server,
        "PUT",
        "/collections/demo",
        {"vectors": {"size": 8, "distance": "Cosine"}},
    )
    assert res["result"] is True
    assert call(server, "GET", "/collections/demo/exists")["result"]["exists"]
    info = call(server, "GET", "/collections/demo")["result"]
    assert info["points_count"] == 0

    # duplicate create fails
    call(
        server,
        "PUT",
        "/collections/demo",
        {"vectors": {"size": 8, "distance": "Cosine"}},
        expect=400,
    )

    lst = call(server, "GET", "/collections")["result"]["collections"]
    assert {"name": "demo"} in lst


def test_points_crud_and_search(server):
    call(
        server,
        "PUT",
        "/collections/pts",
        {"vectors": {"size": 4, "distance": "Euclid"}},
    )
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(20, 4)).astype(np.float32)
    points = [
        {"id": i, "vector": vecs[i].tolist(), "payload": {"city": "a" if i < 10 else "b"}}
        for i in range(20)
    ]
    res = call(server, "PUT", "/collections/pts/points", {"points": points})
    assert res["result"]["status"] == "completed"

    assert call(server, "POST", "/collections/pts/points/count", {})["result"]["count"] == 20

    # retrieve
    got = call(server, "POST", "/collections/pts/points", {"ids": [3, 4]})["result"]
    assert {g["id"] for g in got} == {3, 4}
    one = call(server, "GET", "/collections/pts/points/3")["result"]
    assert one["id"] == 3 and one["payload"]["city"] == "a"

    # legacy search
    hits = call(
        server,
        "POST",
        "/collections/pts/points/search",
        {"vector": vecs[5].tolist(), "limit": 3, "with_payload": True},
    )["result"]
    assert hits[0]["id"] == 5

    # filtered search
    hits = call(
        server,
        "POST",
        "/collections/pts/points/search",
        {
            "vector": vecs[5].tolist(),
            "limit": 3,
            "filter": {"must": [{"key": "city", "match": {"value": "b"}}]},
        },
    )["result"]
    assert all(h["id"] >= 10 for h in hits)

    # universal query API
    out = call(
        server,
        "POST",
        "/collections/pts/points/query",
        {"query": vecs[7].tolist(), "limit": 2},
    )["result"]
    assert out["points"][0]["id"] == 7

    # scroll
    page = call(
        server, "POST", "/collections/pts/points/scroll", {"limit": 5}
    )["result"]
    assert [p["id"] for p in page["points"]] == [0, 1, 2, 3, 4]
    assert page["next_page_offset"] == 5

    # set payload + filter count
    call(
        server,
        "POST",
        "/collections/pts/points/payload",
        {"payload": {"flag": True}, "points": [1, 2]},
    )
    cnt = call(
        server,
        "POST",
        "/collections/pts/points/count",
        {"filter": {"must": [{"key": "flag", "match": {"value": True}}]}},
    )["result"]["count"]
    assert cnt == 2

    # delete points
    call(server, "POST", "/collections/pts/points/delete", {"points": [0, 1]})
    assert call(server, "POST", "/collections/pts/points/count", {})["result"]["count"] == 18
    call(server, "GET", "/collections/pts/points/0", expect=404)

    # facet
    fr = call(
        server, "POST", "/collections/pts/points/facet", {"key": "city"}
    )["result"]["hits"]
    assert sorted(h["value"] for h in fr) == ["a", "b"]


def test_aliases(server):
    call(server, "PUT", "/collections/al", {"vectors": {"size": 4, "distance": "Dot"}})
    call(
        server,
        "POST",
        "/collections/aliases",
        {"actions": [{"create_alias": {"collection_name": "al", "alias_name": "nick"}}]},
    )
    info = call(server, "GET", "/collections/nick")
    assert info["status"] == "ok"
    aliases = call(server, "GET", "/aliases")["result"]["aliases"]
    assert {"alias_name": "nick", "collection_name": "al"} in aliases


def test_payload_index_api(server):
    call(server, "PUT", "/collections/idx", {"vectors": {"size": 4, "distance": "Dot"}})
    call(
        server,
        "PUT",
        "/collections/idx/index",
        {"field_name": "tag", "field_schema": "keyword"},
    )
    info = call(server, "GET", "/collections/idx")["result"]
    assert "tag" in info["payload_schema"]
    call(server, "DELETE", "/collections/idx/index/tag")
    info = call(server, "GET", "/collections/idx")["result"]
    assert "tag" not in info["payload_schema"]


def test_batch_and_vectors_api(server):
    call(
        server,
        "PUT",
        "/collections/bat",
        {"vectors": {"size": 4, "distance": "Euclid"}},
    )
    call(
        server,
        "POST",
        "/collections/bat/points/batch",
        {
            "operations": [
                {
                    "upsert": {
                        "points": [
                            {"id": 1, "vector": [1, 0, 0, 0]},
                            {"id": 2, "vector": [0, 1, 0, 0]},
                        ]
                    }
                },
                {"set_payload": {"payload": {"x": 1}, "points": [1]}},
            ]
        },
    )
    one = call(server, "GET", "/collections/bat/points/1")["result"]
    assert one["payload"] == {"x": 1}

    call(
        server,
        "PUT",
        "/collections/bat/points/vectors",
        {"points": [{"id": 1, "vector": [0, 0, 0, 1]}]},
    )
    one = call(server, "GET", "/collections/bat/points/1")["result"]
    assert one["vector"] == [0.0, 0.0, 0.0, 1.0]


def test_sparse_collection_api(server):
    call(
        server,
        "PUT",
        "/collections/sp",
        {"sparse_vectors": {"text": {}}},
    )
    call(
        server,
        "PUT",
        "/collections/sp/points",
        {
            "points": [
                {"id": 1, "vector": {"text": {"indices": [1, 2], "values": [1.0, 1.0]}}},
                {"id": 2, "vector": {"text": {"indices": [2, 3], "values": [2.0, 1.0]}}},
            ]
        },
    )
    out = call(
        server,
        "POST",
        "/collections/sp/points/query",
        {"query": {"indices": [2], "values": [1.0]}, "using": "text", "limit": 2},
    )["result"]["points"]
    assert out[0]["id"] == 2


def test_snapshot_api(server, tmp_path_factory):
    call(server, "PUT", "/collections/snap", {"vectors": {"size": 4, "distance": "Dot"}})
    call(
        server,
        "PUT",
        "/collections/snap/points",
        {"points": [{"id": 1, "vector": [1, 2, 3, 4]}]},
    )
    created = call(server, "POST", "/collections/snap/snapshots")["result"]
    lst = call(server, "GET", "/collections/snap/snapshots")["result"]
    assert any(s["name"] == created["name"] for s in lst)


def test_metrics_endpoint(server):
    url = f"http://127.0.0.1:{server.port}/metrics"
    with urllib.request.urlopen(url) as resp:
        text = resp.read().decode()
    assert "rest_responses_total" in text
    assert "collections_total" in text


def test_uuid_point_ids_roundtrip(server):
    call(server, "PUT", "/collections/uu", {"vectors": {"size": 4, "distance": "Dot"}})
    uid = "550e8400-e29b-41d4-a716-446655440000"
    call(
        server,
        "PUT",
        "/collections/uu/points",
        {"points": [{"id": uid, "vector": [1, 2, 3, 4], "payload": {"x": 1}}]},
    )
    got = call(server, "GET", f"/collections/uu/points/{uid}")["result"]
    assert got["id"] == uid
    hits = call(
        server,
        "POST",
        "/collections/uu/points/search",
        {"vector": [1, 2, 3, 4], "limit": 1},
    )["result"]
    assert hits[0]["id"] == uid
    # invalid (non-uuid string) id rejected
    call(
        server,
        "PUT",
        "/collections/uu/points",
        {"points": [{"id": "not-a-uuid", "vector": [1, 2, 3, 4]}]},
        expect=400,
    )


def test_has_vector_condition(server):
    call(
        server,
        "PUT",
        "/collections/hv",
        {"vectors": {"a": {"size": 4, "distance": "Dot"}, "b": {"size": 4, "distance": "Dot"}}},
    )
    call(
        server,
        "PUT",
        "/collections/hv/points",
        {
            "points": [
                {"id": 1, "vector": {"a": [1, 0, 0, 0], "b": [1, 0, 0, 0]}},
                {"id": 2, "vector": {"a": [0, 1, 0, 0]}},
            ]
        },
    )
    cnt = call(
        server,
        "POST",
        "/collections/hv/points/count",
        {"filter": {"must": [{"has_vector": "b"}]}},
    )["result"]["count"]
    assert cnt == 1


def test_per_collection_metrics(server):
    url = f"http://127.0.0.1:{server.port}/metrics"
    with urllib.request.urlopen(url) as resp:
        text = resp.read().decode()
    assert 'collection_points_total{collection="pts"}' in text


def test_custom_sharding_end_to_end(server):
    call(
        server,
        "PUT",
        "/collections/tenants",
        {"vectors": {"size": 4, "distance": "Dot"}, "sharding_method": "custom"},
    )
    call(server, "PUT", "/collections/tenants/shards", {"shard_key": "org_a"})
    call(server, "PUT", "/collections/tenants/shards", {"shard_key": "org_b"})
    call(
        server,
        "PUT",
        "/collections/tenants/points",
        {
            "shard_key": "org_a",
            "points": [{"id": 1, "vector": [1, 0, 0, 0]}],
        },
    )
    call(
        server,
        "PUT",
        "/collections/tenants/points",
        {
            "shard_key": "org_b",
            "points": [{"id": 2, "vector": [0, 1, 0, 0]}],
        },
    )
    # scoped reads see only their tenant's shard
    a = call(
        server,
        "POST",
        "/collections/tenants/points/count",
        {"shard_key": "org_a"},
    )["result"]["count"]
    b = call(
        server,
        "POST",
        "/collections/tenants/points/count",
        {"shard_key": "org_b"},
    )["result"]["count"]
    both = call(server, "POST", "/collections/tenants/points/count", {})["result"]["count"]
    assert (a, b, both) == (1, 1, 2)
    hits = call(
        server,
        "POST",
        "/collections/tenants/points/search",
        {"vector": [1, 0, 0, 0], "limit": 5, "shard_key": "org_a"},
    )["result"]
    assert [h["id"] for h in hits] == [1]
    # unknown shard key → 404
    call(
        server,
        "POST",
        "/collections/tenants/points/count",
        {"shard_key": "nope"},
        expect=404,
    )
    # drop a shard key removes its points
    call(server, "POST", "/collections/tenants/shards/delete", {"shard_key": "org_b"})
    assert call(server, "POST", "/collections/tenants/points/count", {})["result"]["count"] == 1


def test_datetime_index_and_filters(server):
    call(server, "PUT", "/collections/dt", {"vectors": {"size": 4, "distance": "Dot"}})
    call(
        server,
        "PUT",
        "/collections/dt/index",
        {"field_name": "created", "field_schema": "datetime"},
    )
    call(
        server,
        "PUT",
        "/collections/dt/points",
        {
            "points": [
                {"id": 1, "vector": [1, 0, 0, 0], "payload": {"created": "2024-01-01T00:00:00Z"}},
                {"id": 2, "vector": [0, 1, 0, 0], "payload": {"created": "2025-06-15T12:30:00+02:00"}},
                {"id": 3, "vector": [0, 0, 1, 0], "payload": {"created": "2026-03-01T00:00:00Z"}},
            ]
        },
    )
    cnt = call(
        server,
        "POST",
        "/collections/dt/points/count",
        {"filter": {"must": [{"key": "created", "range": {"gte": "2025-01-01T00:00:00Z"}}]}},
    )["result"]["count"]
    assert cnt == 2
    cnt = call(
        server,
        "POST",
        "/collections/dt/points/count",
        {
            "filter": {
                "must": [
                    {
                        "key": "created",
                        "range": {
                            "gt": "2024-06-01T00:00:00Z",
                            "lt": "2026-01-01T00:00:00Z",
                        },
                    }
                ]
            }
        },
    )["result"]["count"]
    assert cnt == 1
