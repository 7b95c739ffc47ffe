import json
import time
import urllib.request

import pytest

from qdrant_tpu.api.auth import Access, AuthError, Authenticator, make_jwt, parse_jwt
from qdrant_tpu.api.rest import RestServer
from qdrant_tpu.api.toc import TableOfContent


def test_jwt_roundtrip_and_expiry():
    key = "secret"
    token = make_jwt({"access": "r", "exp": time.time() + 60}, key)
    claims = parse_jwt(token, key)
    assert claims["access"] == "r"
    expired = make_jwt({"access": "r", "exp": time.time() - 1}, key)
    with pytest.raises(AuthError):
        parse_jwt(expired, key)
    with pytest.raises(AuthError):
        parse_jwt(token, "wrong")


def test_authenticator_levels():
    auth = Authenticator("full-key", "ro-key")
    a = auth.authenticate({"api-key": "full-key"})
    assert a.write and a.manage
    a = auth.authenticate({"api-key": "ro-key"})
    assert not a.write
    with pytest.raises(AuthError):
        auth.authenticate({"api-key": "bad"})
    with pytest.raises(AuthError):
        auth.authenticate({})
    # per-collection JWT
    token = make_jwt(
        {"access": [{"collection": "col1", "access": "rw"}]}, "full-key"
    )
    a = auth.authenticate({"Authorization": f"Bearer {token}"})
    a.check_collection("col1", write=True)
    with pytest.raises(AuthError):
        a.check_collection("other")
    with pytest.raises(AuthError):
        a.check_manage()


@pytest.fixture(scope="module")
def secured_server(tmp_path_factory):
    toc = TableOfContent(str(tmp_path_factory.mktemp("storage")))
    srv = RestServer(toc, port=0, api_key="master", read_only_api_key="reader")
    srv.start_background()
    yield srv
    srv.shutdown()
    toc.close()


def call(server, method, path, body=None, headers=None, expect=200):
    url = f"http://127.0.0.1:{server.port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    try:
        with urllib.request.urlopen(req) as resp:
            assert resp.status == expect
            return json.loads(resp.read())
    except urllib.error.HTTPError as e:
        assert e.code == expect, e.read()
        return json.loads(e.read() or b"{}")


def test_rest_auth_enforced(secured_server):
    s = secured_server
    # no key → 401
    call(s, "GET", "/collections", expect=401)
    # healthz open
    call(s, "GET", "/healthz")
    # full key works incl. manage
    call(
        s,
        "PUT",
        "/collections/authed",
        {"vectors": {"size": 4, "distance": "Dot"}},
        headers={"api-key": "master"},
    )
    # read-only key can read but not write
    call(s, "GET", "/collections", headers={"api-key": "reader"})
    call(
        s,
        "PUT",
        "/collections/authed/points",
        {"points": [{"id": 1, "vector": [1, 2, 3, 4]}]},
        headers={"api-key": "reader"},
        expect=401,
    )
    # scoped JWT: rw on `authed` only
    token = make_jwt({"access": [{"collection": "authed", "access": "rw"}]}, "master")
    call(
        s,
        "PUT",
        "/collections/authed/points",
        {"points": [{"id": 1, "vector": [1, 2, 3, 4]}]},
        headers={"Authorization": f"Bearer {token}"},
    )
    # ...but cannot create collections
    call(
        s,
        "PUT",
        "/collections/other",
        {"vectors": {"size": 4, "distance": "Dot"}},
        headers={"Authorization": f"Bearer {token}"},
        expect=401,
    )


def test_internal_routes_require_manage(secured_server):
    """Read-only keys and collection-scoped JWTs must not reach the internal
    peer plane: raft messages and internal shard ops (ADVICE r1 #2)."""
    s = secured_server
    raft_msg = {"type": "append_entries", "term": 999, "leader_commit": 10}
    call(s, "POST", "/cluster/raft/message", raft_msg, headers={"api-key": "reader"}, expect=401)
    token = make_jwt({"access": [{"collection": "authed", "access": "rw"}]}, "master")
    call(
        s,
        "POST",
        "/cluster/raft/message",
        raft_msg,
        headers={"Authorization": f"Bearer {token}"},
        expect=401,
    )
    # internal shard ops likewise manage-gated, even with a scoped rw JWT
    call(
        s,
        "POST",
        "/internal/collections/authed/shards/0/update",
        {"operation": {"type": "upsert", "points": []}},
        headers={"Authorization": f"Bearer {token}"},
        expect=401,
    )
    call(
        s,
        "POST",
        "/internal/collections/authed/shards/0/search",
        {"using": "", "queries": [[0, 0, 0, 0]], "k": 1},
        headers={"api-key": "reader"},
        expect=401,
    )


def test_grpc_rbac_enforced(tmp_path):
    """gRPC must enforce per-method access like REST (ADVICE r1 #1)."""
    grpc = pytest.importorskip("grpc")
    from qdrant_tpu.api.grpc_server import M, make_server
    from qdrant_tpu.api.toc import TableOfContent as Toc

    toc = Toc(str(tmp_path / "s"))
    toc.create_collection("g", {"vectors": {"size": 4, "distance": "Dot"}})
    server, port = make_server(
        toc, port=0, api_key="master", read_only_api_key="reader"
    )
    server.start()
    try:
        chan = grpc.insecure_channel(f"127.0.0.1:{port}")
        upsert = chan.unary_unary(
            "/qdrant.Points/Upsert",
            request_serializer=lambda m: m.SerializeToString(),
            response_deserializer=M["PointsOperationResponse"].FromString,
        )
        req = M["UpsertPoints"](collection_name="g")
        p = req.points.add()
        p.id.num = 1
        p.vectors.vector.data.extend([1.0, 0.0, 0.0, 0.0])
        # read-only key: denied on write RPC
        try:
            upsert(req, metadata=(("api-key", "reader"),))
            raise AssertionError("read-only upsert should be denied")
        except grpc.RpcError as e:
            assert e.code() == grpc.StatusCode.PERMISSION_DENIED
        # full key: allowed
        upsert(req, metadata=(("api-key", "master"),))
        # read-only key: reads still fine
        count = chan.unary_unary(
            "/qdrant.Points/Count",
            request_serializer=lambda m: m.SerializeToString(),
            response_deserializer=M["CountResponse"].FromString,
        )
        res = count(M["CountPoints"](collection_name="g"), metadata=(("api-key", "reader"),))
        assert res.result.count == 1
        # read-only key: manage RPC denied
        create = chan.unary_unary(
            "/qdrant.Collections/Create",
            request_serializer=lambda m: m.SerializeToString(),
            response_deserializer=M["CollectionOperationResponse"].FromString,
        )
        vp = M["VectorParams"](size=4, distance=2)
        creq = M["CreateCollection"](collection_name="g2")
        creq.vectors_config.params.CopyFrom(vp)
        try:
            create(creq, metadata=(("api-key", "reader"),))
            raise AssertionError("read-only create should be denied")
        except grpc.RpcError as e:
            assert e.code() == grpc.StatusCode.PERMISSION_DENIED
        # collection-scoped JWT: write to granted collection ok, others denied
        token = make_jwt({"access": [{"collection": "g", "access": "rw"}]}, "master")
        upsert(req, metadata=(("authorization", f"Bearer {token}"),))
        toc.create_collection("h", {"vectors": {"size": 4, "distance": "Dot"}})
        req2 = M["UpsertPoints"](collection_name="h")
        p2 = req2.points.add()
        p2.id.num = 1
        p2.vectors.vector.data.extend([1.0, 0.0, 0.0, 0.0])
        try:
            upsert(req2, metadata=(("authorization", f"Bearer {token}"),))
            raise AssertionError("scoped JWT must not write other collections")
        except grpc.RpcError as e:
            assert e.code() == grpc.StatusCode.PERMISSION_DENIED
    finally:
        server.stop(0)
        toc.close()
