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
