"""Slow-request log + audit trail (reference: slow_requests_log.rs,
src/common/audit.rs) driven through the REST surface."""

import json
import time
import urllib.request

import pytest

from qdrant_tpu.api.rest import RestServer
from qdrant_tpu.api.toc import TableOfContent
from qdrant_tpu.utils.observability import AuditLog, SlowRequestsLog


def call(port, method, path, body=None, headers=None, expect=200):
    url = f"http://127.0.0.1:{port}{path}"
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


def test_slow_log_dedup_and_bound():
    log = SlowRequestsLog(max_entries=3, threshold_s=0.1)
    log.observe("search", "c", 0.05, {"q": 1})  # below threshold
    assert log.entries() == []
    log.observe("search", "c", 0.5, {"q": 1})
    log.observe("search", "c", 0.9, {"q": 1})  # same content, slower → wins
    assert len(log.entries()) == 1
    e = log.entries()[0]
    assert e["duration"] == 0.9 and e["approx_count"] == 2
    for i in range(5):
        log.observe("search", "c", 0.2 + i * 0.1, {"q": 10 + i})
    assert len(log.entries()) == 3  # bounded, keeps slowest
    assert min(x["duration"] for x in log.entries()) >= 0.4


def test_audit_log_rotation(tmp_path):
    log = AuditLog(str(tmp_path), max_log_files=2)
    log.record(api="/collections/x", result="ok", method="h_upsert")
    log.record(api="/collections/x", result="denied", error="nope")
    entries = log.read()
    assert entries[0]["result"] == "denied"
    assert entries[1]["result"] == "ok"


def test_rest_surface(tmp_path):
    toc = TableOfContent(str(tmp_path / "s"))
    srv = RestServer(toc, port=0, api_key="sek", read_only_api_key="ro")
    srv.start_background()
    try:
        hdr = {"api-key": "sek"}
        call(srv.port, "PUT", "/collections/obs",
             {"vectors": {"size": 4, "distance": "Dot"}}, headers=hdr)
        # a denied request lands in the audit log
        call(srv.port, "PUT", "/collections/nope",
             {"vectors": {"size": 4, "distance": "Dot"}},
             headers={"api-key": "ro"}, expect=401)
        audit = call(srv.port, "GET", "/audit", headers=hdr)["result"]["entries"]
        assert any(e["result"] == "denied" for e in audit)
        assert any(
            e["result"] == "ok" and e["method"] == "h_create_collection"
            for e in audit
        )
        # slow log: lower the threshold so a normal call registers
        toc.slow_log.threshold_s = 0.0
        call(srv.port, "POST", "/collections/obs/points/count", {},
             headers=hdr)
        slow = call(srv.port, "GET", "/slow_requests", headers=hdr)
        names = [e["request_name"] for e in slow["result"]["slow_requests"]]
        assert "h_count_points" in names or len(names) >= 1
        # read-only keys cannot read audit
        call(srv.port, "GET", "/audit", headers={"api-key": "ro"}, expect=401)
    finally:
        srv.shutdown()
        toc.close()
