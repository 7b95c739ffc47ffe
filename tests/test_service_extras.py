import json
import os
import subprocess
import sys
import urllib.request

import numpy as np
import pytest

from qdrant_tpu.api.issues import ISSUES
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
            assert resp.status == expect
            return json.loads(resp.read())
    except urllib.error.HTTPError as e:
        assert e.code == expect, e.read()
        return json.loads(e.read() or b"{}")


def test_issues_reported_for_unindexed_filter(server):
    ISSUES.clear()
    call(server, "PUT", "/collections/iss", {"vectors": {"size": 4, "distance": "Dot"}})
    call(
        server,
        "PUT",
        "/collections/iss/points",
        {"points": [{"id": 1, "vector": [1, 2, 3, 4], "payload": {"color": "red"}}]},
    )
    call(
        server,
        "POST",
        "/collections/iss/points/query",
        {
            "query": [1.0, 0.0, 0.0, 0.0],
            "filter": {"must": [{"key": "color", "match": {"value": "red"}}]},
            "limit": 3,
        },
    )
    issues = call(server, "GET", "/issues")["result"]["issues"]
    assert any("UNINDEXED_FIELD/iss/color" == i["id"] for i in issues)
    sol = next(i for i in issues if i["id"].startswith("UNINDEXED_FIELD/iss"))["solution"]
    assert sol["immediate"]["uri"] == "/collections/iss/index"
    call(server, "DELETE", "/issues")
    assert call(server, "GET", "/issues")["result"]["issues"] == []


def test_write_lock(server):
    call(server, "PUT", "/collections/lk", {"vectors": {"size": 4, "distance": "Dot"}})
    call(server, "POST", "/locks", {"write": True, "error_message": "maintenance"})
    out = call(
        server,
        "PUT",
        "/collections/lk/points",
        {"points": [{"id": 1, "vector": [1, 2, 3, 4]}]},
        expect=403,
    )
    assert "maintenance" in out["status"]["error"]
    # reads still work
    call(server, "POST", "/collections/lk/points/count", {})
    call(server, "POST", "/locks", {"write": False})
    call(
        server,
        "PUT",
        "/collections/lk/points",
        {"points": [{"id": 1, "vector": [1, 2, 3, 4]}]},
    )


def test_wal_inspect_cli(tmp_path):
    from qdrant_tpu.storage.wal import Wal

    path = str(tmp_path / "wal")
    wal = Wal(path)
    wal.append({"type": "upsert", "points": [{"id": 1}]})
    wal.append({"type": "delete", "ids": [2]})
    wal.close()
    out = subprocess.run(
        [sys.executable, "-m", "qdrant_tpu.tools.wal_inspector", path],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert [l["op_num"] for l in lines] == [1, 2]
    assert lines[1]["operation"]["type"] == "delete"
    assert "2 records" in out.stderr


def test_full_snapshot_and_download(server):
    call(server, "PUT", "/collections/fs", {"vectors": {"size": 4, "distance": "Dot"}})
    call(
        server,
        "PUT",
        "/collections/fs/points",
        {"points": [{"id": 1, "vector": [1, 2, 3, 4]}]},
    )
    snap = call(server, "POST", "/snapshots")["result"]
    assert snap["name"].startswith("full-snapshot-")
    lst = call(server, "GET", "/snapshots")["result"]
    assert any(s["name"] == snap["name"] for s in lst)

    # per-collection snapshot + binary download
    created = call(server, "POST", "/collections/fs/snapshots")["result"]
    url = f"http://127.0.0.1:{server.port}/collections/fs/snapshots/{created['name']}"
    with urllib.request.urlopen(url) as resp:
        data = resp.read()
    assert len(data) == created["size"]
    assert data[:100]  # tar bytes


def test_usage_reported_in_search(server):
    call(server, "PUT", "/collections/hw", {"vectors": {"size": 4, "distance": "Dot"}})
    call(
        server,
        "PUT",
        "/collections/hw/points",
        {"points": [{"id": i, "vector": [float(i), 0, 0, 0]} for i in range(10)]},
    )
    out = call(
        server,
        "POST",
        "/collections/hw/points/search",
        {"vector": [1.0, 0, 0, 0], "limit": 3, "with_payload": True},
    )
    assert "usage" in out
    hw = out["usage"]["hardware"]
    assert hw["cpu"] >= 40  # 10 vectors × 4 dims
    assert hw["payload_io_read"] >= 3


def test_telemetry_detail_levels(server):
    full = call(server, "GET", "/telemetry")["result"]
    assert full["collections"]["collections"]
    assert "memory" in full and "hardware" in full
    assert full["cluster"] == {"enabled": False}
    light = call(server, "GET", "/telemetry?details_level=0")["result"]
    assert not light["collections"]["collections"]
    assert "memory" not in light
    # level>=1 adds a per-endpoint request breakdown
    assert "responses" not in light["requests"]["rest"]
    assert "responses" in full["requests"]["rest"]
    deep = call(server, "GET", "/telemetry?details_level=4")["result"]
    coll = deep["collections"]["collections"][0]
    assert coll["shards"] and "segments" in coll["shards"][0]
    # level>=3 accounts memory per collection/shard/segment: the dense
    # store of 10 x 4-dim f32 vectors must show up as host bytes
    assert coll["memory"]["total_bytes"] > 0
    assert coll["memory"]["host_bytes"] >= 10 * 4 * 4
    seg0 = coll["shards"][0]["segments"][0]
    assert seg0["memory"]["total_bytes"] > 0
    assert "dense" in seg0["memory"]["breakdown"]


def test_segment_memory_accounting_components():
    """memory_usage_bytes covers dense + sparse + hnsw + quantized +
    payload index, and classifies host vs device buffers."""
    import numpy as np

    from qdrant_tpu.storage.segment import Segment
    from qdrant_tpu.types import (
        CollectionParams, Distance, PayloadIndexParams, PayloadSchemaType,
        SparseVector, SparseVectorParams, VectorParams,
    )

    params = CollectionParams(
        vectors={"v": VectorParams(size=16, distance=Distance.DOT)},
        sparse_vectors={"s": SparseVectorParams()},
    )
    seg = Segment(params)
    rng = np.random.default_rng(0)
    for i in range(64):
        seg.upsert_point(
            i, i,
            {"v": rng.standard_normal(16).astype(np.float32),
             "s": SparseVector(indices=[1, 5, 9], values=[1.0, 2.0, 0.5])},
            {"tag": f"t{i % 4}"},
        )
    seg.create_field_index("tag", PayloadIndexParams(PayloadSchemaType.KEYWORD))
    mem = seg.memory_usage_bytes()
    bd = mem["breakdown"]
    assert mem["total_bytes"] > 0
    assert bd["dense"]["host_bytes"] >= 64 * 16 * 4
    assert "sparse_index" in bd and bd["sparse_index"]["host_bytes"] > 0
    assert "payload_index" in bd
    assert "payload_storage" in bd
    # forcing the device mirror moves bytes into device accounting
    seg.dense["v"].device_block()
    mem2 = seg.memory_usage_bytes()
    assert mem2["device_bytes"] > 0


def test_telemetry_anonymize(server):
    plain = call(server, "GET", "/telemetry?details_level=2")["result"]
    anon = call(
        server, "GET", "/telemetry?details_level=2&anonymize=true"
    )["result"]
    names = {c["id"] for c in plain["collections"]["collections"]}
    anon_names = {c["id"] for c in anon["collections"]["collections"]}
    # collection names are hashed, structure/counters preserved
    assert names and not (names & anon_names)
    assert (
        anon["collections"]["number_of_collections"]
        == plain["collections"]["number_of_collections"]
    )
    # anonymization is stable
    anon2 = call(
        server, "GET", "/telemetry?details_level=2&anonymize=true"
    )["result"]
    assert anon_names == {c["id"] for c in anon2["collections"]["collections"]}


def test_telemetry_reporter_builds_anonymized_payload(server):
    from qdrant_tpu.utils.telemetry import TelemetryReporter

    rep = TelemetryReporter(server.toc, url="http://127.0.0.1:1/none")
    payload = rep.build_report()
    assert payload["collections"]["number_of_collections"] >= 1
    # reporting a payload to an unreachable sink fails without raising
    assert rep._send(payload) is False


def test_logger_runtime_reload(server):
    import logging

    before = call(server, "GET", "/logger")["result"]
    assert "log_level" in before
    out = call(
        server,
        "POST",
        "/logger",
        {"overrides": {"qdrant_tpu.test_dummy": "WARNING"}},
    )["result"]
    assert out["overrides"]["qdrant_tpu.test_dummy"] == "WARNING"
    assert logging.getLogger("qdrant_tpu.test_dummy").level == logging.WARNING
    # reset via null override
    out = call(server, "POST", "/logger", {"overrides": {"qdrant_tpu.test_dummy": None}})[
        "result"
    ]
    assert "qdrant_tpu.test_dummy" not in out["overrides"]
    call(server, "POST", "/logger", {"log_level": "NOT_A_LEVEL"}, expect=400)


def test_logger_on_disk_sink(server, tmp_path):
    """On-disk log sink (reference: src/tracing/on_disk.rs): enable via
    POST /logger, emit, verify JSON lines land in the file, then disable."""
    import logging

    log_file = str(tmp_path / "qdrant.log.json")
    out = call(
        server,
        "POST",
        "/logger",
        {
            "on_disk": {
                "enabled": True,
                "log_file": log_file,
                "log_level": "INFO",
                "format": "json",
            }
        },
    )["result"]
    assert out["on_disk"]["enabled"] is True
    logging.getLogger("qdrant_tpu.sink_test").info("hello sink %d", 42)
    with open(log_file) as f:
        lines = [json.loads(line) for line in f if line.strip()]
    assert any(
        rec["message"] == "hello sink 42"
        and rec["target"] == "qdrant_tpu.sink_test"
        and rec["level"] == "INFO"
        for rec in lines
    )
    # text format reconfigure writes plain lines to a second file
    text_file = str(tmp_path / "qdrant.log")
    call(
        server,
        "POST",
        "/logger",
        {"on_disk": {"log_file": text_file, "format": "text"}},
    )
    logging.getLogger("qdrant_tpu.sink_test").warning("plain line")
    with open(text_file) as f:
        assert "plain line" in f.read()
    # enabling without a path is a client error, sink state unchanged
    call(
        server,
        "POST",
        "/logger",
        {"on_disk": {"enabled": True, "log_file": None}},
        expect=400,
    )
    out = call(server, "POST", "/logger", {"on_disk": {"enabled": False, "log_file": text_file}})[
        "result"
    ]
    assert out["on_disk"]["enabled"] is False
    logging.getLogger("qdrant_tpu.sink_test").warning("after disable")
    with open(text_file) as f:
        assert "after disable" not in f.read()


def test_openapi_spec(server):
    """GET /openapi.json: valid OpenAPI 3 document covering every route."""
    spec = call(server, "GET", "/openapi.json")["result"]
    assert spec["openapi"].startswith("3.")
    paths = spec["paths"]
    # spot-check shape: core endpoints present with typed request bodies
    assert "/collections/{name}/points/search" in paths
    body = paths["/collections/{name}/points/search"]["post"]["requestBody"]
    assert body["content"]["application/json"]["schema"]["$ref"].endswith("SearchRequest")
    assert "/collections/{name}" in paths
    p = paths["/collections/{name}"]["put"]["parameters"]
    assert p[0]["name"] == "name" and p[0]["in"] == "path"
    # every ROUTES entry is represented
    from qdrant_tpu.api.rest import ROUTES
    assert sum(len(ms) for ms in paths.values()) == len(ROUTES)
    # schemas referenced exist
    assert "SearchRequest" in spec["components"]["schemas"]


def test_shard_snapshot_lifecycle(server):
    """Public shard snapshot API (reference: snapshot_api.rs shard routes +
    src/tonic/mod.rs ShardSnapshots): create → list → wipe → recover."""
    call(server, "PUT", "/collections/ssnap", {"vectors": {"size": 4, "distance": "Dot"}})
    call(
        server,
        "PUT",
        "/collections/ssnap/points",
        {
            "points": [
                {"id": i, "vector": [float(i), 1, 0, 0], "payload": {"i": i}}
                for i in range(8)
            ]
        },
    )
    snap = call(server, "POST", "/collections/ssnap/shards/0/snapshots")["result"]
    assert snap["name"].endswith(".snapshot") and snap["size"] > 0
    lst = call(server, "GET", "/collections/ssnap/shards/0/snapshots")["result"]
    assert [s["name"] for s in lst] == [snap["name"]]

    # destroy the shard contents, then recover from the snapshot by name
    call(
        server,
        "POST",
        "/collections/ssnap/points/delete",
        {"points": list(range(8))},
    )
    assert (
        call(server, "POST", "/collections/ssnap/points/count", {})["result"]["count"]
        == 0
    )
    ok = call(
        server,
        "PUT",
        "/collections/ssnap/shards/0/snapshots/recover",
        {"location": snap["name"]},
    )["result"]
    assert ok is True
    assert (
        call(server, "POST", "/collections/ssnap/points/count", {})["result"]["count"]
        == 8
    )

    # download works, bad checksum rejected, delete removes it
    import urllib.request

    url = f"http://127.0.0.1:{server.port}/collections/ssnap/shards/0/snapshots/{snap['name']}"
    with urllib.request.urlopen(url) as resp:
        blob = resp.read()
    assert len(blob) == snap["size"]
    call(
        server,
        "PUT",
        "/collections/ssnap/shards/0/snapshots/recover",
        {"location": snap["name"], "checksum": "0" * 64},
        expect=400,
    )
    assert call(
        server, "DELETE", f"/collections/ssnap/shards/0/snapshots/{snap['name']}"
    )["result"]
    assert call(server, "GET", "/collections/ssnap/shards/0/snapshots")["result"] == []

    # upload the downloaded snapshot back (binary body)
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/collections/ssnap/shards/0/snapshots/upload",
        data=blob,
        method="POST",
        headers={"Content-Type": "application/octet-stream"},
    )
    with urllib.request.urlopen(req) as resp:
        assert json.loads(resp.read())["result"] is True
    assert (
        call(server, "POST", "/collections/ssnap/points/count", {})["result"]["count"]
        == 8
    )


def test_dashboard_builtin_and_static(server, tmp_path):
    """GET /dashboard serves the built-in page when no static folder
    exists, a static folder when configured (reference: src/actix/
    web_ui.rs), and refuses path escapes."""
    import urllib.request as _rq

    base = f"http://127.0.0.1:{server.port}"

    def fetch(path):
        try:
            with _rq.urlopen(base + path) as r:
                return r.status, r.read(), dict(r.headers)
        except urllib.error.HTTPError as e:
            return e.code, e.read(), dict(e.headers)

    # built-in page (no ./static in the test CWD-independent config)
    server.toc.static_content_dir = str(tmp_path / "missing")
    code, body, headers = fetch("/dashboard")
    assert code == 200 and b"qdrant-tpu" in body
    assert headers.get("X-Frame-Options") == "DENY"
    assert "text/html" in headers.get("Content-Type", "")

    # static folder takes over, with index + mime + nested files
    static = tmp_path / "static"
    static.mkdir()
    (static / "index.html").write_text("<html>custom ui</html>")
    (static / "app.js").write_text("console.log(1)")
    server.toc.static_content_dir = str(static)
    assert b"custom ui" in fetch("/dashboard")[1]
    code, body, headers = fetch("/dashboard/app.js")
    assert code == 200 and b"console.log" in body
    assert "javascript" in headers.get("Content-Type", "")

    # traversal refused, missing file 404s
    assert fetch("/dashboard/../secret")[0] == 404
    assert fetch("/dashboard/nope.css")[0] == 404

    # disabled -> 404
    server.toc.static_content_enabled = False
    assert fetch("/dashboard")[0] == 404
    server.toc.static_content_enabled = True


def test_universal_io_tier(server, tmp_path):
    """Ranged reads over local files and the peer storage-read plane
    (reference: universal_io + StorageRead gRPC; here HTTP internal)."""
    from qdrant_tpu.storage.io_tier import (
        IoTierError, UniversalReader, read_local, read_peer,
    )

    root = server.toc.storage_path
    sub = os.path.join(root, "iotest")
    os.makedirs(sub, exist_ok=True)
    with open(os.path.join(sub, "blob.bin"), "wb") as f:
        f.write(bytes(range(256)))

    # local: full + ranged
    assert read_local(root, "iotest/blob.bin") == bytes(range(256))
    assert read_local(root, "iotest/blob.bin", 10, 5) == bytes(range(10, 15))
    with pytest.raises(IoTierError):
        read_local(root, "../outside")
    with pytest.raises(IoTierError):
        read_local(root, "iotest/missing.bin")

    # peer plane over the live server
    base = f"http://127.0.0.1:{server.port}"
    assert read_peer(base, "iotest/blob.bin", 250, 6) == bytes(range(250, 256))
    with pytest.raises(IoTierError):
        read_peer(base, "../../etc/passwd")

    # UniversalReader dispatch
    ur = UniversalReader(root)
    assert ur.read("file://iotest/blob.bin", 0, 4) == b"\x00\x01\x02\x03"
    assert (
        ur.read(f"peer://127.0.0.1:{server.port}/iotest/blob.bin", 1, 2)
        == b"\x01\x02"
    )


def test_s3fifo_cache_behavior():
    """S3-FIFO semantics (reference: lib/trififo): one-hit wonders wash
    through the small queue; re-read keys promote to main; ghost hits
    re-admit; capacity is respected."""
    from qdrant_tpu.storage.io_tier import S3FifoCache

    c = S3FifoCache(capacity_bytes=100)
    # hot key: inserted, re-read (freq>0) -> survives the small-queue churn
    c.put("hot", b"x" * 8)
    assert c.get("hot") == b"x" * 8
    for i in range(30):  # one-hit wonders wash through
        c.put(f"w{i}", b"y" * 8)
    assert c.size_bytes <= 100
    assert c.get("hot") == b"x" * 8  # promoted to main, still cached
    # ghost re-admission: a washed-out key that returns goes straight to main
    victim = next(f"w{i}" for i in range(30) if c.get(f"w{i}") is None)
    c.put(victim, b"z" * 8)
    assert c.get(victim) == b"z" * 8
    assert victim.encode() and c.stats()["entries"] > 0
    # oversized value is never admitted
    c.put("huge", b"h" * 200)
    assert c.get("huge") is None
    # duplicate put does not double-count bytes
    before = c.size_bytes
    c.put("hot", b"x" * 8)
    assert c.size_bytes == before


def test_universal_reader_cold_read_cache(server):
    """Peer reads through UniversalReader are cached: the second identical
    ranged read is served from the S3-FIFO cache without touching the
    network plane."""
    from qdrant_tpu.storage.io_tier import UniversalReader

    root = server.toc.storage_path
    sub = os.path.join(root, "iocache")
    os.makedirs(sub, exist_ok=True)
    with open(os.path.join(sub, "cold.bin"), "wb") as f:
        f.write(b"abcdef" * 100)

    ur = UniversalReader(root, cache_bytes=1 << 20)
    uri = f"peer://127.0.0.1:{server.port}/iocache/cold.bin"
    first = ur.read(uri, 6, 6)
    assert first == b"abcdef"
    assert ur.cache.stats()["misses"] == 1
    # mutate the file under the cache: the cached range must still serve
    with open(os.path.join(sub, "cold.bin"), "wb") as f:
        f.write(b"XXXXXX" * 100)
    assert ur.read(uri, 6, 6) == b"abcdef"
    assert ur.cache.stats()["hits"] == 1
    # a different range is a different key -> fresh read sees new bytes
    assert ur.read(uri, 0, 6) == b"XXXXXX"
    # local files bypass the cache entirely
    ur.read("file://iocache/cold.bin", 0, 6)
    assert ur.cache.stats()["entries"] == 2


def test_snapshot_checksum_roundtrip(server, tmp_path):
    """Snapshots write a `.checksum` sidecar, listings expose it, recovery
    verifies it, and a corrupted snapshot is refused (reference:
    snapshot checksum files + verified recovery)."""
    call(server, "PUT", "/collections/ck",
         {"vectors": {"size": 4, "distance": "Dot"}})
    call(server, "PUT", "/collections/ck/points",
         {"points": [{"id": 1, "vector": [1, 2, 3, 4]}]})
    snap = call(server, "POST", "/collections/ck/snapshots")["result"]
    assert snap["checksum"] and len(snap["checksum"]) == 64
    listed = call(server, "GET", "/collections/ck/snapshots")["result"]
    assert listed[0]["checksum"] == snap["checksum"]

    path = os.path.join(
        server.toc.snapshots_path, "ck", snap["name"]
    )
    # explicit good checksum recovers
    assert call(
        server, "PUT", "/collections/ck2/snapshots/recover",
        {"location": path, "checksum": snap["checksum"]},
    )["result"] is True
    assert call(server, "POST", "/collections/ck2/points/count", {})[
        "result"]["count"] == 1

    # corrupted file + sidecar mismatch -> refused
    with open(path, "r+b") as f:
        f.seek(0)
        f.write(b"\x00\x00\x00\x00")
    r = call(
        server, "PUT", "/collections/ck3/snapshots/recover",
        {"location": path}, expect=400,
    )
    assert "checksum mismatch" in json.dumps(r)


def test_quota_api_and_enforcement(server, monkeypatch):
    """GET/PUT /quotas + write refusal past an enforced limit with
    hysteresis release (reference: lib/shard/src/quota, quota_api.rs)."""
    st = call(server, "GET", "/quotas")["result"]
    assert st["config"]["enabled"] is False
    assert "usage" in st and "exceeded" in st

    call(server, "PUT", "/collections/qt",
         {"vectors": {"size": 4, "distance": "Dot"}})

    # enable a disk limit and fake the measurement above it
    call(server, "PUT", "/quotas",
         {"enabled": True, "max_disk_usage_percent": 80,
          "release_margin_percent": 5})
    monkeypatch.setattr(
        type(server.toc.quota), "disk_usage_percent", lambda self: 93.0
    )
    r = call(server, "PUT", "/collections/qt/points",
             {"points": [{"id": 1, "vector": [1, 2, 3, 4]}]}, expect=507)
    assert "quota exceeded" in json.dumps(r)
    # reads and deletes still pass
    call(server, "POST", "/collections/qt/points/count", {})
    call(server, "POST", "/collections/qt/points/delete", {"points": [999]})

    # hysteresis: 78% is under the 80 limit but NOT margin-below -> still
    # refused; 74% releases
    monkeypatch.setattr(
        type(server.toc.quota), "disk_usage_percent", lambda self: 78.0
    )
    call(server, "PUT", "/collections/qt/points",
         {"points": [{"id": 1, "vector": [1, 2, 3, 4]}]}, expect=507)
    monkeypatch.setattr(
        type(server.toc.quota), "disk_usage_percent", lambda self: 74.0
    )
    call(server, "PUT", "/collections/qt/points",
         {"points": [{"id": 1, "vector": [1, 2, 3, 4]}]})
    st = call(server, "GET", "/quotas")["result"]
    assert st["exceeded"]["disk_usage"] is False

    # invalid config rejected; disable restores default state
    call(server, "PUT", "/quotas", {"max_disk_usage_percent": 400}, expect=400)
    call(server, "PUT", "/quotas", {"enabled": False})


def test_vector_name_api(server):
    """PUT/DELETE /collections/{c}/vectors/{name}: add a named vector to
    a live collection, write+search it, drop it (reference:
    vector_name_api.rs)."""
    call(server, "PUT", "/collections/vn",
         {"vectors": {"size": 4, "distance": "Dot"}})
    call(server, "PUT", "/collections/vn/points",
         {"points": [{"id": 1, "vector": [1, 0, 0, 0]}]})

    # add a second named vector on the live collection
    call(server, "PUT", "/collections/vn/vectors/extra",
         {"size": 2, "distance": "Cosine"})
    # old point has no 'extra' vector; new point carries both
    call(server, "PUT", "/collections/vn/points",
         {"points": [{"id": 2, "vector": {"": [0, 1, 0, 0],
                                          "extra": [1.0, 0.0]}}]})
    r = call(server, "POST", "/collections/vn/points/search",
             {"vector": {"name": "extra", "vector": [1.0, 0.0]},
              "limit": 3})["result"]
    assert [p["id"] for p in r] == [2]

    # duplicate add rejected; default search unaffected
    call(server, "PUT", "/collections/vn/vectors/extra",
         {"size": 2, "distance": "Cosine"}, expect=400)
    r = call(server, "POST", "/collections/vn/points/search",
             {"vector": [1, 0, 0, 0], "limit": 3})["result"]
    assert r[0]["id"] == 1

    # drop: searching the dropped name errors, collection still serves
    call(server, "DELETE", "/collections/vn/vectors/extra")
    call(server, "POST", "/collections/vn/points/search",
         {"vector": {"name": "extra", "vector": [1.0, 0.0]}, "limit": 3},
         expect=400)
    call(server, "DELETE", "/collections/vn/vectors/missing", expect=404)
