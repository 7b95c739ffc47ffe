"""S3 snapshot storage against an in-process S3-compatible stub that
verifies SigV4 signatures by re-deriving them server-side (reference:
snapshots_manager.rs SnapshotStorageCloud)."""

import hashlib
import hmac
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from qdrant_tpu.storage.object_store import ObjectStoreError, S3Client

ACCESS, SECRET, REGION = "test-access", "test-secret", "eu-test-1"


class _StubS3(BaseHTTPRequestHandler):
    objects = {}

    def _verify_sig(self, payload: bytes) -> bool:
        auth = self.headers.get("Authorization", "")
        if not auth.startswith("AWS4-HMAC-SHA256"):
            return False
        parts = dict(
            kv.strip().split("=", 1) for kv in auth.split(" ", 1)[1].split(",")
        )
        amz_date = self.headers["x-amz-date"]
        datestamp = amz_date[:8]
        payload_hash = self.headers["x-amz-content-sha256"]
        if payload_hash != hashlib.sha256(payload).hexdigest():
            return False
        path, _, qs = self.path.partition("?")
        query = urllib.parse.parse_qsl(qs, keep_blank_values=True)
        canonical_query = "&".join(
            f"{urllib.parse.quote(k, safe='')}={urllib.parse.quote(v, safe='')}"
            for k, v in sorted(query)
        )
        headers = {
            "host": self.headers["Host"],
            "x-amz-content-sha256": payload_hash,
            "x-amz-date": amz_date,
        }
        signed = ";".join(sorted(headers))
        canonical_headers = "".join(f"{k}:{headers[k]}\n" for k in sorted(headers))
        creq = "\n".join(
            [self.command, path, canonical_query, canonical_headers, signed, payload_hash]
        )
        scope = f"{datestamp}/{REGION}/s3/aws4_request"
        sts = "\n".join(
            ["AWS4-HMAC-SHA256", amz_date, scope,
             hashlib.sha256(creq.encode()).hexdigest()]
        )
        k = hmac.new(("AWS4" + SECRET).encode(), datestamp.encode(), hashlib.sha256).digest()
        for step in (REGION, "s3", "aws4_request"):
            k = hmac.new(k, step.encode(), hashlib.sha256).digest()
        sig = hmac.new(k, sts.encode(), hashlib.sha256).hexdigest()
        return hmac.compare_digest(sig, parts["Signature"].strip())

    def _handle(self):
        length = int(self.headers.get("Content-Length") or 0)
        payload = self.rfile.read(length) if length else b""
        if not self._verify_sig(payload):
            self.send_response(403)
            self.end_headers()
            self.wfile.write(b"<Error><Code>SignatureDoesNotMatch</Code></Error>")
            return
        path, _, qs = self.path.partition("?")
        key = path.lstrip("/").split("/", 1)
        key = key[1] if len(key) > 1 else ""
        store = type(self).objects
        if self.command == "PUT":
            store[key] = payload
            self.send_response(200); self.end_headers()
        elif self.command == "DELETE":
            store.pop(key, None)
            self.send_response(204); self.end_headers()
        elif self.command == "GET" and key:
            if key not in store:
                self.send_response(404); self.end_headers(); return
            self.send_response(200); self.end_headers()
            self.wfile.write(store[key])
        elif self.command == "GET":
            prefix = dict(urllib.parse.parse_qsl(qs)).get("prefix", "")
            items = "".join(
                f"<Contents><Key>{k}</Key><Size>{len(v)}</Size>"
                f"<LastModified>2026-01-01T00:00:00Z</LastModified></Contents>"
                for k, v in sorted(store.items()) if k.startswith(prefix)
            )
            body = f"<ListBucketResult>{items}</ListBucketResult>".encode()
            self.send_response(200); self.end_headers()
            self.wfile.write(body)

    do_PUT = do_GET = do_DELETE = _handle

    def log_message(self, *a):
        pass


@pytest.fixture
def s3(tmp_path):
    srv = HTTPServer(("127.0.0.1", 0), _StubS3)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    _StubS3.objects = {}
    client = S3Client(
        "bkt", region=REGION, access_key=ACCESS, secret_key=SECRET,
        endpoint_url=f"http://127.0.0.1:{srv.server_port}",
    )
    yield client
    srv.shutdown()


def test_sigv4_roundtrip(s3):
    s3.put_object("a/b.snapshot", b"hello")
    assert s3.get_object("a/b.snapshot") == b"hello"
    objs = s3.list_objects("a/")
    assert objs == [{"key": "a/b.snapshot", "size": 5,
                     "last_modified": "2026-01-01T00:00:00Z"}]
    s3.delete_object("a/b.snapshot")
    assert s3.list_objects("a/") == []


def test_bad_secret_rejected(s3):
    bad = S3Client("bkt", region=REGION, access_key=ACCESS, secret_key="wrong",
                   endpoint_url=s3.endpoint)
    with pytest.raises(ObjectStoreError, match="403"):
        bad.put_object("x", b"data")


def test_toc_snapshots_mirror_to_s3(s3, tmp_path):
    from qdrant_tpu.api.toc import TableOfContent

    toc = TableOfContent(str(tmp_path / "st"))
    # inject the backend (config path covered by settings wiring)
    from qdrant_tpu.storage.object_store import S3SnapshotStorage

    store = S3SnapshotStorage.__new__(S3SnapshotStorage)
    store.client = s3
    toc.snapshot_store = store
    toc.create_collection("sc", {"vectors": {"size": 4, "distance": "Dot"}})
    toc.get_collection("sc").upsert([{"id": 1, "vectors": {"": [1, 0, 0, 0]}}])
    snap = toc.create_snapshot("sc")
    # uploaded to the bucket
    assert any(k.startswith("sc/") for k in _StubS3.objects)
    listed = toc.list_snapshots("sc")
    assert listed[0]["name"] == snap["name"]
    # remote-only recovery: wipe the local copy, snapshot_file re-fetches
    import os
    local = os.path.join(toc.snapshots_path, "sc", snap["name"])
    os.remove(local)
    path = toc.snapshot_file("sc", snap["name"])
    assert os.path.getsize(path) == snap["size"]
    assert toc.delete_snapshot("sc", snap["name"])
    assert toc.list_snapshots("sc") == []
    toc.close()
