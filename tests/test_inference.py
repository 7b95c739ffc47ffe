"""Remote inference client: Document/Image/InferenceObject inputs embed via
an HTTP service at ingest (pre-WAL) and query time (reference:
src/common/inference/service.rs + update_requests.rs)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from qdrant_tpu.utils import inference


class _StubInference(BaseHTTPRequestHandler):
    requests_seen = []

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        type(self).requests_seen.append(body)
        embeddings = []
        for inp in body["inputs"]:
            # deterministic fake model: crc-seeded unit direction (stable
            # across processes, unlike salted hash())
            import zlib

            rng = np.random.default_rng(zlib.crc32(str(inp["data"]).encode()))
            v = rng.standard_normal(4)
            embeddings.append((v / np.linalg.norm(v)).tolist())
        out = json.dumps({"embeddings": embeddings}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):
        pass


@pytest.fixture
def stub_service():
    srv = HTTPServer(("127.0.0.1", 0), _StubInference)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _StubInference.requests_seen = []
    inference.configure(f"http://127.0.0.1:{srv.server_port}/infer")
    yield srv
    inference.configure(None)
    srv.shutdown()


def test_document_image_object_roundtrip(stub_service, tmp_path):
    from qdrant_tpu.api.toc import TableOfContent

    toc = TableOfContent(str(tmp_path / "s"))
    toc.create_collection("inf", {"vectors": {"size": 4, "distance": "Cosine"}})
    coll = toc.get_collection("inf")
    coll.upsert([
        {"id": 1, "vectors": {"": {"text": "hello world", "model": "my-model"}}},
        {"id": 2, "vectors": {"": {"image": "http://x/cat.png", "model": "clip"}}},
        {"id": 3, "vectors": {"": {"object": {"k": 1}, "model": "custom"}}},
    ])
    assert len(_StubInference.requests_seen) == 3
    assert _StubInference.requests_seen[0]["inference"] == "update"
    assert _StubInference.requests_seen[0]["inputs"][0]["data_type"] == "text"
    assert _StubInference.requests_seen[1]["inputs"][0]["data_type"] == "image"
    assert _StubInference.requests_seen[2]["inputs"][0]["data_type"] == "object"

    # stored as real vectors — retrievable and searchable
    from qdrant_tpu.collection.query import QueryExecutor, QueryRequest

    ex = QueryExecutor(coll, toc)
    hits = ex.query(QueryRequest({
        "query": {"text": "hello world", "model": "my-model"}, "limit": 1}))
    assert hits[0]["id"] == 1
    assert _StubInference.requests_seen[-1]["inference"] == "search"
    toc.close()


def test_bm25_documents_stay_local(stub_service, tmp_path):
    from qdrant_tpu.api.toc import TableOfContent

    toc = TableOfContent(str(tmp_path / "s"))
    toc.create_collection("bm", {"sparse_vectors": {"text": {}}})
    coll = toc.get_collection("bm")
    coll.upsert([{"id": 1, "vectors": {"text": {"text": "local words", "model": "bm25"}}}])
    assert _StubInference.requests_seen == []  # never left the node
    toc.close()


def test_unconfigured_service_clean_error(tmp_path):
    inference.configure(None)
    from qdrant_tpu.api.toc import TableOfContent
    from qdrant_tpu.utils.inference import InferenceError

    toc = TableOfContent(str(tmp_path / "s"))
    toc.create_collection("e", {"vectors": {"size": 4, "distance": "Dot"}})
    with pytest.raises(InferenceError, match="not configured"):
        toc.get_collection("e").upsert(
            [{"id": 1, "vectors": {"": {"image": "x.png", "model": "clip"}}}]
        )
    assert InferenceError.status_code == 400
    toc.close()
