"""Embedded API (lib/edge analogue): full engine in-process, no server."""

import numpy as np

from qdrant_tpu.embedded import QdrantTpu


def test_embedded_end_to_end(tmp_path):
    with QdrantTpu(str(tmp_path / "db")) as db:
        db.create_collection(
            "docs",
            vectors={"size": 8, "distance": "Cosine"},
            sparse_vectors={"text": {"modifier": "idf"}},
        )
        rng = np.random.default_rng(0)
        data = rng.normal(size=(30, 8)).astype(np.float32)
        db.upsert(
            "docs",
            [
                {
                    "id": i,
                    "vector": {
                        "": data[i].tolist(),
                        "text": {"text": f"document number {i} about topic{i % 3}"},
                    },
                    "payload": {"topic": i % 3},
                }
                for i in range(30)
            ],
        )
        assert db.count("docs") == 30
        assert db.list_collections() == ["docs"]

        hits = db.search("docs", data[4].tolist(), limit=1)
        assert hits[0]["id"] == 4

        # filtered + payload
        hits = db.query(
            "docs",
            query=data[4].tolist(),
            filter={"must": [{"key": "topic", "match": {"value": 2}}]},
            limit=3,
            with_payload=True,
        )
        assert all(h["payload"]["topic"] == 2 for h in hits)

        # text (BM25) query against the sparse field
        hits = db.query("docs", query={"text": "topic1"}, using="text", limit=5)
        assert hits and all(h["id"] % 3 == 1 for h in hits)

        db.set_payload("docs", {"flag": True}, ids=[1, 2])
        assert db.count("docs", {"must": [{"key": "flag", "match": {"value": True}}]}) == 2

        db.delete("docs", ids=[0])
        assert db.count("docs") == 29
        page = db.scroll("docs", limit=3)
        assert [p["id"] for p in page] == [1, 2, 3]

    # persistence across embedded sessions
    with QdrantTpu(str(tmp_path / "db")) as db2:
        assert db2.count("docs") == 29


def test_embedded_in_memory():
    with QdrantTpu() as db:
        db.create_collection("m", vectors={"size": 4, "distance": "Dot"})
        db.upsert("m", [{"id": 1, "vector": [1, 2, 3, 4]}])
        assert db.count("m") == 1
