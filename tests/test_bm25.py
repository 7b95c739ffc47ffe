"""BM25 inference (reference: lib/bm25 + inference service)."""

import numpy as np

from qdrant_tpu.collection.collection import Collection
from qdrant_tpu.collection.query import QueryExecutor, QueryRequest
from qdrant_tpu.types import CollectionParams, SparseVectorParams
from qdrant_tpu.utils.bm25 import Bm25, murmur3_32


def test_murmur3_known_vectors():
    # public murmur3_32 test vectors (seed 0)
    assert murmur3_32(b"") == 0
    assert murmur3_32(b"hello") == 0x248BFA47
    assert murmur3_32(b"hello, world") == 0x149BBB7F


def test_bm25_embedding_properties():
    bm = Bm25()
    doc = bm.embed_document("the quick brown fox jumps over the lazy dog dog dog")
    assert len(doc.indices) == len(set(doc.indices))
    assert sorted(doc.indices) == list(doc.indices)
    # repeated term saturates but weighs more than singletons
    dog_id = bm.token_id("dog")
    dog_w = doc.values[doc.indices.index(dog_id)]
    fox_w = doc.values[doc.indices.index(bm.token_id("fox"))]
    assert dog_w > fox_w
    q = bm.embed_query("lazy dogs")  # stemming matches dog/dogs
    assert bm.token_id("dog") in q.indices  # via porter stem


def test_text_document_upsert_and_query(tmp_path):
    params = CollectionParams(
        sparse_vectors={"text": SparseVectorParams(modifier="idf")}
    )
    c = Collection("bm", str(tmp_path / "bm"), params)
    docs = [
        "TPU accelerators multiply matrices quickly",
        "dogs chase cats around the garden",
        "vector databases index embeddings for search",
    ]
    c.upsert(
        [
            {"id": i, "vectors": {"text": {"text": d, "model": "bm25"}}}
            for i, d in enumerate(docs)
        ]
    )
    ex = QueryExecutor(c)
    out = ex.query(
        QueryRequest(
            {"query": {"text": "searching vector embeddings"}, "using": "text", "limit": 3}
        )
    )
    assert out[0]["id"] == 2
    out = ex.query(
        QueryRequest({"query": {"text": "a dog in the garden"}, "using": "text", "limit": 3})
    )
    assert out[0]["id"] == 1
    c.close()
