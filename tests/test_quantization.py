import numpy as np
import jax.numpy as jnp

from qdrant_tpu.ops import quantization as qops
from qdrant_tpu.types import Distance


def recall_at_k(approx_ids, exact_ids):
    hits = 0
    for a, e in zip(approx_ids, exact_ids):
        hits += len(set(a.tolist()) & set(e.tolist()))
    return hits / exact_ids.size


def test_sq_roundtrip_and_ranking():
    rng = np.random.default_rng(0)
    n, d, b, k = 2000, 64, 8, 10
    data = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    sq = qops.ScalarQuantized.encode(data)

    scores = np.asarray(
        qops.score_sq(
            jnp.asarray(sq.encode_queries(q)),
            jnp.asarray((q * q).sum(1).astype(np.float32)),
            *sq.device(),
            jnp.float32(sq.scale),
            "Dot",
        )
    )
    exact = q @ data.T
    approx_ids = np.argsort(-scores, axis=1)[:, :k]
    exact_ids = np.argsort(-exact, axis=1)[:, :k]
    assert recall_at_k(approx_ids, exact_ids) >= 0.85


def test_sq_euclid_ranking():
    rng = np.random.default_rng(1)
    n, d, b, k = 1000, 32, 4, 10
    data = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    sq = qops.ScalarQuantized.encode(data)
    scores = np.asarray(
        qops.score_sq(
            jnp.asarray(sq.encode_queries(q)),
            jnp.asarray((q * q).sum(1).astype(np.float32)),
            *sq.device(),
            jnp.float32(sq.scale),
            "Euclid",
        )
    )
    exact = -((q[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    approx_ids = np.argsort(-scores, axis=1)[:, :k]
    exact_ids = np.argsort(-exact, axis=1)[:, :k]
    assert recall_at_k(approx_ids, exact_ids) >= 0.8


def test_sq_save_load(tmp_path):
    rng = np.random.default_rng(2)
    data = rng.normal(size=(100, 16)).astype(np.float32)
    sq = qops.ScalarQuantized.encode(data)
    sq.save(str(tmp_path))
    loaded = qops.ScalarQuantized.load(str(tmp_path))
    np.testing.assert_array_equal(sq.codes, loaded.codes)
    assert sq.scale == loaded.scale


def test_bq_ranking():
    rng = np.random.default_rng(3)
    n, d, b, k = 1000, 512, 4, 10  # BQ needs high dim to rank well
    data = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    bq = qops.BinaryQuantized.encode(data)
    scores = np.asarray(qops.score_bq(jnp.asarray(q), bq.device(), "Cosine"))
    # normalized exact cosine
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    vn = data / np.linalg.norm(data, axis=1, keepdims=True)
    exact = qn @ vn.T
    approx_ids = np.argsort(-scores, axis=1)[:, : k * 4]  # with oversampling
    exact_ids = np.argsort(-exact, axis=1)[:, :k]
    hits = sum(
        len(set(a.tolist()) & set(e.tolist())) for a, e in zip(approx_ids, exact_ids)
    )
    # random gaussian data is BQ's worst case (real embeddings do far better);
    # this guards the kernel's sanity, not production recall
    assert hits / exact_ids.size >= 0.5


def test_bq_save_load(tmp_path):
    rng = np.random.default_rng(4)
    data = rng.normal(size=(50, 33)).astype(np.float32)  # odd dim
    bq = qops.BinaryQuantized.encode(data)
    bq.save(str(tmp_path))
    loaded = qops.BinaryQuantized.load(str(tmp_path))
    np.testing.assert_array_equal(bq.signs, loaded.signs)


def test_pq_ranking():
    rng = np.random.default_rng(5)
    n, d, b, k = 1500, 64, 4, 10
    data = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    pq = qops.ProductQuantized.encode(data, compression="x8", iters=8)
    lut = pq.query_lut(q, Distance.EUCLID)
    scores = np.asarray(qops.score_pq(jnp.asarray(lut), pq.device()))
    exact = -((q[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    approx_ids = np.argsort(-scores, axis=1)[:, : k * 3]
    exact_ids = np.argsort(-exact, axis=1)[:, :k]
    hits = sum(
        len(set(a.tolist()) & set(e.tolist())) for a, e in zip(approx_ids, exact_ids)
    )
    assert hits / exact_ids.size >= 0.6


def test_pq_save_load(tmp_path):
    rng = np.random.default_rng(6)
    data = rng.normal(size=(600, 32)).astype(np.float32)
    pq = qops.ProductQuantized.encode(data, compression="x16", iters=4)
    pq.save(str(tmp_path))
    loaded = qops.ProductQuantized.load(str(tmp_path))
    np.testing.assert_array_equal(pq.codes, loaded.codes)
    np.testing.assert_allclose(pq.codebooks, loaded.codebooks)


def test_tq_ranking_and_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    n, d, b, k = 1500, 96, 6, 10
    data = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    for bits, min_recall in ((4, 0.85), (2, 0.6), (1.5, 0.5), (1, 0.4)):
        tq = qops.TurboQuantized.encode(data, bits=bits)
        recon, scales, norms = tq.device()
        scores = np.asarray(
            qops.score_tq(jnp.asarray(tq.rotate_queries(q)), recon, scales, norms, "Dot")
        )
        exact = q @ data.T
        approx_ids = np.argsort(-scores, axis=1)[:, : k * 3]
        exact_ids = np.argsort(-exact, axis=1)[:, :k]
        hits = sum(
            len(set(a.tolist()) & set(e.tolist()))
            for a, e in zip(approx_ids, exact_ids)
        )
        assert hits / exact_ids.size >= min_recall, f"bits={bits}: {hits/exact_ids.size}"

    tq = qops.TurboQuantized.encode(data, bits=4)
    tq.save(str(tmp_path / "tq4"))
    loaded = qops.TurboQuantized.load(str(tmp_path / "tq4"))
    np.testing.assert_array_equal(tq.codes, loaded.codes)
    np.testing.assert_allclose(tq.scales, loaded.scales)
    tq2 = qops.TurboQuantized.encode(data, bits=1.5)
    tq2.save(str(tmp_path / "tq15"))
    loaded2 = qops.TurboQuantized.load(str(tmp_path / "tq15"))
    np.testing.assert_array_equal(tq2.codes, loaded2.codes)


def test_sq_large_segment_scan_path():
    """>=65536-point SQ segments route through the blocked int8 scan
    (ops/scan.py scan_search_sq) and still rescore to exact top-k."""
    import numpy as np

    from qdrant_tpu.storage.segment import Segment
    from qdrant_tpu.types import (
        CollectionParams,
        Distance,
        ScalarQuantizationConfig,
        VectorParams,
    )

    rng = np.random.default_rng(5)
    n, d = 70000, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    params = CollectionParams(
        vectors={
            "": VectorParams(
                size=d,
                distance=Distance.EUCLID,
                quantization_config=ScalarQuantizationConfig(quantile=0.99),
            )
        }
    )
    seg = Segment(params)
    for i in range(n):
        seg.upsert_point(i + 1, i, {"": vecs[i]})
    # encode SQ directly (skip the HNSW build — scan path under test)
    from qdrant_tpu.ops import quantization as qops

    seg.quantized[""] = qops.ScalarQuantized.encode(
        seg.dense[""].host_array, 0.99
    )
    q = vecs[123] + rng.standard_normal(d).astype(np.float32) * 0.01
    _, ids = seg.search_dense("", q[None], k=10)
    diff = vecs - q[None]
    exact = np.argsort((diff * diff).sum(axis=1))[:10]
    assert len(set(ids[0].tolist()) & set(int(i) for i in exact)) >= 8
