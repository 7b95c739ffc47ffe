import numpy as np

from qdrant_tpu.ops.scan import ScanIndex
from qdrant_tpu.index.plain import PlainIndex, SCAN_THRESHOLD
from qdrant_tpu.storage.vectors import DenseVectorStore
from qdrant_tpu.types import Distance


def test_scan_index_recall_and_scores():
    rng = np.random.default_rng(0)
    n, d, b, k = 5000, 32, 16, 10
    data = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    idx = ScanIndex(data, euclid=True, block=256)

    s, ids = idx.search(q, k)
    exact = -((q[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    want = np.argsort(-exact, axis=1)[:, :k]
    hits = sum(len(set(ids[r].tolist()) & set(want[r].tolist())) for r in range(b))
    assert hits / (b * k) >= 0.9  # group-collision loss only
    # returned scores match exact scores of returned ids (bf16 tolerance)
    for r in range(b):
        for c in range(k):
            np.testing.assert_allclose(
                s[r, c], exact[r, ids[r, c]], rtol=2e-2, atol=2e-1
            )


def test_scan_index_mask():
    rng = np.random.default_rng(1)
    n, d = 2000, 16
    data = rng.normal(size=(n, d)).astype(np.float32)
    valid = np.zeros(n, dtype=bool)
    valid[1000:] = True
    idx = ScanIndex(data, valid_mask=valid, euclid=False, block=256)
    q = rng.normal(size=(4, d)).astype(np.float32)
    _, ids = idx.search(q, 20)
    got = ids[ids >= 0]
    assert np.all(got >= 1000)


def test_scan_index_dot_matches_exact():
    rng = np.random.default_rng(2)
    n, d = 3000, 24
    data = rng.normal(size=(n, d)).astype(np.float32)
    idx = ScanIndex(data, euclid=False, block=128)  # groups of 1 → exact
    q = rng.normal(size=(8, d)).astype(np.float32)
    _, ids = idx.search(q, 5)
    want = np.argsort(-(q @ data.T), axis=1)[:, :5]
    for r in range(8):
        assert set(ids[r].tolist()) == set(want[r].tolist())


def test_plain_index_scan_path(monkeypatch):
    import qdrant_tpu.index.plain as plain_mod

    monkeypatch.setattr(plain_mod, "SCAN_THRESHOLD", 1000)
    rng = np.random.default_rng(3)
    n, d = 2048, 32
    data = rng.normal(size=(n, d)).astype(np.float32)
    store = DenseVectorStore(d, Distance.COSINE)
    store.add(data)
    store.delete(5)
    idx = plain_mod.PlainIndex(store)
    q = data[:4]
    scores, ids = idx.search(q, k=5)
    # with rescore, the self-match must rank first for cosine
    assert ids[0, 0] == 0 and ids[1, 0] == 1
    mask = np.zeros(n, dtype=bool)
    mask[:100] = True
    _, ids2 = idx.search(q, k=5, filter_mask=mask)
    got = ids2[ids2 >= 0]
    assert np.all(got < 100)
    assert 5 not in got


def test_scan_search_sq_flat_matches_scan_variant():
    """Zero-copy fori_loop SQ scan == lax.scan SQ scan (same candidates)."""
    import jax.numpy as jnp
    import numpy as np

    from qdrant_tpu.ops.quantization import ScalarQuantized
    from qdrant_tpu.ops.scan import scan_search_sq, scan_search_sq_flat

    rng = np.random.default_rng(0)
    n, d, b, blk = 4096 * 5, 32, 8, 1024  # 5 blocks: exercises the tail loop
    data = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    quant = ScalarQuantized.encode(data, 0.99)
    n_pad = (n + blk - 1) // blk * blk
    codes = np.zeros((n_pad, d), np.int8)
    codes[:n] = quant.codes
    norms = np.zeros(n_pad, np.float32)
    norms[:n] = quant.norms_sq
    mask = np.zeros(n_pad, np.int8)
    mask[:n] = 1
    args = (
        jnp.asarray(quant.encode_queries(q)),
        jnp.asarray((q * q).sum(1).astype(np.float32)),
        jnp.asarray(codes),
        jnp.asarray(norms),
        jnp.float32(quant.scale),
        jnp.asarray(mask),
        blk,
        16,
    )
    s1, i1 = scan_search_sq(*args, euclid=True)
    s2, i2 = scan_search_sq_flat(*args, euclid=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
