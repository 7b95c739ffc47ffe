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


def test_scan_search_tq_flat_matches_dense_tq():
    """Packed TQ flat scan == dense score_tq reconstruction scoring.

    The flat kernel unpacks `pack` level indices per byte on device and
    scores via Lloyd-Max lookup; the dense path materializes the bf16
    reconstruction matrix. Same math → same candidates and scores."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qdrant_tpu.ops.quantization import TurboQuantized, _lloyd_max, score_tq
    from qdrant_tpu.ops.scan import scan_search_tq_flat

    rng = np.random.default_rng(1)
    n, d, b, blk, k = 3000, 48, 4, 512, 16
    data = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)

    for bits, pack, bits_w in [(4, 2, 4), (2, 4, 2), (1, 8, 1)]:
        tq = TurboQuantized.encode(data, bits=bits)
        packed, scales, norms, levels, n_pad = tq.flat_device(blk)
        assert packed.shape == (n_pad, tq.codes.shape[1] // pack)
        mask = np.zeros(n_pad, np.int8)
        mask[:n] = 1
        q_rot = tq.rotate_queries(q)
        s_flat, i_flat = scan_search_tq_flat(
            jnp.asarray(q_rot),
            jnp.asarray((q * q).sum(1).astype(np.float32)),
            packed, scales, norms, levels,
            jnp.asarray(mask), blk, k,
            euclid=True, pack=pack, bits_w=bits_w,
        )
        recon, sc_d, nr_d = tq.device()
        dense = np.asarray(score_tq(
            jnp.asarray(q_rot), recon, sc_d, nr_d, "Euclid"))
        truth = np.argsort(-dense, axis=1)[:, :k]
        s_flat, i_flat = np.asarray(s_flat), np.asarray(i_flat)
        for r in range(b):
            overlap = len(set(i_flat[r].tolist()) & set(truth[r].tolist()))
            assert overlap >= k - 1, (bits, r, overlap)
            np.testing.assert_allclose(
                np.sort(s_flat[r]), np.sort(dense[r, truth[r]]),
                rtol=2e-2, atol=1e-2)
