"""Inline link+code beam search — pack/bitcast roundtrip + recall (CPU)."""
import numpy as np
import jax.numpy as jnp
import jax

from qdrant_tpu.ops.hnsw_inline import beam_search_inline, pack_linkcodes


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    n, m, d = 64, 8, 128
    links = rng.integers(-1, n, size=(n, m)).astype(np.int32)
    codes = rng.integers(-127, 127, size=(n, d)).astype(np.int8)
    norms = rng.normal(size=n).astype(np.float32) ** 2
    table = pack_linkcodes(links, codes, norms)
    t = jnp.asarray(table)
    ids = jax.lax.bitcast_convert_type(
        t[:, : 4 * m].reshape(n, m, 4), jnp.int32
    )
    assert np.array_equal(np.asarray(ids), links)
    nrm = jax.lax.bitcast_convert_type(
        t[:, 4 * m : 8 * m].reshape(n, m, 4), jnp.float32
    )
    ok = links >= 0
    assert np.allclose(np.asarray(nrm)[ok], norms[np.maximum(links, 0)][ok])
    cc = np.asarray(t[:, 8 * m :]).reshape(n, m, d)
    assert np.array_equal(cc[0, 0], codes[links[0, 0]] if links[0, 0] >= 0 else np.zeros(d, np.int8))


def test_inline_beam_recall_small():
    rng = np.random.default_rng(1)
    n, d, m, k = 512, 128, 16, 10
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    # build a true knn graph (brute force) — ideal adjacency
    sims = vecs @ vecs.T
    np.fill_diagonal(sims, -np.inf)
    links = np.argsort(-sims, axis=1)[:, :m].astype(np.int32)
    scale = float(np.abs(vecs).max() / 127.0)
    codes = np.clip(np.round(vecs / scale), -127, 127).astype(np.int8)
    norms = (vecs * vecs).sum(1).astype(np.float32)
    table = pack_linkcodes(links, codes, norms)

    b = 8
    q = rng.normal(size=(b, d)).astype(np.float32)
    q_i8 = np.clip(np.round(q / scale), -127, 127).astype(np.int8)
    compact = np.arange(n, dtype=np.int32)
    entries = np.zeros((b, 1), dtype=np.int32)
    s, ids = beam_search_inline(
        jnp.asarray(q), jnp.asarray(q_i8), jnp.asarray(table),
        jnp.float32(scale * scale), jnp.asarray(compact), jnp.asarray(vecs),
        jnp.asarray(entries), None,
        m=m, d=d, ef=64, iters=64, expand=4, euclid=False, k=k,
    )
    ids = np.asarray(ids)
    s = np.asarray(s)
    truth = np.argsort(-(q @ vecs.T), axis=1)[:, :k]
    hits = sum(len(set(ids[r].tolist()) & set(truth[r].tolist())) for r in range(b))
    assert hits / (b * k) >= 0.9
    # scores are exact f32 (rescored)
    for r in range(b):
        if ids[r, 0] >= 0:
            assert abs(s[r, 0] - float(q[r] @ vecs[ids[r, 0]])) < 1e-3


def test_inline_beam_filter():
    rng = np.random.default_rng(2)
    n, d, m, k = 256, 128, 16, 5
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    sims = vecs @ vecs.T
    np.fill_diagonal(sims, -np.inf)
    links = np.argsort(-sims, axis=1)[:, :m].astype(np.int32)
    scale = float(np.abs(vecs).max() / 127.0)
    codes = np.clip(np.round(vecs / scale), -127, 127).astype(np.int8)
    norms = (vecs * vecs).sum(1).astype(np.float32)
    table = pack_linkcodes(links, codes, norms)
    allowed = np.zeros(n, dtype=bool)
    allowed[: n // 2] = True
    fbias = np.where(allowed, 0.0, -np.inf).astype(np.float32)
    b = 4
    q = rng.normal(size=(b, d)).astype(np.float32)
    q_i8 = np.clip(np.round(q / scale), -127, 127).astype(np.int8)
    s, ids = beam_search_inline(
        jnp.asarray(q), jnp.asarray(q_i8), jnp.asarray(table),
        jnp.float32(scale * scale), jnp.asarray(np.arange(n, dtype=np.int32)),
        jnp.asarray(vecs), jnp.asarray(np.zeros((b, 1), dtype=np.int32)),
        jnp.asarray(fbias),
        m=m, d=d, ef=32, iters=48, expand=4, euclid=False, k=k,
    )
    ids = np.asarray(ids)
    assert (ids[ids >= 0] < n // 2).all()
