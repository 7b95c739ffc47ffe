import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qdrant_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.make_mesh(8)


def test_sharded_exact_search_matches_global(mesh8):
    rng = np.random.default_rng(0)
    s, np_local, d, b, k = 8, 128, 16, 4, 10
    data = rng.normal(size=(s * np_local, d)).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    valid = np.ones(s * np_local, dtype=bool)
    valid[5] = False

    scores, gids = pmesh.sharded_exact_search(
        mesh8, jnp.asarray(queries), jnp.asarray(data), jnp.asarray(valid), "Dot", k
    )
    gids = np.asarray(gids)

    exact = queries @ data.T
    exact[:, ~valid] = -np.inf
    want = np.argsort(-exact, axis=1)[:, :k]
    for qi in range(b):
        assert set(gids[qi].tolist()) == set(want[qi].tolist())


def test_sharded_hnsw_search_runs(mesh8):
    rng = np.random.default_rng(1)
    s, np_local, d, b, k, m0 = 8, 64, 8, 4, 5, 8
    data = rng.normal(size=(s * np_local, d)).astype(np.float32)
    # ring-of-neighbors local graph per shard (sanity structure, not quality)
    links = np.full((s * np_local, m0), -1, dtype=np.int32)
    for shard in range(s):
        for i in range(np_local):
            for j in range(m0):
                links[shard * np_local + i, j] = (i + j + 1) % np_local
    entries = np.zeros(s, dtype=np.int32)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    fmask = np.ones(s * np_local, dtype=bool)

    scores, gids = pmesh.sharded_hnsw_search(
        mesh8,
        jnp.asarray(queries),
        jnp.asarray(data),
        jnp.asarray(links),
        jnp.asarray(entries),
        jnp.asarray(fmask),
        "Euclid",
        ef=32,
        k=k,
    )
    gids = np.asarray(gids)
    assert gids.shape == (b, k)
    assert (gids >= 0).all()
    # full connectivity per shard → must match exact global top-k
    exact = -((queries[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    want = np.argsort(-exact, axis=1)[:, :k]
    hits = sum(
        len(set(gids[q].tolist()) & set(want[q].tolist())) for q in range(b)
    )
    assert hits / (b * k) >= 0.8


def test_sharded_build_step_runs(mesh8):
    rng = np.random.default_rng(2)
    s, np_local, d, bb, m0 = 8, 64, 8, 16, 8
    data = rng.normal(size=(s * np_local, d)).astype(np.float32)
    links = np.full((s * np_local, m0), -1, dtype=np.int32)
    for shard in range(s):
        for i in range(np_local):
            for j in range(m0):
                links[shard * np_local + i, j] = (i + j + 1) % np_local
    entries = np.zeros(s, dtype=np.int32)
    batch = rng.normal(size=(s * bb, d)).astype(np.float32)

    sel = pmesh.sharded_build_step(
        mesh8,
        jnp.asarray(batch),
        jnp.asarray(data),
        jnp.asarray(links),
        jnp.asarray(entries),
        "Euclid",
        ef_construct=32,
        m=m0,
    )
    sel = np.asarray(sel)
    assert sel.shape == (s * bb, m0)
    assert (sel >= -1).all() and (sel < np_local).all()


def test_scan_index_auto_mesh():
    """With >1 device visible, ScanIndex shards the scan over the mesh and
    the SPMD path returns exact-rescored results."""
    import numpy as np

    from qdrant_tpu.ops.scan import ScanIndex

    assert jax.device_count() > 1
    rng = np.random.default_rng(0)
    n, d = 70_000, 24
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    idx = ScanIndex(vecs, euclid=True)
    assert idx.mesh is not None  # auto-sharded
    q = vecs[1234:1238] + 0.01 * rng.standard_normal((4, d)).astype(np.float32)
    s, ids = idx.search(q, k=5)
    diff = vecs - q[0]
    exact0 = np.argsort((diff * diff).sum(axis=1))[:5]
    assert ids[0, 0] == 1234
    assert set(ids[0].tolist()) == set(int(x) for x in exact0)
    # scores are the exact euclid form
    np.testing.assert_allclose(
        s[0, 0], -((vecs[1234] - q[0]) ** 2).sum(), rtol=1e-4
    )
