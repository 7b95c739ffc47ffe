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


def test_sharded_hnsw_index_recall_parity(mesh8):
    """Product-path multi-device graph serving: ShardedHnswIndex (per-shard
    sub-graphs + SPMD fan-out) must match single-device HnswIndex recall on
    the same store — the upgrade of the old "runs"-only assertion."""
    from qdrant_tpu.index.hnsw import HnswIndex, ShardedHnswIndex
    from qdrant_tpu.storage.vectors import DenseVectorStore
    from qdrant_tpu.types import Distance, HnswConfig

    rng = np.random.default_rng(7)
    n, d, k = 12_000, 32, 10
    centers = rng.normal(size=(64, d)).astype(np.float32)
    data = centers[rng.integers(0, 64, n)] + 0.3 * rng.normal(
        size=(n, d)
    ).astype(np.float32)
    queries = centers[rng.integers(0, 64, 32)] + 0.3 * rng.normal(
        size=(32, d)
    ).astype(np.float32)
    store = DenseVectorStore(d, Distance.EUCLID)
    store.add(data)

    cfg = HnswConfig(m=12, ef_construct=96)
    single = HnswIndex(store, cfg, seed=3)
    single.build()
    sharded = ShardedHnswIndex(store, cfg, seed=3, mesh=mesh8)
    sharded.build()
    assert sharded.n_shards == 8

    exact = -(
        ((queries[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    )
    want = np.argsort(-exact, axis=1)[:, :k]

    def recall(ids):
        return sum(
            len(set(ids[q].tolist()) & set(want[q].tolist()))
            for q in range(len(want))
        ) / want.size

    _, ids_single = single.search(queries, k, ef=96)
    _, ids_sharded = sharded.search(queries, k, ef=96)
    r_single, r_sharded = recall(ids_single), recall(ids_sharded)
    # sharded = 8 independent ef-beams + exact merge: parity or better
    assert r_sharded >= 0.9
    assert r_sharded >= r_single - 0.02

    # filtered parity: mask half the points
    fmask = np.zeros(n, dtype=bool)
    fmask[::2] = True
    exact_f = exact.copy()
    exact_f[:, ~fmask] = -np.inf
    want_f = np.argsort(-exact_f, axis=1)[:, :k]
    _, ids_f = sharded.search(queries, k, ef=128, filter_mask=fmask)
    got = set(ids_f.ravel().tolist()) - {-1}
    assert all(fmask[i] for i in got)
    hits = sum(
        len(set(ids_f[q].tolist()) & set(want_f[q].tolist()))
        for q in range(len(want_f))
    )
    assert hits / want_f.size >= 0.8


def test_sharded_hnsw_save_load(tmp_path, mesh8):
    from qdrant_tpu.index.hnsw import ShardedHnswIndex, load_hnsw_any
    from qdrant_tpu.storage.vectors import DenseVectorStore
    from qdrant_tpu.types import Distance, HnswConfig

    rng = np.random.default_rng(8)
    n, d, k = 4_000, 16, 5
    data = rng.normal(size=(n, d)).astype(np.float32)
    store = DenseVectorStore(d, Distance.DOT)
    store.add(data)
    cfg = HnswConfig(m=8, ef_construct=64)
    idx = ShardedHnswIndex(store, cfg, mesh=mesh8)
    idx.build()
    q = data[:8] + 0.01
    _, ids_before = idx.search(q, k, ef=64)
    idx.save(str(tmp_path / "g"))
    idx2 = load_hnsw_any(str(tmp_path / "g"), store, cfg)
    assert isinstance(idx2, ShardedHnswIndex)
    _, ids_after = idx2.search(q, k, ef=64)
    np.testing.assert_array_equal(ids_before, ids_after)


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


def test_sharded_hnsw_low_selectivity_and_empty_shard(mesh8):
    """Advisor high finding (round 4): sharded search results must be
    post-filtered host-side — entry points bypass the in-kernel filter, and
    an entirely-deleted shard slice must stay inert (entry -1), never
    leaking a zero pad row or a deleted/filtered-out id into the top-k."""
    from qdrant_tpu.index.hnsw import ShardedHnswIndex
    from qdrant_tpu.storage.vectors import DenseVectorStore
    from qdrant_tpu.types import Distance, HnswConfig

    rng = np.random.default_rng(11)
    n, d, k = 4_096, 16, 10
    data = rng.normal(size=(n, d)).astype(np.float32)
    store = DenseVectorStore(d, Distance.DOT)
    store.add(data)
    # wipe the 3rd shard slice completely: np_local = 4096/8 = 512
    np_local = 512
    for off in range(2 * np_local, 3 * np_local):
        store.delete(off)

    idx = ShardedHnswIndex(store, HnswConfig(m=8, ef_construct=64), mesh=mesh8)
    idx.build()
    assert idx.n_per_shard == np_local
    assert int(np.asarray(idx._entries)[2]) == -1  # empty shard is inert

    queries = data[rng.integers(0, n, 16)] + 0.05 * rng.normal(
        size=(16, d)
    ).astype(np.float32)

    # unfiltered: no deleted id may appear
    _, ids = idx.search(queries, k, ef=64)
    got = set(ids.ravel().tolist()) - {-1}
    assert all(not (2 * np_local <= i < 3 * np_local) for i in got)

    # 5% selectivity: every returned id matches the filter (entry points of
    # all 7 live shards are almost surely OUTSIDE the mask — pre-fix they
    # could land in the merged top-k)
    fmask = np.zeros(n, dtype=bool)
    fmask[rng.integers(0, n, n // 20)] = True
    _, ids_f = idx.search(queries, k, ef=128, filter_mask=fmask)
    got_f = set(ids_f.ravel().tolist()) - {-1}
    assert got_f, "filtered search returned nothing"
    assert all(fmask[i] for i in got_f)
