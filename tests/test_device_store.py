"""DeviceVectorStore (device-native sealed store) behavior.

Covers the round-4 advisor findings: deletions must reach the static device
mask, and the HNSW inline-table clip bound must be sampled via get_batch
(store._data is empty for device-native stores).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qdrant_tpu.index.hnsw import HnswIndex
from qdrant_tpu.index.plain import PlainIndex
from qdrant_tpu.storage.vectors import DeviceVectorStore
from qdrant_tpu.types import Distance, HnswConfig


def _make_store(rng, n=64, d=8, scale=1.0, distance=Distance.DOT):
    data = scale * rng.normal(size=(n, d)).astype(np.float32)
    store = DeviceVectorStore(jnp.asarray(data), distance, count=n)
    return store, data


def test_device_store_sealed():
    rng = np.random.default_rng(0)
    store, _ = _make_store(rng)
    with pytest.raises(NotImplementedError):
        store.add(np.zeros((1, 8), np.float32))
    with pytest.raises(NotImplementedError):
        store.set(0, np.zeros(8, np.float32))


def test_device_store_delete_updates_device_mask():
    rng = np.random.default_rng(1)
    store, data = _make_store(rng, n=32, d=8, distance=Distance.EUCLID)
    q = data[5:6]  # query equal to row 5: row 5 is its own top hit (euclid)
    _, ids = PlainIndex(store).search(q, k=1)
    assert ids[0, 0] == 5
    assert store.delete(5)
    # the static device mask must reflect the deletion without any caller-
    # provided filter: direct small-store search must not return row 5
    _, mask = store.device_block()
    assert not bool(np.asarray(mask)[5])
    _, ids = PlainIndex(store).search(q, k=3)
    assert 5 not in ids[0].tolist()
    assert store.deleted_count == 1
    assert not store.delete(5)  # idempotent


def test_device_store_get_batch_roundtrip():
    rng = np.random.default_rng(2)
    store, data = _make_store(rng, n=16, d=4)
    got = store.get_batch(np.asarray([3, 0, 15]))
    np.testing.assert_allclose(got, data[[3, 0, 15]], rtol=1e-6)

    # host_fetch takes precedence when provided
    calls = []

    def fetch(offs):
        calls.append(np.asarray(offs))
        return data[np.asarray(offs)]

    store2 = DeviceVectorStore(
        jnp.asarray(data), Distance.DOT, count=16, host_fetch=fetch
    )
    got2 = store2.get_batch(np.asarray([1, 2]))
    np.testing.assert_allclose(got2, data[[1, 2]], rtol=1e-6)
    assert len(calls) == 1


def test_inline_clip_bound_sampled_from_device_store(monkeypatch):
    """The inline SQ clip bound must come from the actual data (via
    get_batch), not from the empty inherited _data array: data scaled to
    |v|~50 must produce a bound ≫ the 1.0 fallback that saturated codes."""
    monkeypatch.setenv("QDRANT_TPU_INLINE", "force")
    rng = np.random.default_rng(3)
    store, _ = _make_store(rng, n=256, d=8, scale=50.0)
    idx = HnswIndex(store, HnswConfig(m=4, ef_construct=16), seed=1)
    idx.build(batch_size=64)
    state = idx._inline_state()
    if state is None:
        pytest.skip("inline table unavailable on this backend")
    # bound = 0.99-quantile of |v|; with sigma=50 data it must be far from 1.0
    assert state["scale"] * 127.0 > 20.0
