import numpy as np
import pytest

from qdrant_tpu.storage.segment import Segment, SearchParams
from qdrant_tpu.types import (
    CollectionParams,
    Datatype,
    Distance,
    Filter,
    HnswConfig,
    PayloadIndexParams,
    PayloadSchemaType,
    ScalarQuantizationConfig,
    SparseVector,
    SparseVectorParams,
    VectorParams,
    parse_filter,
)


def make_params(dim=16, distance=Distance.EUCLID, quant=None):
    return CollectionParams(
        vectors={"": VectorParams(size=dim, distance=distance, quantization_config=quant)},
        sparse_vectors={"text": SparseVectorParams()},
    )


def test_segment_upsert_search_roundtrip():
    rng = np.random.default_rng(0)
    seg = Segment(make_params())
    data = rng.normal(size=(100, 16)).astype(np.float32)
    for i in range(100):
        seg.upsert_point(i + 1, i, {"": data[i]}, {"city": "berlin" if i % 2 else "москва", "num": i})
    assert len(seg) == 100

    scores, ids = seg.search_dense("", data[:3], k=1)
    assert ids[:, 0].tolist() == [0, 1, 2]

    # idempotency: older op_num must not overwrite
    assert not seg.upsert_point(0, 5, {"": np.zeros(16, dtype=np.float32)})
    _, ids = seg.search_dense("", data[5:6], k=1)
    assert ids[0, 0] == 5


def test_segment_filter_search():
    rng = np.random.default_rng(1)
    seg = Segment(make_params())
    data = rng.normal(size=(200, 16)).astype(np.float32)
    for i in range(200):
        seg.upsert_point(i + 1, i, {"": data[i]}, {"group": f"g{i % 4}", "val": i})
    flt = parse_filter({"must": [{"key": "group", "match": {"value": "g1"}}]})
    scores, ids = seg.search_dense("", data[:2], k=5, flt=flt)
    valid = ids[ids >= 0]
    assert len(valid) > 0
    assert np.all(valid % 4 == 1)

    # range filter
    flt2 = parse_filter({"must": [{"key": "val", "range": {"gte": 100, "lt": 110}}]})
    _, ids2 = seg.search_dense("", data[:1], k=20, flt=flt2)
    valid2 = ids2[ids2 >= 0]
    assert set(valid2.tolist()) <= set(range(100, 110))


def test_segment_indexed_filter_matches_fallback():
    rng = np.random.default_rng(2)
    seg = Segment(make_params())
    data = rng.normal(size=(150, 16)).astype(np.float32)
    for i in range(150):
        seg.upsert_point(i + 1, i, {"": data[i]}, {"tag": f"t{i % 5}"})
    flt = parse_filter({"must": [{"key": "tag", "match": {"any": ["t0", "t3"]}}]})
    mask_scan = seg.filter_mask(flt).copy()
    seg.create_field_index("tag", PayloadIndexParams(type=PayloadSchemaType.KEYWORD))
    mask_idx = seg.filter_mask(flt)
    np.testing.assert_array_equal(mask_scan, mask_idx)


def test_segment_delete_and_payload_ops():
    rng = np.random.default_rng(3)
    seg = Segment(make_params())
    data = rng.normal(size=(50, 16)).astype(np.float32)
    for i in range(50):
        seg.upsert_point(i + 1, i, {"": data[i]}, {"a": {"b": i}})
    seg.delete_point(100, 10)
    assert len(seg) == 49
    _, ids = seg.search_dense("", data[10:11], k=1)
    assert ids[0, 0] != 10

    seg.set_payload(101, 11, {"c": "x"})
    assert seg.get_payload(11) == {"a": {"b": 11}, "c": "x"}
    seg.delete_payload_key(102, 11, "a.b")
    assert seg.get_payload(11) == {"a": {}, "c": "x"}
    seg.clear_payload(103, 11)
    assert seg.get_payload(11) == {}


def test_segment_sparse_search():
    seg = Segment(make_params())
    vecs = [
        SparseVector([1, 5, 9], [1.0, 2.0, 3.0]),
        SparseVector([1, 7], [5.0, 1.0]),
        SparseVector([5, 9], [1.0, 1.0]),
    ]
    for i, sv in enumerate(vecs):
        seg.upsert_point(i + 1, i, {"text": sv, "": np.zeros(16, dtype=np.float32)})
    q = SparseVector([1, 9], [1.0, 1.0])
    scores, ids = seg.search_sparse("text", [q], k=3)
    # expected: p0 = 1+3=4, p1 = 5, p2 = 1
    assert ids[0, 0] == 1 and ids[0, 1] == 0 and ids[0, 2] == 2
    np.testing.assert_allclose(scores[0], [5.0, 4.0, 1.0])


def test_segment_seal_with_hnsw_and_sq():
    rng = np.random.default_rng(4)
    params = make_params(
        dim=24,
        distance=Distance.COSINE,
        quant=ScalarQuantizationConfig(),
    )
    params.vectors[""].hnsw_config = HnswConfig(m=8, ef_construct=48, full_scan_threshold=10)
    seg = Segment(params)
    data = rng.normal(size=(500, 24)).astype(np.float32)
    for i in range(500):
        seg.upsert_point(i + 1, i, {"": data[i]})
    seg.build_indexes()
    assert "" in seg.hnsw and "" in seg.quantized

    # graph search
    scores, ids = seg.search_dense("", data[:5], k=1, params=SearchParams(hnsw_ef=64))
    assert (ids[:, 0] == np.arange(5)).mean() >= 0.8

    # quantized path forced (exact=False, no graph): drop graph
    seg.hnsw = {}
    scores, ids = seg.search_dense("", data[:5], k=1)
    assert (ids[:, 0] == np.arange(5)).mean() >= 0.8


def test_segment_save_load(tmp_path):
    rng = np.random.default_rng(5)
    seg = Segment(make_params())
    data = rng.normal(size=(80, 16)).astype(np.float32)
    for i in range(80):
        seg.upsert_point(i + 1, i, {"": data[i]}, {"k": i % 3})
    seg.create_field_index("k", PayloadIndexParams(type=PayloadSchemaType.INTEGER))
    seg.save(str(tmp_path / "seg"))
    loaded = Segment.load(str(tmp_path / "seg"))
    assert len(loaded) == 80
    assert loaded.get_payload(7) == {"k": 1}
    _, ids1 = seg.search_dense("", data[:2], k=3)
    _, ids2 = loaded.search_dense("", data[:2], k=3)
    np.testing.assert_array_equal(ids1, ids2)
    assert "k" in loaded.payload_index.indexed_fields()


def test_low_memory_mode_load(tmp_path):
    """low_memory_mode (reference config.yaml:49-63): a RAM-resident segment
    loads with its f32 truth downgraded to an on-disk memmap; searches still
    work; `disabled` restores normal loading."""
    from qdrant_tpu.storage.segment import low_memory_mode, set_low_memory_mode

    rng = np.random.default_rng(9)
    seg = Segment(make_params())
    data = rng.normal(size=(60, 16)).astype(np.float32)
    for i in range(60):
        seg.upsert_point(i + 1, i, {"": data[i]})
    seg.save(str(tmp_path / "seg"))

    assert low_memory_mode() == "disabled"
    with pytest.raises(ValueError):
        set_low_memory_mode("bogus")
    try:
        set_low_memory_mode("no_resident")
        loaded = Segment.load(str(tmp_path / "seg"))
        store = loaded.dense[""]
        assert store.on_disk
        assert isinstance(store._data, np.memmap)
        _, ids = loaded.search_dense("", data[:3], k=1)
        assert ids[:, 0].tolist() == [0, 1, 2]

        set_low_memory_mode("no_populate")
        loaded2 = Segment.load(str(tmp_path / "seg"))
        store2 = loaded2.dense[""]
        assert store2.on_disk and store2._dev is None
        _, ids2 = loaded2.search_dense("", data[:3], k=1)
        assert ids2[:, 0].tolist() == [0, 1, 2]
    finally:
        set_low_memory_mode("disabled")
    loaded3 = Segment.load(str(tmp_path / "seg"))
    assert not loaded3.dense[""].on_disk


def test_segment_seal_with_turbo_quantization(tmp_path):
    from qdrant_tpu.types import TurboQuantizationConfig

    rng = np.random.default_rng(6)
    params = make_params(dim=32, distance=Distance.COSINE, quant=TurboQuantizationConfig(bits="bits4"))
    seg = Segment(params)
    data = rng.normal(size=(300, 32)).astype(np.float32)
    for i in range(300):
        seg.upsert_point(i + 1, i, {"": data[i]})
    seg.build_indexes()
    assert "" in seg.quantized
    seg.hnsw = {}  # force quantized path
    _, ids = seg.search_dense("", data[:5], k=1)
    assert (ids[:, 0] == np.arange(5)).mean() >= 0.8
    # persistence roundtrip
    seg.save(str(tmp_path / "s"))
    loaded = Segment.load(str(tmp_path / "s"))
    loaded.hnsw = {}
    _, ids2 = loaded.search_dense("", data[:5], k=1)
    np.testing.assert_array_equal(ids[:, 0], ids2[:, 0])


def test_sparse_indexed_vs_plain_equivalence():
    """Device inverted-index search matches host brute force (reference:
    lib/sparse indexed_vs_plain_test.rs)."""
    rng = np.random.default_rng(21)
    seg = Segment(make_params())
    n, vocab, nnz = 300, 120, 12
    rows = []
    for i in range(n):
        dims = np.sort(rng.choice(vocab, size=nnz, replace=False))
        vals = rng.random(nnz).astype(np.float32) + 0.1
        rows.append((dims, vals))
        seg.upsert_point(
            i + 1,
            i,
            {
                "text": SparseVector(dims.tolist(), vals.tolist()),
                "": np.zeros(16, dtype=np.float32),
            },
        )
    for trial in range(5):
        qd = np.sort(rng.choice(vocab, size=8, replace=False))
        qv = rng.random(8).astype(np.float32)
        q = SparseVector(qd.tolist(), qv.tolist())
        scores, ids = seg.search_sparse("text", [q], k=10)
        # brute force
        brute = np.zeros(n, dtype=np.float64)
        qmap = dict(zip(qd.tolist(), qv.tolist()))
        for i, (dims, vals) in enumerate(rows):
            brute[i] = sum(qmap.get(int(d), 0.0) * v for d, v in zip(dims, vals))
        want = np.argsort(-brute, kind="stable")[:10]
        got = ids[0][ids[0] >= 0]
        assert set(got.tolist()) == set(want[: len(got)].tolist()), trial
        for rank, off in enumerate(got):
            np.testing.assert_allclose(scores[0][rank], brute[off], rtol=1e-4)


def test_on_disk_payload_gridstore(tmp_path):
    """on_disk_payload: payloads persist via the native page store and are
    served from disk after load (no payload msgpack in RAM)."""
    pytest.importorskip("ctypes")
    from qdrant_tpu.native import load as native_load

    if native_load() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(8)
    params = make_params()
    params.on_disk_payload = True
    seg = Segment(params)
    data = rng.normal(size=(50, 16)).astype(np.float32)
    for i in range(50):
        seg.upsert_point(i + 1, i, {"": data[i]}, {"k": i, "blob": "x" * (i * 10)})
    seg.save(str(tmp_path / "seg"))
    import os
    assert os.path.exists(str(tmp_path / "seg" / "payload_grid" / "gridstore.bin"))
    loaded = Segment.load(str(tmp_path / "seg"))
    from qdrant_tpu.storage.payload import GridPayloadStorage
    assert isinstance(loaded.payload_storage, GridPayloadStorage)
    assert loaded.get_payload(7) == {"k": 7, "blob": "x" * 70}
    # filters still work over the on-disk payloads
    flt = parse_filter({"must": [{"key": "k", "range": {"gte": 10, "lt": 12}}]})
    _, ids = loaded.search_dense("", data[10:11], k=3, flt=flt)
    assert 10 in ids[0].tolist()
    # mutations write through
    loaded.set_payload(100, 7, {"extra": True}, None)
    assert loaded.get_payload(7)["extra"] is True


def test_segment_format_versioning(tmp_path):
    """Storage format version: stamped on save, migrated on load, newer
    formats refused (reference: StorageVersion + data-compat e2e tests)."""
    import json
    import os

    import pytest

    from qdrant_tpu.storage.segment import (
        SEGMENT_FORMAT_VERSION,
        Segment,
        SegmentFormatError,
    )
    from qdrant_tpu.types import CollectionParams, Distance, VectorParams

    params = CollectionParams(
        vectors={"": VectorParams(size=4, distance=Distance.DOT)}
    )
    seg = Segment(params)
    seg.upsert_point(1, 1, {"": np.asarray([1.0, 0, 0, 0], np.float32)}, {})
    path = str(tmp_path / "seg")
    seg.save(path)
    meta = json.load(open(os.path.join(path, "segment.json")))
    assert meta["format_version"] == SEGMENT_FORMAT_VERSION

    # v1 (un-versioned) metas load through the migration hook
    del meta["format_version"]
    json.dump(meta, open(os.path.join(path, "segment.json"), "w"))
    seg2 = Segment.load(path)
    assert len(seg2) == 1

    # a FUTURE format is refused with a clear error, not misread
    meta["format_version"] = SEGMENT_FORMAT_VERSION + 1
    json.dump(meta, open(os.path.join(path, "segment.json"), "w"))
    with pytest.raises(SegmentFormatError, match="newer than this build"):
        Segment.load(path)


def test_segment_graph_crossover_dispatch(monkeypatch):
    """Below GRAPH_CROSSOVER_ROWS an unfiltered search takes the exact
    scan even when a graph exists (measured: the MXU scan is faster AND
    exact under the crossover); params.hnsw_ef forces the graph."""
    from qdrant_tpu.storage import segment as seg_mod

    rng = np.random.default_rng(11)
    params = make_params(dim=16, distance=Distance.EUCLID)
    params.vectors[""].hnsw_config = HnswConfig(
        m=8, ef_construct=48, full_scan_threshold=10
    )
    seg = Segment(params)
    data = rng.normal(size=(300, 16)).astype(np.float32)
    for i in range(300):
        seg.upsert_point(i + 1, i, {"": data[i]})
    seg.build_indexes()
    assert "" in seg.hnsw

    calls = []
    real_search = seg.hnsw[""].search

    def spy(*a, **kw):
        calls.append(1)
        return real_search(*a, **kw)

    monkeypatch.setattr(seg.hnsw[""], "search", spy)

    # default: 300 rows << crossover -> scan path, graph untouched
    _, ids = seg.search_dense("", data[:4], k=1)
    assert not calls
    assert (ids[:, 0] == np.arange(4)).all()

    # explicit hnsw_ef -> graph path
    seg.search_dense("", data[:4], k=1, params=SearchParams(hnsw_ef=48))
    assert calls

    # crossover lowered to 1 -> graph used by default too
    calls.clear()
    monkeypatch.setattr(seg_mod, "GRAPH_CROSSOVER_ROWS", 1)
    seg.search_dense("", data[:4], k=1)
    assert calls


def test_tq_flat_codes_only_respects_rescore_flag(tmp_path, monkeypatch):
    """quantization_rescore=False on the TQ-as-primary flat path returns
    codes-only scores without touching the host rescore (the latency
    knob), same gate as SQ."""
    from qdrant_tpu.storage import segment as seg_mod
    from qdrant_tpu.types import TurboQuantizationConfig, VectorParams

    monkeypatch.setattr(seg_mod, "FLAT_SCAN_MIN_N", 1)
    rng = np.random.default_rng(8)
    params = make_params(
        dim=32, distance=Distance.DOT,
        quant=TurboQuantizationConfig(bits="bits4"),
    )
    params.vectors[""].on_disk = True
    seg = Segment(params)
    seg.storage_dir = str(tmp_path / "s")
    data = rng.normal(size=(300, 32)).astype(np.float32)
    for i in range(300):
        seg.upsert_point(i + 1, i, {"": data[i]})
    seg.build_indexes()
    assert "" in seg.quantized
    seg.hnsw = {}

    def boom(*a, **kw):
        raise AssertionError("host rescore must not run with rescore=False")

    monkeypatch.setattr(seg, "_host_rescore", boom)
    _, ids = seg.search_dense(
        "", data[:5], k=3, params=SearchParams(quantization_rescore=False)
    )
    assert ids.shape == (5, 3)
    # codes-only still finds the right neighborhood most of the time
    assert (ids[:, 0] == np.arange(5)).mean() >= 0.6
