"""Filterable HNSW: payload-block subgraphs (style of reference
lib/segment/tests/integration/filtrable_hnsw_test.rs)."""

import numpy as np

from qdrant_tpu.storage.segment import Segment
from qdrant_tpu.types import (
    CollectionParams,
    Distance,
    HnswConfig,
    PayloadIndexParams,
    PayloadSchemaType,
    VectorParams,
    parse_filter,
)


def build_segment(n=2000, d=24, n_groups=4, block_threshold=100):
    rng = np.random.default_rng(0)
    params = CollectionParams(
        vectors={
            "": VectorParams(
                size=d,
                distance=Distance.EUCLID,
                hnsw_config=HnswConfig(
                    m=8,
                    ef_construct=48,
                    full_scan_threshold=block_threshold,
                    payload_m=8,
                ),
            )
        }
    )
    seg = Segment(params)
    data = rng.normal(size=(n, d)).astype(np.float32)
    for i in range(n):
        seg.upsert_point(i + 1, i, {"": data[i]}, {"tenant": f"t{i % n_groups}"})
    seg.create_field_index("tenant", PayloadIndexParams(type=PayloadSchemaType.KEYWORD))
    seg.build_indexes()
    return seg, data


def test_payload_block_subgraphs_built():
    seg, _ = build_segment()
    blocks = seg.hnsw_blocks.get("", {})
    assert len(blocks) == 4  # one per tenant (each 500 ≥ threshold)
    for (field, _), sub in blocks.items():
        assert field == "tenant"
        assert sub.entry >= 0


def test_filtered_search_uses_subgraph_with_good_recall():
    seg, data = build_segment()
    rng = np.random.default_rng(1)
    queries = rng.normal(size=(8, 24)).astype(np.float32)
    flt = parse_filter({"must": [{"key": "tenant", "match": {"value": "t2"}}]})
    scores, ids = seg.search_dense("", queries, k=10, flt=flt)
    valid = ids[ids >= 0]
    assert len(valid) > 0
    assert np.all(valid % 4 == 2)

    # recall vs filtered brute force
    mask = np.arange(len(data)) % 4 == 2
    exact = -((queries[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    exact[:, ~mask] = -np.inf
    truth = np.argsort(-exact, axis=1)[:, :10]
    hits = sum(
        len(set(ids[q].tolist()) & set(truth[q].tolist())) for q in range(8)
    )
    assert hits / 80 >= 0.85


def test_subgraph_with_extra_filter_conditions():
    seg, data = build_segment()
    rng = np.random.default_rng(2)
    queries = rng.normal(size=(4, 24)).astype(np.float32)
    # tenant block + extra has_id restriction: combined mask still applies
    flt = parse_filter(
        {
            "must": [
                {"key": "tenant", "match": {"value": "t1"}},
                {"has_id": [1, 5, 9, 13, 17, 21]},
            ]
        }
    )
    _, ids = seg.search_dense("", queries, k=10, flt=flt)
    valid = set(ids[ids >= 0].tolist())
    assert valid <= {1, 5, 9, 13, 17, 21}


def test_subgraph_save_load(tmp_path):
    seg, data = build_segment(n=800)
    seg.save(str(tmp_path / "seg"))
    loaded = Segment.load(str(tmp_path / "seg"))
    assert len(loaded.hnsw_blocks.get("", {})) == len(seg.hnsw_blocks.get("", {}))
    rng = np.random.default_rng(3)
    q = rng.normal(size=(2, 24)).astype(np.float32)
    flt = parse_filter({"must": [{"key": "tenant", "match": {"value": "t0"}}]})
    _, i1 = seg.search_dense("", q, k=5, flt=flt)
    _, i2 = loaded.search_dense("", q, k=5, flt=flt)
    np.testing.assert_array_equal(i1, i2)


def test_acorn_low_selectivity_beats_masked_traversal():
    """ACORN-mode filtered search: at low selectivity, traversing the
    unfiltered graph finds matches that strict masked traversal strands."""
    import numpy as np
    from qdrant_tpu.index.hnsw import HnswIndex
    from qdrant_tpu.storage.vectors import DenseVectorStore
    from qdrant_tpu.types import Distance, HnswConfig

    rng = np.random.default_rng(5)
    n, d, k = 3000, 24, 10
    data = rng.normal(size=(n, d)).astype(np.float32)
    store = DenseVectorStore(d, Distance.EUCLID)
    store.add(data)
    idx = HnswIndex(store, HnswConfig(m=8, ef_construct=64), seed=6)
    idx.build(batch_size=512)

    mask = np.zeros(n, dtype=bool)
    mask[rng.choice(n, size=n // 50, replace=False)] = True  # 2% selectivity
    queries = rng.normal(size=(8, d)).astype(np.float32)

    exact = -((queries[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    exact[:, ~mask] = -np.inf
    truth = np.argsort(-exact, axis=1)[:, :k]

    def recall(ids):
        hits = sum(
            len(set(ids[q][ids[q] >= 0].tolist()) & set(truth[q].tolist()))
            for q in range(8)
        )
        return hits / (8 * k)

    _, ids_masked = idx.search(queries, k=k, ef=64, filter_mask=mask, acorn=False)
    _, ids_acorn = idx.search(queries, k=k, ef=64, filter_mask=mask, acorn=True)
    valid = ids_acorn[ids_acorn >= 0]
    assert np.all(mask[valid])  # results always match the filter
    assert recall(ids_acorn) >= recall(ids_masked)
    # at 2% selectivity ef must scale with 1/selectivity to fill k results;
    # measured capability at ef=256 on this config is 0.95 (raising the bar
    # from the old 0.5 per round-2 review)
    _, ids_acorn256 = idx.search(queries, k=k, ef=256, filter_mask=mask, acorn=True)
    assert recall(ids_acorn256) >= 0.9
