"""Probabilistic per-segment limit subsampling (reference:
probabilistic_search_sampling.rs + segments_searcher.rs:212-306)."""

import numpy as np

from qdrant_tpu.collection.sampling import (
    find_search_sampling,
    poisson_quantile,
    sampling_limit,
)


def test_poisson_quantile_matches_reference_table():
    # spot values from the reference's precomputed table (q=0.999^(1/s))
    # (lambda, expected) at s=2..: the table rows are (lambda, k)
    for lam, expected in [(0.6666666666666667, 6), (2.2222222222222223, 10),
                          (10.0, 24), (25.0, 46)]:
        got = poisson_quantile(0.999 ** (1 / 3), lam)
        # our q differs per segment count; allow the quantile to be within
        # a couple of the table entry
        assert abs(got - expected) <= 3, (lam, got, expected)


def test_sampling_limit_bounds():
    # one segment with all points → full limit
    assert sampling_limit(100, None, 1000, 1000, 1) == 100
    # empty segment → zero
    assert sampling_limit(100, None, 0, 1000, 4) == 0
    # equal shares: each segment samples far below the full limit
    s = sampling_limit(1000, None, 2500, 10_000, 4)
    assert 250 < s < 400
    # ef floor applies for graph searches
    assert sampling_limit(1000, 500, 2500, 10_000, 4) == 500


def test_shard_sampled_search_is_exact():
    from qdrant_tpu.collection.shard import LocalShard
    from qdrant_tpu.types import CollectionParams, Distance, VectorParams
    import tempfile

    params = CollectionParams(
        vectors={"": VectorParams(size=16, distance=Distance.DOT)},
        sparse_vectors={},
    )
    shard = LocalShard(tempfile.mkdtemp(), params)
    rng = np.random.default_rng(0)
    data = rng.normal(size=(3000, 16)).astype(np.float32)
    # several sealed segments: upsert in chunks, sealing in between
    for lo in range(0, 3000, 750):
        shard.update({
            "type": "upsert",
            "points": [
                {"id": i, "vectors": {"": data[i].tolist()}}
                for i in range(lo, lo + 750)
            ],
        })
        shard.appendable_segment.appendable = False  # roll a new segment
    assert len([s for s in shard.segments if len(s) > 0]) >= 4

    q = rng.normal(size=(8, 16)).astype(np.float32)
    truth = np.argsort(-(q @ data.T), axis=1)[:, :64]
    res = shard.search_dense("", q, 64)
    for qi in range(8):
        got = [pid for _s, pid, _v in res[qi]]
        inter = len(set(got) & set(truth[qi].tolist()))
        assert inter >= 62, (qi, inter)  # sampled fan-out stays ~exact
