"""Cross-version on-disk data compatibility (reference:
tests/e2e_tests/test_data_compatibility.py loads snapshots from prior
releases): a collection saved in the current format still loads after a
simulated version hop — v1-era metas (no format_version field) are
migrated in place by the load hook (storage/segment.py::
_migrate_segment_meta), newer-than-this-build metas are refused with a
clear error instead of being misread."""

import glob
import json
import os

import numpy as np
import pytest

from qdrant_tpu.collection.collection import Collection
from qdrant_tpu.storage.segment import (
    SEGMENT_FORMAT_VERSION,
    SegmentFormatError,
)
from qdrant_tpu.types import CollectionParams, Distance, VectorParams


def _params(d=8):
    return CollectionParams(
        vectors={"": VectorParams(size=d, distance=Distance.EUCLID)},
        sparse_vectors={},
    )


def _make_collection(path):
    coll = Collection("compat", path, _params())
    rng = np.random.default_rng(5)
    data = rng.normal(size=(200, 8)).astype(np.float32)
    coll.upsert(
        [
            {
                "id": i,
                "vector": data[i].tolist(),
                "payload": {"i": int(i), "tag": "a" if i % 2 else "b"},
            }
            for i in range(200)
        ]
    )
    for shard in coll.shards.values():
        shard.flush()
    queries = data[:8] + 0.01
    baseline = coll.search_dense("", queries, 5)
    for shard in coll.shards.values():
        shard.close()
    return data, queries, baseline


def _segment_metas(path):
    metas = glob.glob(
        os.path.join(path, "**", "segment.json"), recursive=True
    )
    assert metas, "expected persisted segment.json files"
    return metas


def test_current_format_is_stamped(tmp_path):
    path = str(tmp_path / "c")
    _make_collection(path)
    for mp in _segment_metas(path):
        with open(mp) as f:
            meta = json.load(f)
        assert meta["format_version"] == SEGMENT_FORMAT_VERSION


def test_v1_meta_migrates_with_search_parity(tmp_path):
    """Simulate data written by a v1-era build (rounds 1-2: no
    format_version field): the load hook stamps it to the current version
    and search/retrieval behave identically."""
    path = str(tmp_path / "c")
    _, queries, baseline = _make_collection(path)
    for mp in _segment_metas(path):
        with open(mp) as f:
            meta = json.load(f)
        meta.pop("format_version", None)
        with open(mp, "w") as f:
            json.dump(meta, f)

    coll2 = Collection("compat", path, _params())
    assert coll2.count(None) == 200
    res = coll2.search_dense("", queries, 5)
    for ra, rb in zip(baseline, res):
        assert [p for _, p, _ in ra] == [p for _, p, _ in rb]
    rec = coll2.get_payload_and_vectors(3)
    assert rec is not None


def test_newer_format_refused(tmp_path):
    """A segment written by a FUTURE build must be refused with a clear
    error, not misread (reference: StorageVersion compatibility gate)."""
    path = str(tmp_path / "c")
    _make_collection(path)
    mp = _segment_metas(path)[0]
    with open(mp) as f:
        meta = json.load(f)
    meta["format_version"] = SEGMENT_FORMAT_VERSION + 97
    with open(mp, "w") as f:
        json.dump(meta, f)

    with pytest.raises(SegmentFormatError, match="newer than this build"):
        Collection("compat", path, _params())
