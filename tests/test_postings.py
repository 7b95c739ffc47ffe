"""Bitpacked posting storage (index/postings.py) — roundtrip + ratio.

Mirrors the reference's chunked bitpacking guarantees
(lib/posting_list/src/lib.rs:16): exact id recovery, smaller-than-raw
payload on realistic (sorted-runs) data.
"""

import numpy as np
import pytest

from qdrant_tpu.index.postings import CHUNK, PackedPostings


def roundtrip(ids, w=None):
    ids = np.asarray(ids, dtype=np.int64)
    if w is None:
        w = np.random.default_rng(0).random(len(ids)).astype(np.float32)
    p = PackedPostings.pack(ids, w)
    out_ids, out_w = p.unpack()
    np.testing.assert_array_equal(out_ids, ids.astype(np.int32))
    np.testing.assert_array_equal(out_w, w)
    return p


def test_empty_and_tiny():
    roundtrip([])
    roundtrip([0])
    roundtrip([7])
    roundtrip([5, 5, 5])          # constant → width 0
    roundtrip([0] * (CHUNK + 3))  # zero ids across chunk boundary


def test_sorted_runs_roundtrip_and_ratio():
    """Concatenated ascending runs (the dim-sorted CSR shape): exact
    roundtrip and a real compression win on the id payload."""
    rng = np.random.default_rng(1)
    runs = []
    for _ in range(200):
        ln = int(rng.integers(1, 4000))
        runs.append(np.sort(rng.choice(100_000, size=ln, replace=False)))
    ids = np.concatenate(runs)
    p = roundtrip(ids)
    raw = ids.size * 4
    assert p.packed_nbytes < raw * 0.6, (p.packed_nbytes, raw)


def test_unsorted_chunks_roundtrip():
    """Weight-sorted runs are non-monotonic → absolute mode chunks."""
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 1 << 30, size=5 * CHUNK + 17)
    p = roundtrip(ids)
    assert not p.delta.all()


def test_mixed_modes_and_boundary_widths():
    rng = np.random.default_rng(3)
    parts = [
        np.arange(CHUNK),                          # delta width 1
        np.array([0, 1 << 31 - 1] * (CHUNK // 2)),  # absolute, wide
        np.sort(rng.integers(0, 1 << 20, CHUNK)),   # delta, medium
        np.full(CHUNK, 123),                        # width 0
    ]
    roundtrip(np.concatenate(parts))


def test_negative_ids_rejected():
    with pytest.raises(ValueError):
        PackedPostings.pack(
            np.array([-1, 2]), np.zeros(2, np.float32)
        )


def test_memory_accounting():
    rng = np.random.default_rng(4)
    ids = np.sort(rng.integers(0, 1 << 20, 10_000))
    p = PackedPostings.pack(ids, rng.random(10_000).astype(np.float32))
    mem = p.memory_usage_bytes()
    assert mem["host_bytes"] == p.packed_nbytes + p.weights.nbytes
    assert mem["device_bytes"] == 0
