"""Pallas fused scan kernel — interpret-mode equivalence tests (CPU)."""
import numpy as np
import jax.numpy as jnp

from qdrant_tpu.ops.pallas_scan import (
    NEG_INF,
    pallas_scan_rescore,
    pallas_scan_topk,
)


def _exact_topk(q, v, k, euclid):
    if euclid:
        s = 2 * q @ v.T - (v * v).sum(1)[None, :]
    else:
        s = q @ v.T
    return np.argsort(-s, axis=1)[:, :k], np.sort(-s, axis=1)[:, :k] * -1


def test_pallas_scan_matches_exact_dot():
    rng = np.random.default_rng(0)
    n, d, b, k = 512, 128, 8, 5
    v = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    bias = np.zeros(n, dtype=np.float32)
    s, i = pallas_scan_topk(
        jnp.asarray(q), jnp.asarray(v, dtype=jnp.bfloat16), jnp.asarray(bias),
        k, blk=128, qt=8, slots=4, interpret=True,
    )
    truth, tscores = _exact_topk(q, v, k, euclid=False)
    i = np.asarray(i)
    # bf16 scoring: compare candidate sets with tolerance via recall
    hits = sum(len(set(i[r].tolist()) & set(truth[r].tolist())) for r in range(b))
    assert hits / (b * k) >= 0.9


def test_pallas_scan_euclid_and_mask():
    rng = np.random.default_rng(1)
    n, d, b, k = 384, 128, 8, 4
    v = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    deleted = np.zeros(n, dtype=bool)
    deleted[::3] = True  # delete a third
    bias = np.where(~deleted, -(v * v).sum(1), NEG_INF).astype(np.float32)
    s, i = pallas_scan_topk(
        jnp.asarray(q), jnp.asarray(2.0 * v, dtype=jnp.bfloat16),
        jnp.asarray(bias), k, blk=128, qt=8, slots=4, interpret=True,
    )
    i = np.asarray(i)
    assert not np.isin(i[i >= 0], np.nonzero(deleted)[0]).any()
    sc = 2 * q @ v.T - (v * v).sum(1)[None, :]
    sc[:, deleted] = -np.inf
    truth = np.argsort(-sc, axis=1)[:, :k]
    hits = sum(len(set(i[r].tolist()) & set(truth[r].tolist())) for r in range(b))
    assert hits / (b * k) >= 0.9


def test_pallas_scan_int8_rescore_exact():
    rng = np.random.default_rng(2)
    n, d, b, k = 512, 128, 8, 5
    v = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    scale = float(np.quantile(np.abs(v), 0.99) / 127.0)
    codes = np.clip(np.round(v / scale), -127, 127).astype(np.int8)
    q_codes = np.clip(np.round(q / scale), -127, 127).astype(np.int8)
    bias = (-(v * v).sum(1)).astype(np.float32)
    s, i = pallas_scan_rescore(
        jnp.asarray(q), jnp.asarray(q_codes), jnp.asarray(codes),
        jnp.asarray(bias), jnp.asarray(v),
        64, k, scale_sq=jnp.float32(2 * scale * scale),
        blk=128, qt=8, slots=4, euclid=True, int8_mode=True, interpret=True,
    )
    i = np.asarray(i)
    s = np.asarray(s)
    truth, _ = _exact_topk(q, v, k, euclid=True)
    hits = sum(len(set(i[r].tolist()) & set(truth[r].tolist())) for r in range(b))
    assert hits / (b * k) >= 0.9
    # rescored euclid scores are exact -(q-v)^2
    for r in range(b):
        for c in range(k):
            if i[r, c] >= 0:
                ref = -((q[r] - v[i[r, c]]) ** 2).sum()
                assert abs(s[r, c] - ref) < 1e-2
