import numpy as np
import jax.numpy as jnp
import pytest

from qdrant_tpu.ops.distances import (
    pairwise_scores,
    preprocess_vectors,
    score_dense,
    score_and_topk,
    score_ids_batch,
    score_multivector_maxsim,
)
from qdrant_tpu.types import Distance


def brute_force_scores(queries, vectors, distance):
    if distance is Distance.DOT:
        return queries @ vectors.T
    if distance is Distance.COSINE:
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        vn = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
        return qn @ vn.T
    if distance is Distance.EUCLID:
        d = ((queries[:, None, :] - vectors[None, :, :]) ** 2).sum(-1)
        return -d
    if distance is Distance.MANHATTAN:
        d = np.abs(queries[:, None, :] - vectors[None, :, :]).sum(-1)
        return -d
    raise ValueError


@pytest.mark.parametrize(
    "distance",
    [Distance.DOT, Distance.COSINE, Distance.EUCLID, Distance.MANHATTAN],
)
def test_score_dense_matches_numpy(distance):
    rng = np.random.default_rng(0)
    q = rng.normal(size=(4, 32)).astype(np.float32)
    v = rng.normal(size=(100, 32)).astype(np.float32)
    stored = preprocess_vectors(v, distance)
    q_in = preprocess_vectors(q, distance)
    got = np.asarray(score_dense(jnp.asarray(q_in), jnp.asarray(stored), distance.value))
    want = brute_force_scores(q, v, distance)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_score_dense_mask():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(2, 16)).astype(np.float32)
    v = rng.normal(size=(50, 16)).astype(np.float32)
    mask = np.zeros(50, dtype=bool)
    mask[10:20] = True
    scores = np.asarray(
        score_dense(jnp.asarray(q), jnp.asarray(v), "Dot", jnp.asarray(mask))
    )
    assert np.all(np.isinf(scores[:, ~mask]))
    assert np.all(np.isfinite(scores[:, mask]))


def test_score_and_topk():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(3, 24)).astype(np.float32)
    v = rng.normal(size=(200, 24)).astype(np.float32)
    scores, ids = score_and_topk(jnp.asarray(q), jnp.asarray(v), "Dot", 10)
    want = brute_force_scores(q, v, Distance.DOT)
    want_ids = np.argsort(-want, axis=1)[:, :10]
    np.testing.assert_array_equal(np.asarray(ids), want_ids)


def test_score_ids_batch():
    rng = np.random.default_rng(3)
    q = rng.normal(size=(2, 8)).astype(np.float32)
    v = rng.normal(size=(30, 8)).astype(np.float32)
    ids = np.array([[0, 5, -1, 7], [2, -1, 3, 4]], dtype=np.int32)
    got = np.asarray(score_ids_batch(jnp.asarray(q), jnp.asarray(v), jnp.asarray(ids), "Euclid"))
    for b in range(2):
        for j in range(4):
            if ids[b, j] < 0:
                assert got[b, j] == -np.inf
            else:
                want = -((q[b] - v[ids[b, j]]) ** 2).sum()
                np.testing.assert_allclose(got[b, j], want, rtol=1e-4)


def test_pairwise_scores_euclid():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(2, 3, 8)).astype(np.float32)
    b = rng.normal(size=(2, 5, 8)).astype(np.float32)
    got = np.asarray(pairwise_scores(jnp.asarray(a), jnp.asarray(b), "Euclid"))
    want = -((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_multivector_maxsim():
    rng = np.random.default_rng(5)
    q = rng.normal(size=(4, 8)).astype(np.float32)  # 4 query tokens
    v = rng.normal(size=(6, 5, 8)).astype(np.float32)  # 6 points, ≤5 tokens
    tok_mask = np.ones((6, 5), dtype=bool)
    tok_mask[2, 3:] = False  # point 2 has only 3 tokens
    got = np.asarray(
        score_multivector_maxsim(
            jnp.asarray(q), jnp.asarray(v), jnp.asarray(tok_mask), "Dot"
        )
    )
    for n in range(6):
        sims = q @ v[n].T  # [4, 5]
        sims = np.where(tok_mask[n][None, :], sims, -np.inf)
        want = sims.max(axis=1).sum()
        np.testing.assert_allclose(got[n], want, rtol=1e-4)
