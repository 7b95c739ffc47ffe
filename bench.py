"""Benchmark harness — all five BASELINE.md configs, one JSON line out.

Configs (BASELINE.md:32-38), each ON by default:
  1. exact full-scan        100k GloVe-like 100-d, cosine
  2. HNSW graph             1M SIFT-like 128-d euclid, m=16 efc=128,
                            ef sweep 64-512 (+ build wall-clock)
  3. SQ-int8 + f32 rescore  1M dbpedia-like 1536-d, dot
  4. filtered search        keyword filter at 1% / 10% / 50% selectivity
  5. sparse SPLADE + RRF    1M SPLADE-like sparse + dense hybrid

Headline metric (continuity with round 1): best QPS at recall@10 >= 0.95 on
the 1M x 128 dense config — scan and HNSW paths both measured; the better
one wins. vs_baseline = that QPS / single-host numpy exact-scan QPS on the
same data (the reference publishes no absolute numbers in-repo; BASELINE.md).

Every config prints its own line to stderr; reduced runs (env overrides) are
logged loudly rather than silently.

Env knobs: BENCH_N (default 1M), BENCH_D (128), BENCH_SQ_N (1M),
BENCH_SPARSE_N (1M), BENCH_SKIP=csv of config names to skip
(scan|hnsw|sq|filtered|sparse).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

import numpy as np

N = int(os.environ.get("BENCH_N", 1_000_000))
D = int(os.environ.get("BENCH_D", 128))
N_TRUTH = 256  # queries with exact ground truth
N_BATCH = 1024  # throughput measurement batch (scan)
HNSW_BATCH = 4096  # throughput batch for the graph path
K = 10
TARGET_RECALL = 0.95
SKIP = set(
    s.strip() for s in os.environ.get("BENCH_SKIP", "").split(",") if s.strip()
)


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def make_dataset(rng, n, d, n_queries, n_clusters=1024, spread=20.0):
    """Clustered (SIFT-like) data: gaussian mixture, non-negative, scaled."""
    centers = rng.uniform(0, 200, size=(n_clusters, d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    data = centers[assign] + rng.normal(0, spread, size=(n, d)).astype(np.float32)
    data = np.clip(data, 0, 255).astype(np.float32)
    q_assign = rng.integers(0, n_clusters, size=n_queries)
    queries = centers[q_assign] + rng.normal(0, spread, size=(n_queries, d)).astype(
        np.float32
    )
    queries = np.clip(queries, 0, 255).astype(np.float32)
    return data, queries


def host_exact_topk(data, queries, k):
    """Numpy exact search (the CPU baseline) → ids + elapsed seconds."""
    d_sq = (data * data).sum(1)
    start = time.perf_counter()
    scores = 2.0 * (queries @ data.T) - d_sq[None, :]
    idx = np.argpartition(-scores, k, axis=1)[:, :k]
    part = np.take_along_axis(scores, idx, axis=1)
    order = np.argsort(-part, axis=1)
    ids = np.take_along_axis(idx, order, axis=1)
    elapsed = time.perf_counter() - start
    return ids, elapsed


def recall(ids, truth):
    hits = sum(
        len(set(ids[q].tolist()) & set(truth[q].tolist())) for q in range(len(truth))
    )
    return hits / truth.size


def measure_qps(fn, batch, reps=8):
    fn()  # warm (compile)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return batch / min(times)


def main():
    rng = np.random.default_rng(42)
    detail = {}
    headline_qps = 0.0
    cpu_qps = 0.0

    from qdrant_tpu.index.plain import PlainIndex
    from qdrant_tpu.storage.vectors import DenseVectorStore
    from qdrant_tpu.types import Distance

    # ------------------------------------------------------------------
    # dense 1M x 128: scan path (headline) + HNSW (config 2) + filtered (4)
    # ------------------------------------------------------------------
    if N != 1_000_000 or D != 128:
        log(f"NOTE: dense config reduced via env to {N}x{D}")
    log(f"dataset: {N}x{D} euclid, truth on {N_TRUTH}, scan QPS on {N_BATCH}")
    t0 = time.perf_counter()
    data, queries = make_dataset(rng, N, D, max(N_BATCH, HNSW_BATCH))
    log(f"datagen {time.perf_counter() - t0:.1f}s")

    truth, cpu_elapsed = host_exact_topk(data, queries[:N_TRUTH], K)
    cpu_qps = N_TRUTH / cpu_elapsed
    log(f"cpu exact baseline: {cpu_elapsed:.2f}s -> {cpu_qps:.1f} qps")

    store = DenseVectorStore(D, Distance.EUCLID)
    store.add(data)
    t0 = time.perf_counter()
    store.scan_index()
    store.device_block()
    log(f"device upload + scan prep {time.perf_counter() - t0:.1f}s")

    if "scan" not in SKIP:
        idx = PlainIndex(store)
        _, ids = idx.search(queries[:N_BATCH], k=K)
        r = recall(ids[:N_TRUTH], truth)
        qps = measure_qps(lambda: idx.search(queries[:N_BATCH], k=K), N_BATCH)
        log(f"scan path: recall@10={r:.4f} qps={qps:.1f}")
        detail["scan_1m_sift128"] = {
            "recall_at_10": round(r, 4),
            "qps": round(qps, 1),
            "n": N,
            "dim": D,
            "batch": N_BATCH,
        }
        if r >= TARGET_RECALL:
            headline_qps = max(headline_qps, qps)

    hidx = None
    if "hnsw" not in SKIP:
        from qdrant_tpu.index.hnsw import HnswIndex
        from qdrant_tpu.types import HnswConfig

        hidx = HnswIndex(store, HnswConfig(m=16, ef_construct=128), seed=7)
        t0 = time.perf_counter()
        hidx.build(batch_size=4096)
        build_s = time.perf_counter() - t0
        log(f"hnsw build ({N} pts): {build_s:.1f}s ({build_s / N * 1e6:.0f} us/pt)")
        sweep = {}
        for ef in (64, 128, 256, 512):
            _, hids = hidx.search(queries[:HNSW_BATCH], k=K, ef=ef)
            h_recall = recall(hids[:N_TRUTH], truth)
            h_qps = measure_qps(
                lambda: hidx.search(queries[:HNSW_BATCH], k=K, ef=ef),
                HNSW_BATCH,
                reps=5,
            )
            log(f"hnsw ef={ef}: recall@10={h_recall:.4f} qps={h_qps:.1f}")
            sweep[str(ef)] = {
                "recall_at_10": round(h_recall, 4),
                "qps": round(h_qps, 1),
            }
            if h_recall >= TARGET_RECALL:
                headline_qps = max(headline_qps, h_qps)
        detail["hnsw_1m_sift128"] = {
            "build_seconds": round(build_s, 1),
            "ef_sweep": sweep,
            "batch": HNSW_BATCH,
            "m": 16,
            "ef_construct": 128,
        }

    # config 4: filtered search at 1% / 10% / 50% selectivity.
    # Mirrors the segment dispatch: low selectivity -> masked scan;
    # higher -> graph beam with filter bias (storage/segment.py:477-501).
    if "filtered" not in SKIP:
        filt = {}
        for sel in (0.01, 0.10, 0.50):
            mask = rng.random(N) < sel
            d_sq = (data * data).sum(1)
            sc = 2.0 * (queries[:64] @ data.T) - d_sq[None, :]
            sc[:, ~mask] = -np.inf
            f_truth = np.argsort(-sc, axis=1)[:, :K]
            del sc
            if sel < 0.05 or hidx is None:
                midx = PlainIndex(store)
                _, f_ids = midx.search(
                    queries[:N_BATCH], k=K, filter_mask=mask
                )
                f_qps = measure_qps(
                    lambda: midx.search(queries[:N_BATCH], k=K, filter_mask=mask),
                    N_BATCH,
                    reps=5,
                )
                path = "masked-scan"
            else:
                _, f_ids = hidx.search(
                    queries[:N_BATCH], k=K, ef=128, filter_mask=mask
                )
                f_qps = measure_qps(
                    lambda: hidx.search(
                        queries[:N_BATCH], k=K, ef=128, filter_mask=mask
                    ),
                    N_BATCH,
                    reps=5,
                )
                path = "graph+bias"
            f_recall = recall(f_ids[:64], f_truth)
            log(
                f"filtered sel={sel:.0%} [{path}]: recall@10={f_recall:.4f} "
                f"qps={f_qps:.1f}"
            )
            filt[f"{sel:.0%}"] = {
                "recall_at_10": round(f_recall, 4),
                "qps": round(f_qps, 1),
                "path": path,
            }
        detail["filtered_1m_sift128"] = filt

    # free the dense 1M block before the 1536-d config
    del store, data, truth
    hidx = None
    gc.collect()

    # ------------------------------------------------------------------
    # config 1: exact full-scan, 100k GloVe-like 100-d cosine
    # ------------------------------------------------------------------
    if "scan" not in SKIP:
        n1, d1 = 100_000, 100
        g_data = rng.standard_normal((n1, d1)).astype(np.float32)
        g_q = (
            g_data[rng.integers(0, n1, N_BATCH)]
            + 0.05 * rng.standard_normal((N_BATCH, d1)).astype(np.float32)
        )
        gn = g_data / np.linalg.norm(g_data, axis=1, keepdims=True)
        qn_ = g_q[:N_TRUTH] / np.linalg.norm(g_q[:N_TRUTH], axis=1, keepdims=True)
        g_truth = np.argsort(-(qn_ @ gn.T), axis=1)[:, :K]
        g_store = DenseVectorStore(d1, Distance.COSINE)
        g_store.add(g_data)
        g_idx = PlainIndex(g_store)
        _, g_ids = g_idx.search(g_q[:N_BATCH], k=K)
        g_recall = recall(g_ids[:N_TRUTH], g_truth)
        g_qps = measure_qps(lambda: g_idx.search(g_q[:N_BATCH], k=K), N_BATCH)
        detail["exact_100k_glove100_cosine"] = {
            "qps": round(g_qps, 1),
            "recall_at_10": round(g_recall, 4),
        }
        log(f"exact 100k glove100 cosine: qps={g_qps:.0f} recall={g_recall:.4f}")
        del g_store, g_data
        gc.collect()

    # ------------------------------------------------------------------
    # config 3: SQ-int8 + oversampled f32 rescore, 1M x 1536 dot
    # ------------------------------------------------------------------
    if "sq" not in SKIP:
        import jax.numpy as jnp

        from qdrant_tpu.ops import quantization as qops
        from qdrant_tpu.ops.scan import DEFAULT_BLOCK, scan_search_sq_rescore

        n3 = int(os.environ.get("BENCH_SQ_N", 1_000_000))
        if n3 != 1_000_000:
            log(f"NOTE: SQ config reduced via env to n={n3}")
        d3 = 1536
        centers3 = rng.standard_normal((256, d3)).astype(np.float32)
        sq_data = (
            centers3[rng.integers(0, 256, n3)]
            + rng.standard_normal((n3, d3)).astype(np.float32)
        )
        sq_q = (
            centers3[rng.integers(0, 256, 256)]
            + rng.standard_normal((256, d3)).astype(np.float32)
        )
        quant = qops.ScalarQuantized.encode(sq_data, 0.99)
        codes_dev, norms_dev, n_pad = quant.scan_device(DEFAULT_BLOCK)
        mask3 = np.zeros(n_pad, np.int8)
        mask3[:n3] = 1
        vecs_f32 = jnp.asarray(sq_data)
        qc = jnp.asarray(quant.encode_queries(sq_q))
        qn3 = jnp.asarray((sq_q * sq_q).sum(axis=1).astype(np.float32))
        args3 = (
            qc,
            qn3,
            codes_dev,
            norms_dev,
            jnp.float32(quant.scale),
            jnp.asarray(mask3),
            jnp.asarray(sq_q),
            vecs_f32,
            DEFAULT_BLOCK,
            128,
            K,
            False,
        )
        sq_ids = np.asarray(scan_search_sq_rescore(*args3)[1])
        sq_qps = measure_qps(
            lambda: np.asarray(scan_search_sq_rescore(*args3)[1]), 256, reps=5
        )
        gt3 = np.argsort(-(sq_q[:64] @ sq_data.T), axis=1)[:, :K]
        sq_recall = recall(sq_ids[:64], gt3)
        detail["sq_int8_1m_1536_dot"] = {
            "n": n3,
            "qps": round(sq_qps, 1),
            "recall_at_10": round(sq_recall, 4),
        }
        log(f"sq-int8 {n3}x1536 dot: qps={sq_qps:.0f} recall={sq_recall:.4f}")
        del sq_data, vecs_f32, codes_dev, quant, args3
        gc.collect()

    # ------------------------------------------------------------------
    # config 5: sparse SPLADE-like 1M + dense+sparse RRF hybrid
    # ------------------------------------------------------------------
    if "sparse" not in SKIP:
        from qdrant_tpu.index.sparse import SparseIndex, SparseVectorStore
        from qdrant_tpu.types import SparseVector

        n5 = int(os.environ.get("BENCH_SPARSE_N", 1_000_000))
        if n5 != 1_000_000:
            log(f"NOTE: sparse config reduced via env to n={n5}")
        vocab = 30_000
        avg_nnz = 64
        t0 = time.perf_counter()
        # Zipf-ish term frequencies: hot terms get postings far beyond any
        # fixed window (the reference's WAND stress case)
        term_p = 1.0 / (np.arange(1, vocab + 1) ** 0.9)
        term_p /= term_p.sum()
        lens = np.maximum(rng.poisson(avg_nnz, size=n5), 4)
        total = int(lens.sum())
        terms = rng.choice(vocab, size=total, p=term_p)
        weights = np.abs(rng.normal(1.0, 0.6, size=total)).astype(np.float32) + 0.05
        bounds = np.concatenate([[0], np.cumsum(lens)])
        sstore = SparseVectorStore()
        vecs = []
        for i in range(n5):
            s, e = bounds[i], bounds[i + 1]
            t_i, w_i = terms[s:e], weights[s:e]
            t_u, inv = np.unique(t_i, return_index=True)
            vecs.append(SparseVector(t_u.tolist(), w_i[inv].tolist()))
        sstore.add(vecs)
        log(f"sparse datagen+store {time.perf_counter() - t0:.1f}s "
            f"({total / 1e6:.0f}M postings)")
        sidx = SparseIndex(sstore)
        t0 = time.perf_counter()
        sidx._device()
        log(f"sparse index build {time.perf_counter() - t0:.1f}s")

        nq = 64
        q_lens = np.maximum(rng.poisson(48, size=nq), 4)
        s_queries = []
        for i in range(nq):
            t_i = rng.choice(vocab, size=q_lens[i], p=term_p)
            t_u = np.unique(t_i)
            w_i = np.abs(rng.normal(1.0, 0.6, size=len(t_u))).astype(np.float32)
            s_queries.append(SparseVector(t_u.tolist(), w_i.tolist()))

        # exact sparse truth (host scatter-add per query over the HOST csr —
        # never slice the device arrays: tunnel downloads run ~0.1 MB/s)
        t0 = time.perf_counter()
        h_ids, h_w, h_table = sidx._build_csr()

        def exact_sparse(q, k):
            acc = np.zeros(n5, np.float32)
            for d_, w_ in zip(q.indices, q.values):
                entry = h_table.get(int(d_))
                if entry is None:
                    continue
                s0, ln = entry
                np.add.at(acc, h_ids[s0 : s0 + ln], w_ * h_w[s0 : s0 + ln])
            return np.argsort(-acc)[:k]

        s_truth = np.asarray([exact_sparse(q, K) for q in s_queries])
        log(f"sparse truth {time.perf_counter() - t0:.1f}s")

        _, s_ids = sidx.search(s_queries, k=K)
        s_recall = recall(s_ids[:nq], s_truth)
        s_qps = measure_qps(lambda: sidx.search(s_queries, k=K), nq, reps=5)
        log(f"sparse splade {n5}: recall@10={s_recall:.4f} qps={s_qps:.1f}")
        detail["sparse_splade_1m"] = {
            "n": n5,
            "recall_at_10": round(s_recall, 4),
            "qps": round(s_qps, 1),
            "postings": total,
        }

        # dense+sparse RRF hybrid on a 200k slice (rrf semantics:
        # collection/query.py::_rrf, reference fusion RRF_K=60)
        nh = min(200_000, n5)
        h_dense, h_q = make_dataset(rng, nh, 128, nq, n_clusters=256)
        h_store = DenseVectorStore(128, Distance.EUCLID)
        h_store.add(h_dense)
        h_idx = PlainIndex(h_store)
        _, d_ids = h_idx.search(h_q[:nq], k=30)
        _, s_ids30 = sidx.search(s_queries, k=30)

        def rrf_fuse(a_ids, b_ids, kk=60):
            out = []
            for r in range(nq):
                sc = {}
                for rank, pid in enumerate(a_ids[r]):
                    if pid >= 0:
                        sc[pid] = sc.get(pid, 0.0) + 1.0 / (kk + rank + 1)
                for rank, pid in enumerate(b_ids[r]):
                    if pid >= 0 and pid < nh:
                        sc[pid] = sc.get(pid, 0.0) + 1.0 / (kk + rank + 1)
                out.append(
                    [p for p, _ in sorted(sc.items(), key=lambda t: -t[1])][:K]
                )
            return np.asarray(out)

        fused = rrf_fuse(d_ids, s_ids30)
        # hybrid truth: exact RRF of exact dense + exact sparse rankings
        hd_truth, _ = host_exact_topk(h_dense, h_q[:nq], 30)
        s_truth30 = np.asarray([exact_sparse(q, 30) for q in s_queries])
        fused_truth = rrf_fuse(hd_truth, s_truth30)
        h_recall = recall(fused, fused_truth)
        log(f"hybrid rrf (dense 200k + sparse): recall@10={h_recall:.4f}")
        detail["hybrid_rrf_dense_sparse"] = {
            "n_dense": nh,
            "recall_at_10": round(h_recall, 4),
        }

    print(
        json.dumps(
            {
                "metric": f"qps_at_recall95_{N // 1000}k_sift{D}",
                "value": round(headline_qps, 1),
                "unit": "qps",
                "vs_baseline": round(headline_qps / cpu_qps, 2) if cpu_qps else 0.0,
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
