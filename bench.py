"""Benchmark: QPS at recall@10 ≥ 0.95 on 1M SIFT-like 128-d (euclid).

Mirrors BASELINE.md's primary target ("QPS at recall@10 ≥ 0.95, 1M SIFT-128
euclid") using the engine's large-segment search path: the blocked-scan
group-reduction kernel (ops/scan.py) + exact f32 rescore — the dispatch the
engine itself picks for a 1M-point segment. Prints ONE JSON line to stdout:
  {"metric": ..., "value": qps, "unit": "qps", "vs_baseline": ratio}
vs_baseline = TPU QPS / single-host numpy exact-scan QPS on identical
data+queries (the reproducible stand-in for the reference's CPU engine; the
reference publishes no absolute numbers in-repo — see BASELINE.md).
Diagnostics go to stderr. Env knobs: BENCH_N, BENCH_D, BENCH_HNSW=1 to also
measure the HNSW graph path (slower; adds build time).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N = int(os.environ.get("BENCH_N", 1_000_000))
D = int(os.environ.get("BENCH_D", 128))
N_TRUTH = 256  # queries with exact ground truth
N_BATCH = 1024  # throughput measurement batch
K = 10
TARGET_RECALL = 0.95


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def make_dataset(rng):
    """Clustered (SIFT-like) data: gaussian mixture, non-negative, scaled."""
    n_clusters = 1024
    centers = rng.uniform(0, 200, size=(n_clusters, D)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=N)
    data = centers[assign] + rng.normal(0, 20, size=(N, D)).astype(np.float32)
    data = np.clip(data, 0, 255).astype(np.float32)
    q_assign = rng.integers(0, n_clusters, size=N_BATCH)
    queries = centers[q_assign] + rng.normal(0, 20, size=(N_BATCH, D)).astype(
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


def main():
    rng = np.random.default_rng(42)
    log(f"dataset: {N}x{D} euclid, truth on {N_TRUTH} queries, QPS on {N_BATCH}")
    t0 = time.perf_counter()
    data, queries = make_dataset(rng)
    log(f"datagen {time.perf_counter() - t0:.1f}s")

    truth, cpu_elapsed = host_exact_topk(data, queries[:N_TRUTH], K)
    cpu_qps = N_TRUTH / cpu_elapsed
    log(f"cpu exact baseline: {cpu_elapsed:.2f}s → {cpu_qps:.1f} qps")

    from qdrant_tpu.index.plain import PlainIndex
    from qdrant_tpu.storage.vectors import DenseVectorStore
    from qdrant_tpu.types import Distance

    store = DenseVectorStore(D, Distance.EUCLID)
    store.add(data)
    t0 = time.perf_counter()
    store.scan_index()
    store.device_block()
    log(f"device upload + scan prep {time.perf_counter() - t0:.1f}s")
    idx = PlainIndex(store)

    # warm (compile)
    idx.search(queries[:N_BATCH], k=K)
    t0 = time.perf_counter()
    s, ids = idx.search(queries[:N_BATCH], k=K)
    elapsed = time.perf_counter() - t0
    r = recall(ids[:N_TRUTH], truth)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        idx.search(queries[:N_BATCH], k=K)
        times.append(time.perf_counter() - t0)
    qps = N_BATCH / min(times)
    log(f"scan path: recall@10={r:.4f} qps={qps:.1f}")

    detail = {
        "recall_at_10": round(r, 4),
        "cpu_exact_qps": round(cpu_qps, 2),
        "n": N,
        "dim": D,
        "batch": N_BATCH,
    }

    if os.environ.get("BENCH_HNSW") == "1":
        from qdrant_tpu.index.hnsw import HnswIndex
        from qdrant_tpu.storage.vectors import DenseVectorStore as _DS
        from qdrant_tpu.types import HnswConfig

        # graph path measured on a 100k subset (build cost scales linearly)
        n_sub = min(N, 100_000)
        sub_store = _DS(D, Distance.EUCLID)
        sub_store.add(data[:n_sub])
        sub_store.device_block()
        truth_sub, _ = host_exact_topk(data[:n_sub], queries[:N_TRUTH], K)
        hidx = HnswIndex(sub_store, HnswConfig(m=16, ef_construct=128), seed=7)
        t0 = time.perf_counter()
        hidx.build(batch_size=2048)
        build_s = time.perf_counter() - t0
        log(f"hnsw build: {build_s:.1f}s")
        for ef in (64, 128, 256):
            hidx.search(queries[:8], k=K, ef=ef)
            t0 = time.perf_counter()
            _, hids = hidx.search(queries[:N_BATCH], k=K, ef=ef)
            h_elapsed = time.perf_counter() - t0
            h_recall = recall(hids[:N_TRUTH], truth_sub)
            log(
                f"hnsw ef={ef}: recall@10={h_recall:.4f} "
                f"qps={N_BATCH / h_elapsed:.1f}"
            )
            if h_recall >= TARGET_RECALL:
                detail["hnsw"] = {
                    "ef": ef,
                    "recall_at_10": round(h_recall, 4),
                    "qps": round(N_BATCH / h_elapsed, 1),
                    "build_seconds": round(build_s, 1),
                }
                break

    if os.environ.get("BENCH_EXTRAS", "1") == "1":
        # BASELINE.md config 1: exact full-scan, 100k GloVe-like 100-d cosine
        n1, d1 = 100_000, 100
        g_data = rng.standard_normal((n1, d1)).astype(np.float32)
        g_q = (g_data[rng.integers(0, n1, N_BATCH)]
               + 0.05 * rng.standard_normal((N_BATCH, d1)).astype(np.float32))
        gn = g_data / np.linalg.norm(g_data, axis=1, keepdims=True)
        qn_ = g_q[:N_TRUTH] / np.linalg.norm(g_q[:N_TRUTH], axis=1, keepdims=True)
        g_truth = np.argsort(-(qn_ @ gn.T), axis=1)[:, :K]
        g_store = DenseVectorStore(d1, Distance.COSINE)
        g_store.add(g_data)
        g_idx = PlainIndex(g_store)
        g_idx.search(g_q[:N_BATCH], k=K)
        t0 = time.perf_counter()
        _, g_ids = g_idx.search(g_q[:N_BATCH], k=K)
        g_elapsed = time.perf_counter() - t0
        g_recall = recall(g_ids[:N_TRUTH], g_truth)
        detail["exact_100k_glove100_cosine"] = {
            "qps": round(N_BATCH / g_elapsed, 1),
            "recall_at_10": round(g_recall, 4),
        }
        log(f"exact 100k glove100 cosine: qps={N_BATCH / g_elapsed:.0f} "
            f"recall={g_recall:.4f}")

        # BASELINE.md config 3: SQ-int8 + oversampled f32 rescore, 1536-d dot
        import jax.numpy as jnp

        from qdrant_tpu.ops import quantization as qops
        from qdrant_tpu.ops.scan import DEFAULT_BLOCK, scan_search_sq_rescore

        n3 = int(os.environ.get("BENCH_SQ_N", 200_000))
        d3 = 1536
        centers3 = rng.standard_normal((256, d3)).astype(np.float32)
        sq_data = (centers3[rng.integers(0, 256, n3)]
                   + rng.standard_normal((n3, d3)).astype(np.float32))
        sq_q = (centers3[rng.integers(0, 256, 256)]
                + rng.standard_normal((256, d3)).astype(np.float32))
        quant = qops.ScalarQuantized.encode(sq_data, 0.99)
        codes_dev, norms_dev, n_pad = quant.scan_device(DEFAULT_BLOCK)
        mask3 = np.zeros(n_pad, np.int8)
        mask3[:n3] = 1
        vecs_f32 = jnp.asarray(sq_data)
        qc = jnp.asarray(quant.encode_queries(sq_q))
        qn3 = jnp.asarray((sq_q * sq_q).sum(axis=1).astype(np.float32))
        args3 = (qc, qn3, codes_dev, norms_dev, jnp.float32(quant.scale),
                 jnp.asarray(mask3), jnp.asarray(sq_q), vecs_f32,
                 DEFAULT_BLOCK, 128, K, False)
        np.asarray(scan_search_sq_rescore(*args3)[1])
        t0 = time.perf_counter()
        sq_ids = np.asarray(scan_search_sq_rescore(*args3)[1])
        sq_elapsed = time.perf_counter() - t0
        gt3 = np.argsort(-(sq_q[:64] @ sq_data.T), axis=1)[:, :K]
        sq_recall = recall(sq_ids[:64], gt3)
        detail["sq_int8_1536_dot"] = {
            "n": n3,
            "qps": round(256 / sq_elapsed, 1),
            "recall_at_10": round(sq_recall, 4),
        }
        log(f"sq-int8 {n3}x1536 dot: qps={256 / sq_elapsed:.0f} "
            f"recall={sq_recall:.4f}")

    if r < TARGET_RECALL:
        log("WARNING: scan recall below target")
        qps = 0.0

    print(
        json.dumps(
            {
                "metric": f"qps_at_recall95_{N // 1000}k_sift{D}",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / cpu_qps, 2) if cpu_qps else 0.0,
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
