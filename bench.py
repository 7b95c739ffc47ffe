"""Benchmark harness — BASELINE.md configs + scale extras, incremental JSON.

Configs (BASELINE.md:32-38):
  1. exact full-scan        100k GloVe-like 100-d, cosine
  2. HNSW graph             1M SIFT-like 128-d euclid, m=16 efc=128,
                            ef sweep 64-512 (+ build wall-clock)
  3. SQ-int8 + f32 rescore  1M dbpedia-like 1536-d, dot
  4. filtered search        keyword filter at 1% / 10% / 50% selectivity
  5. sparse SPLADE + RRF    1M SPLADE-like sparse + dense hybrid
Extras (after the core line is emitted; each re-emits the JSON):
  6. tiered quantized-primary storage at 4M x 1536 (f32 exceeds HBM)
  7. HNSW 1M x 1536 build (the BASELINE.md:32 build-under-a-minute target)
  8. 4M x 128 scan-vs-graph crossover point

The CUMULATIVE result JSON is printed (flushed) after EVERY config — if the
harness timeout kills the run mid-way, the last printed line still carries
every completed config ("partial": true marks an unfinished run; the final
line has "partial": false). Round-2 lesson: a single end-of-run print
produced no artifact at all under rc=124.

Headline metric: best QPS at recall@10 >= 0.95 on the 1M x 128 dense config
(scan and HNSW both measured, better one wins). vs_baseline = that QPS /
single-host numpy exact-scan QPS on the same data (the reference publishes
no absolute numbers in-repo; BASELINE.md).

Env knobs: BENCH_N (default 1M), BENCH_D (128), BENCH_SQ_N (1M),
BENCH_SPARSE_N (1M), BENCH_SKIP=csv of config names
(scan|hnsw|sq|filtered|sparse|tiered|hnsw1536|crossover).
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
N_TRUTH = 64  # queries with exact ground truth
N_BATCH = 1024  # throughput measurement batch (scan)
HNSW_BATCH = 2048  # throughput batch for the graph path
K = 10
TARGET_RECALL = 0.95
SKIP = set(
    s.strip() for s in os.environ.get("BENCH_SKIP", "").split(",") if s.strip()
)
T_START = time.perf_counter()

STATE = {
    "metric": f"qps_at_recall95_{N // 1000}k_sift{D}",
    "value": 0.0,
    "unit": "qps",
    "vs_baseline": 0.0,
    "partial": True,
    "detail": {},
}


def log(*args):
    print(f"[{time.perf_counter() - T_START:7.1f}s]", *args, file=sys.stderr, flush=True)


def emit(final: bool = False):
    STATE["partial"] = not final
    print(json.dumps(STATE), flush=True)


def set_headline(qps: float, cpu_qps: float):
    if qps > STATE["value"]:
        STATE["value"] = round(qps, 1)
        STATE["vs_baseline"] = round(qps / cpu_qps, 2) if cpu_qps else 0.0


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


def tiled_noise(rng, n, d, pool_rows=65536, pool=None):
    """High-dim gaussian-ish noise in O(pool) RNG work: draw a pool of rows
    once, then assemble n rows as pool[p_i] * g_i with a per-row scalar
    jitter (fresh standard_normal at 1M x 1536 costs 70-360 s of host RNG —
    measured; the pool version is ~seconds and keeps rows distinct). Pass
    `pool` to amortize the draw across blocks."""
    if pool is None:
        pool = rng.standard_normal((pool_rows, d), dtype=np.float32)
    pick = rng.integers(0, len(pool), size=n)
    jit = (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)
    return pool[pick] * jit[:, None]


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


def measure_qps(fn, batch, reps=5):
    fn()  # warm (compile)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return batch / min(times)


def main():
    rng = np.random.default_rng(42)

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
        STATE["detail"]["scan_1m_sift128"] = {
            "recall_at_10": round(r, 4),
            "qps": round(qps, 1),
            "n": N,
            "dim": D,
            "batch": N_BATCH,
        }
        if r >= TARGET_RECALL:
            set_headline(qps, cpu_qps)
        emit()

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
            bsz = HNSW_BATCH if ef <= 128 else 1024
            _, hids = hidx.search(queries[:bsz], k=K, ef=ef)
            h_recall = recall(hids[:N_TRUTH], truth)
            h_qps = measure_qps(
                lambda: hidx.search(queries[:bsz], k=K, ef=ef), bsz, reps=2
            )
            log(f"hnsw ef={ef}: recall@10={h_recall:.4f} qps={h_qps:.1f}")
            sweep[str(ef)] = {
                "recall_at_10": round(h_recall, 4),
                "qps": round(h_qps, 1),
            }
            if h_recall >= TARGET_RECALL:
                set_headline(h_qps, cpu_qps)
        STATE["detail"]["hnsw_1m_sift128"] = {
            "build_seconds": round(build_s, 1),
            "ef_sweep": sweep,
            "batch": HNSW_BATCH,
            "m": 16,
            "ef_construct": 128,
        }
        emit()

    # config 4: filtered search at 1% / 10% / 50% selectivity.
    # Mirrors the segment dispatch: low selectivity -> masked scan;
    # higher -> graph beam with filter bias (storage/segment.py:477-501).
    if "filtered" not in SKIP:
        filt = {}
        for sel in (0.01, 0.10, 0.50):
            mask = rng.random(N) < sel
            d_sq = (data * data).sum(1)
            sc = 2.0 * (queries[:N_TRUTH] @ data.T) - d_sq[None, :]
            sc[:, ~mask] = -np.inf
            f_truth = np.argsort(-sc, axis=1)[:, :K]
            del sc
            if sel < 0.05 or hidx is None:
                midx = PlainIndex(store)
                _, f_ids = midx.search(queries[:N_BATCH], k=K, filter_mask=mask)
                f_qps = measure_qps(
                    lambda: midx.search(queries[:N_BATCH], k=K, filter_mask=mask),
                    N_BATCH,
                    reps=3,
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
                    reps=3,
                )
                path = "graph+bias"
            f_recall = recall(f_ids[:N_TRUTH], f_truth)
            log(
                f"filtered sel={sel:.0%} [{path}]: recall@10={f_recall:.4f} "
                f"qps={f_qps:.1f}"
            )
            filt[f"{sel:.0%}"] = {
                "recall_at_10": round(f_recall, 4),
                "qps": round(f_qps, 1),
                "path": path,
            }
        STATE["detail"]["filtered_1m_sift128"] = filt
        emit()

    # free the dense 1M block before the 1536-d config
    del store, data, truth
    hidx = None
    gc.collect()

    # ------------------------------------------------------------------
    # config 1: exact full-scan, 100k GloVe-like 100-d cosine
    # ------------------------------------------------------------------
    if "scan" not in SKIP:
        n1, d1 = 100_000, 100
        g_data = rng.standard_normal((n1, d1), dtype=np.float32)
        g_q = g_data[rng.integers(0, n1, N_BATCH)] + 0.05 * rng.standard_normal(
            (N_BATCH, d1), dtype=np.float32
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
        STATE["detail"]["exact_100k_glove100_cosine"] = {
            "qps": round(g_qps, 1),
            "recall_at_10": round(g_recall, 4),
        }
        log(f"exact 100k glove100 cosine: qps={g_qps:.0f} recall={g_recall:.4f}")
        emit()
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
        t0 = time.perf_counter()
        centers3 = rng.standard_normal((256, d3), dtype=np.float32)
        sq_data = centers3[rng.integers(0, 256, n3)] + tiled_noise(rng, n3, d3)
        sq_q = centers3[rng.integers(0, 256, 256)] + rng.standard_normal(
            (256, d3), dtype=np.float32
        )
        log(f"sq datagen {time.perf_counter() - t0:.1f}s")
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
            lambda: np.asarray(scan_search_sq_rescore(*args3)[1]), 256, reps=3
        )
        gt3 = np.argsort(-(sq_q[:N_TRUTH] @ sq_data.T), axis=1)[:, :K]
        sq_recall = recall(sq_ids[:N_TRUTH], gt3)
        STATE["detail"]["sq_int8_1m_1536_dot"] = {
            "n": n3,
            "qps": round(sq_qps, 1),
            "recall_at_10": round(sq_recall, 4),
        }
        log(f"sq-int8 {n3}x1536 dot: qps={sq_qps:.0f} recall={sq_recall:.4f}")
        emit()
        del sq_data, vecs_f32, codes_dev, quant, args3
        gc.collect()

    # ------------------------------------------------------------------
    # config 5: sparse SPLADE-like 1M + dense+sparse RRF hybrid
    # ------------------------------------------------------------------
    if "sparse" not in SKIP:
        sparse_cfg(rng, cpu_qps)

    emit(final=True)
    log("core configs complete — running scale extras")

    # ------------------------------------------------------------------
    # extras: each re-emits the cumulative JSON when it lands, so a
    # harness timeout mid-extra never loses completed results
    # ------------------------------------------------------------------
    try:
        if "tiered" not in SKIP:
            tiered_cfg(rng)
        if "hnsw1536" not in SKIP:
            hnsw1536_cfg(rng)
        if "crossover" not in SKIP:
            crossover_cfg(rng)
    except Exception as exc:  # extras must never invalidate the core line
        log(f"extra config failed: {type(exc).__name__}: {exc}")
        STATE["detail"]["extra_error"] = f"{type(exc).__name__}: {exc}"
    emit(final=True)


def sparse_cfg(rng, cpu_qps):
    from qdrant_tpu.index.plain import PlainIndex
    from qdrant_tpu.index.sparse import SparseIndex, SparseVectorStore
    from qdrant_tpu.storage.vectors import DenseVectorStore
    from qdrant_tpu.types import Distance, SparseVector

    n5 = int(os.environ.get("BENCH_SPARSE_N", 1_000_000))
    if n5 != 1_000_000:
        log(f"NOTE: sparse config reduced via env to n={n5}")
    vocab = 30_000
    avg_nnz = 64
    t0 = time.perf_counter()
    # Zipf-ish term frequencies: hot terms get postings far beyond any
    # fixed window (the reference's WAND stress case). Fully vectorized:
    # inverse-CDF draws + flat ingest (per-row python objects cost minutes
    # at this scale — the round-2 bench died here).
    term_p = 1.0 / (np.arange(1, vocab + 1) ** 0.9)
    term_p /= term_p.sum()
    cdf = np.cumsum(term_p)
    lens = np.maximum(rng.poisson(avg_nnz, size=n5), 4)
    total = int(lens.sum())
    terms = np.searchsorted(cdf, rng.random(total)).astype(np.int64)
    weights = np.abs(rng.normal(1.0, 0.6, size=total)).astype(np.float32) + 0.05
    sstore = SparseVectorStore()
    sstore.add_flat(lens, terms, weights)
    log(f"sparse datagen+store {time.perf_counter() - t0:.1f}s "
        f"({total / 1e6:.0f}M postings)")
    sidx = SparseIndex(sstore)
    t0 = time.perf_counter()
    sidx._device()
    sidx._hot_device()
    sidx._fwd_cold_device()
    log(f"sparse index build {time.perf_counter() - t0:.1f}s")

    nq = 64
    q_lens = np.maximum(rng.poisson(48, size=nq), 4)
    s_queries = []
    for i in range(nq):
        t_u = np.unique(np.searchsorted(cdf, rng.random(q_lens[i])))
        w_i = np.abs(rng.normal(1.0, 0.6, size=len(t_u))).astype(np.float32)
        s_queries.append(SparseVector(t_u.tolist(), w_i.tolist()))

    # exact sparse truth: one scipy CSR matmul (duplicate dims sum — the
    # same additive semantics as the device index)
    t0 = time.perf_counter()
    import scipy.sparse as sp

    indptr = np.concatenate([[0], np.cumsum(lens)])
    x_csr = sp.csr_matrix((weights, terms, indptr), shape=(n5, vocab))
    q_mat = np.zeros((nq, vocab), np.float32)
    for i, q in enumerate(s_queries):
        q_mat[i, q.indices] = q.values
    s_all = np.asarray((x_csr @ q_mat.T).T)  # [nq, n5]
    # argpartition top-30 then order (a full 1M argsort per query costs
    # ~60 s across the batch; partition is ~6x cheaper)
    part = np.argpartition(-s_all, 30, axis=1)[:, :30]
    rows = np.arange(nq)[:, None]
    s_truth30 = part[rows, np.argsort(-s_all[rows, part], axis=1)]
    s_truth = s_truth30[:, :K]
    log(f"sparse truth {time.perf_counter() - t0:.1f}s")

    _, s_ids = sidx.search(s_queries, k=K)
    s_recall = recall(s_ids[:nq], s_truth)
    s_qps = measure_qps(lambda: sidx.search(s_queries, k=K), nq, reps=5)
    # serving throughput at batch 256 (the micro-batcher coalesces
    # concurrent callers into batches like this; recall is measured on the
    # 64 distinct queries above)
    s_q256 = s_queries * 4
    s_qps256 = measure_qps(lambda: sidx.search(s_q256, k=K), 4 * nq, reps=3)
    log(f"sparse splade {n5}: recall@10={s_recall:.4f} qps={s_qps:.1f} "
        f"qps@b256={s_qps256:.1f}")
    STATE["detail"]["sparse_splade_1m"] = {
        "n": n5,
        "recall_at_10": round(s_recall, 4),
        "qps": round(s_qps, 1),
        "qps_batch256": round(s_qps256, 1),
        "postings": total,
    }
    emit()

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
            out.append([p for p, _ in sorted(sc.items(), key=lambda t: -t[1])][:K])
        return np.asarray(out)

    fused = rrf_fuse(d_ids, s_ids30)
    # hybrid truth: exact RRF of exact dense + exact sparse rankings
    hd_truth, _ = host_exact_topk(h_dense, h_q[:nq], 30)
    fused_truth = rrf_fuse(hd_truth, s_truth30)
    h_recall = recall(fused, fused_truth)
    log(f"hybrid rrf (dense 200k + sparse): recall@10={h_recall:.4f}")
    STATE["detail"]["hybrid_rrf_dense_sparse"] = {
        "n_dense": nh,
        "recall_at_10": round(h_recall, 4),
    }
    emit()
    del sstore, sidx, x_csr, s_all
    gc.collect()


def tiered_cfg(rng):
    """Quantized-primary tiered storage: N x 1536 where the f32 block
    cannot exist in HBM — only int8 codes resident (zero-copy flat scan,
    ops/scan.py::scan_search_sq_flat), exact rescore gathered from the
    host-side f32 memmap (segment.py::_host_rescore semantics)."""
    import shutil
    import tempfile

    import jax.numpy as jnp

    from qdrant_tpu.ops.quantization import ScalarQuantized
    from qdrant_tpu.ops.scan import DEFAULT_BLOCK, scan_search_sq_flat

    n, d = int(os.environ.get("BENCH_TIERED_N", 6_000_000)), 1536
    log(f"tiered config: {n}x{d} (f32 {n * d * 4 / 1e9:.1f} GB > HBM; "
        f"codes {n * d / 1e9:.1f} GB resident)")
    t0 = time.perf_counter()
    centers = rng.standard_normal((512, d), dtype=np.float32)
    tmp = tempfile.mkdtemp(prefix="bench_tiered_")
    mm = np.lib.format.open_memmap(
        os.path.join(tmp, "vecs.npy"), mode="w+", dtype=np.float32, shape=(n, d)
    )
    blk = DEFAULT_BLOCK
    n_pad = (n + blk - 1) // blk * blk
    codes = np.zeros((n_pad, d), dtype=np.int8)
    norms = np.zeros(n_pad, dtype=np.float32)
    scale = None
    step = 500_000
    noise_pool = rng.standard_normal((65536, d), dtype=np.float32)
    for s in range(0, n, step):
        e = min(n, s + step)
        block = centers[rng.integers(0, 512, e - s)] + tiled_noise(
            rng, e - s, d, pool=noise_pool
        )
        mm[s:e] = block
        if scale is None:
            # quantile from the first block (statistically ample sample)
            flat = np.abs(block.reshape(-1))
            scale = max(float(np.quantile(flat, 0.99)), 1e-12) / 127.0
        codes[s:e] = np.clip(np.round(block / scale), -127, 127).astype(np.int8)
        norms[s:e] = (block * block).sum(axis=1)
    mm.flush()
    log(f"tiered datagen+encode {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    codes_dev = jnp.asarray(codes)
    norms_dev = jnp.asarray(norms)
    del codes
    gc.collect()
    mask = np.zeros(n_pad, np.int8)
    mask[:n] = 1
    mask_dev = jnp.asarray(mask)
    log(f"tiered upload {time.perf_counter() - t0:.1f}s")

    nq, k_over = 64, 128
    q = centers[rng.integers(0, 512, nq)] + rng.standard_normal(
        (nq, d), dtype=np.float32
    )
    qc = jnp.asarray(np.clip(np.round(q / scale), -127, 127).astype(np.int8))
    qn = jnp.asarray((q * q).sum(axis=1).astype(np.float32))

    def search():
        _, cand = scan_search_sq_flat(
            qc, qn, codes_dev, norms_dev, jnp.float32(scale), mask_dev,
            DEFAULT_BLOCK, k_over, False,
        )
        cand = np.asarray(cand, dtype=np.int32)
        s_out = np.full((nq, K), -np.inf, np.float32)
        i_out = np.full((nq, K), -1, np.int32)
        for bi in range(nq):
            ids = cand[bi]
            ids = ids[(ids >= 0) & (ids < n)]
            rows = np.asarray(mm[ids], dtype=np.float32)
            sc = rows @ q[bi]
            order = np.argsort(-sc)[:K]
            s_out[bi, : len(order)] = sc[order]
            i_out[bi, : len(order)] = ids[order]
        return s_out, i_out

    _, ids = search()
    # exact truth: blocked host matmul over the memmap
    t0 = time.perf_counter()
    t_scores = np.zeros((nq, n), np.float32)
    for s in range(0, n, step):
        e = min(n, s + step)
        t_scores[:, s:e] = q @ np.asarray(mm[s:e]).T
    t_truth = np.argsort(-t_scores, axis=1)[:, :K]
    del t_scores
    log(f"tiered truth {time.perf_counter() - t0:.1f}s")
    r = recall(ids[:nq], t_truth)
    qps = measure_qps(lambda: search(), nq, reps=3)
    log(f"tiered {n}x{d}: recall@10={r:.4f} qps={qps:.1f}")
    STATE["detail"]["tiered_quantized_primary"] = {
        "n": n,
        "dim": d,
        "f32_gb": round(n * d * 4 / 1e9, 1),
        "codes_gb": round(n * d / 1e9, 1),
        "recall_at_10": round(r, 4),
        "qps": round(qps, 1),
    }
    emit(final=True)
    del codes_dev, norms_dev, mm
    gc.collect()
    shutil.rmtree(tmp, ignore_errors=True)


def hnsw1536_cfg(rng):
    """BASELINE.md:32 explicit target: 1M x 1536 HNSW build wall-clock
    (bar: under one minute) + ef sweep vs the exact scan on the same data."""
    from qdrant_tpu.index.hnsw import HnswIndex
    from qdrant_tpu.index.plain import PlainIndex
    from qdrant_tpu.storage.vectors import DenseVectorStore
    from qdrant_tpu.types import Distance, HnswConfig

    n, d = int(os.environ.get("BENCH_HNSW1536_N", 1_000_000)), 1536
    t0 = time.perf_counter()
    centers = rng.standard_normal((512, d), dtype=np.float32)
    data = centers[rng.integers(0, 512, n)] + tiled_noise(rng, n, d)
    queries = centers[rng.integers(0, 512, 1024)] + rng.standard_normal(
        (1024, d), dtype=np.float32
    )
    log(f"hnsw1536 datagen {time.perf_counter() - t0:.1f}s")
    truth = np.argsort(-(queries[:N_TRUTH] @ data.T), axis=1)[:, :K]
    store = DenseVectorStore(d, Distance.DOT)
    store.add(data)
    store.device_block()
    sidx = PlainIndex(store)
    _, s_ids = sidx.search(queries[:N_BATCH], k=K)
    scan_r = recall(s_ids[:N_TRUTH], truth)
    scan_qps = measure_qps(lambda: sidx.search(queries[:N_BATCH], k=K), N_BATCH, reps=3)
    log(f"hnsw1536 scan ref: recall={scan_r:.4f} qps={scan_qps:.1f}")
    hidx = HnswIndex(store, HnswConfig(m=16, ef_construct=128), seed=7)
    t0 = time.perf_counter()
    hidx.build(batch_size=4096)
    build_s = time.perf_counter() - t0
    log(f"hnsw1536 build: {build_s:.1f}s ({build_s / n * 1e6:.0f} us/pt)")
    sweep = {}
    for ef in (64, 128):
        _, hids = hidx.search(queries[:1024], k=K, ef=ef)
        h_r = recall(hids[:N_TRUTH], truth)
        h_qps = measure_qps(lambda: hidx.search(queries[:1024], k=K, ef=ef), 1024, reps=2)
        log(f"hnsw1536 ef={ef}: recall={h_r:.4f} qps={h_qps:.1f}")
        sweep[str(ef)] = {"recall_at_10": round(h_r, 4), "qps": round(h_qps, 1)}
    STATE["detail"]["hnsw_1m_1536"] = {
        "build_seconds": round(build_s, 1),
        "target_seconds": 60,
        "ef_sweep": sweep,
        "scan_qps": round(scan_qps, 1),
        "scan_recall": round(scan_r, 4),
    }
    emit(final=True)
    del store, data, hidx
    gc.collect()


def crossover_cfg(rng):
    """Scan-vs-graph crossover at 4M x 128: the scan wall grows linearly
    with N while the graph search is ~log N — measure where they cross
    (round-2 question: the graph had no measured reason to exist)."""
    from qdrant_tpu.index.hnsw import HnswIndex
    from qdrant_tpu.index.plain import PlainIndex
    from qdrant_tpu.storage.vectors import DenseVectorStore
    from qdrant_tpu.types import Distance, HnswConfig

    n, d = int(os.environ.get("BENCH_CROSS_N", 4_000_000)), 128
    t0 = time.perf_counter()
    data, queries = make_dataset(rng, n, d, HNSW_BATCH)
    log(f"crossover datagen {time.perf_counter() - t0:.1f}s")
    d_sq = (data * data).sum(1)
    sc = 2.0 * (queries[:N_TRUTH] @ data.T) - d_sq[None, :]
    truth = np.argsort(-sc, axis=1)[:, :K]
    del sc
    store = DenseVectorStore(d, Distance.EUCLID)
    store.add(data)
    store.device_block()
    sidx = PlainIndex(store)
    _, s_ids = sidx.search(queries[:N_BATCH], k=K)
    scan_r = recall(s_ids[:N_TRUTH], truth)
    scan_qps = measure_qps(lambda: sidx.search(queries[:N_BATCH], k=K), N_BATCH, reps=3)
    log(f"crossover scan {n}x{d}: recall={scan_r:.4f} qps={scan_qps:.1f}")
    hidx = HnswIndex(store, HnswConfig(m=16, ef_construct=128), seed=7)
    t0 = time.perf_counter()
    hidx.build(batch_size=4096)
    build_s = time.perf_counter() - t0
    log(f"crossover build: {build_s:.1f}s ({build_s / n * 1e6:.0f} us/pt)")
    sweep = {}
    for ef in (64, 128):
        _, hids = hidx.search(queries[:HNSW_BATCH], k=K, ef=ef)
        h_r = recall(hids[:N_TRUTH], truth)
        h_qps = measure_qps(
            lambda: hidx.search(queries[:HNSW_BATCH], k=K, ef=ef), HNSW_BATCH, reps=2
        )
        log(f"crossover hnsw ef={ef}: recall={h_r:.4f} qps={h_qps:.1f}")
        sweep[str(ef)] = {"recall_at_10": round(h_r, 4), "qps": round(h_qps, 1)}
    STATE["detail"]["crossover_4m_sift128"] = {
        "n": n,
        "scan_qps": round(scan_qps, 1),
        "scan_recall": round(scan_r, 4),
        "build_seconds": round(build_s, 1),
        "hnsw_ef_sweep": sweep,
    }
    emit(final=True)


if __name__ == "__main__":
    main()
