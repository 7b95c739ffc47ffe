"""Benchmark harness — BASELINE.md configs + scale extras, incremental JSON.

Configs (BASELINE.md:32-38):
  1. exact full-scan        100k GloVe-like 100-d, cosine
  2. HNSW graph             1M SIFT-like 128-d euclid, m=16 efc=128,
                            ef sweep 64-512 (+ build wall-clock)
  3. SQ-int8 + f32 rescore  1M dbpedia-like 1536-d, dot
  4. filtered search        keyword filter at 1% / 10% / 50% selectivity
  5. sparse SPLADE + RRF    1M SPLADE-like sparse + dense hybrid
Extras (after the core line is emitted; each re-emits the JSON, ordered
by value-per-second so a harness timeout keeps completed entries):
  6. TQ-as-primary 10M x 1536, packed 4-bit codes-only residency
  7. 4M x 128 scan-vs-graph crossover point
  8. HNSW 1M x 1536 build (the BASELINE.md:32 build-under-a-minute target)
  9. SQ-primary tiered storage at 6M x 1536 (f32 exceeds HBM)

All N-scale datagen/encode/truth runs ON DEVICE (SynthModel closed form):
this image's host is a single throttled vCPU where one GB of numpy
elementwise work costs ~200 s — host-side datagen is the round-2 bench
killer, not the measured kernels.

The CUMULATIVE result JSON is printed (flushed) after EVERY config — if the
harness timeout kills the run mid-way, the last printed line still carries
every completed config ("partial": true marks an unfinished run; the final
line has "partial": false). Round-2 lesson: a single end-of-run print
produced no artifact at all under rc=124.

Headline metric: best QPS at recall@10 >= 0.95 on the 1M x 128 dense config
(scan and HNSW both measured, better one wins). vs_baseline = that QPS /
single-host numpy exact-scan QPS on the same data (the reference publishes
no absolute numbers in-repo; BASELINE.md).

Process model: the parent orchestrates; every config group runs in its OWN
subprocess with a fresh TPU allocator (round-4 lesson: one OOM in a shared
process poisoned the allocator and took down three configs that fit).

Env knobs: BENCH_N (default 1M), BENCH_D (128), BENCH_SQ_N (1M),
BENCH_SPARSE_N (1M), BENCH_CLIENTS (64), BENCH_CHILD_TIMEOUT (s),
BENCH_SKIP=csv of config names
(scan|product|hnsw|sq|filtered|sparse|tiered|hnsw1536|crossover|tq).
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
N_TRUTH = 256  # queries with exact ground truth (device-computed; 64 was
# +-0.03 recall noise at k=10 — too loose to score the 0.95 bar)
N_CPU_BASE = 16  # queries for the host numpy baseline timing only
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


CHILD = os.environ.get("BENCH_CHILD", "")
STATE_MARK = "@@STATE@@ "


def log(*args):
    tag = f"[{CHILD or 'bench'}]" if CHILD else ""
    print(
        f"[{time.perf_counter() - T_START:7.1f}s]{tag}", *args,
        file=sys.stderr, flush=True,
    )


def emit(final: bool = False):
    STATE["partial"] = not final
    if CHILD:
        # children stream their cumulative state to the orchestrator via a
        # marker line; the parent's stdout is the artifact's only JSON
        print(STATE_MARK + json.dumps(STATE), flush=True)
    else:
        print(json.dumps(STATE), flush=True)


def _log_hbm(tag: str):
    """Per-config HBM audit (round-4 lesson: one extra's OOM cascaded
    invisibly; every config now logs device bytes-in-use at its edges)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        log(
            f"HBM[{tag}]: {stats.get('bytes_in_use', 0) / 1e9:.2f} GB in use"
            f" / {stats.get('bytes_limit', 0) / 1e9:.2f} GB limit"
        )
    except Exception as exc:  # CPU backend has no memory_stats
        log(f"HBM[{tag}]: unavailable ({exc})")


def set_headline(qps: float, cpu_qps: float, path: str):
    """`path` names the call path that produced the number — the headline
    must be reachable by a real client (round-4 lesson: a bench-only helper
    produced a 4x-the-server number)."""
    if qps > STATE["value"]:
        STATE["value"] = round(qps, 1)
        STATE["vs_baseline"] = round(qps / cpu_qps, 2) if cpu_qps else 0.0
        STATE["headline_path"] = path
        ref = STATE.get("ref_cpu_qdrant_qps_assumed")
        if ref:
            STATE["vs_qdrant_32core_est"] = round(qps / ref, 2)


def make_dataset(rng, n, d, n_queries, n_clusters=1024, spread=20.0):
    """Clustered (SIFT-like) data: gaussian mixture, non-negative, scaled.
    f32 standard_normal * spread, NOT rng.normal (which draws f64 then
    casts — 2x the RNG cost; this host is a single throttled vCPU)."""
    centers = rng.uniform(0, 200, size=(n_clusters, d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    data = centers[assign]
    data += spread * rng.standard_normal((n, d), dtype=np.float32)
    np.clip(data, 0, 255, out=data)
    q_assign = rng.integers(0, n_clusters, size=n_queries)
    queries = centers[q_assign] + spread * rng.standard_normal(
        (n_queries, d), dtype=np.float32
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


def measure_qps(fn, batch, reps=5):
    fn()  # warm (compile)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return batch / min(times)


class SynthModel:
    """Clustered gaussian data with a closed form the DEVICE generates and
    the HOST can replay per-row: row j = centers[assign[j]] +
    pool[pick[j]] * jitter[j].

    Rationale: this image's host is one throttled vCPU (~200 s per GB of
    numpy elementwise work, measured), so materializing N x 1536 f32 on the
    host is impossible inside any bench budget. The closed form keeps
    datagen on the TPU (gathers + one FMA, ~free) while `host_rows` can
    synthesize any candidate subset in O(rows) — the same gather+BLAS shape
    as the product's host-memmap rescore (storage/segment.py::_host_rescore),
    standing in for a memmap this host cannot afford to write."""

    def __init__(self, rng, n, d, n_centers=512, pool_rows=16384):
        self.n, self.d = n, d
        self.centers = rng.standard_normal((n_centers, d), dtype=np.float32)
        self.pool = rng.standard_normal((pool_rows, d), dtype=np.float32)
        self.assign = rng.integers(0, n_centers, n).astype(np.int32)
        self.pick = rng.integers(0, pool_rows, n).astype(np.int32)
        self.jitter = (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)
        self._dev = None
        self._block_fn = None

    def device(self):
        import jax.numpy as jnp

        if self._dev is None:
            self._dev = (
                jnp.asarray(self.centers),
                jnp.asarray(self.pool),
                jnp.asarray(self.assign),
                jnp.asarray(self.pick),
                jnp.asarray(self.jitter),
            )
        return self._dev

    def device_block(self, off: int, bs: int):
        """Generate rows [off, off+bs) on device → [bs, d] f32. `off` may
        run past n (padded with row 0 repeats — mask separately)."""
        import functools

        import jax
        import jax.numpy as jnp

        centers_d, pool_d, assign_d, pick_d, jit_d = self.device()
        if self._block_fn is None:

            @functools.partial(jax.jit, static_argnames=("bs",))
            def block_fn(centers_d, pool_d, assign_d, pick_d, jit_d, off, bs):
                a = jax.lax.dynamic_slice_in_dim(assign_d, off, bs)
                p = jax.lax.dynamic_slice_in_dim(pick_d, off, bs)
                jt = jax.lax.dynamic_slice_in_dim(jit_d, off, bs)
                return centers_d[a] + pool_d[p] * jt[:, None]

            self._block_fn = block_fn
        # index arrays are padded so dynamic_slice never clamps mid-block
        return self._block_fn(
            centers_d, pool_d, assign_d, pick_d, jit_d, jnp.int32(off), bs=bs
        )

    def pad_to(self, n_pad: int):
        """Extend index arrays so device_block can run to n_pad."""
        extra = n_pad - len(self.assign)
        if extra > 0:
            self.assign = np.concatenate([self.assign, np.zeros(extra, np.int32)])
            self.pick = np.concatenate([self.pick, np.zeros(extra, np.int32)])
            self.jitter = np.concatenate([self.jitter, np.zeros(extra, np.float32)])
            self._dev = None

    def host_rows(self, ids) -> np.ndarray:
        ids = np.asarray(ids, dtype=np.int64)
        return (
            self.centers[self.assign[ids]]
            + self.pool[self.pick[ids]] * self.jitter[ids][:, None]
        )

    def queries(self, rng, nq: int) -> np.ndarray:
        a = rng.integers(0, len(self.centers), nq)
        return self.centers[a] + rng.standard_normal(
            (nq, self.d), dtype=np.float32
        )


def device_truth_ids(q_np, data_dev, k=None, mask_dev=None, euclid=False):
    """Exact top-k ids computed ON device (dot or euclid), BLOCKWISE — the
    whole-array formulation materializes [nq, N] f32 scores plus a layout
    copy of the [N, D] operand for the transposed HIGHEST-precision matmul
    (measured RESOURCE_EXHAUSTED at 1M x 1536 next to the 6.2 GB master).
    Downloads only [nq, k] per block; final merge on host."""
    import functools

    import jax
    import jax.numpy as jnp

    k = k or K
    q = jnp.asarray(np.asarray(q_np, dtype=np.float32))
    n = data_dev.shape[0]

    # HIGHEST: truth must be exact f32 — the TPU default matmul precision
    # is bf16-based and would make "exact truth" itself approximate
    @functools.partial(jax.jit, static_argnames=("bs", "masked"))
    def step(q, data, mask, off, bs, masked):
        blk = jax.lax.dynamic_slice_in_dim(data, off, bs).astype(jnp.float32)
        s = jnp.matmul(q, blk.T, precision=jax.lax.Precision.HIGHEST)
        if euclid:
            s = 2.0 * s - (blk * blk).sum(axis=1)[None, :]
        if masked:
            mblk = jax.lax.dynamic_slice_in_dim(mask, off, bs)
            s = jnp.where(mblk[None, :], s, -jnp.inf)
        ts, ti = jax.lax.top_k(s, min(k, bs))
        return ts, ti + off

    masked = mask_dev is not None
    mask_arg = mask_dev if masked else jnp.zeros((n,), jnp.bool_)
    part_s, part_i = [], []
    bs = min(262144, n)
    off = 0
    while off < n:
        step_bs = min(bs, n - off)
        ts, ti = step(q, data_dev, mask_arg, jnp.int32(off), bs=step_bs,
                      masked=masked)
        part_s.append(np.asarray(ts))
        part_i.append(np.asarray(ti))
        off += step_bs
    all_s = np.concatenate(part_s, axis=1)
    all_i = np.concatenate(part_i, axis=1)
    order = np.argsort(-all_s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(all_i, order, axis=1).astype(np.int32)


CORE_CONFIGS = {"scan", "hnsw", "sq", "filtered", "sparse", "product"}
EXTRA_NAMES = ("hnsw1536", "crossover", "tq", "tiered", "interference")


def main():
    if CHILD:
        _child_main(CHILD)
    else:
        _orchestrate()


def _orchestrate():
    """Run every config group in its OWN subprocess (the parent never
    imports jax, so each child gets the TPU with a fresh allocator).

    Round-4 lesson: all four scale extras died RESOURCE_EXHAUSTED in one
    process — the first genuine OOM (hnsw1536) left the in-process
    allocator unusable and took down even a 3 GB-working-set config that
    fits trivially. Process isolation makes that cascade structurally
    impossible: an OOM kills exactly one child, the next starts clean.

    The parent merges each child's streamed state into the cumulative
    artifact and re-emits after every update, so a harness timeout at any
    point still leaves a JSON line carrying everything completed.
    `partial` stays true unless EVERY config produced data (a crashed or
    killed child is not "ran")."""
    import subprocess
    import threading

    jobs = []
    if CORE_CONFIGS - SKIP:
        jobs.append("core")
    jobs += [n for n in EXTRA_NAMES if n not in SKIP]
    failed = []
    for name in jobs:
        default_to = 3600 if name == "core" else 2700
        timeout = float(os.environ.get("BENCH_CHILD_TIMEOUT", default_to))
        log(f"--- child '{name}' starting (timeout {timeout:.0f}s)")
        env = dict(os.environ, BENCH_CHILD=name)
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            stdout=subprocess.PIPE,
            text=True,
        )
        timed_out = threading.Event()

        def _kill():
            timed_out.set()
            proc.kill()

        timer = threading.Timer(timeout, _kill)
        timer.start()
        try:
            for line in proc.stdout:
                line = line.strip()
                if line.startswith(STATE_MARK):
                    _merge_child_state(json.loads(line[len(STATE_MARK):]))
                    emit()
                elif line:
                    log(f"[{name} stdout] {line}")
        finally:
            rc = proc.wait()
            timer.cancel()
        if rc != 0:
            failed.append(name)
            key = "core_error" if name == "core" else f"extra_error_{name}"
            if key not in STATE["detail"]:
                STATE["detail"][key] = (
                    f"killed: child timeout {timeout:.0f}s"
                    if timed_out.is_set()
                    else f"child exit code {rc}"
                )
            log(f"--- child '{name}' FAILED (rc={rc})")
            emit()
        else:
            log(f"--- child '{name}' done")
    errors = sorted(
        k for k in STATE["detail"]
        if k == "core_error" or k.startswith("extra_error_")
    )
    if errors:
        STATE["configs_failed"] = errors
    # "partial": false ONLY when every config produced data — an artifact
    # whose scale tier crashed must say so on its top-level line
    emit(final=not errors)


def _merge_child_state(cs: dict):
    STATE["detail"].update(cs.get("detail", {}))
    for k in ("ref_cpu_qdrant_qps_assumed",):
        if k in cs:
            STATE[k] = cs[k]
    if cs.get("value", 0) > STATE["value"]:
        STATE["value"] = cs["value"]
        STATE["vs_baseline"] = cs.get("vs_baseline", 0.0)
        if "vs_qdrant_32core_est" in cs:
            STATE["vs_qdrant_32core_est"] = cs["vs_qdrant_32core_est"]
        if "headline_path" in cs:
            STATE["headline_path"] = cs["headline_path"]


def _child_main(name: str):
    # SIGUSR1 → stack dump to stderr without killing the child (first
    # device compiles through a tunneled link can take minutes; this
    # distinguishes "slow" from "stuck")
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1, file=sys.stderr)
    if os.environ.get("BENCH_STALL_DUMP"):
        faulthandler.dump_traceback_later(
            int(os.environ["BENCH_STALL_DUMP"]), repeat=True, file=sys.stderr
        )
    import jax

    if os.environ.get("BENCH_FORCE_CPU"):
        # env JAX_PLATFORMS=cpu is overridden by the axon plugin; only the
        # config knob (set before first jax use) actually forces CPU
        jax.config.update("jax_platforms", "cpu")
        log("NOTE: BENCH_FORCE_CPU — running on the CPU backend")
    # persistent compilation cache: children are separate processes, and
    # remote compiles through a tunneled link cost minutes — cache across
    # children and across bench runs
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("BENCH_JAX_CACHE", "/tmp/qdrant_tpu_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception as exc:
        log(f"compilation cache unavailable: {exc}")
    rng = np.random.default_rng(42)
    _log_hbm(f"{name} start")
    try:
        if name == "core":
            core_cfg(rng)
        else:
            {
                "hnsw1536": hnsw1536_cfg,
                "crossover": crossover_cfg,
                "tq": tiered_tq_cfg,
                "tiered": tiered_cfg,
                "interference": interference_cfg,
            }[name](rng)
    except BaseException as exc:
        if isinstance(exc, (KeyboardInterrupt, SystemExit)):
            raise
        import traceback

        traceback.print_exc(file=sys.stderr)
        key = "core_error" if name == "core" else f"extra_error_{name}"
        STATE["detail"][key] = f"{type(exc).__name__}: {exc}"
        emit()
        _log_hbm(f"{name} failed")
        sys.exit(3)
    _log_hbm(f"{name} done")
    emit()


def core_cfg(rng):
    from qdrant_tpu.index.plain import PlainIndex
    from qdrant_tpu.storage.vectors import DenseVectorStore
    from qdrant_tpu.types import Distance

    # ------------------------------------------------------------------
    # dense 1M x 128: scan path (headline) + HNSW (config 2) + filtered (4)
    # ------------------------------------------------------------------
    cpu_qps = 1.0
    if {"scan", "hnsw", "filtered"} - SKIP:
        if N != 1_000_000 or D != 128:
            log(f"NOTE: dense config reduced via env to {N}x{D}")
        log(f"dataset: {N}x{D} euclid, truth on {N_TRUTH}, scan QPS on {N_BATCH}")
        t0 = time.perf_counter()
        data, queries = make_dataset(rng, N, D, max(N_BATCH, HNSW_BATCH))
        log(f"datagen {time.perf_counter() - t0:.1f}s")

        # host numpy exact scan, timed on a small batch — the 1-vCPU
        # baseline denominator only (truth itself is computed on device
        # below: exact f32 HIGHEST, 256 queries)
        _, cpu_elapsed = host_exact_topk(data, queries[:N_CPU_BASE], K)
        cpu_qps = N_CPU_BASE / cpu_elapsed
        log(f"cpu exact baseline: {cpu_elapsed:.2f}s -> {cpu_qps:.1f} qps")
        # BASELINE.md north star is "higher QPS/chip than qdrant on a
        # 32-core CPU node" — qdrant publishes ~1-4k QPS at 1M x 128-ish
        # configs on such nodes; record the honest comparison next to the
        # 1-vCPU numpy denominator so vs_baseline can't read as a straw man
        STATE["ref_cpu_qdrant_qps_assumed"] = 4000
        store = DenseVectorStore(D, Distance.EUCLID)
        store.add(data)
        t0 = time.perf_counter()
        store.scan_index()
        vecs_dev_core, mask_dev_core = store.device_block()
        truth = device_truth_ids(
            queries[:N_TRUTH], vecs_dev_core, K, mask_dev_core, euclid=True
        )
        log(f"device upload + truth {time.perf_counter() - t0:.1f}s")

    if "scan" not in SKIP:
        idx = PlainIndex(store)
        _, ids = idx.search(queries[:N_BATCH], k=K)
        r = recall(ids[:N_TRUTH], truth)
        qps = measure_qps(lambda: idx.search(queries[:N_BATCH], k=K), N_BATCH)
        # sustained serving shape: the micro-batcher keeps several batches
        # in flight and PlainIndex.search_many pipelines upload/scan/
        # download — one device_get per WINDOW instead of one ~25 ms
        # tunnel round trip per batch (the synchronous number above is
        # latency-bound, not device-bound)
        window = [queries[:N_BATCH], queries[N_BATCH : 2 * N_BATCH]] * 4
        n_win = sum(len(w) for w in window)
        res = idx.search_many(window, k=K)
        r_sus = recall(res[0][1][:N_TRUTH], truth)
        sus_qps = measure_qps(
            lambda: idx.search_many(window, k=K), n_win, reps=3
        )
        log(
            f"scan path: recall@10={r:.4f} qps={qps:.1f} "
            f"sustained={sus_qps:.1f} (recall {r_sus:.4f})"
        )
        STATE["detail"]["scan_1m_sift128"] = {
            "recall_at_10": round(r, 4),
            "qps": round(qps, 1),
            "sustained_qps": round(sus_qps, 1),
            "sustained_recall_at_10": round(r_sus, 4),
            "n": N,
            "dim": D,
            "batch": N_BATCH,
            "pipeline_depth": len(window),
        }
        if r >= TARGET_RECALL:
            set_headline(qps, cpu_qps, "index-scan-sync")
        # the pipelined search_many number is detail only: the headline
        # slot belongs to the product serving path (product_cfg)
        emit()

    # the HEADLINE config: the same 1M x 128 dataset served through the
    # REAL product path (Collection -> micro-batcher -> pipelined shard
    # windows) under concurrent client threads. Runs right after the scan
    # so a driver timeout can't cost the one number that names the artifact.
    if "product" not in SKIP and {"scan", "hnsw", "filtered"} - SKIP:
        product_cfg(data, queries, truth, cpu_qps)

    # cheap, high-value configs land BEFORE the slow graph build so a
    # driver timeout can only cost the graph numbers (round-2 lesson: the
    # harness rc=124'd with the sparse config never reached)
    if "scan" not in SKIP:
        glove_cfg(rng)
    if "sq" not in SKIP:
        sq_cfg(rng)
    if "sparse" not in SKIP:
        sparse_cfg(rng, cpu_qps)

    hidx = None
    if "hnsw" not in SKIP:
        from qdrant_tpu.index.hnsw import HnswIndex
        from qdrant_tpu.types import HnswConfig

        hidx = HnswIndex(store, HnswConfig(), seed=7)  # product default profile
        t0 = time.perf_counter()
        hidx.build(batch_size=4096)
        build_s = time.perf_counter() - t0
        log(f"hnsw build ({N} pts): {build_s:.1f}s ({build_s / N * 1e6:.0f} us/pt)")
        sweep = {}
        for ef in (64, 128, 256):
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
                set_headline(h_qps, cpu_qps, "index-hnsw")
        STATE["detail"]["hnsw_1m_sift128"] = {
            "build_seconds": round(build_s, 1),
            "ef_sweep": sweep,
            "batch": HNSW_BATCH,
            "m": HnswConfig().m,
            "ef_construct": HnswConfig().ef_construct,
        }
        emit()

    # config 4: filtered search at 1% / 10% / 50% selectivity.
    # The PRODUCT path at 1M rows is the masked scan at every selectivity:
    # storage/segment.py::_should_use_graph routes to the graph only above
    # the measured scan-vs-graph crossover row count, and the masked scan
    # is exact whatever the filter matches. The graph+ACORN numbers are
    # reported alongside as diagnostics (they become the product path above
    # the crossover / beyond-HBM tiers).
    if "filtered" not in SKIP:
        import jax.numpy as jnp

        vecs_dev, _ = store.device_block()
        cap = vecs_dev.shape[0]
        filt = {}
        for sel in (0.01, 0.10, 0.50):
            mask = rng.random(N) < sel
            mask_pad = np.zeros(cap, dtype=bool)
            mask_pad[:N] = mask
            # truth on device: a host masked matmul at 1M x 128 costs
            # ~60 s per selectivity on this 1-vCPU image
            f_truth = device_truth_ids(
                queries[:N_TRUTH], vecs_dev, K, jnp.asarray(mask_pad),
                euclid=True,
            )
            midx = PlainIndex(store)
            _, f_ids = midx.search(queries[:N_BATCH], k=K, filter_mask=mask)
            f_qps = measure_qps(
                lambda: midx.search(queries[:N_BATCH], k=K, filter_mask=mask),
                N_BATCH,
                reps=2,
            )
            f_recall = recall(f_ids[:N_TRUTH], f_truth)
            log(
                f"filtered sel={sel:.0%} [masked-scan]: "
                f"recall@10={f_recall:.4f} qps={f_qps:.1f}"
            )
            entry = {
                "recall_at_10": round(f_recall, 4),
                "qps": round(f_qps, 1),
                "path": "masked-scan",
            }
            if hidx is not None and sel >= 0.05:
                # diagnostic: the filtered-graph path the dispatcher uses
                # above the crossover (ACORN for selectivity <= 0.4)
                acorn = sel <= 0.4
                gpath = "graph+acorn" if acorn else "graph+bias"
                _, g_ids = hidx.search(
                    queries[:N_BATCH], k=K, ef=128, filter_mask=mask,
                    acorn=acorn,
                )
                g_qps = measure_qps(
                    lambda: hidx.search(
                        queries[:N_BATCH], k=K, ef=128, filter_mask=mask,
                        acorn=acorn,
                    ),
                    N_BATCH,
                    reps=2,
                )
                g_recall = recall(g_ids[:N_TRUTH], f_truth)
                log(
                    f"filtered sel={sel:.0%} [{gpath} diagnostic]: "
                    f"recall@10={g_recall:.4f} qps={g_qps:.1f}"
                )
                entry["graph_diagnostic"] = {
                    "recall_at_10": round(g_recall, 4),
                    "qps": round(g_qps, 1),
                    "path": gpath,
                }
            filt[f"{sel:.0%}"] = entry
        STATE["detail"]["filtered_1m_sift128"] = filt
        emit()

    # free the dense 1M block (the orchestrator runs the 1536-d scale
    # configs in their own subprocesses)
    if {"scan", "hnsw", "filtered"} - SKIP:
        del store, data, truth
    hidx = None
    gc.collect()
    log("core configs complete")


def product_cfg(data, queries, truth, cpu_qps):
    """HEADLINE config: the 1M x 128 dataset served through the PRODUCT
    path — a real Collection (array-native bulk_ingest), searched via
    Collection.search_dense so concurrent client threads coalesce in the
    micro-batcher and drain as depth-D pipelined windows
    (Shard.search_dense_many: every chunk's device program dispatched
    before ONE jax.device_get). This is the throughput an actual REST/gRPC
    client population sees — round-4's sustained number lived in a helper
    no server code called. Reference behavior analogue: the threadpool
    fan-out that keeps the engine saturated under concurrent load
    (segments_searcher.rs:212-306)."""
    import shutil
    import tempfile
    import threading

    from qdrant_tpu.collection.collection import Collection
    from qdrant_tpu.types import (
        CollectionParams,
        Distance,
        OptimizersConfig,
        VectorParams,
    )

    tmp = tempfile.mkdtemp(prefix="bench_coll_")
    coll = None
    try:
        coll = Collection(
            "bench",
            tmp,
            CollectionParams(
                vectors={"": VectorParams(size=D, distance=Distance.EUCLID)},
                sparse_vectors={},
            ),
            # huge threshold = indexing optimizer off: at 1M rows the
            # dispatcher routes to the masked scan anyway (below the
            # measured crossover), and a background graph build mid-
            # measurement would contaminate the serving numbers (that
            # interference is measured separately — interference_cfg)
            optimizers_config=OptimizersConfig(indexing_threshold=1 << 40),
        )
        t0 = time.perf_counter()
        coll.bulk_ingest(list(range(len(data))), {"": data})
        ingest_s = time.perf_counter() - t0
        log(
            f"product bulk_ingest {len(data)} pts: {ingest_s:.1f}s "
            f"({len(data) / ingest_s / 1e3:.0f}k pts/s)"
        )

        # recall through the full product path (same truth as the scan cfg)
        res = coll.search_dense("", queries[:N_TRUTH], K)
        ids = np.asarray(
            [[pid for _, pid, _ in r] + [-1] * (K - len(r)) for r in res]
        )
        r_prod = recall(ids, truth)
        sync_qps = measure_qps(
            lambda: coll.search_dense("", queries[:N_BATCH], K),
            N_BATCH,
            reps=3,
        )
        log(f"product sync b{N_BATCH}: recall@10={r_prod:.4f} qps={sync_qps:.1f}")

        # concurrent clients: T threads x B rows/request, each thread
        # fires its next request the moment the previous returns — the
        # backlog (T*B rows) is what lets the batcher form depth-D windows
        T = int(os.environ.get("BENCH_CLIENTS", 64))
        B = int(os.environ.get("BENCH_CLIENT_ROWS", 128))
        iters = max(int(os.environ.get("BENCH_CLIENT_ITERS", 8)), 2)
        nq = queries.shape[0]

        def client(ti: int):
            off = (ti * 131) % max(nq - B, 1)
            for _ in range(iters):
                coll.search_dense("", queries[off : off + B], K)

        def one_round():
            threads = [
                threading.Thread(target=client, args=(ti,)) for ti in range(T)
            ]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            return T * B * iters / (time.perf_counter() - t0)

        one_round()  # warm: compiles the padded chunk shapes
        conc_qps = max(one_round() for _ in range(3))
        log(
            f"product concurrent ({T} clients x {B} rows): "
            f"qps={conc_qps:.1f} ({conc_qps / max(sync_qps, 1e-9):.2f}x sync)"
        )
        STATE["detail"]["product_serving_1m_sift128"] = {
            "recall_at_10": round(r_prod, 4),
            "bulk_ingest_seconds": round(ingest_s, 1),
            "sync_qps": round(sync_qps, 1),
            "concurrent_qps": round(conc_qps, 1),
            "clients": T,
            "rows_per_request": B,
            "path": "Collection.search_dense -> MicroBatcher depth-8 "
            "windows -> Shard.search_dense_many",
        }
        if r_prod >= TARGET_RECALL:
            set_headline(sync_qps, cpu_qps, "collection-sync")
            set_headline(conc_qps, cpu_qps, f"collection-concurrent-{T}c")
        emit()
    finally:
        if coll is not None:
            for shard in coll.shards.values():
                try:
                    shard.close()
                except Exception:
                    pass
        del coll
        gc.collect()
        shutil.rmtree(tmp, ignore_errors=True)


def glove_cfg(rng):
    """Config 1: exact full-scan, 100k GloVe-like 100-d cosine."""
    from qdrant_tpu.index.plain import PlainIndex
    from qdrant_tpu.storage.vectors import DenseVectorStore
    from qdrant_tpu.types import Distance

    if True:
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

def sq_cfg(rng):
    """Config 3: SQ-int8 + oversampled f32 rescore, 1M x 1536 dot."""
    if True:
        import jax
        import jax.numpy as jnp

        from qdrant_tpu.ops.scan import DEFAULT_BLOCK, scan_search_sq_rescore

        n3 = int(os.environ.get("BENCH_SQ_N", 1_000_000))
        if n3 != 1_000_000:
            log(f"NOTE: SQ config reduced via env to n={n3}")
        d3 = 1536
        t0 = time.perf_counter()
        # data generated ON DEVICE (host materialization of 6 GB costs
        # minutes on this 1-vCPU image); encode = the same round/clip
        # formula as ScalarQuantized.encode, run as one jit
        sm = SynthModel(rng, n3, d3, n_centers=256)
        blk = DEFAULT_BLOCK
        n_pad = max((n3 + blk - 1) // blk * blk, blk)
        sm.pad_to(n_pad)
        vecs_f32 = sm.device_block(0, n_pad)  # [n_pad, d3] f32
        sample = jnp.abs(vecs_f32[:65536].ravel())
        sq_scale = float(jnp.quantile(sample, 0.99)) / 127.0
        mask3 = np.zeros(n_pad, np.int8)
        mask3[:n3] = 1
        mask3_dev = jnp.asarray(mask3)

        @jax.jit
        def encode_sq(v, mask):
            codes = jnp.clip(jnp.round(v / sq_scale), -127, 127).astype(jnp.int8)
            norms = (v * v).sum(axis=1) * mask
            return codes, norms

        codes_dev, norms_dev = encode_sq(vecs_f32, mask3_dev.astype(jnp.float32))
        sq_q = sm.queries(rng, 256)
        log(f"sq datagen+encode (device) {time.perf_counter() - t0:.1f}s")
        qc = jnp.asarray(
            np.clip(np.round(sq_q / sq_scale), -127, 127).astype(np.int8)
        )
        qn3 = jnp.asarray((sq_q * sq_q).sum(axis=1).astype(np.float32))
        args3 = (
            qc,
            qn3,
            codes_dev,
            norms_dev,
            jnp.float32(sq_scale),
            mask3_dev,
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
        gt3 = device_truth_ids(sq_q[:N_TRUTH], vecs_f32, K, mask3_dev > 0)
        sq_recall = recall(sq_ids[:N_TRUTH], gt3)
        STATE["detail"]["sq_int8_1m_1536_dot"] = {
            "n": n3,
            "qps": round(sq_qps, 1),
            "recall_at_10": round(sq_recall, 4),
        }
        log(f"sq-int8 {n3}x1536 dot: qps={sq_qps:.0f} recall={sq_recall:.4f}")
        emit()
        del sm, vecs_f32, codes_dev, norms_dev, args3
        gc.collect()


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
    # pipelined window (the product serving shape: Collection.search_sparse
    # drains micro-batcher backlogs through search_many — one device_get
    # per depth-8 window instead of one tunnel RTT per batch)
    s_window = [s_queries] * 8
    res_many = sidx.search_many(s_window, k=K)
    s_recall_sus = recall(res_many[0][1][:nq], s_truth)
    s_qps_sus = measure_qps(
        lambda: sidx.search_many(s_window, k=K), 8 * nq, reps=3
    )
    log(f"sparse splade {n5}: recall@10={s_recall:.4f} qps={s_qps:.1f} "
        f"qps@b256={s_qps256:.1f} sustained={s_qps_sus:.1f} "
        f"(recall {s_recall_sus:.4f})")
    STATE["detail"]["sparse_splade_1m"] = {
        "n": n5,
        "recall_at_10": round(s_recall, 4),
        "qps": round(s_qps, 1),
        "qps_batch256": round(s_qps256, 1),
        "sustained_qps_b64": round(s_qps_sus, 1),
        "sustained_recall_at_10": round(s_recall_sus, 4),
        "pipeline_depth": 8,
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
    """Quantized-primary tiered storage, SQ-int8 codes-only residency:
    N x 1536 where the f32 block cannot exist in HBM (reference:
    vector_storage/quantized/quantized_vectors.rs:52). Data, encode, and
    exact truth run ON DEVICE blockwise; the host rescores candidates from
    the SynthModel closed form (same gather+BLAS shape as the product's
    memmap rescore, storage/segment.py::_host_rescore)."""
    _tiered_scan_cfg(
        rng,
        int(os.environ.get("BENCH_TIERED_N", 6_000_000)),
        bits=8,
        detail_key="tiered_quantized_primary",
    )


def tiered_tq_cfg(rng):
    """TQ-as-primary at 10M x 1536 on one 16 GB chip: packed 4-bit codes
    (2 level indices/byte over the 2048-d rotated space -> 10.2 GB
    resident) are the ONLY device residency (ops/scan.py::
    scan_search_tq_flat; reference: vector_storage/turbo/mod.rs:1-29 —
    turbo codes ARE the storage, not a sidecar). Encode is the PRODUCT
    formulation (ops/quantization.py::TurboQuantized.encode: randomized
    Hadamard rotation + per-row scale + Lloyd-Max 4-bit levels), run
    blockwise on device. Reports codes-only QPS AND host-rescored
    QPS/recall (quantization_rescore true/false, both product paths)."""
    _tiered_scan_cfg(
        rng,
        int(os.environ.get("BENCH_TQ_N", 10_000_000)),
        bits=4,
        detail_key="tiered_tq_primary",
    )


def _tiered_scan_cfg(rng, n, bits, detail_key):
    """Shared skeleton for the quantized-primary scale configs.

    Everything N-scale happens on device: per 256k block, one jitted step
    generates rows from the SynthModel closed form, encodes them (int8 SQ
    or packed 4-bit TQ), writes them into the donated codes buffer, and
    folds the block into the exact f32 truth top-k. A 61 GB f32 copy never
    exists anywhere — this host (one throttled vCPU) could neither build
    nor hold one."""
    import functools

    import jax
    import jax.numpy as jnp

    from qdrant_tpu.ops.scan import (
        DEFAULT_BLOCK,
        scan_search_sq_flat,
        scan_search_tq_flat,
    )

    d = 1536
    if bits == 8:
        d_codes = d  # int8 SQ: 1 byte per original dim
    else:
        # product TQ: rotate into the next-pow2 Hadamard space, then pack
        # 2 level indices per byte (ops/quantization.py::TurboQuantized)
        d_rot = 1
        while d_rot < d:
            d_rot *= 2
        d_codes = d_rot // 2
    codes_gb = n * d_codes / 1e9
    log(f"tiered[{bits}bit] config: {n}x{d} (f32 {n * d * 4 / 1e9:.1f} GB "
        f"> HBM; codes {codes_gb:.1f} GB resident)")
    t0 = time.perf_counter()
    sm = SynthModel(rng, n, d)
    blk = DEFAULT_BLOCK
    # generation blocks: 1.6 GB f32 transient for SQ; TQ adds [bs, d_rot]
    # rotated transients ON TOP of 10.2 GB resident codes, so it runs
    # 65536-row blocks to stay inside HBM
    bs = min(32 * blk if bits == 8 else 8 * blk,
             max((n + blk - 1) // blk * blk, blk))
    n_pad = max((n + bs - 1) // bs * bs, bs)
    sm.pad_to(n_pad)
    centers_d, pool_d, assign_d, pick_d, jit_d = sm.device()
    nq = 64
    q = sm.queries(rng, nq)
    q_dev = jnp.asarray(q)

    sq_scale = 3.6 / 127.0  # +-3.6 covers a unit-ish gaussian + jitter
    if bits == 4:
        from qdrant_tpu.ops.quantization import (
            _hadamard_rotation,
            _lloyd_max,
        )

        thr_np, levels_np = _lloyd_max(4)
        # [d, d_rot] slice of the orthogonal rotation (rows past d multiply
        # zero-padding) — the exact matrix TurboQuantized.encode applies
        rot_dev = jnp.asarray(_hadamard_rotation(d, seed=13)[:d, :])
        thr_dev = jnp.asarray(thr_np.astype(np.float32))
    else:
        levels_np = np.zeros(16, np.float32)  # unused for SQ

    def tq_quantize(r, sc):
        """Nearest-Lloyd-Max-level index via 4-step binary search over the
        15 midpoint thresholds (a [bs, d_rot, 16] argmin transient would
        not fit HBM next to the resident codes)."""
        x = r / sc[:, None]
        idx = jnp.zeros(x.shape, jnp.int32)
        for step in (8, 4, 2, 1):
            cand = idx + step
            t = jnp.take(thr_dev, jnp.minimum(cand, 15) - 1)
            idx = jnp.where((cand <= 15) & (x > t), cand, idx)
        return idx.astype(jnp.uint8)

    # model/query/rotation arrays are explicit ARGUMENTS (closure-captured
    # device arrays embed as MLIR constants via a host download — the
    # round-5 datagen stall; see _device_store_cfg)
    @functools.partial(
        jax.jit, donate_argnums=(0, 1, 2), static_argnames=("bs",)
    )
    def gen_step(
        codes_buf, scales_buf, norms_buf,
        centers_d, pool_d, assign_d, pick_d, jit_d, q_dev, rot_dev,
        off, bs,
    ):
        a = jax.lax.dynamic_slice_in_dim(assign_d, off, bs)
        p = jax.lax.dynamic_slice_in_dim(pick_d, off, bs)
        jt = jax.lax.dynamic_slice_in_dim(jit_d, off, bs)
        block = centers_d[a] + pool_d[p] * jt[:, None]
        if bits == 8:
            enc = jnp.clip(jnp.round(block / sq_scale), -127, 127).astype(
                jnp.int8
            )
            sc = jnp.zeros((bs,), jnp.float32)  # unused for SQ
        else:
            r = block @ rot_dev  # [bs, d_rot] rotated
            sc = r.std(axis=1) + 1e-12
            idx = tq_quantize(r, sc)
            # half-split packing, same convention as flat_device: byte j =
            # (level[j] << 4) | level[j + d_rot/2]
            half = idx.shape[1] // 2
            enc = (idx[:, :half] << 4) | idx[:, half:]
        codes_buf = jax.lax.dynamic_update_slice(codes_buf, enc, (off, 0))
        scales_buf = jax.lax.dynamic_update_slice(scales_buf, sc, (off,))
        nrm = (block * block).sum(axis=1)
        norms_buf = jax.lax.dynamic_update_slice(norms_buf, nrm, (off,))
        # fold this block into exact truth (dot); mask pad rows
        scores = jnp.matmul(
            q_dev, block.T, precision=jax.lax.Precision.HIGHEST
        )
        valid = (off + jnp.arange(bs)) < n
        scores = jnp.where(valid[None, :], scores, -jnp.inf)
        t_s, t_i = jax.lax.top_k(scores, K)
        return codes_buf, scales_buf, norms_buf, t_s, t_i + off

    codes_buf = jnp.zeros(
        (n_pad, d_codes), jnp.int8 if bits == 8 else jnp.uint8
    )
    scales_buf = jnp.zeros((n_pad,), jnp.float32)
    norms_buf = jnp.zeros((n_pad,), jnp.float32)
    if bits != 4:
        rot_dev = jnp.zeros((1, 1), jnp.float32)  # unused SQ placeholder
    truth_parts = []
    for off in range(0, n_pad, bs):
        codes_buf, scales_buf, norms_buf, t_s, t_i = gen_step(
            codes_buf, scales_buf, norms_buf,
            centers_d, pool_d, assign_d, pick_d, jit_d, q_dev, rot_dev,
            jnp.int32(off), bs=bs,
        )
        truth_parts.append((np.asarray(t_s), np.asarray(t_i)))
    all_s = np.concatenate([s for s, _ in truth_parts], axis=1)
    all_i = np.concatenate([i for _, i in truth_parts], axis=1)
    order = np.argsort(-all_s, axis=1)[:, : 3 * K]
    truth30 = np.take_along_axis(all_i, order, axis=1)
    truth = truth30[:, :K]
    log(f"tiered[{bits}bit] device gen+encode+truth "
        f"{time.perf_counter() - t0:.1f}s")

    mask = np.zeros(n_pad, np.int8)
    mask[:n] = 1
    mask_dev = jnp.asarray(mask)
    qn = jnp.asarray((q * q).sum(axis=1).astype(np.float32))
    k_over = 128

    if bits == 8:
        qc = jnp.asarray(np.clip(np.round(q / sq_scale), -127, 127).astype(np.int8))

        def device_scan(k):
            return scan_search_sq_flat(
                qc, qn, codes_buf, norms_buf, jnp.float32(sq_scale),
                mask_dev, blk, k, False,
            )
    else:
        levels_dev = jnp.asarray(levels_np.astype(np.float32))
        # queries enter the kernel in the rotated space (the rotation is
        # orthogonal, so dot(q_rot, v_rot) == dot(q, v))
        q_rot_dev = q_dev @ rot_dev

        def device_scan(k):
            return scan_search_tq_flat(
                q_rot_dev, qn, codes_buf, scales_buf, norms_buf, levels_dev,
                mask_dev, blk, k, euclid=False, pack=2, bits_w=4,
            )

    # codes-only path (params.quantization_rescore = false)
    def search_codes_only():
        _, cand = device_scan(K)
        return np.asarray(cand, dtype=np.int32)

    ids_codes = search_codes_only()
    r_codes = recall(ids_codes[:nq], truth)
    qps_codes = measure_qps(search_codes_only, nq, reps=3)
    log(f"tiered[{bits}bit] codes-only: recall@10={r_codes:.4f} "
        f"qps={qps_codes:.1f}")

    # oversample + exact host rescore (quantization_rescore = true):
    # rows synthesized from the closed form — same gather+BLAS cost shape
    # as the product memmap gather
    def search_rescored():
        _, cand = device_scan(k_over)
        cand = np.asarray(cand, dtype=np.int32)  # [nq, k_over]
        # ONE stacked closed-form gather + ONE batched BLAS contraction
        # for all queries (the round-3 per-query python loop capped this
        # path at 132 QPS)
        ok = (cand >= 0) & (cand < n)
        flat = np.where(ok, cand, 0).ravel()
        rows = sm.host_rows(flat).reshape(nq, k_over, d)
        sc = np.einsum("qkd,qd->qk", rows, q, optimize=True)
        sc[~ok] = -np.inf
        top = np.argsort(-sc, axis=1)[:, :K]
        return np.where(
            np.take_along_axis(ok, top, axis=1),
            np.take_along_axis(cand, top, axis=1),
            -1,
        ).astype(np.int32)

    ids_re = search_rescored()
    r_re = recall(ids_re[:nq], truth)
    qps_re = measure_qps(search_rescored, nq, reps=3)
    log(f"tiered[{bits}bit] rescored: recall@10={r_re:.4f} qps={qps_re:.1f}")
    STATE["detail"][detail_key] = {
        "n": n,
        "dim": d,
        "bits": bits,
        "f32_gb": round(n * d * 4 / 1e9, 1),
        "codes_gb": round(codes_gb, 1),
        "codes_only": {"recall_at_10": round(r_codes, 4),
                       "qps": round(qps_codes, 1)},
        "rescored": {"recall_at_10": round(r_re, 4), "qps": round(qps_re, 1)},
    }
    emit()
    del codes_buf, scales_buf, norms_buf, sm
    gc.collect()


def _device_store_cfg(rng, n, d, distance, nq):
    """Shared datagen for the graph-at-scale extras: rows come from the
    SynthModel closed form evaluated ON DEVICE (this host is one throttled
    vCPU — materializing N x d f32 host-side was the round-2/3 bench
    killer), wrapped in a DeviceVectorStore whose few host-row reads (HNSW
    seed graph, exact rescore) replay the closed form via host_rows."""
    import functools

    import jax
    import jax.numpy as jnp

    from qdrant_tpu.storage.vectors import DeviceVectorStore

    t0 = time.perf_counter()
    sm = SynthModel(rng, n, d, n_centers=512)
    n_pad = max((n + 4095) // 4096 * 4096, 4096)
    sm.pad_to(n_pad)
    centers_d, pool_d, assign_d, pick_d, jit_d = sm.device()

    # model arrays are explicit ARGUMENTS, not closure captures — jit
    # lowers a captured device array as an embedded MLIR constant, which
    # first DOWNLOADS it through the tunneled link (measured: the 1M x 1536
    # datagen sat >10 min inside _array_mlir_constant_handler)
    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("bs",))
    def _fill(buf, centers_d, pool_d, assign_d, pick_d, jit_d, off, bs):
        a = jax.lax.dynamic_slice_in_dim(assign_d, off, bs)
        p = jax.lax.dynamic_slice_in_dim(pick_d, off, bs)
        jt = jax.lax.dynamic_slice_in_dim(jit_d, off, bs)
        block = centers_d[a] + pool_d[p] * jt[:, None]
        return jax.lax.dynamic_update_slice(buf, block, (off, 0))

    bs = min(262144, n_pad)
    while n_pad % bs:
        bs //= 2
    vecs_dev = jnp.zeros((n_pad, d), jnp.float32)
    for off in range(0, n_pad, bs):
        vecs_dev = _fill(
            vecs_dev, centers_d, pool_d, assign_d, pick_d, jit_d,
            jnp.int32(off), bs=bs,
        )
    store = DeviceVectorStore(
        vecs_dev, distance, count=n, host_fetch=sm.host_rows
    )
    queries = sm.queries(rng, nq)
    log(f"device datagen {n}x{d}: {time.perf_counter() - t0:.1f}s")
    return store, queries


def hnsw1536_cfg(rng):
    """BASELINE.md:32 explicit target: 1M x 1536 HNSW build wall-clock
    (bar: under one minute) + ef sweep vs the exact scan on the same data."""
    from qdrant_tpu.index.hnsw import HnswIndex
    from qdrant_tpu.index.plain import PlainIndex
    from qdrant_tpu.types import Distance, HnswConfig

    n, d = int(os.environ.get("BENCH_HNSW1536_N", 1_000_000)), 1536
    store, queries = _device_store_cfg(rng, n, d, Distance.DOT, 1024)
    vecs_dev, mask_dev = store.device_block()
    truth = device_truth_ids(queries[:N_TRUTH], vecs_dev, K, mask_dev)
    del vecs_dev, mask_dev
    sidx = PlainIndex(store)
    _, s_ids = sidx.search(queries[:N_BATCH], k=K)
    scan_r = recall(s_ids[:N_TRUTH], truth)
    scan_qps = measure_qps(lambda: sidx.search(queries[:N_BATCH], k=K), N_BATCH, reps=3)
    log(f"hnsw1536 scan ref: recall={scan_r:.4f} qps={scan_qps:.1f}")
    # drop the cached bf16 scan block (~3.1 GB at 1M x 1536) BEFORE the
    # graph build — holding it across build() put round 4's working set
    # (f32 master 6.2 GB + scan 3.1 GB + the builder's own bf16 codes
    # 3.1 GB + beam transients) over HBM
    del sidx
    store._scan = None
    store._scan_version = None
    gc.collect()
    _log_hbm("hnsw1536 pre-build")
    hidx = HnswIndex(store, HnswConfig(), seed=7)  # product default profile
    t0 = time.perf_counter()
    hidx.build(batch_size=4096)
    build_s = time.perf_counter() - t0
    _log_hbm("hnsw1536 post-build")
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
    emit()
    del store, hidx
    gc.collect()


def crossover_cfg(rng):
    """Scan-vs-graph crossover at 4M x 128: the scan wall grows linearly
    with N while the graph search is ~log N — measure where they cross
    (round-2 question: the graph had no measured reason to exist)."""
    from qdrant_tpu.index.hnsw import HnswIndex
    from qdrant_tpu.index.plain import PlainIndex
    from qdrant_tpu.types import Distance, HnswConfig

    n, d = int(os.environ.get("BENCH_CROSS_N", 4_000_000)), 128
    store, queries = _device_store_cfg(rng, n, d, Distance.EUCLID, HNSW_BATCH)
    vecs_dev, mask_dev = store.device_block()
    truth = device_truth_ids(
        queries[:N_TRUTH], vecs_dev, K, mask_dev, euclid=True
    )
    sidx = PlainIndex(store)
    _, s_ids = sidx.search(queries[:N_BATCH], k=K)
    scan_r = recall(s_ids[:N_TRUTH], truth)
    scan_qps = measure_qps(lambda: sidx.search(queries[:N_BATCH], k=K), N_BATCH, reps=3)
    log(f"crossover scan {n}x{d}: recall={scan_r:.4f} qps={scan_qps:.1f}")
    scan_sus_qps = 0.0
    if hasattr(sidx, "search_many"):
        window = [queries[i * N_BATCH : (i + 1) * N_BATCH] for i in range(2)] * 4
        n_win = sum(len(w) for w in window)
        scan_sus_qps = measure_qps(
            lambda: sidx.search_many(window, k=K), n_win, reps=3
        )
        log(f"crossover scan sustained: qps={scan_sus_qps:.1f}")
    # free the cached scan block before the graph build (see hnsw1536_cfg)
    del sidx
    store._scan = None
    store._scan_version = None
    gc.collect()
    _log_hbm("crossover pre-build")
    hidx = HnswIndex(store, HnswConfig(), seed=7)  # product default profile
    t0 = time.perf_counter()
    hidx.build(batch_size=4096)
    build_s = time.perf_counter() - t0
    _log_hbm("crossover post-build")
    log(f"crossover build: {build_s:.1f}s ({build_s / n * 1e6:.0f} us/pt)")
    sweep = {}
    for ef in (64, 128, 256):
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
        "scan_sustained_qps": round(scan_sus_qps, 1),
        "scan_recall": round(scan_r, 4),
        "build_seconds": round(build_s, 1),
        "hnsw_ef_sweep": sweep,
    }
    emit()


def interference_cfg(rng):
    """Build/serve interference: search latency percentiles WHILE a 1M x 128
    HNSW build runs on the same device, with the cooperative build throttle
    off vs default. The contended resource on TPU is the single device
    command queue — the builder yields between batches while searches are
    in flight (utils/budget.py::yield_to_searches; reference:
    common/src/budget.rs ResourceBudget gating optimizer runs)."""
    import threading

    from qdrant_tpu.index.hnsw import HnswIndex
    from qdrant_tpu.index.plain import PlainIndex
    from qdrant_tpu.storage.vectors import DenseVectorStore
    from qdrant_tpu.types import Distance, HnswConfig
    from qdrant_tpu.utils.budget import BUDGET

    n, d = int(os.environ.get("BENCH_INTERF_N", 1_000_000)), 128
    data, queries = make_dataset(rng, n, d, 1024)
    store = DenseVectorStore(d, Distance.EUCLID)
    store.add(data)
    store.scan_index()
    idx = PlainIndex(store)
    B = 64

    def one_search():
        # the same BUDGET.search() wrapper the product segment search uses
        # (storage/segment.py:65) — it is what the builder yields to
        with BUDGET.search():
            idx.search(queries[:B], k=K)

    one_search()  # compile

    def timed_searches(stop_when=None, n_max=200):
        lat = []
        while len(lat) < n_max and (stop_when is None or not stop_when.is_set()):
            t0 = time.perf_counter()
            one_search()
            lat.append(time.perf_counter() - t0)
        return lat

    def pcts(lat):
        a = np.asarray(lat) * 1e3
        return round(float(np.percentile(a, 50)), 1), round(
            float(np.percentile(a, 99)), 1
        )

    p50_idle, p99_idle = pcts(timed_searches(n_max=100))
    log(f"interference idle: p50={p50_idle}ms p99={p99_idle}ms")
    out = {"idle": {"p50_ms": p50_idle, "p99_ms": p99_idle}, "n": n, "dim": d}

    prev = os.environ.get("QDRANT_TPU_BUILD_THROTTLE_MS")
    try:
        for mode, thr in (("throttle_off", "0"), ("throttle_default", "5")):
            os.environ["QDRANT_TPU_BUILD_THROTTLE_MS"] = thr
            yielded0 = BUDGET.yielded_s
            hidx = HnswIndex(store, HnswConfig(), seed=7)  # product default profile
            done = threading.Event()
            build_s = [0.0]

            def run_build():
                t0 = time.perf_counter()
                try:
                    hidx.build(batch_size=4096)
                finally:
                    build_s[0] = time.perf_counter() - t0
                    done.set()

            th = threading.Thread(target=run_build)
            th.start()
            lat = timed_searches(stop_when=done, n_max=100_000)
            th.join()
            p50, p99 = pcts(lat)
            out[mode] = {
                "p50_ms": p50,
                "p99_ms": p99,
                "build_seconds": round(build_s[0], 1),
                "searches_during_build": len(lat),
                "builder_yielded_s": round(BUDGET.yielded_s - yielded0, 1),
            }
            log(
                f"interference {mode}: p50={p50}ms p99={p99}ms "
                f"build={build_s[0]:.1f}s ({len(lat)} searches)"
            )
            del hidx
            gc.collect()
    finally:
        if prev is None:
            os.environ.pop("QDRANT_TPU_BUILD_THROTTLE_MS", None)
        else:
            os.environ["QDRANT_TPU_BUILD_THROTTLE_MS"] = prev
    STATE["detail"]["build_serve_interference_1m_sift128"] = out
    emit()


if __name__ == "__main__":
    main()
