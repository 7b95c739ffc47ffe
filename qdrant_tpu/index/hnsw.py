"""TPU-native HNSW index: batched build + batched beam-search queries.

Reference behavior: lib/segment/src/index/hnsw_index/ (hnsw.rs, graph_layers.rs,
graph_layers_builder.rs) and the GPU batched builder
(gpu/gpu_graph_builder.rs:19-60). Re-architected for TPU:

  * Fixed-degree adjacency tables in HBM: level 0 is `[N, M0]` int32
    (-1-padded); all upper levels live in ONE stacked `[L, R, M]` array
    sharing the level-sort `rank` permutation as row index — the dense
    equivalent of the reference's level-sorted CSR reindex
    (graph_links/mod.rs:45-80). The stack lets a whole upper-level greedy
    descent run as a single compiled program (ops/hnsw.py
    greedy_descend_stack), minimizing host↔device round trips.
  * Build follows the GPU builder's scheme: geometric level assignment, a
    brute-force-linked seed set, then fixed-size batches inserted in
    lockstep — batched beam search for candidates, heuristic selection and
    reverse-link pruning on device with shape-stable kernels (compile once,
    reuse for every batch); the host only computes scatter indices.
  * Queries: one fused greedy-descent call + one beam-search call; filter
    masks fused in.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from ..ops import hnsw as hnsw_ops
from ..ops.distances import preprocess_vectors
from ..storage.vectors import DenseVectorStore
from ..types import Distance, HnswConfig

INC_CAP = 64  # max reverse-link insertions routed to one node per round


def _pow2_at_least(x: int, minimum: int = 8) -> int:
    p = minimum
    while p < x:
        p *= 2
    return p


def _pad_rows(arr: np.ndarray, rows: int, fill) -> np.ndarray:
    if arr.shape[0] >= rows:
        return arr[:rows]
    pad_shape = (rows - arr.shape[0],) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, dtype=arr.dtype)], axis=0)


class HnswIndex:
    def __init__(
        self,
        store: DenseVectorStore,
        config: HnswConfig,
        seed: int = 42,
        subset: Optional[np.ndarray] = None,
    ):
        self.store = store
        self.config = config
        self.seed = seed
        # optional subset of global offsets — used for payload-block
        # subgraphs (reference: hnsw/build.rs:364-530 filterable HNSW)
        self.subset = None if subset is None else np.asarray(subset, dtype=np.int32)
        self.distance: Distance = store.distance
        # graph state (populated by build/load)
        self.levels: Optional[np.ndarray] = None  # [n] int32, -1 = not in graph
        self.rank: Optional[np.ndarray] = None  # [n] level-sort permutation rank
        self.entry: int = -1
        self.max_level: int = -1
        self.level_counts: Dict[int, int] = {}
        # host adjacency mirrors are LAZY: after a device build the device
        # arrays are authoritative and the host copies are stale until some
        # host-path consumer (save, incremental insert, tools) reads them.
        # The axon tunnel downloads at ~0.1 MB/s — an eager 16 MB links
        # download costs ~130 s, so device builds never download eagerly.
        self._host_stale = False
        self.links0: Optional[np.ndarray] = None  # [rows0, M0]
        self.links_upper: Optional[np.ndarray] = None  # [L, R, M] levels max..1
        self.counts0: Optional[np.ndarray] = None  # link counts per row
        self.counts_upper: Optional[np.ndarray] = None  # [L, R]
        self._links0_dev: Optional[jax.Array] = None
        self._upper_dev: Optional[jax.Array] = None
        self._rank_dev: Optional[jax.Array] = None
        self._stack_counts_dev: Optional[jax.Array] = None
        # fused link+code table (ops/hnsw_inline.py): None = undecided,
        # False = disabled for this index, dict = built state
        self._inline = None

    # ------------------------------------------------------------------
    # host adjacency mirrors (lazy after device builds)
    # ------------------------------------------------------------------

    def _sync_host(self) -> None:
        """Download the device adjacency into the host mirror if stale."""
        if not self._host_stale:
            return
        self._host_stale = False
        if self._links0_dev is not None:
            self._links0_host = np.asarray(self._links0_dev, dtype=np.int32)
            self._counts0_host = (self._links0_host >= 0).sum(axis=1).astype(
                np.int32
            )
        if self._upper_dev is not None:
            self._links_upper_host = np.asarray(self._upper_dev, dtype=np.int32)
            self._counts_upper_host = (
                (self._links_upper_host >= 0).sum(axis=2).astype(np.int32)
            )

    @property
    def links0(self) -> Optional[np.ndarray]:
        self._sync_host()
        return self._links0_host

    @links0.setter
    def links0(self, v) -> None:
        self._links0_host = v

    @property
    def counts0(self) -> Optional[np.ndarray]:
        self._sync_host()
        return self._counts0_host

    @counts0.setter
    def counts0(self, v) -> None:
        self._counts0_host = v

    @property
    def links_upper(self) -> Optional[np.ndarray]:
        self._sync_host()
        return self._links_upper_host

    @links_upper.setter
    def links_upper(self, v) -> None:
        self._links_upper_host = v

    @property
    def counts_upper(self) -> Optional[np.ndarray]:
        self._sync_host()
        return self._counts_upper_host

    @counts_upper.setter
    def counts_upper(self, v) -> None:
        self._counts_upper_host = v

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _m_at(self, level: int) -> int:
        return self.config.m0 if level == 0 else self.config.m

    def _stack_index(self, level: int) -> int:
        """Stack rows are ordered top level → level 1."""
        return self.max_level - level

    def _links0_device(self) -> jax.Array:
        if self._links0_dev is None:
            self._links0_dev = jnp.asarray(self.links0)
        return self._links0_dev

    def _upper_device(self) -> Optional[jax.Array]:
        if self._upper_dev is not None:
            return self._upper_dev
        # check the raw host attr (not the property) — the property getter
        # would force a stale-sync download just to answer "is there one"
        if self._links_upper_host is None or self._links_upper_host.shape[0] == 0:
            return None
        self._upper_dev = jnp.asarray(self._links_upper_host)
        return self._upper_dev

    def _rank_device(self) -> jax.Array:
        if self._rank_dev is None:
            cap = self.store.device_block()[0].shape[0]
            self._rank_dev = jnp.asarray(_pad_rows(self.rank, cap, -1))
        return self._rank_dev

    def _stack_counts(self) -> jax.Array:
        if self._stack_counts_dev is None:
            counts = np.asarray(
                [self.level_counts.get(l, 0) for l in range(self.max_level, 0, -1)],
                dtype=np.int32,
            )
            self._stack_counts_dev = jnp.asarray(counts)
        return self._stack_counts_dev

    def _row_of(self, level: int, ids: np.ndarray) -> np.ndarray:
        """Global ids → link-table rows (all levels are rank-compact)."""
        return self.rank[ids]

    def _scatter(self, level: int, rows: np.ndarray, values: np.ndarray) -> None:
        """Write full link rows (host mirror + device)."""
        if self._inline:
            self._inline = None  # graph mutated: drop the fused table
        counts = (values >= 0).sum(axis=1).astype(np.int32)
        if level == 0:
            self.links0[rows] = values
            self.counts0[rows] = counts
            if self._links0_dev is not None:
                self._links0_dev = hnsw_ops.scatter_link_rows(
                    self._links0_dev, rows, values
                )
        else:
            i = self._stack_index(level)
            self.links_upper[i, rows] = values
            self.counts_upper[i, rows] = counts
            if self._upper_dev is not None:
                self._upper_dev = _scatter_stack(
                    self._upper_dev, i, jnp.asarray(rows), jnp.asarray(values)
                )

    def _link_counts(self, level: int, rows: np.ndarray) -> np.ndarray:
        if level == 0:
            return self.counts0[rows]
        return self.counts_upper[self._stack_index(level), rows]

    def _links_host(self, level: int, rows: np.ndarray) -> np.ndarray:
        if level == 0:
            return self.links0[rows]
        return self.links_upper[self._stack_index(level), rows]

    def _add_link_counts(self, level: int, rows: np.ndarray, inc: np.ndarray) -> None:
        if level == 0:
            self.counts0[rows] += inc
        else:
            self.counts_upper[self._stack_index(level), rows] += inc

    # ------------------------------------------------------------------
    # build
    # ------------------------------------------------------------------

    def build(
        self,
        batch_size: int = 1024,
        ef_construct: Optional[int] = None,
        progress_fn=None,
    ) -> None:
        """Build the graph over all non-deleted points in the store."""
        n = len(self.store)
        efc = ef_construct or self.config.ef_construct
        m = self.config.m
        rng = np.random.default_rng(self.seed)

        alive = ~self.store.deleted_mask
        if self.subset is not None:
            member = np.zeros(n, dtype=bool)
            member[self.subset[self.subset < n]] = True
            alive = alive & member
        alive_ids = np.nonzero(alive)[0].astype(np.int32)
        n_alive = len(alive_ids)

        # geometric level assignment (reference: graph_layers_builder.rs:388-396)
        ml = 1.0 / np.log(max(m, 2))
        u = rng.random(n_alive)
        levels_alive = np.floor(-np.log(np.clip(u, 1e-12, 1.0)) * ml).astype(np.int32)

        self.levels = np.full(n, -1, dtype=np.int32)
        self.levels[alive_ids] = levels_alive

        if n_alive == 0:
            self.rank = np.full(n, -1, dtype=np.int32)
            self.entry = -1
            self.max_level = -1
            self.level_counts = {}
            return

        tiebreak = rng.random(n_alive)
        order = alive_ids[np.lexsort((tiebreak, -levels_alive))]
        self.rank = np.full(n, -1, dtype=np.int32)
        self.rank[order] = np.arange(len(order), dtype=np.int32)
        self.entry = int(order[0])
        self.max_level = int(self.levels[self.entry])
        self.level_counts = {
            l: int((levels_alive >= l).sum()) for l in range(self.max_level + 1)
        }

        # +1 guarantees a spare padding row at the end — the device insert
        # kernel (ops/hnsw_build.py) uses it to absorb masked scatter writes
        rows0 = _pow2_at_least(max(n_alive, 1) + 1)
        self.links0 = np.full((rows0, self.config.m0), -1, dtype=np.int32)
        self.counts0 = np.zeros(rows0, dtype=np.int32)
        n_upper_levels = self.max_level
        upper_rows = _pow2_at_least(max(self.level_counts.get(1, 1), 1) + 1, 16)
        self.links_upper = np.full(
            (max(n_upper_levels, 0), upper_rows, m), -1, dtype=np.int32
        )
        self.counts_upper = np.zeros((max(n_upper_levels, 0), upper_rows), dtype=np.int32)
        self._links0_dev = None
        self._upper_dev = None
        self._rank_dev = None
        self._stack_counts_dev = None

        vectors, _ = self.store.device_block()
        dist = self.distance.value

        # ---- seed graph: brute-force link the first points --------------
        n_seed = min(n_alive, max(2 * efc, 256), 512)
        seed_ids = order[:n_seed]
        self._build_seed_graph(seed_ids, vectors, dist)

        # ---- batched insertion ------------------------------------------
        import os as _os

        from .. import ops as _ops  # noqa: F401
        from ..ops.pallas_scan import is_tpu_backend

        build_env = _os.environ.get("QDRANT_TPU_DEVICE_BUILD", "1")
        device_build = (
            (is_tpu_backend() or build_env == "force")
            and build_env != "0"
            and n_alive - n_seed > 0
        )
        if device_build:
            self._build_device(order, n_seed, n_alive, efc, batch_size,
                               dist, progress_fn)
            return  # device path heals on device; host mirror stays lazy
        else:
            # host-orchestrated path (CPU tests / small builds): geometric
            # batch ramp — a batch is never more than a fraction of the
            # already-inserted graph, so early points link against a graph
            # that already contains most of their neighborhood (the GPU
            # builder's grouping scheme, gpu_graph_builder.rs:51-60).
            inserted = n_seed
            cur_batch = 256
            while inserted < n_alive:
                while cur_batch < batch_size and cur_batch * 2 <= inserted:
                    cur_batch *= 2
                bsz = min(cur_batch, n_alive - inserted)
                batch = order[inserted : inserted + bsz]
                self._insert_batch(batch, vectors, efc, dist, pad_to=cur_batch)
                inserted += bsz
                if progress_fn:
                    progress_fn(inserted, n_alive)
                from ..utils.budget import BUDGET

                BUDGET.yield_to_searches()

        self._heal_low_indegree(order)

    def _build_device(
        self, order: np.ndarray, n_seed: int, n_alive: int, efc: int,
        batch_size: int, dist: str, progress_fn,
    ) -> None:
        """Device-resident batched insertion (ops/hnsw_build.py): the whole
        level-0 (and upper-level) insert round runs as one jitted program per
        shape; adjacency stays on device across batches and the host sends
        only batch offsets (uploads through the host link are the round-1
        bottleneck: ~35 ms per 512 KB). Codes are SQ int8, encoded once."""
        import jax

        from ..ops import hnsw_build as hb
        from ..ops import quantization as qops

        vectors_f32, _ = self.store.device_block()
        cap = vectors_f32.shape[0]
        n = len(self.store)
        d = self.store.dim
        euclid = self.distance in (Distance.EUCLID, Distance.MANHATTAN)
        # bf16 codes cost 2x the HBM of int8 but carry ~5x less scoring
        # noise (and none of the 0.99-quantile clipping bias that int8 SQ
        # applies to exactly the most discriminative components) — measured
        # +0.05 recall@10 on the final graph at 20k points, same MXU class.
        precision = os.environ.get("QDRANT_TPU_BUILD_PRECISION", "bf16")
        if precision == "int8":
            sq = qops.ScalarQuantized.encode(
                self.store.get_batch(np.arange(n))
            )
            codes_np = np.zeros((cap, d), dtype=np.int8)
            codes_np[:n] = sq.codes
            norms_np = np.zeros(cap, dtype=np.float32)
            norms_np[:n] = sq.norms_sq
            scale_sq = jnp.float32(
                (2.0 if euclid else 1.0) * sq.scale * sq.scale
            )
            codes_dev = jnp.asarray(codes_np)
            norms_dev = jnp.asarray(norms_np)
        else:
            # bf16 codes + norms derived ON DEVICE from the resident f32
            # block: the host cast+norm passes cost minutes at 1M x 1536 on
            # a 1-vCPU host, and uploading bf16 codes would double the
            # host->device transfer for data the device already holds
            @jax.jit
            def _bf16_codes(v):
                vf = v.astype(jnp.float32)
                return vf.astype(jnp.bfloat16), (vf * vf).sum(axis=1)

            codes_dev, norms_dev = _bf16_codes(vectors_f32)
            scale_sq = jnp.float32(2.0 if euclid else 1.0)
        rank_dev = self._rank_device()

        m0 = self.config.m0
        m = self.config.m
        links0_dev = jnp.asarray(self.links0)
        counts0_dev = jnp.asarray(self.counts0)
        owner0_np = np.full(self.links0.shape[0], -1, np.int32)
        owner0_np[self.rank[order]] = order
        owner0_dev = jnp.asarray(owner0_np)
        n_up = self.links_upper.shape[0]
        upper_links = [jnp.asarray(self.links_upper[i]) for i in range(n_up)]
        upper_counts = [
            jnp.asarray(self.counts_upper[i].astype(np.int32))
            for i in range(n_up)
        ]
        owner_up_dev = None
        if n_up:
            rows_up = self.links_upper.shape[1]
            owner_up_np = np.full(rows_up, -1, np.int32)
            ranks_o = self.rank[order]
            sel_up = ranks_o < rows_up
            owner_up_np[ranks_o[sel_up]] = order[sel_up]
            owner_up_dev = jnp.asarray(owner_up_np)

        # order uploaded once; per-batch ids/vectors gathered on device
        order_pad = np.full(n_alive + 8192, -1, np.int32)
        order_pad[:n_alive] = order
        order_dev = jnp.asarray(order_pad)

        # NOTE: vectors/codes are explicit ARGUMENTS, not closure captures —
        # a captured device array is lowered into the HLO as an embedded
        # constant (~74 s of MLIR lowering per specialization at 100k rows)
        @functools.partial(jax.jit, static_argnames=("b_pad",))
        def _prep(order_dev, vecs, codes, start, remaining, b_pad):
            bi = jax.lax.dynamic_slice_in_dim(order_dev, start, b_pad)
            valid = jnp.arange(b_pad) < remaining
            bi = jnp.where(valid, bi, -1)
            safe = jnp.maximum(bi, 0)
            q = jnp.take(vecs, safe, axis=0).astype(jnp.float32)
            q = jnp.where(valid[:, None], q, 0.0)
            qi8 = jnp.take(codes, safe, axis=0)
            qi8 = jnp.where(valid[:, None], qi8, 0)
            return bi, q, qi8

        # expand=8 halves the beam's sequential iteration count vs expand=4
        # at equal total expansions — measured 258 -> 187 us/pt at B=4096
        # with no recall change (the beam is latency-bound on its while_loop
        # chain, not on gather bandwidth: int8 codes time the same as bf16)
        expand = int(os.environ.get("QDRANT_TPU_BUILD_EXPAND", 8))
        iters = max((int(efc * 1.2) + 16) // expand, 8)
        sel_c = min(max(efc, m0), 128)
        inc_cap = int(os.environ.get("QDRANT_TPU_BUILD_INC_CAP", 16))

        # batch ramp: per-point cost falls with batch (fixed per-iteration
        # overheads amortize), but batches beyond 4096 measurably hurt the
        # graph: at 100k points a 16384 lockstep batch left ~2% of queries
        # unreachable at any ef (recall plateau 0.982 at ef 128-512), while
        # 4096 recovers 1.000. (The reverse pass's [B*m0, m0, D] code
        # gather is chunked inside insert_batch_level0, so wide vectors no
        # longer need a smaller batch.)
        top_batch = 4096
        top_batch = int(
            os.environ.get("QDRANT_TPU_BUILD_TOP_BATCH", top_batch)
        )
        # 1024 is in the ramp so cooperative mode (below) has a mid-size
        # compiled shape to drop to — 256 alone starves the build under a
        # saturated search stream
        ramp = [256, 1024, 2048, _pow2_at_least(max(batch_size, top_batch), 256)]
        ramp = sorted({min(r, ramp[-1]) for r in ramp})

        # Cooperative mode under concurrent search load: a 4096-point batch
        # is ~2 s of device time at 1M x 128 — any search dispatched behind
        # it waits that long, so the throttle alone cannot bound p99
        # (measured: p99 4.7 s with sync_every=4 regardless of throttle).
        # When searches are in flight the builder drops to a smaller ramp
        # shape (already compiled during ramp-up — no new programs) and
        # syncs after every batch, bounding a search's queue wait to ~one
        # small batch. The cap is 1024, not the smallest shape: per-batch
        # fixed costs (sequential beam iterations + sync RTT + the bounded
        # yield below) make 256-point batches starve the build ~6x under a
        # saturated search stream, while 1024 keeps the builder at ~60% of
        # device time with a ~0.5 s p99 bound. 0 disables. (Reference
        # behavior: optimizer cedes CPU permits to searches, budget.rs.)
        from ..utils.budget import BUDGET

        throttle_on = float(
            os.environ.get("QDRANT_TPU_BUILD_THROTTLE_MS", 5)
        ) > 0
        contended_cap = int(
            os.environ.get("QDRANT_TPU_BUILD_CONTENDED_BATCH", 1024)
        )
        sync_every = int(os.environ.get("QDRANT_TPU_BUILD_SYNC_EVERY", 4))

        inserted = n_seed
        batches_since_sync = 0
        while inserted < n_alive:
            b_pad = ramp[0]
            for r in ramp:
                if inserted >= 2 * r:
                    b_pad = r
            contended = (
                throttle_on and contended_cap > 0 and BUDGET.search_pressure()
            )
            if contended:
                # largest ramp shape within the cap — ramp shapes are the
                # ones already compiled, so cooperative mode never triggers
                # a fresh XLA compile mid-build
                coop = [r for r in ramp if r <= contended_cap] or [ramp[0]]
                b_pad = min(b_pad, coop[-1])
            bsz = min(b_pad, n_alive - inserted)
            batch_levels = self.levels[order[inserted : inserted + bsz]]
            bmax = int(batch_levels[0]) if bsz else 0
            bi_dev, q_dev, qi8_dev = _prep(
                order_dev, vectors_f32, codes_dev, inserted, bsz, b_pad=b_pad
            )

            # greedy descent through levels above the batch's top level
            entries = jnp.full((b_pad,), self.entry, dtype=jnp.int32)
            if self.max_level > bmax and n_up:
                cur_scores = hnsw_ops.score_ids_batch(
                    q_dev, vectors_f32, entries[:, None], dist
                )[:, 0]
                for lev in range(self.max_level, bmax, -1):
                    i = self._stack_index(lev)
                    entries, cur_scores = hnsw_ops.greedy_descend_level(
                        q_dev, vectors_f32, upper_links[i], rank_dev,
                        entries, cur_scores, dist,
                    )

            # masked insertion at upper levels bmax..1
            for lev in range(min(bmax, self.max_level), 0, -1):
                i = self._stack_index(lev)
                kl = int((batch_levels >= lev).sum())
                bi_l = jnp.where(jnp.arange(b_pad) < kl, bi_dev, -1)
                upper_links[i], upper_counts[i], beam = hb.insert_batch_level0(
                    upper_links[i], upper_counts[i], bi_l, qi8_dev,
                    codes_dev, norms_dev, rank_dev, owner_up_dev, entries,
                    scale_sq, ef=efc, iters=iters, expand=expand, m0=m,
                    inc_cap=inc_cap, ov_cap=256, euclid=euclid, sel_c=sel_c,
                )
                entries = beam[:, 0]
                entries = jnp.where(entries >= 0, entries, self.entry)

            links0_dev, counts0_dev, _ = hb.insert_batch_level0(
                links0_dev, counts0_dev, bi_dev, qi8_dev, codes_dev,
                norms_dev, rank_dev, owner0_dev, entries, scale_sq,
                ef=efc, iters=iters, expand=expand, m0=m0,
                inc_cap=inc_cap, ov_cap=b_pad, euclid=euclid,
                sel_c=sel_c,
            )
            inserted += bsz
            if progress_fn:
                progress_fn(inserted, n_alive)
            # Backpressure: dispatch is async, so without a periodic sync
            # the loop queues the WHOLE build on the device and the
            # cooperative yield below is meaningless — searches would wait
            # behind minutes of queued build programs no matter how long
            # the builder sleeps. Draining every few batches (every batch
            # under contention) bounds the queue to ~one batch of device
            # work — the interleave slice a concurrent search waits for.
            batches_since_sync += 1
            if sync_every and (
                contended or batches_since_sync >= sync_every
            ):
                jax.block_until_ready(links0_dev)
                batches_since_sync = 0
            # let queued search programs run before the next build batch
            # (utils/budget.py; reference: ResourceBudget in main.rs:509)
            BUDGET.yield_to_searches()

        # ---- refine pass(es): re-insert points against the FINAL graph.
        # Points inserted while the graph held a fraction of the data chose
        # forward links from what existed then; re-running beam + heuristic
        # selection (existing row links merged into the candidate set, the
        # point itself masked out) fixes exactly those rows. Batches run in
        # reverse insertion order so the most-damaged earliest rows are
        # refined last. Scale-dependent, DEFAULT OFF: at 20k iid-gaussian
        # a pass helps (ef=128 recall 0.839 -> 0.857 vs 0.871 sequential
        # gold), but at 1M clustered (the serving regime) it HURTS — the
        # re-selection prunes the early long-range links that bridge
        # clusters: ef=128 recall 0.9477 no-refine vs 0.9203 with one pass,
        # 0.9227 with two (same data/truth/searcher, N_TRUTH=256). Env
        # override: comma-separated fractions via QDRANT_TPU_BUILD_REFINE
        # (e.g. "1.0" = one full pass), "" disables.
        refine_spec = os.environ.get("QDRANT_TPU_BUILD_REFINE", "")
        refine_fracs = [float(f) for f in refine_spec.split(",") if f.strip()]
        for refine_frac in refine_fracs:
            n_refine = min(int(n_alive * refine_frac), n_alive)
            if n_refine <= 0:
                continue
            b_pad = ramp[-1]
            # reverse order: the earliest rows (inserted into the sparsest
            # graph — the most damaged) are refined last, after every later
            # row has already been fixed
            starts = list(range(0, n_refine, b_pad))[::-1]
            for start in starts:
                bsz = min(b_pad, n_refine - start)
                bi_dev, q_dev, qi8_dev = _prep(
                    order_dev, vectors_f32, codes_dev, start, bsz, b_pad=b_pad
                )
                entries = jnp.full((b_pad,), self.entry, dtype=jnp.int32)
                if n_up:
                    cur_scores = hnsw_ops.score_ids_batch(
                        q_dev, vectors_f32, entries[:, None], dist
                    )[:, 0]
                    for lev in range(self.max_level, 0, -1):
                        i = self._stack_index(lev)
                        entries, cur_scores = hnsw_ops.greedy_descend_level(
                            q_dev, vectors_f32, upper_links[i], rank_dev,
                            entries, cur_scores, dist,
                        )
                links0_dev, counts0_dev, _ = hb.insert_batch_level0(
                    links0_dev, counts0_dev, bi_dev, qi8_dev, codes_dev,
                    norms_dev, rank_dev, owner0_dev, entries, scale_sq,
                    ef=efc, iters=iters, expand=expand, m0=m0,
                    inc_cap=inc_cap, ov_cap=b_pad, euclid=euclid,
                    sel_c=sel_c, merge_forward=True,
                )
                from ..utils.budget import BUDGET

                BUDGET.yield_to_searches()

        # in-degree healing runs on device; the host mirror is NOT
        # downloaded here (tunnel downloads run at ~0.1 MB/s — 130 s for a
        # 100k-point adjacency). It syncs lazily via the links0/... props.
        links0_dev, counts0_dev = hb.heal_low_indegree_device(
            links0_dev, counts0_dev, rank_dev, owner0_dev, m0=m0,
        )
        self._links0_dev = links0_dev
        self._upper_dev = (
            jnp.stack([upper_links[i] for i in range(n_up)]) if n_up else None
        )
        self._host_stale = True
        # build() must mean BUILT: the batch loop above only DISPATCHES its
        # programs (jit calls are async), so without this barrier the queued
        # build execution lands on whoever touches the device next — the
        # first post-build search blocked for the remaining minutes of build
        # work at 4M rows, and every wall-clock "build seconds" measurement
        # was timing dispatch, not the build
        jax.block_until_ready(self._links0_dev)

    def _heal_low_indegree(
        self, order: np.ndarray, min_indegree: int = 8, force_links: int = 6
    ) -> None:
        """Post-build connectivity repair (reference: graph_layers_healer.rs).

        Batch insertion starves some points of incoming edges: a newcomer's
        reverse link must beat an established full row in the pruning
        heuristic, and at scale many never win one — leaving near-zero
        in-degree nodes the beam search cannot reach. Fix: every point with
        in-degree < min_indegree is force-written into the link rows of its
        own nearest forward neighbors, replacing the tail (pruned-fill)
        slots. Tail slots rotate per healing write so concurrent heals into
        one hub don't clobber each other.
        """
        n = len(self.levels)
        m0 = self.config.m0
        links = self.links0
        valid = links >= 0
        indeg = np.zeros(n + 1, dtype=np.int64)
        np.add.at(indeg, np.clip(links[valid], 0, n), 1)

        member = order[: int((self.levels[order] >= 0).sum())] if len(order) else order
        weak = [
            int(p)
            for p in member
            if indeg[p] < min_indegree and self.rank[p] >= 0
        ]
        if not weak:
            return
        pairs_t: list = []
        pairs_p: list = []
        for p in weak:
            row = self.rank[p]
            fwd = links[row]
            fwd = fwd[fwd >= 0][:force_links]
            for t in fwd:
                pairs_t.append(int(t))
                pairs_p.append(p)
        if not pairs_t:
            return
        t_arr = np.asarray(pairs_t, dtype=np.int64)
        p_arr = np.asarray(pairs_p, dtype=np.int32)
        sort_idx = np.argsort(t_arr, kind="stable")
        t_s, p_s = t_arr[sort_idx], p_arr[sort_idx]
        uniq, starts, counts = np.unique(t_s, return_index=True, return_counts=True)
        within = np.arange(len(t_s)) - np.repeat(starts, counts)
        window = max(m0 // 4, force_links)
        slots = m0 - 1 - (within % window)
        rows_t = self.rank[t_s]
        self.links0[rows_t, slots] = p_s
        self.counts0[rows_t] = (self.links0[rows_t] >= 0).sum(axis=1).astype(np.int32)
        if self._links0_dev is not None:
            upd_rows = self.rank[uniq]
            self._links0_dev = hnsw_ops.scatter_link_rows(
                self._links0_dev, upd_rows.astype(np.int32), self.links0[upd_rows]
            )

    def _build_seed_graph(self, seed_ids: np.ndarray, vectors, dist: str) -> None:
        """All-pairs heuristic linking of the seed set — on HOST. The seed
        set is ≤128 points; the device version of this (reprune_rows over a
        padded all-pairs table) cost ~170 s of XLA compiles at 100k-point
        scale for work numpy finishes in microseconds."""
        seed_levels = self.levels[seed_ids]
        vecs = self.store.get_batch(seed_ids).astype(np.float32)
        vecs = preprocess_vectors(vecs, self.distance)
        if self.distance in (Distance.EUCLID, Distance.MANHATTAN):
            n2 = (vecs * vecs).sum(axis=1)
            pair = 2.0 * (vecs @ vecs.T) - n2[None, :] - n2[:, None]
        else:
            pair = vecs @ vecs.T
        for l in range(0, int(seed_levels.max()) + 1):
            members = np.nonzero(seed_levels >= l)[0]
            if len(members) == 0:
                continue
            m_l = self._m_at(l)
            sel_rows = np.full((len(members), m_l), -1, dtype=np.int32)
            for r, i in enumerate(members):
                others = members[members != i]
                order = others[np.argsort(-pair[i, others], kind="stable")]
                kept: list = []
                for c in order:
                    if len(kept) >= m_l:
                        break
                    if all(pair[c, s] <= pair[i, c] for s in kept):
                        kept.append(int(c))
                sel_rows[r, : len(kept)] = seed_ids[kept]
            ids = seed_ids[members]
            self._scatter(l, self._row_of(l, ids), sel_rows)

    def _insert_batch(
        self, batch: np.ndarray, vectors, efc: int, dist: str, pad_to: int
    ) -> None:
        b = len(batch)
        b_pad = _pow2_at_least(pad_to, 8)
        qs = _pad_rows(self.store.get_batch(batch).astype(np.float32), b_pad, 0.0)
        q_dev = jnp.asarray(qs)
        batch_levels = self.levels[batch]  # desc sorted
        batch_max = int(batch_levels[0])
        rank_dev = self._rank_device()

        cur = jnp.full((b_pad,), self.entry, dtype=jnp.int32)
        cur_scores = hnsw_ops.score_ids_batch(q_dev, vectors, cur[:, None], dist)[:, 0]

        # 1) fused greedy descent through levels above any insertion
        upper = self._upper_device()
        if upper is not None and self.max_level > batch_max:
            n_desc = self.max_level - batch_max  # stack indices [0, n_desc)
            cur, cur_scores = hnsw_ops.greedy_descend_stack(
                q_dev,
                vectors,
                upper[:n_desc],
                rank_dev,
                self._stack_counts()[:n_desc],
                cur,
                cur_scores,
                dist,
            )

        # 2) per-level insertion from batch_max down to 0
        ent_dev = cur[:, None]
        max_iters = int(efc * 1.2) + 16
        for l in range(batch_max, -1, -1):
            kl = int((batch_levels >= l).sum())
            if l == 0:
                links_l = self._links0_device()
                compact = rank_dev
            else:
                links_l = self._upper_device()[self._stack_index(l)]
                compact = rank_dev
            beam_scores, beam_ids = hnsw_ops.beam_search_level(
                q_dev,
                vectors,
                links_l,
                ent_dev,
                None,
                efc,
                max_iters,
                dist,
                compact_of=compact,
            )
            m_l = self._m_at(l)
            sel = hnsw_ops.select_neighbors(beam_ids, beam_scores, vectors, m_l, dist)
            sel_np = np.asarray(sel, dtype=np.int32)[:kl]

            rows = self._row_of(l, batch[:kl])
            self._scatter(l, rows, sel_np)
            self._apply_reverse_links(l, batch[:kl], sel_np, vectors, dist)
            ent_dev = beam_ids

    def _apply_reverse_links(
        self, level: int, points: np.ndarray, sel: np.ndarray, vectors, dist: str
    ) -> None:
        """Add `points` to their selected neighbors' link rows, repruning
        overflowed rows with the device heuristic. Shape-stable: candidate
        arrays are always [k_pow2, cap + INC_CAP]."""
        cap = self._m_at(level)
        nb_flat = sel.reshape(-1)
        p_flat = np.repeat(points.astype(np.int32), sel.shape[1])
        ok = nb_flat >= 0
        nb_flat, p_flat = nb_flat[ok], p_flat[ok]

        while len(nb_flat) > 0:
            sort_idx = np.argsort(nb_flat, kind="stable")
            nb_s, p_s = nb_flat[sort_idx], p_flat[sort_idx]
            uniq, starts, counts = np.unique(nb_s, return_index=True, return_counts=True)
            within = np.arange(len(nb_s)) - np.repeat(starts, counts)
            defer = within >= INC_CAP
            next_nb, next_p = nb_s[defer], p_s[defer]
            nb_s, p_s, within = nb_s[~defer], p_s[~defer], within[~defer]
            uniq, starts, counts = np.unique(nb_s, return_index=True, return_counts=True)

            rows_u = self._row_of(level, uniq)
            cur_counts = self._link_counts(level, rows_u)
            fits = counts <= (cap - cur_counts)

            # --- direct placement (no overflow) ---
            fit_pairs = np.repeat(fits, counts)
            if fit_pairs.any():
                nb_fit = nb_s[fit_pairs]
                p_fit = p_s[fit_pairs]
                w_fit = within[fit_pairs]
                rows_fit = self._row_of(level, nb_fit)
                slots = self._link_counts(level, rows_fit) + w_fit
                if level == 0:
                    self.links0[rows_fit, slots] = p_fit
                else:
                    self.links_upper[self._stack_index(level), rows_fit, slots] = p_fit
                u_fit_rows = self._row_of(level, uniq[fits])
                self._add_link_counts(level, u_fit_rows, counts[fits].astype(np.int32))
                new_rows = self._links_host(level, u_fit_rows)
                if level == 0:
                    if self._links0_dev is not None:
                        self._links0_dev = hnsw_ops.scatter_link_rows(
                            self._links0_dev, u_fit_rows, new_rows
                        )
                else:
                    if self._upper_dev is not None:
                        self._upper_dev = _scatter_stack(
                            self._upper_dev,
                            self._stack_index(level),
                            jnp.asarray(u_fit_rows),
                            jnp.asarray(new_rows),
                        )

            # --- overflow: device reprune with fixed candidate shape ---
            over = ~fits
            if over.any():
                u_over = uniq[over]
                k = len(u_over)
                rows_over = self._row_of(level, u_over)
                c_total = cap + INC_CAP
                k_pad = _pow2_at_least(k, 8)
                cands = np.full((k_pad, c_total), -1, dtype=np.int32)
                cands[:k, :cap] = self._links_host(level, rows_over)
                over_pairs = np.repeat(over, counts)
                nb_o, p_o, w_o = nb_s[over_pairs], p_s[over_pairs], within[over_pairs]
                nb_to_k = {int(v): i for i, v in enumerate(u_over)}
                k_idx = np.fromiter((nb_to_k[int(v)] for v in nb_o), dtype=np.int64)
                cands[k_idx, cap + w_o] = p_o
                nb_p = np.zeros(k_pad, dtype=np.int32)
                nb_p[:k] = u_over
                new_rows = np.asarray(
                    hnsw_ops.reprune_rows(
                        jnp.asarray(nb_p), jnp.asarray(cands), vectors, cap, dist
                    ),
                    dtype=np.int32,
                )[:k]
                self._scatter(level, rows_over, new_rows)

            nb_flat, p_flat = next_nb, next_p

    # ------------------------------------------------------------------
    # search
    # ------------------------------------------------------------------

    def memory_usage_bytes(self):
        """Host adjacency + device mirrors + fused inline link+code table
        (reference: graph links storage is sized for telemetry; here the
        inline table is the dominant HBM entry at rows*(8*m0 + m0*d))."""
        from ..utils.memsize import sizeof_attrs

        acc = sizeof_attrs(
            self,
            "links0", "links_upper", "counts0", "counts_upper", "rank",
            "levels",
            "_links0_dev", "_upper_dev", "_rank_dev", "_stack_counts_dev",
            "_links0_host", "_links_upper_host", "_counts0_host",
            "_counts_upper_host",
        )
        inline = self._inline
        if isinstance(inline, dict):
            from ..utils.memsize import merge, sizeof

            acc = merge(acc, sizeof(inline))
        return acc

    def _inline_state(self) -> Optional[dict]:
        """Build (lazily) the fused link+code table for level-0 beam search
        (ops/hnsw_inline.py — the reference's CompressedWithVectors layout,
        graph_links/format.rs:11-14). TPU-only; invalidated on any link
        mutation; skipped when the table would not fit comfortably in HBM."""
        if self._inline is not None:
            return self._inline or None
        import os

        from ..ops.pallas_scan import is_tpu_backend

        d = self.store.dim
        m0 = self.config.m0
        enable = os.environ.get("QDRANT_TPU_INLINE", "1")
        have_adj = self._links0_dev is not None or self._links0_host is not None
        if (
            enable == "0"
            or (not is_tpu_backend() and enable != "force")
            or not have_adj
            or self.distance is Distance.MANHATTAN
        ):
            self._inline = False
            return None
        rows = (
            self._links0_dev.shape[0]
            if self._links0_dev is not None
            else self._links0_host.shape[0]
        )
        table_bytes = rows * (8 * m0 + m0 * d)
        max_bytes = int(
            os.environ.get("QDRANT_TPU_INLINE_MAX_BYTES", 6_000_000_000)
        )
        if table_bytes > max_bytes:
            self._inline = False
            return None
        from ..ops.hnsw_inline import pack_linkcodes_device

        # codes + norms are SQ-encoded ON DEVICE from the resident block and
        # the table is assembled on device from the device-resident
        # adjacency: a host encode of 1M x 128 costs ~700 s on this 1-vCPU
        # image (measured — it was the dominant line of the whole bench),
        # while the device encode is one fused elementwise program. Only the
        # clip bound comes from a small host value sample (quantile of
        # |v| over <=1M samples, same rule as ScalarQuantized.encode).
        # sample via get_batch, NOT store._data: DeviceVectorStore keeps its
        # truth on device and leaves _data as the inherited empty array — a
        # flat.size==0 sample would silently yield bound=1.0 and saturate
        # the inline SQ codes for any data with |v|>1
        n_live = len(self.store)
        max_rows = max(1, min(n_live, 1_000_000 // max(d, 1) + 1))
        if n_live > max_rows:
            rng = np.random.default_rng(0)
            sample_ids = rng.integers(0, n_live, max_rows)
        else:
            sample_ids = np.arange(n_live)
        flat = np.asarray(
            self.store.get_batch(sample_ids), dtype=np.float32
        ).reshape(-1)
        bound = max(float(np.quantile(np.abs(flat), 0.99)), 1e-12) if flat.size else 1.0
        scale = bound / 127.0
        vecs_dev, _ = self.store.device_block()

        @jax.jit
        def _encode_sq(v, s):
            vf = v.astype(jnp.float32)
            codes = jnp.clip(jnp.round(vf / s), -127, 127).astype(jnp.int8)
            return codes, (vf * vf).sum(axis=1)

        codes_dev, norms_dev = _encode_sq(vecs_dev, jnp.float32(scale))
        if vecs_dev.dtype != jnp.float32:
            # reduced-precision scoring dtype (f16/bf16): the device block
            # has already lost bits, so ||v||^2 from it is inexact. Recompute
            # norms from the f32 originals via get_batch (host truth, or the
            # store's host_fetch for device-native stores) — an [N] upload
            # is cheap and keeps the inline table's exact-norm guarantee.
            host = np.asarray(
                self.store.get_batch(np.arange(n_live)), dtype=np.float32
            )
            norms_host = (host * host).sum(axis=1).astype(np.float32)
            pad = vecs_dev.shape[0] - norms_host.shape[0]
            if pad > 0:
                norms_host = np.pad(norms_host, (0, pad))
            norms_dev = jnp.asarray(norms_host)
        # pad rows beyond the live prefix carry whatever the block holds;
        # the adjacency never points at them, so their codes are never read
        table = pack_linkcodes_device(
            self._links0_device(), codes_dev, norms_dev
        )
        self._inline = {
            "table": table,
            "scale": scale,
            "m0": m0,
            "d": d,
        }
        return self._inline

    def search(
        self,
        queries: np.ndarray,  # [B, D] raw queries
        k: int,
        ef: Optional[int] = None,
        filter_mask: Optional[np.ndarray] = None,  # [n] bool
        acorn: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (scores [B, k], offsets [B, k]), -1 padded."""
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        b = queries.shape[0]
        if self.entry < 0:
            return (
                np.full((b, k), -np.inf, dtype=np.float32),
                np.full((b, k), -1, dtype=np.int32),
            )
        b_pad = _pow2_at_least(b, 8)
        q = _pad_rows(preprocess_vectors(queries, self.distance), b_pad, 0.0)
        q_dev = jnp.asarray(q)
        vectors, _ = self.store.device_block()
        dist = self.distance.value
        ef_eff = max(ef or self.config.ef_construct, k)

        cur = jnp.full((b_pad,), self.entry, dtype=jnp.int32)
        cur_scores = hnsw_ops.score_ids_batch(q_dev, vectors, cur[:, None], dist)[:, 0]
        upper = self._upper_device()
        if upper is not None:
            cur, cur_scores = hnsw_ops.greedy_descend_stack(
                q_dev,
                vectors,
                upper,
                self._rank_device(),
                self._stack_counts(),
                cur,
                cur_scores,
                dist,
            )

        mask_dev = None
        if filter_mask is not None:
            cap = vectors.shape[0]
            fm = np.zeros(cap, dtype=bool)
            fm[: len(filter_mask)] = filter_mask
            mask_dev = jnp.asarray(fm)

        # beam seeds: the greedy-descent winner, plus optionally a fixed
        # seeded spread of extra graph nodes — on clustered data a single
        # entry's basin can miss whole clusters at small ef (recall lever,
        # costs one wider entry-score batch; see ARCHITECTURE.md round 4)
        entries2d = cur[:, None]
        n_extra = int(os.environ.get("QDRANT_TPU_SEARCH_EXTRA_ENTRIES", "0"))
        if n_extra > 0 and self.levels is not None:
            nodes = np.flatnonzero(self.levels >= 0)
            if len(nodes) > n_extra:
                extra = np.random.default_rng(0x5EED).choice(
                    nodes, size=n_extra, replace=False
                ).astype(np.int32)
                extra_dev = jnp.broadcast_to(
                    jnp.asarray(extra), (b_pad, n_extra)
                )
                # a seed equal to the greedy winner would duplicate a beam
                # slot; -1 seeds are inert in every beam kernel
                extra_dev = jnp.where(
                    extra_dev == cur[:, None], -1, extra_dev
                )
                entries2d = jnp.concatenate([entries2d, extra_dev], axis=1)

        max_iters = int(
            (2 * ef_eff + 16)
            * float(os.environ.get("QDRANT_TPU_SEARCH_ITERS_MULT", "1"))
        )
        inline = None if (acorn and mask_dev is not None) else self._inline_state()
        if acorn and mask_dev is not None:
            beam_scores, beam_ids = hnsw_ops.beam_search_acorn(
                q_dev,
                vectors,
                self._links0_device(),
                entries2d,
                mask_dev,
                ef_eff,
                max_iters,
                dist,
                compact_of=self._rank_device(),
            )
        elif inline is not None:
            from ..ops.hnsw_inline import beam_search_inline

            scale = inline["scale"]
            q_i8 = jnp.asarray(
                np.clip(np.round(q / scale), -127, 127).astype(np.int8)
            )
            euclid = self.distance is Distance.EUCLID
            fbias = None
            if filter_mask is not None:
                cap = vectors.shape[0]
                fb = np.full(cap, -np.inf, dtype=np.float32)
                fb[: len(filter_mask)] = np.where(filter_mask, 0.0, -np.inf)
                fbias = jnp.asarray(fb)
            expand = 4
            beam_scores, beam_ids = beam_search_inline(
                q_dev,
                q_i8,
                inline["table"],
                jnp.float32((2.0 if euclid else 1.0) * scale * scale),
                self._rank_device(),
                vectors,
                entries2d,
                fbias,
                m=inline["m0"],
                d=inline["d"],
                ef=ef_eff,
                iters=max(max_iters // expand, 8),
                expand=expand,
                euclid=euclid,
                k=ef_eff,
            )
        else:
            beam_scores, beam_ids = hnsw_ops.beam_search_level(
                q_dev,
                vectors,
                self._links0_device(),
                entries2d,
                mask_dev,
                ef_eff,
                max_iters,
                dist,
                compact_of=self._rank_device(),
            )
        scores = np.asarray(beam_scores, dtype=np.float32)[:b]
        ids = np.asarray(beam_ids, dtype=np.int32)[:b]
        # entries bypass the filter inside the kernel; enforce it here
        if filter_mask is not None:
            ok = (ids >= 0) & filter_mask[np.maximum(ids, 0)]
            scores = np.where(ok, scores, -np.inf)
            ids = np.where(ok, ids, -1)
            order = np.argsort(-scores, axis=1, kind="stable")
            scores = np.take_along_axis(scores, order, axis=1)
            ids = np.take_along_axis(ids, order, axis=1)
        ids = np.where(np.isfinite(scores), ids, -1)
        if k <= scores.shape[1]:
            return scores[:, :k], ids[:, :k]
        pad = k - scores.shape[1]
        return (
            np.pad(scores, ((0, 0), (0, pad)), constant_values=-np.inf),
            np.pad(ids, ((0, 0), (0, pad)), constant_values=-1),
        )

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.savez_compressed(
            os.path.join(path, "hnsw_graph.npz"),
            levels=self.levels,
            rank=self.rank,
            links0=self.links0,
            counts0=self.counts0,
            links_upper=self.links_upper,
            counts_upper=self.counts_upper,
        )
        with open(os.path.join(path, "hnsw_meta.json"), "w") as f:
            json.dump(
                {
                    "entry": self.entry,
                    "max_level": self.max_level,
                    "level_counts": self.level_counts,
                    "m": self.config.m,
                    "ef_construct": self.config.ef_construct,
                },
                f,
            )

    @classmethod
    def load(cls, path: str, store: DenseVectorStore, config: HnswConfig) -> "HnswIndex":
        idx = cls(store, config)
        with open(os.path.join(path, "hnsw_meta.json")) as f:
            meta = json.load(f)
        idx.entry = meta["entry"]
        idx.max_level = meta["max_level"]
        idx.level_counts = {int(k): v for k, v in meta["level_counts"].items()}
        data = np.load(os.path.join(path, "hnsw_graph.npz"))
        idx.levels = data["levels"]
        idx.rank = data["rank"]
        idx.links0 = data["links0"]
        idx.counts0 = data["counts0"]
        idx.links_upper = data["links_upper"]
        idx.counts_upper = data["counts_upper"]
        return idx


_scatter_rows_jit = jax.jit(
    lambda buf, ids, vals: buf.at[ids].set(vals), donate_argnums=0
)


class ShardedHnswIndex:
    """Multi-device graph serving: S independent per-row-slice sub-graphs
    searched as ONE SPMD program over a `jax.sharding.Mesh`
    (parallel/mesh.py::sharded_hnsw_search) with an all-gather merge on ICI.

    Reference equivalence: qdrant fans a query out over every segment and
    merges top-k on the coordinator (lib/collection/src/collection_manager/
    segments_searcher.rs:212-306). Here each device holds one contiguous
    row-slice "segment" — its vectors and a LOCAL-offset adjacency — and
    the fan-out + merge is one compiled program instead of an RPC tree.

    Build: sub-graphs are built sequentially with the single-device builder
    (each restricted to its slice via `subset=`), then re-based to local
    offsets ON DEVICE (a subset build only links slice members, so every
    link value lands inside the slice) and laid out shard-major. Upper
    levels are not used when serving: each shard's beam starts at its own
    entry point, and the per-shard row count (n/S) keeps the level-0 walk
    short. Incremental inserts go through the segment's deferred-rebuild
    path, same as payload-block subgraphs.
    """

    def __init__(
        self,
        store: DenseVectorStore,
        config: HnswConfig,
        seed: int = 42,
        mesh=None,
    ):
        self.store = store
        self.config = config
        self.seed = seed
        self.distance: Distance = store.distance
        self.mesh = mesh
        self.n_shards = 0
        self.n_per_shard = 0
        self._v = None  # [S*Np, D] sharded rows
        self._links = None  # [S*Np, M0] sharded, local-offset values
        self._entries = None  # [S] per-shard entry (local offset)
        self._alive = None  # [S*Np] bool host (pad rows False)
        self._mask_cache: Dict[bytes, jax.Array] = {}

    # -- build ----------------------------------------------------------

    def build(
        self, batch_size: int = 1024, ef_construct: Optional[int] = None,
        progress_fn=None,
    ) -> None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import SHARD_AXIS, make_mesh

        if self.mesh is None:
            self.mesh = make_mesh()
        s_count = int(self.mesh.devices.size)
        n = len(self.store)
        alive_mask = ~self.store.deleted_mask
        np_local = max((n + s_count - 1) // s_count, 8)
        np_local = (np_local + 127) // 128 * 128
        cap_total = s_count * np_local
        v, _ = self.store.device_block()
        d = v.shape[1]
        if v.shape[0] >= cap_total:
            v_full = v[:cap_total]
        else:
            v_full = (
                jnp.zeros((cap_total, d), v.dtype).at[: v.shape[0]].set(v)
            )
        links = jnp.full((cap_total, self.config.m0), -1, jnp.int32)
        # -1 = inert entry: empty/padded shards must not seed their beam at
        # local row 0, whose global id would be a zero pad row that could
        # land in the merged top-k (beam_search_level treats -1 as invalid)
        entries = np.full(s_count, -1, np.int32)
        for s in range(s_count):
            lo = s * np_local
            hi = min(lo + np_local, n)
            if hi <= lo:
                continue
            ids = (np.nonzero(alive_mask[lo:hi])[0] + lo).astype(np.int32)
            if len(ids) == 0:
                continue
            sub = HnswIndex(
                self.store, self.config, seed=self.seed + s, subset=ids
            )
            sub.build(batch_size=batch_size, ef_construct=ef_construct)
            # re-base to local offsets on device (the tunnel download of a
            # host links mirror would dwarf the build itself)
            ids_dev = jnp.asarray(ids)
            rows = jnp.take(sub._rank_device(), ids_dev)
            lk = jnp.take(sub._links0_device(), rows, axis=0)
            lk_local = jnp.where(lk >= 0, lk - lo, -1).astype(jnp.int32)
            links = _scatter_rows_jit(links, ids_dev, lk_local)
            entries[s] = sub.entry - lo
            if progress_fn:
                progress_fn(hi, n)
        row = NamedSharding(self.mesh, P(SHARD_AXIS))
        self._v = jax.device_put(v_full, row)
        self._links = jax.device_put(links, row)
        self._entries = jax.device_put(jnp.asarray(entries), row)
        alive_pad = np.zeros(cap_total, dtype=bool)
        alive_pad[:n] = alive_mask[:n]
        self._alive = alive_pad
        self.n_shards = s_count
        self.n_per_shard = np_local

    # -- search ---------------------------------------------------------

    def _mask_sharded(self, mask: np.ndarray) -> jax.Array:
        import hashlib

        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import SHARD_AXIS

        key = hashlib.blake2b(
            np.ascontiguousarray(mask), digest_size=16
        ).digest()
        hit = self._mask_cache.get(key)
        if hit is None:
            if len(self._mask_cache) >= 16:
                self._mask_cache.pop(next(iter(self._mask_cache)))
            hit = self._mask_cache[key] = jax.device_put(
                mask, NamedSharding(self.mesh, P(SHARD_AXIS))
            )
        return hit

    def search(
        self,
        queries: np.ndarray,
        k: int,
        ef: Optional[int] = None,
        filter_mask: Optional[np.ndarray] = None,
        acorn: bool = False,  # noqa: ARG002 — sharded beam is mask-biased
    ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (scores [B, k], offsets [B, k]), -1 padded. Offsets are global
        store offsets (shard-major rows coincide with store offsets)."""
        from ..parallel.mesh import sharded_hnsw_search

        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        b = queries.shape[0]
        if self._v is None or self.n_shards == 0:
            return (
                np.full((b, k), -np.inf, dtype=np.float32),
                np.full((b, k), -1, dtype=np.int32),
            )
        b_pad = _pow2_at_least(b, 8)
        q = _pad_rows(preprocess_vectors(queries, self.distance), b_pad, 0.0)
        mask = self._alive
        if filter_mask is not None:
            fm = np.zeros(mask.shape[0], dtype=bool)
            m = min(len(filter_mask), mask.shape[0])
            fm[:m] = filter_mask[:m]
            mask = mask & fm
        ef_eff = max(ef or self.config.ef_construct, k)
        s, ids = sharded_hnsw_search(
            self.mesh,
            jnp.asarray(q),
            self._v,
            self._links,
            self._entries,
            self._mask_sharded(mask),
            self.distance.value,
            ef_eff,
            k,
        )
        scores = np.asarray(s, dtype=np.float32)[:b]
        out_ids = np.asarray(ids, dtype=np.int32)[:b]
        # per-shard entry points bypass the in-kernel filter (traversal must
        # be able to start anywhere) — enforce alive∧filter on the merged
        # results host-side, mirroring the single-device HnswIndex.search
        ok = (out_ids >= 0) & mask[np.maximum(out_ids, 0)]
        scores = np.where(ok, scores, -np.inf)
        out_ids = np.where(ok, out_ids, -1)
        order = np.argsort(-scores, axis=1, kind="stable")
        scores = np.take_along_axis(scores, order, axis=1)
        out_ids = np.take_along_axis(out_ids, order, axis=1)
        return scores, out_ids

    def memory_usage_bytes(self):
        from ..utils.memsize import sizeof_attrs

        return sizeof_attrs(self, "_v", "_links", "_entries", "_alive")

    # -- persistence ------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.savez_compressed(
            os.path.join(path, "hnsw_sharded.npz"),
            links=np.asarray(self._links, dtype=np.int32),
            entries=np.asarray(self._entries, dtype=np.int32),
            alive=self._alive,
        )
        with open(os.path.join(path, "hnsw_meta.json"), "w") as f:
            json.dump(
                {
                    "sharded": True,
                    "n_shards": self.n_shards,
                    "n_per_shard": self.n_per_shard,
                    "m": self.config.m,
                    "ef_construct": self.config.ef_construct,
                },
                f,
            )

    @classmethod
    def load(
        cls, path: str, store: DenseVectorStore, config: HnswConfig
    ) -> "ShardedHnswIndex":
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import SHARD_AXIS, make_mesh

        idx = cls(store, config)
        with open(os.path.join(path, "hnsw_meta.json")) as f:
            meta = json.load(f)
        data = np.load(os.path.join(path, "hnsw_sharded.npz"))
        idx.mesh = make_mesh()
        if int(idx.mesh.devices.size) != int(meta["n_shards"]):
            # topology changed since save: rebuild for the current mesh
            idx.build()
            return idx
        idx.n_shards = int(meta["n_shards"])
        idx.n_per_shard = int(meta["n_per_shard"])
        idx._alive = data["alive"]
        cap_total = idx.n_shards * idx.n_per_shard
        v, _ = store.device_block()
        d = v.shape[1]
        if v.shape[0] >= cap_total:
            v_full = v[:cap_total]
        else:
            v_full = (
                jnp.zeros((cap_total, d), v.dtype).at[: v.shape[0]].set(v)
            )
        row = NamedSharding(idx.mesh, P(SHARD_AXIS))
        idx._v = jax.device_put(v_full, row)
        idx._links = jax.device_put(
            jnp.asarray(data["links"], dtype=jnp.int32), row
        )
        idx._entries = jax.device_put(
            jnp.asarray(data["entries"], dtype=jnp.int32), row
        )
        return idx


def load_hnsw_any(path: str, store: DenseVectorStore, config: HnswConfig):
    """Load whichever graph flavor was saved at `path` (single-device
    HnswIndex or mesh-sharded ShardedHnswIndex)."""
    if os.path.exists(os.path.join(path, "hnsw_sharded.npz")):
        return ShardedHnswIndex.load(path, store, config)
    return HnswIndex.load(path, store, config)


_scatter_stack_jit = jax.jit(
    lambda stack, rows, vals, i: stack.at[i, rows].set(vals),
    donate_argnums=0,
    static_argnums=3,
)


def _scatter_stack(stack: jax.Array, i: int, rows: jax.Array, vals: jax.Array):
    return _scatter_stack_jit(stack, rows, vals, int(i))
