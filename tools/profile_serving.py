"""End-to-end PlainIndex serving comparison: XLA vs Pallas fused path,
single-batch sync latency AND pipelined sustained throughput (depth 8).

The pipelined number is what concurrent serving achieves: search() is
dispatch (search_device) + sync; while one request blocks in np.asarray
(GIL released during the transfer) the next request dispatches, so the
device never idles. measure both to pick the product default for
feature_flags.pallas_scan.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

MODE = sys.argv[1] if len(sys.argv) > 1 else "pallas"
os.environ["QDRANT_TPU_PALLAS"] = "1" if MODE == "pallas" else "0"

from qdrant_tpu.types import Distance
from qdrant_tpu.storage.vectors import DenseVectorStore
from qdrant_tpu.index.plain import PlainIndex

N, D, B, K = 1_000_000, 128, 1024, 10
rng = np.random.default_rng(0)
t0 = time.perf_counter()
data = rng.standard_normal((N, D), dtype=np.float32)
print(f"datagen {time.perf_counter()-t0:.1f}s", flush=True)

store = DenseVectorStore(D, Distance.EUCLID)
store.add(data)
idx = PlainIndex(store)
qs = [rng.standard_normal((B, D), dtype=np.float32) for _ in range(8)]

scan = store.scan_index()
print(f"mode={MODE} use_pallas={scan.use_pallas}", flush=True)

# warm/compile
s, ids = idx.search(qs[0], K)
print("warm done", flush=True)

# sync latency
ts = []
for i in range(5):
    t0 = time.perf_counter()
    idx.search(qs[i % 8], K)
    ts.append(time.perf_counter() - t0)
print(f"sync: {min(ts)*1e3:.1f} ms/batch -> {B/min(ts):.0f} QPS", flush=True)

# pipelined depth-8
def pipelined(reps=3, depth=8):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [idx.search_device(qs[i % 8], K) for i in range(depth)]
        np.asarray(outs[-1][0])  # sync on the last only
        t = (time.perf_counter() - t0) / depth
        best = t if best is None or t < best else best
    return best

t = pipelined()
print(f"pipelined(8): {t*1e3:.1f} ms/batch -> {B/t:.0f} QPS", flush=True)

# correctness spot check vs exact
d2 = ((qs[0][:8, None, :] - data[None, :, :]) ** 2).sum(-1)
truth = np.argsort(d2, axis=1)[:, :K]
s, ids = idx.search(qs[0][:8], K)
rec = np.mean([len(set(ids[i]) & set(truth[i])) / K for i in range(8)])
print(f"recall@10 (8q): {rec:.3f}", flush=True)
