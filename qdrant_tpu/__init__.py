"""qdrant-tpu: a TPU-native vector search engine.

Package import configures the JAX persistent compilation cache: the engine's
jitted programs (scan kernels, HNSW beam/insert, quantized scorers) are
shape-stable across processes, and on TPU a cold compile of the larger
programs costs 10-40 s each — the cache turns every process after the first
into a warm start. Opt out with QDRANT_TPU_JAX_CACHE=0.
"""

import os as _os


def _setup_jax_cache() -> None:
    if _os.environ.get("QDRANT_TPU_JAX_CACHE", "1") == "0":
        return
    # keyed by requested platform: CPU-backend AOT entries loaded into a
    # TPU-tunnel process (and vice versa) trip machine-feature mismatch
    # warnings and risk SIGILL
    plat = _os.environ.get("JAX_PLATFORMS", "default").replace(",", "_")
    cache_dir = _os.environ.get(
        "QDRANT_TPU_JAX_CACHE_DIR",
        _os.path.join(
            _os.path.expanduser("~"), ".cache", f"qdrant_tpu_jax_{plat}"
        ),
    )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_jax_cache()
