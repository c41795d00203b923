"""Persistent XLA compilation cache (amortizes the remote TPU compile cost
across processes; harmless on CPU)."""

import os


def enable_compilation_cache(path: str = None):
    import jax

    path = path or os.environ.get("VAP_COMPILE_CACHE", "/root/.cache/vap_jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
