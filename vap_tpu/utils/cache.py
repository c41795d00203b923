"""Persistent XLA compilation cache (amortizes the remote TPU compile cost
across processes; harmless on CPU)."""

import os


def enable_compilation_cache(path: str = None, min_compile_time_secs: float = 5.0):
    import jax

    try:
        if path is None and jax.config.jax_compilation_cache_dir:
            # default-path call (e.g. bench.py's import-time enable) must not
            # clobber a dir someone chose explicitly (the test suite's
            # machine-scoped dir, the driver dryrun's)
            return
        path = path or os.environ.get("VAP_COMPILE_CACHE", "/root/.cache/vap_jax_cache")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_time_secs))
    except Exception:
        pass


def machine_scoped_cache_dir(base: str = None) -> str:
    """Cache dir keyed by the host CPU's feature flags. XLA:CPU AOT results
    are machine-feature-specific (loading one compiled on a different host
    risks SIGILL), so anything caching XLA:CPU executables — the driver
    dryrun, the CPU test suite — must not share a dir across machines."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), platform.processor())
    except OSError:
        flags = platform.processor() or "unknown"
    tag = hashlib.md5(str(flags).encode()).hexdigest()[:12]
    base = base or os.environ.get("VAP_COMPILE_CACHE", "/root/.cache/vap_jax_cache")
    return os.path.join(base + "_cpu", tag)
