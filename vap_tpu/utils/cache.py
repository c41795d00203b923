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
    """Cache dir keyed by the host CPU identity and compile environment.
    XLA:CPU AOT results are machine-feature-specific (loading one compiled
    on a different host risks SIGILL, and even a detected mismatch spams
    `cpu_aot_loader` feature-mismatch errors before recompiling), so anything
    caching XLA:CPU executables — the driver dryrun, the CPU test suite —
    must not share a dir across hosts.

    The key hashes more than the cpuinfo `flags` line: XLA records compile
    machine features that depend on the CPU *model* (tuning properties like
    prefer-no-gather), the jaxlib build, and XLA_FLAGS — two hosts with
    identical ISA flags can still disagree on those."""
    import hashlib
    import platform

    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "model name", "vendor_id")):
                    parts.append(line.strip())
                    if len(parts) >= 3:
                        break
    except OSError:
        parts.append(platform.processor() or "unknown")
    try:
        import jaxlib

        parts.append(f"jaxlib={jaxlib.__version__}")
    except Exception:
        pass
    # topology flags don't change codegen (jax's own cache key covers device
    # count) — strip them so the suite and the 8-device dryrun share a dir
    xla_flags = " ".join(
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count"))
    parts.append(f"xla_flags={xla_flags}")
    tag = hashlib.md5("\n".join(parts).encode()).hexdigest()[:12]
    base = base or os.environ.get("VAP_COMPILE_CACHE", "/root/.cache/vap_jax_cache")
    return os.path.join(base + "_cpu", tag)
