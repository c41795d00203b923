import os

# 8 virtual CPU devices for multi-chip sharding tests (available via
# jax.devices("cpu") even when a real TPU backend is present).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Fast suite runs on CPU everywhere: force the XLA attention provider (the
# Pallas kernel would trigger a slow remote TPU compile per test on a
# TPU-present host) unless a run explicitly opts into TPU via VAP_TEST_TPU=1.
if not os.environ.get("VAP_TEST_TPU"):
    os.environ.setdefault("VAP_ATTN_PROVIDER", "xla")

import jax  # noqa: E402
import pytest  # noqa: E402

# Pin the CPU platform BEFORE any backend initializes: the host's remote-TPU
# PJRT plugin (registered by sitecustomize, which pre-imports jax) otherwise
# gets initialized inside every jax.devices(...) call — including
# jax.devices("cpu") — and HANGS the whole suite whenever the tunnel service
# wedges. jax_platforms="cpu" keeps backends() from ever touching it.
# (Verified against a live wedged tunnel; env stripping can't work because
# jax is already imported at interpreter startup.)
if not os.environ.get("VAP_TEST_TPU"):
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

# Persistent XLA:CPU compile cache: the fast suite is compile-dominated on
# this 1-core host (train steps, VAEs, golden-parity pipelines), so warm
# reruns save ~half the wall time. Machine-scoped — XLA:CPU AOT executables
# from another host can SIGILL. Low threshold: the suite's cost is a long
# tail of 1-10 s compiles, not a few big ones.
from vap_tpu.utils.cache import enable_compilation_cache, machine_scoped_cache_dir  # noqa: E402

enable_compilation_cache(machine_scoped_cache_dir(), min_compile_time_secs=1.0)

# Set the GLOBAL default device to CPU (not just the per-test pin below):
# module-level jnp constants created at import time otherwise land on the
# axon TPU backend, and any later use forces a TPU->CPU transfer that hangs
# the whole suite whenever the remote service is degraded.
if not os.environ.get("VAP_TEST_TPU"):
    try:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except Exception:
        pass

REFERENCE_DIFFUSERS = "/root/reference/diffusers/src"


@pytest.fixture(autouse=True)
def _pin_cpu_default_device(request):
    """Pin every test to the CPU backend unless marked @pytest.mark.tpu.

    JAX_PLATFORMS=cpu does not deregister the axon TPU plugin on this host, so
    pinning the default device is the only reliable way to keep the fast suite
    off the (slow remote-compile) TPU backend.
    """
    if request.node.get_closest_marker("tpu") or os.environ.get("VAP_TEST_TPU"):
        yield
        return
    with jax.default_device(jax.devices("cpu")[0]):
        yield


def has_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIFFUSERS)


@pytest.fixture(scope="session")
def torch_reference():
    """Import the reference (torch CPU) diffusers fork for golden-value parity."""
    if not reference_available():
        pytest.skip("reference repo not mounted")
    if REFERENCE_DIFFUSERS not in sys.path:
        sys.path.insert(0, REFERENCE_DIFFUSERS)
    import torch

    torch.manual_seed(0)
    return torch


requires_tpu = pytest.mark.tpu


def pytest_collection_modifyitems(config, items):
    if has_tpu():
        return
    skip = pytest.mark.skip(reason="needs a real TPU")
    for item in items:
        if item.get_closest_marker("tpu"):
            item.add_marker(skip)
