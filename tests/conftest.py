import os

# 8 virtual CPU devices for multi-chip sharding tests (available via
# jax.devices("cpu") even when a real TPU backend is present).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIFFUSERS = "/root/reference/diffusers/src"


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


requires_tpu = pytest.mark.skipif(not has_tpu(), reason="needs a real TPU for Pallas kernels")
