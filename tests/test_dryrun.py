"""The driver's multi-chip dryrun must pass exactly as invoked by the driver.

Round-1 regression: param init / jax.random.normal in dryrun_multichip ran on
the *default* backend (a broken TPU in the driver environment) before
device_put, crashing the run (MULTICHIP_r01 ok=false). The dryrun now pins
everything to the mesh backend.

Two variants: the fast suite calls dryrun_multichip(8) in-process (same code
path, no subprocess re-init — this box has a single CPU core, so a fresh
interpreter + full recompile costs ~7 min); the slow suite additionally runs
the exact driver invocation in a fresh subprocess with the driver's XLA_FLAGS.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_8_inprocess():
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on any failure


@pytest.mark.slow
def test_dryrun_multichip_8_subprocess():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    r = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "one train step OK" in r.stdout
