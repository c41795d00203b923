"""bench.py smoke test: the driver runs this script every round — protect its
code paths (transformer init, denoise step, wsplit VAE decode, JSON output)
against bit-rot with a tiny CPU run.

Marked slow: the subprocess's jax init still contacts the axon TPU service
(the plugin ignores JAX_PLATFORMS=cpu) and can block behind the parent
suite's client when the remote service is degraded, hanging the default
suite. Output goes to FILES, not pipes — the axon helper processes inherit
stdout and would keep a pipe open past the subprocess timeout.
"""

import json
import os
import subprocess
import sys
import tempfile

import pytest

pytestmark = pytest.mark.slow


def test_bench_smoke_cpu():
    env = dict(os.environ)
    env.update(
        VAP_BENCH_BLOCKS="2", VAP_BENCH_STEPS="1", VAP_BENCH_FRAMES="9",
        VAP_BENCH_HEIGHT="64", VAP_BENCH_WIDTH="96", VAP_BENCH_ATTN="xla",
        # int8 linears are the TPU bench default but XLA:CPU emulates int8
        # GEMMs very slowly — the smoke only validates the driver entry path
        VAP_BENCH_INT8_LINEAR="0",
        JAX_PLATFORMS="cpu", VAP_ATTN_PROVIDER="xla",
        # own cache dir: the parent pytest's jax holds file locks on the
        # shared persistent cache
        VAP_COMPILE_CACHE="/tmp/vap_bench_smoke_cache",
        XLA_FLAGS="",
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as td:
        out_path = os.path.join(td, "out.txt")
        err_path = os.path.join(td, "err.txt")
        with open(out_path, "w") as fo, open(err_path, "w") as fe:
            proc = subprocess.run(
                [sys.executable, os.path.join(root, "bench.py")],
                env=env, stdout=fo, stderr=fe, timeout=540, cwd=root,
            )
        stdout = open(out_path).read()
        stderr = open(err_path).read()
    assert proc.returncode == 0, stderr[-2000:]
    line = stdout.strip().splitlines()[-1]
    result = json.loads(line)
    assert result["value"] > 0
    assert "vs_baseline" in result
    d = result["details"]
    assert d["step_s_measured"] > 0 and d["vae_decode_fps"] > 0
