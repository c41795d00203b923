"""bench.py smoke test: the driver runs this script every round — protect its
code paths (transformer init, denoise step, wsplit VAE decode, JSON output)
against bit-rot with a tiny CPU run."""

import json
import os
import subprocess
import sys

import pytest


def test_bench_smoke_cpu():
    env = dict(os.environ)
    env.update(
        VAP_BENCH_BLOCKS="2", VAP_BENCH_STEPS="1", VAP_BENCH_FRAMES="9",
        VAP_BENCH_HEIGHT="64", VAP_BENCH_WIDTH="96", VAP_BENCH_ATTN="xla",
        JAX_PLATFORMS="cpu", VAP_ATTN_PROVIDER="xla",
        # own cache dir: the parent pytest's jax holds file locks on the
        # shared persistent cache, and the subprocess can deadlock on them
        VAP_COMPILE_CACHE="/tmp/vap_bench_smoke_cache",
        XLA_FLAGS="",
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")],
        env=env, capture_output=True, text=True, timeout=540, cwd=root,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    result = json.loads(line)
    assert result["value"] > 0
    assert "vs_baseline" in result
    d = result["details"]
    assert d["step_s_measured"] > 0 and d["vae_decode_fps"] > 0
