"""Fused W8A8 Pallas linear (ops/int8_matmul.py) vs the XLA reference path.

CPU: exact-f32 interpret mode. Real TPU (VAP_TEST_TPU=1): compiled kernel.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from vap_tpu.models.common import _int8_linear, quantize_linear_int8
from vap_tpu.ops.int8_matmul import int8_linear_pallas, supported

ON_TPU = os.environ.get("VAP_TEST_TPU", "0") == "1"


def _mk(m, k, n, bias=True, seed=0, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (m, k), dtype)
    w = jax.random.normal(jax.random.fold_in(key, 1), (k, n), jnp.float32) * 0.02
    p = {"kernel": w}
    if bias:
        p["bias"] = jax.random.normal(jax.random.fold_in(key, 2), (n,), jnp.float32)
    return x, quantize_linear_int8(p)


def _run(p, x):
    if ON_TPU:
        return int8_linear_pallas(p, x)
    with pltpu.force_tpu_interpret_mode():
        return int8_linear_pallas(p, x)


@pytest.mark.parametrize("m,k,n,bias", [
    (512, 256, 128, True),      # single k/n tile
    (700, 3072, 1024, True),    # m padding + multi-tile K
    (1024, 3072, 3072, False),  # bench projection shape (scaled M), no bias
])
def test_matches_xla_path(m, k, n, bias):
    x, p = _mk(m, k, n, bias)
    assert supported(p, x)
    ref = _int8_linear(p, x).astype(jnp.float32)
    out = _run(p, x).astype(jnp.float32)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    # per-(row, K-chunk) activation scales differ from the reference's
    # per-row-over-full-K scales, so agreement is to quantization noise,
    # not bitwise; both sit within ~1% of the exact bf16 product
    exact = (x.astype(jnp.float32) @ p["w_i8"].astype(jnp.float32)
             * p["s_w"].astype(jnp.float32))
    if bias:
        exact = exact + p["bias"].astype(jnp.float32)
    scale = float(jnp.mean(jnp.abs(exact))) + 1e-6
    assert float(jnp.mean(jnp.abs(out - exact))) / scale < 2e-2
    assert float(jnp.mean(jnp.abs(out - ref))) / scale < 2e-2


def test_batched_input_and_unsupported_fallback():
    x, p = _mk(8, 256, 128)
    xb = x.reshape(2, 4, 256)
    out = _run(p, xb)
    assert out.shape == (2, 4, 128)
    # K not tileable to 128 -> unsupported, caller keeps the XLA path
    xs, ps = _mk(8, 96, 128)
    assert not supported(ps, xs)
    # stacked-L weights (outside lax.scan) are unsupported too
    p3 = {"w_i8": jnp.zeros((2, 256, 128), jnp.int8), "s_w": jnp.zeros((2, 128))}
    assert not supported(p3, jnp.zeros((4, 256), jnp.bfloat16))


def test_linear_dispatch_env(monkeypatch):
    """models/common.py linear() routes int8 params through the Pallas kernel
    when VAP_INT8_PALLAS=1 (trace-time env read)."""
    from vap_tpu.models import common

    x, p = _mk(512, 256, 128)
    ref = _int8_linear(p, x)
    monkeypatch.setenv("VAP_INT8_PALLAS", "1")
    with pltpu.force_tpu_interpret_mode():
        out = common.linear(p, x)
    scale = float(jnp.mean(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
    assert float(jnp.mean(jnp.abs(out.astype(jnp.float32)
                                  - ref.astype(jnp.float32)))) / scale < 2e-2
    monkeypatch.setenv("VAP_INT8_PALLAS", "0")
    out2 = common.linear(p, x)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref))
