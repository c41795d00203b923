"""Flash attention kernel vs dense reference — forward and backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vap_tpu.ops.attention import dense_attention
from vap_tpu.ops.flash_attention import flash_attention

import os


# Real-TPU MXU f32 matmuls run at default (bf16-pass) precision: a few
# elements of a well-scaled attention exceed the exact-f32 interpret-mode
# tolerance by ~1e-3, and EXTREME score magnitudes (gain>=3 on unnormalized
# N(0,9) q/k -> |scores| of hundreds of log2 units) make the near-one-hot
# softmax precision-bound for kernel and dense alike. Exact-value coverage
# lives in interpret mode; on hardware we loosen/skip accordingly.
ON_TPU = bool(os.environ.get("VAP_TEST_TPU"))
DENSE_ATOL = 6e-3 if ON_TPU else 2e-3


def _skip_extreme_gain_on_tpu(gain):
    if ON_TPU and gain >= 3.0:
        pytest.skip("near-one-hot softmax at |scores|~100s of log2 units is "
                    "MXU-precision-bound on hardware; exact-f32 interpret "
                    "mode covers these values")


def _run(fn, *args):
    # the suite pins tests to the CPU backend (conftest); only run the real
    # kernel when the run explicitly opts into TPU
    if os.environ.get("VAP_TEST_TPU"):
        return fn(*args)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return fn(*args)


@pytest.mark.parametrize("q_len,kv_len", [(256, 256), (300, 300), (512, 1024), (333, 777)])
def test_flash_forward_matches_dense(q_len, kv_len):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    B, H, D = 2, 3, 64
    q = jax.random.normal(kq, (B, H, q_len, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, kv_len, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, kv_len, D), jnp.float32)

    ref = dense_attention(q, k, v)
    got = _run(lambda q, k, v: flash_attention(q, k, v, None, 128, 128), q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=DENSE_ATOL, rtol=2e-3)


def test_flash_backward_matches_dense():
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    B, H, S, D = 1, 2, 300, 64
    q = jax.random.normal(kq, (B, H, S, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, S, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, S, D), jnp.float32)

    def loss_dense(q, k, v):
        return jnp.sum(jnp.sin(dense_attention(q, k, v)))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, None, 128, 128)))

    ref_grads = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    got_grads = _run(jax.grad(loss_flash, argnums=(0, 1, 2)), q, k, v)
    for g_ref, g_got in zip(ref_grads, got_grads):
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=5e-3, rtol=5e-3)


def test_flash_bf16():
    key = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(key, 3)
    B, H, S, D = 1, 2, 384, 64
    q = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, S, D), jnp.bfloat16)
    ref = dense_attention(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    got = _run(lambda q, k, v: flash_attention(q, k, v, None, 128, 128), q, k, v)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("q_len,kv_len,dim", [(256, 256, 64), (300, 520, 64), (256, 256, 128)])
def test_sage_int8_matches_dense(q_len, kv_len, dim):
    """int8-QK SageAttention analog: ~1% quantization error vs fp32 dense
    (reference parity target: SageAttention's lossless-for-diffusion claim)."""
    from vap_tpu.ops.flash_attention import flash_attention_int8

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    B, H = 1, 2
    q = jax.random.normal(kq, (B, H, q_len, dim), jnp.float32)
    k = jax.random.normal(kk, (B, H, kv_len, dim), jnp.float32) + 0.7  # K smoothing path
    v = jax.random.normal(kv, (B, H, kv_len, dim), jnp.float32)
    out = _run(lambda q, k, v: flash_attention_int8(q, k, v, block_q=128, block_k=256), q, k, v)
    ref = dense_attention(q, k, v)
    a = np.asarray(out, np.float32).ravel()
    b = np.asarray(ref, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.999, cos
    rel = np.abs(a - b).mean() / (np.abs(b).mean() + 1e-9)
    assert rel < 0.03, rel


def test_sage_provider_dispatch():
    from vap_tpu.ops.attention import attention_provider, get_attention_provider

    with attention_provider("sage"):
        assert get_attention_provider() == "sage"


def test_per_site_provider_dispatch():
    """Per-site provider overrides (reference --attn_provider_* 'module:provider',
    finetrainers/trainer/base.py:48-101; sites replace module names here)."""
    from vap_tpu.ops.attention import attention_provider, get_attention_provider

    with attention_provider("sage joint:flash cross:xla"):
        assert get_attention_provider() == "sage"
        assert get_attention_provider("joint") == "flash"
        assert get_attention_provider("cross") == "xla"
        assert get_attention_provider("other") == "sage"
    with attention_provider("joint:flash"):
        # no default in the spec: unlisted sites fall back to the env/platform default
        assert get_attention_provider("joint") == "flash"
    with pytest.raises(ValueError):
        attention_provider("joint:bogus").__enter__()


@pytest.mark.parametrize("gain", [1.0, 3.0])
def test_flash_bound_softmax_large_gain(gain):
    """The bound-softmax forward must stay accurate when q/k magnitudes are
    large (e.g. learned qk-norm gains ~3): the Hölder bound alone opens a
    >186-doubling gap there and would silently underflow every p to zero;
    the Cauchy-Schwarz min term keeps the gap small."""
    _skip_extreme_gain_on_tpu(gain)
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    B, H, S, D = 1, 2, 512, 64
    q = jax.random.normal(kq, (B, H, S, D), jnp.float32) * gain
    k = jax.random.normal(kk, (B, H, S, D), jnp.float32) * gain
    v = jax.random.normal(kv, (B, H, S, D), jnp.float32)
    ref = dense_attention(q, k, v)
    got = _run(lambda q, k, v: flash_attention(q, k, v), q, k, v)
    assert float(jnp.abs(got).max()) > 0, "bound softmax underflowed to zero"
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-3, rtol=5e-3)


@pytest.mark.parametrize("gain", [1.0, 3.0])
def test_flash_d128_scalar_bound(gain):
    """D=128 row-major path now uses the per-(b,h) scalar-bound softmax —
    forward and backward must match dense, including at large qk gains."""
    _skip_extreme_gain_on_tpu(gain)
    key = jax.random.PRNGKey(5)
    kq, kk, kv = jax.random.split(key, 3)
    B, H, S, D = 1, 2, 384, 128
    q = jax.random.normal(kq, (B, H, S, D), jnp.float32) * gain
    k = jax.random.normal(kk, (B, H, S, D), jnp.float32) * gain
    v = jax.random.normal(kv, (B, H, S, D), jnp.float32)

    ref = dense_attention(q, k, v)
    got = _run(lambda q, k, v: flash_attention(q, k, v, None, 128, 128), q, k, v)
    assert float(jnp.abs(got).max()) > 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-3, rtol=5e-3)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, 128, 128) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v) ** 2)

    g1 = _run(jax.grad(loss_flash, argnums=(0, 1, 2)), q, k, v)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-2, rtol=3e-2)


def test_flash_d128_underflow_fallback():
    """Advisor r2: the D>=128 scalar-reference path silently emitted all-zero
    output rows when a query row's max score sat >~126 doublings below the
    per-(b,h) reference (every exp2 underflows, l==0). The per-row probe
    guard must detect the gap and fall back to the running-max kernel so the
    pathological row stays correct."""
    _skip_extreme_gain_on_tpu(4.0)
    key = jax.random.PRNGKey(9)
    kq, kk, kv = jax.random.split(key, 3)
    B, H, S, D = 1, 1, 256, 128
    gain = 4.0  # CS-midpoint reference lands ~130 doublings above a zero row
    q = jax.random.normal(kq, (B, H, S, D), jnp.float32) * gain
    k = jax.random.normal(kk, (B, H, S, D), jnp.float32) * gain
    v = jax.random.normal(kv, (B, H, S, D), jnp.float32)
    q = q.at[:, :, 17].multiply(1e-4)  # one near-zero query row

    ref = dense_attention(q, k, v)
    got = _run(lambda q, k, v: flash_attention(q, k, v), q, k, v)
    row = np.asarray(got)[0, 0, 17]
    assert np.abs(row).max() > 0, "underflowed row silently zeroed"
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-3, rtol=5e-3)


def test_flash_d128_bound_path_still_default():
    """Well-scaled inputs must keep the fast scalar-bound path (the guard
    only trips on pathological gaps): outputs still match dense."""
    key = jax.random.PRNGKey(10)
    kq, kk, kv = jax.random.split(key, 3)
    B, H, S, D = 1, 2, 256, 128
    q = jax.random.normal(kq, (B, H, S, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, S, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, S, D), jnp.float32)
    ref = dense_attention(q, k, v)
    got = _run(lambda q, k, v: flash_attention(q, k, v), q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("kv_len", [257, 77, 200])
def test_flash_d128_short_unaligned_kv(kv_len):
    """D=128 row-major forward with a short, non-128-multiple KV — the Wan
    cross-attention CLIP image context (257 tokens, transformer_wan_mot.py's
    attn2 image stream). The dispatch's 8-rounded block_k traced a
    (bq, 264)-vs-(bq, 256) shape mismatch inside the running-max kernel
    (r5 wan_bench log); blocks are LANES-rounded now and the kv-bias row
    masks the pad, so values must still match dense exactly."""
    key = jax.random.PRNGKey(11)
    kq, kk, kv = jax.random.split(key, 3)
    B, H, Q, D = 1, 2, 256, 128
    q = jax.random.normal(kq, (B, H, Q, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, kv_len, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, kv_len, D), jnp.float32)

    ref = dense_attention(q, k, v)
    got = _run(flash_attention, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=DENSE_ATOL, rtol=2e-3)
