"""Varlen (per-sample KV length) flash attention — the reference FLASH_VARLEN
provider analog (finetrainers/models/attention_dispatch.py:809-889).

Covers: forward parity vs masked dense (both kernel layouts, bound + running
max), backward parity, exact invariance to garbage in the masked suffix,
int8 (SAGE_VARLEN analog), the jax library kernel path, and dispatcher
routing incl. the HunyuanVideo joint-attention consumer.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vap_tpu.ops.attention import (
    attention_provider,
    dense_attention_masked,
    jax_flash_attention,
    scaled_dot_product_attention,
)
from vap_tpu.ops.flash_attention import (
    _flash_attention_forward_t,
    flash_attention_int8,
    flash_attention_varlen,
)

ON_TPU = bool(os.environ.get("VAP_TEST_TPU"))
ATOL = 6e-3 if ON_TPU else 2e-3


def _run(fn, *args):
    if ON_TPU:
        return fn(*args)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return fn(*args)


def _qkv(seed, B, H, S, D, skv=None):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(seed), 3)
    skv = skv or S
    return (jax.random.normal(kq, (B, H, S, D), jnp.float32),
            jax.random.normal(kk, (B, H, skv, D), jnp.float32),
            jax.random.normal(kv, (B, H, skv, D), jnp.float32))


# ---------------------------------------------------------------------------
# forward parity — D=64 exercises the transposed layout; lens of 100/37 leave
# the second 512-wide kv block fully masked (the regression the running-max
# floor / vt zeroing exist for)
# ---------------------------------------------------------------------------

def test_varlen_forward_matches_masked_dense_d64():
    q, k, v = _qkv(0, 3, 2, 640, 64)
    lens = jnp.array([640, 100, 37], jnp.int32)
    ref = dense_attention_masked(q, k, v, lens)
    got = _run(lambda *a: flash_attention_varlen(*a), q, k, v, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=ATOL, rtol=2e-3)


def test_varlen_forward_runmax_t_matches_masked_dense():
    q, k, v = _qkv(1, 2, 2, 384, 64)
    lens = jnp.array([384, 50], jnp.int32)
    ref = dense_attention_masked(q, k, v, lens)
    out, _ = _run(
        lambda q, k, v, l: _flash_attention_forward_t(
            q, k, v, 64 ** -0.5, 128, 128, use_bound=False, kv_lens=l),
        q, k, v, lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=ATOL, rtol=2e-3)


def test_varlen_forward_matches_masked_dense_d128_row_kernel():
    # D=128 -> dim+1 > 128 -> row-major kernel (the HunyuanVideo/Wan head dim)
    q, k, v = _qkv(2, 2, 2, 384, 128)
    lens = jnp.array([384, 70], jnp.int32)
    ref = dense_attention_masked(q, k, v, lens)
    # explicit small blocks force multiple kv blocks incl. a fully-masked one
    got = _run(lambda *a: flash_attention_varlen(*a, None, 128, 128), q, k, v, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=ATOL, rtol=2e-3)


@pytest.mark.parametrize("dim", [64, 128])
def test_varlen_output_ignores_masked_suffix_exactly(dim):
    """Bit-exact invariance: rewriting k/v beyond each sample's length must not
    change the output at all (stronger than any dense-comparison tolerance).
    dim=64 covers the transposed bound path, dim=128 the row scalar-bound
    path — both compute their bound statistics over valid keys only."""
    q, k, v = _qkv(3, 2, 2, 640, dim)
    lens = jnp.array([200, 513], jnp.int32)
    base = _run(lambda *a: flash_attention_varlen(*a), q, k, v, lens)
    mask = (jnp.arange(640)[None, None, :, None] < lens[:, None, None, None])
    k2 = jnp.where(mask, k, 37.0)
    v2 = jnp.where(mask, v, -11.0)
    got = _run(lambda *a: flash_attention_varlen(*a), q, k2, v2, lens)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dim", [64, 128])
def test_varlen_backward_matches_masked_dense(dim):
    q, k, v = _qkv(4, 2, 2, 320, dim)
    lens = jnp.array([320, 90], jnp.int32)
    w = jax.random.normal(jax.random.PRNGKey(9), q.shape, jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_varlen(q, k, v, lens, None, 128, 128) * w)

    def loss_dense(q, k, v):
        return jnp.sum(dense_attention_masked(q, k, v, lens) * w)

    g_flash = _run(jax.grad(loss_flash, argnums=(0, 1, 2)), q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for gf, gd, name in zip(g_flash, g_dense, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                                   atol=2e-2 if ON_TPU else 5e-3, rtol=2e-3,
                                   err_msg=f"d{name}")
    # invalid keys receive exactly zero gradient
    invalid = np.asarray(g_flash[1])[1, :, 90:]
    assert np.all(invalid == 0.0)
    assert np.all(np.asarray(g_flash[2])[1, :, 90:] == 0.0)


# ---------------------------------------------------------------------------
# int8 (SAGE_VARLEN analog) and the jax library kernel
# ---------------------------------------------------------------------------

def test_varlen_int8_close_and_suffix_invariant():
    q, k, v = _qkv(5, 2, 2, 384, 64)
    lens = jnp.array([384, 120], jnp.int32)
    ref = dense_attention_masked(q, k, v, lens)
    got = _run(lambda *a: flash_attention_int8(*a[:3], kv_lens=a[3]), q, k, v, lens)
    cos = np.sum(np.asarray(got) * np.asarray(ref)) / (
        np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.999, cos
    # masked suffix of k AND v must not leak (invalid k rows are zeroed
    # before quantization, so even the int8 range is unaffected)
    mask = (jnp.arange(384)[None, None, :, None] < lens[:, None, None, None])
    k2 = jnp.where(mask, k, 42.0)
    v2 = jnp.where(mask, v, 99.0)
    got2 = _run(lambda *a: flash_attention_int8(*a[:3], kv_lens=a[3]), q, k2, v2, lens)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(got))


def test_varlen_jax_flash_matches_masked_dense():
    q, k, v = _qkv(6, 2, 2, 256, 64)
    lens = jnp.array([256, 77], jnp.int32)
    ref = dense_attention_masked(q, k, v, lens)
    got = _run(lambda *a: jax_flash_attention(*a[:3], kv_lens=a[3]), q, k, v, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=ATOL, rtol=2e-3)


# ---------------------------------------------------------------------------
# dispatcher
# ---------------------------------------------------------------------------

def test_dispatch_xla_with_kv_lens_is_masked_dense():
    q, k, v = _qkv(7, 2, 2, 96, 32)
    lens = jnp.array([96, 40], jnp.int32)
    with attention_provider("xla"):
        got = scaled_dot_product_attention(q, k, v, kv_lens=lens)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(dense_attention_masked(q, k, v, lens)))


def test_dispatch_flash_varlen_provider_routes_to_kernel():
    q, k, v = _qkv(8, 2, 2, 256, 64)
    lens = jnp.array([256, 100], jnp.int32)
    ref = dense_attention_masked(q, k, v, lens)
    for provider in ("flash", "flash_varlen"):
        with attention_provider(provider):
            got = _run(lambda *a: scaled_dot_product_attention(*a[:3], kv_lens=a[3]),
                       q, k, v, lens)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=ATOL, rtol=2e-3)
    # flash_varlen without lens degrades to the plain fused kernel
    with attention_provider("flash_varlen"):
        got = _run(lambda *a: scaled_dot_product_attention(*a), q, k, v)
    full = dense_attention_masked(q, k, v, jnp.array([256, 256], jnp.int32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(full), atol=ATOL, rtol=2e-3)


# ---------------------------------------------------------------------------
# varlen under sequence parallelism (beyond the reference: its ring providers
# never supported varlen — FLASH_VARLEN lacks supports_cp)
# ---------------------------------------------------------------------------

def _mesh8():
    from vap_tpu.parallel import MeshConfig, make_mesh

    return make_mesh(MeshConfig(data=2, fsdp=2, seq=2, tensor=1),
                     jax.devices("cpu")[:8])


@pytest.mark.parametrize("rotate", ["allgather", "ppermute", "ulysses"])
def test_seq_parallel_varlen_matches_masked_dense(rotate):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vap_tpu.parallel.ring_attention import sequence_parallel_attention

    mesh = _mesh8()
    q, k, v = _qkv(9, 2, 4, 64, 16)
    # sample 1's valid region ends INSIDE the first of the two seq shards,
    # leaving the second ring block fully masked for it
    lens = jnp.array([64, 20], jnp.int32)
    with jax.default_device(jax.devices("cpu")[0]):
        ref = dense_attention_masked(q, k, v, lens)
    spec = NamedSharding(mesh, P(None, None, "seq", None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    got = sequence_parallel_attention(qs, ks, vs, mesh, "seq",
                                      rotate_method=rotate, kv_lens=lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_dispatch_ring_with_kv_lens_uses_installed_mesh():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vap_tpu.parallel.ring_attention import attention_mesh

    mesh = _mesh8()
    q, k, v = _qkv(10, 2, 4, 64, 16)
    lens = jnp.array([48, 17], jnp.int32)
    with jax.default_device(jax.devices("cpu")[0]):
        ref = dense_attention_masked(q, k, v, lens)
    spec = NamedSharding(mesh, P(None, None, "seq", None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    with attention_mesh(mesh, "seq", rotate_method="ppermute"):
        with attention_provider("ring"):
            got = scaled_dot_product_attention(qs, ks, vs, kv_lens=lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# consumer: HunyuanVideo joint attention (ragged text mask)
# ---------------------------------------------------------------------------

def test_hunyuan_forward_varlen_matches_dense(monkeypatch):
    from vap_tpu.models.hunyuan_video import (
        HunyuanVideoConfig, hunyuan_video_forward, init_hunyuan_video)

    cfg = HunyuanVideoConfig.tiny()
    params = init_hunyuan_video(jax.random.PRNGKey(0), cfg)
    B, F, H, W, S_txt = 2, 2, 4, 4, 8
    kk = jax.random.PRNGKey(1)
    latents = jax.random.normal(kk, (B, cfg.in_channels, F, H, W))
    text = jax.random.normal(kk, (B, S_txt, cfg.text_embed_dim))
    pooled = jax.random.normal(kk, (B, cfg.pooled_projection_dim))
    t = jnp.array([500.0, 500.0])
    mask = jnp.array([[1] * 8, [1] * 3 + [0] * 5], jnp.float32)  # ragged

    def fwd():
        return hunyuan_video_forward(
            params, cfg, hidden_states=latents, encoder_hidden_states=text,
            pooled_projections=pooled, timestep=t,
            encoder_attention_mask=mask, remat=False)

    monkeypatch.setenv("VAP_ATTN_PROVIDER", "")
    with attention_provider("xla"):
        ref = fwd()
    with attention_provider("flash_varlen"):
        got = _run(fwd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3, rtol=5e-3)


def test_masked_dense_zero_length_returns_zeros_not_nan():
    """kv_lens == 0 must match the fused kernels' all-zero output; a plain
    softmax over an all -inf row would emit NaN and poison gradients."""
    q, k, v = _qkv(11, 2, 2, 32, 16)
    lens = jnp.array([32, 0], jnp.int32)
    out = dense_attention_masked(q, k, v, lens)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(np.asarray(out)[1], 0.0)
    # gradients stay finite too
    g = jax.grad(lambda q: jnp.sum(dense_attention_masked(q, k, v, lens) ** 2))(q)
    assert np.isfinite(np.asarray(g)).all()
