"""CogVideoX 3D-causal VAE parity vs the reference torch model (tiny config)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.cogvideox.vae import (
    CogVideoXVAEConfig,
    posterior_mode,
    vae_decode,
    vae_encode,
)
from vap_tpu.models.cogvideox.vae_weights import convert_cogvideox_vae_state_dict


@pytest.fixture(scope="module")
def ref_vae(torch_reference):
    torch = torch_reference
    from diffusers.models.autoencoders.autoencoder_kl_cogvideox import AutoencoderKLCogVideoX

    torch.manual_seed(0)
    model = AutoencoderKLCogVideoX(
        block_out_channels=(8, 8, 8, 8), latent_channels=4, layers_per_block=1,
        norm_num_groups=4,
    ).eval()
    return model


@pytest.fixture(scope="module")
def jax_cfg():
    return CogVideoXVAEConfig.tiny()


def _to_jax_video(x_torch):
    # torch [B, C, F, H, W] -> jax [B, F, H, W, C]
    return jnp.asarray(x_torch.numpy().transpose(0, 2, 3, 4, 1))


def _from_jax_video(x):
    return np.asarray(x).transpose(0, 4, 1, 2, 3)


@pytest.mark.parametrize("frames", [
    pytest.param(1, marks=pytest.mark.slow),
    9,
    pytest.param(17, marks=pytest.mark.slow),
])
def test_encode_parity(torch_reference, ref_vae, jax_cfg, frames):
    torch = torch_reference
    params = convert_cogvideox_vae_state_dict(
        {k: v.numpy() for k, v in ref_vae.state_dict().items()}, jax_cfg
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, frames, 32, 32)).astype(np.float32)

    with torch.no_grad():
        ref_moments = ref_vae._encode(torch.from_numpy(x)).numpy()

    with jax.default_device(jax.devices("cpu")[0]):
        got = vae_encode(params, jax_cfg, _to_jax_video(torch.from_numpy(x)))
    np.testing.assert_allclose(_from_jax_video(got), ref_moments, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("latent_frames", [
    pytest.param(1, marks=pytest.mark.slow),
    3,
    pytest.param(5, marks=pytest.mark.slow),
])
def test_decode_parity(torch_reference, ref_vae, jax_cfg, latent_frames):
    torch = torch_reference
    params = convert_cogvideox_vae_state_dict(
        {k: v.numpy() for k, v in ref_vae.state_dict().items()}, jax_cfg
    )
    rng = np.random.default_rng(1)
    z = rng.standard_normal((1, jax_cfg.latent_channels, latent_frames, 4, 4)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_vae._decode(torch.from_numpy(z)).sample.numpy()

    with jax.default_device(jax.devices("cpu")[0]):
        got = vae_decode(params, jax_cfg, _to_jax_video(torch.from_numpy(z)))
    np.testing.assert_allclose(_from_jax_video(got), ref_out, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_roundtrip_shapes(jax_cfg, torch_reference, ref_vae):
    params = convert_cogvideox_vae_state_dict(
        {k: v.numpy() for k, v in ref_vae.state_dict().items()}, jax_cfg
    )
    x = jnp.zeros((1, 9, 32, 32, 3))
    with jax.default_device(jax.devices("cpu")[0]):
        moments = vae_encode(params, jax_cfg, x)
        assert moments.shape == (1, 3, 4, 4, 2 * jax_cfg.latent_channels)
        z = posterior_mode(moments)
        out = vae_decode(params, jax_cfg, z)
    assert out.shape == (1, 9, 32, 32, 3)


def test_decode_chunking_is_semantic(torch_reference, ref_vae, jax_cfg):
    """Decode chunking is SEMANTIC (SpatialNorm3D interpolates zq per chunk):
    document that frame_batch != 2 diverges, guarding against 'optimizing' it."""
    params = convert_cogvideox_vae_state_dict(
        {k: v.numpy() for k, v in ref_vae.state_dict().items()}, jax_cfg
    )
    rng = np.random.default_rng(7)
    z = jnp.asarray(rng.standard_normal((1, 5, 4, 4, jax_cfg.latent_channels)).astype(np.float32))
    with jax.default_device(jax.devices("cpu")[0]):
        chunked = vae_decode(params, jax_cfg, z)            # default: 2-frame chunks
        mono = vae_decode(params, jax_cfg, z, frame_batch=None)
    diff = float(jnp.abs(mono - chunked).max())
    assert diff > 1e-3  # genuinely different paths


def test_streamed_decode_matches_vae_decode(jax_cfg):
    """vae_decode_streamed (per-chunk jit + donated cache) must be numerically
    identical to the single-graph vae_decode — same chunking, same math."""
    from vap_tpu.models.cogvideox.vae import init_cogvideox_vae, vae_decode, vae_decode_streamed

    params = init_cogvideox_vae(jax.random.PRNGKey(0), jax_cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 8, 8, jax_cfg.latent_channels), jnp.float32)
    ref = vae_decode(params, jax_cfg, z)
    got = vae_decode_streamed(params, jax_cfg, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_wsplit_decode_close_to_full(jax_cfg):
    """W-split decode (2 tiles + blended overlap) approximates full decode;
    n_splits=1 is exactly the streamed full-frame path."""
    from vap_tpu.models.cogvideox.vae import init_cogvideox_vae, vae_decode, vae_decode_wsplit

    params = init_cogvideox_vae(jax.random.PRNGKey(0), jax_cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8, 12, jax_cfg.latent_channels), jnp.float32)
    ref = vae_decode(params, jax_cfg, z)
    one = vae_decode_wsplit(params, jax_cfg, z, n_splits=1)
    np.testing.assert_allclose(np.asarray(one), np.asarray(ref), atol=1e-5, rtol=1e-5)
    two = vae_decode_wsplit(params, jax_cfg, z, n_splits=2, overlap_lat=6)
    assert two.shape == ref.shape
    # interior columns see enough context that the split is near-exact
    diff = np.abs(np.asarray(two) - np.asarray(ref)).mean()
    assert diff < 0.05, diff


def test_sum2d_conv3d_matches_default(jax_cfg, monkeypatch):
    """VAP_VAE_CONV3D=sum2d (exact kt-tap decomposition, a TPU conv-emitter
    layout candidate — scripts/conv3d_bench.py) must reproduce the NDHWC conv
    through the full decode, cache streaming included."""
    from vap_tpu.models.cogvideox.vae import init_cogvideox_vae, vae_decode_streamed

    params = init_cogvideox_vae(jax.random.PRNGKey(0), jax_cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 6, 6, jax_cfg.latent_channels), jnp.float32)
    monkeypatch.setenv("VAP_VAE_CONV3D", "ndhwc")
    ref = np.asarray(vae_decode_streamed(params, jax_cfg, z))
    monkeypatch.setenv("VAP_VAE_CONV3D", "sum2d")
    got = np.asarray(vae_decode_streamed(params, jax_cfg, z))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_conv3d_auto_dispatch(monkeypatch):
    """'auto' must take the sum2d branch on shapes _sum2d_wins selects and
    match forced ndhwc there exactly (ADVICE r4: the default's shape-dispatch
    was untested — tiny configs kept auto on the NDHWC branch)."""
    from vap_tpu.models.cogvideox.vae import _conv3d, _sum2d_wins

    # small-extent regime (h*w <= 16K) and the W-split decode regime
    for (h, w, cin) in ((40, 40, 8), (288, 512, 4)):
        assert _sum2d_wins(h, w, cin)
        k = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 3, cin, 4), jnp.float32) * 0.1
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, h, w, cin), jnp.float32)
        p = {"kernel": k}
        pad = ((0, 0), (1, 1), (1, 1))
        monkeypatch.setenv("VAP_VAE_CONV3D", "ndhwc")
        ref = np.asarray(_conv3d(p, x, padding=pad))
        monkeypatch.setenv("VAP_VAE_CONV3D", "auto")
        got = np.asarray(_conv3d(p, x, padding=pad))
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)
    # measured ndhwc regimes stay on ndhwc
    assert not _sum2d_wins(240, 184, 256)   # up2 240p
    assert not _sum2d_wins(480, 720, 3)     # encoder conv_in, full W
    assert not _sum2d_wins(240, 360, 128)   # encoder stage 1


def test_conv3d_mode_validated():
    """Typos in VAP_VAE_CONV3D must raise, not silently fall back (ADVICE r4)."""
    from vap_tpu.models.cogvideox.vae import _conv3d

    k = jnp.zeros((3, 3, 3, 2, 2), jnp.float32)
    x = jnp.zeros((1, 5, 8, 8, 2), jnp.float32)
    os.environ["VAP_VAE_CONV3D"] = "nhwc "
    try:
        with pytest.raises(ValueError, match="VAP_VAE_CONV3D"):
            _conv3d({"kernel": k}, x, padding=((0, 0), (1, 1), (1, 1)))
    finally:
        os.environ.pop("VAP_VAE_CONV3D", None)
