"""Wan 3D-causal VAE parity vs the reference torch model (tiny config)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.wan.vae import WanVAEConfig, wan_vae_decode, wan_vae_encode
from vap_tpu.models.wan.vae_weights import convert_wan_vae_state_dict


@pytest.fixture(scope="module")
def ref_vae(torch_reference):
    torch = torch_reference
    from diffusers.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan

    torch.manual_seed(0)
    return AutoencoderKLWan(
        base_dim=8, z_dim=4, dim_mult=[1, 1, 1, 1], num_res_blocks=1,
        latents_mean=[0.0] * 4, latents_std=[1.0] * 4,
    ).eval()


def _params(ref_vae, cfg):
    return convert_wan_vae_state_dict(
        {k: v.numpy() for k, v in ref_vae.state_dict().items() if hasattr(v, "numpy")}, cfg)


@pytest.mark.parametrize("frames", [
    pytest.param(1, marks=pytest.mark.slow),
    9,
])
def test_wan_encode_parity(torch_reference, ref_vae, frames):
    torch = torch_reference
    cfg = WanVAEConfig.tiny()
    params = _params(ref_vae, cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, frames, 32, 32)).astype(np.float32)

    with torch.no_grad():
        ref = ref_vae._encode(torch.from_numpy(x)).numpy()

    with jax.default_device(jax.devices("cpu")[0]):
        got = wan_vae_encode(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3), ref, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("latent_frames", [
    pytest.param(1, marks=pytest.mark.slow),
    3,
])
def test_wan_decode_parity(torch_reference, ref_vae, latent_frames):
    torch = torch_reference
    cfg = WanVAEConfig.tiny()
    params = _params(ref_vae, cfg)
    rng = np.random.default_rng(1)
    z = rng.standard_normal((1, cfg.z_dim, latent_frames, 4, 4)).astype(np.float32)

    with torch.no_grad():
        ref = ref_vae._decode(torch.from_numpy(z)).sample.numpy()

    with jax.default_device(jax.devices("cpu")[0]):
        got = wan_vae_decode(params, cfg, jnp.asarray(z.transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3), ref, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_wan_tiled_decode_matches_reference_tiled(torch_reference, ref_vae):
    """Tiled decode parity vs the TORCH tiled path at a real tile layout
    (64x64 latent -> 512x512 output, tile 256 / stride 192; seams included).
    Note tiled != full even away from seams: the decoder's receptive field at
    latent scale exceeds any practical interior margin."""
    import torch

    from vap_tpu.models.wan.vae import wan_vae_decode_tiled

    cfg = WanVAEConfig.tiny()
    params = _params(ref_vae, cfg)
    rng = np.random.default_rng(2)
    z = rng.standard_normal((1, 1, 64, 64, cfg.z_dim)).astype(np.float32) * 0.1

    ref_vae.enable_tiling(tile_sample_min_height=256, tile_sample_min_width=256,
                          tile_sample_stride_height=192, tile_sample_stride_width=192)
    try:
        with torch.no_grad():
            ref = ref_vae.tiled_decode(
                torch.from_numpy(z.transpose(0, 4, 1, 2, 3)), return_dict=False)[0].numpy()
    finally:
        ref_vae.disable_tiling()

    with jax.default_device(jax.devices("cpu")[0]):
        tiled = np.asarray(wan_vae_decode_tiled(params, cfg, jnp.asarray(z)))
    assert tiled.transpose(0, 4, 1, 2, 3).shape == ref.shape
    np.testing.assert_allclose(tiled.transpose(0, 4, 1, 2, 3), ref, atol=5e-4, rtol=1e-3)


def test_wan_streamed_decode_matches_decode(torch_reference, ref_vae):
    """wan_vae_decode_streamed (per-chunk jit + donated feat_cache) must be
    numerically identical to the single-graph wan_vae_decode."""
    from vap_tpu.models.wan.vae import wan_vae_decode_streamed

    cfg = WanVAEConfig.tiny()
    params = _params(ref_vae, cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8, cfg.z_dim), jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        ref = wan_vae_decode(params, cfg, z)
        got = wan_vae_decode_streamed(params, cfg, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)
