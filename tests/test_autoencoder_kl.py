"""Golden parity: 2D AutoencoderKL (Flux/SD image VAE) vs diffusers
(tiny config, fp32 CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.autoencoder_kl import (
    AutoencoderKLConfig, convert_autoencoder_kl_state_dict,
    init_autoencoder_kl, scale_latents, unscale_latents,
    vae2d_decode, vae2d_encode,
)


def _torch_vae(cfg, torch_reference):
    import torch
    from diffusers import AutoencoderKL

    torch.manual_seed(0)
    n = len(cfg.block_out_channels)
    m = AutoencoderKL(
        in_channels=cfg.in_channels, out_channels=cfg.out_channels,
        down_block_types=("DownEncoderBlock2D",) * n,
        up_block_types=("UpDecoderBlock2D",) * n,
        block_out_channels=list(cfg.block_out_channels),
        layers_per_block=cfg.layers_per_block,
        latent_channels=cfg.latent_channels,
        norm_num_groups=cfg.norm_num_groups,
        use_quant_conv=cfg.use_quant_conv,
        use_post_quant_conv=cfg.use_post_quant_conv,
        scaling_factor=cfg.scaling_factor,
        shift_factor=cfg.shift_factor,
        mid_block_add_attention=cfg.mid_block_add_attention,
    ).eval()
    return m


@pytest.mark.parametrize("quant", [False, True])
def test_vae2d_parity(torch_reference, quant):
    import torch

    cfg = AutoencoderKLConfig.tiny(use_quant_conv=quant, use_post_quant_conv=quant)
    m = _torch_vae(cfg, torch_reference)
    params = convert_autoencoder_kl_state_dict(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 16, 16)).astype(np.float32)  # NCHW for torch
    with torch.no_grad():
        moments_ref = m._encode(torch.from_numpy(x)).numpy()
        z = moments_ref[:, : cfg.latent_channels]
        dec_ref = m.decode(torch.from_numpy(z), return_dict=False)[0].numpy()

    with jax.default_device(jax.devices("cpu")[0]):
        moments = vae2d_encode(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
        dec = vae2d_decode(params, cfg, jnp.asarray(z.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(
        np.asarray(moments).transpose(0, 3, 1, 2), moments_ref, atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(dec).transpose(0, 3, 1, 2), dec_ref, atol=2e-4, rtol=2e-3)


def test_scale_roundtrip():
    cfg = AutoencoderKLConfig.tiny()
    z = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4, 4, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(unscale_latents(cfg, scale_latents(cfg, z))), np.asarray(z), atol=1e-6)


def test_init_structure_matches_converted(torch_reference):
    cfg = AutoencoderKLConfig.tiny()
    m = _torch_vae(cfg, torch_reference)
    conv = convert_autoencoder_kl_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    init = init_autoencoder_kl(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(conv) == jax.tree.structure(init)
    for a, b in zip(jax.tree.leaves(conv), jax.tree.leaves(init)):
        assert a.shape == b.shape
