"""Golden parity: LTX causal 3D VAE (0.9.0) vs diffusers AutoencoderKLLTXVideo
(tiny config, fp32 CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.ltx_video.vae import (
    LTXVideoVAEConfig, convert_ltx_vae_state_dict, init_ltx_vae,
    ltx_vae_decode, ltx_vae_encode, normalize_latents, denormalize_latents)


def _torch_vae(cfg):
    import torch
    from diffusers import AutoencoderKLLTXVideo

    torch.manual_seed(0)
    n = len(cfg.block_out_channels)
    return AutoencoderKLLTXVideo(
        in_channels=cfg.in_channels, out_channels=cfg.out_channels,
        latent_channels=cfg.latent_channels,
        block_out_channels=list(cfg.block_out_channels),
        down_block_types=("LTXVideoDownBlock3D",) * n,
        decoder_block_out_channels=list(cfg.block_out_channels),
        layers_per_block=list(cfg.layers_per_block),
        decoder_layers_per_block=list(cfg.layers_per_block),
        spatio_temporal_scaling=list(cfg.spatio_temporal_scaling),
        decoder_spatio_temporal_scaling=list(cfg.spatio_temporal_scaling),
        patch_size=cfg.patch_size, patch_size_t=cfg.patch_size_t,
        resnet_norm_eps=cfg.resnet_norm_eps,
        encoder_causal=cfg.encoder_causal, decoder_causal=cfg.decoder_causal,
        scaling_factor=cfg.scaling_factor, timestep_conditioning=False,
    ).eval()


def test_ltx_vae_parity(torch_reference):
    import torch

    cfg = LTXVideoVAEConfig.tiny()
    m = _torch_vae(cfg)
    params = convert_ltx_vae_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)

    rng = np.random.default_rng(0)
    # F=5 (1 + 4), spatial 8x8 (patch 2, one 2x scaling -> latent 2x2)
    x = rng.uniform(-1, 1, (1, 3, 5, 8, 8)).astype(np.float32)  # NCFHW torch
    with torch.no_grad():
        moments_ref = m.encoder(torch.from_numpy(x)).numpy()
        z = moments_ref[:, : cfg.latent_channels]
        dec_ref = m.decoder(torch.from_numpy(z)).numpy()

    def to_jax(a):
        return jnp.asarray(a.transpose(0, 2, 3, 4, 1))

    def to_np(a):
        return np.asarray(a).transpose(0, 4, 1, 2, 3)

    with jax.default_device(jax.devices("cpu")[0]):
        moments = ltx_vae_encode(params, cfg, to_jax(x))
        dec = ltx_vae_decode(params, cfg, to_jax(z))

    np.testing.assert_allclose(to_np(moments), moments_ref, atol=3e-4, rtol=2e-3)
    np.testing.assert_allclose(to_np(dec), dec_ref, atol=3e-4, rtol=2e-3)


def test_ltx_vae_structures_and_norm(torch_reference):
    cfg = LTXVideoVAEConfig.tiny(latents_mean=(0.1, 0.2, -0.1, 0.0),
                                 latents_std=(1.0, 0.9, 1.1, 1.2))
    m = _torch_vae(cfg)
    conv = convert_ltx_vae_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    init = init_ltx_vae(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(conv) == jax.tree.structure(init)
    for a, b in zip(jax.tree.leaves(conv), jax.tree.leaves(init)):
        assert a.shape == b.shape
    z = jnp.asarray(np.random.default_rng(1).standard_normal((1, 2, 2, 2, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(denormalize_latents(cfg, normalize_latents(cfg, z))),
        np.asarray(z), atol=1e-6)
