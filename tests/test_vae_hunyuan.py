"""Golden parity: Hunyuan causal 3D VAE vs diffusers AutoencoderKLHunyuanVideo
(tiny config, fp32 CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.hunyuan_video.vae import (
    HunyuanVideoVAEConfig, convert_hunyuan_vae_state_dict,
    hunyuan_vae_decode, hunyuan_vae_encode, init_hunyuan_vae)


def _torch_vae(cfg):
    import torch
    from diffusers import AutoencoderKLHunyuanVideo

    torch.manual_seed(0)
    n = len(cfg.block_out_channels)
    return AutoencoderKLHunyuanVideo(
        in_channels=cfg.in_channels, out_channels=cfg.out_channels,
        latent_channels=cfg.latent_channels,
        down_block_types=("HunyuanVideoDownBlock3D",) * n,
        up_block_types=("HunyuanVideoUpBlock3D",) * n,
        block_out_channels=list(cfg.block_out_channels),
        layers_per_block=cfg.layers_per_block,
        norm_num_groups=cfg.norm_num_groups,
        scaling_factor=cfg.scaling_factor,
        spatial_compression_ratio=cfg.spatial_compression_ratio,
        temporal_compression_ratio=cfg.temporal_compression_ratio,
        mid_block_add_attention=cfg.mid_block_add_attention,
    ).eval()


def test_hunyuan_vae_parity(torch_reference):
    import torch

    cfg = HunyuanVideoVAEConfig.tiny()
    m = _torch_vae(cfg)
    params = convert_hunyuan_vae_state_dict(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)

    rng = np.random.default_rng(0)
    # F=5 (1 + 4 temporal-compressible), small spatial
    x = rng.uniform(-1, 1, (1, 3, 5, 8, 8)).astype(np.float32)  # NCFHW torch
    with torch.no_grad():
        moments_ref = m._encode(torch.from_numpy(x)).numpy()
        z = moments_ref[:, : cfg.latent_channels]
        m.use_framewise_decoding = False
        m.use_framewise_encoding = False
        dec_ref = m.decoder(m.post_quant_conv(torch.from_numpy(z))).numpy()

    def to_jax(a):  # NCFHW -> NFHWC
        return jnp.asarray(a.transpose(0, 2, 3, 4, 1))

    def to_np(a):  # NFHWC -> NCFHW
        return np.asarray(a).transpose(0, 4, 1, 2, 3)

    with jax.default_device(jax.devices("cpu")[0]):
        moments = hunyuan_vae_encode(params, cfg, to_jax(x))
        dec = hunyuan_vae_decode(params, cfg, to_jax(z))

    np.testing.assert_allclose(to_np(moments), moments_ref, atol=3e-4, rtol=2e-3)
    np.testing.assert_allclose(to_np(dec), dec_ref, atol=3e-4, rtol=2e-3)


def test_hunyuan_vae_init_structure(torch_reference):
    cfg = HunyuanVideoVAEConfig.tiny()
    m = _torch_vae(cfg)
    conv = convert_hunyuan_vae_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    init = init_hunyuan_vae(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(conv) == jax.tree.structure(init)
    for a, b in zip(jax.tree.leaves(conv), jax.tree.leaves(init)):
        assert a.shape == b.shape
