"""Golden parity: HunyuanVideo transformer vs diffusers
HunyuanVideoTransformer3DModel (tiny config, fp32 CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.hunyuan_video import (
    HunyuanVideoConfig, convert_hunyuan_video_state_dict,
    hunyuan_video_forward, init_hunyuan_video)


def _torch_model(cfg):
    import torch
    from diffusers import HunyuanVideoTransformer3DModel

    torch.manual_seed(0)
    return HunyuanVideoTransformer3DModel(
        in_channels=cfg.in_channels, out_channels=cfg.out_channels,
        num_attention_heads=cfg.num_attention_heads,
        attention_head_dim=cfg.attention_head_dim,
        num_layers=cfg.num_layers, num_single_layers=cfg.num_single_layers,
        num_refiner_layers=cfg.num_refiner_layers,
        patch_size=cfg.patch_size, patch_size_t=cfg.patch_size_t,
        guidance_embeds=cfg.guidance_embeds,
        text_embed_dim=cfg.text_embed_dim,
        pooled_projection_dim=cfg.pooled_projection_dim,
        rope_theta=cfg.rope_theta, rope_axes_dim=tuple(cfg.rope_axes_dim),
    ).eval()


@pytest.mark.parametrize("guidance_embeds", [True, False])
def test_hunyuan_forward_parity(torch_reference, guidance_embeds, monkeypatch):
    import torch

    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    cfg = HunyuanVideoConfig.tiny(guidance_embeds=guidance_embeds)
    m = _torch_model(cfg)
    params = convert_hunyuan_video_state_dict(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)

    B, F, H, W, S_txt = 2, 2, 4, 4, 6
    rng = np.random.default_rng(0)
    hidden = rng.standard_normal((B, cfg.in_channels, F, H, W)).astype(np.float32)
    enc = rng.standard_normal((B, S_txt, cfg.text_embed_dim)).astype(np.float32)
    pooled = rng.standard_normal((B, cfg.pooled_projection_dim)).astype(np.float32)
    mask = np.ones((B, S_txt), np.float32)
    mask[1, 4:] = 0
    t = np.array([250.0, 900.0], np.float32)
    guidance = np.array([6000.0, 6000.0], np.float32) if guidance_embeds else None

    with torch.no_grad():
        ref = m(
            hidden_states=torch.from_numpy(hidden),
            timestep=torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(enc),
            encoder_attention_mask=torch.from_numpy(mask),
            pooled_projections=torch.from_numpy(pooled),
            guidance=torch.from_numpy(guidance) if guidance is not None else None,
            return_dict=False,
        )[0].numpy()

    with jax.default_device(jax.devices("cpu")[0]):
        got = hunyuan_video_forward(
            params, cfg,
            hidden_states=jnp.asarray(hidden),
            encoder_hidden_states=jnp.asarray(enc),
            pooled_projections=jnp.asarray(pooled),
            timestep=jnp.asarray(t),
            guidance=jnp.asarray(guidance) if guidance is not None else None,
            encoder_attention_mask=jnp.asarray(mask),
            remat=False,
        )
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=2e-3)


def test_hunyuan_init_structure(torch_reference):
    cfg = HunyuanVideoConfig.tiny()
    m = _torch_model(cfg)
    conv = convert_hunyuan_video_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    init = init_hunyuan_video(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(conv) == jax.tree.structure(init)
    for a, b in zip(jax.tree.leaves(conv), jax.tree.leaves(init)):
        assert a.shape == b.shape


def test_hunyuan_token_replace_parity(torch_reference, monkeypatch):
    """I2V token_replace blocks: first-frame tokens modulated at t=0."""
    import torch

    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    cfg = HunyuanVideoConfig.tiny(image_condition_type="token_replace")
    import diffusers

    torch.manual_seed(0)
    m = diffusers.HunyuanVideoTransformer3DModel(
        in_channels=cfg.in_channels, out_channels=cfg.out_channels,
        num_attention_heads=cfg.num_attention_heads,
        attention_head_dim=cfg.attention_head_dim,
        num_layers=cfg.num_layers, num_single_layers=cfg.num_single_layers,
        num_refiner_layers=cfg.num_refiner_layers,
        patch_size=cfg.patch_size, patch_size_t=cfg.patch_size_t,
        guidance_embeds=cfg.guidance_embeds,
        text_embed_dim=cfg.text_embed_dim,
        pooled_projection_dim=cfg.pooled_projection_dim,
        rope_theta=cfg.rope_theta, rope_axes_dim=tuple(cfg.rope_axes_dim),
        image_condition_type="token_replace",
    ).eval()
    params = convert_hunyuan_video_state_dict(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)

    B, F, H, W, S_txt = 2, 2, 4, 4, 6
    rng = np.random.default_rng(1)
    hidden = rng.standard_normal((B, cfg.in_channels, F, H, W)).astype(np.float32)
    enc = rng.standard_normal((B, S_txt, cfg.text_embed_dim)).astype(np.float32)
    pooled = rng.standard_normal((B, cfg.pooled_projection_dim)).astype(np.float32)
    mask = np.ones((B, S_txt), np.float32)
    t = np.array([250.0, 900.0], np.float32)
    guidance = np.array([6000.0, 6000.0], np.float32)

    with torch.no_grad():
        ref = m(
            hidden_states=torch.from_numpy(hidden),
            timestep=torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(enc),
            encoder_attention_mask=torch.from_numpy(mask),
            pooled_projections=torch.from_numpy(pooled),
            guidance=torch.from_numpy(guidance),
            return_dict=False,
        )[0].numpy()

    with jax.default_device(jax.devices("cpu")[0]):
        got = hunyuan_video_forward(
            params, cfg,
            hidden_states=jnp.asarray(hidden),
            encoder_hidden_states=jnp.asarray(enc),
            pooled_projections=jnp.asarray(pooled),
            timestep=jnp.asarray(t),
            guidance=jnp.asarray(guidance),
            encoder_attention_mask=jnp.asarray(mask),
            remat=False,
        )
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=2e-3)
