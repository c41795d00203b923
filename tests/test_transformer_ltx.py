"""Golden parity: LTX-Video transformer vs diffusers LTXVideoTransformer3DModel
(tiny config, fp32 CPU). Covers scalar and per-token timesteps + text mask."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.ltx_video import (
    LTXVideoConfig, convert_ltx_video_state_dict, init_ltx_video,
    ltx_video_forward, pack_ltx_latents)


def _torch_model(cfg):
    import torch
    from diffusers import LTXVideoTransformer3DModel

    torch.manual_seed(0)
    return LTXVideoTransformer3DModel(
        in_channels=cfg.in_channels, out_channels=cfg.out_channels,
        patch_size=cfg.patch_size, patch_size_t=cfg.patch_size_t,
        num_attention_heads=cfg.num_attention_heads,
        attention_head_dim=cfg.attention_head_dim,
        cross_attention_dim=cfg.cross_attention_dim,
        num_layers=cfg.num_layers, caption_channels=cfg.caption_channels,
    ).eval()


@pytest.mark.parametrize("per_token_t", [False, True])
def test_ltx_forward_parity(torch_reference, per_token_t, monkeypatch):
    import torch

    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    cfg = LTXVideoConfig.tiny()
    m = _torch_model(cfg)
    params = convert_ltx_video_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)

    B, F, H, W = 2, 2, 3, 4
    S = F * H * W
    S_txt = 5
    rng = np.random.default_rng(0)
    hidden = rng.standard_normal((B, S, cfg.in_channels)).astype(np.float32)
    enc = rng.standard_normal((B, S_txt, cfg.caption_channels)).astype(np.float32)
    mask = np.ones((B, S_txt), np.float32)
    mask[1, 3:] = 0
    if per_token_t:
        t = (rng.uniform(0, 1, (B, S)) * 1000).astype(np.float32)
    else:
        t = np.array([250.0, 900.0], np.float32)
    scale = (1.0 / 3.2, 32.0, 32.0)

    with torch.no_grad():
        ref = m(
            hidden_states=torch.from_numpy(hidden),
            encoder_hidden_states=torch.from_numpy(enc),
            timestep=torch.from_numpy(t),
            encoder_attention_mask=torch.from_numpy(mask),
            num_frames=F, height=H, width=W,
            rope_interpolation_scale=scale,
            return_dict=False,
        )[0].numpy()

    with jax.default_device(jax.devices("cpu")[0]):
        got = ltx_video_forward(
            params, cfg,
            hidden_states=jnp.asarray(hidden),
            encoder_hidden_states=jnp.asarray(enc),
            timestep=jnp.asarray(t),
            num_frames=F, height=H, width=W,
            rope_interpolation_scale=scale,
            encoder_attention_mask=jnp.asarray(mask),
            remat=False,
        )
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=2e-3)


def test_ltx_pack_matches_reference_layout():
    x = np.arange(2 * 4 * 2 * 2 * 2, dtype=np.float32).reshape(2, 4, 2, 2, 2)
    packed = pack_ltx_latents(jnp.asarray(x), 1, 1)
    assert packed.shape == (2, 8, 4)
    # token (f, h, w) carries the C channels of that voxel
    np.testing.assert_array_equal(np.asarray(packed[0, 0]), x[0, :, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(packed[0, 1]), x[0, :, 0, 0, 1])


def test_ltx_init_structure(torch_reference):
    cfg = LTXVideoConfig.tiny()
    m = _torch_model(cfg)
    conv = convert_ltx_video_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    init = init_ltx_video(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(conv) == jax.tree.structure(init)
    for a, b in zip(jax.tree.leaves(conv), jax.tree.leaves(init)):
        assert a.shape == b.shape
