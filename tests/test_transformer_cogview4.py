"""Golden parity: CogView4 transformer vs diffusers CogView4Transformer2DModel
(tiny config, fp32 CPU), with and without text attention mask."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.cogview4 import (
    CogView4Config, cogview4_forward, convert_cogview4_state_dict, init_cogview4)


def _torch_model(cfg):
    import torch
    from diffusers import CogView4Transformer2DModel

    torch.manual_seed(0)
    return CogView4Transformer2DModel(
        patch_size=cfg.patch_size, in_channels=cfg.in_channels,
        out_channels=cfg.out_channels, num_layers=cfg.num_layers,
        attention_head_dim=cfg.attention_head_dim,
        num_attention_heads=cfg.num_attention_heads,
        text_embed_dim=cfg.text_embed_dim, time_embed_dim=cfg.time_embed_dim,
        condition_dim=cfg.condition_dim, rope_axes_dim=tuple(cfg.rope_axes_dim),
    ).eval()


@pytest.mark.parametrize("use_mask", [False, True])
def test_cogview4_forward_parity(torch_reference, use_mask, monkeypatch):
    import torch

    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    cfg = CogView4Config.tiny()
    m = _torch_model(cfg)
    params = convert_cogview4_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)

    B, H, W, S_txt = 2, 8, 8, 5
    rng = np.random.default_rng(0)
    hidden = rng.standard_normal((B, cfg.in_channels, H, W)).astype(np.float32)
    enc = rng.standard_normal((B, S_txt, cfg.text_embed_dim)).astype(np.float32)
    t = np.array([125.0, 900.0], np.float32)
    osize = np.array([[64.0, 64.0], [32.0, 48.0]], np.float32)
    tsize = np.array([[64.0, 64.0], [64.0, 64.0]], np.float32)
    crop = np.array([[0.0, 0.0], [4.0, 4.0]], np.float32)
    mask = None
    if use_mask:
        mask = np.ones((B, S_txt), np.float32)
        mask[1, 3:] = 0

    with torch.no_grad():
        ref = m(
            hidden_states=torch.from_numpy(hidden),
            encoder_hidden_states=torch.from_numpy(enc),
            timestep=torch.from_numpy(t),
            original_size=torch.from_numpy(osize),
            target_size=torch.from_numpy(tsize),
            crop_coords=torch.from_numpy(crop),
            attention_mask=torch.from_numpy(mask) if mask is not None else None,
            return_dict=False,
        )[0].numpy()

    with jax.default_device(jax.devices("cpu")[0]):
        got = cogview4_forward(
            params, cfg,
            hidden_states=jnp.asarray(hidden),
            encoder_hidden_states=jnp.asarray(enc),
            timestep=jnp.asarray(t),
            original_size=jnp.asarray(osize),
            target_size=jnp.asarray(tsize),
            crop_coords=jnp.asarray(crop),
            attention_mask=jnp.asarray(mask) if mask is not None else None,
            remat=False,
        )
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=2e-3)


def test_cogview4_init_structure(torch_reference):
    cfg = CogView4Config.tiny()
    m = _torch_model(cfg)
    conv = convert_cogview4_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    init = init_cogview4(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(conv) == jax.tree.structure(init)
    for a, b in zip(jax.tree.leaves(conv), jax.tree.leaves(init)):
        assert a.shape == b.shape
