"""Golden parity: Flux transformer vs diffusers FluxTransformer2DModel
(tiny config, fp32 CPU). Covers guidance-embeds on/off and pack/unpack."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.flux import (
    FluxConfig, convert_flux_state_dict, flux_forward, init_flux,
    pack_latents, prepare_latent_image_ids, unpack_latents,
)


def _torch_model(cfg, torch_reference):
    import torch
    from diffusers import FluxTransformer2DModel

    torch.manual_seed(0)
    m = FluxTransformer2DModel(
        patch_size=cfg.patch_size, in_channels=cfg.in_channels,
        num_layers=cfg.num_layers, num_single_layers=cfg.num_single_layers,
        attention_head_dim=cfg.attention_head_dim,
        num_attention_heads=cfg.num_attention_heads,
        joint_attention_dim=cfg.joint_attention_dim,
        pooled_projection_dim=cfg.pooled_projection_dim,
        guidance_embeds=cfg.guidance_embeds,
        axes_dims_rope=tuple(cfg.axes_dims_rope),
    ).eval()
    return m


@pytest.mark.parametrize("guidance_embeds", [True, False])
def test_flux_forward_parity(torch_reference, guidance_embeds, monkeypatch):
    import torch

    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    cfg = FluxConfig.tiny(guidance_embeds=guidance_embeds)
    m = _torch_model(cfg, torch_reference)
    params = convert_flux_state_dict(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)

    B, S_txt = 2, 6
    H2, W2 = 4, 4  # packed grid
    rng = np.random.default_rng(0)
    hidden = rng.standard_normal((B, H2 * W2, cfg.in_channels)).astype(np.float32)
    enc = rng.standard_normal((B, S_txt, cfg.joint_attention_dim)).astype(np.float32)
    pooled = rng.standard_normal((B, cfg.pooled_projection_dim)).astype(np.float32)
    t = np.array([0.25, 0.9], np.float32)
    img_ids = prepare_latent_image_ids(H2, W2)
    txt_ids = np.zeros((S_txt, 3), np.float32)
    guidance = np.array([1.0, 1.0], np.float32) if guidance_embeds else None

    with torch.no_grad():
        ref = m(
            hidden_states=torch.from_numpy(hidden),
            encoder_hidden_states=torch.from_numpy(enc),
            pooled_projections=torch.from_numpy(pooled),
            timestep=torch.from_numpy(t),
            img_ids=torch.from_numpy(img_ids),
            txt_ids=torch.from_numpy(txt_ids),
            guidance=torch.from_numpy(guidance) if guidance is not None else None,
            return_dict=False,
        )[0].numpy()

    with jax.default_device(jax.devices("cpu")[0]):
        got = flux_forward(
            params, cfg,
            hidden_states=jnp.asarray(hidden),
            encoder_hidden_states=jnp.asarray(enc),
            pooled_projections=jnp.asarray(pooled),
            timestep=jnp.asarray(t),
            img_ids=img_ids, txt_ids=txt_ids,
            guidance=jnp.asarray(guidance) if guidance is not None else None,
            remat=False,
        )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_pack_unpack_roundtrip():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4, 8, 6)).astype(np.float32))
    packed = pack_latents(x)
    assert packed.shape == (2, 4 * 3, 16)
    np.testing.assert_array_equal(np.asarray(unpack_latents(packed, 8, 6)), np.asarray(x))


def test_flux_init_matches_converted_structure(torch_reference):
    cfg = FluxConfig.tiny()
    m = _torch_model(cfg, torch_reference)
    conv = convert_flux_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    init = init_flux(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(conv) == jax.tree.structure(init)
    for a, b in zip(jax.tree.leaves(conv), jax.tree.leaves(init)):
        assert a.shape == b.shape, (a.shape, b.shape)
