"""Golden-value parity: JAX CogVideoX MOT transformer vs reference torch model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.cogvideox import (
    CogVideoXMOTConfig,
    cogvideox_mot_forward,
    convert_cogvideox_mot_state_dict,
)
from vap_tpu.models.cogvideox.weights import torch_state_dict_to_numpy
from vap_tpu.ops.attention import attention_provider
from vap_tpu.ops.rope import prepare_cogvideox_rotary_embeddings


def _make_reference(torch, cfg: CogVideoXMOTConfig, **kw):
    from diffusers.models.transformers.cogvideox_transformer_3d_mot import (
        CogVideoXTransformer3DMOTModel,
    )

    torch.manual_seed(0)
    return CogVideoXTransformer3DMOTModel(
        num_attention_heads=cfg.num_attention_heads,
        attention_head_dim=cfg.attention_head_dim,
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        time_embed_dim=cfg.time_embed_dim,
        text_embed_dim=cfg.text_embed_dim,
        num_layers=cfg.num_layers,
        sample_width=cfg.sample_width,
        sample_height=cfg.sample_height,
        sample_frames=cfg.sample_frames,
        patch_size=cfg.patch_size,
        patch_size_t=cfg.patch_size_t,
        max_text_seq_length=cfg.max_text_seq_length,
        use_rotary_positional_embeddings=True,
        block_idx_with_mot_ref=list(cfg.block_idx_with_mot_ref),
        supported_effect_types=list(cfg.supported_effect_types) or None,
        num_ref_embeddings=cfg.num_ref_embeddings,
        reference_train_mode=cfg.reference_train_mode,
        **kw,
    ).eval()


def _rope_tables(cfg, H, W, F_lat, mot_num=0):
    return prepare_cogvideox_rotary_embeddings(
        H, W, F_lat,
        attention_head_dim=cfg.attention_head_dim,
        patch_size=cfg.patch_size,
        patch_size_t=cfg.patch_size_t,
        sample_width=cfg.sample_width,
        sample_height=cfg.sample_height,
        mot_num=mot_num,
    )


@pytest.mark.parametrize("num_ref,mot_blocks,ref_mode", [
    (1, (0, 1), None),
    (2, (0, 1), None),
    (1, (0,), None),          # heterogeneous: block 1 without MoT
    (1, (0, 1), "reference_independent"),
])
def test_forward_parity(torch_reference, num_ref, mot_blocks, ref_mode):
    torch = torch_reference
    cfg = CogVideoXMOTConfig.tiny(
        block_idx_with_mot_ref=mot_blocks,
        reference_train_mode=ref_mode,
        num_ref_embeddings=3,
        supported_effect_types=("fx_a", "fx_b"),
    )
    model = _make_reference(torch, cfg)

    B, F_lat, C, H_lat, W_lat = 1, 2, cfg.in_channels, 8, 8
    T = cfg.max_text_seq_length
    rng = np.random.default_rng(0)
    hs = rng.standard_normal((B, F_lat, C, H_lat, W_lat), np.float32)
    ehs = rng.standard_normal((B, T, cfg.text_embed_dim), np.float32)
    hs_ref = rng.standard_normal((B, num_ref * F_lat, C, H_lat, W_lat), np.float32)
    ehs_ref = rng.standard_normal((B, num_ref * T, cfg.text_embed_dim), np.float32)
    t = np.array([500.0], np.float32)

    H_px = H_lat * 8
    W_px = W_lat * 8
    rope = _rope_tables(cfg, H_px, W_px, F_lat)
    rope_ref = _rope_tables(cfg, H_px, W_px, F_lat, mot_num=num_ref)
    effect_types = ["fx_b"] * num_ref

    with torch.no_grad():
        ref_out = model(
            hidden_states=torch.from_numpy(hs),
            encoder_hidden_states=torch.from_numpy(ehs),
            timestep=torch.from_numpy(t),
            image_rotary_emb=tuple(torch.from_numpy(np.asarray(x)) for x in rope),
            return_dict=False,
            num_mot_ref=num_ref,
            hidden_states_mot_ref=torch.from_numpy(hs_ref),
            encoder_hidden_states_mot_ref=torch.from_numpy(ehs_ref),
            image_rotary_emb_mot_ref=tuple(torch.from_numpy(np.asarray(x)) for x in rope_ref),
            effect_types=effect_types,
        )

    params = convert_cogvideox_mot_state_dict(torch_state_dict_to_numpy(model), cfg)
    # exact-f32 parity on the CPU backend (TPU f32 matmuls are reduced-precision)
    with jax.default_device(jax.devices("cpu")[0]), attention_provider("xla"):
        got, got_ref = cogvideox_mot_forward(
            params, cfg,
            hidden_states=jnp.asarray(hs),
            encoder_hidden_states=jnp.asarray(ehs),
            timestep=jnp.asarray(t),
            image_rotary_emb=rope,
            hidden_states_mot_ref=jnp.asarray(hs_ref),
            encoder_hidden_states_mot_ref=jnp.asarray(ehs_ref),
            image_rotary_emb_mot_ref=rope_ref,
            num_mot_ref=num_ref,
            effect_ids=jnp.asarray([1] * num_ref),
        )

    np.testing.assert_allclose(np.asarray(got), ref_out[0].numpy(), atol=2e-4, rtol=2e-3)
    if ref_mode == "reference_independent":
        np.testing.assert_allclose(np.asarray(got_ref), ref_out[1].numpy(), atol=2e-4, rtol=2e-3)
    else:
        assert got_ref is None


def test_per_ref_timesteps_parity(torch_reference):
    """random_refer_noise mode: distinct per-reference timesteps."""
    torch = torch_reference
    cfg = CogVideoXMOTConfig.tiny(block_idx_with_mot_ref=(0, 1))
    model = _make_reference(torch, cfg)

    num_ref = 2
    B, F_lat, C, H_lat, W_lat = 1, 2, cfg.in_channels, 8, 8
    T = cfg.max_text_seq_length
    rng = np.random.default_rng(1)
    hs = rng.standard_normal((B, F_lat, C, H_lat, W_lat), np.float32)
    ehs = rng.standard_normal((B, T, cfg.text_embed_dim), np.float32)
    hs_ref = rng.standard_normal((B, num_ref * F_lat, C, H_lat, W_lat), np.float32)
    ehs_ref = rng.standard_normal((B, num_ref * T, cfg.text_embed_dim), np.float32)
    t = np.array([400.0], np.float32)
    t_refs = [np.array([3.0], np.float32), np.array([17.0], np.float32)]

    rope = _rope_tables(cfg, H_lat * 8, W_lat * 8, F_lat)
    rope_ref = _rope_tables(cfg, H_lat * 8, W_lat * 8, F_lat, mot_num=num_ref)

    with torch.no_grad():
        ref_out = model(
            hidden_states=torch.from_numpy(hs),
            encoder_hidden_states=torch.from_numpy(ehs),
            timestep=torch.from_numpy(t),
            image_rotary_emb=tuple(torch.from_numpy(np.asarray(x)) for x in rope),
            return_dict=False,
            num_mot_ref=num_ref,
            hidden_states_mot_ref=torch.from_numpy(hs_ref),
            encoder_hidden_states_mot_ref=torch.from_numpy(ehs_ref),
            image_rotary_emb_mot_ref=tuple(torch.from_numpy(np.asarray(x)) for x in rope_ref),
            timestep_list_mot_ref=[torch.from_numpy(x) for x in t_refs],
        )

    params = convert_cogvideox_mot_state_dict(torch_state_dict_to_numpy(model), cfg)
    with jax.default_device(jax.devices("cpu")[0]), attention_provider("xla"):
        got, _ = cogvideox_mot_forward(
            params, cfg,
            hidden_states=jnp.asarray(hs),
            encoder_hidden_states=jnp.asarray(ehs),
            timestep=jnp.asarray(t),
            image_rotary_emb=rope,
            hidden_states_mot_ref=jnp.asarray(hs_ref),
            encoder_hidden_states_mot_ref=jnp.asarray(ehs_ref),
            image_rotary_emb_mot_ref=rope_ref,
            num_mot_ref=num_ref,
            timestep_mot_ref=jnp.asarray(np.stack(t_refs, axis=1)),
        )
    np.testing.assert_allclose(np.asarray(got), ref_out[0].numpy(), atol=2e-4, rtol=2e-3)


def test_jit_and_remat(monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    cfg = CogVideoXMOTConfig.tiny()
    from vap_tpu.models.cogvideox import init_cogvideox_mot

    params = init_cogvideox_mot(jax.random.PRNGKey(0), cfg)
    B, F_lat, C, H_lat, W_lat = 1, 2, cfg.in_channels, 8, 8
    T = cfg.max_text_seq_length
    rope = _rope_tables(cfg, H_lat * 8, W_lat * 8, F_lat)
    rope_ref = _rope_tables(cfg, H_lat * 8, W_lat * 8, F_lat, mot_num=1)

    import functools

    @functools.partial(jax.jit, static_argnames=("remat",))
    def fwd(params, hs, ehs, hs_ref, ehs_ref, t, remat=False):
        return cogvideox_mot_forward(
            params, cfg, hidden_states=hs, encoder_hidden_states=ehs,
            timestep=t, image_rotary_emb=rope,
            hidden_states_mot_ref=hs_ref, encoder_hidden_states_mot_ref=ehs_ref,
            image_rotary_emb_mot_ref=rope_ref, num_mot_ref=1, remat=remat,
        )[0]

    k = jax.random.PRNGKey(1)
    hs = jax.random.normal(k, (B, F_lat, C, H_lat, W_lat))
    ehs = jax.random.normal(k, (B, T, cfg.text_embed_dim))
    hs_ref = jax.random.normal(k, (B, F_lat, C, H_lat, W_lat))
    ehs_ref = jax.random.normal(k, (B, T, cfg.text_embed_dim))
    t = jnp.array([10.0])
    out = fwd(params, hs, ehs, hs_ref, ehs_ref, t)
    out_remat = fwd(params, hs, ehs, hs_ref, ehs_ref, t, remat=True)
    assert out.shape == (B, F_lat, cfg.out_channels, H_lat, W_lat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_remat), atol=1e-5)


@pytest.mark.parametrize("mode", ["ablation_single_encoder", "ablation_residual_addition"])
def test_ablation_modes_parity(torch_reference, mode):
    torch = torch_reference
    cfg = CogVideoXMOTConfig.tiny(block_idx_with_mot_ref=(0, 1), **{mode: True})
    model = _make_reference(
        torch, cfg,
        ablation_single_encoder=cfg.ablation_single_encoder,
        ablation_residual_addition=cfg.ablation_residual_addition,
    )

    B, F_lat, C, H_lat, W_lat = 1, 2, cfg.in_channels, 8, 8
    T = cfg.max_text_seq_length
    rng = np.random.default_rng(5)
    hs = rng.standard_normal((B, F_lat, C, H_lat, W_lat), np.float32)
    ehs = rng.standard_normal((B, T, cfg.text_embed_dim), np.float32)
    hs_ref = rng.standard_normal((B, F_lat, C, H_lat, W_lat), np.float32)
    ehs_ref = rng.standard_normal((B, T, cfg.text_embed_dim), np.float32)
    t = np.array([300.0], np.float32)

    rope = _rope_tables(cfg, H_lat * 8, W_lat * 8, F_lat)
    rope_ref = _rope_tables(cfg, H_lat * 8, W_lat * 8, F_lat, mot_num=1)

    with torch.no_grad():
        ref_out = model(
            hidden_states=torch.from_numpy(hs),
            encoder_hidden_states=torch.from_numpy(ehs),
            timestep=torch.from_numpy(t),
            image_rotary_emb=tuple(torch.from_numpy(np.asarray(x)) for x in rope),
            return_dict=False,
            num_mot_ref=1,
            hidden_states_mot_ref=torch.from_numpy(hs_ref),
            encoder_hidden_states_mot_ref=torch.from_numpy(ehs_ref),
            image_rotary_emb_mot_ref=tuple(torch.from_numpy(np.asarray(x)) for x in rope_ref),
        )[0].numpy()

    params = convert_cogvideox_mot_state_dict(torch_state_dict_to_numpy(model), cfg)
    with jax.default_device(jax.devices("cpu")[0]), attention_provider("xla"):
        got, _ = cogvideox_mot_forward(
            params, cfg,
            hidden_states=jnp.asarray(hs),
            encoder_hidden_states=jnp.asarray(ehs),
            timestep=jnp.asarray(t),
            image_rotary_emb=rope,
            hidden_states_mot_ref=jnp.asarray(hs_ref),
            encoder_hidden_states_mot_ref=jnp.asarray(ehs_ref),
            image_rotary_emb_mot_ref=rope_ref,
            num_mot_ref=1,
        )
    np.testing.assert_allclose(np.asarray(got), ref_out, atol=3e-4, rtol=3e-3)


@pytest.mark.parametrize("f_lat", [3, 2])  # 3 = checkpoint buffer path; 2 = on-the-fly sincos
def test_learned_pos_embedding_parity(torch_reference, f_lat):
    """use_learned_positional_embeddings (the released CogVideoX-5b-I2V base
    carries a trained joint pos buffer on top of RoPE): buffer consumed by the
    converter and added in _patchify; at a non-default frame count both
    implementations swap in fresh sincos (CogVideoXPatchEmbed.forward:734-755)."""
    torch = torch_reference
    cfg = CogVideoXMOTConfig.tiny(
        block_idx_with_mot_ref=(0, 1), use_learned_positional_embeddings=True)
    model = _make_reference(torch, cfg, use_learned_positional_embeddings=True)
    # the persistent buffer initializes to sincos; perturb it so the test
    # catches a converter that drops the trained values
    with torch.no_grad():
        model.patch_embed.pos_embedding.add_(
            torch.randn_like(model.patch_embed.pos_embedding) * 0.05)
        model.patch_embed_mot_ref.pos_embedding.add_(
            torch.randn_like(model.patch_embed_mot_ref.pos_embedding) * 0.05)

    B, C, H_lat, W_lat = 1, cfg.in_channels, 8, 8
    T = cfg.max_text_seq_length
    rng = np.random.default_rng(7)
    hs = rng.standard_normal((B, f_lat, C, H_lat, W_lat), np.float32)
    ehs = rng.standard_normal((B, T, cfg.text_embed_dim), np.float32)
    hs_ref = rng.standard_normal((B, f_lat, C, H_lat, W_lat), np.float32)
    ehs_ref = rng.standard_normal((B, T, cfg.text_embed_dim), np.float32)
    t = np.array([250.0], np.float32)

    rope = _rope_tables(cfg, H_lat * 8, W_lat * 8, f_lat)
    rope_ref = _rope_tables(cfg, H_lat * 8, W_lat * 8, f_lat, mot_num=1)

    with torch.no_grad():
        ref_out = model(
            hidden_states=torch.from_numpy(hs),
            encoder_hidden_states=torch.from_numpy(ehs),
            timestep=torch.from_numpy(t),
            image_rotary_emb=tuple(torch.from_numpy(np.asarray(x)) for x in rope),
            return_dict=False,
            num_mot_ref=1,
            hidden_states_mot_ref=torch.from_numpy(hs_ref),
            encoder_hidden_states_mot_ref=torch.from_numpy(ehs_ref),
            image_rotary_emb_mot_ref=tuple(torch.from_numpy(np.asarray(x)) for x in rope_ref),
        )[0].numpy()

    sd = torch_state_dict_to_numpy(model)
    assert "patch_embed.pos_embedding" in sd  # buffer present in checkpoints
    params = convert_cogvideox_mot_state_dict(sd, cfg)
    assert "pos_embedding" in params["patch_embed"]
    with jax.default_device(jax.devices("cpu")[0]), attention_provider("xla"):
        got, _ = cogvideox_mot_forward(
            params, cfg,
            hidden_states=jnp.asarray(hs),
            encoder_hidden_states=jnp.asarray(ehs),
            timestep=jnp.asarray(t),
            image_rotary_emb=rope,
            hidden_states_mot_ref=jnp.asarray(hs_ref),
            encoder_hidden_states_mot_ref=jnp.asarray(ehs_ref),
            image_rotary_emb_mot_ref=rope_ref,
            num_mot_ref=1,
        )
    np.testing.assert_allclose(np.asarray(got), ref_out, atol=2e-4, rtol=2e-3)
