"""ControlTrainer: frame conditioning, LoRA+injection step, e2e loops
(reference finetrainers/trainer/control_trainer/ + control specifications)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.data.video import export_to_video
from vap_tpu.models.wan import (
    WanMOTConfig,
    expand_patch_embedding,
    init_wan,
)
from vap_tpu.training.args import TrainingArgs
from vap_tpu.training.control_trainer import (
    ControlTrainer,
    WanControlTrainStepConfig,
    apply_frame_conditioning_on_latents,
    control_in_channels,
    make_control_step,
    wan_control_loss,
)
from vap_tpu.training.optimizer import get_lr_schedule, get_optimizer


def _tiny_t2v(in_channels=4, **kw):
    return WanMOTConfig.tiny(
        in_channels=in_channels, out_channels=4, block_idx_with_mot_ref=(),
        image_dim=None, added_kv_proj_dim=None, **kw)


# ---------------------------------------------------------------------------
# frame conditioning (reference control_trainer/data.py:213-279)
# ---------------------------------------------------------------------------

def test_frame_conditioning_index_first_last_full():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((2, 5, 2, 2, 3))
    out = apply_frame_conditioning_on_latents(x, key, "index", 2)
    np.testing.assert_array_equal(np.asarray(out[:, 2]), 1.0)
    assert float(jnp.abs(out[:, [0, 1, 3, 4]]).max()) == 0.0

    out = apply_frame_conditioning_on_latents(x, key, "index", 99)  # clamped
    np.testing.assert_array_equal(np.asarray(out[:, 4]), 1.0)

    out = apply_frame_conditioning_on_latents(x, key, "first_and_last")
    np.testing.assert_array_equal(np.asarray(out[:, [0, 4]]), 1.0)
    assert float(jnp.abs(out[:, 1:4]).max()) == 0.0

    out = apply_frame_conditioning_on_latents(x, key, "full")
    np.testing.assert_array_equal(np.asarray(out), 1.0)


def test_frame_conditioning_prefix_random():
    x = jnp.ones((4, 6, 1, 1, 2))
    for seed in range(5):
        out = np.asarray(apply_frame_conditioning_on_latents(
            x, jax.random.PRNGKey(seed), "prefix"))
        kept = (np.abs(out).max(axis=(2, 3, 4)) > 0)  # [B, F]
        for row in kept:
            n = row.sum()
            assert 1 <= n <= 6
            assert row[:n].all() and not row[n:].any()  # contiguous prefix

        out = np.asarray(apply_frame_conditioning_on_latents(
            x, jax.random.PRNGKey(seed + 100), "random"))
        kept = (np.abs(out).max(axis=(2, 3, 4)) > 0)
        assert ((kept.sum(axis=1) >= 1) & (kept.sum(axis=1) <= 6)).all()


def test_frame_conditioning_mask_channel():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, 2, 3))
    out = apply_frame_conditioning_on_latents(
        x, jax.random.PRNGKey(1), "first_and_last", concatenate_mask=True)
    assert out.shape == (1, 4, 2, 2, 4)
    mask = np.asarray(out[..., -1])
    np.testing.assert_array_equal(mask[:, [0, 3]], 1.0)
    np.testing.assert_array_equal(mask[:, [1, 2]], 0.0)
    assert control_in_channels(16, True) == 33
    assert control_in_channels(16, False) == 32


# ---------------------------------------------------------------------------
# step: LoRA + injection training
# ---------------------------------------------------------------------------

def test_wan_control_step_updates_only_adapters():
    base_cfg = _tiny_t2v()
    widened = control_in_channels(base_cfg.in_channels)
    cfg = WanControlTrainStepConfig(
        model=_tiny_t2v(in_channels=widened), remat=False,
        frame_conditioning_type="prefix")
    params = init_wan(jax.random.PRNGKey(0), base_cfg)
    params = expand_patch_embedding(params, base_cfg, base_cfg.in_channels)
    tx = get_optimizer("adamw", get_lr_schedule("constant", 1e-3))
    init_fn, _, _, step_fn = make_control_step(
        wan_control_loss, cfg, tx, family="wan", lora_rank=2, lora_alpha=2.0)
    train_p, frozen_p, opt_state = init_fn(params, jax.random.PRNGKey(1))
    step = jax.jit(step_fn)

    B, F, H, W, C = 1, 2, 4, 4, base_cfg.in_channels
    k = jax.random.PRNGKey(2)
    batch = {
        "latents": jax.random.normal(k, (B, F, H, W, C)),
        "control_latents": jax.random.normal(jax.random.fold_in(k, 1), (B, F, H, W, C)),
        "encoder_hidden_states": jax.random.normal(
            jax.random.fold_in(k, 2), (B, base_cfg.text_len, base_cfg.text_dim)),
    }
    losses = []
    p0 = jax.tree.map(lambda x: x, train_p)
    for i in range(5):
        train_p, opt_state, metrics = step(
            train_p, frozen_p, opt_state, batch, jax.random.PRNGKey(7))
        losses.append(float(metrics["loss"]))
    assert min(losses[1:]) < losses[0], losses
    # injection kernel trained; LoRA factors moved
    d0 = np.asarray(p0["direct"]["patch_embedding"]["kernel"])
    d1 = np.asarray(train_p["direct"]["patch_embedding"]["kernel"])
    assert np.abs(d1 - d0).max() > 0
    # frozen base untouched by construction (never updated); spot-check bias
    np.testing.assert_array_equal(
        np.asarray(frozen_p["patch_embedding"]["bias"]),
        np.asarray(params["patch_embedding"]["bias"]))


def test_wan_control_direct_partition_receives_gradient():
    """Regression (advisor r2, high): init_fn returned the FULL param tree as
    frozen, so merge_params resolved every leaf to the frozen copy — the
    widened patch_embedding partition got zero gradient and control
    conditioning was silently inert. The frozen tree must be the complement
    (None at direct positions) and the injection kernel's gradient nonzero."""
    base_cfg = _tiny_t2v()
    widened = control_in_channels(base_cfg.in_channels)
    cfg = WanControlTrainStepConfig(
        model=_tiny_t2v(in_channels=widened), remat=False,
        frame_conditioning_type="prefix")
    params = init_wan(jax.random.PRNGKey(0), base_cfg)
    params = expand_patch_embedding(params, base_cfg, base_cfg.in_channels)
    tx = get_optimizer("adamw", get_lr_schedule("constant", 1e-3))
    init_fn, grad_fn, _, _ = make_control_step(
        wan_control_loss, cfg, tx, family="wan", lora_rank=2, lora_alpha=2.0)
    train_p, frozen_p, _ = init_fn(params, jax.random.PRNGKey(1))

    # frozen must be the complement: None exactly where the direct partition
    # holds a leaf, so merge_params takes the TRAINED copy
    assert frozen_p["patch_embedding"]["kernel"] is None
    assert frozen_p["patch_embedding"]["bias"] is not None

    B, F, H, W, C = 1, 2, 4, 4, base_cfg.in_channels
    k = jax.random.PRNGKey(2)
    batch = {
        "latents": jax.random.normal(k, (B, F, H, W, C)),
        "control_latents": jax.random.normal(jax.random.fold_in(k, 1), (B, F, H, W, C)),
        "encoder_hidden_states": jax.random.normal(
            jax.random.fold_in(k, 2), (B, base_cfg.text_len, base_cfg.text_dim)),
    }
    grads, _ = jax.jit(grad_fn)(train_p, frozen_p, batch, jax.random.PRNGKey(7))
    g = np.asarray(grads["direct"]["patch_embedding"]["kernel"])
    assert np.abs(g).max() > 0, "zero gradient through the injection kernel"

    # the widened control-input rows specifically must receive gradient: they
    # are zero-initialized, so a shadowed merge leaves control inert forever.
    # kernel layout: flattened (C, pt, ph, pw) rows, original channels first.
    pt, ph, pw = base_cfg.patch_size
    g_ctrl = g[base_cfg.in_channels * pt * ph * pw:]
    assert np.abs(g_ctrl).max() > 0


def test_wan_control_full_finetune_step():
    base_cfg = _tiny_t2v()
    widened = control_in_channels(base_cfg.in_channels)
    cfg = WanControlTrainStepConfig(model=_tiny_t2v(in_channels=widened), remat=False)
    params = expand_patch_embedding(
        init_wan(jax.random.PRNGKey(0), base_cfg), base_cfg, base_cfg.in_channels)
    tx = get_optimizer("adamw", get_lr_schedule("constant", 1e-3))
    init_fn, _, _, step_fn = make_control_step(
        wan_control_loss, cfg, tx, family="wan", full_finetune=True)
    train_p, frozen_p, opt_state = init_fn(params, jax.random.PRNGKey(1))
    step = jax.jit(step_fn)
    k = jax.random.PRNGKey(2)
    batch = {
        "latents": jax.random.normal(k, (1, 2, 4, 4, 4)),
        "control_latents": jax.random.normal(jax.random.fold_in(k, 1), (1, 2, 4, 4, 4)),
        "encoder_hidden_states": jax.random.normal(
            jax.random.fold_in(k, 2), (1, base_cfg.text_len, base_cfg.text_dim)),
    }
    losses = []
    for i in range(4):
        train_p, opt_state, metrics = step(
            train_p, frozen_p, opt_state, batch, jax.random.PRNGKey(7))
        losses.append(float(metrics["loss"]))
    assert min(losses[1:]) < losses[0], losses


# ---------------------------------------------------------------------------
# e2e trainer loops
# ---------------------------------------------------------------------------

class FakeTokenizer:
    def __call__(self, texts, padding=None, max_length=8, truncation=True,
                 add_special_tokens=True, return_tensors="np"):
        ids = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t[:max_length]):
                ids[i, j] = (ord(ch) * 3 + j) % 30 + 1
        return {"input_ids": ids, "attention_mask": (ids > 0).astype(np.int32)}


def _video_dataset(tmp_path, n=2):
    for i in range(n):
        fr = (np.random.default_rng(i).uniform(0, 1, (9, 32, 32, 3)) * 255).astype(np.uint8)
        export_to_video(fr, str(tmp_path / f"v{i}.mp4"), fps=16)
        (tmp_path / f"v{i}.txt").write_text(f"a video {i}")
    return tmp_path


def _wan_vae_params(cfg):
    import sys
    sys.path.insert(0, "/root/reference/diffusers/src")
    import torch
    from diffusers.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan
    from vap_tpu.models.wan.vae_weights import convert_wan_vae_state_dict

    torch.manual_seed(0)
    m = AutoencoderKLWan(base_dim=cfg.base_dim, z_dim=cfg.z_dim, dim_mult=list(cfg.dim_mult),
                         num_res_blocks=cfg.num_res_blocks,
                         latents_mean=list(cfg.latents_mean), latents_std=list(cfg.latents_std))
    return convert_wan_vae_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)


@pytest.mark.slow
def test_wan_control_trainer_e2e(tmp_path, monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    import dataclasses

    from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
    from vap_tpu.models.wan.vae import WanVAEConfig
    from vap_tpu.training.control_specs import WanControlSpec

    root = _video_dataset(tmp_path)
    vae_cfg = WanVAEConfig.tiny()
    base_cfg = _tiny_t2v(in_channels=vae_cfg.z_dim, text_len=8)
    t_cfg = dataclasses.replace(
        base_cfg, in_channels=control_in_channels(vae_cfg.z_dim, True))
    txt_cfg = T5Config.tiny(d_model=base_cfg.text_dim, per_layer_relative_bias=True)
    key = jax.random.PRNGKey(0)
    with jax.default_device(jax.devices("cpu")[0]):
        params = {
            "transformer": expand_patch_embedding(
                init_wan(key, base_cfg), base_cfg,
                t_cfg.in_channels - base_cfg.in_channels),
            "vae": _wan_vae_params(vae_cfg),
            "text_encoder": init_t5_encoder(jax.random.fold_in(key, 1), txt_cfg, jnp.float32),
        }
        spec = WanControlSpec(t_cfg, vae_cfg, txt_cfg, params, FakeTokenizer(),
                              None, jnp.float32)
        spec.prepare_conditions = (
            lambda s, _o=spec.prepare_conditions: _o(s, max_length=8))
        args = TrainingArgs(
            model_name="wan", training_type="control_lora", control_type="canny",
            frame_conditioning_type="first_and_last",
            frame_conditioning_concatenate_mask=True,
            data_root=str(root), train_steps=2, batch_size=1, logging_steps=1,
            checkpointing_steps=100, output_dir=str(tmp_path / "out"), lr=1e-4,
            gradient_checkpointing=False, rank=2, lora_alpha=2,
            video_resolution_buckets=((9, 32, 32),),
        )
        trainer = ControlTrainer(args, spec)
        state = trainer.run()
        assert state.step == 2
        out = trainer.export()
        assert os.path.exists(out)
        assert os.path.exists(os.path.join(
            os.path.dirname(out), "control_injection_layers.safetensors"))


@pytest.mark.slow
def test_cogview4_control_trainer_e2e(tmp_path, monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    import cv2

    from vap_tpu.models.autoencoder_kl import AutoencoderKLConfig, init_autoencoder_kl
    from vap_tpu.models.cogview4 import CogView4Config, init_cogview4
    from vap_tpu.models.text_encoders.glm import GlmConfig, init_glm
    from vap_tpu.training.control_specs import CogView4ControlSpec

    for i in range(2):
        img = (np.random.default_rng(i).uniform(0, 255, (32, 32, 3))).astype(np.uint8)
        cv2.imwrite(str(tmp_path / f"s{i}.png"), img)
        (tmp_path / f"s{i}.txt").write_text(f"an image {i}")

    with jax.default_device(jax.devices("cpu")[0]):
        vae_cfg = AutoencoderKLConfig.tiny(use_quant_conv=True, use_post_quant_conv=True,
                                           shift_factor=None, scaling_factor=0.5)
        base_in = vae_cfg.latent_channels
        mcfg = CogView4Config.tiny(in_channels=2 * base_in, out_channels=base_in)
        glm_cfg = GlmConfig.tiny(hidden_size=mcfg.text_embed_dim)
        key = jax.random.PRNGKey(0)
        # widen by hand: zero rows for the control half of patch_embed.proj
        base_params = init_cogview4(key, CogView4Config.tiny(
            in_channels=base_in, out_channels=base_in), jnp.float32)
        proj = base_params["patch_embed"]["proj"]
        kern = jnp.concatenate(
            [proj["kernel"], jnp.zeros_like(proj["kernel"])], axis=0)
        base_params["patch_embed"] = dict(
            base_params["patch_embed"], proj=dict(proj, kernel=kern))
        params = {
            "transformer": base_params,
            "vae": init_autoencoder_kl(jax.random.fold_in(key, 1), vae_cfg, jnp.float32),
            "text_encoder": init_glm(jax.random.fold_in(key, 2), glm_cfg, jnp.float32),
        }
        spec = CogView4ControlSpec(mcfg, vae_cfg, glm_cfg, params, FakeTokenizer(), jnp.float32)
        spec.prepare_conditions = (
            lambda s, _o=spec.prepare_conditions: _o(s, max_length=8))
        args = TrainingArgs(
            model_name="cogview4", training_type="control_lora", control_type="canny",
            data_root=str(tmp_path), train_steps=2, batch_size=1, logging_steps=1,
            checkpointing_steps=100, output_dir=str(tmp_path / "out"), lr=1e-4,
            gradient_checkpointing=False, rank=2, lora_alpha=2,
            image_resolution_buckets=((32, 32),),
        )
        trainer = ControlTrainer(args, spec)
        state = trainer.run()
        assert state.step == 2
