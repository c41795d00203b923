"""Flux flow-matching SFT step + spec preprocessing (tiny configs, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.autoencoder_kl import AutoencoderKLConfig, init_autoencoder_kl
from vap_tpu.models.flux import FluxConfig, init_flux
from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
from vap_tpu.models.text_encoders.clip_text import CLIPTextConfig, init_clip_text
from vap_tpu.training import get_lr_schedule, get_optimizer
from vap_tpu.training.specs import FluxSpec, get_model_spec_cls
from vap_tpu.training.train_step import FluxTrainStepConfig, make_flux_train_step


class FakeTokenizer:
    def __call__(self, texts, padding=None, max_length=16, truncation=True,
                 add_special_tokens=True, return_tensors="np"):
        ids = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t[:max_length]):
                ids[i, j] = (ord(ch) * 7 + j) % 50 + 1
        return {"input_ids": ids, "attention_mask": (ids > 0).astype(np.int32)}


def test_flux_train_step_runs_and_learns(monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    mcfg = FluxConfig.tiny()
    cfg = FluxTrainStepConfig(model=mcfg, remat=False)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_flux(jax.random.PRNGKey(0), mcfg)
        tx = get_optimizer("adamw", get_lr_schedule("constant", 1e-3))
        init_fn, step_fn = make_flux_train_step(cfg, tx)
        train_p, frozen_p, opt_state = init_fn(params)
        step = jax.jit(step_fn)

        B, h, w = 2, 4, 4
        k = jax.random.PRNGKey(1)
        batch = {
            "latents": jax.random.normal(k, (B, h, w, mcfg.in_channels // 4)),
            "encoder_hidden_states": jax.random.normal(k, (B, 6, mcfg.joint_attention_dim)),
            "pooled_projections": jax.random.normal(k, (B, mcfg.pooled_projection_dim)),
        }
        losses = []
        for _ in range(6):
            train_p, opt_state, metrics = step(train_p, frozen_p, opt_state, batch,
                                               jax.random.PRNGKey(7))
            losses.append(float(metrics["loss"]))
        assert min(losses[1:]) < losses[0], losses
        assert all(np.isfinite(l) for l in losses)


def test_flux_spec_preprocessing(monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    vae_cfg = AutoencoderKLConfig.tiny()
    t_cfg = FluxConfig.tiny(joint_attention_dim=24)
    txt_cfg = T5Config.tiny(d_model=t_cfg.joint_attention_dim)
    clip_cfg = CLIPTextConfig.tiny(hidden_size=t_cfg.pooled_projection_dim,
                                   num_attention_heads=4, vocab_size=64)
    key = jax.random.PRNGKey(0)
    with jax.default_device(jax.devices("cpu")[0]):
        params = {
            "transformer": init_flux(key, t_cfg, jnp.float32),
            "vae": init_autoencoder_kl(jax.random.fold_in(key, 1), vae_cfg, jnp.float32),
            "text_encoder": init_clip_text(jax.random.fold_in(key, 2), clip_cfg, jnp.float32),
            "text_encoder_2": init_t5_encoder(jax.random.fold_in(key, 3), txt_cfg, jnp.float32),
        }
        spec = FluxSpec(t_cfg, vae_cfg, txt_cfg, params, FakeTokenizer(),
                        FakeTokenizer(), clip_cfg, jnp.float32)
        image = np.random.default_rng(0).uniform(-1, 1, (16, 16, 3)).astype(np.float32)
        cond = spec.prepare_conditions({"caption": "a cat"}, max_length=8, clip_max_length=8)
        lat = spec.prepare_latents({"image": image})
    assert cond["encoder_hidden_states"].shape == (1, 8, t_cfg.joint_attention_dim)
    assert cond["pooled_projections"].shape == (1, t_cfg.pooled_projection_dim)
    # tiny VAE: 2 blocks -> 2x spatial compression
    assert lat["latents"].shape == (1, 8, 8, vae_cfg.latent_channels)


def test_flux_registered():
    assert get_model_spec_cls("flux", "sft") is FluxSpec
    assert get_model_spec_cls("flux", "lora") is FluxSpec


def test_lora_on_flux(monkeypatch):
    """LoRA adapters attach to Flux attention/FFN kernels (mot_only=False)."""
    from vap_tpu.training.lora import apply_lora, init_lora, lora_param_count

    mcfg = FluxConfig.tiny()
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_flux(jax.random.PRNGKey(0), mcfg)
        lora = init_lora(jax.random.PRNGKey(1), params, rank=2, mot_only=False)
        assert lora_param_count(lora) > 0
        assert lora["dual_blocks"]["attn"]["to_q"]["kernel"] is not None
        assert lora["single_blocks"]["attn"]["to_q"]["kernel"] is not None
        # identity at init (B zero)
        merged = apply_lora(params, lora, alpha=4, rank=2)
        np.testing.assert_allclose(
            np.asarray(merged["dual_blocks"]["attn"]["to_q"]["kernel"]),
            np.asarray(params["dual_blocks"]["attn"]["to_q"]["kernel"]))
