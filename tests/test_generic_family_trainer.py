"""Tiny end-to-end SFTTrainer runs for the four generic families
(flux / cogview4 / ltx_video / hunyuan_video) over auto-detected generic
datasets — VERDICT round-1 missing #5/#4 (trainer dispatch + datasets)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.data.video import export_to_video
from vap_tpu.training.args import TrainingArgs
from vap_tpu.training.trainer import SFTTrainer


class FakeTokenizer:
    def __call__(self, texts, padding=None, max_length=8, truncation=True,
                 add_special_tokens=True, return_tensors="np"):
        ids = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t[:max_length]):
                ids[i, j] = (ord(ch) * 3 + j) % 30 + 1
        return {"input_ids": ids, "attention_mask": (ids > 0).astype(np.int32)}


def _image_dataset(tmp_path, n=3):
    import cv2

    for i in range(n):
        img = (np.random.default_rng(i).uniform(0, 255, (32, 32, 3))).astype(np.uint8)
        cv2.imwrite(str(tmp_path / f"s{i}.png"), img)
        (tmp_path / f"s{i}.txt").write_text(f"an image {i}")
    return tmp_path


def _video_dataset(tmp_path, n=3):
    for i in range(n):
        fr = (np.random.default_rng(i).uniform(0, 1, (9, 32, 32, 3)) * 255).astype(np.uint8)
        export_to_video(fr, str(tmp_path / f"v{i}.mp4"), fps=16)
        (tmp_path / f"v{i}.txt").write_text(f"a video {i}")
    return tmp_path


def _args(root, out, family_kwargs=None, **kw):
    base = dict(
        data_root=str(root), train_steps=2, batch_size=1, logging_steps=1,
        checkpointing_steps=100, output_dir=str(out), lr=1e-4,
        gradient_checkpointing=False,
        video_resolution_buckets=((9, 32, 32),),
        image_resolution_buckets=((32, 32),),
    )
    base.update(kw)
    return TrainingArgs(**base)


def _wrap_cond(spec, **kw):
    spec.prepare_conditions = (
        lambda s, _o=spec.prepare_conditions: _o(s, **kw))


@pytest.mark.slow
def test_flux_trainer_e2e(tmp_path, monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    from vap_tpu.models.autoencoder_kl import AutoencoderKLConfig, init_autoencoder_kl
    from vap_tpu.models.flux import FluxConfig, init_flux
    from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
    from vap_tpu.models.text_encoders.clip_text import CLIPTextConfig, init_clip_text
    from vap_tpu.training.specs import FluxSpec

    root = _image_dataset(tmp_path)
    with jax.default_device(jax.devices("cpu")[0]):
        vae_cfg = AutoencoderKLConfig.tiny()
        t_cfg = FluxConfig.tiny(in_channels=4 * vae_cfg.latent_channels)
        txt_cfg = T5Config.tiny(d_model=t_cfg.joint_attention_dim)
        clip_cfg = CLIPTextConfig.tiny(hidden_size=t_cfg.pooled_projection_dim,
                                       num_attention_heads=4, vocab_size=64)
        key = jax.random.PRNGKey(0)
        params = {
            "transformer": init_flux(key, t_cfg, jnp.float32),
            "vae": init_autoencoder_kl(jax.random.fold_in(key, 1), vae_cfg, jnp.float32),
            "text_encoder": init_clip_text(jax.random.fold_in(key, 2), clip_cfg, jnp.float32),
            "text_encoder_2": init_t5_encoder(jax.random.fold_in(key, 3), txt_cfg, jnp.float32),
        }
        spec = FluxSpec(t_cfg, vae_cfg, txt_cfg, params, FakeTokenizer(),
                        FakeTokenizer(), clip_cfg, jnp.float32)
        _wrap_cond(spec, max_length=8, clip_max_length=8)
        trainer = SFTTrainer(_args(root, tmp_path / "out"), spec)
        assert trainer.family == "flux"
        state = trainer.run()
    assert state.step == 2


@pytest.mark.slow
def test_cogview4_trainer_e2e(tmp_path, monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    from vap_tpu.models.autoencoder_kl import AutoencoderKLConfig, init_autoencoder_kl
    from vap_tpu.models.cogview4 import CogView4Config, init_cogview4
    from vap_tpu.models.text_encoders.glm import GlmConfig, init_glm
    from vap_tpu.training.specs import CogView4Spec

    root = _image_dataset(tmp_path)
    with jax.default_device(jax.devices("cpu")[0]):
        vae_cfg = AutoencoderKLConfig.tiny(use_quant_conv=True, use_post_quant_conv=True,
                                           shift_factor=None, scaling_factor=0.5)
        mcfg = CogView4Config.tiny(in_channels=vae_cfg.latent_channels)
        glm_cfg = GlmConfig.tiny(hidden_size=mcfg.text_embed_dim)
        key = jax.random.PRNGKey(0)
        params = {
            "transformer": init_cogview4(key, mcfg, jnp.float32),
            "vae": init_autoencoder_kl(jax.random.fold_in(key, 1), vae_cfg, jnp.float32),
            "text_encoder": init_glm(jax.random.fold_in(key, 2), glm_cfg, jnp.float32),
        }
        spec = CogView4Spec(mcfg, vae_cfg, glm_cfg, params, FakeTokenizer(), jnp.float32)
        _wrap_cond(spec, max_length=8)
        trainer = SFTTrainer(_args(root, tmp_path / "out"), spec)
        state = trainer.run()
    assert state.step == 2


@pytest.mark.slow
def test_ltx_trainer_e2e(tmp_path, monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    from vap_tpu.models.ltx_video import LTXVideoConfig, init_ltx_video
    from vap_tpu.models.ltx_video.vae import LTXVideoVAEConfig, init_ltx_vae
    from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
    from vap_tpu.training.specs import LTXVideoSpec

    root = _video_dataset(tmp_path)
    with jax.default_device(jax.devices("cpu")[0]):
        vae_cfg = LTXVideoVAEConfig.tiny()
        mcfg = LTXVideoConfig.tiny(in_channels=vae_cfg.latent_channels,
                                   out_channels=vae_cfg.latent_channels)
        txt_cfg = T5Config.tiny(d_model=mcfg.caption_channels)
        key = jax.random.PRNGKey(0)
        params = {
            "transformer": init_ltx_video(key, mcfg, jnp.float32),
            "vae": init_ltx_vae(jax.random.fold_in(key, 1), vae_cfg, jnp.float32),
            "text_encoder": init_t5_encoder(jax.random.fold_in(key, 2), txt_cfg, jnp.float32),
        }
        spec = LTXVideoSpec(mcfg, vae_cfg, txt_cfg, params, FakeTokenizer(), jnp.float32)
        _wrap_cond(spec, max_length=8)
        trainer = SFTTrainer(_args(root, tmp_path / "out"), spec)
        state = trainer.run()
    assert state.step == 2


@pytest.mark.slow
def test_hunyuan_trainer_e2e(tmp_path, monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    from vap_tpu.models.hunyuan_video import HunyuanVideoConfig, init_hunyuan_video
    from vap_tpu.models.hunyuan_video.vae import HunyuanVideoVAEConfig, init_hunyuan_vae
    from vap_tpu.models.text_encoders.clip_text import CLIPTextConfig, init_clip_text
    from vap_tpu.models.text_encoders.llama import LlamaConfig, init_llama
    from vap_tpu.training.specs import HunyuanVideoSpec

    root = _video_dataset(tmp_path)
    with jax.default_device(jax.devices("cpu")[0]):
        vae_cfg = HunyuanVideoVAEConfig.tiny()
        llama_cfg = LlamaConfig.tiny()  # head_dim must stay even for rope
        mcfg = HunyuanVideoConfig.tiny(in_channels=vae_cfg.latent_channels,
                                       out_channels=vae_cfg.latent_channels,
                                       text_embed_dim=llama_cfg.hidden_size)
        clip_cfg = CLIPTextConfig.tiny(hidden_size=mcfg.pooled_projection_dim,
                                       num_attention_heads=4, vocab_size=64)
        key = jax.random.PRNGKey(0)
        params = {
            "transformer": init_hunyuan_video(key, mcfg, jnp.float32),
            "vae": init_hunyuan_vae(jax.random.fold_in(key, 1), vae_cfg, jnp.float32),
            "text_encoder": init_llama(jax.random.fold_in(key, 2), llama_cfg, jnp.float32),
            "text_encoder_2": init_clip_text(jax.random.fold_in(key, 3), clip_cfg, jnp.float32),
        }
        spec = HunyuanVideoSpec(mcfg, vae_cfg, llama_cfg, params, FakeTokenizer(),
                                clip_text_cfg=clip_cfg, dtype=jnp.float32)
        _wrap_cond(spec, max_length=8, clip_max_length=8)
        trainer = SFTTrainer(_args(root, tmp_path / "out"), spec)
        state = trainer.run()
    assert state.step == 2
