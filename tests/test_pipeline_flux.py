"""Flux txt2img pipeline e2e (tiny configs, CPU) + sigma shifting math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.autoencoder_kl import AutoencoderKLConfig, init_autoencoder_kl
from vap_tpu.models.flux import FluxConfig, init_flux
from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
from vap_tpu.models.text_encoders.clip_text import CLIPTextConfig, init_clip_text
from vap_tpu.pipelines.flux import FluxPipeline, calculate_shift, shift_sigmas


class FakeTokenizer:
    def __call__(self, texts, padding=None, max_length=8, truncation=True,
                 add_special_tokens=True, return_tensors="np"):
        ids = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t[:max_length]):
                ids[i, j] = (ord(ch) * 7 + j) % 50 + 1
        return {"input_ids": ids, "attention_mask": (ids > 0).astype(np.int32)}


def test_shift_math_matches_reference_formula():
    # FluxPipeline.calculate_shift + FlowMatchEuler time_shift (exponential)
    mu = calculate_shift(256)
    assert abs(mu - 0.5) < 1e-9
    mu = calculate_shift(4096)
    assert abs(mu - 1.15) < 1e-9
    sig = shift_sigmas(np.array([0.5]), 1.0)
    np.testing.assert_allclose(sig, np.exp(1.0) / (np.exp(1.0) + 1.0), atol=1e-9)


def test_flux_pipeline_e2e(monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    vae_cfg = AutoencoderKLConfig.tiny()           # 2x spatial compression
    t_cfg = FluxConfig.tiny(in_channels=vae_cfg.latent_channels * 4)
    txt_cfg = T5Config.tiny(d_model=t_cfg.joint_attention_dim)
    clip_cfg = CLIPTextConfig.tiny(hidden_size=t_cfg.pooled_projection_dim,
                                   num_attention_heads=4)
    key = jax.random.PRNGKey(0)
    with jax.default_device(jax.devices("cpu")[0]):
        params = {
            "transformer": init_flux(key, t_cfg, jnp.float32),
            "vae": init_autoencoder_kl(jax.random.fold_in(key, 1), vae_cfg, jnp.float32),
            "text_encoder": init_clip_text(jax.random.fold_in(key, 2), clip_cfg, jnp.float32),
            "text_encoder_2": init_t5_encoder(jax.random.fold_in(key, 3), txt_cfg, jnp.float32),
        }
        pipe = FluxPipeline(t_cfg, vae_cfg, txt_cfg, clip_cfg, params,
                            FakeTokenizer(), FakeTokenizer(), dtype=jnp.float32)
        img = pipe("a tiny cat", height=16, width=16, num_inference_steps=3,
                   guidance_scale=3.5, seed=0, max_sequence_length=8)
    assert img.shape == (1, 16, 16, 3)
    assert np.isfinite(img).all()
    # determinism
    with jax.default_device(jax.devices("cpu")[0]):
        img2 = pipe("a tiny cat", height=16, width=16, num_inference_steps=3,
                    guidance_scale=3.5, seed=0, max_sequence_length=8)
    np.testing.assert_array_equal(img, img2)
