"""CogView4 txt2img pipeline e2e (tiny configs, CPU) + linear sigma shift."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.autoencoder_kl import AutoencoderKLConfig, init_autoencoder_kl
from vap_tpu.models.cogview4 import CogView4Config, init_cogview4
from vap_tpu.models.text_encoders.glm import GlmConfig, init_glm
from vap_tpu.pipelines.cogview4 import (
    CogView4Pipeline, calculate_shift, shift_sigmas_linear)


class FakeTokenizer:
    pad_token_id = 0

    def __call__(self, texts, padding=None, max_length=8, truncation=True,
                 add_special_tokens=True, return_tensors="np"):
        ids = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t[:max_length]):
                ids[i, j] = (ord(ch) * 5 + j) % 50 + 1
        return {"input_ids": ids, "attention_mask": (ids > 0).astype(np.int32)}


def test_linear_shift_matches_training_formula():
    # same mu/shift math as the CogView4 train step (base_specification :289-325)
    mu = calculate_shift(256)
    assert abs(mu - 1.0) < 1e-9
    s = shift_sigmas_linear(np.array([0.5]), 2.0)
    np.testing.assert_allclose(s, 2.0 / 3.0, atol=1e-9)


def test_cogview4_pipeline_e2e(monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    vae_cfg = AutoencoderKLConfig.tiny(use_quant_conv=True, use_post_quant_conv=True,
                                       shift_factor=None, scaling_factor=0.5)
    t_cfg = CogView4Config.tiny(in_channels=vae_cfg.latent_channels)
    glm_cfg = GlmConfig.tiny(hidden_size=t_cfg.text_embed_dim, num_attention_heads=4,
                             head_dim=t_cfg.text_embed_dim // 4, vocab_size=64)
    key = jax.random.PRNGKey(0)
    with jax.default_device(jax.devices("cpu")[0]):
        params = {
            "transformer": init_cogview4(key, t_cfg, jnp.float32),
            "vae": init_autoencoder_kl(jax.random.fold_in(key, 1), vae_cfg, jnp.float32),
            "text_encoder": init_glm(jax.random.fold_in(key, 2), glm_cfg, jnp.float32),
        }
        pipe = CogView4Pipeline(t_cfg, vae_cfg, glm_cfg, params, FakeTokenizer(),
                                dtype=jnp.float32)
        img = pipe("a tiny cat", height=16, width=16, num_inference_steps=3,
                   guidance_scale=3.5, seed=0, max_sequence_length=8)
    assert img.shape == (1, 16, 16, 3)
    assert np.isfinite(img).all()
    with jax.default_device(jax.devices("cpu")[0]):
        img2 = pipe("a tiny cat", height=16, width=16, num_inference_steps=3,
                    guidance_scale=3.5, seed=0, max_sequence_length=8)
    np.testing.assert_array_equal(img, img2)
