"""HunyuanVideo t2v pipeline e2e (tiny configs, CPU) + constant sigma shift."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.hunyuan_video import HunyuanVideoConfig, init_hunyuan_video
from vap_tpu.models.hunyuan_video.vae import HunyuanVideoVAEConfig, init_hunyuan_vae
from vap_tpu.models.text_encoders.clip_text import CLIPTextConfig, init_clip_text
from vap_tpu.models.text_encoders.llama import LlamaConfig, init_llama
from vap_tpu.pipelines.hunyuan_video import HunyuanVideoPipeline, shift_sigmas_constant


class FakeTokenizer:
    def __call__(self, texts, padding=None, max_length=8, truncation=True,
                 return_tensors="np"):
        ids = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t[:max_length]):
                ids[i, j] = (ord(ch) * 3 + j) % 50 + 1
        return {"input_ids": ids, "attention_mask": (ids > 0).astype(np.int32)}


def test_constant_shift():
    # FlowMatchEuler constant shift: s*sigma / (1 + (s-1)*sigma)
    s = shift_sigmas_constant(np.array([0.5]), 7.0)
    np.testing.assert_allclose(s, 3.5 / 4.0, atol=1e-9)


def test_hunyuan_pipeline_e2e(monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    vae_cfg = HunyuanVideoVAEConfig.tiny()   # 2x spatial, 2x temporal (block 0)
    t_cfg = HunyuanVideoConfig.tiny(in_channels=vae_cfg.latent_channels,
                                    out_channels=vae_cfg.latent_channels)
    llama_cfg = LlamaConfig.tiny(hidden_size=t_cfg.text_embed_dim,
                                 num_attention_heads=2, num_key_value_heads=2,
                                 vocab_size=64)  # head_dim must be even (rotary)
    clip_cfg = CLIPTextConfig.tiny(hidden_size=t_cfg.pooled_projection_dim,
                                   num_attention_heads=4)
    key = jax.random.PRNGKey(0)
    with jax.default_device(jax.devices("cpu")[0]):
        params = {
            "transformer": init_hunyuan_video(key, t_cfg, jnp.float32),
            "vae": init_hunyuan_vae(jax.random.fold_in(key, 1), vae_cfg, jnp.float32),
            "text_encoder": init_llama(jax.random.fold_in(key, 2), llama_cfg, jnp.float32),
            "text_encoder_2": init_clip_text(jax.random.fold_in(key, 3), clip_cfg, jnp.float32),
        }
        pipe = HunyuanVideoPipeline(t_cfg, vae_cfg, llama_cfg, clip_cfg, params,
                                    FakeTokenizer(), FakeTokenizer(), dtype=jnp.float32)
        video = pipe("a tiny cat", height=8, width=8, num_frames=5,
                     num_inference_steps=2, guidance_scale=6.0, seed=0,
                     max_sequence_length=8)
    # tiny VAE actually compresses time 2x (its config declares the real
    # model's 4x): lf = (5-1)//4+1 = 2 latent frames -> 2*2-1 = 3 decoded
    assert video.shape == (1, 3, 8, 8, 3)
    assert np.isfinite(video).all()
