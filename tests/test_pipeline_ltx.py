"""LTX-Video t2v pipeline e2e (tiny configs, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.ltx_video import LTXVideoConfig, init_ltx_video
from vap_tpu.models.ltx_video.vae import LTXVideoVAEConfig, init_ltx_vae
from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
from vap_tpu.pipelines.ltx_video import LTXVideoPipeline


class FakeTokenizer:
    def __call__(self, texts, padding=None, max_length=8, truncation=True,
                 add_special_tokens=True, return_tensors="np"):
        ids = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t[:max_length]):
                ids[i, j] = (ord(ch) * 3 + j) % 30 + 1
        return {"input_ids": ids, "attention_mask": (ids > 0).astype(np.int32)}


def test_ltx_pipeline_e2e(monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    vae_cfg = LTXVideoVAEConfig.tiny()  # patch 2, one 2x scaling -> 4x spatial
    t_cfg = LTXVideoConfig.tiny(in_channels=vae_cfg.latent_channels,
                                out_channels=vae_cfg.latent_channels)
    txt_cfg = T5Config.tiny(d_model=t_cfg.caption_channels)
    key = jax.random.PRNGKey(0)
    with jax.default_device(jax.devices("cpu")[0]):
        params = {
            "transformer": init_ltx_video(key, t_cfg, jnp.float32),
            "vae": init_ltx_vae(jax.random.fold_in(key, 1), vae_cfg, jnp.float32),
            "text_encoder": init_t5_encoder(jax.random.fold_in(key, 2), txt_cfg, jnp.float32),
        }
        pipe = LTXVideoPipeline(t_cfg, vae_cfg, txt_cfg, params, FakeTokenizer(),
                                dtype=jnp.float32,
                                vae_temporal_compression=2, vae_spatial_compression=4)
        video = pipe("a tiny cat", height=16, width=16, num_frames=5,
                     num_inference_steps=2, guidance_scale=3.0, seed=0,
                     max_sequence_length=8)
    # tiny VAE: latent (3, 4, 4) -> decode: time 2x-1 trim, spatial 2x then patch 2
    assert video.shape[0] == 1 and video.shape[-1] == 3
    assert np.isfinite(video).all()
