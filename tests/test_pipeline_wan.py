"""End-to-end tiny Wan VAP generation: UMT5 + CLIP -> Wan VAE -> scanned
FlowMatch/UniPC denoise -> decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
from vap_tpu.models.text_encoders.clip_vision import CLIPVisionConfig, init_clip_vision
from vap_tpu.models.wan import WanMOTConfig, init_wan_mot
from vap_tpu.models.wan.vae import WanVAEConfig
from vap_tpu.ops.schedulers import FlowMatchEulerScheduler, UniPCScheduler
from vap_tpu.pipelines.wan_i2v_mot import WanVAPPipeline, make_i2v_mask


class FakeTokenizer:
    def __call__(self, texts, padding=None, max_length=16, truncation=True,
                 add_special_tokens=True, return_tensors="np"):
        ids = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t[:max_length]):
                ids[i, j] = (ord(ch) * 3 + j) % 127 + 1
        return {"input_ids": ids, "attention_mask": (ids > 0).astype(np.int32)}


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


def test_i2v_mask_layout():
    mask = make_i2v_mask(1, num_frames=9, lat_h=4, lat_w=4)
    assert mask.shape == (1, 3, 4, 4, 4)  # F_lat=3, 4 mask channels
    # first latent frame covers the conditioning image: all ones
    assert mask[0, 0].min() == 1.0
    assert mask[0, 1:].max() == 0.0


@pytest.mark.parametrize("scheduler", [
    FlowMatchEulerScheduler(shift=3.0),
    pytest.param(UniPCScheduler(shift=3.0), marks=pytest.mark.slow),
])
def test_wan_end_to_end(monkeypatch, scheduler):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    vae_cfg = WanVAEConfig.tiny()
    t_cfg = WanMOTConfig.tiny(
        in_channels=vae_cfg.z_dim + 4 + vae_cfg.z_dim,  # 16->12: lat+mask+cond
        out_channels=vae_cfg.z_dim, text_len=16,
    )
    txt_cfg = T5Config.tiny(d_model=t_cfg.text_dim, per_layer_relative_bias=True)
    clip_cfg = CLIPVisionConfig.tiny(hidden_size=t_cfg.image_dim)

    key = jax.random.PRNGKey(0)
    params = {
        "transformer": init_wan_mot(key, t_cfg),
        "vae": _wan_vae_params(vae_cfg),
        "text_encoder": init_t5_encoder(jax.random.fold_in(key, 1), txt_cfg),
        "image_encoder": init_clip_vision(jax.random.fold_in(key, 2), clip_cfg),
    }
    pipe = WanVAPPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg, clip_cfg=clip_cfg,
        params=params, tokenizer=FakeTokenizer(), scheduler=scheduler, dtype=jnp.float32,
    )

    H = W = 32
    F = 9
    rng = np.random.default_rng(0)
    image = rng.uniform(-1, 1, (H, W, 3)).astype(np.float32)
    ref_video = rng.uniform(-1, 1, (F, H, W, 3)).astype(np.float32)

    with jax.default_device(jax.devices("cpu")[0]):
        video = pipe(
            image=image, prompt="a dog", ref_videos=[ref_video],
            prompt_mot_ref=["melt it"], height=H, width=W, num_frames=F,
            num_inference_steps=2, guidance_scale=5.0,
            max_sequence_length=t_cfg.text_len,
        )
    assert video.shape == (1, F, H, W, 3)
    assert np.isfinite(video).all()


def test_wan_plain_t2v_sampling(monkeypatch):
    """Sampling a plain Wan T2V finetune (crush_smol/wan_t2v recipe path):
    no reference stream, no image/conditioning channels — the pipeline
    routes to wan_forward and decodes a finite video."""
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    vae_cfg = WanVAEConfig.tiny()
    t_cfg = WanMOTConfig.tiny(
        in_channels=vae_cfg.z_dim, out_channels=vae_cfg.z_dim, text_len=16,
        block_idx_with_mot_ref=(), image_dim=None, added_kv_proj_dim=None)
    txt_cfg = T5Config.tiny(d_model=t_cfg.text_dim, per_layer_relative_bias=True)
    key = jax.random.PRNGKey(0)
    pipe = WanVAPPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg, clip_cfg=None,
        params={
            "transformer": init_wan_mot(key, t_cfg),
            "vae": _wan_vae_params(vae_cfg),
            "text_encoder": init_t5_encoder(jax.random.fold_in(key, 1), txt_cfg),
        },
        tokenizer=FakeTokenizer(), scheduler=FlowMatchEulerScheduler(shift=3.0),
        dtype=jnp.float32,
    )
    H = W = 32
    F = 9
    with jax.default_device(jax.devices("cpu")[0]):
        video = pipe(image=None, prompt="a dog", height=H, width=W,
                     num_frames=F, num_inference_steps=2, guidance_scale=5.0,
                     max_sequence_length=t_cfg.text_len)
    assert video.shape == (1, F, H, W, 3)
    assert np.isfinite(video).all()


def test_wan_plain_i2v_sampling(monkeypatch):
    """Plain I2V finetune sampling: image + mask/cond channels, single trunk
    (no refs). Uses the same tiny i2v config as the e2e test."""
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    vae_cfg = WanVAEConfig.tiny()
    t_cfg = WanMOTConfig.tiny(
        in_channels=vae_cfg.z_dim + 4 + vae_cfg.z_dim,
        out_channels=vae_cfg.z_dim, text_len=16, block_idx_with_mot_ref=())
    txt_cfg = T5Config.tiny(d_model=t_cfg.text_dim, per_layer_relative_bias=True)
    clip_cfg = CLIPVisionConfig.tiny(hidden_size=t_cfg.image_dim)
    key = jax.random.PRNGKey(0)
    pipe = WanVAPPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg, clip_cfg=clip_cfg,
        params={
            "transformer": init_wan_mot(key, t_cfg),
            "vae": _wan_vae_params(vae_cfg),
            "text_encoder": init_t5_encoder(jax.random.fold_in(key, 1), txt_cfg),
            "image_encoder": init_clip_vision(jax.random.fold_in(key, 2), clip_cfg),
        },
        tokenizer=FakeTokenizer(), scheduler=FlowMatchEulerScheduler(shift=3.0),
        dtype=jnp.float32,
    )
    H = W = 32
    F = 9
    image = np.random.default_rng(0).uniform(-1, 1, (H, W, 3)).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        video = pipe(image=image, prompt="a dog", height=H, width=W,
                     num_frames=F, num_inference_steps=1, guidance_scale=5.0,
                     max_sequence_length=t_cfg.text_len)
    assert video.shape == (1, F, H, W, 3)
    assert np.isfinite(video).all()
