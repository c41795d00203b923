"""End-to-end tiny VAP generation: T5 -> VAE encode -> scanned denoise -> VAE decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.cogvideox import CogVideoXMOTConfig, init_cogvideox_mot
from vap_tpu.models.cogvideox.vae import CogVideoXVAEConfig
from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
from vap_tpu.ops.attention import attention_provider
from vap_tpu.ops.schedulers import CogVideoXDDIMScheduler, CogVideoXDPMScheduler
from vap_tpu.pipelines.cogvideox_i2v_mot import CogVideoXVAPPipeline, select_frames


class FakeTokenizer:
    def __call__(self, texts, padding=None, max_length=16, truncation=True,
                 add_special_tokens=True, return_tensors="np"):
        ids = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t[: max_length]):
                ids[i, j] = (ord(ch) * 7 + j) % 127 + 1
        mask = (ids > 0).astype(np.int32)
        return {"input_ids": ids, "attention_mask": mask}


def _init_vae_params(key, cfg: CogVideoXVAEConfig):
    """Random-init VAE params via torch reference shapes would be slow; build
    directly from the converter-compatible tree using small randoms."""
    import torch
    import sys
    sys.path.insert(0, "/root/reference/diffusers/src")
    from diffusers.models.autoencoders.autoencoder_kl_cogvideox import AutoencoderKLCogVideoX
    from vap_tpu.models.cogvideox.vae_weights import convert_cogvideox_vae_state_dict

    torch.manual_seed(0)
    m = AutoencoderKLCogVideoX(
        block_out_channels=cfg.block_out_channels, latent_channels=cfg.latent_channels,
        layers_per_block=cfg.layers_per_block, norm_num_groups=cfg.norm_num_groups,
    )
    return convert_cogvideox_vae_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)


@pytest.fixture(scope="module")
def tiny_pipeline():
    t_cfg = CogVideoXMOTConfig.tiny(in_channels=8, out_channels=4)
    vae_cfg = CogVideoXVAEConfig.tiny()
    txt_cfg = T5Config.tiny(d_model=t_cfg.text_embed_dim)
    key = jax.random.PRNGKey(0)
    params = {
        "transformer": init_cogvideox_mot(key, t_cfg),
        "vae": _init_vae_params(key, vae_cfg),
        "text_encoder": init_t5_encoder(key, txt_cfg),
    }
    return CogVideoXVAPPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg,
        params=params, tokenizer=FakeTokenizer(),
        scheduler=CogVideoXDDIMScheduler(), dtype=jnp.float32,
    )


def test_select_frames():
    frames = list(range(100))
    assert select_frames(frames, 5, "first") == [0, 1, 2, 3, 4]
    ev = select_frames(frames, 5, "evenly")
    assert ev[0] == 0 and ev[-1] == 99 and len(ev) == 5
    assert len(select_frames(frames, 7, "random")) == 7


@pytest.mark.slow  # ~3 min on a 1-core host; single_branch_modes below keeps
@pytest.mark.parametrize("scheduler_cls", [  # fast pipeline coverage
    CogVideoXDDIMScheduler,
    CogVideoXDPMScheduler,
])
def test_end_to_end_generation(tiny_pipeline, scheduler_cls, monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    pipe = tiny_pipeline
    pipe.scheduler = scheduler_cls()

    H = W = 32
    F = 9
    image = np.random.default_rng(0).uniform(-1, 1, (H, W, 3)).astype(np.float32)
    ref_video = np.random.default_rng(1).uniform(-1, 1, (F, H, W, 3)).astype(np.float32)

    with jax.default_device(jax.devices("cpu")[0]):
        video = pipe(
            image=image, prompt="a cat", ref_videos=[ref_video],
            prompt_mot_ref=["explode it"], height=H, width=W, num_frames=F,
            num_inference_steps=2, guidance_scale=6.0, use_dynamic_cfg=True,
            max_sequence_length=pipe.transformer_cfg.max_text_seq_length,
        )
    assert video.shape == (1, F, H, W, 3)
    assert np.isfinite(video).all()


def test_patch_size_t_divisible_frames(monkeypatch):
    """CogVideoX 1.5 (patch_size_t=2) with a latent frame count already
    divisible by patch_size_t: F=13 -> 4 latent frames, so no padding is
    needed anywhere. The reference's `pt - size % pt` ref padding adds a
    full extra pt here and crashes at the ref/ref-image concat
    (prepare_latents :424-442); our `-size % pt` form makes this work."""
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    t_cfg = CogVideoXMOTConfig.tiny(in_channels=8, out_channels=4, patch_size_t=2)
    vae_cfg = CogVideoXVAEConfig.tiny()
    txt_cfg = T5Config.tiny(d_model=t_cfg.text_embed_dim)
    key = jax.random.PRNGKey(7)
    pipe = CogVideoXVAPPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg,
        params={
            "transformer": init_cogvideox_mot(key, t_cfg),
            "vae": _init_vae_params(key, vae_cfg),
            "text_encoder": init_t5_encoder(key, txt_cfg),
        },
        tokenizer=FakeTokenizer(), scheduler=CogVideoXDDIMScheduler(),
        dtype=jnp.float32,
    )
    H = W = 32
    F = 13  # (13-1)//4 + 1 = 4 latent frames, divisible by pt=2
    image = np.random.default_rng(4).uniform(-1, 1, (H, W, 3)).astype(np.float32)
    ref_video = np.random.default_rng(5).uniform(-1, 1, (F, H, W, 3)).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        lat = pipe(
            image=image, prompt="a cat", ref_videos=[ref_video],
            prompt_mot_ref=["fx"], height=H, width=W, num_frames=F,
            num_inference_steps=1, guidance_scale=6.0,
            max_sequence_length=t_cfg.max_text_seq_length,
            output_type="latent",
        )
    assert lat.shape[1] == 4 and np.isfinite(lat).all()


@pytest.mark.parametrize("mode", ["ablation_single_branch", "baseline_single_condition"])
def test_single_branch_modes(tiny_pipeline, monkeypatch, mode):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    pipe = tiny_pipeline
    pipe.scheduler = CogVideoXDDIMScheduler()
    H = W = 32
    F = 9
    image = np.random.default_rng(2).uniform(-1, 1, (H, W, 3)).astype(np.float32)
    ref_video = np.random.default_rng(3).uniform(-1, 1, (F, H, W, 3)).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        video = pipe(
            image=image, prompt="a cat", ref_videos=[ref_video],
            prompt_mot_ref=["fx"], height=H, width=W, num_frames=F,
            num_inference_steps=1, guidance_scale=6.0,
            max_sequence_length=pipe.transformer_cfg.max_text_seq_length,
            **{mode: True},
        )
    assert video.shape == (1, F, H, W, 3)
    assert np.isfinite(video).all()


def test_plain_i2v_sampling_matches_baseline_single_condition(tiny_pipeline, monkeypatch):
    """Sampling a plain (crush_smol-style) finetune: calling the pipeline with
    NO reference videos runs the single trunk — and must equal the
    baseline_single_condition path (which provably ignores its refs)."""
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    pipe = tiny_pipeline
    pipe.scheduler = CogVideoXDDIMScheduler()
    H = W = 32
    F = 9
    image = np.random.default_rng(2).uniform(-1, 1, (H, W, 3)).astype(np.float32)
    ref_video = np.random.default_rng(3).uniform(-1, 1, (F, H, W, 3)).astype(np.float32)
    kwargs = dict(prompt="a cat", height=H, width=W, num_frames=F,
                  num_inference_steps=2, guidance_scale=6.0, seed=5,
                  max_sequence_length=pipe.transformer_cfg.max_text_seq_length,
                  output_type="latent")
    with jax.default_device(jax.devices("cpu")[0]):
        plain = np.asarray(pipe(image=image, **kwargs))
        baseline = np.asarray(pipe(
            image=image, ref_videos=[ref_video], prompt_mot_ref=["fx"],
            baseline_single_condition=True, **kwargs))
    np.testing.assert_allclose(plain, baseline, atol=1e-5)


def test_plain_t2v_sampling(monkeypatch):
    """T2V plain sampling (image=None, in_channels == latent channels): the
    full no-conditioning path decodes a finite video."""
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    vae_cfg = CogVideoXVAEConfig.tiny()
    t_cfg = CogVideoXMOTConfig.tiny(in_channels=vae_cfg.latent_channels,
                                    out_channels=vae_cfg.latent_channels,
                                    block_idx_with_mot_ref=())
    txt_cfg = T5Config.tiny(d_model=t_cfg.text_embed_dim)
    key = jax.random.PRNGKey(11)
    pipe = CogVideoXVAPPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg,
        params={
            "transformer": init_cogvideox_mot(key, t_cfg),
            "vae": _init_vae_params(key, vae_cfg),
            "text_encoder": init_t5_encoder(key, txt_cfg),
        },
        tokenizer=FakeTokenizer(), scheduler=CogVideoXDDIMScheduler(),
        dtype=jnp.float32,
    )
    H = W = 32
    F = 9
    with jax.default_device(jax.devices("cpu")[0]):
        video = pipe(image=None, prompt="a cat", height=H, width=W,
                     num_frames=F, num_inference_steps=1, guidance_scale=6.0,
                     max_sequence_length=t_cfg.max_text_seq_length)
    assert video.shape == (1, F, H, W, 3)
    assert np.isfinite(video).all()
