"""Module-level parameter offload (reference README.md:202-260:
enable_model_cpu_offload / enable_sequential_cpu_offload drop CogVideoX
inference from 40 GB to ~7.5 GB). TPU analog (pipelines/offload.py): params
stay on HOST, one component staged into device HBM at a time — outputs must
be bit-identical to the resident run and at most one component may be staged
at any moment."""

import dataclasses
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_pipeline_cogvideox import (  # noqa: E402
    FakeTokenizer,
    _init_vae_params,
)

from vap_tpu.models.cogvideox import CogVideoXMOTConfig, init_cogvideox_mot  # noqa: E402
from vap_tpu.models.cogvideox.vae import CogVideoXVAEConfig  # noqa: E402
from vap_tpu.models.text_encoders import T5Config, init_t5_encoder  # noqa: E402
from vap_tpu.ops.schedulers import CogVideoXDDIMScheduler  # noqa: E402
from vap_tpu.pipelines.cogvideox_i2v_mot import CogVideoXVAPPipeline  # noqa: E402
from vap_tpu.pipelines.offload import stage_component  # noqa: E402


def _tiny_cog_pipe():
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
        scheduler=CogVideoXDDIMScheduler(), dtype=jnp.float32)


def test_stage_component_single_slot():
    params = {"a": {"w": jnp.ones((4,))}, "b": {"w": jnp.zeros((4,))}}
    slot = []
    a = stage_component(params, "a", slot)
    assert slot[0][0] == "a" and a is slot[0][1]
    # repeat stage is a cache hit (same staged tree, no new device_put)
    assert stage_component(params, "a", slot) is a
    # staging another component evicts the first — never two resident
    b = stage_component(params, "b", slot)
    assert len(slot) == 1 and slot[0][0] == "b"
    np.testing.assert_array_equal(np.asarray(b["w"]), 0.0)


def test_cog_offload_matches_resident(monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    pipe = _tiny_cog_pipe()
    H = W = 16
    F = 5
    rng = np.random.default_rng(0)
    kwargs = dict(
        image=rng.uniform(-1, 1, (H, W, 3)).astype(np.float32),
        prompt="a cat",
        ref_videos=[rng.uniform(-1, 1, (F, H, W, 3)).astype(np.float32)],
        prompt_mot_ref=["explode it"], height=H, width=W, num_frames=F,
        num_inference_steps=1, guidance_scale=6.0, seed=3,
        max_sequence_length=pipe.transformer_cfg.max_text_seq_length)
    with jax.default_device(jax.devices("cpu")[0]):
        base = np.asarray(pipe(**kwargs))
        off = dataclasses.replace(pipe, enable_model_offload=True, _staged=[])
        out = np.asarray(off(**kwargs))
    np.testing.assert_array_equal(out, base)
    # the LAST phase is VAE decode: exactly that one component is resident
    assert [n for n, _ in off._staged] == ["vae"]
    # the resident-run pipeline never staged anything
    assert pipe._staged == []


def test_wan_offload_matches_resident(monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    from test_pipeline_wan import FakeTokenizer as WanTok, _wan_vae_params

    from vap_tpu.models.text_encoders.clip_vision import (
        CLIPVisionConfig, init_clip_vision)
    from vap_tpu.models.wan import WanMOTConfig, init_wan_mot
    from vap_tpu.models.wan.vae import WanVAEConfig
    from vap_tpu.ops.schedulers import FlowMatchEulerScheduler
    from vap_tpu.pipelines.wan_i2v_mot import WanVAPPipeline

    vae_cfg = WanVAEConfig.tiny()
    t_cfg = WanMOTConfig.tiny(
        in_channels=vae_cfg.z_dim + 4 + vae_cfg.z_dim,
        out_channels=vae_cfg.z_dim, text_len=16)
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
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg,
        clip_cfg=clip_cfg, params=params, tokenizer=WanTok(),
        scheduler=FlowMatchEulerScheduler(shift=3.0), dtype=jnp.float32)

    H = W = 16
    F = 5
    rng = np.random.default_rng(0)
    kwargs = dict(
        image=rng.uniform(-1, 1, (H, W, 3)).astype(np.float32),
        prompt="a cat",
        ref_videos=[rng.uniform(-1, 1, (F, H, W, 3)).astype(np.float32)],
        prompt_mot_ref=["explode it"], height=H, width=W, num_frames=F,
        num_inference_steps=1, guidance_scale=5.0, seed=3)
    with jax.default_device(jax.devices("cpu")[0]):
        base = np.asarray(pipe(**kwargs))
        off = dataclasses.replace(pipe, enable_model_offload=True, _staged=[])
        out = np.asarray(off(**kwargs))
    np.testing.assert_array_equal(out, base)
    assert [n for n, _ in off._staged] == ["vae"]
