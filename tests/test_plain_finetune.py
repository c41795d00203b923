"""Plain (non-VAP) finetuning of the cogvideox/wan families on generic
datasets — the reference's crush_smol-style sft/lora recipes train the BASE
trunk with no MoT reference stream (examples/training/sft/{cogvideox,wan,
wan_t2v}/*). Specs must tolerate ref-free samples and the losses must route
to the plain forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vap_tpu.models.cogvideox import CogVideoXMOTConfig, init_cogvideox_mot
from vap_tpu.models.cogvideox.vae import CogVideoXVAEConfig
from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
from vap_tpu.models.wan import WanMOTConfig
from vap_tpu.models.wan.transformer_mot import init_wan_mot
from vap_tpu.models.wan.vae import WanVAEConfig
from vap_tpu.training.specs import CogVideoXSpec, WanSpec
from vap_tpu.training.train_step import (
    TrainStepConfig,
    WanTrainStepConfig,
    cogvideox_vap_loss,
    wan_vap_loss,
)

from test_pipeline_cogvideox import FakeTokenizer, _init_vae_params
from test_pipeline_wan import _wan_vae_params


def _video(f=9, h=32, w=32, seed=0):
    return np.random.default_rng(seed).uniform(-1, 1, (f, h, w, 3)).astype(np.float32)


def _cog_spec(in_channels, monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    t_cfg = CogVideoXMOTConfig.tiny(in_channels=in_channels, out_channels=4,
                                    block_idx_with_mot_ref=())
    vae_cfg = CogVideoXVAEConfig.tiny()
    txt_cfg = T5Config.tiny(d_model=t_cfg.text_embed_dim)
    key = jax.random.PRNGKey(0)
    params = {
        "transformer": init_cogvideox_mot(key, t_cfg),
        "vae": _init_vae_params(key, vae_cfg),
        "text_encoder": init_t5_encoder(key, txt_cfg),
    }
    return CogVideoXSpec(t_cfg, vae_cfg, txt_cfg, params, FakeTokenizer(),
                         dtype=jnp.float32)


def test_cog_spec_plain_t2v_latents(monkeypatch):
    """T2V (in_channels == latent channels): no image_latents, no mot keys."""
    spec = _cog_spec(4, monkeypatch)
    with jax.default_device(jax.devices("cpu")[0]):
        cond = spec.prepare_conditions({"caption": "a cat"})
        lat = spec.prepare_latents({"video": _video()})
    assert set(cond) == {"encoder_hidden_states"}
    assert set(lat) == {"latents"}


def test_cog_plain_finetune_step_decreases_loss(monkeypatch):
    """I2V plain finetune (first-frame conditioning, single trunk): the loss
    path runs without any mot batch keys and a few SGD steps reduce it."""
    spec = _cog_spec(8, monkeypatch)
    with jax.default_device(jax.devices("cpu")[0]):
        cond = spec.prepare_conditions({"caption": "a cat"})
        lat = spec.prepare_latents({"video": _video()})
        assert set(lat) == {"latents", "image_latents"}
        batch = {k: jnp.asarray(v) for k, v in {**cond, **lat}.items()}
        cfg = TrainStepConfig(model=spec.transformer_cfg, remat=False)
        params = spec.params["transformer"]

        loss_g = jax.jit(jax.value_and_grad(
            lambda p, k: cogvideox_vap_loss(p, cfg, batch, k)[0]))
        key = jax.random.PRNGKey(3)
        l0, g = loss_g(params, key)
        assert np.isfinite(float(l0))
        # gradients flow through the base trunk only; the always-present
        # top-level *_mot_ref embedders are unused in the plain path
        flat = jax.tree_util.tree_flatten_with_path(g)[0]
        for p, v in flat:
            if "_mot_ref" in str(p):
                assert float(jnp.abs(v).max()) == 0.0, p
        assert any(float(jnp.abs(v).max()) > 0 for _, v in flat)
        upd = jax.tree.map(lambda p, gg: p - 0.05 * gg, params, g)
        l1, _ = loss_g(upd, key)  # same key = same noise draw
        assert float(l1) < float(l0)


def test_wan_spec_plain_t2v(monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    t_cfg = WanMOTConfig.tiny(in_channels=4, out_channels=4,
                              block_idx_with_mot_ref=(),
                              image_dim=None, added_kv_proj_dim=None)
    vae_cfg = WanVAEConfig.tiny()
    txt_cfg = T5Config.tiny(d_model=t_cfg.text_dim)
    key = jax.random.PRNGKey(0)
    params = {
        "transformer": init_wan_mot(key, t_cfg),
        "vae": _wan_vae_params(vae_cfg),
        "text_encoder": init_t5_encoder(jax.random.fold_in(key, 2), txt_cfg),
    }
    spec = WanSpec(t_cfg, vae_cfg, txt_cfg, params, FakeTokenizer(),
                   dtype=jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        cond = spec.prepare_conditions({"caption": "a dog"})
        lat = spec.prepare_latents({"video": _video(f=5, h=16, w=16)})
        assert set(cond) == {"encoder_hidden_states"}
        assert set(lat) == {"latents"}  # T2V: no condition channels

        batch = {k: jnp.asarray(v) for k, v in {**cond, **lat}.items()}
        cfg = WanTrainStepConfig(model=t_cfg, remat=False)
        loss, metrics = jax.jit(
            lambda p, k: wan_vap_loss(p, cfg, batch, k))(
                params["transformer"], jax.random.PRNGKey(5))
        assert np.isfinite(float(loss)) and "loss_main" in metrics
