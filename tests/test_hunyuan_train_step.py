"""HunyuanVideo flow-matching SFT step + spec (tiny configs, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.hunyuan_video import HunyuanVideoConfig, init_hunyuan_video
from vap_tpu.training import get_lr_schedule, get_optimizer
from vap_tpu.training.specs import HunyuanVideoSpec, get_model_spec_cls
from vap_tpu.training.train_step import HunyuanTrainStepConfig, make_hunyuan_train_step


def test_hunyuan_train_step_runs_and_learns(monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    mcfg = HunyuanVideoConfig.tiny()
    cfg = HunyuanTrainStepConfig(model=mcfg, remat=False)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_hunyuan_video(jax.random.PRNGKey(0), mcfg)
        tx = get_optimizer("adamw", get_lr_schedule("constant", 1e-3))
        init_fn, step_fn = make_hunyuan_train_step(cfg, tx)
        train_p, frozen_p, opt_state = init_fn(params)
        step = jax.jit(step_fn)

        B, F, H, W = 2, 2, 4, 4
        k = jax.random.PRNGKey(1)
        batch = {
            "latents": jax.random.normal(k, (B, mcfg.in_channels, F, H, W)),
            "encoder_hidden_states": jax.random.normal(k, (B, 6, mcfg.text_embed_dim)),
            "pooled_projections": jax.random.normal(k, (B, mcfg.pooled_projection_dim)),
            "prompt_attention_mask": jnp.ones((B, 6)),
        }
        losses = []
        for i in range(6):
            train_p, opt_state, metrics = step(train_p, frozen_p, opt_state, batch,
                                               jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert min(losses[1:]) < losses[0], losses


def test_hunyuan_spec_registered():
    assert get_model_spec_cls("hunyuan_video", "sft") is HunyuanVideoSpec
    spec = HunyuanVideoSpec(None, None, None, {}, None)
    lat = spec.prepare_latents({"latents": np.zeros((1, 4, 2, 4, 4), np.float32)})
    assert lat["latents"].shape == (1, 4, 2, 4, 4)
    with pytest.raises(NotImplementedError):
        spec.prepare_latents({"video": np.zeros((3, 8, 8, 3))})
    with pytest.raises(NotImplementedError):
        spec.prepare_conditions({"caption": "raw"})


def test_hunyuan_spec_native_vae_latents():
    from vap_tpu.models.hunyuan_video.vae import HunyuanVideoVAEConfig, init_hunyuan_vae

    vae_cfg = HunyuanVideoVAEConfig.tiny()
    with jax.default_device(jax.devices("cpu")[0]):
        params = {"vae": init_hunyuan_vae(jax.random.PRNGKey(0), vae_cfg, jnp.float32)}
        spec = HunyuanVideoSpec(None, vae_cfg, None, params, None, dtype=jnp.float32)
        video = np.random.default_rng(0).uniform(-1, 1, (5, 8, 8, 3)).astype(np.float32)
        lat = spec.prepare_latents({"video": video})
    # tiny cfg: 2x spatial (2 blocks, ratio 2), 2x temporal on block 0
    assert lat["latents"].shape == (1, vae_cfg.latent_channels, 3, 4, 4)
    assert np.isfinite(lat["latents"]).all()
