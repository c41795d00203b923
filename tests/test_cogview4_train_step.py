"""CogView4 flow-matching SFT step + spec preprocessing (tiny configs, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.autoencoder_kl import AutoencoderKLConfig, init_autoencoder_kl
from vap_tpu.models.cogview4 import CogView4Config, init_cogview4
from vap_tpu.training import get_lr_schedule, get_optimizer
from vap_tpu.training.specs import CogView4Spec, get_model_spec_cls
from vap_tpu.training.train_step import CogView4TrainStepConfig, make_cogview4_train_step


def test_cogview4_train_step_runs_and_learns(monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    mcfg = CogView4Config.tiny()
    cfg = CogView4TrainStepConfig(model=mcfg, remat=False)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_cogview4(jax.random.PRNGKey(0), mcfg)
        tx = get_optimizer("adamw", get_lr_schedule("constant", 1e-3))
        init_fn, step_fn = make_cogview4_train_step(cfg, tx)
        train_p, frozen_p, opt_state = init_fn(params)
        step = jax.jit(step_fn)

        B, H, W = 2, 8, 8
        k = jax.random.PRNGKey(1)
        batch = {
            "latents": jax.random.normal(k, (B, mcfg.in_channels, H, W)),
            "encoder_hidden_states": jax.random.normal(k, (B, 5, mcfg.text_embed_dim)),
        }
        losses = []
        for i in range(6):
            train_p, opt_state, metrics = step(train_p, frozen_p, opt_state, batch,
                                               jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert min(losses[1:]) < losses[0], losses


def test_cogview4_spec(monkeypatch):
    assert get_model_spec_cls("cogview4", "sft") is CogView4Spec
    vae_cfg = AutoencoderKLConfig.tiny(use_quant_conv=True, use_post_quant_conv=True,
                                       shift_factor=None, scaling_factor=0.5)
    mcfg = CogView4Config.tiny(in_channels=vae_cfg.latent_channels)
    with jax.default_device(jax.devices("cpu")[0]):
        params = {"vae": init_autoencoder_kl(jax.random.PRNGKey(0), vae_cfg, jnp.float32)}
        spec = CogView4Spec(mcfg, vae_cfg, None, params, None, jnp.float32)
        image = np.random.default_rng(0).uniform(-1, 1, (16, 16, 3)).astype(np.float32)
        lat = spec.prepare_latents({"image": image, "original_size": (32, 32)})
        cond = spec.prepare_conditions(
            {"encoder_hidden_states": np.zeros((1, 5, mcfg.text_embed_dim))})
    assert lat["latents"].shape == (1, vae_cfg.latent_channels, 8, 8)
    np.testing.assert_array_equal(lat["original_size"], [[32, 32]])
    np.testing.assert_array_equal(lat["target_size"], [[16, 16]])
    assert cond["encoder_hidden_states"].shape == (1, 5, mcfg.text_embed_dim)
    with pytest.raises(NotImplementedError):
        spec.prepare_conditions({"caption": "raw text"})
