"""Wan flow-matching train step: runs, loss drops, MoT-only updates. Plus the
Wan DPO step (LoRA policy over frozen base, shared-noise win/lose pairs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.wan import WanMOTConfig, init_wan_mot
from vap_tpu.training import get_lr_schedule, get_optimizer
from vap_tpu.training.train_step import (
    WanTrainStepConfig, make_wan_dpo_step, make_wan_train_step)


def test_wan_train_step(monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    mcfg = WanMOTConfig.tiny(in_channels=8, out_channels=4)  # 4 lat + 4 cond ch
    cfg = WanTrainStepConfig(model=mcfg, remat=False)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_wan_mot(jax.random.PRNGKey(0), mcfg)
        tx = get_optimizer("adamw", get_lr_schedule("constant", 1e-3))
        init_fn, step_fn = make_wan_train_step(cfg, tx)
        train_p, frozen_p, opt_state = init_fn(params)
        step = jax.jit(step_fn)

        B, F, H, W = 1, 2, 4, 4
        T = mcfg.text_len
        k = jax.random.PRNGKey(1)
        batch = {
            "latents": jax.random.normal(k, (B, F, H, W, 4)),
            "condition": jax.random.normal(k, (B, F, H, W, 4)),
            "latents_mot_ref": jax.random.normal(k, (B, F, H, W, 4)),
            "condition_mot_ref": jax.random.normal(k, (B, F, H, W, 4)),
            "encoder_hidden_states": jax.random.normal(k, (B, T, mcfg.text_dim)),
            "encoder_hidden_states_mot_ref": jax.random.normal(k, (B, T, mcfg.text_dim)),
            "encoder_hidden_states_image": jax.random.normal(k, (B, 5, mcfg.image_dim)),
            "encoder_hidden_states_image_mot_ref": jax.random.normal(k, (B, 5, mcfg.image_dim)),
        }
        base_frozen = jax.tree.leaves(frozen_p)[0].copy()
        losses = []
        for _ in range(6):
            train_p, opt_state, metrics = step(train_p, frozen_p, opt_state, batch, jax.random.PRNGKey(7))
            losses.append(float(metrics["loss"]))
        assert min(losses[1:]) < losses[0], losses
        np.testing.assert_array_equal(np.asarray(jax.tree.leaves(frozen_p)[0]), np.asarray(base_frozen))


def test_wan_dpo_step(monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    mcfg = WanMOTConfig.tiny(in_channels=8, out_channels=4)
    cfg = WanTrainStepConfig(model=mcfg, remat=False)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_wan_mot(jax.random.PRNGKey(0), mcfg)
        tx = get_optimizer("adamw", get_lr_schedule("constant", 1e-3))
        init_fn, step_fn = make_wan_dpo_step(cfg, tx, lora_rank=2, lora_alpha=2.0)
        lora, opt_state = init_fn(params, jax.random.PRNGKey(1))

        B, F, H, W = 1, 2, 4, 4  # per half; batch rows are 2B (win + lose)
        T = mcfg.text_len
        k = jax.random.PRNGKey(2)
        batch = {
            "latents": jax.random.normal(k, (2 * B, F, H, W, 4)),
            "condition": jax.random.normal(k, (2 * B, F, H, W, 4)),
            "latents_mot_ref": jax.random.normal(k, (2 * B, F, H, W, 4)),
            "condition_mot_ref": jax.random.normal(k, (2 * B, F, H, W, 4)),
            "encoder_hidden_states": jax.random.normal(k, (2 * B, T, mcfg.text_dim)),
            "encoder_hidden_states_mot_ref": jax.random.normal(k, (2 * B, T, mcfg.text_dim)),
            "encoder_hidden_states_image": jax.random.normal(k, (2 * B, 5, mcfg.image_dim)),
            "encoder_hidden_states_image_mot_ref": jax.random.normal(k, (2 * B, 5, mcfg.image_dim)),
            "dpo_weight": jnp.ones((B,)),
        }
        step = jax.jit(step_fn)
        before = [np.asarray(x).copy() for x in jax.tree.leaves(lora)]
        for _ in range(2):
            lora, opt_state, metrics = step(lora, params, opt_state, batch, jax.random.PRNGKey(7))
        assert np.isfinite(float(metrics["loss"]))
        after = jax.tree.leaves(lora)
        assert any(not np.array_equal(a, np.asarray(b)) for a, b in zip(before, after))
