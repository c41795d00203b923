"""Training step: MoT-only trainability, loss decreases, reference_independent mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import optax

from vap_tpu.models.cogvideox import CogVideoXMOTConfig, init_cogvideox_mot
from vap_tpu.training import (
    TrainStepConfig,
    get_lr_schedule,
    get_optimizer,
    make_train_step,
    trainable_mask,
)
from vap_tpu.training.train_step import merge_params, partition_params


def _tiny_batch(key, cfg: CogVideoXMOTConfig, num_ref=1):
    B, F, C2, H, W = 1, 2, cfg.in_channels, 4, 4
    C = C2 // 2
    T = cfg.max_text_seq_length
    ks = jax.random.split(key, 6)
    return {
        "latents": jax.random.normal(ks[0], (B, F, C, H, W)),
        "image_latents": jax.random.normal(ks[1], (B, F, C, H, W)),
        "latents_mot_ref": jax.random.normal(ks[2], (B, num_ref * F, C, H, W)),
        "image_latents_mot_ref": jax.random.normal(ks[3], (B, num_ref * F, C, H, W)),
        "encoder_hidden_states": jax.random.normal(ks[4], (B, T, cfg.text_embed_dim)),
        "encoder_hidden_states_mot_ref": jax.random.normal(ks[5], (B, num_ref * T, cfg.text_embed_dim)),
    }


def test_trainable_mask_selects_mot_only():
    cfg = CogVideoXMOTConfig.tiny(num_ref_embeddings=2, supported_effect_types=("a",))
    params = init_cogvideox_mot(jax.random.PRNGKey(0), cfg)
    mask = trainable_mask(params)
    n_train = sum(int(np.prod(p.shape)) for p, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask)) if m)
    n_total = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 0 < n_train < n_total
    # the frozen base must include attn1/ff/norm_final; trainable must include _mot_ref analogs
    train, frozen = partition_params(params, mask)
    assert train["patch_embed_mot_ref"]["proj"]["kernel"] is not None
    assert frozen["patch_embed"]["proj"]["kernel"] is not None
    assert train["patch_embed"]["proj"]["kernel"] is None
    merged = merge_params(train, frozen)
    chex_equal = jax.tree.all(jax.tree.map(lambda a, b: bool(jnp.all(a == b)), merged, params))
    assert chex_equal


@pytest.mark.parametrize("ref_mode", [None, "reference_independent"])
def test_train_step_decreases_loss(monkeypatch, ref_mode):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    mcfg = CogVideoXMOTConfig.tiny(in_channels=4, out_channels=2, reference_train_mode=ref_mode)
    cfg = TrainStepConfig(model=mcfg, reference_train_mode=ref_mode, remat=True)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_cogvideox_mot(jax.random.PRNGKey(0), mcfg)
        tx = get_optimizer("adamw", get_lr_schedule("constant", 1e-3))
        init_fn, step_fn = make_train_step(cfg, tx)
        train_p, frozen_p, opt_state = init_fn(params)
        step = jax.jit(step_fn)

        batch = _tiny_batch(jax.random.PRNGKey(1), mcfg)
        base_frozen = jax.tree.leaves(frozen_p)[0].copy()
        losses = []
        for i in range(8):
            train_p, opt_state, metrics = step(train_p, frozen_p, opt_state, batch, jax.random.PRNGKey(42))
            losses.append(float(metrics["loss"]))
        # same batch + same key: loss must drop as the MoT expert fits it
        assert min(losses[1:]) < losses[0], losses
        assert float(metrics["grad_norm"]) > 0
        # frozen params untouched
        np.testing.assert_array_equal(np.asarray(jax.tree.leaves(frozen_p)[0]), np.asarray(base_frozen))
