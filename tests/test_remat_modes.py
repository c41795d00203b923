"""Selective activation checkpointing (reference utils/activation_checkpoint
.py:21-90): all remat modes must produce identical gradients — they only trade
memory for recompute."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.cogvideox import CogVideoXMOTConfig, init_cogvideox_mot
from vap_tpu.training.args import TrainingArgs
from vap_tpu.training.train_step import TrainStepConfig, cogvideox_vap_loss


def _batch(mcfg, key):
    B, F, C, H, W = 1, 2, 2, 4, 4
    return {
        "latents": jax.random.normal(key, (B, F, C, H, W)),
        "image_latents": jax.random.normal(jax.random.fold_in(key, 1), (B, F, C, H, W)),
        "latents_mot_ref": jax.random.normal(jax.random.fold_in(key, 2), (B, F, C, H, W)),
        "image_latents_mot_ref": jax.random.normal(jax.random.fold_in(key, 3), (B, F, C, H, W)),
        "encoder_hidden_states": jax.random.normal(
            jax.random.fold_in(key, 4), (B, mcfg.max_text_seq_length, mcfg.text_embed_dim)),
        "encoder_hidden_states_mot_ref": jax.random.normal(
            jax.random.fold_in(key, 5), (B, mcfg.max_text_seq_length, mcfg.text_embed_dim)),
    }


def _mode_grads(modes):
    mcfg = CogVideoXMOTConfig.tiny(in_channels=4, out_channels=2,
                                   num_layers=4, block_idx_with_mot_ref=(0, 1, 2, 3))
    params = init_cogvideox_mot(jax.random.PRNGKey(0), mcfg)
    batch = _batch(mcfg, jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(7)
    grads = {}
    for mode in modes:
        cfg = TrainStepConfig(model=mcfg, remat=mode)
        grads[mode] = jax.jit(
            jax.grad(lambda p: cogvideox_vap_loss(p, cfg, batch, key)[0]))(params)
    return grads


def _assert_grads_equal(grads, base_mode, modes):
    base = jax.tree.leaves(grads[base_mode])
    for mode in modes:
        for a, b in zip(base, jax.tree.leaves(grads[mode])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_remat_full_grad_parity():
    """Fast half: the default 'full' per-block remat matches no-remat grads."""
    grads = _mode_grads((False, "full"))
    _assert_grads_equal(grads, False, ("full",))


@pytest.mark.slow
def test_remat_selective_modes_grad_parity():
    """Slow half (3 more compiled grad graphs): the selective modes — ops
    (dots_saveable) and block_skip:N — also match no-remat grads."""
    grads = _mode_grads((False, "ops", "block_skip:2", "block_skip:3"))
    _assert_grads_equal(grads, False, ("ops", "block_skip:2", "block_skip:3"))


def test_remat_mode_flag_mapping():
    assert TrainingArgs(gradient_checkpointing=False).remat_mode() is False
    assert TrainingArgs().remat_mode() == "full"
    assert TrainingArgs(checkpointing_type="ops").remat_mode() == "ops"
    assert TrainingArgs(checkpointing_type="block_skip",
                        checkpointing_n_layer=3).remat_mode() == "block_skip:3"
    with pytest.raises(ValueError):
        TrainingArgs(checkpointing_type="bogus").validate()
