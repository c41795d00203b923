"""Checkpoint/resume via orbax + safetensors export/roundtrip."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.cogvideox import (
    CogVideoXMOTConfig,
    convert_cogvideox_mot_state_dict,
    init_cogvideox_mot,
)
from vap_tpu.training.checkpoint import (
    Checkpointer,
    TrainState,
    export_safetensors,
    load_safetensors,
)


def test_orbax_save_restore(tmp_path):
    cfg = CogVideoXMOTConfig.tiny()
    params = init_cogvideox_mot(jax.random.PRNGKey(0), cfg)
    opt_state = {"mu": jax.tree.map(jnp.zeros_like, params["proj_out"])}

    ckpt = Checkpointer(str(tmp_path / "ckpts"), checkpointing_limit=2, async_save=False)
    ckpt.save(10, params=params, opt_state=opt_state,
              train_state=TrainState(step=10, observed_data_samples=80),
              dataloader_state={"sample_index": 5})
    ckpt.save(20, params=params, opt_state=opt_state, train_state=TrainState(step=20))
    ckpt.wait()
    assert ckpt.latest_step() == 20

    restored = ckpt.restore(10, params_template=params, opt_state_template=opt_state)
    assert restored["train_state"].step == 10
    assert restored["dataloader_state"]["sample_index"] == 5
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["proj_out"]["kernel"]),
        np.asarray(params["proj_out"]["kernel"]))


def test_checkpoint_retention(tmp_path):
    cfg = CogVideoXMOTConfig.tiny(num_layers=1, block_idx_with_mot_ref=(0,))
    params = init_cogvideox_mot(jax.random.PRNGKey(0), cfg)
    ckpt = Checkpointer(str(tmp_path / "c"), checkpointing_limit=2, async_save=False)
    for s in (1, 2, 3):
        ckpt.save(s, params=params)
    ckpt.wait()
    steps = sorted(int(d) for d in os.listdir(tmp_path / "c") if d.isdigit())
    assert steps == [2, 3]


def test_safetensors_export_roundtrip(tmp_path, torch_reference):
    """Export to the HF layout and reload through the converter: identity."""
    cfg = CogVideoXMOTConfig.tiny(
        num_ref_embeddings=2, supported_effect_types=("fx",),
        reference_train_mode="reference_independent",
    )
    params = init_cogvideox_mot(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "model.safetensors")
    export_safetensors(params, cfg, path)

    sd = load_safetensors(path)
    assert "transformer_blocks.0.attn1_mot_ref.to_q.weight" in sd
    reloaded = convert_cogvideox_mot_state_dict(sd, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(reloaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_checkpoint_8bit_opt_state_roundtrip(tmp_path):
    """int8 NamedTuple optimizer state must survive orbax save/restore
    (resume path for adam-8bit runs)."""
    import jax.numpy as jnp
    from vap_tpu.training.optimizer import get_lr_schedule, get_optimizer

    params = {"w": jnp.arange(100, dtype=jnp.float32).reshape(10, 10)}
    tx = get_optimizer("adamw-8bit", get_lr_schedule("constant", 1e-3))
    opt_state = tx.init(params)
    import optax
    u, opt_state = tx.update({"w": jnp.ones((10, 10)) * 0.3}, opt_state, params)
    params = optax.apply_updates(params, u)

    ckpt = Checkpointer(str(tmp_path / "c8"), async_save=False)
    ckpt.save(1, params=params, opt_state=opt_state)
    ckpt.wait()
    restored = ckpt.restore(1, params_template=params, opt_state_template=opt_state)
    for a, b in zip(jax.tree.leaves(restored["opt_state"]), jax.tree.leaves(opt_state)):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed state continues stepping
    u2, _ = tx.update({"w": jnp.ones((10, 10)) * 0.3}, restored["opt_state"], restored["params"])
    assert np.isfinite(np.asarray(u2["w"])).all()
