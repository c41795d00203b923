"""Control training: input-layer widening, control signals, train step."""

import numpy as np
import jax
import jax.numpy as jnp

from vap_tpu.models.cogvideox import CogVideoXMOTConfig, init_cogvideox_mot
from vap_tpu.training import get_lr_schedule, get_optimizer
from vap_tpu.training.control import (
    ControlTrainStepConfig,
    canny_control,
    expand_patch_embed_for_control,
    frame_conditioning_control,
    make_control_train_step,
)


def test_expand_patch_embed():
    cfg = CogVideoXMOTConfig.tiny(in_channels=4)
    params = init_cogvideox_mot(jax.random.PRNGKey(0), cfg)
    old = params["patch_embed"]["proj"]["kernel"]
    out = expand_patch_embed_for_control(params, extra_in_features=old.shape[0])
    new = out["patch_embed"]["proj"]["kernel"]
    assert new.shape[0] == 2 * old.shape[0]
    np.testing.assert_array_equal(np.asarray(new[: old.shape[0]]), np.asarray(old))
    assert float(jnp.abs(new[old.shape[0]:]).max()) == 0.0


def test_control_signals():
    video = np.random.default_rng(0).uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
    edges = canny_control(video)
    assert edges.shape == video.shape and -1.01 <= edges.min() and edges.max() <= 1.01
    fc = frame_conditioning_control(video, "first")
    np.testing.assert_array_equal(fc[3], video[0])


def test_control_train_step(monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    # widened model: in = 2 latents + 2 control channels
    mcfg = CogVideoXMOTConfig.tiny(in_channels=4, out_channels=2)
    cfg = ControlTrainStepConfig(model=mcfg, remat=False)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_cogvideox_mot(jax.random.PRNGKey(0), mcfg)
        tx = get_optimizer("adamw", get_lr_schedule("constant", 1e-3))
        init_fn, step_fn = make_control_train_step(cfg, tx)
        train_p, frozen_p, opt_state = init_fn(params)
        step = jax.jit(step_fn)

        B, F, C, H, W = 1, 2, 2, 4, 4
        k = jax.random.PRNGKey(1)
        batch = {
            "latents": jax.random.normal(k, (B, F, C, H, W)),
            "control_latents": jax.random.normal(k, (B, F, C, H, W)),
            "encoder_hidden_states": jax.random.normal(k, (B, mcfg.max_text_seq_length, mcfg.text_embed_dim)),
        }
        losses = []
        for _ in range(5):
            train_p, opt_state, metrics = step(train_p, frozen_p, opt_state, batch, jax.random.PRNGKey(5))
            losses.append(float(metrics["loss"]))
        assert min(losses[1:]) < losses[0], losses
