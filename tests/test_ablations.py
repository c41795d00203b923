"""Paper-ablation training paths (reference sft_trainer/config.py:102-108 and
examples/training/sft/cogvideox/vap_mot/ablation/): single-branch trunk,
LoRA training type, data-scaling truncation, target-module parsing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.cogvideox import CogVideoXMOTConfig, init_cogvideox_mot
from vap_tpu.training.optimizer import get_lr_schedule, get_optimizer
from vap_tpu.training.train_step import (
    TrainStepConfig,
    cogvideox_vap_loss,
    make_lora_sft_step,
    parse_target_modules,
)


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


def test_parse_target_modules():
    ref_regex = ("(transformer_blocks|single_transformer_blocks)"
                 ".*(to_q|to_k|to_v|to_out.0|ff.net.0.proj|ff.net.2)")
    assert parse_target_modules(ref_regex) == (
        "net_0", "net_2", "to_k", "to_out", "to_q", "to_v")
    assert parse_target_modules("none") == ()
    assert parse_target_modules("") == ()
    assert len(parse_target_modules("default")) == 6
    with pytest.raises(ValueError):
        parse_target_modules("lm_head")


def test_single_branch_loss_runs_without_mot_params():
    """ablation_single_branch trains a plain trunk over [target ‖ refs]
    (reference base_specification.py:758-784): params have no MoT branch."""
    mcfg = CogVideoXMOTConfig.tiny(in_channels=4, out_channels=2,
                                   block_idx_with_mot_ref=())
    params = init_cogvideox_mot(jax.random.PRNGKey(0), mcfg)
    # no per-block MoT expert exists with block_idx_with_mot_ref=()
    assert not any("_mot_ref" in str(k)
                   for seg in params["blocks"]
                   for k, _ in jax.tree_util.tree_flatten_with_path(seg)[0])
    cfg = TrainStepConfig(model=mcfg, remat=False, ablation_single_branch=True)
    loss, metrics = jax.jit(lambda p, b, k: cogvideox_vap_loss(p, cfg, b, k))(
        params, _batch(mcfg, jax.random.PRNGKey(1)), jax.random.PRNGKey(7))
    assert np.isfinite(float(loss))

    # baseline_single_condition: refs dropped entirely -> same target loss shape
    cfg_b = TrainStepConfig(model=mcfg, remat=False, ablation_single_branch=True,
                            baseline_single_condition=True)
    loss_b, _ = jax.jit(lambda p, b, k: cogvideox_vap_loss(p, cfg_b, b, k))(
        params, _batch(mcfg, jax.random.PRNGKey(1)), jax.random.PRNGKey(7))
    assert np.isfinite(float(loss_b))
    assert abs(float(loss) - float(loss_b)) > 0  # refs do influence the loss


def test_lora_sft_step_trains_only_adapters():
    mcfg = CogVideoXMOTConfig.tiny(in_channels=4, out_channels=2,
                                   block_idx_with_mot_ref=())
    params = init_cogvideox_mot(jax.random.PRNGKey(0), mcfg)
    cfg = TrainStepConfig(model=mcfg, remat=False, ablation_single_branch=True)
    tx = get_optimizer("adamw", get_lr_schedule("constant", 1e-3))
    init_fn, _, _, step_fn = make_lora_sft_step(
        cogvideox_vap_loss, cfg, tx, rank=2, alpha=2.0,
        targets=parse_target_modules("to_q|to_k|to_v|to_out.0"))
    lora, base, opt = init_fn(params, jax.random.PRNGKey(1))
    step = jax.jit(step_fn)
    batch = _batch(mcfg, jax.random.PRNGKey(2))
    losses = []
    for _ in range(4):
        lora, opt, metrics = step(lora, base, opt, batch, jax.random.PRNGKey(7))
        losses.append(float(metrics["loss"]))
    assert min(losses[1:]) < losses[0], losses
    # base params are never rebound — only the adapter tree updates
    np.testing.assert_array_equal(
        np.asarray(base["proj_out"]["kernel"]),
        np.asarray(params["proj_out"]["kernel"]))


def test_scaling_data_num_truncates_dataset(tmp_path):
    import json as _json

    import pandas as pd

    from vap_tpu.data.dataset import VideoAsPromptDataset

    rows = [{
        "video_paths": f"v{i}.mp4", "tar_video_caption": f"cap {i}",
        "ref_video_paths": _json.dumps([f"v{(i + 1) % 8}.mp4"]),
        "kind": "fx", "split": "train", "reference_alignment_score": 9.0,
    } for i in range(8)]
    pd.DataFrame(rows).to_csv(tmp_path / "vap_data.csv", index=False)
    full = VideoAsPromptDataset(str(tmp_path), ablation_scaling_data_num=99)
    cut = VideoAsPromptDataset(str(tmp_path), ablation_scaling_data_num=3)
    assert len(full.rows) == 8
    assert len(cut.rows) == 3
