"""Wan trainer end-to-end smoke test: synthetic dataset -> spec preprocessing
-> flow-matching train steps (tiny configs, CPU)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.data.video import export_to_video
from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
from vap_tpu.models.text_encoders.clip_vision import CLIPVisionConfig, init_clip_vision
from vap_tpu.models.wan import WanMOTConfig, init_wan_mot
from vap_tpu.models.wan.vae import WanVAEConfig
from vap_tpu.training.args import TrainingArgs
from vap_tpu.training.specs import WanSpec
from vap_tpu.training.trainer import SFTTrainer


class FakeTokenizer:
    def __call__(self, texts, padding=None, max_length=16, truncation=True,
                 add_special_tokens=True, return_tensors="np"):
        ids = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t[:max_length]):
                ids[i, j] = (ord(ch) * 3 + j) % 127 + 1
        return {"input_ids": ids, "attention_mask": (ids > 0).astype(np.int32)}


def _make_dataset_dir(tmp_path, n=3):
    import pandas as pd

    vids = []
    for i in range(n):
        frames = (np.random.default_rng(i).uniform(0, 1, (9, 32, 32, 3)) * 255).astype(np.uint8)
        p = tmp_path / f"w{i}.mp4"
        export_to_video(frames, str(p), fps=16)
        vids.append(f"w{i}.mp4")
    rows = [{
        "video_paths": v, "tar_video_caption": f"wan cap {i}",
        "ref_video_paths": json.dumps([vids[(i + 1) % n]]),
        "kind": "fx", "split": "train", "reference_alignment_score": 9.0,
    } for i, v in enumerate(vids)]
    pd.DataFrame(rows).to_csv(tmp_path / "vap_data.csv", index=False)
    return tmp_path


def _wan_vae_params(cfg):
    import sys
    sys.path.insert(0, "/root/reference/diffusers/src")
    import torch
    from diffusers.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan
    from vap_tpu.models.wan.vae_weights import convert_wan_vae_state_dict

    torch.manual_seed(0)
    m = AutoencoderKLWan(base_dim=cfg.base_dim, z_dim=cfg.z_dim, dim_mult=list(cfg.dim_mult),
                         num_res_blocks=cfg.num_res_blocks,
                         latents_mean=list(cfg.latents_mean), latents_std=list(cfg.latents_std))
    return convert_wan_vae_state_dict({k: v.numpy() for k, v in m.state_dict().items()}, cfg)


@pytest.mark.slow
def test_wan_trainer_end_to_end(tmp_path, monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    root = _make_dataset_dir(tmp_path)

    vae_cfg = WanVAEConfig.tiny()
    t_cfg = WanMOTConfig.tiny(
        in_channels=vae_cfg.z_dim + 4 + vae_cfg.z_dim, out_channels=vae_cfg.z_dim,
        text_len=16,
    )
    txt_cfg = T5Config.tiny(d_model=t_cfg.text_dim, per_layer_relative_bias=True)
    clip_cfg = CLIPVisionConfig.tiny(hidden_size=t_cfg.image_dim)
    key = jax.random.PRNGKey(0)
    params = {
        "transformer": init_wan_mot(key, t_cfg, jnp.float32),
        "vae": _wan_vae_params(vae_cfg),
        "text_encoder": init_t5_encoder(jax.random.fold_in(key, 1), txt_cfg, jnp.float32),
        "image_encoder": init_clip_vision(jax.random.fold_in(key, 2), clip_cfg, jnp.float32),
    }
    spec = WanSpec(t_cfg, vae_cfg, txt_cfg, params, FakeTokenizer(), clip_cfg, jnp.float32)
    spec.prepare_conditions = (
        lambda s, _o=spec.prepare_conditions: _o(s, max_length=t_cfg.text_len))

    args = TrainingArgs(
        model_name="wan", data_root=str(root), train_steps=2, batch_size=1,
        logging_steps=1, checkpointing_steps=10, output_dir=str(tmp_path / "out"),
        video_resolution_buckets=((9, 32, 32),), lr=1e-4,
        gradient_checkpointing=False, mask_caption_ratio=0.0,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        trainer = SFTTrainer(args, spec)
        state = trainer.run()
    assert state.step == 2
    assert all(np.isfinite(h["loss"]) for h in trainer.tracker.history)


def test_build_wan_mot_from_base():
    """Cloning a stock Wan checkpoint into the MoT expert branch (reference
    wan/base_specification.py:599-633): every `X_mot_ref` equals its base `X`,
    the result converts without missing keys, and a finetuned MoT checkpoint
    passes through untouched."""
    from vap_tpu.models.wan import convert_wan_mot_state_dict
    from vap_tpu.training.export_flatten import flatten_wan_mot_state_dict
    from vap_tpu.training.specs import build_wan_mot_state_dict_from_base

    cfg = WanMOTConfig.tiny(block_idx_with_mot_ref=(0,),
                            reference_train_mode="reference_independent")
    full = flatten_wan_mot_state_dict(
        init_wan_mot(jax.random.PRNGKey(0), cfg, jnp.float32), cfg)
    base = {k: np.asarray(v) for k, v in full.items() if "_mot_ref" not in k}

    out = build_wan_mot_state_dict_from_base(base, cfg)
    convert_wan_mot_state_dict(out, cfg, jnp.float32)  # no KeyError

    np.testing.assert_array_equal(out["patch_embedding_mot_ref.weight"],
                                  base["patch_embedding.weight"])
    np.testing.assert_array_equal(
        out["condition_embedder_mot_ref.time_embedder.linear_1.weight"],
        base["condition_embedder.time_embedder.linear_1.weight"])
    for sub in ("attn1", "attn2", "norm2", "ffn", "scale_shift_table"):
        src = [k for k in base if k.startswith(f"blocks.0.{sub}")
               and "_mot_ref" not in k]
        assert src, sub
        for k in src:
            tgt = k.replace(f"blocks.0.{sub}", f"blocks.0.{sub}_mot_ref", 1)
            np.testing.assert_array_equal(out[tgt], base[k], err_msg=tgt)
    np.testing.assert_array_equal(out["proj_out_mot_ref.weight"],
                                  base["proj_out.weight"])
    np.testing.assert_array_equal(out["scale_shift_table_mot_ref"],
                                  base["scale_shift_table"])
    # block 1 has no MoT branch — nothing invented for it
    assert not any(k.startswith("blocks.1.") and "_mot_ref" in k for k in out)

    # a checkpoint that already carries the MoT branch keeps it verbatim
    kept = build_wan_mot_state_dict_from_base(dict(full), cfg)
    assert set(kept) == set(full)
    for k in full:
        assert kept[k] is full[k], k

    # a PARTIAL MoT checkpoint (trained with fewer MoT blocks than the new
    # config asks for) heals: existing branch kept, missing blocks cloned
    # from the trunk (same semantics as the CogVideoX path, train.py)
    import dataclasses

    wider = dataclasses.replace(cfg, block_idx_with_mot_ref=(0, 1))
    healed = build_wan_mot_state_dict_from_base(dict(full), wider)
    assert healed["blocks.0.attn1_mot_ref.to_q.weight"] is full["blocks.0.attn1_mot_ref.to_q.weight"]
    np.testing.assert_array_equal(healed["blocks.1.attn1_mot_ref.to_q.weight"],
                                  full["blocks.1.attn1.to_q.weight"])
    convert_wan_mot_state_dict(healed, wider, jnp.float32)  # no KeyError


def test_wan_forward_runs_all_mot_segments():
    """Plain (trunk-only) sampling of a partial-MoT checkpoint must run every
    block: params carry one stacked segment per contiguous has_mot run, and
    wan_forward over them equals the single-segment plain model built from the
    same trunk weights."""
    import dataclasses

    from vap_tpu.models.wan import (convert_wan_mot_state_dict,
                                    convert_wan_state_dict)
    from vap_tpu.models.wan.transformer_mot import wan_forward
    from vap_tpu.training.export_flatten import flatten_wan_mot_state_dict

    cfg = WanMOTConfig.tiny(block_idx_with_mot_ref=(1,))
    assert len(cfg.mot_segments) == 2  # (0,1,False), (1,1,True)
    sd = flatten_wan_mot_state_dict(
        init_wan_mot(jax.random.PRNGKey(3), cfg, jnp.float32), cfg)
    mot_params = convert_wan_mot_state_dict(sd, cfg, jnp.float32)

    plain_cfg = dataclasses.replace(cfg, block_idx_with_mot_ref=())
    plain_params = convert_wan_state_dict(
        {k: v for k, v in sd.items() if "_mot_ref" not in k}, plain_cfg, jnp.float32)
    assert len(plain_params["blocks"]) == 1

    rng = np.random.default_rng(0)
    kwargs = dict(
        hidden_states=jnp.asarray(rng.standard_normal((1, 2, 8, 8, cfg.in_channels), np.float32)),
        timestep=jnp.asarray([500.0], jnp.float32),
        encoder_hidden_states=jnp.asarray(
            rng.standard_normal((1, cfg.text_len, cfg.text_dim), np.float32)),
        encoder_hidden_states_image=jnp.asarray(
            rng.standard_normal((1, 5, cfg.image_dim), np.float32)),
    )
    with jax.default_device(jax.devices("cpu")[0]):
        got = wan_forward(mot_params, cfg, **kwargs)
        want = wan_forward(plain_params, plain_cfg, **kwargs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
