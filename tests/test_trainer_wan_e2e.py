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
