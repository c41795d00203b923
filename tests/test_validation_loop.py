"""Trainer validation loop: JSON config parsing (csv pointer + generation
params + num_samples) and end-to-end sampling artifacts — VERDICT round-1
weak #7 (hardcoded num_samples=1, ignored generation params)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.data.video import export_to_video
from vap_tpu.models.cogvideox import CogVideoXMOTConfig, init_cogvideox_mot
from vap_tpu.models.cogvideox.vae import CogVideoXVAEConfig, init_cogvideox_vae
from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
from vap_tpu.training.args import TrainingArgs
from vap_tpu.training.specs import CogVideoXSpec
from vap_tpu.training.trainer import SFTTrainer


class FakeTokenizer:
    def __call__(self, texts, padding=None, max_length=16, truncation=True,
                 add_special_tokens=True, return_tensors="np"):
        ids = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t[:max_length]):
                ids[i, j] = (ord(ch) * 5 + j) % 127 + 1
        return {"input_ids": ids, "attention_mask": (ids > 0).astype(np.int32)}


def _benchmark_csv(tmp_path, n=3):
    import pandas as pd

    vids = []
    for i in range(n):
        frames = (np.random.default_rng(i).uniform(0, 1, (9, 32, 32, 3)) * 255).astype(np.uint8)
        export_to_video(frames, str(tmp_path / f"b{i}.mp4"), fps=16)
        vids.append(f"b{i}.mp4")
    rows = [{
        "video_paths": v, "tar_video_caption": f"val cap {i}",
        "ref_video_paths": json.dumps([vids[(i + 1) % n]]),
        "kind": "fx", "split": "validation", "reference_alignment_score": 9.0,
    } for i, v in enumerate(vids)]
    pd.DataFrame(rows).to_csv(tmp_path / "benchmark.csv", index=False)
    return str(tmp_path / "benchmark.csv")


def _tiny_trainer(tmp_path, validation_file):
    t_cfg = CogVideoXMOTConfig.tiny(in_channels=8, out_channels=4)
    vae_cfg = CogVideoXVAEConfig.tiny()
    txt_cfg = T5Config.tiny(d_model=t_cfg.text_embed_dim)
    key = jax.random.PRNGKey(0)
    params = {
        "transformer": init_cogvideox_mot(key, t_cfg, jnp.float32),
        "vae": init_cogvideox_vae(jax.random.fold_in(key, 1), vae_cfg, jnp.float32),
        "text_encoder": init_t5_encoder(jax.random.fold_in(key, 2), txt_cfg, jnp.float32),
    }
    spec = CogVideoXSpec(t_cfg, vae_cfg, txt_cfg, params, FakeTokenizer(), jnp.float32)
    spec.prepare_conditions = (
        lambda s, _o=spec.prepare_conditions: _o(s, max_length=t_cfg.max_text_seq_length))
    args = TrainingArgs(
        data_root=str(tmp_path), train_steps=1, batch_size=1,
        output_dir=str(tmp_path / "out"), video_resolution_buckets=((9, 32, 32),),
        gradient_checkpointing=False, mask_caption_ratio=0.0,
        validation_dataset_file=validation_file,
    )
    return SFTTrainer(args, spec)


def test_load_validation_config_json(tmp_path):
    csv = _benchmark_csv(tmp_path)
    vjson = tmp_path / "validation.json"
    vjson.write_text(json.dumps({
        "csv": "benchmark.csv", "num_frames": 9, "height": 32, "width": 32,
        "num_inference_steps": 2, "guidance_scale": 3.5, "use_dynamic_cfg": False,
        "num_samples": 2,
    }))
    trainer = _tiny_trainer(tmp_path, str(vjson))
    csv_path, gen, n = trainer._load_validation_config()
    assert csv_path == csv
    assert gen["num_inference_steps"] == 2 and gen["guidance_scale"] == 3.5
    assert gen["height"] == 32 and n == 2


def test_load_validation_config_bare_csv(tmp_path):
    csv = _benchmark_csv(tmp_path)
    trainer = _tiny_trainer(tmp_path, csv)
    csv_path, gen, n = trainer._load_validation_config()
    assert csv_path == csv and gen == {} and n is None


def test_resolve_val_limit(tmp_path, caplog):
    """An unset cap defaults to 1 but warns with the skipped row count; "all"
    (or -1) disables the cap — matching the reference's every-row behavior
    (sft_trainer/trainer.py:939-1110)."""
    import logging

    csv = _benchmark_csv(tmp_path)
    trainer = _tiny_trainer(tmp_path, csv)
    assert trainer._resolve_val_limit(2, 3) == 2
    assert trainer._resolve_val_limit("all", 3) is None
    assert trainer._resolve_val_limit(-1, 3) is None
    with caplog.at_level(logging.WARNING):
        assert trainer._resolve_val_limit(None, 3) == 1
    assert any("1 of 3" in r.getMessage() for r in caplog.records)


@pytest.mark.slow
def test_validate_all_samples(tmp_path, monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    _benchmark_csv(tmp_path)  # 3 rows
    vjson = tmp_path / "validation.json"
    vjson.write_text(json.dumps({
        "csv": "benchmark.csv", "num_frames": 9, "height": 32, "width": 32,
        "num_inference_steps": 1, "num_samples": "all",
    }))
    with jax.default_device(jax.devices("cpu")[0]):
        trainer = _tiny_trainer(tmp_path, str(vjson))
        trainer._validate(jax.random.PRNGKey(0))
    out_dir = os.path.join(trainer.args.output_dir, "validation", "000000")
    written = sorted(os.listdir(out_dir))
    assert written == ["sample_0.mp4", "sample_1.mp4", "sample_2.mp4"]


@pytest.mark.slow
def test_validate_writes_samples_with_gen_params(tmp_path, monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    _benchmark_csv(tmp_path)
    vjson = tmp_path / "validation.json"
    vjson.write_text(json.dumps({
        "csv": "benchmark.csv", "num_frames": 9, "height": 32, "width": 32,
        "num_inference_steps": 2, "guidance_scale": 3.0, "use_dynamic_cfg": True,
        "num_samples": 2,
    }))
    with jax.default_device(jax.devices("cpu")[0]):
        trainer = _tiny_trainer(tmp_path, str(vjson))
        trainer._validate(jax.random.PRNGKey(0))
    out_dir = os.path.join(trainer.args.output_dir, "validation", "000000")
    written = sorted(os.listdir(out_dir))
    assert written == ["sample_0.mp4", "sample_1.mp4"]  # num_samples honored


def test_validate_generic_family_flux(tmp_path, monkeypatch):
    """Generic families must support prompt-driven validation through their
    own pipelines (reference: every spec has a validation path); previously
    _validate assumed the VAP CSV dataset and broke for flux/ltx/cogview4/
    hunyuan."""
    import cv2

    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    from vap_tpu.models.autoencoder_kl import AutoencoderKLConfig, init_autoencoder_kl
    from vap_tpu.models.flux import FluxConfig, init_flux
    from vap_tpu.models.text_encoders.clip_text import CLIPTextConfig, init_clip_text
    from vap_tpu.training.specs import FluxSpec

    root = tmp_path / "data"
    root.mkdir()
    for i in range(2):
        img = (np.random.default_rng(i).uniform(0, 255, (32, 32, 3))).astype(np.uint8)
        cv2.imwrite(str(root / f"s{i}.png"), img)
        (root / f"s{i}.txt").write_text(f"an image {i}")

    val = {"num_samples": 2, "data": [
        {"caption": "a red square", "height": 32, "width": 32,
         "num_inference_steps": 1},
        {"caption": "a blue circle", "height": 32, "width": 32,
         "num_inference_steps": 1, "guidance_scale": 2.0},
    ]}
    val_path = tmp_path / "validation.json"
    val_path.write_text(json.dumps(val))

    vae_cfg = AutoencoderKLConfig.tiny()
    t_cfg = FluxConfig.tiny(in_channels=4 * vae_cfg.latent_channels)
    txt_cfg = T5Config.tiny(d_model=t_cfg.joint_attention_dim)
    clip_cfg = CLIPTextConfig.tiny(hidden_size=t_cfg.pooled_projection_dim,
                                   num_attention_heads=4, vocab_size=64,
                                   max_position_embeddings=77)
    key = jax.random.PRNGKey(0)
    params = {
        "transformer": init_flux(key, t_cfg, jnp.float32),
        "vae": init_autoencoder_kl(jax.random.fold_in(key, 1), vae_cfg, jnp.float32),
        "text_encoder": init_clip_text(jax.random.fold_in(key, 2), clip_cfg, jnp.float32),
        "text_encoder_2": init_t5_encoder(jax.random.fold_in(key, 3), txt_cfg, jnp.float32),
    }
    spec = FluxSpec(t_cfg, vae_cfg, txt_cfg, params, FakeTokenizer(),
                    FakeTokenizer(), clip_cfg, jnp.float32)
    spec.prepare_conditions = (
        lambda s, _o=spec.prepare_conditions: _o(s, max_length=8, clip_max_length=8))

    args = TrainingArgs(
        data_root=str(root), train_steps=1, batch_size=1, logging_steps=1,
        checkpointing_steps=100, output_dir=str(tmp_path / "out"), lr=1e-4,
        gradient_checkpointing=False, mask_caption_ratio=0.0,
        image_resolution_buckets=((32, 32),),
        validation_dataset_file=str(val_path), validation_steps=1,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        trainer = SFTTrainer(args, spec)
        trainer.run()
    out_dir = tmp_path / "out" / "validation"
    steps = os.listdir(out_dir)
    assert steps, "no validation directory written"
    samples = os.listdir(out_dir / steps[0])
    assert sorted(samples) == ["sample_0.mp4", "sample_1.mp4"], samples
