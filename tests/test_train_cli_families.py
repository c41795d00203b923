"""train.py CLI dispatch for every family (VERDICT r2 missing #2: flux/
ltx_video/cogview4/hunyuan_video passed flag validation but fell into the wan
branch). Each test runs `train.main(argv)` for 2 steps on tiny configs fed
through a nested --model_structure_config JSON (reference train.py:26-101 +
finetrainers/config.py:48-84 dispatch every family from the CLI)."""

import dataclasses
import json
import os

import numpy as np
import jax
import pytest

import train as train_mod
from vap_tpu.data.video import export_to_video


class FakeTokenizer:
    def __call__(self, texts, padding=None, max_length=8, truncation=True,
                 add_special_tokens=True, return_tensors="np"):
        ids = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t[:max_length]):
                ids[i, j] = (ord(ch) * 3 + j) % 30 + 1
        return {"input_ids": ids, "attention_mask": (ids > 0).astype(np.int32)}


def _image_dataset(root, n=2):
    import cv2

    os.makedirs(root, exist_ok=True)
    for i in range(n):
        img = (np.random.default_rng(i).uniform(0, 255, (32, 32, 3))).astype(np.uint8)
        cv2.imwrite(os.path.join(root, f"s{i}.png"), img)
        with open(os.path.join(root, f"s{i}.txt"), "w") as f:
            f.write(f"an image {i}")
    return root


def _video_dataset(root, n=2):
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        fr = (np.random.default_rng(i).uniform(0, 1, (9, 32, 32, 3)) * 255).astype(np.uint8)
        export_to_video(fr, os.path.join(root, f"v{i}.mp4"), fps=16)
        with open(os.path.join(root, f"v{i}.txt"), "w") as f:
            f.write(f"a video {i}")
    return root


def _structure_json(tmp_path, **sections):
    path = str(tmp_path / "structure.json")
    with open(path, "w") as f:
        json.dump({k: dataclasses.asdict(v) for k, v in sections.items()}, f)
    return path


def _run(tmp_path, monkeypatch, model_name, structure, data_root, *, image=False,
         extra=()):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    monkeypatch.setattr(train_mod, "_tokenizer", lambda base, name="tokenizer": FakeTokenizer())
    argv = [
        "--model_name", model_name, "--training_type", "sft",
        "--data_root", data_root, "--output_dir", str(tmp_path / "out"),
        "--model_structure_config", structure,
        "--train_steps", "2", "--batch_size", "1", "--lr", "1e-4",
        "--logging_steps", "1", "--checkpointing_steps", "100",
        "--no-gradient_checkpointing", "--mask_caption_ratio", "0.0",
        "--transformer_dtype", "float32",
        "--video_resolution_buckets", "9x32x32",
        "--image_resolution_buckets", "32x32",
    ] + list(extra)
    with jax.default_device(jax.devices("cpu")[0]):
        train_mod.main(argv)
    # training ran to step 2 and exported weights
    assert os.path.isdir(tmp_path / "out" / "model_weights" / "000002")


def test_cli_flux(tmp_path, monkeypatch):
    from vap_tpu.models.autoencoder_kl import AutoencoderKLConfig
    from vap_tpu.models.flux import FluxConfig
    from vap_tpu.models.text_encoders import T5Config
    from vap_tpu.models.text_encoders.clip_text import CLIPTextConfig

    vae = AutoencoderKLConfig.tiny()
    t = FluxConfig.tiny(in_channels=4 * vae.latent_channels)
    structure = _structure_json(
        tmp_path,
        transformer=t, vae=vae,
        text_encoder=CLIPTextConfig.tiny(hidden_size=t.pooled_projection_dim,
                                         num_attention_heads=4, vocab_size=64,
                                         max_position_embeddings=77),
        text_encoder_2=T5Config.tiny(d_model=t.joint_attention_dim),
    )
    _run(tmp_path, monkeypatch, "flux", structure,
         _image_dataset(str(tmp_path / "data")), image=True)


def test_cli_cogview4(tmp_path, monkeypatch):
    from vap_tpu.models.autoencoder_kl import AutoencoderKLConfig
    from vap_tpu.models.cogview4 import CogView4Config
    from vap_tpu.models.text_encoders.glm import GlmConfig

    vae = AutoencoderKLConfig.tiny(use_quant_conv=True, use_post_quant_conv=True,
                                   shift_factor=None, scaling_factor=0.5)
    t = CogView4Config.tiny(in_channels=vae.latent_channels)
    structure = _structure_json(
        tmp_path, transformer=t, vae=vae,
        text_encoder=GlmConfig.tiny(hidden_size=t.text_embed_dim))
    _run(tmp_path, monkeypatch, "cogview4", structure,
         _image_dataset(str(tmp_path / "data")), image=True)


def test_cli_ltx_video(tmp_path, monkeypatch):
    from vap_tpu.models.ltx_video import LTXVideoConfig
    from vap_tpu.models.ltx_video.vae import LTXVideoVAEConfig
    from vap_tpu.models.text_encoders import T5Config

    vae = LTXVideoVAEConfig.tiny()
    t = LTXVideoConfig.tiny(in_channels=vae.latent_channels,
                            out_channels=vae.latent_channels)
    structure = _structure_json(
        tmp_path, transformer=t, vae=vae,
        text_encoder=T5Config.tiny(d_model=t.caption_channels))
    _run(tmp_path, monkeypatch, "ltx_video", structure,
         _video_dataset(str(tmp_path / "data")))


def test_cli_hunyuan_video(tmp_path, monkeypatch):
    from vap_tpu.models.hunyuan_video import HunyuanVideoConfig
    from vap_tpu.models.hunyuan_video.vae import HunyuanVideoVAEConfig
    from vap_tpu.models.text_encoders.clip_text import CLIPTextConfig
    from vap_tpu.models.text_encoders.llama import LlamaConfig

    vae = HunyuanVideoVAEConfig.tiny()
    llama = LlamaConfig.tiny()
    t = HunyuanVideoConfig.tiny(in_channels=vae.latent_channels,
                                out_channels=vae.latent_channels,
                                text_embed_dim=llama.hidden_size)
    structure = _structure_json(
        tmp_path, transformer=t, vae=vae, text_encoder=llama,
        text_encoder_2=CLIPTextConfig.tiny(hidden_size=t.pooled_projection_dim,
                                           num_attention_heads=4, vocab_size=64,
                                           max_position_embeddings=77))
    _run(tmp_path, monkeypatch, "hunyuan_video", structure,
         _video_dataset(str(tmp_path / "data")))


def test_cli_cogvideox_plain_t2v(tmp_path, monkeypatch):
    """Plain (no-MoT) cogvideox finetune on a generic video folder — the
    crush_smol-style recipe path (training.sh passes a structure json with
    block_idx_with_mot_ref=[]). T2V: in_channels == VAE latent channels."""
    from vap_tpu.models.cogvideox import CogVideoXMOTConfig
    from vap_tpu.models.cogvideox.vae import CogVideoXVAEConfig
    from vap_tpu.models.text_encoders import T5Config

    vae = CogVideoXVAEConfig.tiny()
    t = CogVideoXMOTConfig.tiny(in_channels=vae.latent_channels,
                                out_channels=vae.latent_channels,
                                block_idx_with_mot_ref=())
    structure = _structure_json(
        tmp_path, transformer=t, vae=vae,
        text_encoder=T5Config.tiny(d_model=t.text_embed_dim))
    # prompt-driven generic validation runs the PLAIN pipeline path mid-train
    val = tmp_path / "validation.json"
    val.write_text(json.dumps({"num_samples": 1, "data": [
        {"caption": "a toy car", "height": 32, "width": 32,
         "num_frames": 9, "num_inference_steps": 1}]}))
    _run(tmp_path, monkeypatch, "cogvideox", structure,
         _video_dataset(str(tmp_path / "data")),
         extra=("--validation_dataset_file", str(val),
                "--validation_steps", "2"))
    out_root = tmp_path / "out" / "validation"
    assert any(out_root.rglob("*.mp4")), "no validation sample written"


def test_cli_wan_plain_t2v_lora(tmp_path, monkeypatch):
    """Plain Wan T2V LoRA on a generic video folder (wan_t2v recipe path):
    no MoT blocks, no image cross-attention, LoRA over the base trunk. The
    wan branch refuses random-init VAEs, so a real tiny VAE checkpoint is
    shipped in the model dir."""
    import sys

    import torch
    from safetensors.numpy import save_file

    from vap_tpu.models.text_encoders import T5Config
    from vap_tpu.models.wan import WanMOTConfig
    from vap_tpu.models.wan.vae import WanVAEConfig

    vae = WanVAEConfig.tiny()
    t = WanMOTConfig.tiny(in_channels=vae.z_dim, out_channels=vae.z_dim,
                          block_idx_with_mot_ref=(),
                          image_dim=None, added_kv_proj_dim=None)
    structure = _structure_json(
        tmp_path, transformer=t, vae=vae,
        text_encoder=T5Config.tiny(d_model=t.text_dim))

    sys.path.insert(0, "/root/reference/diffusers/src")
    from diffusers.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan

    torch.manual_seed(0)
    m = AutoencoderKLWan(base_dim=vae.base_dim, z_dim=vae.z_dim,
                         dim_mult=list(vae.dim_mult),
                         num_res_blocks=vae.num_res_blocks,
                         latents_mean=list(vae.latents_mean),
                         latents_std=list(vae.latents_std))
    vae_dir = tmp_path / "model" / "vae"
    os.makedirs(vae_dir)
    save_file({k: v.numpy() for k, v in m.state_dict().items()},
              str(vae_dir / "diffusion_pytorch_model.safetensors"))

    _run(tmp_path, monkeypatch, "wan", structure,
         _video_dataset(str(tmp_path / "data")),
         extra=("--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
                "--pretrained_model_name_or_path", str(tmp_path / "model")))


def test_cli_wan_vap_from_stock_checkpoint(tmp_path, monkeypatch):
    """Wan VAP (MoT) training started from a STOCK Wan checkpoint: train.py
    must clone the trunk into the MoT expert branch (reference wan
    base_specification.py:599-633) instead of KeyError-ing on the missing
    `*_mot_ref` weights."""
    import json as _json

    import jax.numpy as jnp
    import pandas as pd
    import torch
    from safetensors.numpy import save_file

    from vap_tpu.models.text_encoders import T5Config
    from vap_tpu.models.text_encoders.clip_vision import CLIPVisionConfig
    from vap_tpu.models.wan import WanMOTConfig, init_wan_mot
    from vap_tpu.models.wan.vae import WanVAEConfig
    from vap_tpu.training.export_flatten import flatten_wan_mot_state_dict

    vae = WanVAEConfig.tiny()
    t = WanMOTConfig.tiny(in_channels=2 * vae.z_dim + 4, out_channels=vae.z_dim,
                          block_idx_with_mot_ref=(0,), text_len=8)
    clip = CLIPVisionConfig.tiny(hidden_size=t.image_dim)
    structure = _structure_json(
        tmp_path, transformer=t, vae=vae, image_encoder=clip,
        text_encoder=T5Config.tiny(d_model=t.text_dim, per_layer_relative_bias=True))

    # stock checkpoint: flatten a tiny MoT init and drop every _mot_ref weight
    full = flatten_wan_mot_state_dict(
        init_wan_mot(jax.random.PRNGKey(0), t, np.float32), t)
    stock = {k: np.asarray(v) for k, v in full.items() if "_mot_ref" not in k}
    tr_dir = tmp_path / "model" / "transformer"
    os.makedirs(tr_dir)
    save_file(stock, str(tr_dir / "diffusion_pytorch_model.safetensors"))

    import sys
    sys.path.insert(0, "/root/reference/diffusers/src")
    from diffusers.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan

    torch.manual_seed(0)
    m = AutoencoderKLWan(base_dim=vae.base_dim, z_dim=vae.z_dim,
                         dim_mult=list(vae.dim_mult),
                         num_res_blocks=vae.num_res_blocks,
                         latents_mean=list(vae.latents_mean),
                         latents_std=list(vae.latents_std))
    vae_dir = tmp_path / "model" / "vae"
    os.makedirs(vae_dir)
    save_file({k: v.numpy() for k, v in m.state_dict().items()},
              str(vae_dir / "diffusion_pytorch_model.safetensors"))

    # VAP CSV dataset (MoT training requires references)
    data = tmp_path / "data"
    os.makedirs(data)
    vids = []
    for i in range(2):
        fr = (np.random.default_rng(i).uniform(0, 1, (9, 32, 32, 3)) * 255).astype(np.uint8)
        export_to_video(fr, str(data / f"v{i}.mp4"), fps=16)
        vids.append(f"v{i}.mp4")
    pd.DataFrame([{
        "video_paths": v, "tar_video_caption": f"cap {i}",
        "ref_video_paths": _json.dumps([vids[(i + 1) % 2]]),
        "kind": "fx", "split": "train", "reference_alignment_score": 9.0,
    } for i, v in enumerate(vids)]).to_csv(data / "vap_data.csv", index=False)

    _run(tmp_path, monkeypatch, "wan", structure, str(data),
         extra=("--training_type", "video_as_prompt_mot",
                "--pretrained_model_name_or_path", str(tmp_path / "model")))
