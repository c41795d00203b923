"""Weight conversion for the Wan 3D-causal VAE (HF layout -> vap_tpu)."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from .vae import WanVAEConfig

Params = Dict[str, Any]


def _conv3d_p(sd, name, dtype) -> Params:
    w = np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 4, 1, 0)
    return {"kernel": jnp.asarray(w, dtype), "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}


def _conv2d_p(sd, name, dtype) -> Params:
    w = np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)
    return {"kernel": jnp.asarray(w, dtype), "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}


def _conv1x1_p(sd, name, dtype) -> Params:
    # Conv2d 1x1 -> linear [Cin, Cout]
    w = np.asarray(sd[f"{name}.weight"])[:, :, 0, 0].T
    return {"kernel": jnp.asarray(w, dtype), "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}


def _rms_p(sd, name, dtype) -> Params:
    g = np.asarray(sd[f"{name}.gamma"]).reshape(-1)
    p = {"gamma": jnp.asarray(g, dtype)}
    if f"{name}.bias" in sd and not np.isscalar(sd.get(f"{name}.bias")):
        p["bias"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]).reshape(-1), dtype)
    return p


def _resblock_p(sd, name, dtype) -> Params:
    p = {
        "norm1": _rms_p(sd, f"{name}.norm1", dtype),
        "conv1": _conv3d_p(sd, f"{name}.conv1", dtype),
        "norm2": _rms_p(sd, f"{name}.norm2", dtype),
        "conv2": _conv3d_p(sd, f"{name}.conv2", dtype),
    }
    if f"{name}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _conv3d_p(sd, f"{name}.conv_shortcut", dtype)
    return p


def _attn_p(sd, name, dtype) -> Params:
    return {
        "norm": _rms_p(sd, f"{name}.norm", dtype),
        "to_qkv": _conv1x1_p(sd, f"{name}.to_qkv", dtype),
        "proj": _conv1x1_p(sd, f"{name}.proj", dtype),
    }


def _resample_p(sd, name, dtype, has_time: bool) -> Params:
    p = {"conv": _conv2d_p(sd, f"{name}.resample.1", dtype)}
    if has_time and f"{name}.time_conv.weight" in sd:
        p["time_conv"] = _conv3d_p(sd, f"{name}.time_conv", dtype)
    return p


def _mid_p(sd, name, dtype) -> Params:
    return {
        "resnet_0": _resblock_p(sd, f"{name}.resnets.0", dtype),
        "attn_0": _attn_p(sd, f"{name}.attentions.0", dtype),
        "resnet_1": _resblock_p(sd, f"{name}.resnets.1", dtype),
    }


def convert_wan_vae_state_dict(sd: Dict[str, np.ndarray], cfg: WanVAEConfig, dtype=jnp.float32) -> Params:
    n_stages = len(cfg.dim_mult)

    enc: Params = {
        "conv_in": _conv3d_p(sd, "encoder.conv_in", dtype),
        "mid_block": _mid_p(sd, "encoder.mid_block", dtype),
        "norm_out": _rms_p(sd, "encoder.norm_out", dtype),
        "conv_out": _conv3d_p(sd, "encoder.conv_out", dtype),
    }
    li = 0
    for i in range(n_stages):
        for _ in range(cfg.num_res_blocks):
            enc[f"layer_{li}"] = _resblock_p(sd, f"encoder.down_blocks.{li}", dtype)
            li += 1
        if i != n_stages - 1:
            enc[f"layer_{li}"] = _resample_p(sd, f"encoder.down_blocks.{li}", dtype, True)
            li += 1

    dec: Params = {
        "conv_in": _conv3d_p(sd, "decoder.conv_in", dtype),
        "mid_block": _mid_p(sd, "decoder.mid_block", dtype),
        "norm_out": _rms_p(sd, "decoder.norm_out", dtype),
        "conv_out": _conv3d_p(sd, "decoder.conv_out", dtype),
    }
    for i in range(n_stages):
        blk: Params = {}
        for j in range(cfg.num_res_blocks + 1):
            blk[f"resnet_{j}"] = _resblock_p(sd, f"decoder.up_blocks.{i}.resnets.{j}", dtype)
        if i != n_stages - 1:
            blk["upsampler"] = _resample_p(sd, f"decoder.up_blocks.{i}.upsamplers.0", dtype, True)
        dec[f"up_block_{i}"] = blk

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv3d_p(sd, "quant_conv", dtype),
        "post_quant_conv": _conv3d_p(sd, "post_quant_conv", dtype),
    }
