"""Weight conversion for the CogVideoX 3D-causal VAE (HF layout -> vap_tpu).

Conv kernels move to TPU-native channel-last layouts:
  conv3d [O, I, kt, kh, kw] -> [kt, kh, kw, I, O]
  conv2d [O, I, kh, kw]     -> [kh, kw, I, O]
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from .vae import CogVideoXVAEConfig

Params = Dict[str, Any]


def _conv3d_p(sd, name, dtype) -> Params:
    w = np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 4, 1, 0)
    p = {"kernel": jnp.asarray(w, dtype)}
    if f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _conv2d_p(sd, name, dtype) -> Params:
    w = np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)
    return {"kernel": jnp.asarray(w, dtype), "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}


def _norm_p(sd, name, dtype) -> Params:
    return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype), "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}


def _spatial_norm_p(sd, name, dtype) -> Params:
    return {
        "norm_layer": _norm_p(sd, f"{name}.norm_layer", dtype),
        "conv_y": _conv3d_p(sd, f"{name}.conv_y.conv", dtype),
        "conv_b": _conv3d_p(sd, f"{name}.conv_b.conv", dtype),
    }


def _resnet_p(sd, name, decoder: bool, dtype) -> Params:
    p: Params = {}
    for norm in ("norm1", "norm2"):
        if decoder:
            p[norm] = _spatial_norm_p(sd, f"{name}.{norm}", dtype)
        else:
            p[norm] = _norm_p(sd, f"{name}.{norm}", dtype)
    p["conv1"] = _conv3d_p(sd, f"{name}.conv1.conv", dtype)
    p["conv2"] = _conv3d_p(sd, f"{name}.conv2.conv", dtype)
    if f"{name}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _conv3d_p(sd, f"{name}.conv_shortcut", dtype)
    return p


def convert_cogvideox_vae_state_dict(sd: Dict[str, np.ndarray], cfg: CogVideoXVAEConfig, dtype=jnp.float32) -> Params:
    n_blocks = len(cfg.block_out_channels)
    enc: Params = {
        "conv_in": _conv3d_p(sd, "encoder.conv_in.conv", dtype),
        "norm_out": _norm_p(sd, "encoder.norm_out", dtype),
        "conv_out": _conv3d_p(sd, "encoder.conv_out.conv", dtype),
        "mid_block": {
            f"resnet_{j}": _resnet_p(sd, f"encoder.mid_block.resnets.{j}", False, dtype) for j in range(2)
        },
    }
    for i in range(n_blocks):
        blk: Params = {
            f"resnet_{j}": _resnet_p(sd, f"encoder.down_blocks.{i}.resnets.{j}", False, dtype)
            for j in range(cfg.layers_per_block)
        }
        if i < n_blocks - 1:
            blk["downsampler"] = {"conv": _conv2d_p(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", dtype)}
        enc[f"down_block_{i}"] = blk

    dec: Params = {
        "conv_in": _conv3d_p(sd, "decoder.conv_in.conv", dtype),
        "norm_out": _spatial_norm_p(sd, "decoder.norm_out", dtype),
        "conv_out": _conv3d_p(sd, "decoder.conv_out.conv", dtype),
        "mid_block": {
            f"resnet_{j}": _resnet_p(sd, f"decoder.mid_block.resnets.{j}", True, dtype) for j in range(2)
        },
    }
    for i in range(n_blocks):
        blk = {
            f"resnet_{j}": _resnet_p(sd, f"decoder.up_blocks.{i}.resnets.{j}", True, dtype)
            for j in range(cfg.layers_per_block + 1)
        }
        if i < n_blocks - 1:
            blk["upsampler"] = {"conv": _conv2d_p(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", dtype)}
        dec[f"up_block_{i}"] = blk

    return {"encoder": enc, "decoder": dec}
