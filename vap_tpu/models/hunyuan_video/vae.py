"""HunyuanVideo causal 3D VAE — functional JAX, channel-last.

Behavioral reference: diffusers AutoencoderKLHunyuanVideo
(diffusers/src/diffusers/models/autoencoders/autoencoder_kl_hunyuan_video.py):
replicate-padded causal conv3d everywhere (time pad (k-1, 0), spatial k//2),
stride-2 causal convs for spatio-temporal downsampling (spatial at the first
log2(8)=3 blocks, temporal at blocks 1-2 for 4x time compression), mid block
with single-head attention over flattened voxels, first-frame-special nearest
upsampling in the decoder, 1x1 quant/post-quant convs.

TPU notes: [B, F, H, W, C] layout lowers straight to XLA 3D convolution on
the MXU; GroupNorm/softmax in fp32; whole encode/decode jit-able.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import linear, silu

Array = jnp.ndarray
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class HunyuanVideoVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.476986
    spatial_compression_ratio: int = 8
    temporal_compression_ratio: int = 4
    mid_block_add_attention: bool = True

    @classmethod
    def hunyuan_video(cls, **overrides) -> "HunyuanVideoVAEConfig":
        return cls(**overrides)

    @classmethod
    def tiny(cls, **overrides) -> "HunyuanVideoVAEConfig":
        base = dict(latent_channels=4, block_out_channels=(8, 16),
                    layers_per_block=1, norm_num_groups=4,
                    spatial_compression_ratio=2, temporal_compression_ratio=4)
        base.update(overrides)
        return cls(**base)

    def _down_flags(self, i: int):
        """(add_spatial, add_time) for encoder block i (encoder :448-470)."""
        n = len(self.block_out_channels)
        ns = int(math.log2(self.spatial_compression_ratio))
        nt = int(math.log2(self.temporal_compression_ratio))
        is_final = i == n - 1
        if self.temporal_compression_ratio == 4:
            return i < ns, (i >= n - 1 - nt and not is_final)
        if self.temporal_compression_ratio == 8:
            return i < ns, i < nt
        raise ValueError(self.temporal_compression_ratio)

    def _up_flags(self, i: int):
        """(add_spatial, add_time) for decoder block i (decoder :572-590)."""
        n = len(self.block_out_channels)
        ns = int(math.log2(self.spatial_compression_ratio))
        nt = int(math.log2(self.temporal_compression_ratio))
        is_final = i == n - 1
        return i < ns, (i >= n - 1 - nt and not is_final)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def causal_conv3d(p: Params, x: Array, stride=(1, 1, 1)) -> Array:
    """x: [B, F, H, W, C]; kernel [kt, kh, kw, cin, cout]; replicate-padded
    causal in time, symmetric in space."""
    kt, kh, kw = p["kernel"].shape[:3]
    x = jnp.pad(x, ((0, 0), (kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
                mode="edge")
    # explicit HIGHEST precision: this host's default conv precision splits
    # f32 inputs into bf16 passes (~4e-3 error); bf16 inputs are unaffected,
    # so this costs nothing on the TPU production path
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), stride, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return y + p["bias"].astype(x.dtype)


def group_norm3d(p: Params, x: Array, groups: int, eps: float = 1e-6) -> Array:
    b, f, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, f, h, w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 2, 3, 5), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 3, 5), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, f, h, w, c)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _resnet(p: Params, x: Array, groups: int) -> Array:
    h = causal_conv3d(p["conv1"], silu(group_norm3d(p["norm1"], x, groups)))
    h = causal_conv3d(p["conv2"], silu(group_norm3d(p["norm2"], h, groups)))
    if "conv_shortcut" in p:
        x = causal_conv3d(p["conv_shortcut"], x)
    return x + h


def _mid_attention(p: Params, x: Array, groups: int) -> Array:
    """Single-head attention over flattened voxels with a FRAME-CAUSAL mask
    (prepare_causal_attention_mask: a token attends only to tokens in the
    same or earlier frames — mid forward :253-285)."""
    b, f, h, w, c = x.shape
    n = group_norm3d(p["group_norm"], x, groups).reshape(b, f * h * w, c)
    q = linear(p["to_q"], n).astype(jnp.float32)
    k = linear(p["to_k"], n).astype(jnp.float32)
    v = linear(p["to_v"], n).astype(jnp.float32)
    frame = jnp.arange(f * h * w) // (h * w)
    bias = jnp.where(frame[:, None] >= frame[None, :], 0.0, -jnp.inf).astype(jnp.float32)
    attn = jax.nn.softmax(q @ k.transpose(0, 2, 1) * (c ** -0.5) + bias, axis=-1)
    out = linear(p["to_out"], (attn @ v).astype(x.dtype))
    return x + out.reshape(b, f, h, w, c)


def _mid_block(p: Params, x: Array, cfg: HunyuanVideoVAEConfig) -> Array:
    g = cfg.norm_num_groups
    x = _resnet(p["resnets"][0], x, g)
    if cfg.mid_block_add_attention:
        x = _mid_attention(p["attention"], x, g)
    return _resnet(p["resnets"][1], x, g)


def _upsample(p: Params, x: Array, factor: Tuple[int, int, int]) -> Array:
    """First frame: spatial-only nearest; remaining frames: full nearest
    (HunyuanVideoUpsampleCausal3D :99-121)."""
    ft, fh, fw = factor
    first = jnp.repeat(jnp.repeat(x[:, :1], fh, axis=2), fw, axis=3)
    if x.shape[1] > 1:
        rest = x[:, 1:]
        if ft > 1:
            rest = jnp.repeat(rest, ft, axis=1)
        rest = jnp.repeat(jnp.repeat(rest, fh, axis=2), fw, axis=3)
        x = jnp.concatenate([first, rest], axis=1)
    else:
        x = first
    return causal_conv3d(p["conv"], x)


# ---------------------------------------------------------------------------
# encode / decode
# ---------------------------------------------------------------------------

def hunyuan_vae_encode(params: Params, cfg: HunyuanVideoVAEConfig, x: Array) -> Array:
    """x: [B, F, H, W, 3] in [-1, 1] -> moments [B, f, h, w, 2*latent]."""
    e = params["encoder"]
    h = causal_conv3d(e["conv_in"], x)
    for i, blk in enumerate(e["down_blocks"]):
        for r in blk["resnets"]:
            h = _resnet(r, h, cfg.norm_num_groups)
        if "downsample" in blk:
            add_s, add_t = cfg._down_flags(i)
            stride = (2 if add_t else 1, 2 if add_s else 1, 2 if add_s else 1)
            h = causal_conv3d(blk["downsample"]["conv"], h, stride)
    h = _mid_block(e["mid_block"], h, cfg)
    h = silu(group_norm3d(e["conv_norm_out"], h, cfg.norm_num_groups))
    h = causal_conv3d(e["conv_out"], h)
    return causal_conv3d(params["quant_conv"], h)


def hunyuan_vae_decode(params: Params, cfg: HunyuanVideoVAEConfig, z: Array) -> Array:
    """z: [B, f, h, w, latent] (unscaled) -> [B, F, H, W, 3]."""
    z = causal_conv3d(params["post_quant_conv"], z)
    d = params["decoder"]
    h = causal_conv3d(d["conv_in"], z)
    h = _mid_block(d["mid_block"], h, cfg)
    for i, blk in enumerate(d["up_blocks"]):
        for r in blk["resnets"]:
            h = _resnet(r, h, cfg.norm_num_groups)
        if "upsample" in blk:
            add_s, add_t = cfg._up_flags(i)
            factor = (2 if add_t else 1, 2 if add_s else 1, 2 if add_s else 1)
            h = _upsample(blk["upsample"], h, factor)
    h = silu(group_norm3d(d["conv_norm_out"], h, cfg.norm_num_groups))
    return causal_conv3d(d["conv_out"], h)


# ---------------------------------------------------------------------------
# init + HF conversion
# ---------------------------------------------------------------------------

def _init_conv(key, cin, cout, k, dtype):
    kt, kh, kw = (k, k, k) if isinstance(k, int) else k
    fan_in = cin * kt * kh * kw
    return {"kernel": jax.random.normal(key, (kt, kh, kw, cin, cout), dtype) * fan_in ** -0.5,
            "bias": jnp.zeros((cout,), dtype)}


def _init_gn(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _init_resnet(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {"norm1": _init_gn(cin, dtype), "conv1": _init_conv(ks[0], cin, cout, 3, dtype),
         "norm2": _init_gn(cout, dtype), "conv2": _init_conv(ks[1], cout, cout, 3, dtype)}
    if cin != cout:
        p["conv_shortcut"] = _init_conv(ks[2], cin, cout, 1, dtype)
    return p


def _init_lin(key, cin, cout, dtype):
    return {"kernel": jax.random.normal(key, (cin, cout), dtype) * cin ** -0.5,
            "bias": jnp.zeros((cout,), dtype)}


def _init_mid(key, c, cfg, dtype):
    ks = jax.random.split(key, 6)
    p = {"resnets": [_init_resnet(ks[0], c, c, dtype), _init_resnet(ks[1], c, c, dtype)]}
    if cfg.mid_block_add_attention:
        p["attention"] = {
            "group_norm": _init_gn(c, dtype),
            "to_q": _init_lin(ks[2], c, c, dtype), "to_k": _init_lin(ks[3], c, c, dtype),
            "to_v": _init_lin(ks[4], c, c, dtype), "to_out": _init_lin(ks[5], c, c, dtype),
        }
    return p


def init_hunyuan_vae(key, cfg: HunyuanVideoVAEConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 10)
    chans = cfg.block_out_channels
    down_blocks = []
    cin = chans[0]
    for i, cout in enumerate(chans):
        bk = jax.random.fold_in(keys[0], i)
        resnets, c = [], cin
        for j in range(cfg.layers_per_block):
            resnets.append(_init_resnet(jax.random.fold_in(bk, j), c, cout, dtype))
            c = cout
        blk = {"resnets": resnets}
        add_s, add_t = cfg._down_flags(i)
        if add_s or add_t:
            blk["downsample"] = {"conv": _init_conv(jax.random.fold_in(bk, 99), cout, cout, 3, dtype)}
        down_blocks.append(blk)
        cin = cout
    encoder = {
        "conv_in": _init_conv(keys[1], cfg.in_channels, chans[0], 3, dtype),
        "down_blocks": down_blocks,
        "mid_block": _init_mid(keys[2], chans[-1], cfg, dtype),
        "conv_norm_out": _init_gn(chans[-1], dtype),
        "conv_out": _init_conv(keys[3], chans[-1], 2 * cfg.latent_channels, 3, dtype),
    }
    rev = list(reversed(chans))
    up_blocks = []
    cin = rev[0]
    for i, cout in enumerate(rev):
        bk = jax.random.fold_in(keys[4], i)
        resnets, c = [], cin
        for j in range(cfg.layers_per_block + 1):
            resnets.append(_init_resnet(jax.random.fold_in(bk, j), c, cout, dtype))
            c = cout
        blk = {"resnets": resnets}
        add_s, add_t = cfg._up_flags(i)
        if add_s or add_t:
            blk["upsample"] = {"conv": _init_conv(jax.random.fold_in(bk, 99), cout, cout, 3, dtype)}
        up_blocks.append(blk)
        cin = cout
    decoder = {
        "conv_in": _init_conv(keys[5], cfg.latent_channels, rev[0], 3, dtype),
        "mid_block": _init_mid(keys[6], rev[0], cfg, dtype),
        "up_blocks": up_blocks,
        "conv_norm_out": _init_gn(rev[-1], dtype),
        "conv_out": _init_conv(keys[7], rev[-1], cfg.out_channels, 3, dtype),
    }
    return {
        "encoder": encoder, "decoder": decoder,
        "quant_conv": _init_conv(keys[8], 2 * cfg.latent_channels, 2 * cfg.latent_channels, 1, dtype),
        "post_quant_conv": _init_conv(keys[9], cfg.latent_channels, cfg.latent_channels, 1, dtype),
    }


def convert_hunyuan_vae_state_dict(sd: Dict[str, np.ndarray],
                                   cfg: HunyuanVideoVAEConfig,
                                   dtype=jnp.float32) -> Params:
    """diffusers AutoencoderKLHunyuanVideo state dict -> vap_tpu pytree."""
    def conv(name):
        w = np.asarray(sd[f"{name}.weight"])  # [out, in, kt, kh, kw]
        return {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0), dtype),
                "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}

    def gn(name):
        return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype),
                "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}

    def lin(name):
        return {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T, dtype),
                "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}

    def resnet(pre):
        p = {"norm1": gn(f"{pre}.norm1"), "conv1": conv(f"{pre}.conv1.conv"),
             "norm2": gn(f"{pre}.norm2"), "conv2": conv(f"{pre}.conv2.conv")}
        if f"{pre}.conv_shortcut.conv.weight" in sd:
            p["conv_shortcut"] = conv(f"{pre}.conv_shortcut.conv")
        return p

    def mid(pre):
        p = {"resnets": [resnet(f"{pre}.resnets.0"), resnet(f"{pre}.resnets.1")]}
        if cfg.mid_block_add_attention:
            p["attention"] = {
                "group_norm": gn(f"{pre}.attentions.0.group_norm"),
                "to_q": lin(f"{pre}.attentions.0.to_q"),
                "to_k": lin(f"{pre}.attentions.0.to_k"),
                "to_v": lin(f"{pre}.attentions.0.to_v"),
                "to_out": lin(f"{pre}.attentions.0.to_out.0"),
            }
        return p

    n = len(cfg.block_out_channels)
    down_blocks = []
    for i in range(n):
        blk = {"resnets": [resnet(f"encoder.down_blocks.{i}.resnets.{j}")
                           for j in range(cfg.layers_per_block)]}
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.conv.weight" in sd:
            blk["downsample"] = {"conv": conv(f"encoder.down_blocks.{i}.downsamplers.0.conv.conv")}
        down_blocks.append(blk)
    up_blocks = []
    for i in range(n):
        blk = {"resnets": [resnet(f"decoder.up_blocks.{i}.resnets.{j}")
                           for j in range(cfg.layers_per_block + 1)]}
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.conv.weight" in sd:
            blk["upsample"] = {"conv": conv(f"decoder.up_blocks.{i}.upsamplers.0.conv.conv")}
        up_blocks.append(blk)

    return {
        "encoder": {
            "conv_in": conv("encoder.conv_in.conv"),
            "down_blocks": down_blocks,
            "mid_block": mid("encoder.mid_block"),
            "conv_norm_out": gn("encoder.conv_norm_out"),
            "conv_out": conv("encoder.conv_out.conv"),
        },
        "decoder": {
            "conv_in": conv("decoder.conv_in.conv"),
            "mid_block": mid("decoder.mid_block"),
            "up_blocks": up_blocks,
            "conv_norm_out": gn("decoder.conv_norm_out"),
            "conv_out": conv("decoder.conv_out.conv"),
        },
        "quant_conv": conv("quant_conv"),
        "post_quant_conv": conv("post_quant_conv"),
    }
