"""2D AutoencoderKL (SD-family image VAE) — functional JAX, channel-last.

Behavioral reference: diffusers AutoencoderKL with Encoder/Decoder
(diffusers/src/diffusers/models/autoencoders/vae.py:60-340,
autoencoder_kl.py): conv_in -> DownEncoderBlock2D stack (resnets +
strided-conv downsample with (0,1) asymmetric padding) -> mid block
(resnet, single-head attention, resnet) -> groupnorm/silu/conv_out.
Used by the Flux family (latent_channels=16, shift+scale factors, no
quant convs — FLUX.1 vae config) and by SD-style families
(use_quant_conv=True, latent_channels=4).

TPU notes: NHWC layout so convs lower directly to XLA's convolution on the
MXU; GroupNorm/softmax in fp32; whole encode/decode jit-able (static shapes).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import linear, silu

Array = jnp.ndarray
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class AutoencoderKLConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 16
    norm_num_groups: int = 32
    use_quant_conv: bool = False
    use_post_quant_conv: bool = False
    scaling_factor: float = 0.3611
    shift_factor: Optional[float] = 0.1159
    mid_block_add_attention: bool = True

    @property
    def spatial_compression(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @classmethod
    def flux(cls, **overrides) -> "AutoencoderKLConfig":
        return cls(**overrides)

    @classmethod
    def sd(cls, **overrides) -> "AutoencoderKLConfig":
        base = dict(latent_channels=4, use_quant_conv=True, use_post_quant_conv=True,
                    scaling_factor=0.18215, shift_factor=None)
        base.update(overrides)
        return cls(**base)

    @classmethod
    def tiny(cls, **overrides) -> "AutoencoderKLConfig":
        base = dict(block_out_channels=(8, 16), layers_per_block=1,
                    latent_channels=4, norm_num_groups=4)
        base.update(overrides)
        return cls(**base)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def conv2d(p: Params, x: Array, stride: int = 1, padding="SAME") -> Array:
    """x: [B, H, W, C]; kernel stored [kh, kw, cin, cout]."""
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"].astype(x.dtype)


def group_norm(p: Params, x: Array, groups: int, eps: float = 1e-6) -> Array:
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _resnet2d(p: Params, x: Array, groups: int) -> Array:
    h = conv2d(p["conv1"], silu(group_norm(p["norm1"], x, groups)))
    h = conv2d(p["conv2"], silu(group_norm(p["norm2"], h, groups)))
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x)
    return x + h


def _mid_attention(p: Params, x: Array, groups: int) -> Array:
    """Single-head VAE attention with residual (deprecated AttnBlock style)."""
    b, h, w, c = x.shape
    n = group_norm(p["group_norm"], x, groups).reshape(b, h * w, c)
    q = linear(p["to_q"], n).astype(jnp.float32)
    k = linear(p["to_k"], n).astype(jnp.float32)
    v = linear(p["to_v"], n).astype(jnp.float32)
    attn = jax.nn.softmax(q @ k.transpose(0, 2, 1) * (c ** -0.5), axis=-1)
    out = linear(p["to_out"], (attn @ v).astype(x.dtype))
    return x + out.reshape(b, h, w, c)


def _downsample(p: Params, x: Array) -> Array:
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))  # asymmetric (0,1) pad
    return conv2d(p["conv"], x, stride=2, padding="VALID")


def _upsample(p: Params, x: Array) -> Array:
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
    return conv2d(p["conv"], x)


def _mid_block(p: Params, x: Array, cfg: AutoencoderKLConfig) -> Array:
    g = cfg.norm_num_groups
    x = _resnet2d(p["resnets"][0], x, g)
    if cfg.mid_block_add_attention:
        x = _mid_attention(p["attention"], x, g)
    return _resnet2d(p["resnets"][1], x, g)


# ---------------------------------------------------------------------------
# encode / decode
# ---------------------------------------------------------------------------

def vae2d_encode(params: Params, cfg: AutoencoderKLConfig, x: Array) -> Array:
    """x: [B, H, W, in_channels] in [-1, 1] -> moments [B, h, w, 2*latent]."""
    e = params["encoder"]
    h = conv2d(e["conv_in"], x)
    for blk in e["down_blocks"]:
        for r in blk["resnets"]:
            h = _resnet2d(r, h, cfg.norm_num_groups)
        if "downsample" in blk:
            h = _downsample(blk["downsample"], h)
    h = _mid_block(e["mid_block"], h, cfg)
    h = silu(group_norm(e["conv_norm_out"], h, cfg.norm_num_groups))
    h = conv2d(e["conv_out"], h)
    if cfg.use_quant_conv:
        h = conv2d(params["quant_conv"], h)
    return h


def vae2d_decode(params: Params, cfg: AutoencoderKLConfig, z: Array) -> Array:
    """z: [B, h, w, latent] (unscaled) -> [B, H, W, out_channels]."""
    if cfg.use_post_quant_conv:
        z = conv2d(params["post_quant_conv"], z)
    d = params["decoder"]
    h = conv2d(d["conv_in"], z)
    h = _mid_block(d["mid_block"], h, cfg)
    for blk in d["up_blocks"]:
        for r in blk["resnets"]:
            h = _resnet2d(r, h, cfg.norm_num_groups)
        if "upsample" in blk:
            h = _upsample(blk["upsample"], h)
    h = silu(group_norm(d["conv_norm_out"], h, cfg.norm_num_groups))
    return conv2d(d["conv_out"], h)


def scale_latents(cfg: AutoencoderKLConfig, z: Array) -> Array:
    if cfg.shift_factor is not None:
        return (z - cfg.shift_factor) * cfg.scaling_factor
    return z * cfg.scaling_factor


def unscale_latents(cfg: AutoencoderKLConfig, z: Array) -> Array:
    if cfg.shift_factor is not None:
        return z / cfg.scaling_factor + cfg.shift_factor
    return z / cfg.scaling_factor


# ---------------------------------------------------------------------------
# init + HF conversion
# ---------------------------------------------------------------------------

def _init_conv(key, cin, cout, k, dtype):
    fan_in = cin * k * k
    w = jax.random.normal(key, (k, k, cin, cout), dtype) * (fan_in ** -0.5)
    return {"kernel": w, "bias": jnp.zeros((cout,), dtype)}


def _init_gn(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _init_resnet(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _init_gn(cin, dtype), "conv1": _init_conv(ks[0], cin, cout, 3, dtype),
        "norm2": _init_gn(cout, dtype), "conv2": _init_conv(ks[1], cout, cout, 3, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = _init_conv(ks[2], cin, cout, 1, dtype)
    return p


def _init_lin(key, cin, cout, dtype):
    k1, _ = jax.random.split(key)
    return {"kernel": jax.random.normal(k1, (cin, cout), dtype) * (cin ** -0.5),
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


def init_autoencoder_kl(key, cfg: AutoencoderKLConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 8)
    chans = cfg.block_out_channels
    # encoder
    down_blocks = []
    cin = chans[0]
    for i, cout in enumerate(chans):
        bk = jax.random.fold_in(keys[0], i)
        resnets = []
        c = cin
        for j in range(cfg.layers_per_block):
            resnets.append(_init_resnet(jax.random.fold_in(bk, j), c, cout, dtype))
            c = cout
        blk = {"resnets": resnets}
        if i != len(chans) - 1:
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
    # decoder
    rev = list(reversed(chans))
    up_blocks = []
    cin = rev[0]
    for i, cout in enumerate(rev):
        bk = jax.random.fold_in(keys[4], i)
        resnets = []
        c = cin
        for j in range(cfg.layers_per_block + 1):
            resnets.append(_init_resnet(jax.random.fold_in(bk, j), c, cout, dtype))
            c = cout
        blk = {"resnets": resnets}
        if i != len(rev) - 1:
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
    params = {"encoder": encoder, "decoder": decoder}
    if cfg.use_quant_conv:
        params["quant_conv"] = _init_conv(
            jax.random.fold_in(keys[3], 1), 2 * cfg.latent_channels, 2 * cfg.latent_channels, 1, dtype)
    if cfg.use_post_quant_conv:
        params["post_quant_conv"] = _init_conv(
            jax.random.fold_in(keys[5], 1), cfg.latent_channels, cfg.latent_channels, 1, dtype)
    return params


def convert_autoencoder_kl_state_dict(sd: Dict[str, np.ndarray],
                                      cfg: AutoencoderKLConfig,
                                      dtype=jnp.float32) -> Params:
    """diffusers AutoencoderKL state dict -> vap_tpu pytree."""
    def conv(name):
        w = np.asarray(sd[f"{name}.weight"])  # [out, in, kh, kw]
        return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype),
                "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}

    def gn(name):
        return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype),
                "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}

    def lin(name):
        return {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T, dtype),
                "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}

    def resnet(pre):
        p = {"norm1": gn(f"{pre}.norm1"), "conv1": conv(f"{pre}.conv1"),
             "norm2": gn(f"{pre}.norm2"), "conv2": conv(f"{pre}.conv2")}
        if f"{pre}.conv_shortcut.weight" in sd:
            p["conv_shortcut"] = conv(f"{pre}.conv_shortcut")
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
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            blk["downsample"] = {"conv": conv(f"encoder.down_blocks.{i}.downsamplers.0.conv")}
        down_blocks.append(blk)
    up_blocks = []
    for i in range(n):
        blk = {"resnets": [resnet(f"decoder.up_blocks.{i}.resnets.{j}")
                           for j in range(cfg.layers_per_block + 1)]}
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            blk["upsample"] = {"conv": conv(f"decoder.up_blocks.{i}.upsamplers.0.conv")}
        up_blocks.append(blk)

    params = {
        "encoder": {
            "conv_in": conv("encoder.conv_in"),
            "down_blocks": down_blocks,
            "mid_block": mid("encoder.mid_block"),
            "conv_norm_out": gn("encoder.conv_norm_out"),
            "conv_out": conv("encoder.conv_out"),
        },
        "decoder": {
            "conv_in": conv("decoder.conv_in"),
            "mid_block": mid("decoder.mid_block"),
            "up_blocks": up_blocks,
            "conv_norm_out": gn("decoder.conv_norm_out"),
            "conv_out": conv("decoder.conv_out"),
        },
    }
    if cfg.use_quant_conv:
        params["quant_conv"] = conv("quant_conv")
    if cfg.use_post_quant_conv:
        params["post_quant_conv"] = conv("post_quant_conv")
    return params
