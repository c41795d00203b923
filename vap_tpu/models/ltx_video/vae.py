"""LTX-Video causal 3D VAE (0.9.0 path) — functional JAX, channel-last.

Behavioral reference: diffusers AutoencoderKLLTXVideo
(diffusers/src/diffusers/models/autoencoders/autoencoder_kl_ltx.py):
4x4 spatial patchify with the reference's (pt, p_w, p_h) channel order, causal
(encoder) / symmetric (decoder) replicated time padding, RMS-norm resnets with
LayerNorm'd shortcuts on channel change, stride-2 causal-conv downsampling,
pixel-shuffle upsampling with first-frame trim, resnet-only mid blocks, and
the encoder's "+1 logvar channel broadcast to all latents" output trick.
Per-channel latents_mean/std normalization lives in `normalize_latents`.

The 0.9.1+ extensions (decoder timestep conditioning, noise injection,
pixel-unshuffle 095 down blocks) are config-gated and raise until ported.

TPU notes: [B, F, H, W, C] layout; convs request HIGHEST precision (free for
bf16 inputs; this host's default splits f32 convs into bf16 passes).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import layer_norm, linear, rms_norm, silu

Array = jnp.ndarray
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LTXVideoVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 128
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    spatio_temporal_scaling: Tuple[bool, ...] = (True, True, True, False)
    layers_per_block: Tuple[int, ...] = (4, 3, 3, 3, 4)
    patch_size: int = 4
    patch_size_t: int = 1
    resnet_norm_eps: float = 1e-6
    encoder_causal: bool = True
    decoder_causal: bool = False
    scaling_factor: float = 1.0
    timestep_conditioning: bool = False
    latents_mean: Tuple[float, ...] = ()
    latents_std: Tuple[float, ...] = ()

    def __post_init__(self):
        if self.timestep_conditioning:
            raise NotImplementedError(
                "LTX 0.9.1 decoder timestep conditioning is intentionally "
                "gated: the reference's own path is unexercised by its "
                "training/inference recipes (finetrainers' LTX spec loads the "
                "0.9.0 VAE) and carries a latent ordering bug — "
                "LTXVideoUpBlock3d.forward passes the RAW decode timestep to "
                "conv_in before the block's time_embedder embeds it "
                "(autoencoder_kl_ltx.py:705-717), which would fail at "
                "temb.unflatten for any up block with a channel change. "
                "A faithful port would reproduce a crash; gate until a "
                "working upstream semantic exists.")

    @classmethod
    def ltx_video(cls, **overrides) -> "LTXVideoVAEConfig":
        return cls(**overrides)

    @classmethod
    def tiny(cls, **overrides) -> "LTXVideoVAEConfig":
        base = dict(latent_channels=4, block_out_channels=(4, 8),
                    spatio_temporal_scaling=(True, False),
                    layers_per_block=(1, 1, 1), patch_size=2)
        base.update(overrides)
        return cls(**base)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _causal_conv3d(p: Params, x: Array, *, causal: bool, stride=(1, 1, 1)) -> Array:
    """Time pad: replicate first frame (k-1) left if causal, else (k-1)//2
    replicated on both ends; spatial zero pad k//2 (the torch conv's own
    padding). Kernel [kt, kh, kw, cin, cout]."""
    kt, kh, kw = p["kernel"].shape[:3]
    if kt > 1:
        if causal:
            left = jnp.repeat(x[:, :1], kt - 1, axis=1)
            x = jnp.concatenate([left, x], axis=1)
        else:
            left = jnp.repeat(x[:, :1], (kt - 1) // 2, axis=1)
            right = jnp.repeat(x[:, -1:], (kt - 1) // 2, axis=1)
            x = jnp.concatenate([left, x, right], axis=1)
    x = jnp.pad(x, ((0, 0), (0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), stride, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return y + p["bias"].astype(x.dtype)


def _resnet(p: Params, x: Array, causal: bool) -> Array:
    """LTXVideoResnetBlock3d (:83-196): RMS norms (eps 1e-8, no affine),
    LayerNorm'd 1x1-conv shortcut on channel change."""
    h = silu(rms_norm({}, x, 1e-8))
    h = _causal_conv3d(p["conv1"], h, causal=causal)
    h = silu(rms_norm({}, h, 1e-8))
    h = _causal_conv3d(p["conv2"], h, causal=causal)
    if "conv_shortcut" in p:
        x = layer_norm(p["norm3"], x, 1e-6)
        x = _causal_conv3d(p["conv_shortcut"], x, causal=causal)
    return x + h


def _upsample(p: Params, x: Array, causal: bool) -> Array:
    """LTXVideoUpsampler3d (0.9.0: residual=False, upscale=1): conv to C*8,
    pixel-shuffle to (2F, 2H, 2W), trim the first (stride_t - 1) frames."""
    b, f, h, w, _ = x.shape
    y = _causal_conv3d(p["conv"], x, causal=causal)  # [B, F, H, W, C*8]
    c = y.shape[-1] // 8
    # torch layout: channels [c, st(2), sh(2), sw(2)] channel-FIRST order
    y = y.reshape(b, f, h, w, c, 2, 2, 2)
    y = y.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # [B, F, 2, H, 2, W, 2, c]
    y = y.reshape(b, 2 * f, 2 * h, 2 * w, c)
    return y[:, 1:]  # drop first frame of the doubled time axis


# ---------------------------------------------------------------------------
# encode / decode
# ---------------------------------------------------------------------------

def _patchify(x: Array, p: int, pt: int) -> Array:
    """[B, F, H, W, C] -> [B, F/pt, H/p, W/p, C*pt*p*p] with the reference's
    (C, pt, p_w, p_h) channel order (encoder :855-861)."""
    b, f, h, w, c = x.shape
    y = x.reshape(b, f // pt, pt, h // p, p, w // p, p, c)
    # target channel order (c, pt, pw, ph): indices c=7, pt=2, pw=6, ph=4
    y = y.transpose(0, 1, 3, 5, 7, 2, 6, 4)
    return y.reshape(b, f // pt, h // p, w // p, c * pt * p * p)


def _unpatchify(x: Array, p: int, pt: int, out_c: int) -> Array:
    """Inverse of the decoder's unpatchify (decoder :1020-1026)."""
    b, f, h, w, _ = x.shape
    y = x.reshape(b, f, h, w, out_c, pt, p, p)  # channels (c, pt, p3, p4)
    # torch: permute(0,1,5,2,6,4,7,3): F*pt, H*p4, W*p3
    y = y.transpose(0, 1, 5, 2, 7, 3, 6, 4)     # [B, F, pt, H, p4, W, p3, c]
    return y.reshape(b, f * pt, h * p, w * p, out_c)


def ltx_vae_encode(params: Params, cfg: LTXVideoVAEConfig, x: Array) -> Array:
    """x: [B, F, H, W, 3] in [-1, 1] -> moments [B, f, h, w, 2*latent]
    (the single encoded logvar channel is broadcast to all latent channels,
    as in the reference encoder output :874-878)."""
    causal = cfg.encoder_causal
    e = params["encoder"]
    h = _patchify(x, cfg.patch_size, cfg.patch_size_t)
    h = _causal_conv3d(e["conv_in"], h, causal=causal)
    for blk, st in zip(e["down_blocks"], cfg.spatio_temporal_scaling):
        for r in blk["resnets"]:
            h = _resnet(r, h, causal)
        if "downsample" in blk:
            h = _causal_conv3d(blk["downsample"], h, causal=causal, stride=(2, 2, 2))
        if "conv_out" in blk:
            h = _resnet(blk["conv_out"], h, causal)
    for r in e["mid_resnets"]:
        h = _resnet(r, h, causal)
    h = silu(rms_norm({}, h, 1e-8))
    h = _causal_conv3d(e["conv_out"], h, causal=causal)  # [..., latent + 1]
    mean = h[..., :-1]
    logvar = jnp.repeat(h[..., -1:], cfg.latent_channels, axis=-1)
    return jnp.concatenate([mean, logvar], axis=-1)


def ltx_vae_decode(params: Params, cfg: LTXVideoVAEConfig, z: Array) -> Array:
    """z: [B, f, h, w, latent] (denormalized) -> [B, F, H, W, 3]."""
    causal = cfg.decoder_causal
    d = params["decoder"]
    h = _causal_conv3d(d["conv_in"], z, causal=causal)
    for r in d["mid_resnets"]:
        h = _resnet(r, h, causal)
    rev_scaling = tuple(reversed(cfg.spatio_temporal_scaling))
    for blk, st in zip(d["up_blocks"], rev_scaling):
        if "conv_in" in blk:
            h = _resnet(blk["conv_in"], h, causal)
        if "upsample" in blk:
            h = _upsample(blk["upsample"], h, causal)
        for r in blk["resnets"]:
            h = _resnet(r, h, causal)
    h = silu(rms_norm({}, h, 1e-8))
    h = _causal_conv3d(d["conv_out"], h, causal=causal)
    return _unpatchify(h, cfg.patch_size, cfg.patch_size_t, cfg.out_channels)


def normalize_latents(cfg: LTXVideoVAEConfig, z: Array) -> Array:
    """(z - mean) * scaling / std, per channel (reference _normalize_latents)."""
    mean = jnp.asarray(cfg.latents_mean or [0.0] * cfg.latent_channels, jnp.float32)
    std = jnp.asarray(cfg.latents_std or [1.0] * cfg.latent_channels, jnp.float32)
    return ((z.astype(jnp.float32) - mean) * cfg.scaling_factor / std).astype(z.dtype)


def denormalize_latents(cfg: LTXVideoVAEConfig, z: Array) -> Array:
    mean = jnp.asarray(cfg.latents_mean or [0.0] * cfg.latent_channels, jnp.float32)
    std = jnp.asarray(cfg.latents_std or [1.0] * cfg.latent_channels, jnp.float32)
    return (z.astype(jnp.float32) * std / cfg.scaling_factor + mean).astype(z.dtype)


# ---------------------------------------------------------------------------
# init + HF conversion
# ---------------------------------------------------------------------------

def _init_conv(key, cin, cout, k, dtype):
    kt, kh, kw = (k, k, k) if isinstance(k, int) else k
    fan_in = cin * kt * kh * kw
    return {"kernel": jax.random.normal(key, (kt, kh, kw, cin, cout), dtype) * fan_in ** -0.5,
            "bias": jnp.zeros((cout,), dtype)}


def _init_resnet(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {"conv1": _init_conv(ks[0], cin, cout, 3, dtype),
         "conv2": _init_conv(ks[1], cout, cout, 3, dtype)}
    if cin != cout:
        p["norm3"] = {"scale": jnp.ones((cin,), dtype), "bias": jnp.zeros((cin,), dtype)}
        p["conv_shortcut"] = _init_conv(ks[2], cin, cout, 1, dtype)
    return p


def _encoder_channels(cfg: LTXVideoVAEConfig):
    """Per-down-block (in, out) channels (encoder :791-801, non-095)."""
    chans = cfg.block_out_channels
    n = len(chans)
    out = []
    c = chans[0]
    for i in range(n):
        cin = c
        c = chans[i + 1] if i + 1 < n else chans[i]
        out.append((cin, c))
    return out


def init_ltx_vae(key, cfg: LTXVideoVAEConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 8)
    chans = cfg.block_out_channels
    lpb = cfg.layers_per_block

    down_blocks = []
    for i, (cin, cout) in enumerate(_encoder_channels(cfg)):
        bk = jax.random.fold_in(keys[0], i)
        blk = {"resnets": [_init_resnet(jax.random.fold_in(bk, j), cin, cin, dtype)
                           for j in range(lpb[i])]}
        if cfg.spatio_temporal_scaling[i]:
            blk["downsample"] = _init_conv(jax.random.fold_in(bk, 98), cin, cin, 3, dtype)
        if cin != cout:
            blk["conv_out"] = _init_resnet(jax.random.fold_in(bk, 99), cin, cout, dtype)
        down_blocks.append(blk)
    top = _encoder_channels(cfg)[-1][1]
    encoder = {
        "conv_in": _init_conv(keys[1], cfg.in_channels * cfg.patch_size ** 2 * cfg.patch_size_t,
                              chans[0], 3, dtype),
        "down_blocks": down_blocks,
        "mid_resnets": [_init_resnet(jax.random.fold_in(keys[2], j), top, top, dtype)
                        for j in range(lpb[-1])],
        "conv_out": _init_conv(keys[3], top, cfg.latent_channels + 1, 3, dtype),
    }

    rev = tuple(reversed(chans))
    rev_lpb = tuple(reversed(lpb))
    up_blocks = []
    c = rev[0]
    for i in range(len(rev)):
        bk = jax.random.fold_in(keys[4], i)
        cin, cout = c, rev[i]
        blk = {}
        if cin != cout:
            blk["conv_in"] = _init_resnet(jax.random.fold_in(bk, 98), cin, cout, dtype)
        if tuple(reversed(cfg.spatio_temporal_scaling))[i]:
            blk["upsample"] = {"conv": _init_conv(jax.random.fold_in(bk, 99), cout, cout * 8, 3, dtype)}
        blk["resnets"] = [_init_resnet(jax.random.fold_in(bk, j), cout, cout, dtype)
                          for j in range(rev_lpb[i + 1])]
        up_blocks.append(blk)
        c = cout
    decoder = {
        "conv_in": _init_conv(keys[5], cfg.latent_channels, rev[0], 3, dtype),
        "mid_resnets": [_init_resnet(jax.random.fold_in(keys[6], j), rev[0], rev[0], dtype)
                        for j in range(rev_lpb[0])],
        "up_blocks": up_blocks,
        "conv_out": _init_conv(keys[7], rev[-1],
                               cfg.out_channels * cfg.patch_size ** 2 * cfg.patch_size_t, 3, dtype),
    }
    return {"encoder": encoder, "decoder": decoder}


def convert_ltx_vae_state_dict(sd: Dict[str, np.ndarray], cfg: LTXVideoVAEConfig,
                               dtype=jnp.float32) -> Params:
    """diffusers AutoencoderKLLTXVideo (0.9.0) state dict -> vap_tpu pytree."""
    def conv(name):
        w = np.asarray(sd[f"{name}.conv.weight"])  # [out, in, kt, kh, kw]
        return {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0), dtype),
                "bias": jnp.asarray(sd[f"{name}.conv.bias"], dtype)}

    def resnet(pre):
        p = {"conv1": conv(f"{pre}.conv1"), "conv2": conv(f"{pre}.conv2")}
        if f"{pre}.conv_shortcut.conv.weight" in sd:
            p["norm3"] = {"scale": jnp.asarray(sd[f"{pre}.norm3.weight"], dtype),
                          "bias": jnp.asarray(sd[f"{pre}.norm3.bias"], dtype)}
            p["conv_shortcut"] = conv(f"{pre}.conv_shortcut")
        return p

    lpb = cfg.layers_per_block
    down_blocks = []
    for i in range(len(cfg.block_out_channels)):
        pre = f"encoder.down_blocks.{i}"
        blk = {"resnets": [resnet(f"{pre}.resnets.{j}") for j in range(lpb[i])]}
        if f"{pre}.downsamplers.0.conv.weight" in sd:
            blk["downsample"] = conv(f"{pre}.downsamplers.0")
        if f"{pre}.conv_out.conv1.conv.weight" in sd:
            blk["conv_out"] = resnet(f"{pre}.conv_out")
        down_blocks.append(blk)
    encoder = {
        "conv_in": conv("encoder.conv_in"),
        "down_blocks": down_blocks,
        "mid_resnets": [resnet(f"encoder.mid_block.resnets.{j}") for j in range(lpb[-1])],
        "conv_out": conv("encoder.conv_out"),
    }
    rev_lpb = tuple(reversed(lpb))
    up_blocks = []
    for i in range(len(cfg.block_out_channels)):
        pre = f"decoder.up_blocks.{i}"
        blk = {}
        if f"{pre}.conv_in.conv1.conv.weight" in sd:
            blk["conv_in"] = resnet(f"{pre}.conv_in")
        if f"{pre}.upsamplers.0.conv.conv.weight" in sd:
            blk["upsample"] = {"conv": conv(f"{pre}.upsamplers.0.conv")}
        blk["resnets"] = [resnet(f"{pre}.resnets.{j}") for j in range(rev_lpb[i + 1])]
        up_blocks.append(blk)
    decoder = {
        "conv_in": conv("decoder.conv_in"),
        "mid_resnets": [resnet(f"decoder.mid_block.resnets.{j}") for j in range(rev_lpb[0])],
        "up_blocks": up_blocks,
        "conv_out": conv("decoder.conv_out"),
    }
    return {"encoder": encoder, "decoder": decoder}
