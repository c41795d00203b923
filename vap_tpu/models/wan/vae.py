"""Wan2.1 3D-causal VAE — TPU-native JAX implementation.

Mirrors AutoencoderKLWan (diffusers/src/diffusers/models/autoencoders/
autoencoder_kl_wan.py): causal time convs with a 2-frame feature cache
(`feat_cache`, CACHE_T=2) streamed across temporal chunks, WanRMS_norm,
single-head spatial attention in the mid blocks, z_dim=16 with per-channel
latents_mean/std normalization handled by callers.

Streaming layout: encode consumes chunks [1, 4, 4, ...] sample frames and
decode emits one latent frame per step (autoencoder_kl_wan.py:823-845,
:870-893). The first chunk is traced separately (cache is empty / the
upsample3d time-conv is skipped — the "Rep" sentinel), after which the cache
pytree has stable shapes; callers may scan the remainder.

Layout: channel-last [B, F, H, W, C].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
Params = Dict[str, Any]

CACHE_T = 2
REP = "Rep"  # sentinel: first chunk already consumed, zero-pad mode


def _rep_leaf() -> "Array":
    """jit-compatible REP sentinel: a rank-1 empty array (the string form
    cannot cross a jit boundary, which the streamed per-chunk decode needs).
    Both forms are accepted everywhere via _is_rep."""
    return jnp.zeros((0,), jnp.float32)


def _is_rep(c) -> bool:
    return isinstance(c, str) or (c is not None and getattr(c, "ndim", -1) == 1 and c.shape[0] == 0)


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    base_dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = ()
    temperal_downsample: Tuple[bool, ...] = (False, True, True)
    latents_mean: Tuple[float, ...] = (
        -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
        0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
    )
    latents_std: Tuple[float, ...] = (
        2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
        3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
    )

    @property
    def temperal_upsample(self) -> Tuple[bool, ...]:
        return tuple(reversed(self.temperal_downsample))

    @classmethod
    def tiny(cls, **overrides) -> "WanVAEConfig":
        base = dict(base_dim=8, z_dim=4, dim_mult=(1, 1, 1, 1), num_res_blocks=1,
                    latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4))
        base.update(overrides)
        return cls(**base)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _conv3d(p, x, strides=(1, 1, 1), padding=((0, 0), (0, 0), (0, 0))):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=strides, padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + p["bias"].astype(x.dtype)


def _conv2d(p, x, strides=(1, 1), padding=((0, 0), (0, 0))):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"].astype(x.dtype)


def causal_conv(p, x, cache, *, kt: int, pad_t: int, pad_s: int, stride_t: int = 1):
    """WanCausalConv3d (autoencoder_kl_wan.py:35-78): left temporal pad
    2*pad_t, reduced by the cached frames prepended from `cache`."""
    left = 2 * pad_t
    if cache is not None and not _is_rep(cache) and left > 0:
        x = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
        left -= cache.shape[1]
    pad = ((left, 0), (pad_s, pad_s), (pad_s, pad_s))
    return _conv3d(p, x, strides=(stride_t, 1, 1), padding=pad)


def update_cache(old, x):
    """feat_cache update: last CACHE_T input frames; if the chunk is shorter,
    borrow the last frame of the previous cache (autoencoder_kl_wan.py:252-256)."""
    cache = x[:, -CACHE_T:]
    if cache.shape[1] < CACHE_T and old is not None and not _is_rep(old):
        cache = jnp.concatenate([old[:, -1:].astype(cache.dtype), cache], axis=1)
    return cache


def rms_norm_video(p, x):
    """WanRMS_norm(images=False): F.normalize over channels * sqrt(C) * gamma.

    The f32 convert appears INSIDE each consumer expression (reduce and
    normalize) rather than being bound once — a shared f32 copy forces XLA
    to materialize it at full 480p extent (see cogvideox group_norm)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
    xf = x.astype(jnp.float32) / jnp.maximum(norm, 1e-12) * (x.shape[-1] ** 0.5)
    xf = xf * p["gamma"].astype(jnp.float32)
    if "bias" in p:
        xf = xf + p["bias"].astype(jnp.float32)
    return xf.astype(x.dtype)


def residual_block(p, x, cache: Dict, nl=jax.nn.silu):
    """WanResidualBlock (autoencoder_kl_wan.py:207-276)."""
    new_cache = {}
    h = _conv3d(p["conv_shortcut"], x) if "conv_shortcut" in p else x
    y = nl(rms_norm_video(p["norm1"], x))
    new_cache["conv1"] = update_cache(cache.get("conv1"), y)
    y = causal_conv(p["conv1"], y, cache.get("conv1"), kt=3, pad_t=1, pad_s=1)
    y = nl(rms_norm_video(p["norm2"], y))
    new_cache["conv2"] = update_cache(cache.get("conv2"), y)
    y = causal_conv(p["conv2"], y, cache.get("conv2"), kt=3, pad_t=1, pad_s=1)
    return y + h, new_cache


def attention_block(p, x):
    """WanAttentionBlock: per-frame single-head spatial attention (:278-325)."""
    b, f, h, w, c = x.shape
    y = rms_norm_video(p["norm"], x).reshape(b * f, h * w, c)
    qkv = y @ p["to_qkv"]["kernel"].astype(y.dtype) + p["to_qkv"]["bias"].astype(y.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    s = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) * (c ** -0.5)
    a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", a, v)
    o = o @ p["proj"]["kernel"].astype(o.dtype) + p["proj"]["bias"].astype(o.dtype)
    return x + o.reshape(b, f, h, w, c)


def resample(p, x, mode: str, cache: Dict):
    """WanResample (autoencoder_kl_wan.py:123-205)."""
    new_cache = {}
    b, f, h, w, c = x.shape
    if mode == "upsample3d":
        old = cache.get("time_conv")
        if old is None:
            new_cache["time_conv"] = _rep_leaf()
        else:
            cur = x[:, -CACHE_T:]
            if cur.shape[1] < 2 and not _is_rep(old):
                cur = jnp.concatenate([old[:, -1:].astype(cur.dtype), cur], axis=1)
            if cur.shape[1] < 2 and _is_rep(old):
                cur = jnp.concatenate([jnp.zeros_like(cur), cur], axis=1)
            if _is_rep(old):
                y = causal_conv(p["time_conv"], x, None, kt=3, pad_t=1, pad_s=0)
            else:
                y = causal_conv(p["time_conv"], x, old, kt=3, pad_t=1, pad_s=0)
            new_cache["time_conv"] = cur
            # [B,F,H,W,2C] -> interleave the two C-groups as doubled frames
            y = y.reshape(b, f, h, w, 2, c)
            y = y.transpose(0, 1, 4, 2, 3, 5).reshape(b, f * 2, h, w, c)
            x = y
            f = f * 2

    if mode in ("upsample2d", "upsample3d"):
        # nearest-exact 2x spatial (matches torch nearest-exact for integer scale)
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        y = x.reshape(b * f, 2 * h, 2 * w, c)
        y = _conv2d(p["conv"], y, padding=((1, 1), (1, 1)))
        x = y.reshape(b, f, 2 * h, 2 * w, -1)
    elif mode in ("downsample2d", "downsample3d"):
        y = x.reshape(b * f, h, w, c)
        y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
        y = _conv2d(p["conv"], y, strides=(2, 2))
        x = y.reshape(b, f, *y.shape[1:])

    if mode == "downsample3d":
        old = cache.get("time_conv")
        if old is None:
            new_cache["time_conv"] = x
        else:
            new_cache["time_conv"] = x[:, -1:]
            x = causal_conv(
                p["time_conv"], jnp.concatenate([old[:, -1:].astype(x.dtype), x], axis=1),
                REP, kt=3, pad_t=0, pad_s=0, stride_t=2)
    return x, new_cache


# ---------------------------------------------------------------------------
# encoder / decoder (single chunk; cache threaded)
# ---------------------------------------------------------------------------

def _head_conv(p, name, x, cache, new_cache, pad_s=1):
    new_cache[name] = update_cache(cache.get(name), x)
    return causal_conv(p[name], x, cache.get(name), kt=3, pad_t=1, pad_s=pad_s)


def wan_encoder_chunk(p: Params, cfg: WanVAEConfig, x: Array, cache: Optional[Dict]) -> Tuple[Array, Dict]:
    cache = cache or {}
    new_cache: Dict[str, Any] = {}
    x_in = x
    new_cache["conv_in"] = update_cache(cache.get("conv_in"), x_in)
    x = causal_conv(p["conv_in"], x_in, cache.get("conv_in"), kt=3, pad_t=1, pad_s=1)

    li = 0
    n_stages = len(cfg.dim_mult)
    for i in range(n_stages):
        for j in range(cfg.num_res_blocks):
            key = f"layer_{li}"
            x, new_cache[key] = residual_block(p[key], x, cache.get(key, {}))
            li += 1
        if i != n_stages - 1:
            key = f"layer_{li}"
            mode = "downsample3d" if cfg.temperal_downsample[i] else "downsample2d"
            x, new_cache[key] = resample(p[key], x, mode, cache.get(key, {}))
            li += 1

    mb = p["mid_block"]
    mc = cache.get("mid_block", {})
    nmc: Dict[str, Any] = {}
    x, nmc["resnet_0"] = residual_block(mb["resnet_0"], x, mc.get("resnet_0", {}))
    x = attention_block(mb["attn_0"], x)
    x, nmc["resnet_1"] = residual_block(mb["resnet_1"], x, mc.get("resnet_1", {}))
    new_cache["mid_block"] = nmc

    x = jax.nn.silu(rms_norm_video(p["norm_out"], x))
    x = _head_conv(p, "conv_out", x, cache, new_cache)
    return x, new_cache


def wan_decoder_chunk(p: Params, cfg: WanVAEConfig, z: Array, cache: Optional[Dict]) -> Tuple[Array, Dict]:
    cache = cache or {}
    new_cache: Dict[str, Any] = {}
    x = _head_conv(p, "conv_in", z, cache, new_cache)

    mb = p["mid_block"]
    mc = cache.get("mid_block", {})
    nmc: Dict[str, Any] = {}
    x, nmc["resnet_0"] = residual_block(mb["resnet_0"], x, mc.get("resnet_0", {}))
    x = attention_block(mb["attn_0"], x)
    x, nmc["resnet_1"] = residual_block(mb["resnet_1"], x, mc.get("resnet_1", {}))
    new_cache["mid_block"] = nmc

    li = 0
    n_stages = len(cfg.dim_mult)
    for i in range(n_stages):
        upb = p[f"up_block_{i}"]
        ubc = cache.get(f"up_block_{i}", {})
        nubc: Dict[str, Any] = {}
        for j in range(cfg.num_res_blocks + 1):
            x, nubc[f"resnet_{j}"] = residual_block(upb[f"resnet_{j}"], x, ubc.get(f"resnet_{j}", {}))
        if i != n_stages - 1:
            mode = "upsample3d" if cfg.temperal_upsample[i] else "upsample2d"
            x, nubc["upsampler"] = resample(upb["upsampler"], x, mode, ubc.get("upsampler", {}))
        new_cache[f"up_block_{i}"] = nubc
        li += 1

    x = jax.nn.silu(rms_norm_video(p["norm_out"], x))
    x = _head_conv(p, "conv_out", x, cache, new_cache)
    return x, new_cache


# ---------------------------------------------------------------------------
# public streaming API
# ---------------------------------------------------------------------------

def wan_vae_encode(params: Params, cfg: WanVAEConfig, video: Array) -> Array:
    """video [B, F, H, W, 3] with F = 1 + 4k -> latent moments
    [B, 1+k, H/8, W/8, 2*z_dim] (chunks of [1, 4, 4, ...])."""
    f = video.shape[1]
    n_chunks = 1 + (f - 1) // 4
    cache = None
    outs = []
    enc = params["encoder"]
    for i in range(n_chunks):
        chunk = video[:, :1] if i == 0 else video[:, 1 + 4 * (i - 1): 1 + 4 * i]
        out, cache = wan_encoder_chunk(enc, cfg, chunk, cache)
        outs.append(out)
    moments = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    return _conv3d(params["quant_conv"], moments)


def wan_vae_decode(params: Params, cfg: WanVAEConfig, latents: Array) -> Array:
    """latents [B, F', H', W', z_dim] -> video [B, 1+4(F'-1), H, W, 3], clamped."""
    z = _conv3d(params["post_quant_conv"], latents)
    cache = None
    outs = []
    dec = params["decoder"]
    for i in range(z.shape[1]):
        out, cache = wan_decoder_chunk(dec, cfg, z[:, i:i + 1], cache)
        outs.append(out)
    video = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    return jnp.clip(video, -1.0, 1.0)


import functools as _functools


@_functools.lru_cache(maxsize=8)
def _jitted_wan_chunk_decode(cfg: WanVAEConfig):
    """One decoder latent-frame step; the incoming feat_cache is donated
    (dead after the step — donation avoids double-buffering it)."""
    @_functools.partial(jax.jit, donate_argnums=(2,))
    def step(dec, z1, cache):
        return wan_decoder_chunk(dec, cfg, z1, cache)

    return step


def wan_vae_decode_streamed(params: Params, cfg: WanVAEConfig, latents: Array) -> Array:
    """wan_vae_decode with each latent-frame chunk in its OWN jit call,
    carrying the feat_cache between calls (numerically identical — same
    chunking). Bounds HBM to one chunk's live set instead of letting XLA
    overlap all 13 chunks' buffers in a single graph (which exceeds a 16 GB
    v5e at 480x832), and serializes executions so queued chunks don't hold
    concurrent temp arenas (block_until_ready does not synchronize under the
    axon transport). Two compilations (first chunk: no cache; steady state)."""
    z = jax.jit(lambda p, l: _conv3d(p["post_quant_conv"], l))(params, latents)
    cache = None
    outs = []
    dec = params["decoder"]
    step = _jitted_wan_chunk_decode(cfg)
    for i in range(z.shape[1]):
        out, cache = step(dec, z[:, i:i + 1], cache)
        np.asarray(jax.device_get(out[0, 0, 0, 0, 0]))  # serialize chunks
        outs.append(out)
    video = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    return jnp.clip(video, -1.0, 1.0)


def normalize_latents(cfg: WanVAEConfig, z: Array) -> Array:
    """(z - mean) / std per channel (used by pipeline/spec; wan spec :761)."""
    mean = jnp.asarray(cfg.latents_mean, z.dtype)
    std = jnp.asarray(cfg.latents_std, z.dtype)
    return (z - mean) / std


def denormalize_latents(cfg: WanVAEConfig, z: Array) -> Array:
    mean = jnp.asarray(cfg.latents_mean, z.dtype)
    std = jnp.asarray(cfg.latents_std, z.dtype)
    return z * std + mean


# ---------------------------------------------------------------------------
# spatial tiling (AutoencoderKLWan.tiled_decode / tiled_encode,
# autoencoder_kl_wan.py:940-1063): stride-based overlapping tiles with linear
# blending, cropped to the stride and concatenated.
# ---------------------------------------------------------------------------

TILE_SAMPLE_MIN = 256
TILE_SAMPLE_STRIDE = 192


def _blend_axis(a: Array, b: Array, extent: int, axis: int) -> Array:
    extent = min(a.shape[axis], b.shape[axis], extent)
    if extent == 0:
        return b
    shape = [1] * b.ndim
    shape[axis] = extent
    w = (jnp.arange(extent, dtype=jnp.float32) / extent).reshape(shape)
    a_sl = jax.lax.slice_in_dim(a, a.shape[axis] - extent, a.shape[axis], axis=axis).astype(jnp.float32)
    b_head = jax.lax.slice_in_dim(b, 0, extent, axis=axis).astype(jnp.float32)
    b_tail = jax.lax.slice_in_dim(b, extent, b.shape[axis], axis=axis)
    blended = (a_sl * (1 - w) + b_head * w).astype(b.dtype)
    return jnp.concatenate([blended, b_tail], axis=axis)


def wan_vae_decode_tiled(
    params: Params, cfg: WanVAEConfig, latents: Array,
    tile_sample_min: int = TILE_SAMPLE_MIN,
    tile_sample_stride: int = TILE_SAMPLE_STRIDE,
    decode_fn=None,
) -> Array:
    """Spatially tiled Wan decode (channel-last [B, F', H', W', z])."""
    if decode_fn is None:
        import functools as _ft

        decode_fn = _jitted_wan_tile_decode(cfg)
    b, f, h, w, c = latents.shape
    ratio = 8
    tlm = tile_sample_min // ratio
    tls = tile_sample_stride // ratio
    blend = tile_sample_min - tile_sample_stride

    rows = []
    for i in range(0, h, tls):
        row = []
        for j in range(0, w, tls):
            row.append(decode_fn(params, latents[:, :, i:i + tlm, j:j + tlm]))
        rows.append(row)

    result_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j in range(len(row)):
            tile = row[j]
            if i > 0:
                tile = _blend_axis(rows[i - 1][j], tile, blend, axis=2)
            if j > 0:
                tile = _blend_axis(row[j - 1], tile, blend, axis=3)
            # the reference blends IN PLACE (blend_v/h mutate `b`), so later
            # neighbors must see the already-blended tile — write it back
            row[j] = tile
            result_row.append(tile[:, :, :tile_sample_stride, :tile_sample_stride])
        result_rows.append(jnp.concatenate(result_row, axis=3))
    out = jnp.concatenate(result_rows, axis=2)
    return out[:, :, :h * ratio, :w * ratio]


@_functools.lru_cache(maxsize=8)
def _jitted_wan_tile_decode(cfg: WanVAEConfig):
    return jax.jit(lambda p, z: wan_vae_decode(p, cfg, z))


# ---------------------------------------------------------------------------
# random init (tests / bench; real use loads converted HF weights). Dim math
# mirrors WanEncoder3d/WanDecoder3d (autoencoder_kl_wan.py:366-470, :542-620):
# encoder dims = base*[1]+dim_mult, decoder dims = base*[last]+reversed, with
# the decoder's post-upsample channel halving folded into each stage's in_dim.
# ---------------------------------------------------------------------------

def _init_c3(key, kt, kh, kw, cin, cout, dtype):
    fan = kt * kh * kw * cin
    return {"kernel": jax.random.normal(key, (kt, kh, kw, cin, cout), dtype) * fan ** -0.5,
            "bias": jnp.zeros((cout,), dtype)}


def _init_c2(key, cin, cout, dtype, k=3):
    fan = k * k * cin
    return {"kernel": jax.random.normal(key, (k, k, cin, cout), dtype) * fan ** -0.5,
            "bias": jnp.zeros((cout,), dtype)}


def _init_rms(c, dtype):
    return {"gamma": jnp.ones((c,), dtype)}


def _init_resblock(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _init_rms(cin, dtype),
        "conv1": _init_c3(ks[0], 3, 3, 3, cin, cout, dtype),
        "norm2": _init_rms(cout, dtype),
        "conv2": _init_c3(ks[1], 3, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = _init_c3(ks[2], 1, 1, 1, cin, cout, dtype)
    return p


def _init_attn(key, c, dtype):
    ks = jax.random.split(key, 2)
    return {
        "norm": _init_rms(c, dtype),
        "to_qkv": {"kernel": jax.random.normal(ks[0], (c, 3 * c), dtype) * c ** -0.5,
                   "bias": jnp.zeros((3 * c,), dtype)},
        "proj": {"kernel": jax.random.normal(ks[1], (c, c), dtype) * c ** -0.5,
                 "bias": jnp.zeros((c,), dtype)},
    }


def _init_mid(key, c, dtype):
    ks = jax.random.split(key, 3)
    return {"resnet_0": _init_resblock(ks[0], c, c, dtype),
            "attn_0": _init_attn(ks[1], c, dtype),
            "resnet_1": _init_resblock(ks[2], c, c, dtype)}


def init_wan_vae(key, cfg: WanVAEConfig, dtype=jnp.float32) -> Params:
    """Random Wan 3D-causal VAE params in the converter's tree layout."""
    n_stages = len(cfg.dim_mult)
    kiter = iter(jax.random.split(key, 256))

    enc_dims = [cfg.base_dim * u for u in [1] + list(cfg.dim_mult)]
    enc: Params = {"conv_in": _init_c3(next(kiter), 3, 3, 3, 3, enc_dims[0], dtype)}
    li = 0
    for i, (cin, cout) in enumerate(zip(enc_dims[:-1], enc_dims[1:])):
        for j in range(cfg.num_res_blocks):
            enc[f"layer_{li}"] = _init_resblock(next(kiter), cin if j == 0 else cout, cout, dtype)
            li += 1
        if i != n_stages - 1:
            p = {"conv": _init_c2(next(kiter), cout, cout, dtype)}
            if cfg.temperal_downsample[i]:
                p["time_conv"] = _init_c3(next(kiter), 3, 1, 1, cout, cout, dtype)
            enc[f"layer_{li}"] = p
            li += 1
    enc["mid_block"] = _init_mid(next(kiter), enc_dims[-1], dtype)
    enc["norm_out"] = _init_rms(enc_dims[-1], dtype)
    enc["conv_out"] = _init_c3(next(kiter), 3, 3, 3, enc_dims[-1], 2 * cfg.z_dim, dtype)

    dec_dims = [cfg.base_dim * u for u in [cfg.dim_mult[-1]] + list(cfg.dim_mult)[::-1]]
    dec: Params = {"conv_in": _init_c3(next(kiter), 3, 3, 3, cfg.z_dim, dec_dims[0], dtype)}
    dec["mid_block"] = _init_mid(next(kiter), dec_dims[0], dtype)
    up = cfg.temperal_upsample
    for i, (cin, cout) in enumerate(zip(dec_dims[:-1], dec_dims[1:])):
        if i > 0:
            cin = cin // 2  # the previous stage's upsampler halved channels
        blk: Params = {}
        for j in range(cfg.num_res_blocks + 1):
            blk[f"resnet_{j}"] = _init_resblock(next(kiter), cin if j == 0 else cout, cout, dtype)
        if i != n_stages - 1:
            p = {"conv": _init_c2(next(kiter), cout, cout // 2, dtype)}
            if up[i]:
                p["time_conv"] = _init_c3(next(kiter), 3, 1, 1, cout, 2 * cout, dtype)
            blk["upsampler"] = p
        dec[f"up_block_{i}"] = blk
    dec["norm_out"] = _init_rms(dec_dims[-1], dtype)
    dec["conv_out"] = _init_c3(next(kiter), 3, 3, 3, dec_dims[-1], 3, dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _init_c3(next(kiter), 1, 1, 1, 2 * cfg.z_dim, 2 * cfg.z_dim, dtype),
        "post_quant_conv": _init_c3(next(kiter), 1, 1, 1, cfg.z_dim, cfg.z_dim, dtype),
    }
