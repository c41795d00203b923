"""LTX-Video transformer — functional JAX implementation.

Behavioral reference: diffusers LTXVideoTransformer3DModel
(diffusers/src/diffusers/models/transformers/transformer_ltx.py:302-487):
single-stream blocks with per-block learned scale-shift tables modulated by a
PixArt-style AdaLN-single timestep embedding (supports PER-TOKEN timesteps —
the training path conditions the first frame at a lower sigma, finetrainers
ltx_video/base_specification.py:308-331), RMSNorm-across-heads qk norm,
log-spaced 3-axis RoPE applied on the unsplit [B, S, dim] q/k, T5 cross
attention, and a scale-shift final norm.

TPU-native: blocks run as ONE lax.scan over stacked weights; RoPE tables are
computed from the (static) video grid; attention uses the provider registry.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import (
    scan_blocks_with_remat,
    init_linear,
    init_timestep_embedding_mlp,
    layer_norm,
    linear,
    rms_norm,
    silu,
    sinusoidal_timestep_embedding,
    timestep_embedding_mlp,
)
from ...ops.attention import scaled_dot_product_attention
from .config import LTXVideoConfig

Array = jnp.ndarray
Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# RoPE (LTXVideoRotaryPosEmbed, transformer_ltx.py:96-196)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _ltx_rope_np(dim: int, num_frames: int, height: int, width: int,
                 scale_f: float, scale_h: float, scale_w: float,
                 patch_size: int, patch_size_t: int,
                 base_f: int, base_h: int, base_w: int, theta: float):
    grid_f, grid_h, grid_w = np.meshgrid(
        np.arange(num_frames, dtype=np.float32),
        np.arange(height, dtype=np.float32),
        np.arange(width, dtype=np.float32), indexing="ij")
    grid = np.stack([
        grid_f * scale_f * patch_size_t / base_f,
        grid_h * scale_h * patch_size / base_h,
        grid_w * scale_w * patch_size / base_w,
    ], axis=0).reshape(3, -1).T  # [S, 3]

    n = dim // 6
    freqs = theta ** np.linspace(math.log(1.0, theta), math.log(theta, theta),
                                 n, dtype=np.float32)
    freqs = freqs * math.pi / 2.0
    f = freqs[None, None, :] * (grid[:, :, None] * 2 - 1)  # [S, 3, n]
    f = f.transpose(0, 2, 1).reshape(grid.shape[0], -1)    # [S, 3n] axis-interleaved
    cos = np.repeat(np.cos(f), 2, axis=-1)
    sin = np.repeat(np.sin(f), 2, axis=-1)
    if dim % 6 != 0:
        pad = dim % 6
        cos = np.concatenate([np.ones_like(cos[:, :pad]), cos], axis=-1)
        sin = np.concatenate([np.zeros_like(sin[:, :pad]), sin], axis=-1)
    return cos.astype(np.float32), sin.astype(np.float32)


def ltx_rope(cfg: LTXVideoConfig, num_frames: int, height: int, width: int,
             rope_interpolation_scale=(1.0, 1.0, 1.0)) -> Tuple[Array, Array]:
    """Latent-grid RoPE tables: (cos, sin) each [S, inner_dim]."""
    sf, sh, sw = (float(s) for s in rope_interpolation_scale)
    cos, sin = _ltx_rope_np(
        cfg.inner_dim, num_frames, height, width, sf, sh, sw,
        cfg.patch_size, cfg.patch_size_t,
        cfg.rope_base_num_frames, cfg.rope_base_height, cfg.rope_base_width,
        cfg.rope_theta)
    return jnp.asarray(cos), jnp.asarray(sin)


def _apply_rope_full(x: Array, cos: Array, sin: Array) -> Array:
    """RoPE on UNSPLIT [B, S, dim] (transformer_ltx.py:481-487)."""
    xf = x.astype(jnp.float32)
    xr = xf.reshape(*x.shape[:-1], -1, 2)
    rot = jnp.stack([-xr[..., 1], xr[..., 0]], axis=-1).reshape(x.shape)
    return (xf * cos + rot * sin).astype(x.dtype)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_attn(key, cfg: LTXVideoConfig, kv_dim: int, dtype) -> Params:
    dim = cfg.inner_dim
    ks = jax.random.split(key, 4)
    return {
        "to_q": init_linear(ks[0], dim, dim, dtype=dtype),
        "to_k": init_linear(ks[1], kv_dim, dim, dtype=dtype),
        "to_v": init_linear(ks[2], kv_dim, dim, dtype=dtype),
        "to_out": init_linear(ks[3], dim, dim, dtype=dtype),
        # rms_norm_across_heads: one scale over the full inner dim
        "norm_q": {"scale": jnp.ones((dim,), dtype)},
        "norm_k": {"scale": jnp.ones((dim,), dtype)},
    }


def _init_block(key, cfg: LTXVideoConfig, dtype) -> Params:
    dim = cfg.inner_dim
    ks = jax.random.split(key, 4)
    return {
        "attn1": _init_attn(ks[0], cfg, dim, dtype),
        "attn2": _init_attn(ks[1], cfg, cfg.cross_attention_dim, dtype),
        "ff": {
            "net_0": init_linear(jax.random.fold_in(ks[2], 0), dim, 4 * dim, dtype=dtype),
            "net_2": init_linear(jax.random.fold_in(ks[2], 1), 4 * dim, dim, dtype=dtype),
        },
        "scale_shift_table": jax.random.normal(ks[3], (6, dim), dtype) / dim ** 0.5,
    }


def init_ltx_video(key, cfg: LTXVideoConfig, dtype=jnp.float32) -> Params:
    dim = cfg.inner_dim
    keys = jax.random.split(key, 7)
    blocks = [_init_block(jax.random.fold_in(keys[0], i), cfg, dtype)
              for i in range(cfg.num_layers)]
    return {
        "proj_in": init_linear(keys[1], cfg.in_channels, dim, dtype=dtype),
        "time_embed": init_timestep_embedding_mlp(keys[2], 256, dim, dtype=dtype),
        "time_linear": init_linear(keys[3], dim, 6 * dim, dtype=dtype),
        "caption_projection": {
            "linear_1": init_linear(jax.random.fold_in(keys[4], 0),
                                    cfg.caption_channels, dim, dtype=dtype),
            "linear_2": init_linear(jax.random.fold_in(keys[4], 1), dim, dim, dtype=dtype),
        },
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "scale_shift_table": jax.random.normal(keys[5], (2, dim), dtype) / dim ** 0.5,
        "proj_out": init_linear(keys[6], dim, cfg.out_channels, dtype=dtype),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _attention(p: Params, x: Array, ctx: Array, heads: int, cos=None, sin=None,
               ctx_bias: Optional[Array] = None, eps: float = 1e-6) -> Array:
    b, s, dim = x.shape
    q = rms_norm(p["norm_q"], linear(p["to_q"], x), eps)
    k = rms_norm(p["norm_k"], linear(p["to_k"], ctx), eps)
    v = linear(p["to_v"], ctx)
    if cos is not None:
        q = _apply_rope_full(q, cos, sin)
        k = _apply_rope_full(k, cos, sin)
    d = dim // heads
    q = q.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, ctx.shape[1], heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, ctx.shape[1], heads, d).transpose(0, 2, 1, 3)
    if ctx_bias is not None:
        # masked cross attention: dense path with additive bias (short text ctx)
        scores = (q.astype(jnp.float32) @ k.astype(jnp.float32).transpose(0, 1, 3, 2)
                  ) * (d ** -0.5) + ctx_bias[:, :, None, :]
        out = jax.nn.softmax(scores, axis=-1).astype(x.dtype) @ v
    else:
        out = scaled_dot_product_attention(q, k, v)
    return linear(p["to_out"], out.transpose(0, 2, 1, 3).reshape(b, s, dim))


def ltx_video_forward(
    params: Params,
    cfg: LTXVideoConfig,
    *,
    hidden_states: Array,          # [B, S, in_channels] packed latents
    encoder_hidden_states: Array,  # [B, S_txt, caption_channels]
    timestep: Array,               # [B] or [B, S] in [0, 1000]
    num_frames: int,
    height: int,
    width: int,
    rope_interpolation_scale=(1.0, 1.0, 1.0),
    encoder_attention_mask: Optional[Array] = None,  # [B, S_txt] 1=keep
    remat: bool = True,
) -> Array:
    dim = cfg.inner_dim
    heads = cfg.num_attention_heads
    dtype = hidden_states.dtype
    b = hidden_states.shape[0]

    cos, sin = ltx_rope(cfg, num_frames, height, width, rope_interpolation_scale)
    cos = cos[None].astype(jnp.float32)
    sin = sin[None].astype(jnp.float32)

    x = linear(params["proj_in"], hidden_states)
    t = jnp.reshape(timestep, (-1,)).astype(jnp.float32)
    emb_t = timestep_embedding_mlp(
        params["time_embed"],
        sinusoidal_timestep_embedding(t, 256, flip_sin_to_cos=True,
                                      downscale_freq_shift=0.0).astype(dtype))
    temb = linear(params["time_linear"], silu(emb_t.astype(jnp.float32)).astype(dtype))
    temb = temb.reshape(b, -1, 6 * dim)          # [B, 1 or S, 6D]
    emb_t = emb_t.reshape(b, -1, dim)

    # PixArtAlphaTextProjection with its default gelu-tanh activation
    cp = params["caption_projection"]
    enc = linear(cp["linear_2"],
                 jax.nn.gelu(linear(cp["linear_1"], encoder_hidden_states.astype(dtype)),
                             approximate=True))
    ctx_bias = None
    if encoder_attention_mask is not None:
        ctx_bias = ((1.0 - encoder_attention_mask.astype(jnp.float32)) * -10000.0)[:, None]

    def block(x, bp):
        ada = (bp["scale_shift_table"].astype(jnp.float32)[None, None]
               + temb.astype(jnp.float32).reshape(b, -1, 6, dim))
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = [ada[:, :, i] for i in range(6)]
        n = rms_norm({}, x, cfg.norm_eps).astype(jnp.float32) * (1 + sc_msa) + sh_msa
        attn = _attention(bp["attn1"], n.astype(dtype), n.astype(dtype), heads, cos, sin)
        x = x + (attn.astype(jnp.float32) * g_msa).astype(dtype)
        x = x + _attention(bp["attn2"], x, enc, heads, ctx_bias=ctx_bias)
        n = rms_norm({}, x, cfg.norm_eps).astype(jnp.float32) * (1 + sc_mlp) + sh_mlp
        ff = linear(bp["ff"]["net_2"],
                    jax.nn.gelu(linear(bp["ff"]["net_0"], n.astype(dtype)), approximate=True))
        x = x + (ff.astype(jnp.float32) * g_mlp).astype(dtype)
        return x, None

    x = scan_blocks_with_remat(block, x, params["blocks"], remat)

    ss = (params["scale_shift_table"].astype(jnp.float32)[None, None]
          + emb_t.astype(jnp.float32)[:, :, None])  # [B, tokens, 2, D]
    shift, scale = ss[:, :, 0], ss[:, :, 1]
    x = layer_norm({}, x, 1e-6).astype(jnp.float32) * (1 + scale) + shift
    return linear(params["proj_out"], x.astype(dtype))


def pack_ltx_latents(latents: Array, patch_size: int = 1, patch_size_t: int = 1) -> Array:
    """[B, C, F, H, W] -> [B, F/pt * H/p * W/p, C*pt*p*p]
    (finetrainers ltx spec _pack_latents :450-474)."""
    b, c, f, h, w = latents.shape
    x = latents.reshape(b, c, f // patch_size_t, patch_size_t,
                        h // patch_size, patch_size, w // patch_size, patch_size)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return x.reshape(b, (f // patch_size_t) * (h // patch_size) * (w // patch_size), -1)


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------

def convert_ltx_video_state_dict(sd: Dict[str, np.ndarray], cfg: LTXVideoConfig,
                                 dtype=jnp.float32) -> Params:
    """diffusers LTXVideoTransformer3DModel state dict -> vap_tpu pytree."""
    def lin(name):
        p = {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T, dtype)}
        if f"{name}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{name}.bias"], dtype)
        return p

    def rms(name):
        return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype)}

    def attn(pre):
        return {
            "to_q": lin(f"{pre}.to_q"), "to_k": lin(f"{pre}.to_k"),
            "to_v": lin(f"{pre}.to_v"), "to_out": lin(f"{pre}.to_out.0"),
            "norm_q": rms(f"{pre}.norm_q"), "norm_k": rms(f"{pre}.norm_k"),
        }

    blocks = [{
        "attn1": attn(f"transformer_blocks.{i}.attn1"),
        "attn2": attn(f"transformer_blocks.{i}.attn2"),
        "ff": {"net_0": lin(f"transformer_blocks.{i}.ff.net.0.proj"),
               "net_2": lin(f"transformer_blocks.{i}.ff.net.2")},
        "scale_shift_table": jnp.asarray(sd[f"transformer_blocks.{i}.scale_shift_table"], dtype),
    } for i in range(cfg.num_layers)]

    return {
        "proj_in": lin("proj_in"),
        "time_embed": {
            "linear_1": lin("time_embed.emb.timestep_embedder.linear_1"),
            "linear_2": lin("time_embed.emb.timestep_embedder.linear_2"),
        },
        "time_linear": lin("time_embed.linear"),
        "caption_projection": {
            "linear_1": lin("caption_projection.linear_1"),
            "linear_2": lin("caption_projection.linear_2"),
        },
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "scale_shift_table": jnp.asarray(sd["scale_shift_table"], dtype),
        "proj_out": lin("proj_out"),
    }
