"""CogView4 transformer — functional JAX implementation.

Behavioral reference: diffusers CogView4Transformer2DModel
(diffusers/src/diffusers/models/transformers/transformer_cogview4.py):
2x2-patched image tokens + projected GLM text tokens through joint attention
(text leads the stream); a 12-way AdaLN-zero modulates BOTH streams per block
(one shared FFN); SDXL-style size conditions (original/target size, crop
coords) folded into the timestep embedding; per-head layer-norm qk norm;
half-rotation RoPE on the image tokens only; AdaLN-continuous output norm and
unpatchify.

TPU-native: blocks as one lax.scan over stacked weights; RoPE tables cached
host-side; attention through the provider registry.
"""

from __future__ import annotations

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
    silu,
    sinusoidal_timestep_embedding,
    timestep_embedding_mlp,
)
from ...ops.attention import scaled_dot_product_attention
from .config import CogView4Config

Array = jnp.ndarray
Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# RoPE (CogView4RotaryPosEmbed, transformer_cogview4.py:537-617): half-split
# (non-interleaved) tables; applied with use_real_unbind_dim=-2.
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _cogview4_rope_np(dim: int, height: int, width: int,
                      axes: Tuple[int, int], theta: float):
    dim_h = dim // 2
    inv_h = 1.0 / (theta ** (np.arange(0, dim_h, 2, dtype=np.float32)[: dim_h // 2] / dim_h))
    inv_w = inv_h.copy()
    freqs_h = np.outer(np.arange(axes[0], dtype=np.float32), inv_h)
    freqs_w = np.outer(np.arange(axes[1], dtype=np.float32), inv_w)
    h_idx = (np.arange(height) * axes[0] // height).astype(np.int64)
    w_idx = (np.arange(width) * axes[1] // width).astype(np.int64)
    fh = np.broadcast_to(freqs_h[h_idx][:, None, :], (height, width, dim_h // 2))
    fw = np.broadcast_to(freqs_w[w_idx][None, :, :], (height, width, dim_h // 2))
    f = np.concatenate([fh, fw], axis=-1)
    f = np.concatenate([f, f], axis=-1).reshape(height * width, dim)
    return np.cos(f).astype(np.float32), np.sin(f).astype(np.float32)


def cogview4_rope(cfg: CogView4Config, latent_height: int, latent_width: int):
    """(cos, sin) over the post-patch grid, each [S_img, head_dim]."""
    cos, sin = _cogview4_rope_np(
        cfg.attention_head_dim, latent_height // cfg.patch_size,
        latent_width // cfg.patch_size, tuple(cfg.rope_axes_dim), cfg.rope_theta)
    return jnp.asarray(cos), jnp.asarray(sin)


def _apply_rope_half(x: Array, cos: Array, sin: Array) -> Array:
    """use_real_unbind_dim=-2 rotation: halves, not interleaved pairs."""
    xf = x.astype(jnp.float32)
    x1, x2 = jnp.split(xf, 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * cos + rot * sin).astype(x.dtype)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_block(key, cfg: CogView4Config, dtype) -> Params:
    dim = cfg.inner_dim
    ks = jax.random.split(key, 7)
    return {
        "norm1": {"linear": init_linear(ks[0], cfg.time_embed_dim, 12 * dim, dtype=dtype)},
        "attn1": {
            "to_q": init_linear(ks[1], dim, dim, dtype=dtype),
            "to_k": init_linear(ks[2], dim, dim, dtype=dtype),
            "to_v": init_linear(ks[3], dim, dim, dtype=dtype),
            "to_out": init_linear(ks[4], dim, dim, dtype=dtype),
        },
        "ff": {
            "net_0": init_linear(jax.random.fold_in(ks[5], 0), dim, 4 * dim, dtype=dtype),
            "net_2": init_linear(jax.random.fold_in(ks[5], 1), 4 * dim, dim, dtype=dtype),
        },
    }


def init_cogview4(key, cfg: CogView4Config, dtype=jnp.float32) -> Params:
    dim = cfg.inner_dim
    keys = jax.random.split(key, 8)
    blocks = [_init_block(jax.random.fold_in(keys[0], i), cfg, dtype)
              for i in range(cfg.num_layers)]
    return {
        "patch_embed": {
            "proj": init_linear(keys[1], cfg.in_channels * cfg.patch_size ** 2, dim, dtype=dtype),
            "text_proj": init_linear(keys[2], cfg.text_embed_dim, dim, dtype=dtype),
        },
        "time_condition_embed": {
            "timestep_embedder": init_timestep_embedding_mlp(
                keys[3], dim, cfg.time_embed_dim, dtype=dtype),
            "condition_embedder": {
                "linear_1": init_linear(jax.random.fold_in(keys[4], 0),
                                        cfg.pooled_projection_dim, cfg.time_embed_dim, dtype=dtype),
                "linear_2": init_linear(jax.random.fold_in(keys[4], 1),
                                        cfg.time_embed_dim, cfg.time_embed_dim, dtype=dtype),
            },
        },
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm_out": {"linear": init_linear(keys[5], cfg.time_embed_dim, 2 * dim, dtype=dtype)},
        "proj_out": init_linear(keys[6], dim, cfg.patch_size ** 2 * cfg.out_channels, dtype=dtype),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def cogview4_forward(
    params: Params,
    cfg: CogView4Config,
    *,
    hidden_states: Array,          # [B, C, H, W] latents
    encoder_hidden_states: Array,  # [B, S_txt, text_embed_dim]
    timestep: Array,               # [B] in [0, num_train_timesteps]
    original_size: Array,          # [B, 2]
    target_size: Array,            # [B, 2]
    crop_coords: Array,            # [B, 2]
    attention_mask: Optional[Array] = None,  # [B, S_txt] 1=keep
    remat: bool = True,
) -> Array:
    b, c, h, w = hidden_states.shape
    p = cfg.patch_size
    dim = cfg.inner_dim
    heads = cfg.num_attention_heads
    hd = cfg.attention_head_dim
    dtype = encoder_hidden_states.dtype

    # patchify: [B, C, H, W] -> [B, (H/p)(W/p), C p p]
    x = hidden_states.reshape(b, c, h // p, p, w // p, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, (h // p) * (w // p), c * p * p)
    hs = linear(params["patch_embed"]["proj"], x.astype(dtype))
    enc = linear(params["patch_embed"]["text_proj"], encoder_hidden_states)
    s_txt = enc.shape[1]

    tce = params["time_condition_embed"]
    t_proj = sinusoidal_timestep_embedding(
        timestep.astype(jnp.float32), dim, flip_sin_to_cos=True, downscale_freq_shift=0.0)
    cond = jnp.concatenate([
        sinusoidal_timestep_embedding(
            v.reshape(-1).astype(jnp.float32), cfg.condition_dim,
            flip_sin_to_cos=True, downscale_freq_shift=0.0).reshape(b, -1)
        for v in (original_size, crop_coords, target_size)], axis=1)
    temb = (timestep_embedding_mlp(tce["timestep_embedder"], t_proj.astype(dtype))
            + timestep_embedding_mlp(tce["condition_embedder"], cond.astype(dtype)))
    temb = silu(temb.astype(jnp.float32)).astype(dtype)  # silu applied ONCE up front

    cos, sin = cogview4_rope(cfg, h, w)
    bias = None
    if attention_mask is not None:
        # Reference quirk (transformer_cogview4.py:168-175): the boolean mask
        # matrix is cast to FLOAT 0/1 and passed to F.sdpa's attn_mask, which
        # ADDS float masks — i.e. kept pairs get a +1.0 logit bias and padded
        # pairs get +0.0. We reproduce that additive behavior bit-for-bit.
        mix = jnp.concatenate([
            attention_mask.astype(jnp.float32),
            jnp.ones((b, hs.shape[1]), jnp.float32)], axis=1)
        keep = mix[:, None, :] * mix[:, :, None] > 0
        bias = keep.astype(jnp.float32)[:, None]

    def block(carry, bp):
        hs, enc = carry
        m = linear(bp["norm1"]["linear"], temb)  # no extra silu here
        mods = [v.astype(jnp.float32)[:, None] for v in jnp.split(m, 12, axis=-1)]
        (sh_msa, c_sh_msa, sc_msa, c_sc_msa, g_msa, c_g_msa,
         sh_mlp, c_sh_mlp, sc_mlp, c_sc_mlp, g_mlp, c_g_mlp) = mods

        nhs = (layer_norm({}, hs, 1e-5).astype(jnp.float32) * (1 + sc_msa) + sh_msa).astype(dtype)
        nenc = (layer_norm({}, enc, 1e-5).astype(jnp.float32) * (1 + c_sc_msa) + c_sh_msa).astype(dtype)

        joint = jnp.concatenate([nenc, nhs], axis=1)
        a = bp["attn1"]
        s_all = joint.shape[1]
        q = linear(a["to_q"], joint).reshape(b, s_all, heads, hd).transpose(0, 2, 1, 3)
        k = linear(a["to_k"], joint).reshape(b, s_all, heads, hd).transpose(0, 2, 1, 3)
        v = linear(a["to_v"], joint).reshape(b, s_all, heads, hd).transpose(0, 2, 1, 3)
        # per-head layer norm, no affine (qk_norm="layer_norm")
        q = layer_norm({}, q, 1e-5).astype(dtype)
        k = layer_norm({}, k, 1e-5).astype(dtype)
        # concatenate instead of .at[].set: the dynamic-update-slice form
        # fused with the qk layer-norm MISCOMPILES on XLA:CPU inside
        # lax.scan at batch 1 (silent ~1e-2 wrong values; scan-vs-python-loop
        # divergence isolated in tests/test_transformer_cogview4.py)
        q = jnp.concatenate(
            [q[:, :, :s_txt], _apply_rope_half(q[:, :, s_txt:], cos, sin)], axis=2)
        k = jnp.concatenate(
            [k[:, :, :s_txt], _apply_rope_half(k[:, :, s_txt:], cos, sin)], axis=2)
        if bias is not None:
            scores = (q.astype(jnp.float32) @ k.astype(jnp.float32).transpose(0, 1, 3, 2)
                      ) * (hd ** -0.5) + bias
            out = jax.nn.softmax(scores, axis=-1).astype(dtype) @ v
        else:
            out = scaled_dot_product_attention(q, k, v)
        out = linear(a["to_out"], out.transpose(0, 2, 1, 3).reshape(b, s_all, dim))
        enc_attn, hs_attn = out[:, :s_txt], out[:, s_txt:]
        hs = hs + (hs_attn.astype(jnp.float32) * g_msa).astype(dtype)
        enc = enc + (enc_attn.astype(jnp.float32) * c_g_msa).astype(dtype)

        nhs = (layer_norm({}, hs, 1e-5).astype(jnp.float32) * (1 + sc_mlp) + sh_mlp).astype(dtype)
        nenc = (layer_norm({}, enc, 1e-5).astype(jnp.float32) * (1 + c_sc_mlp) + c_sh_mlp).astype(dtype)
        ff = lambda x: linear(bp["ff"]["net_2"],
                              jax.nn.gelu(linear(bp["ff"]["net_0"], x), approximate=True))
        hs = hs + (ff(nhs).astype(jnp.float32) * g_mlp).astype(dtype)
        enc = enc + (ff(nenc).astype(jnp.float32) * c_g_mlp).astype(dtype)
        return (hs, enc), None

    hs, enc = scan_blocks_with_remat(block, (hs, enc), params["blocks"], remat)

    # AdaLayerNormContinuous: silu INSIDE (temb gets silu twice, as reference)
    m = linear(params["norm_out"]["linear"], silu(temb.astype(jnp.float32)).astype(dtype))
    scale, shift = [v.astype(jnp.float32)[:, None] for v in jnp.split(m, 2, axis=-1)]
    hs = (layer_norm({}, hs, 1e-5).astype(jnp.float32) * (1 + scale) + shift).astype(dtype)
    hs = linear(params["proj_out"], hs)

    # unpatchify
    out = hs.reshape(b, h // p, w // p, cfg.out_channels, p, p)
    return out.transpose(0, 3, 1, 4, 2, 5).reshape(b, cfg.out_channels, h, w)


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------

def convert_cogview4_state_dict(sd: Dict[str, np.ndarray], cfg: CogView4Config,
                                dtype=jnp.float32) -> Params:
    """diffusers CogView4Transformer2DModel state dict -> vap_tpu pytree."""
    def lin(name):
        return {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T, dtype),
                "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}

    blocks = [{
        "norm1": {"linear": lin(f"transformer_blocks.{i}.norm1.linear")},
        "attn1": {
            "to_q": lin(f"transformer_blocks.{i}.attn1.to_q"),
            "to_k": lin(f"transformer_blocks.{i}.attn1.to_k"),
            "to_v": lin(f"transformer_blocks.{i}.attn1.to_v"),
            "to_out": lin(f"transformer_blocks.{i}.attn1.to_out.0"),
        },
        "ff": {"net_0": lin(f"transformer_blocks.{i}.ff.net.0.proj"),
               "net_2": lin(f"transformer_blocks.{i}.ff.net.2")},
    } for i in range(cfg.num_layers)]

    return {
        "patch_embed": {
            "proj": lin("patch_embed.proj"),
            "text_proj": lin("patch_embed.text_proj"),
        },
        "time_condition_embed": {
            "timestep_embedder": {
                "linear_1": lin("time_condition_embed.timestep_embedder.linear_1"),
                "linear_2": lin("time_condition_embed.timestep_embedder.linear_2"),
            },
            "condition_embedder": {
                "linear_1": lin("time_condition_embed.condition_embedder.linear_1"),
                "linear_2": lin("time_condition_embed.condition_embedder.linear_2"),
            },
        },
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm_out": {"linear": lin("norm_out.linear")},
        "proj_out": lin("proj_out"),
    }
