"""Flux transformer — functional JAX implementation.

Behavioral reference: diffusers FluxTransformer2DModel
(diffusers/src/diffusers/models/transformers/transformer_flux.py:389-549):
packed [B, S_img, 64] latents through a linear x_embedder; text through a
context embedder; AdaLN conditioning = timestep + (optional) guidance +
pooled-CLIP projections; 19 dual-stream blocks (separate img/txt AdaLN-zero +
joint attention over [txt ‖ img]) then 38 single-stream blocks over the fused
stream (parallel attention + MLP combined by one output projection);
AdaLN-continuous final norm and a linear head over the image tokens only.

TPU-native design: param pytree; dual and single blocks each run as ONE
lax.scan over stacked weights; RoPE tables precomputed once from ids on the
host; attention goes through the provider registry (Pallas flash on TPU).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import (
    scan_blocks_with_remat,
    init_layer_norm,
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
from ...ops.rope import apply_rotary_emb, get_1d_rotary_pos_embed
from .config import FluxConfig

Array = jnp.ndarray
Params = Dict[str, Any]

_EPS = 1e-6


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_qkv(key, dim: int, head_dim: int, dtype, added: bool, pre_only: bool) -> Params:
    ks = jax.random.split(key, 10)
    p = {
        "to_q": init_linear(ks[0], dim, dim, dtype=dtype),
        "to_k": init_linear(ks[1], dim, dim, dtype=dtype),
        "to_v": init_linear(ks[2], dim, dim, dtype=dtype),
        "norm_q": {"scale": jnp.ones((head_dim,), dtype)},
        "norm_k": {"scale": jnp.ones((head_dim,), dtype)},
    }
    if not pre_only:
        p["to_out"] = init_linear(ks[3], dim, dim, dtype=dtype)
    if added:
        p.update({
            "add_q_proj": init_linear(ks[4], dim, dim, dtype=dtype),
            "add_k_proj": init_linear(ks[5], dim, dim, dtype=dtype),
            "add_v_proj": init_linear(ks[6], dim, dim, dtype=dtype),
            "norm_added_q": {"scale": jnp.ones((head_dim,), dtype)},
            "norm_added_k": {"scale": jnp.ones((head_dim,), dtype)},
            "to_add_out": init_linear(ks[7], dim, dim, dtype=dtype),
        })
    return p


def _init_ff(key, dim: int, dtype) -> Params:
    k0, k2 = jax.random.split(key)
    return {
        "net_0": init_linear(k0, dim, 4 * dim, dtype=dtype),
        "net_2": init_linear(k2, 4 * dim, dim, dtype=dtype),
    }


def _init_dual_block(key, cfg: FluxConfig, dtype) -> Params:
    dim = cfg.inner_dim
    ks = jax.random.split(key, 6)
    return {
        "norm1": {"linear": init_linear(ks[0], dim, 6 * dim, dtype=dtype)},
        "norm1_context": {"linear": init_linear(ks[1], dim, 6 * dim, dtype=dtype)},
        "attn": _init_qkv(ks[2], dim, cfg.attention_head_dim, dtype, added=True, pre_only=False),
        "ff": _init_ff(ks[3], dim, dtype),
        "ff_context": _init_ff(ks[4], dim, dtype),
    }


def _init_single_block(key, cfg: FluxConfig, dtype) -> Params:
    dim = cfg.inner_dim
    ks = jax.random.split(key, 4)
    return {
        "norm": {"linear": init_linear(ks[0], dim, 3 * dim, dtype=dtype)},
        "proj_mlp": init_linear(ks[1], dim, 4 * dim, dtype=dtype),
        "proj_out": init_linear(ks[2], 5 * dim, dim, dtype=dtype),
        "attn": _init_qkv(ks[3], dim, cfg.attention_head_dim, dtype, added=False, pre_only=True),
    }


def init_flux(key, cfg: FluxConfig, dtype=jnp.float32) -> Params:
    dim = cfg.inner_dim
    keys = jax.random.split(key, 10)
    tte = {
        "timestep_embedder": init_timestep_embedding_mlp(keys[0], 256, dim, dtype=dtype),
        "text_embedder": {
            "linear_1": init_linear(jax.random.fold_in(keys[1], 0),
                                    cfg.pooled_projection_dim, dim, dtype=dtype),
            "linear_2": init_linear(jax.random.fold_in(keys[1], 1), dim, dim, dtype=dtype),
        },
    }
    if cfg.guidance_embeds:
        tte["guidance_embedder"] = init_timestep_embedding_mlp(keys[2], 256, dim, dtype=dtype)

    dual = [_init_dual_block(jax.random.fold_in(keys[3], i), cfg, dtype)
            for i in range(cfg.num_layers)]
    single = [_init_single_block(jax.random.fold_in(keys[4], i), cfg, dtype)
              for i in range(cfg.num_single_layers)]
    stack = lambda blocks: jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "x_embedder": init_linear(keys[5], cfg.in_channels, dim, dtype=dtype),
        "context_embedder": init_linear(keys[6], cfg.joint_attention_dim, dim, dtype=dtype),
        "time_text_embed": tte,
        "dual_blocks": stack(dual),
        "single_blocks": stack(single),
        "norm_out": {"linear": init_linear(keys[7], dim, 2 * dim, dtype=dtype)},
        "proj_out": init_linear(
            keys[8], dim, cfg.patch_size * cfg.patch_size * cfg.output_channels, dtype=dtype),
    }


# ---------------------------------------------------------------------------
# RoPE over (id-axis) grids — FluxPosEmbed (embeddings.py:1276-1304)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _flux_rope_np(axes_dims: Tuple[int, ...], theta: float,
                  ids_key: bytes, ids_shape: Tuple[int, int]):
    ids = np.frombuffer(ids_key, np.float32).reshape(ids_shape)
    cos_out, sin_out = [], []
    for i, d in enumerate(axes_dims):
        cos, sin = get_1d_rotary_pos_embed(d, ids[:, i], theta=theta, freqs_dtype=np.float64)
        cos_out.append(cos)
        sin_out.append(sin)
    return np.concatenate(cos_out, axis=-1), np.concatenate(sin_out, axis=-1)


def flux_rope(cfg: FluxConfig, ids: np.ndarray) -> Tuple[Array, Array]:
    """ids: [S, 3] float -> (cos, sin) each [S, head_dim]."""
    ids = np.asarray(ids, np.float32)
    cos, sin = _flux_rope_np(tuple(cfg.axes_dims_rope), cfg.rope_theta,
                             ids.tobytes(), ids.shape)
    return jnp.asarray(cos), jnp.asarray(sin)


def prepare_latent_image_ids(height: int, width: int) -> np.ndarray:
    """Packed-latent position ids (FluxPipeline._prepare_latent_image_ids):
    [h/2 * w/2, 3] with axis 0 = 0, axis 1 = row, axis 2 = col."""
    ids = np.zeros((height, width, 3), np.float32)
    ids[..., 1] = np.arange(height, dtype=np.float32)[:, None]
    ids[..., 2] = np.arange(width, dtype=np.float32)[None, :]
    return ids.reshape(-1, 3)


def pack_latents(latents: Array) -> Array:
    """[B, C, H, W] -> [B, H/2*W/2, C*4] (FluxPipeline._pack_latents)."""
    b, c, h, w = latents.shape
    x = latents.reshape(b, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(latents: Array, h: int, w: int) -> Array:
    """[B, h/2*w/2, C*4] -> [B, C, h, w] (FluxPipeline._unpack_latents;
    h/w are the UNPACKED latent dims)."""
    b, _, c4 = latents.shape
    c = c4 // 4
    x = latents.reshape(b, h // 2, w // 2, c, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, h, w)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _heads(x: Array, num_heads: int) -> Array:
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _unheads(x: Array) -> Array:
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def _mod6(p: Params, temb: Array, dtype):
    m = linear(p["linear"], silu(temb.astype(jnp.float32)).astype(temb.dtype))
    return [c.astype(jnp.float32)[:, None] for c in jnp.split(m, 6, axis=-1)]


def _dual_block(bp: Params, hs: Array, enc: Array, temb: Array, cos, sin, heads: int):
    dtype = hs.dtype
    sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = _mod6(bp["norm1"], temb, dtype)
    c_sh_msa, c_sc_msa, c_g_msa, c_sh_mlp, c_sc_mlp, c_g_mlp = _mod6(bp["norm1_context"], temb, dtype)

    nhs = (layer_norm({}, hs, _EPS).astype(jnp.float32) * (1 + sc_msa) + sh_msa).astype(dtype)
    nenc = (layer_norm({}, enc, _EPS).astype(jnp.float32) * (1 + c_sc_msa) + c_sh_msa).astype(dtype)

    a = bp["attn"]
    q = rms_norm(a["norm_q"], _heads(linear(a["to_q"], nhs), heads), _EPS)
    k = rms_norm(a["norm_k"], _heads(linear(a["to_k"], nhs), heads), _EPS)
    v = _heads(linear(a["to_v"], nhs), heads)
    qc = rms_norm(a["norm_added_q"], _heads(linear(a["add_q_proj"], nenc), heads), _EPS)
    kc = rms_norm(a["norm_added_k"], _heads(linear(a["add_k_proj"], nenc), heads), _EPS)
    vc = _heads(linear(a["add_v_proj"], nenc), heads)
    # text tokens lead the joint stream (FluxAttnProcessor2_0)
    q = jnp.concatenate([qc, q], axis=2)
    k = jnp.concatenate([kc, k], axis=2)
    v = jnp.concatenate([vc, v], axis=2)
    q = apply_rotary_emb(q, cos, sin)
    k = apply_rotary_emb(k, cos, sin)
    out = _unheads(scaled_dot_product_attention(q, k, v))
    s_txt = enc.shape[1]
    ctx_attn, img_attn = out[:, :s_txt], out[:, s_txt:]

    hs = hs + (g_msa * linear(a["to_out"], img_attn).astype(jnp.float32)).astype(dtype)
    n2 = (layer_norm({}, hs, _EPS).astype(jnp.float32) * (1 + sc_mlp) + sh_mlp).astype(dtype)
    ff = linear(bp["ff"]["net_2"], jax.nn.gelu(linear(bp["ff"]["net_0"], n2), approximate=True))
    hs = hs + (g_mlp * ff.astype(jnp.float32)).astype(dtype)

    enc = enc + (c_g_msa * linear(a["to_add_out"], ctx_attn).astype(jnp.float32)).astype(dtype)
    n2c = (layer_norm({}, enc, _EPS).astype(jnp.float32) * (1 + c_sc_mlp) + c_sh_mlp).astype(dtype)
    ffc = linear(bp["ff_context"]["net_2"],
                 jax.nn.gelu(linear(bp["ff_context"]["net_0"], n2c), approximate=True))
    enc = enc + (c_g_mlp * ffc.astype(jnp.float32)).astype(dtype)
    return hs, enc


def _single_block(bp: Params, x: Array, temb: Array, cos, sin, heads: int):
    dtype = x.dtype
    m = linear(bp["norm"]["linear"], silu(temb.astype(jnp.float32)).astype(temb.dtype))
    shift, scale, gate = [c.astype(jnp.float32)[:, None] for c in jnp.split(m, 3, axis=-1)]
    n = (layer_norm({}, x, _EPS).astype(jnp.float32) * (1 + scale) + shift).astype(dtype)
    mlp = jax.nn.gelu(linear(bp["proj_mlp"], n), approximate=True)
    a = bp["attn"]
    q = apply_rotary_emb(rms_norm(a["norm_q"], _heads(linear(a["to_q"], n), heads), _EPS), cos, sin)
    k = apply_rotary_emb(rms_norm(a["norm_k"], _heads(linear(a["to_k"], n), heads), _EPS), cos, sin)
    v = _heads(linear(a["to_v"], n), heads)
    attn = _unheads(scaled_dot_product_attention(q, k, v))
    out = linear(bp["proj_out"], jnp.concatenate([attn, mlp], axis=-1))
    return x + (gate * out.astype(jnp.float32)).astype(dtype)


def flux_forward(
    params: Params,
    cfg: FluxConfig,
    *,
    hidden_states: Array,          # [B, S_img, in_channels] packed latents
    encoder_hidden_states: Array,  # [B, S_txt, joint_attention_dim]
    pooled_projections: Array,     # [B, pooled_projection_dim]
    timestep: Array,               # [B] in [0, 1] (sigmas)
    img_ids: Array,                # [S_img, 3]
    txt_ids: Optional[Array] = None,  # [S_txt, 3]; zeros if None
    guidance: Optional[Array] = None,  # [B] raw scale (x1000 applied inside)
    remat: bool = True,
) -> Array:
    """Returns [B, S_img, out_channels] flow-velocity prediction."""
    heads = cfg.num_attention_heads
    dtype = hidden_states.dtype
    hs = linear(params["x_embedder"], hidden_states)
    enc = linear(params["context_embedder"], encoder_hidden_states.astype(dtype))

    t = timestep.astype(jnp.float32) * 1000.0
    tte = params["time_text_embed"]
    temb = timestep_embedding_mlp(
        tte["timestep_embedder"],
        sinusoidal_timestep_embedding(t, 256, flip_sin_to_cos=True,
                                      downscale_freq_shift=0.0).astype(dtype))
    if cfg.guidance_embeds:
        g = (guidance if guidance is not None else jnp.ones_like(timestep)).astype(jnp.float32) * 1000.0
        temb = temb + timestep_embedding_mlp(
            tte["guidance_embedder"],
            sinusoidal_timestep_embedding(g, 256, flip_sin_to_cos=True,
                                          downscale_freq_shift=0.0).astype(dtype))
    temb = temb + timestep_embedding_mlp(tte["text_embedder"], pooled_projections.astype(dtype))

    if txt_ids is None:
        ids = np.concatenate([
            np.zeros((encoder_hidden_states.shape[1], 3), np.float32),
            np.asarray(img_ids, np.float32)], axis=0)
    else:
        ids = np.concatenate([np.asarray(txt_ids, np.float32),
                              np.asarray(img_ids, np.float32)], axis=0)
    cos, sin = flux_rope(cfg, ids)
    cos = cos.astype(jnp.float32)
    sin = sin.astype(jnp.float32)

    def dual(carry, bp):
        hs, enc = carry
        hs, enc = _dual_block(bp, hs, enc, temb, cos, sin, heads)
        return (hs, enc), None

    def single(x, bp):
        return _single_block(bp, x, temb, cos, sin, heads), None

    hs, enc = scan_blocks_with_remat(dual, (hs, enc), params["dual_blocks"], remat)
    x = jnp.concatenate([enc, hs], axis=1)
    x = scan_blocks_with_remat(single, x, params["single_blocks"], remat)
    hs = x[:, enc.shape[1]:]

    # AdaLayerNormContinuous: chunk order is (scale, shift)
    m = linear(params["norm_out"]["linear"], silu(temb.astype(jnp.float32)).astype(temb.dtype))
    scale, shift = [c.astype(jnp.float32)[:, None] for c in jnp.split(m, 2, axis=-1)]
    hs = (layer_norm({}, hs, _EPS).astype(jnp.float32) * (1 + scale) + shift).astype(dtype)
    return linear(params["proj_out"], hs)


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------

def convert_flux_state_dict(sd: Dict[str, np.ndarray], cfg: FluxConfig,
                            dtype=jnp.float32) -> Params:
    """diffusers FluxTransformer2DModel state dict -> vap_tpu pytree."""
    def lin(name):
        p = {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T, dtype)}
        if f"{name}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{name}.bias"], dtype)
        return p

    def rms(name):
        return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype)}

    def attn(pre, added: bool, pre_only: bool):
        p = {
            "to_q": lin(f"{pre}.to_q"), "to_k": lin(f"{pre}.to_k"), "to_v": lin(f"{pre}.to_v"),
            "norm_q": rms(f"{pre}.norm_q"), "norm_k": rms(f"{pre}.norm_k"),
        }
        if not pre_only:
            p["to_out"] = lin(f"{pre}.to_out.0")
        if added:
            p.update({
                "add_q_proj": lin(f"{pre}.add_q_proj"),
                "add_k_proj": lin(f"{pre}.add_k_proj"),
                "add_v_proj": lin(f"{pre}.add_v_proj"),
                "norm_added_q": rms(f"{pre}.norm_added_q"),
                "norm_added_k": rms(f"{pre}.norm_added_k"),
                "to_add_out": lin(f"{pre}.to_add_out"),
            })
        return p

    def ff(pre):
        return {"net_0": lin(f"{pre}.net.0.proj"), "net_2": lin(f"{pre}.net.2")}

    dual = [{
        "norm1": {"linear": lin(f"transformer_blocks.{i}.norm1.linear")},
        "norm1_context": {"linear": lin(f"transformer_blocks.{i}.norm1_context.linear")},
        "attn": attn(f"transformer_blocks.{i}.attn", added=True, pre_only=False),
        "ff": ff(f"transformer_blocks.{i}.ff"),
        "ff_context": ff(f"transformer_blocks.{i}.ff_context"),
    } for i in range(cfg.num_layers)]
    single = [{
        "norm": {"linear": lin(f"single_transformer_blocks.{i}.norm.linear")},
        "proj_mlp": lin(f"single_transformer_blocks.{i}.proj_mlp"),
        "proj_out": lin(f"single_transformer_blocks.{i}.proj_out"),
        "attn": attn(f"single_transformer_blocks.{i}.attn", added=False, pre_only=True),
    } for i in range(cfg.num_single_layers)]
    stack = lambda blocks: jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    tte = {
        "timestep_embedder": {
            "linear_1": lin("time_text_embed.timestep_embedder.linear_1"),
            "linear_2": lin("time_text_embed.timestep_embedder.linear_2"),
        },
        "text_embedder": {
            "linear_1": lin("time_text_embed.text_embedder.linear_1"),
            "linear_2": lin("time_text_embed.text_embedder.linear_2"),
        },
    }
    if cfg.guidance_embeds:
        tte["guidance_embedder"] = {
            "linear_1": lin("time_text_embed.guidance_embedder.linear_1"),
            "linear_2": lin("time_text_embed.guidance_embedder.linear_2"),
        }
    return {
        "x_embedder": lin("x_embedder"),
        "context_embedder": lin("context_embedder"),
        "time_text_embed": tte,
        "dual_blocks": stack(dual),
        "single_blocks": stack(single),
        "norm_out": {"linear": lin("norm_out.linear")},
        "proj_out": lin("proj_out"),
    }
