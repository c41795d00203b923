"""CogVideoX MoT Diffusion Transformer — TPU-native JAX implementation.

Semantics match the reference `CogVideoXTransformer3DMOTModel`
(diffusers/src/diffusers/models/transformers/cogvideox_transformer_3d_mot.py):
a frozen CogVideoX DiT branch plus a parallel MoT expert branch whose tokens
(clean reference-video latents) join the target tokens inside one full
attention per block, with temporally biased RoPE on the reference tokens.

TPU-first design decisions (vs the reference's module-per-block torch code):
  * block parameters are stacked along a leading layer axis and executed with
    `jax.lax.scan` (one compiled block body regardless of depth), segmented by
    MoT status so heterogeneous configs pay no masking cost;
  * the joint attention concatenates per-branch Q/K/V once and runs the Pallas
    flash kernel over the combined [text‖video‖ref_text‖ref_video] stream;
  * per-reference timestep modulation is vectorized over a reference axis
    instead of python loops over `temb_list_mot_ref`;
  * all modulation math follows torch fp32 layer-norm numerics.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.attention import scaled_dot_product_attention
from ...ops.rope import apply_rotary_emb
from ..common import (
    scan_blocks_with_remat,
    init_feed_forward,
    init_layer_norm,
    init_linear,
    init_timestep_embedding_mlp,
    feed_forward,
    layer_norm,
    linear,
    silu,
    sinusoidal_timestep_embedding,
    timestep_embedding_mlp,
)
from .config import CogVideoXMOTConfig

Array = jnp.ndarray
Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_attention(key, dim: int, heads: int, head_dim: int, bias: bool, dtype) -> Params:
    ks = jax.random.split(key, 4)
    inner = heads * head_dim
    return {
        "to_q": init_linear(ks[0], dim, inner, bias=bias, dtype=dtype),
        "to_k": init_linear(ks[1], dim, inner, bias=bias, dtype=dtype),
        "to_v": init_linear(ks[2], dim, inner, bias=bias, dtype=dtype),
        "to_out": init_linear(ks[3], inner, dim, bias=True, dtype=dtype),
        "norm_q": init_layer_norm(head_dim, dtype=dtype),
        "norm_k": init_layer_norm(head_dim, dtype=dtype),
    }


def _init_norm_zero(key, cond_dim: int, dim: int, dtype) -> Params:
    return {
        "linear": init_linear(key, cond_dim, 6 * dim, bias=True, dtype=dtype),
        "norm": init_layer_norm(dim, dtype=dtype),
    }


def _init_block(key, cfg: CogVideoXMOTConfig, with_mot: bool, dtype) -> Params:
    ks = jax.random.split(key, 8)
    dim = cfg.inner_dim
    p = {
        "norm1": _init_norm_zero(ks[0], cfg.time_embed_dim, dim, dtype),
        "attn1": _init_attention(ks[1], dim, cfg.num_attention_heads, cfg.attention_head_dim, cfg.attention_bias, dtype),
        "norm2": _init_norm_zero(ks[2], cfg.time_embed_dim, dim, dtype),
        "ff": init_feed_forward(ks[3], dim, dtype=dtype),
    }
    if with_mot:
        p.update({
            "norm1_mot_ref": _init_norm_zero(ks[4], cfg.time_embed_dim, dim, dtype),
            "attn1_mot_ref": _init_attention(ks[5], dim, cfg.num_attention_heads, cfg.attention_head_dim, cfg.attention_bias, dtype),
            "norm2_mot_ref": _init_norm_zero(ks[6], cfg.time_embed_dim, dim, dtype),
            "ff_mot_ref": init_feed_forward(ks[7], dim, dtype=dtype),
        })
    return p


def _sincos_pos_embedding(cfg: CogVideoXMOTConfig, height: int, width: int,
                          num_latent_frames: int):
    """Joint [text-zeros ‖ 3D-sincos] pos embedding at the given LATENT dims,
    numpy [L, D] (CogVideoXPatchEmbed._get_positional_embeddings)."""
    import numpy as np

    from ..common import get_3d_sincos_pos_embed

    ps = cfg.patch_size
    video = get_3d_sincos_pos_embed(
        cfg.inner_dim, (width // ps, height // ps), num_latent_frames,
        cfg.spatial_interpolation_scale, cfg.temporal_interpolation_scale)
    out = np.zeros((cfg.max_text_seq_length + video.shape[0], cfg.inner_dim), np.float32)
    out[cfg.max_text_seq_length:] = video
    return out


def _default_pos_embedding(cfg: CogVideoXMOTConfig):
    frames = (cfg.sample_frames - 1) // cfg.temporal_compression_ratio + 1
    return _sincos_pos_embedding(cfg, cfg.sample_height, cfg.sample_width, frames)


def init_cogvideox_mot(key, cfg: CogVideoXMOTConfig, dtype=jnp.float32) -> Params:
    """Randomly initialized parameter pytree (for tests / from-scratch)."""
    keys = jax.random.split(key, cfg.num_layers + 12)
    dim = cfg.inner_dim
    patch_in = (
        cfg.in_channels * cfg.patch_size * cfg.patch_size
        if cfg.patch_size_t is None
        else cfg.in_channels * cfg.patch_size * cfg.patch_size * cfg.patch_size_t
    )
    out_dim = (
        cfg.patch_size * cfg.patch_size * cfg.out_channels
        if cfg.patch_size_t is None
        else cfg.patch_size * cfg.patch_size * cfg.patch_size_t * cfg.out_channels
    )

    def _patch_embed_params(k1, k2):
        p = {
            "proj": init_linear(k1, patch_in, dim, dtype=dtype),
            "text_proj": init_linear(k2, cfg.text_embed_dim, dim, dtype=dtype),
        }
        if cfg.use_learned_positional_embeddings:
            p["pos_embedding"] = jnp.asarray(_default_pos_embedding(cfg), dtype)
        return p

    params: Params = {
        "patch_embed": _patch_embed_params(keys[0], keys[1]),
        "patch_embed_mot_ref": _patch_embed_params(keys[2], keys[3]),
        "time_embedding": init_timestep_embedding_mlp(keys[4], dim, cfg.time_embed_dim, dtype=dtype),
        "time_embedding_mot_ref": init_timestep_embedding_mlp(keys[5], dim, cfg.time_embed_dim, dtype=dtype),
        "norm_final": init_layer_norm(dim, dtype=dtype),
        "norm_out": {
            "linear": init_linear(keys[6], cfg.time_embed_dim, 2 * dim, dtype=dtype),
            "norm": init_layer_norm(dim, dtype=dtype),
        },
        "proj_out": init_linear(keys[7], dim, out_dim, dtype=dtype),
    }
    if cfg.ofs_embed_dim:
        params["ofs_embedding"] = init_timestep_embedding_mlp(keys[8], cfg.ofs_embed_dim, cfg.ofs_embed_dim, dtype=dtype)
    if cfg.reference_train_mode == "reference_independent":
        params["norm_final_mot_ref"] = init_layer_norm(dim, dtype=dtype)
        params["norm_out_mot_ref"] = {
            "linear": init_linear(keys[9], cfg.time_embed_dim, 2 * dim, dtype=dtype),
            "norm": init_layer_norm(dim, dtype=dtype),
        }
        params["proj_out_mot_ref"] = init_linear(keys[10], dim, out_dim, dtype=dtype)
    if cfg.supported_effect_types:
        params["effect_embeddings"] = 0.02 * jax.random.normal(
            keys[11], (len(cfg.supported_effect_types), dim), dtype
        )
    if cfg.num_ref_embeddings:
        params["ref_embeddings"] = 0.02 * jax.random.normal(
            jax.random.fold_in(keys[11], 1), (cfg.num_ref_embeddings, dim), dtype
        )

    # stacked per-segment blocks
    segments = []
    for start, length, has_mot in cfg.mot_segments:
        seg = [
            _init_block(keys[12 + start + i], cfg, has_mot, dtype) for i in range(length)
        ]
        segments.append(jax.tree.map(lambda *xs: jnp.stack(xs), *seg))
    params["blocks"] = tuple(segments)
    return params


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------

def _norm_zero_mods(p: Params, temb: Array) -> Tuple[Array, ...]:
    """CogVideoXLayerNormZero modulation: 6 chunks of linear(silu(temb))."""
    mods = linear(p["linear"], silu(temb))
    return jnp.split(mods, 6, axis=-1)


def _patchify(p: Params, cfg: CogVideoXMOTConfig, text: Array, video: Array) -> Array:
    """CogVideoXPatchEmbed: project text + patchify video, concat along seq.

    video: [B, F, C, H, W]; returns [B, T_text + F/pt * H/p * W/p, D].
    """
    b, f, c, h, w = video.shape
    pt = cfg.patch_size_t
    ps = cfg.patch_size
    if pt is None:
        # conv2d(k=p, s=p) == linear over (C, ph, pw)-ordered patch pixels
        x = video.reshape(b, f, c, h // ps, ps, w // ps, ps)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6)  # [B,F,h,w,C,ps,ps]
        x = x.reshape(b, f * (h // ps) * (w // ps), c * ps * ps)
    else:
        x = video.transpose(0, 1, 3, 4, 2)  # [B,F,H,W,C]
        x = x.reshape(b, f // pt, pt, h // ps, ps, w // ps, ps, c)
        x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)  # [B,F/pt,h,w,C,pt,ps,ps]
        x = x.reshape(b, (f // pt) * (h // ps) * (w // ps), c * pt * ps * ps)
    video_tokens = linear(p["proj"], x)
    text_tokens = linear(p["text_proj"], text)
    tokens = jnp.concatenate([text_tokens, video_tokens], axis=1)
    if cfg.use_learned_positional_embeddings and "pos_embedding" in p:
        # trained joint buffer on top of RoPE (CogVideoXPatchEmbed.forward,
        # embeddings.py:734-755). At the default resolution the checkpoint
        # buffer applies; at a different frame count the reference swaps in a
        # fresh sincos table (H/W changes are rejected there outright).
        pos = p["pos_embedding"]
        if pos.shape[0] != tokens.shape[1]:
            if (h, w) != (cfg.sample_height, cfg.sample_width):
                raise ValueError(
                    "learned positional embeddings fix the spatial resolution "
                    f"to {cfg.sample_height}x{cfg.sample_width} latents, got {h}x{w} "
                    "(CogVideoXPatchEmbed.forward:735-739)")
            pt = cfg.patch_size_t or 1
            pos = jnp.asarray(_sincos_pos_embedding(cfg, h, w, f // pt), pos.dtype)
        tokens = tokens + pos[None].astype(tokens.dtype)
    return tokens


def _unpatchify(cfg: CogVideoXMOTConfig, x: Array, num_frames: int, height: int, width: int) -> Array:
    """Inverse of the output projection token layout → [B, F, C_out, H, W]."""
    b = x.shape[0]
    ps = cfg.patch_size
    pt = cfg.patch_size_t
    if pt is None:
        out = x.reshape(b, num_frames, height // ps, width // ps, -1, ps, ps)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6)  # [B,F,C,h,ps,w,ps]
        out = out.reshape(b, num_frames, -1, height, width)
    else:
        out = x.reshape(b, (num_frames + pt - 1) // pt, height // ps, width // ps, -1, pt, ps, ps)
        out = out.transpose(0, 1, 5, 4, 2, 6, 3, 7)  # [B,F/pt,pt,C,h,ps,w,ps]
        out = out.reshape(b, num_frames, -1, height, width)
    return out


def _attn_qkv(p: Params, x: Array, heads: int, rope: Optional[Tuple[Array, Array]], text_len: int):
    """QKV projection + per-head qk layer-norm + RoPE on the video segment.

    x: [B, S, D] (text ‖ video). Returns q, k, v as [B, H, S, Dh].
    """
    b, s, _ = x.shape
    # separate q/k/v GEMMs: a fused [D,3D] weight-concat variant was measured
    # SLOWER (7.25 vs 7.12 s/step) — the per-scan-step weight concat costs
    # more than the saved activation reads
    q = linear(p["to_q"], x).reshape(b, s, heads, -1)
    k = linear(p["to_k"], x).reshape(b, s, heads, -1)
    v = linear(p["to_v"], x).reshape(b, s, heads, -1)
    q = layer_norm(p["norm_q"], q, eps=1e-6)
    k = layer_norm(p["norm_k"], k, eps=1e-6)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    if rope is not None:
        # identity rotation (cos=1, sin=0) over the text prefix: one fused
        # elementwise pass over the whole tensor instead of a slice-rotate
        # plus .at[].set scatter copy (saves ~2 full HBM round-trips per
        # projection at the 35k-token joint shape)
        cos, sin = rope
        cos_full = jnp.concatenate([jnp.ones((text_len,) + cos.shape[1:], cos.dtype), cos])
        sin_full = jnp.concatenate([jnp.zeros((text_len,) + sin.shape[1:], sin.dtype), sin])
        q = apply_rotary_emb(q, cos_full, sin_full)
        k = apply_rotary_emb(k, cos_full, sin_full)
    return q, k, v


def _attn_out(p: Params, x: Array) -> Array:
    """x: [B, H, S, Dh] -> out proj [B, S, D]."""
    b, h, s, d = x.shape
    x = x.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    return linear(p["to_out"], x)


def _per_ref(x: Array, num_ref: int) -> Array:
    """[B, R*S, D] -> [B, R, S, D]."""
    b, rs, d = x.shape
    return x.reshape(b, num_ref, rs // num_ref, d)


def _merge_ref(x: Array) -> Array:
    b, r, s, d = x.shape
    return x.reshape(b, r * s, d)


def _block_forward(
    bp: Params,
    cfg: CogVideoXMOTConfig,
    has_mot: bool,
    hs: Array,
    ehs: Array,
    temb: Array,
    rope: Optional[Tuple[Array, Array]],
    hs_ref: Optional[Array],
    ehs_ref: Optional[Array],
    temb_ref: Optional[Array],  # [B, R, time_embed_dim]
    rope_ref: Optional[Tuple[Array, Array]],
    num_mot_ref: int,
):
    """One transformer block (joint MoT path when has_mot).

    Mirrors CogVideoXBlock.forward (cogvideox_transformer_3d_mot.py:375-513).
    """
    text_len = ehs.shape[1]
    heads = cfg.num_attention_heads

    shift, scale, gate, e_shift, e_scale, e_gate = _norm_zero_mods(bp["norm1"], temb)
    nhs = layer_norm(bp["norm1"]["norm"], hs, cfg.norm_eps) * (1 + scale[:, None]) + shift[:, None]
    nehs = layer_norm(bp["norm1"]["norm"], ehs, cfg.norm_eps) * (1 + e_scale[:, None]) + e_shift[:, None]

    if not has_mot:
        q, k, v = _attn_qkv(bp["attn1"], jnp.concatenate([nehs, nhs], axis=1), heads, rope, text_len)
        attn = scaled_dot_product_attention(q, k, v)
        attn = _attn_out(bp["attn1"], attn)
        hs = hs + gate[:, None] * attn[:, text_len:]
        ehs = ehs + e_gate[:, None] * attn[:, :text_len]

        shift2, scale2, gate2, e_shift2, e_scale2, e_gate2 = _norm_zero_mods(bp["norm2"], temb)
        nhs = layer_norm(bp["norm2"]["norm"], hs, cfg.norm_eps) * (1 + scale2[:, None]) + shift2[:, None]
        nehs = layer_norm(bp["norm2"]["norm"], ehs, cfg.norm_eps) * (1 + e_scale2[:, None]) + e_shift2[:, None]
        ff_out = feed_forward(bp["ff"], jnp.concatenate([nehs, nhs], axis=1))
        hs = hs + gate2[:, None] * ff_out[:, text_len:]
        ehs = ehs + e_gate2[:, None] * ff_out[:, :text_len]
        return hs, ehs, hs_ref, ehs_ref

    if cfg.ablation_single_encoder or cfg.ablation_residual_addition:
        return _block_forward_ablation(
            bp, cfg, hs, ehs, temb, rope, hs_ref, ehs_ref, temb_ref, rope_ref, num_mot_ref,
            nhs, nehs, gate, e_gate)

    # ---- MoT joint path ----
    r = num_mot_ref
    # per-ref modulation of the reference branch
    (r_shift, r_scale, r_gate, re_shift, re_scale, re_gate) = _norm_zero_mods(bp["norm1_mot_ref"], temb_ref)  # [B,R,D]
    nhs_ref = layer_norm(bp["norm1_mot_ref"]["norm"], _per_ref(hs_ref, r), cfg.norm_eps)
    nhs_ref = _merge_ref(nhs_ref * (1 + r_scale[:, :, None]) + r_shift[:, :, None])
    nehs_ref = layer_norm(bp["norm1_mot_ref"]["norm"], _per_ref(ehs_ref, r), cfg.norm_eps)
    nehs_ref = _merge_ref(nehs_ref * (1 + re_scale[:, :, None]) + re_shift[:, :, None])

    ref_text_len = ehs_ref.shape[1]
    q, k, v = _attn_qkv(bp["attn1"], jnp.concatenate([nehs, nhs], axis=1), heads, rope, text_len)
    q_r, k_r, v_r = _attn_qkv(
        bp["attn1_mot_ref"], jnp.concatenate([nehs_ref, nhs_ref], axis=1), heads, rope_ref, ref_text_len
    )
    attn = scaled_dot_product_attention(
        jnp.concatenate([q, q_r], axis=2),
        jnp.concatenate([k, k_r], axis=2),
        jnp.concatenate([v, v_r], axis=2),
        site="joint",
    )
    tgt_len = text_len + hs.shape[1]
    attn_t = _attn_out(bp["attn1"], attn[:, :, :tgt_len])
    attn_r = _attn_out(bp["attn1_mot_ref"], attn[:, :, tgt_len:])

    hs = hs + gate[:, None] * attn_t[:, text_len:]
    ehs = ehs + e_gate[:, None] * attn_t[:, :text_len]

    shift2, scale2, gate2, e_shift2, e_scale2, e_gate2 = _norm_zero_mods(bp["norm2"], temb)
    nhs = layer_norm(bp["norm2"]["norm"], hs, cfg.norm_eps) * (1 + scale2[:, None]) + shift2[:, None]
    nehs = layer_norm(bp["norm2"]["norm"], ehs, cfg.norm_eps) * (1 + e_scale2[:, None]) + e_shift2[:, None]
    ff_out = feed_forward(bp["ff"], jnp.concatenate([nehs, nhs], axis=1))
    hs = hs + gate2[:, None] * ff_out[:, text_len:]
    ehs = ehs + e_gate2[:, None] * ff_out[:, :text_len]

    # reference branch residuals + FF (per-ref gates)
    hs_ref = _merge_ref(_per_ref(hs_ref, r) + r_gate[:, :, None] * _per_ref(attn_r[:, ref_text_len:], r))
    ehs_ref = _merge_ref(_per_ref(ehs_ref, r) + re_gate[:, :, None] * _per_ref(attn_r[:, :ref_text_len], r))

    (r_shift2, r_scale2, r_gate2, re_shift2, re_scale2, re_gate2) = _norm_zero_mods(bp["norm2_mot_ref"], temb_ref)
    nhs_ref = layer_norm(bp["norm2_mot_ref"]["norm"], _per_ref(hs_ref, r), cfg.norm_eps)
    nhs_ref = _merge_ref(nhs_ref * (1 + r_scale2[:, :, None]) + r_shift2[:, :, None])
    nehs_ref = layer_norm(bp["norm2_mot_ref"]["norm"], _per_ref(ehs_ref, r), cfg.norm_eps)
    nehs_ref = _merge_ref(nehs_ref * (1 + re_scale2[:, :, None]) + re_shift2[:, :, None])
    ff_ref = feed_forward(bp["ff_mot_ref"], jnp.concatenate([nehs_ref, nhs_ref], axis=1))
    hs_ref = _merge_ref(_per_ref(hs_ref, r) + r_gate2[:, :, None] * _per_ref(ff_ref[:, ref_text_len:], r))
    ehs_ref = _merge_ref(_per_ref(ehs_ref, r) + re_gate2[:, :, None] * _per_ref(ff_ref[:, :ref_text_len], r))

    return hs, ehs, hs_ref, ehs_ref


def _block_forward_ablation(
    bp, cfg, hs, ehs, temb, rope, hs_ref, ehs_ref, temb_ref, rope_ref, num_mot_ref,
    nhs, nehs, gate, e_gate,
):
    """Ablation block modes (cogvideox_transformer_3d_mot.py:205-373).

    Both modes run the reference stream through its own full sub-block
    (`*_mot_ref` weights, standard non-joint attention) first; then either
    - single_encoder: concat updated ref tokens into the target attention
      sequence (with concatenated RoPE) and slice back, or
    - residual_addition: run the target block independently and add the ref
      stream as a residual.
    Per-ref temb modulation uses temb_ref[:, 0] (these ablations ship with one
    reference, mirroring the reference's temb_mot_ref non-list path)."""
    heads = cfg.num_attention_heads
    text_len = ehs.shape[1]
    ref_text_len = ehs_ref.shape[1]
    t_ref = temb_ref[:, 0]

    # --- reference encoder sub-block (standard attention over its own stream)
    r_shift, r_scale, r_gate, re_shift, re_scale, re_gate = _norm_zero_mods(bp["norm1_mot_ref"], t_ref)
    nref = layer_norm(bp["norm1_mot_ref"]["norm"], hs_ref, cfg.norm_eps) * (1 + r_scale[:, None]) + r_shift[:, None]
    neref = layer_norm(bp["norm1_mot_ref"]["norm"], ehs_ref, cfg.norm_eps) * (1 + re_scale[:, None]) + re_shift[:, None]
    # NOTE (reference quirk): the ref encoder applies the TARGET RoPE table
    # (:223 passes image_rotary_emb, not the biased ref table)
    q_r, k_r, v_r = _attn_qkv(bp["attn1_mot_ref"], jnp.concatenate([neref, nref], axis=1), heads, rope, ref_text_len)
    attn_r = _attn_out(bp["attn1_mot_ref"], scaled_dot_product_attention(q_r, k_r, v_r))
    hs_ref = hs_ref + r_gate[:, None] * attn_r[:, ref_text_len:]
    ehs_ref = ehs_ref + re_gate[:, None] * attn_r[:, :ref_text_len]

    r_shift2, r_scale2, r_gate2, re_shift2, re_scale2, re_gate2 = _norm_zero_mods(bp["norm2_mot_ref"], t_ref)
    nref = layer_norm(bp["norm2_mot_ref"]["norm"], hs_ref, cfg.norm_eps) * (1 + r_scale2[:, None]) + r_shift2[:, None]
    neref = layer_norm(bp["norm2_mot_ref"]["norm"], ehs_ref, cfg.norm_eps) * (1 + re_scale2[:, None]) + re_shift2[:, None]
    ff_r = feed_forward(bp["ff_mot_ref"], jnp.concatenate([neref, nref], axis=1))
    hs_ref = hs_ref + r_gate2[:, None] * ff_r[:, ref_text_len:]
    ehs_ref = ehs_ref + re_gate2[:, None] * ff_r[:, :ref_text_len]

    if cfg.ablation_single_encoder:
        # concat updated ref stream into the target sequence for attention
        hs_cat = jnp.concatenate([hs, hs_ref], axis=1)
        ehs_cat = jnp.concatenate([ehs, ehs_ref], axis=1)
        rope_cat = (jnp.concatenate([rope[0], rope_ref[0]], axis=0),
                    jnp.concatenate([rope[1], rope_ref[1]], axis=0))
        cat_text_len = ehs_cat.shape[1]
        shift, scale, gate_c, e_shift, e_scale, e_gate_c = _norm_zero_mods(bp["norm1"], temb)
        nh = layer_norm(bp["norm1"]["norm"], hs_cat, cfg.norm_eps) * (1 + scale[:, None]) + shift[:, None]
        ne = layer_norm(bp["norm1"]["norm"], ehs_cat, cfg.norm_eps) * (1 + e_scale[:, None]) + e_shift[:, None]
        q, k, v = _attn_qkv(bp["attn1"], jnp.concatenate([ne, nh], axis=1), heads, rope_cat, cat_text_len)
        attn = _attn_out(bp["attn1"], scaled_dot_product_attention(q, k, v))
        vid_len = hs.shape[1]
        hs = hs + gate_c[:, None] * attn[:, cat_text_len:cat_text_len + vid_len]
        ehs = ehs + e_gate_c[:, None] * attn[:, :text_len]
    else:  # residual_addition: independent target attention
        q, k, v = _attn_qkv(bp["attn1"], jnp.concatenate([nehs, nhs], axis=1), heads, rope, text_len)
        attn = _attn_out(bp["attn1"], scaled_dot_product_attention(q, k, v))
        hs = hs + gate[:, None] * attn[:, text_len:]
        ehs = ehs + e_gate[:, None] * attn[:, :text_len]

    shift2, scale2, gate2, e_shift2, e_scale2, e_gate2 = _norm_zero_mods(bp["norm2"], temb)
    nh = layer_norm(bp["norm2"]["norm"], hs, cfg.norm_eps) * (1 + scale2[:, None]) + shift2[:, None]
    ne = layer_norm(bp["norm2"]["norm"], ehs, cfg.norm_eps) * (1 + e_scale2[:, None]) + e_shift2[:, None]
    ff = feed_forward(bp["ff"], jnp.concatenate([ne, nh], axis=1))
    hs = hs + gate2[:, None] * ff[:, text_len:]
    ehs = ehs + e_gate2[:, None] * ff[:, :text_len]

    if cfg.ablation_residual_addition:
        hs = hs + hs_ref
        ehs = ehs + ehs_ref
    return hs, ehs, hs_ref, ehs_ref


# ---------------------------------------------------------------------------
# full model forward — decomposed into prologue / segments / epilogue so the
# streamed-offload runner (pipelines/streamed.py, the reference
# enable_sequential_cpu_offload analog: CogVideoX 40 GB -> ~7.5 GB) can jit
# each piece separately and stage block chunks into HBM one at a time.
# cogvideox_mot_forward below is a thin composition of these.
# ---------------------------------------------------------------------------

def cog_prologue(params: Params, cfg: CogVideoXMOTConfig, *, hidden_states,
                 encoder_hidden_states, timestep, image_rotary_emb,
                 hidden_states_mot_ref=None, encoder_hidden_states_mot_ref=None,
                 image_rotary_emb_mot_ref=None, num_mot_ref: int = 1,
                 timestep_mot_ref=None, effect_ids=None, ofs=None,
                 mot: bool = True):
    """Time embeddings + patchify. `params` needs only the non-block entries.
    carry = (hs, ehs) single-branch or (hs, ehs, hs_ref, ehs_ref) MoT."""
    b = hidden_states.shape[0]
    t_text = encoder_hidden_states.shape[1]
    num_frames = hidden_states.shape[1]
    dtype = hidden_states.dtype
    inner = cfg.inner_dim
    r = num_mot_ref

    t_emb = sinusoidal_timestep_embedding(
        timestep, inner, flip_sin_to_cos=cfg.flip_sin_to_cos, downscale_freq_shift=cfg.freq_shift
    ).astype(dtype)
    emb = timestep_embedding_mlp(params["time_embedding"], t_emb)  # [B, time_embed_dim]

    if not mot:
        tokens = _patchify(params["patch_embed"], cfg, encoder_hidden_states, hidden_states)
        ehs, hs = tokens[:, :t_text], tokens[:, t_text:]
        return (hs, ehs), {"emb": emb, "rope": image_rotary_emb}

    if timestep_mot_ref is None:
        timestep_mot_ref = jnp.broadcast_to(timestep[:, None], (b, r))
    t_emb_ref = sinusoidal_timestep_embedding(
        timestep_mot_ref.reshape(-1), inner, flip_sin_to_cos=cfg.flip_sin_to_cos, downscale_freq_shift=cfg.freq_shift
    ).astype(dtype)
    emb_ref = timestep_embedding_mlp(params["time_embedding_mot_ref"], t_emb_ref).reshape(b, r, -1)

    if cfg.ofs_embed_dim is not None and ofs is not None:
        ofs_emb = sinusoidal_timestep_embedding(
            ofs, cfg.ofs_embed_dim, flip_sin_to_cos=cfg.flip_sin_to_cos, downscale_freq_shift=cfg.freq_shift
        ).astype(dtype)
        ofs_emb = timestep_embedding_mlp(params["ofs_embedding"], ofs_emb)
        emb = emb + ofs_emb
        emb_ref = emb_ref + ofs_emb[:, None]

    tokens = _patchify(params["patch_embed"], cfg, encoder_hidden_states, hidden_states)
    ehs, hs = tokens[:, :t_text], tokens[:, t_text:]

    # per-ref patch embed of the reference branch (vectorized over R)
    vid_ref = hidden_states_mot_ref.reshape(b * r, num_frames, *hidden_states_mot_ref.shape[2:])
    txt_ref = encoder_hidden_states_mot_ref.reshape(b * r, t_text, -1)
    tokens_ref = _patchify(params["patch_embed_mot_ref"], cfg, txt_ref, vid_ref)  # [B*R, T+S, D]
    tokens_ref = tokens_ref.reshape(b, r, tokens_ref.shape[1], inner)

    if cfg.num_ref_embeddings:
        # ref slot embeddings indexed back-to-front (transformer :982)
        idx = jnp.arange(r - 1, -1, -1)
        tokens_ref = tokens_ref + params["ref_embeddings"].astype(dtype)[idx][None, :, None, :]
    if cfg.supported_effect_types and effect_ids is not None:
        tokens_ref = tokens_ref + params["effect_embeddings"].astype(dtype)[effect_ids][None, :, None, :]

    ehs_ref = tokens_ref[:, :, :t_text].reshape(b, r * t_text, inner)
    hs_ref = tokens_ref[:, :, t_text:].reshape(b, -1, inner)
    aux = {"emb": emb, "rope": image_rotary_emb,
           "emb_ref": emb_ref, "rope_ref": image_rotary_emb_mot_ref}
    return (hs, ehs, hs_ref, ehs_ref), aux


def cog_run_segment(seg_params: Params, cfg: CogVideoXMOTConfig, has_mot: bool,
                    carry, aux, num_mot_ref: int = 1, remat: bool = False):
    """Scan one stacked block segment (or a chunk of one) over the carry."""
    if len(carry) == 2:
        def body(carry, bp):
            hs, ehs = carry
            out = _block_forward(bp, cfg, False, hs, ehs, aux["emb"], aux["rope"],
                                 None, None, None, None, 0)
            return out[:2], None

        return scan_blocks_with_remat(body, carry, seg_params, remat)

    def body(carry, bp):
        hs, ehs, hs_ref, ehs_ref = carry
        out = _block_forward(
            bp, cfg, has_mot, hs, ehs, aux["emb"], aux["rope"],
            hs_ref, ehs_ref, aux["emb_ref"], aux["rope_ref"], num_mot_ref)
        return out, None

    return scan_blocks_with_remat(body, carry, seg_params, remat)


def cog_epilogue(params: Params, cfg: CogVideoXMOTConfig, carry, aux,
                 num_frames: int, height: int, width: int,
                 num_mot_ref: int = 1):
    """Final norms + projection(s) + unpatchify. `params` needs only the
    head entries. Returns (output, output_mot_ref_or_None)."""
    hs = carry[0]
    emb = aux["emb"]
    r = num_mot_ref
    hs = layer_norm(params["norm_final"], hs, cfg.norm_eps)
    shift, scale = jnp.split(linear(params["norm_out"]["linear"], silu(emb)), 2, axis=-1)
    hs = layer_norm(params["norm_out"]["norm"], hs, cfg.norm_eps) * (1 + scale[:, None]) + shift[:, None]
    hs = linear(params["proj_out"], hs)
    output = _unpatchify(cfg, hs, num_frames, height, width)
    if len(carry) == 2:
        return output, None

    output_ref = None
    if cfg.reference_train_mode == "reference_independent":
        hs_ref = carry[2]
        emb_ref = aux["emb_ref"]
        hs_ref = layer_norm(params["norm_final_mot_ref"], hs_ref, cfg.norm_eps)
        mods_ref = linear(params["norm_out_mot_ref"]["linear"], silu(emb_ref))  # [B,R,2D]
        shift_r, scale_r = jnp.split(mods_ref, 2, axis=-1)
        hs_ref = layer_norm(params["norm_out_mot_ref"]["norm"], _per_ref(hs_ref, r), cfg.norm_eps)
        hs_ref = _merge_ref(hs_ref * (1 + scale_r[:, :, None]) + shift_r[:, :, None])
        hs_ref = linear(params["proj_out_mot_ref"], hs_ref)
        output_ref = _unpatchify(cfg, hs_ref, num_frames * r, height, width)
    return output, output_ref


def cogvideox_mot_forward(
    params: Params,
    cfg: CogVideoXMOTConfig,
    *,
    hidden_states: Array,                 # [B, F, C, H, W] (noisy ‖ image cond, 32ch)
    encoder_hidden_states: Array,         # [B, T_text, D_text]
    timestep: Array,                      # [B]
    image_rotary_emb: Optional[Tuple[Array, Array]],
    hidden_states_mot_ref: Array,         # [B, R*F, C, H, W]
    encoder_hidden_states_mot_ref: Array, # [B, R*T_text, D_text]
    image_rotary_emb_mot_ref: Optional[Tuple[Array, Array]],
    num_mot_ref: int = 1,
    timestep_mot_ref: Optional[Array] = None,  # [B, R]; defaults to target timestep
    effect_ids: Optional[Array] = None,        # [R] int ids into supported_effect_types
    ofs: Optional[Array] = None,
    remat: bool = False,
    single_branch: bool = False,
):
    """Returns (output, output_mot_ref_or_None); output: [B, F, C_out, H, W].

    single_branch=True runs the plain base trunk over `hidden_states` alone
    (callers concatenate target+ref along frames and pass concatenated RoPE;
    reference ablation_single_branch, pipeline :959-1022 + spec :757-769).
    MoT weights and reference streams are unused in that mode."""
    _, num_frames, _, height, width = hidden_states.shape

    carry, aux = cog_prologue(
        params, cfg, hidden_states=hidden_states,
        encoder_hidden_states=encoder_hidden_states, timestep=timestep,
        image_rotary_emb=image_rotary_emb,
        hidden_states_mot_ref=hidden_states_mot_ref,
        encoder_hidden_states_mot_ref=encoder_hidden_states_mot_ref,
        image_rotary_emb_mot_ref=image_rotary_emb_mot_ref,
        num_mot_ref=num_mot_ref, timestep_mot_ref=timestep_mot_ref,
        effect_ids=effect_ids, ofs=ofs, mot=not single_branch)
    for (start, length, has_mot), sp in zip(cfg.mot_segments, params["blocks"]):
        carry = cog_run_segment(sp, cfg, has_mot, carry, aux,
                                num_mot_ref=num_mot_ref, remat=remat)
    return cog_epilogue(params, cfg, carry, aux, num_frames, height, width,
                        num_mot_ref=num_mot_ref)
