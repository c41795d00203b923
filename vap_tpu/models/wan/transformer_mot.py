"""Wan2.1 MoT Diffusion Transformer — TPU-native JAX implementation.

Semantics match the reference `WanTransformer3DMOTModel`
(diffusers/src/diffusers/models/transformers/transformer_wan_mot.py):
  * joint self-attention: per-branch QKV (rms-norm across heads, complex RoPE,
    negative temporal positions for the reference branch) concatenated into one
    fused attention (transformer_wan_mot.py:625-656);
  * separate cross-attention per branch to its own [CLIP-image ‖ UMT5-text]
    context; MoT refs attend only to their own context (:165-190);
  * scale-shift-table AdaLN with fp32 layer norms (:573-585);
  * 36-channel conditioning input for I2V-VAP.

Deviation from the reference (documented): in reference_independent mode the
reference applies `proj_out_mot_ref` to the *target* stream (:985, an obvious
bug); we project the reference stream.

Blocks run as segmented lax.scan over stacked parameters, like the CogVideoX
module.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import scaled_dot_product_attention
from ..common import (
    scan_blocks_with_remat,
    init_layer_norm,
    init_linear,
    feed_forward,
    init_feed_forward,
    layer_norm,
    linear,
    rms_norm,
    silu,
    sinusoidal_timestep_embedding,
    gelu_tanh,
)
from .config import WanMOTConfig

Array = jnp.ndarray
Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# RoPE (complex cis over t/h/w splits; float64 host precompute like the ref)
# ---------------------------------------------------------------------------

def _cis_1d(dim: int, positions: np.ndarray, theta: float = 10000.0) -> np.ndarray:
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim))
    ang = np.outer(positions.astype(np.float64), freqs)  # [S, dim/2]
    return np.stack([np.cos(ang), np.sin(ang)], axis=-1)  # [S, dim/2, 2]


def wan_rope(cfg: WanMOTConfig, ppf: int, pph: int, ppw: int, *, negative_time: bool = False,
             total_ref_frames: Optional[int] = None) -> Tuple[Array, Array]:
    """Returns (cos, sin) of shape [S, head_dim/2] for patchified tokens.

    negative_time=True reproduces WanRotaryPosEmbedRef (:412-464): temporal
    positions arange(-total_ref_frames, ...)[:max_seq_len] -> refs sit at
    negative times relative to the target stream.
    """
    d = cfg.attention_head_dim
    h_dim = w_dim = 2 * (d // 6)
    t_dim = d - h_dim - w_dim
    msl = cfg.rope_max_seq_len

    if negative_time:
        t_pos = np.arange(-(total_ref_frames if total_ref_frames is not None else ppf), msl)[:msl]
    else:
        t_pos = np.arange(msl)
    cis_t = _cis_1d(t_dim, t_pos)[:ppf]
    cis_h = _cis_1d(h_dim, np.arange(msl))[:pph]
    cis_w = _cis_1d(w_dim, np.arange(msl))[:ppw]

    def expand(c, shape, axis):
        # c: [n, dim/2, 2] -> broadcast over the 3D grid
        view = [1, 1, 1, c.shape[1], 2]
        view[axis] = c.shape[0]
        return np.broadcast_to(c.reshape(view), (ppf, pph, ppw, c.shape[1], 2))

    full = np.concatenate(
        [expand(cis_t, None, 0), expand(cis_h, None, 1), expand(cis_w, None, 2)], axis=3
    ).reshape(ppf * pph * ppw, d // 2, 2)
    return jnp.asarray(full[..., 0], jnp.float32), jnp.asarray(full[..., 1], jnp.float32)


def apply_wan_rope(x: Array, cos: Array, sin: Array) -> Array:
    """Complex multiply over interleaved pairs. x: [B, H, S, D]; cos/sin [S, D/2]."""
    xf = x.astype(jnp.float32)
    xr = xf.reshape(*x.shape[:-1], -1, 2)
    xe, xo = xr[..., 0], xr[..., 1]
    oe = xe * cos - xo * sin
    oo = xe * sin + xo * cos
    return jnp.stack([oe, oo], axis=-1).reshape(x.shape).astype(x.dtype)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_attn(key, dim: int, inner: int, cross_kv: bool, added_kv: Optional[int], dtype) -> Params:
    ks = jax.random.split(key, 7)
    p = {
        "to_q": init_linear(ks[0], dim, inner, dtype=dtype),
        "to_k": init_linear(ks[1], dim, inner, dtype=dtype),
        "to_v": init_linear(ks[2], dim, inner, dtype=dtype),
        "to_out": init_linear(ks[3], inner, dim, dtype=dtype),
        "norm_q": {"scale": jnp.ones((inner,), dtype)},
        "norm_k": {"scale": jnp.ones((inner,), dtype)},
    }
    if added_kv:
        p["add_k_proj"] = init_linear(ks[4], added_kv, inner, dtype=dtype)
        p["add_v_proj"] = init_linear(ks[5], added_kv, inner, dtype=dtype)
        p["norm_added_k"] = {"scale": jnp.ones((inner,), dtype)}
    return p


def _init_block(key, cfg: WanMOTConfig, with_mot: bool, dtype) -> Params:
    ks = jax.random.split(key, 10)
    dim = cfg.inner_dim
    p = {
        "attn1": _init_attn(ks[0], dim, dim, False, None, dtype),
        "attn2": _init_attn(ks[1], dim, dim, True, cfg.added_kv_proj_dim, dtype),
        "norm2": init_layer_norm(dim, affine=cfg.cross_attn_norm, dtype=dtype),
        "ffn": init_feed_forward(ks[2], dim, cfg.ffn_dim, dtype=dtype),
        "scale_shift_table": jax.random.normal(ks[3], (6, dim), dtype) / dim ** 0.5,
    }
    if with_mot:
        p.update({
            "attn1_mot_ref": _init_attn(ks[4], dim, dim, False, None, dtype),
            "attn2_mot_ref": _init_attn(ks[5], dim, dim, True, cfg.added_kv_proj_dim, dtype),
            "norm2_mot_ref": init_layer_norm(dim, affine=cfg.cross_attn_norm, dtype=dtype),
            "ffn_mot_ref": init_feed_forward(ks[6], dim, cfg.ffn_dim, dtype=dtype),
            "scale_shift_table_mot_ref": jax.random.normal(ks[7], (6, dim), dtype) / dim ** 0.5,
        })
    return p


def _init_condition_embedder(key, cfg: WanMOTConfig, dtype) -> Params:
    ks = jax.random.split(key, 8)
    dim = cfg.inner_dim
    p = {
        "time_embedder": {
            "linear_1": init_linear(ks[0], cfg.freq_dim, dim, dtype=dtype),
            "linear_2": init_linear(ks[1], dim, dim, dtype=dtype),
        },
        "time_proj": init_linear(ks[2], dim, 6 * dim, dtype=dtype),
        "text_embedder": {
            "linear_1": init_linear(ks[3], cfg.text_dim, dim, dtype=dtype),
            "linear_2": init_linear(ks[4], dim, dim, dtype=dtype),
        },
    }
    if cfg.image_dim:
        p["image_embedder"] = {
            "norm1": init_layer_norm(cfg.image_dim, dtype=dtype),
            "ff": {
                "net_0": init_linear(ks[5], cfg.image_dim, cfg.image_dim, dtype=dtype),
                "net_2": init_linear(ks[6], cfg.image_dim, dim, dtype=dtype),
            },
            "norm2": init_layer_norm(dim, dtype=dtype),
        }
        if cfg.pos_embed_seq_len:
            p["image_embedder"]["pos_embed"] = jnp.zeros((1, cfg.pos_embed_seq_len, cfg.image_dim), dtype)
    return p


def init_wan_mot(key, cfg: WanMOTConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, cfg.num_layers + 8)
    dim = cfg.inner_dim
    pt, ph, pw = cfg.patch_size
    patch_in = cfg.in_channels * pt * ph * pw
    out_dim = cfg.out_channels * pt * ph * pw

    params: Params = {
        "patch_embedding": init_linear(keys[0], patch_in, dim, dtype=dtype),
        "patch_embedding_mot_ref": init_linear(keys[1], patch_in, dim, dtype=dtype),
        "condition_embedder": _init_condition_embedder(keys[2], cfg, dtype),
        "condition_embedder_mot_ref": _init_condition_embedder(keys[3], cfg, dtype),
        "proj_out": init_linear(keys[4], dim, out_dim, dtype=dtype),
        "scale_shift_table": jax.random.normal(keys[5], (2, dim), dtype) / dim ** 0.5,
    }
    if cfg.reference_train_mode == "reference_independent":
        params["proj_out_mot_ref"] = init_linear(keys[6], dim, out_dim, dtype=dtype)
        params["scale_shift_table_mot_ref"] = jax.random.normal(keys[7], (2, dim), dtype) / dim ** 0.5

    segments = []
    for start, length, has_mot in cfg.mot_segments:
        seg = [_init_block(keys[8 + start + i], cfg, has_mot, dtype) for i in range(length)]
        segments.append(jax.tree.map(lambda *xs: jnp.stack(xs), *seg))
    params["blocks"] = tuple(segments)
    return params


def init_wan(key, cfg: WanMOTConfig, dtype=jnp.float32) -> Params:
    """Plain (non-MoT) Wan transformer params — WanTransformer3DModel as used
    by the control trainer (reference control_specification.py:133-151). Same
    tree layout as init_wan_mot minus every *_mot_ref entry."""
    keys = jax.random.split(key, cfg.num_layers + 4)
    dim = cfg.inner_dim
    pt, ph, pw = cfg.patch_size
    patch_in = cfg.in_channels * pt * ph * pw
    out_dim = cfg.out_channels * pt * ph * pw

    params: Params = {
        "patch_embedding": init_linear(keys[0], patch_in, dim, dtype=dtype),
        "condition_embedder": _init_condition_embedder(keys[1], cfg, dtype),
        "proj_out": init_linear(keys[2], dim, out_dim, dtype=dtype),
        "scale_shift_table": jax.random.normal(keys[3], (2, dim), dtype) / dim ** 0.5,
    }
    blocks = [_init_block(keys[4 + i], cfg, False, dtype) for i in range(cfg.num_layers)]
    params["blocks"] = (jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),)
    return params


def expand_patch_embedding(params: Params, cfg: WanMOTConfig, extra_in_channels: int) -> Params:
    """Widen patch_embedding to accept [noisy ‖ control(+mask)] channel concat
    (reference _expand_conv3d_with_zeroed_weights, models/utils.py): existing
    rows keep their weights, new channel rows start at zero. The patchify
    flattening is (C, pt, ph, pw) with C outermost (_patchify_wan), so new
    channels are a row-append."""
    pt, ph, pw = cfg.patch_size
    pe = params["patch_embedding"]
    kernel = pe["kernel"]
    extra = jnp.zeros((extra_in_channels * pt * ph * pw, kernel.shape[1]), kernel.dtype)
    out = dict(params)
    out["patch_embedding"] = dict(pe, kernel=jnp.concatenate([kernel, extra], axis=0))
    return out


def wan_forward(
    params: Params,
    cfg: WanMOTConfig,
    *,
    hidden_states: Array,                  # [B, F, H, W, C_in] channel-last
    timestep: Array,                       # [B]
    encoder_hidden_states: Array,          # [B, text_len, text_dim]
    encoder_hidden_states_image: Optional[Array] = None,
    remat: bool = False,
) -> Array:
    """Plain WanTransformer3DModel.forward (no MoT branch): the control
    trainer's diffusion backbone. Returns [B, F, H, W, C_out]."""
    _, f, h, w, _ = hidden_states.shape
    pt, ph, pw = cfg.patch_size
    ppf, pph, ppw = f // pt, h // ph, w // pw
    dtype = hidden_states.dtype

    carry, aux = wan_prologue(
        params, cfg, hidden_states=hidden_states, timestep=timestep,
        encoder_hidden_states=encoder_hidden_states,
        encoder_hidden_states_image=encoder_hidden_states_image)
    # plain-converted params carry one segment holding every block; MoT
    # params (plain sampling of a partial-MoT checkpoint) carry one stacked
    # segment per contiguous has_mot run — run them ALL, trunk-only
    for seg in params["blocks"]:
        carry = wan_run_segment(seg, cfg, False, carry, aux, remat=remat)
    return wan_epilogue(params, cfg, carry, aux, ppf, pph, ppw, dtype=dtype)


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------

def _patchify_wan(p: Params, cfg: WanMOTConfig, video: Array) -> Array:
    """Conv3d(k=stride=patch) == linear over (C, pt, ph, pw)-ordered voxels.
    video: [B, F, H, W, C] -> tokens [B, F/pt * H/ph * W/pw, D]."""
    b, f, h, w, c = video.shape
    pt, ph, pw = cfg.patch_size
    x = video.reshape(b, f // pt, pt, h // ph, ph, w // pw, pw, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)  # [B, F', h, w, C, pt, ph, pw]
    x = x.reshape(b, (f // pt) * (h // ph) * (w // pw), c * pt * ph * pw)
    return linear(p, x)


def _unpatchify_wan(cfg: WanMOTConfig, x: Array, ppf: int, pph: int, ppw: int) -> Array:
    b = x.shape[0]
    pt, ph, pw = cfg.patch_size
    out = x.reshape(b, ppf, pph, ppw, pt, ph, pw, -1)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # [B, F', pt, h, ph, w, pw, C]
    return out.reshape(b, ppf * pt, pph * ph, ppw * pw, -1)


def _qkv(p: Params, x: Array, heads: int, rope, eps: float):
    """Wan self-attention QKV with rms_norm_across_heads, returns [B,H,S,D]."""
    b, s, _ = x.shape
    q = rms_norm(p["norm_q"], linear(p["to_q"], x), eps)
    k = rms_norm(p["norm_k"], linear(p["to_k"], x), eps)
    v = linear(p["to_v"], x)
    q = q.reshape(b, s, heads, -1).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, heads, -1).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, heads, -1).transpose(0, 2, 1, 3)
    if rope is not None:
        cos, sin = rope
        q = apply_wan_rope(q, cos, sin)
        k = apply_wan_rope(k, cos, sin)
    return q, k, v


def _attn_out(p: Params, x: Array) -> Array:
    b, h, s, d = x.shape
    return linear(p["to_out"], x.transpose(0, 2, 1, 3).reshape(b, s, h * d))


def _cross_attention(p: Params, x: Array, ctx_text: Array, ctx_img: Optional[Array],
                     heads: int, eps: float, num_mot_ref: int = 1) -> Array:
    """Wan cross attention: text K/V (+ CLIP image K/V via add_*_proj, summed).
    With num_mot_ref > 1, each ref's queries attend only to its own context
    slice (WanAttnCrossMOTProcessor2_0, transformer_wan_mot.py:110-191)."""
    b, s, _ = x.shape
    r = num_mot_ref
    q = rms_norm(p["norm_q"], linear(p["to_q"], x), eps)
    q = q.reshape(b, s, heads, -1).transpose(0, 2, 1, 3)

    def kv(ctx, kp, vp, knorm):
        k = linear(kp, ctx)
        if knorm is not None:
            k = rms_norm(knorm, k, eps)
        v = linear(vp, ctx)
        tk = ctx.shape[1]
        k = k.reshape(b, tk, heads, -1).transpose(0, 2, 1, 3)
        v = v.reshape(b, tk, heads, -1).transpose(0, 2, 1, 3)
        return k, v

    def per_ref(t4):  # [B, H, R*L, D] -> [B*R, H, L, D]
        bb, hh, rl, dd = t4.shape
        return (t4.reshape(bb, hh, r, rl // r, dd).transpose(0, 2, 1, 3, 4)
                .reshape(bb * r, hh, rl // r, dd))

    def merge_ref(t4):  # [B*R, H, L, D] -> [B, H, R*L, D]
        br, hh, l, dd = t4.shape
        return (t4.reshape(br // r, r, hh, l, dd).transpose(0, 2, 1, 3, 4)
                .reshape(br // r, hh, r * l, dd))

    k_t, v_t = kv(ctx_text, p["to_k"], p["to_v"], p["norm_k"])
    if r > 1:
        out = merge_ref(scaled_dot_product_attention(per_ref(q), per_ref(k_t), per_ref(v_t), site="cross"))
    else:
        out = scaled_dot_product_attention(q, k_t, v_t, site="cross")

    if ctx_img is not None and "add_k_proj" in p:
        k_i, v_i = kv(ctx_img, p["add_k_proj"], p["add_v_proj"], p["norm_added_k"])
        if r > 1:
            out_img = merge_ref(scaled_dot_product_attention(per_ref(q), per_ref(k_i), per_ref(v_i), site="cross"))
        else:
            out_img = scaled_dot_product_attention(q, k_i, v_i, site="cross")
        out = out + out_img

    return linear(p["to_out"], out.transpose(0, 2, 1, 3).reshape(b, s, -1))


def _block_forward(
    bp: Params, cfg: WanMOTConfig, has_mot: bool,
    hs: Array, ctx_text: Array, ctx_img: Optional[Array], tproj: Array, rope,
    hs_ref, ctx_text_ref, ctx_img_ref, tproj_ref, rope_ref, num_mot_ref: int,
):
    """WanTransformerBlock.forward (transformer_wan_mot.py:567-699).
    tproj: [B, 6, D] fp32; tproj_ref: [B, R, 6, D] fp32."""
    heads = cfg.num_attention_heads
    eps = cfg.eps
    r = num_mot_ref

    mods = (bp["scale_shift_table"].astype(jnp.float32)[None] + tproj)  # [B,6,D]
    shift, scale, gate, c_shift, c_scale, c_gate = [mods[:, i][:, None] for i in range(6)]

    def fp32_ln(x, affine_p=None):
        return layer_norm(affine_p or {}, x.astype(jnp.float32), eps)

    # 1. self-attention (joint when MoT)
    nhs = (fp32_ln(hs) * (1 + scale) + shift).astype(hs.dtype)
    if not has_mot:
        q, k, v = _qkv(bp["attn1"], nhs, heads, rope, eps)
        attn = _attn_out(bp["attn1"], scaled_dot_product_attention(q, k, v))
        hs = (hs.astype(jnp.float32) + attn.astype(jnp.float32) * gate).astype(hs.dtype)

        nhs = layer_norm(bp["norm2"] if cfg.cross_attn_norm else {}, hs.astype(jnp.float32), eps).astype(hs.dtype)
        attn = _cross_attention(bp["attn2"], nhs, ctx_text, ctx_img, heads, eps)
        hs = hs + attn

        nhs = (fp32_ln(hs) * (1 + c_scale) + c_shift).astype(hs.dtype)
        ff = feed_forward(bp["ffn"], nhs)
        hs = (hs.astype(jnp.float32) + ff.astype(jnp.float32) * c_gate).astype(hs.dtype)
        return hs, hs_ref

    mods_ref = (bp["scale_shift_table_mot_ref"].astype(jnp.float32)[None, None] + tproj_ref)  # [B,R,6,D]
    (r_shift, r_scale, r_gate, rc_shift, rc_scale, rc_gate) = [mods_ref[:, :, i][:, :, None] for i in range(6)]

    b = hs.shape[0]
    s_ref = hs_ref.shape[1]

    def per_ref2(x):  # [B, R*S, D] -> [B, R, S, D]
        return x.reshape(b, r, s_ref // r, -1)

    def merge2(x):
        return x.reshape(b, s_ref, -1)

    nref = per_ref2(fp32_ln(hs_ref))
    nref = merge2((nref * (1 + r_scale) + r_shift)).astype(hs_ref.dtype)

    q, k, v = _qkv(bp["attn1"], nhs, heads, rope, eps)
    q_r, k_r, v_r = _qkv(bp["attn1_mot_ref"], nref, heads, rope_ref, eps)
    joint = scaled_dot_product_attention(
        jnp.concatenate([q, q_r], axis=2),
        jnp.concatenate([k, k_r], axis=2),
        jnp.concatenate([v, v_r], axis=2),
        site="joint",
    )
    s_t = hs.shape[1]
    attn = _attn_out(bp["attn1"], joint[:, :, :s_t])
    attn_ref = _attn_out(bp["attn1_mot_ref"], joint[:, :, s_t:])

    hs = (hs.astype(jnp.float32) + attn.astype(jnp.float32) * gate).astype(hs.dtype)
    hs_ref = (hs_ref.astype(jnp.float32)
              + merge2(per_ref2(attn_ref.astype(jnp.float32)) * r_gate)).astype(hs_ref.dtype)

    # 2. cross-attention (per-branch, per-ref contexts)
    nhs = layer_norm(bp["norm2"] if cfg.cross_attn_norm else {}, hs.astype(jnp.float32), eps).astype(hs.dtype)
    nref = layer_norm(bp["norm2_mot_ref"] if cfg.cross_attn_norm else {}, hs_ref.astype(jnp.float32), eps).astype(hs_ref.dtype)
    hs = hs + _cross_attention(bp["attn2"], nhs, ctx_text, ctx_img, heads, eps)
    hs_ref = hs_ref + _cross_attention(
        bp["attn2_mot_ref"], nref, ctx_text_ref, ctx_img_ref, heads, eps, num_mot_ref=r)

    # 3. feed-forward
    nhs = (fp32_ln(hs) * (1 + c_scale) + c_shift).astype(hs.dtype)
    ff = feed_forward(bp["ffn"], nhs)
    hs = (hs.astype(jnp.float32) + ff.astype(jnp.float32) * c_gate).astype(hs.dtype)

    nref = merge2(per_ref2(fp32_ln(hs_ref)) * (1 + rc_scale) + rc_shift).astype(hs_ref.dtype)
    ff_ref = feed_forward(bp["ffn_mot_ref"], nref)
    hs_ref = (hs_ref.astype(jnp.float32)
              + merge2(per_ref2(ff_ref.astype(jnp.float32)) * rc_gate)).astype(hs_ref.dtype)
    return hs, hs_ref


def _condition_embedder(p: Params, cfg: WanMOTConfig, timestep: Array, text: Array,
                        image: Optional[Array], dtype):
    """WanTimeTextImageEmbedding (transformer_wan_mot.py:275-312). timestep: [N]."""
    t_sin = sinusoidal_timestep_embedding(timestep, cfg.freq_dim, flip_sin_to_cos=True, downscale_freq_shift=0.0)
    te = p["time_embedder"]
    temb = linear(te["linear_2"], silu(linear(te["linear_1"], t_sin.astype(dtype))))
    tproj = linear(p["time_proj"], silu(temb))

    txt = p["text_embedder"]
    text_emb = linear(txt["linear_2"], gelu_tanh(linear(txt["linear_1"], text)))

    img_emb = None
    if image is not None and "image_embedder" in p:
        ie = p["image_embedder"]
        x = image
        if "pos_embed" in ie:
            b_, s_, d_ = x.shape
            x = x.reshape(-1, 2 * s_, d_) + ie["pos_embed"].astype(x.dtype)
        x = layer_norm(ie["norm1"], x.astype(jnp.float32), 1e-5).astype(x.dtype)
        x = linear(ie["ff"]["net_2"], jax.nn.gelu(linear(ie["ff"]["net_0"], x), approximate=False))
        img_emb = layer_norm(ie["norm2"], x.astype(jnp.float32), 1e-5).astype(x.dtype)
    return temb, tproj, text_emb, img_emb


# ---------------------------------------------------------------------------
# full model forward — decomposed into prologue / segments / epilogue so the
# streamed-offload runner (pipelines/streamed.py, the reference
# enable_sequential_cpu_offload analog) can jit each piece separately and
# stage block chunks into HBM one at a time. The monolithic forwards below
# are thin compositions of these, so both paths share one implementation.
# ---------------------------------------------------------------------------

def wan_prologue(params: Params, cfg: WanMOTConfig, *, hidden_states, timestep,
                 encoder_hidden_states, encoder_hidden_states_image=None,
                 hidden_states_mot_ref=None, timestep_mot_ref=None,
                 encoder_hidden_states_mot_ref=None,
                 encoder_hidden_states_image_mot_ref=None, num_mot_ref: int = 1,
                 mot: bool = False):
    """Embeddings + patchify + RoPE. `params` needs only the non-block
    entries. Returns (carry, aux): carry = (hs,) or (hs, hs_ref); aux = the
    per-forward tensors every block consumes plus the epilogue's temb(s)."""
    b, f, h, w, _ = hidden_states.shape
    pt, ph, pw = cfg.patch_size
    ppf, pph, ppw = f // pt, h // ph, w // pw
    dtype = hidden_states.dtype

    rope = wan_rope(cfg, ppf, pph, ppw)
    hs = _patchify_wan(params["patch_embedding"], cfg, hidden_states)
    temb, tproj, ctx_text, ctx_img = _condition_embedder(
        params["condition_embedder"], cfg, timestep, encoder_hidden_states,
        encoder_hidden_states_image, dtype)
    tproj = tproj.reshape(b, 6, -1).astype(jnp.float32)
    aux = {"ctx_text": ctx_text, "ctx_img": ctx_img, "tproj": tproj,
           "rope": rope, "temb": temb}

    if not mot:
        return (hs,), aux

    r = num_mot_ref
    f_ref = hidden_states_mot_ref.shape[1]
    rope_ref = wan_rope(cfg, (f_ref // pt), pph, ppw, negative_time=True,
                        total_ref_frames=f_ref)
    # per-ref patchify keeps each ref's token block contiguous
    vid_ref = hidden_states_mot_ref.reshape(b * r, f_ref // r, h, w, -1)
    hs_ref = _patchify_wan(params["patch_embedding_mot_ref"], cfg, vid_ref)
    hs_ref = hs_ref.reshape(b, -1, cfg.inner_dim)

    # per-ref condition embedding (WanTimeTextImageEmbeddingRef, :314-366)
    temb_ref, tproj_ref, ctx_text_ref, ctx_img_ref = _condition_embedder(
        params["condition_embedder_mot_ref"], cfg, timestep_mot_ref.reshape(-1),
        encoder_hidden_states_mot_ref, encoder_hidden_states_image_mot_ref, dtype)
    aux.update({
        "ctx_text_ref": ctx_text_ref, "ctx_img_ref": ctx_img_ref,
        "tproj_ref": tproj_ref.reshape(b, r, 6, -1).astype(jnp.float32),
        "rope_ref": rope_ref, "temb_ref": temb_ref,
    })
    return (hs, hs_ref), aux


def wan_run_segment(seg_params: Params, cfg: WanMOTConfig, has_mot: bool,
                    carry, aux, num_mot_ref: int = 1, remat: bool = False):
    """Scan one stacked block segment (or a chunk of one) over the carry."""
    mot = len(carry) == 2

    if not mot:
        def body(hs, bp):
            out, _ = _block_forward(
                bp, cfg, has_mot, hs, aux["ctx_text"], aux["ctx_img"],
                aux["tproj"], aux["rope"], None, None, None, None, None, 1)
            return out, None

        return (scan_blocks_with_remat(body, carry[0], seg_params, remat),)

    def body(carry, bp):
        hs, hs_ref = carry
        out = _block_forward(
            bp, cfg, has_mot, hs, aux["ctx_text"], aux["ctx_img"],
            aux["tproj"], aux["rope"], hs_ref, aux["ctx_text_ref"],
            aux["ctx_img_ref"], aux["tproj_ref"], aux["rope_ref"], num_mot_ref)
        return out, None

    return scan_blocks_with_remat(body, carry, seg_params, remat)


def wan_epilogue(params: Params, cfg: WanMOTConfig, carry, aux,
                 ppf: int, pph: int, ppw: int, num_mot_ref: int = 1,
                 dtype=None):
    """Final AdaLN + projection(s) + unpatchify. `params` needs only the
    head entries. Returns output or (output, output_mot_ref)."""
    mot = len(carry) == 2
    hs = carry[0]
    temb = aux["temb"]
    dtype = dtype or hs.dtype
    st = params["scale_shift_table"].astype(jnp.float32)[None] + temb.astype(jnp.float32)[:, None]
    shift, scale = st[:, 0][:, None], st[:, 1][:, None]
    hs = (layer_norm({}, hs.astype(jnp.float32), cfg.eps) * (1 + scale) + shift).astype(dtype)
    hs = linear(params["proj_out"], hs)
    output = _unpatchify_wan(cfg, hs, ppf, pph, ppw)
    if not mot:
        return output

    output_ref = None
    if cfg.reference_train_mode == "reference_independent":
        hs_ref = carry[1]
        b, r = hs.shape[0], num_mot_ref
        temb_ref = aux["temb_ref"]
        st_r = (params["scale_shift_table_mot_ref"].astype(jnp.float32)[None]
                + temb_ref.astype(jnp.float32)[:, None]).reshape(b, r, 2, -1)
        shift_r, scale_r = st_r[:, :, 0][:, :, None], st_r[:, :, 1][:, :, None]
        nref = layer_norm({}, hs_ref.astype(jnp.float32), cfg.eps).reshape(b, r, hs_ref.shape[1] // r, -1)
        nref = ((nref * (1 + scale_r) + shift_r).reshape(b, hs_ref.shape[1], -1)).astype(dtype)
        nref = linear(params["proj_out_mot_ref"], nref)
        ppf_ref = hs_ref.shape[1] // (pph * ppw)
        output_ref = _unpatchify_wan(cfg, nref, ppf_ref, pph, ppw)
    return output, output_ref


def wan_mot_forward(
    params: Params,
    cfg: WanMOTConfig,
    *,
    hidden_states: Array,                  # [B, F, H, W, C_in] channel-last
    timestep: Array,                       # [B]
    encoder_hidden_states: Array,          # [B, text_len, text_dim]
    encoder_hidden_states_image: Optional[Array],   # [B, 257, image_dim]
    hidden_states_mot_ref: Array,          # [B, R*F, H, W, C_in]
    timestep_mot_ref: Array,               # [B, R]
    encoder_hidden_states_mot_ref: Array,  # [B, R*text_len, text_dim]
    encoder_hidden_states_image_mot_ref: Optional[Array],  # [B, R*257, image_dim]
    num_mot_ref: int = 1,
    remat: bool = False,
):
    """Returns (output [B, F, H, W, C_out], output_mot_ref or None)."""
    _, f, h, w, _ = hidden_states.shape
    pt, ph, pw = cfg.patch_size
    ppf, pph, ppw = f // pt, h // ph, w // pw
    dtype = hidden_states.dtype

    carry, aux = wan_prologue(
        params, cfg, hidden_states=hidden_states, timestep=timestep,
        encoder_hidden_states=encoder_hidden_states,
        encoder_hidden_states_image=encoder_hidden_states_image,
        hidden_states_mot_ref=hidden_states_mot_ref,
        timestep_mot_ref=timestep_mot_ref,
        encoder_hidden_states_mot_ref=encoder_hidden_states_mot_ref,
        encoder_hidden_states_image_mot_ref=encoder_hidden_states_image_mot_ref,
        num_mot_ref=num_mot_ref, mot=True)
    for (start, length, has_mot), sp in zip(cfg.mot_segments, params["blocks"]):
        carry = wan_run_segment(sp, cfg, has_mot, carry, aux,
                                num_mot_ref=num_mot_ref, remat=remat)
    return wan_epilogue(params, cfg, carry, aux, ppf, pph, ppw,
                        num_mot_ref=num_mot_ref, dtype=dtype)
