"""HunyuanVideo transformer — functional JAX implementation.

Behavioral reference: diffusers HunyuanVideoTransformer3DModel
(diffusers/src/diffusers/models/transformers/transformer_hunyuan_video.py):
3D-patched latents + a LLaMA-embedding token refiner for text (2 self-attn
blocks conditioned on timestep + mean-pooled text); dual-stream blocks with
joint [img ‖ txt] attention (image tokens LEAD the stream, RoPE on image
tokens only, applied per-head), then single-stream blocks over the fused
stream; guidance-distilled conditioning; AdaLN-continuous output + unpatchify.
Unlike Flux, the timestep/guidance are passed already in the [0, 1000] range.

TPU-native: dual and single blocks each run as one lax.scan over stacked
weights; text padding is handled with an additive key bias.
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
from .config import HunyuanVideoConfig

Array = jnp.ndarray
Params = Dict[str, Any]

_EPS = 1e-6


# ---------------------------------------------------------------------------
# RoPE (HunyuanVideoRotaryPosEmbed :459-489): theta=256, per-axis 1D tables
# over the (f, h, w) grid, concatenated along the head dim.
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _hunyuan_rope_np(axes_dim: Tuple[int, ...], theta: float,
                     f: int, h: int, w: int):
    gf, gh, gw = np.meshgrid(np.arange(f, dtype=np.float32),
                             np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
    cos_all, sin_all = [], []
    for dim_i, grid in zip(axes_dim, (gf, gh, gw)):
        cos, sin = get_1d_rotary_pos_embed(dim_i, grid.reshape(-1), theta=theta)
        cos_all.append(cos)
        sin_all.append(sin)
    return (np.concatenate(cos_all, axis=1).astype(np.float32),
            np.concatenate(sin_all, axis=1).astype(np.float32))


def hunyuan_rope(cfg: HunyuanVideoConfig, num_frames: int, height: int, width: int):
    """(cos, sin) each [S_img, head_dim] over the post-patch grid."""
    cos, sin = _hunyuan_rope_np(
        tuple(cfg.rope_axes_dim), cfg.rope_theta,
        num_frames // cfg.patch_size_t, height // cfg.patch_size,
        width // cfg.patch_size)
    return jnp.asarray(cos), jnp.asarray(sin)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_qkv(key, dim: int, head_dim: int, dtype, added: bool, pre_only: bool) -> Params:
    ks = jax.random.split(key, 8)
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


def _init_ff(key, dim: int, mult: float, dtype) -> Params:
    k0, k2 = jax.random.split(key)
    inner = int(dim * mult)
    return {"net_0": init_linear(k0, dim, inner, dtype=dtype),
            "net_2": init_linear(k2, inner, dim, dtype=dtype)}


def init_hunyuan_video(key, cfg: HunyuanVideoConfig, dtype=jnp.float32) -> Params:
    dim = cfg.inner_dim
    hd = cfg.attention_head_dim
    keys = jax.random.split(key, 12)

    def dual(k):
        ks = jax.random.split(k, 5)
        return {
            "norm1": {"linear": init_linear(ks[0], dim, 6 * dim, dtype=dtype)},
            "norm1_context": {"linear": init_linear(ks[1], dim, 6 * dim, dtype=dtype)},
            "attn": _init_qkv(ks[2], dim, hd, dtype, added=True, pre_only=False),
            "ff": _init_ff(ks[3], dim, cfg.mlp_ratio, dtype),
            "ff_context": _init_ff(ks[4], dim, cfg.mlp_ratio, dtype),
        }

    def single(k):
        ks = jax.random.split(k, 4)
        mlp = int(dim * cfg.mlp_ratio)
        return {
            "norm": {"linear": init_linear(ks[0], dim, 3 * dim, dtype=dtype)},
            "proj_mlp": init_linear(ks[1], dim, mlp, dtype=dtype),
            "proj_out": init_linear(ks[2], dim + mlp, dim, dtype=dtype),
            "attn": _init_qkv(ks[3], dim, hd, dtype, added=False, pre_only=True),
        }

    def refiner(k):
        ks = jax.random.split(k, 4)
        return {
            "norm1": init_layer_norm(dim, dtype=dtype),
            "attn": {
                "to_q": init_linear(ks[0], dim, dim, dtype=dtype),
                "to_k": init_linear(jax.random.fold_in(ks[0], 1), dim, dim, dtype=dtype),
                "to_v": init_linear(jax.random.fold_in(ks[0], 2), dim, dim, dtype=dtype),
                "to_out": init_linear(jax.random.fold_in(ks[0], 3), dim, dim, dtype=dtype),
            },
            "norm2": init_layer_norm(dim, dtype=dtype),
            "ff": _init_ff(ks[1], dim, cfg.mlp_ratio, dtype),  # linear-silu
            "norm_out": {"linear": init_linear(ks[2], dim, 2 * dim, dtype=dtype)},
        }

    stack = lambda bs: jax.tree.map(lambda *xs: jnp.stack(xs), *bs)
    pt, p = cfg.patch_size_t, cfg.patch_size
    patch_in = cfg.in_channels * pt * p * p
    params = {
        "x_embedder": init_linear(keys[0], patch_in, dim, dtype=dtype),
        "context_embedder": {
            "time_text_embed": {
                "timestep_embedder": init_timestep_embedding_mlp(keys[1], 256, dim, dtype=dtype),
                "text_embedder": {
                    "linear_1": init_linear(jax.random.fold_in(keys[2], 0),
                                            cfg.text_embed_dim, dim, dtype=dtype),
                    "linear_2": init_linear(jax.random.fold_in(keys[2], 1), dim, dim, dtype=dtype),
                },
            },
            "proj_in": init_linear(keys[3], cfg.text_embed_dim, dim, dtype=dtype),
            "refiner_blocks": stack([refiner(jax.random.fold_in(keys[4], i))
                                     for i in range(cfg.num_refiner_layers)]),
        },
        "time_text_embed": {
            "timestep_embedder": init_timestep_embedding_mlp(keys[5], 256, dim, dtype=dtype),
            "text_embedder": {
                "linear_1": init_linear(jax.random.fold_in(keys[6], 0),
                                        cfg.pooled_projection_dim, dim, dtype=dtype),
                "linear_2": init_linear(jax.random.fold_in(keys[6], 1), dim, dim, dtype=dtype),
            },
        },
        "dual_blocks": stack([dual(jax.random.fold_in(keys[7], i))
                              for i in range(cfg.num_layers)]),
        "single_blocks": stack([single(jax.random.fold_in(keys[8], i))
                                for i in range(cfg.num_single_layers)]),
        "norm_out": {"linear": init_linear(keys[9], dim, 2 * dim, dtype=dtype)},
        "proj_out": init_linear(keys[10], dim, pt * p * p * cfg.out_channels, dtype=dtype),
    }
    if cfg.guidance_embeds:
        params["time_text_embed"]["guidance_embedder"] = init_timestep_embedding_mlp(
            keys[11], 256, dim, dtype=dtype)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _heads(x: Array, heads: int) -> Array:
    b, s, d = x.shape
    return x.reshape(b, s, heads, d // heads).transpose(0, 2, 1, 3)


def _sinu(t: Array, dtype) -> Array:
    return sinusoidal_timestep_embedding(
        t.astype(jnp.float32), 256, flip_sin_to_cos=True,
        downscale_freq_shift=0.0).astype(dtype)


def _masked_attention(q, k, v, bias: Optional[Array]):
    """q/k/v: [B, H, S, D]; bias: additive, broadcastable to [B, H, Sq, Sk]."""
    d = q.shape[-1]
    scores = (q.astype(jnp.float32) @ k.astype(jnp.float32).transpose(0, 1, 3, 2)) * (d ** -0.5)
    if bias is not None:
        scores = scores + bias
    return (jax.nn.softmax(scores, axis=-1) @ v.astype(jnp.float32)).astype(v.dtype)


def _token_refiner(params: Params, cfg: HunyuanVideoConfig, text: Array,
                   timestep: Array, mask: Optional[Array], dtype) -> Array:
    """HunyuanVideoTokenRefiner (:410-457): project LLaMA embeds to inner dim
    and refine with timestep+pooled-text-conditioned self-attention."""
    dim = cfg.inner_dim
    heads = cfg.num_attention_heads
    if mask is None:
        pooled = jnp.mean(text, axis=1)
    else:
        mf = mask.astype(jnp.float32)[..., None]
        pooled = jnp.sum(text.astype(jnp.float32) * mf, axis=1) / jnp.sum(mf, axis=1)
        pooled = pooled.astype(text.dtype)
    tte = params["time_text_embed"]
    temb = (timestep_embedding_mlp(tte["timestep_embedder"], _sinu(timestep, dtype))
            + timestep_embedding_mlp(tte["text_embedder"], pooled.astype(dtype)))
    x = linear(params["proj_in"], text.astype(dtype))

    bias = None
    if mask is not None:
        # refiner mask (:388-406): pairwise AND of the token mask with column 0
        # force-enabled (keeps fully-padded query rows finite)
        mb = mask > 0
        pair = (mb[:, :, None] & mb[:, None, :])
        pair = pair.at[:, :, 0].set(True)
        bias = jnp.where(pair, 0.0, -jnp.inf).astype(jnp.float32)[:, None]

    def block(x, bp):
        n = layer_norm(bp["norm1"], x, _EPS)
        a = bp["attn"]
        q = _heads(linear(a["to_q"], n), heads)
        k = _heads(linear(a["to_k"], n), heads)
        v = _heads(linear(a["to_v"], n), heads)
        attn = _masked_attention(q, k, v, bias)
        attn = linear(a["to_out"], attn.transpose(0, 2, 1, 3).reshape(x.shape))
        gates = linear(bp["norm_out"]["linear"], silu(temb.astype(jnp.float32)).astype(dtype))
        g_msa, g_mlp = jnp.split(gates, 2, axis=-1)
        x = x + attn * g_msa[:, None]
        # "linear-silu" feed-forward: Linear -> SiLU -> Linear
        h = silu(linear(bp["ff"]["net_0"], layer_norm(bp["norm2"], x, _EPS)))
        return x + linear(bp["ff"]["net_2"], h) * g_mlp[:, None], None

    x, _ = jax.lax.scan(block, x, params["refiner_blocks"])
    return x


def hunyuan_video_forward(
    params: Params,
    cfg: HunyuanVideoConfig,
    *,
    hidden_states: Array,          # [B, C, F, H, W] latents
    encoder_hidden_states: Array,  # [B, S_txt, text_embed_dim] LLaMA embeds
    pooled_projections: Array,     # [B, pooled_projection_dim] CLIP-L pooled
    timestep: Array,               # [B] in [0, 1000]
    guidance: Optional[Array] = None,  # [B] already x1000 (pipeline convention)
    encoder_attention_mask: Optional[Array] = None,  # [B, S_txt] — MUST be a
    # contiguous right-padded prefix (1s then 0s): it is reduced to per-sample
    # KV lengths for the fused varlen attention, so a left-padded or
    # interior-zero mask would silently attend to the wrong keys. Standard
    # right-padding tokenizer masks satisfy this; the pipeline validates it
    # eagerly at the tokenizer boundary. (The reference's FLASH_VARLEN makes
    # the same assumption when deriving cu_seqlens from the mask —
    # attention_dispatch.py:533-551.)
    remat: bool = True,
) -> Array:
    b, c, f, h, w = hidden_states.shape
    pt, p = cfg.patch_size_t, cfg.patch_size
    dim = cfg.inner_dim
    heads = cfg.num_attention_heads
    dtype = encoder_hidden_states.dtype

    # 3D patchify == Conv3d stride=kernel == linear over patch voxels
    x = hidden_states.reshape(b, c, f // pt, pt, h // p, p, w // p, p)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(
        b, (f // pt) * (h // p) * (w // p), c * pt * p * p)
    hs = linear(params["x_embedder"], x.astype(dtype))
    s_img = hs.shape[1]

    tte = params["time_text_embed"]
    pooled_emb = timestep_embedding_mlp(tte["text_embedder"], pooled_projections.astype(dtype))
    temb = timestep_embedding_mlp(tte["timestep_embedder"], _sinu(timestep, dtype)) + pooled_emb
    tr_temb = None
    if cfg.image_condition_type == "token_replace":
        # first-frame tokens are conditioned at t=0 (HunyuanVideoConditionEmbedding
        # :290-307); guidance is NOT added to the token-replace embedding
        tr_temb = (timestep_embedding_mlp(
            tte["timestep_embedder"], _sinu(jnp.zeros_like(timestep), dtype)) + pooled_emb)
    if cfg.guidance_embeds:
        g = guidance if guidance is not None else jnp.full((b,), 1000.0, jnp.float32)
        temb = temb + timestep_embedding_mlp(tte["guidance_embedder"], _sinu(g, dtype))

    enc = _token_refiner(params["context_embedder"], cfg, encoder_hidden_states,
                         timestep, encoder_attention_mask, dtype)
    s_txt = enc.shape[1]

    cos, sin = hunyuan_rope(cfg, f, h, w)
    cos = cos.astype(jnp.float32)
    sin = sin.astype(jnp.float32)

    # Joint-stream key masking: [img tokens (all valid) ‖ txt valid prefix ‖
    # txt padding] — right-padded tokenizer masks make the valid region a
    # prefix, so the mask reduces to a per-sample KV length and the joint
    # attention can run through the fused varlen kernels (the reference's
    # FLASH_VARLEN makes the same right-padding assumption when deriving
    # cu_seqlens, attention_dispatch.py:533-551). The "xla" provider's
    # dense_attention_masked reproduces the previous inline biased-dense
    # math bit-for-bit.
    kv_lens = None
    if encoder_attention_mask is not None:
        kv_lens = s_img + jnp.sum(
            encoder_attention_mask.astype(jnp.int32), axis=-1)

    def _joint_attention(q, k, v):
        return scaled_dot_product_attention(q, k, v, site="joint", kv_lens=kv_lens)

    # token-replace selectors: first-frame image tokens take the t=0 mods
    # (HunyuanVideoTokenReplace*Block :647-822). sel shape [1, S, 1].
    n_first = (h // p) * (w // p)
    if tr_temb is not None:
        sel_img = (jnp.arange(s_img) < n_first).astype(jnp.float32)[None, :, None]
        sel_full = (jnp.arange(s_img + s_txt) < n_first).astype(jnp.float32)[None, :, None]

    def _mod6(pm, emb, n=6):
        m = linear(pm["linear"], silu(emb.astype(jnp.float32)).astype(dtype))
        return [v.astype(jnp.float32)[:, None] for v in jnp.split(m, n, axis=-1)]

    def _mods_tr(pm, sel, n=6):
        """Per-token blend of standard and token-replace modulations."""
        std = _mod6(pm, temb, n)
        if tr_temb is None:
            return std
        tr = _mod6(pm, tr_temb, n)
        return [sel * t + (1.0 - sel) * s for s, t in zip(std, tr)]

    def dual(carry, bp):
        hs, enc = carry
        sh, sc, g, sh_mlp, sc_mlp, g_mlp = _mods_tr(bp["norm1"], sel_img if tr_temb is not None else None)
        c_sh, c_sc, c_g, c_sh_mlp, c_sc_mlp, c_g_mlp = _mod6(bp["norm1_context"], temb)
        nhs = (layer_norm({}, hs, _EPS).astype(jnp.float32) * (1 + sc) + sh).astype(dtype)
        nenc = (layer_norm({}, enc, _EPS).astype(jnp.float32) * (1 + c_sc) + c_sh).astype(dtype)

        a = bp["attn"]
        q = rms_norm(a["norm_q"], _heads(linear(a["to_q"], nhs), heads), _EPS)
        k = rms_norm(a["norm_k"], _heads(linear(a["to_k"], nhs), heads), _EPS)
        v = _heads(linear(a["to_v"], nhs), heads)
        q = apply_rotary_emb(q, cos, sin)
        k = apply_rotary_emb(k, cos, sin)
        qc = rms_norm(a["norm_added_q"], _heads(linear(a["add_q_proj"], nenc), heads), _EPS)
        kc = rms_norm(a["norm_added_k"], _heads(linear(a["add_k_proj"], nenc), heads), _EPS)
        vc = _heads(linear(a["add_v_proj"], nenc), heads)
        # image tokens lead the joint stream
        q = jnp.concatenate([q, qc], axis=2)
        k = jnp.concatenate([k, kc], axis=2)
        v = jnp.concatenate([v, vc], axis=2)
        out = _joint_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s_img + s_txt, dim)
        img_attn, txt_attn = out[:, :s_img], out[:, s_img:]

        hs = hs + (linear(a["to_out"], img_attn).astype(jnp.float32) * g).astype(dtype)
        enc = enc + (linear(a["to_add_out"], txt_attn).astype(jnp.float32) * c_g).astype(dtype)
        n2 = (layer_norm({}, hs, _EPS).astype(jnp.float32) * (1 + sc_mlp) + sh_mlp).astype(dtype)
        hs = hs + (linear(bp["ff"]["net_2"],
                          jax.nn.gelu(linear(bp["ff"]["net_0"], n2), approximate=True)
                          ).astype(jnp.float32) * g_mlp).astype(dtype)
        n2c = (layer_norm({}, enc, _EPS).astype(jnp.float32) * (1 + c_sc_mlp) + c_sh_mlp).astype(dtype)
        enc = enc + (linear(bp["ff_context"]["net_2"],
                            jax.nn.gelu(linear(bp["ff_context"]["net_0"], n2c), approximate=True)
                            ).astype(jnp.float32) * c_g_mlp).astype(dtype)
        return (hs, enc), None

    def single(x, bp):
        shift, scale, gate = _mods_tr(bp["norm"], sel_full if tr_temb is not None else None, 3)
        n = (layer_norm({}, x, _EPS).astype(jnp.float32) * (1 + scale) + shift).astype(dtype)
        mlp = jax.nn.gelu(linear(bp["proj_mlp"], n), approximate=True)
        a = bp["attn"]
        q = rms_norm(a["norm_q"], _heads(linear(a["to_q"], n), heads), _EPS)
        k = rms_norm(a["norm_k"], _heads(linear(a["to_k"], n), heads), _EPS)
        v = _heads(linear(a["to_v"], n), heads)
        q = jnp.concatenate([apply_rotary_emb(q[:, :, :s_img], cos, sin), q[:, :, s_img:]], axis=2)
        k = jnp.concatenate([apply_rotary_emb(k[:, :, :s_img], cos, sin), k[:, :, s_img:]], axis=2)
        attn = _joint_attention(q, k, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s_img + s_txt, dim)
        out = linear(bp["proj_out"], jnp.concatenate([attn, mlp], axis=-1))
        return x + (out.astype(jnp.float32) * gate).astype(dtype), None

    hs, enc = scan_blocks_with_remat(dual, (hs, enc), params["dual_blocks"], remat)
    x = jnp.concatenate([hs, enc], axis=1)
    x = scan_blocks_with_remat(single, x, params["single_blocks"], remat)
    hs = x[:, :s_img]

    m = linear(params["norm_out"]["linear"], silu(temb.astype(jnp.float32)).astype(dtype))
    scale, shift = [v.astype(jnp.float32)[:, None] for v in jnp.split(m, 2, axis=-1)]
    hs = (layer_norm({}, hs, _EPS).astype(jnp.float32) * (1 + scale) + shift).astype(dtype)
    hs = linear(params["proj_out"], hs)

    out = hs.reshape(b, f // pt, h // p, w // p, cfg.out_channels, pt, p, p)
    out = out.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return out.reshape(b, cfg.out_channels, f, h, w)


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------

def convert_hunyuan_video_state_dict(sd: Dict[str, np.ndarray], cfg: HunyuanVideoConfig,
                                     dtype=jnp.float32) -> Params:
    """diffusers HunyuanVideoTransformer3DModel state dict -> vap_tpu pytree."""
    def lin(name):
        p = {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T, dtype)}
        if f"{name}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{name}.bias"], dtype)
        return p

    def rms(name):
        return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype)}

    def ln(name):
        return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype),
                "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}

    def mlp(pre):
        return {"linear_1": lin(f"{pre}.linear_1"), "linear_2": lin(f"{pre}.linear_2")}

    # conv3d patch embed with stride==kernel == linear over flattened voxels:
    # [D, C, pt, p, p] -> [C*pt*p*p, D]
    wconv = np.asarray(sd["x_embedder.proj.weight"])
    x_embedder = {"kernel": jnp.asarray(wconv.reshape(wconv.shape[0], -1).T, dtype),
                  "bias": jnp.asarray(sd["x_embedder.proj.bias"], dtype)}

    stack = lambda bs: jax.tree.map(lambda *xs: jnp.stack(xs), *bs)
    refiners = [{
        "norm1": ln(f"context_embedder.token_refiner.refiner_blocks.{i}.norm1"),
        "attn": {
            "to_q": lin(f"context_embedder.token_refiner.refiner_blocks.{i}.attn.to_q"),
            "to_k": lin(f"context_embedder.token_refiner.refiner_blocks.{i}.attn.to_k"),
            "to_v": lin(f"context_embedder.token_refiner.refiner_blocks.{i}.attn.to_v"),
            "to_out": lin(f"context_embedder.token_refiner.refiner_blocks.{i}.attn.to_out.0"),
        },
        "norm2": ln(f"context_embedder.token_refiner.refiner_blocks.{i}.norm2"),
        "ff": {"net_0": lin(f"context_embedder.token_refiner.refiner_blocks.{i}.ff.net.0.proj"),
               "net_2": lin(f"context_embedder.token_refiner.refiner_blocks.{i}.ff.net.2")},
        "norm_out": {"linear": lin(f"context_embedder.token_refiner.refiner_blocks.{i}.norm_out.linear")},
    } for i in range(cfg.num_refiner_layers)]

    def attn(pre, added, pre_only):
        p = {"to_q": lin(f"{pre}.to_q"), "to_k": lin(f"{pre}.to_k"), "to_v": lin(f"{pre}.to_v"),
             "norm_q": rms(f"{pre}.norm_q"), "norm_k": rms(f"{pre}.norm_k")}
        if not pre_only:
            p["to_out"] = lin(f"{pre}.to_out.0")
        if added:
            p.update({"add_q_proj": lin(f"{pre}.add_q_proj"),
                      "add_k_proj": lin(f"{pre}.add_k_proj"),
                      "add_v_proj": lin(f"{pre}.add_v_proj"),
                      "norm_added_q": rms(f"{pre}.norm_added_q"),
                      "norm_added_k": rms(f"{pre}.norm_added_k"),
                      "to_add_out": lin(f"{pre}.to_add_out")})
        return p

    dual = [{
        "norm1": {"linear": lin(f"transformer_blocks.{i}.norm1.linear")},
        "norm1_context": {"linear": lin(f"transformer_blocks.{i}.norm1_context.linear")},
        "attn": attn(f"transformer_blocks.{i}.attn", True, False),
        "ff": {"net_0": lin(f"transformer_blocks.{i}.ff.net.0.proj"),
               "net_2": lin(f"transformer_blocks.{i}.ff.net.2")},
        "ff_context": {"net_0": lin(f"transformer_blocks.{i}.ff_context.net.0.proj"),
                       "net_2": lin(f"transformer_blocks.{i}.ff_context.net.2")},
    } for i in range(cfg.num_layers)]
    single = [{
        "norm": {"linear": lin(f"single_transformer_blocks.{i}.norm.linear")},
        "proj_mlp": lin(f"single_transformer_blocks.{i}.proj_mlp"),
        "proj_out": lin(f"single_transformer_blocks.{i}.proj_out"),
        "attn": attn(f"single_transformer_blocks.{i}.attn", False, True),
    } for i in range(cfg.num_single_layers)]

    params = {
        "x_embedder": x_embedder,
        "context_embedder": {
            "time_text_embed": {
                "timestep_embedder": mlp("context_embedder.time_text_embed.timestep_embedder"),
                "text_embedder": mlp("context_embedder.time_text_embed.text_embedder"),
            },
            "proj_in": lin("context_embedder.proj_in"),
            "refiner_blocks": stack(refiners),
        },
        "time_text_embed": {
            "timestep_embedder": mlp("time_text_embed.timestep_embedder"),
            "text_embedder": mlp("time_text_embed.text_embedder"),
        },
        "dual_blocks": stack(dual),
        "single_blocks": stack(single),
        "norm_out": {"linear": lin("norm_out.linear")},
        "proj_out": lin("proj_out"),
    }
    if cfg.guidance_embeds:
        params["time_text_embed"]["guidance_embedder"] = mlp("time_text_embed.guidance_embedder")
    return params
