"""Shared functional building blocks and parameter initializers.

Models in vap_tpu are pure functions over parameter pytrees (nested dicts of
jnp arrays). Linear kernels use the JAX convention ``[in, out]`` (transposed
relative to torch ``nn.Linear.weight``); weight-loading utilities handle the
transpose.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def init_linear(key, in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32):
    kkey, _ = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"kernel": jax.random.uniform(kkey, (in_dim, out_dim), dtype, -bound, bound)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def init_layer_norm(dim: int, affine: bool = True, dtype=jnp.float32):
    if not affine:
        return {}
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


# ---------------------------------------------------------------------------
# functional layers
# ---------------------------------------------------------------------------

def linear(p, x: Array) -> Array:
    if "w_i8" in p:
        if os.environ.get("VAP_INT8_PALLAS", "0") == "1":
            from vap_tpu.ops.int8_matmul import int8_linear_pallas, supported

            if supported(p, x):
                return int8_linear_pallas(p, x)
        return _int8_linear(p, x)
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _int8_linear(p, x: Array) -> Array:
    """W8A8 linear on the int8 MXU (2x the bf16 rate): weights pre-quantized
    per output channel (`quantize_linear_int8`), activations quantized
    dynamically per token (symmetric abs-max). Inference-only opt-in — the
    SmoothQuant-style W8A8 recipe; no custom VJP (training stays bf16)."""
    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-8)
    x_i8 = jnp.round(xf / s_x).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_i8, p["w_i8"], (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * s_x * p["s_w"].astype(jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


INT8_LINEAR_NAMES = ("to_q", "to_k", "to_v", "to_out", "net_0", "net_2")


def quantize_linear_int8(p):
    """{'kernel': [.., in, out], 'bias'?} -> {'w_i8', 's_w', 'bias'?} with
    per-output-channel symmetric scales (supports a stacked leading L axis —
    lax.scan slices it identically to the bf16 kernels)."""
    w = p["kernel"].astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=-2) / 127.0, 1e-12)  # [.., out]
    w_i8 = jnp.round(w / s_w[..., None, :]).astype(jnp.int8)
    out = {"w_i8": w_i8, "s_w": s_w}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_transformer_linears(params, names=INT8_LINEAR_NAMES):
    """Replace the attention/FFN projection kernels of a param pytree with
    int8 per-channel quantized forms; `linear()` dispatches on the result.
    Inference-only (halves projection HBM + runs the GEMMs on the int8 MXU).

    NB quantize-time QKV fusion (one [D, 3D] `to_qkv` projection per
    self-attention) was implemented and A/B-measured in-model: 15.41 vs
    15.29 s/step — no gain, despite the standalone int8 `dot_general` rate
    rising with N (131 TFLOP/s at N=3072 vs 233 at 12288; scripts/
    linear_bench.py --impl nsweep). In the compiled model XLA already
    pipelines the three same-input GEMMs back-to-back, so the wide-N win
    does not survive; the fusion was dropped (docs/ROOFLINE.md)."""
    return map_transformer_linears(params, quantize_linear_int8, names)


def map_transformer_linears(node, fn, names=INT8_LINEAR_NAMES, leaf_fn=None):
    """Walk a param pytree and replace each projection-linear subdict
    ({'kernel', 'bias'?} keyed by a name in `names`) with `fn(subdict)`;
    every other leaf is passed through `leaf_fn` (identity when None).

    This is THE match rule for which projections the W8A8 path covers —
    shared by `quantize_transformer_linears` and bench.py's quantized
    fast-init so the two cannot diverge."""
    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            if k in names and isinstance(v, dict) and "kernel" in v:
                out[k] = fn(v)
            else:
                out[k] = map_transformer_linears(v, fn, names, leaf_fn)
        return out
    if isinstance(node, (list, tuple)):
        return type(node)(map_transformer_linears(v, fn, names, leaf_fn)
                          for v in node)
    return leaf_fn(node) if leaf_fn is not None else node


def layer_norm(p, x: Array, eps: float = 1e-5) -> Array:
    """LayerNorm over the last dim, computed in fp32 (matches torch numerics)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if p:
        y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(p, x: Array, eps: float = 1e-6) -> Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    if p and "scale" in p:
        y = y * p["scale"].astype(jnp.float32)
    return y.astype(x.dtype)


def gelu_tanh(x: Array) -> Array:
    """'gelu-approximate' (tanh) activation, matching torch GELU(approximate='tanh')."""
    return jax.nn.gelu(x, approximate=True)


def silu(x: Array) -> Array:
    return jax.nn.silu(x)


def feed_forward(p, x: Array) -> Array:
    """diffusers FeedForward with activation 'gelu-approximate':
    Linear -> gelu(tanh) -> Linear."""
    h = gelu_tanh(linear(p["net_0"], x))
    return linear(p["net_2"], h)


def init_feed_forward(key, dim: int, inner_dim: Optional[int] = None, bias: bool = True, dtype=jnp.float32):
    inner = inner_dim or 4 * dim
    k0, k2 = jax.random.split(key)
    return {
        "net_0": init_linear(k0, dim, inner, bias=bias, dtype=dtype),
        "net_2": init_linear(k2, inner, dim, bias=bias, dtype=dtype),
    }


# ---------------------------------------------------------------------------
# timestep embedding
# ---------------------------------------------------------------------------

def sinusoidal_timestep_embedding(
    timesteps: Array,
    embedding_dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> Array:
    """Matches the reference `get_timestep_embedding` (embeddings.py:25-76).

    timesteps: [N] (possibly fractional). Returns [N, embedding_dim] float32.
    """
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def get_3d_sincos_pos_embed(
    embed_dim: int,
    spatial_size,  # (width, height) in post-patch units
    temporal_size: int,
    spatial_interpolation_scale: float = 1.0,
    temporal_interpolation_scale: float = 1.0,
):
    """3D sinusoidal positional embeddings, matching the reference
    `get_3d_sincos_pos_embed` (embeddings.py:79-151): dim split t:h:w =
    d/4 : 3d/8 : 3d/8, fp64 frequency table, [sin‖cos] per axis.

    Returns numpy [temporal_size * H * W, embed_dim] float32 (host-side:
    used only at init / trace time for static-shape buffers)."""
    import numpy as np

    if isinstance(spatial_size, int):
        spatial_size = (spatial_size, spatial_size)
    w, h = spatial_size
    dim_sp, dim_t = 3 * embed_dim // 4, embed_dim // 4

    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64)
        omega = 1.0 / 10000 ** (omega / (dim / 2.0))
        out = np.outer(pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(h, dtype=np.float32) / spatial_interpolation_scale
    grid_w = np.arange(w, dtype=np.float32) / spatial_interpolation_scale
    # torch.meshgrid(grid_w, grid_h, indexing="xy") -> grid[0]=w-coords,
    # grid[1]=h-coords, each [h, w]; 2d embed = [emb(grid[0]) ‖ emb(grid[1])]
    gw, gh = np.meshgrid(grid_w, grid_h)  # both [h, w]
    emb_sp = np.concatenate([_1d(dim_sp // 2, gw), _1d(dim_sp // 2, gh)], axis=1)  # [h*w, 3d/4]
    grid_t = np.arange(temporal_size, dtype=np.float32) / temporal_interpolation_scale
    emb_t = _1d(dim_t, grid_t)  # [T, d/4]

    pos = np.concatenate(
        [np.repeat(emb_t[:, None, :], h * w, axis=1),
         np.repeat(emb_sp[None, :, :], temporal_size, axis=0)], axis=-1)
    return pos.reshape(temporal_size * h * w, embed_dim).astype(np.float32)


def timestep_embedding_mlp(p, sample: Array) -> Array:
    """diffusers TimestepEmbedding: Linear -> SiLU -> Linear."""
    h = linear(p["linear_1"], sample)
    h = silu(h)
    return linear(p["linear_2"], h)


def init_timestep_embedding_mlp(key, in_dim: int, time_embed_dim: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "linear_1": init_linear(k1, in_dim, time_embed_dim, dtype=dtype),
        "linear_2": init_linear(k2, time_embed_dim, time_embed_dim, dtype=dtype),
    }


# ---------------------------------------------------------------------------
# activation checkpointing (reference finetrainers/utils/activation_checkpoint
# .py:36-90: FULL wraps every block, OPS saves matmul/SDPA outputs, BLOCK_SKIP
# wraps every n-th block). JAX analogs over lax.scan'd stacked blocks:
#   True/"full"        -> jax.checkpoint on the scan body
#   "ops"              -> jax.checkpoint with dots_saveable policy (matmul
#                         outputs saved, elementwise recomputed — the analog
#                         of the reference's selective-ops policy)
#   "block_skip:N"     -> every N-th block checkpointed, the rest saved
#   False/None         -> no remat
# ---------------------------------------------------------------------------

def scan_blocks_with_remat(body, carry, stacked, remat=False):
    """Run `body(carry, block_params) -> (carry, None)` over stacked block
    params [L, ...] under the selected checkpointing mode. Returns carry."""
    import jax as _jax

    if not remat:
        return _jax.lax.scan(body, carry, stacked)[0]
    if remat is True or remat == "full":
        return _jax.lax.scan(_jax.checkpoint(body, prevent_cse=False), carry, stacked)[0]
    if remat == "ops":
        pol = _jax.checkpoint_policies.dots_saveable
        return _jax.lax.scan(
            _jax.checkpoint(body, policy=pol, prevent_cse=False), carry, stacked)[0]
    if isinstance(remat, str) and remat.startswith("block_skip"):
        n = int(remat.split(":", 1)[1]) if ":" in remat else 2
        L = _jax.tree.leaves(stacked)[0].shape[0]
        if n <= 1 or L < n:
            return _jax.lax.scan(_jax.checkpoint(body, prevent_cse=False), carry, stacked)[0]
        tail = L % n
        main = _jax.tree.map(lambda x: x[: L - tail], stacked)
        grouped = _jax.tree.map(lambda x: x.reshape((L - tail) // n, n, *x.shape[1:]), main)

        def group_body(c, gp):
            first = _jax.tree.map(lambda x: x[0], gp)
            rest = _jax.tree.map(lambda x: x[1:], gp)
            c, _ = _jax.checkpoint(body, prevent_cse=False)(c, first)
            c, _ = _jax.lax.scan(body, c, rest)
            return c, None

        carry, _ = _jax.lax.scan(group_body, carry, grouped)
        if tail:
            rest = _jax.tree.map(lambda x: x[L - tail:], stacked)
            carry, _ = _jax.lax.scan(body, carry, rest)
        return carry
    raise ValueError(
        f"unknown remat mode {remat!r}; valid: False, True/'full', 'ops', 'block_skip[:N]'")
