"""T5 / UMT5 text encoder — functional JAX implementation.

Covers the reference's condition models: T5-XXL (CogVideoX, 226 tokens) and
UMT5-XXL (Wan, 512 tokens), loaded in the reference via HF transformers
(T5EncoderModel / UMT5EncoderModel). Architecture: RMS-norm pre-LN blocks,
relative position bias (shared across layers for T5, per-layer for UMT5),
gated-GELU feed-forward (v1.1), unscaled attention.

Blocks execute as one lax.scan over stacked parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "gated-gelu"  # or "relu"
    per_layer_relative_bias: bool = False  # True for UMT5

    @classmethod
    def t5_xxl(cls, **overrides) -> "T5Config":
        return cls(**overrides)

    @classmethod
    def umt5_xxl(cls, **overrides) -> "T5Config":
        base = dict(vocab_size=256384, per_layer_relative_bias=True)
        base.update(overrides)
        return cls(**base)

    @classmethod
    def tiny(cls, **overrides) -> "T5Config":
        base = dict(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4)
        base.update(overrides)
        return cls(**base)


def _rms_norm(weight: Array, x: Array, eps: float) -> Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    # T5 casts the normed activations back to the weight dtype before scaling
    return (weight * xf.astype(x.dtype).astype(jnp.float32)).astype(x.dtype)


def relative_position_bucket(relative_position: np.ndarray, num_buckets: int, max_distance: int) -> np.ndarray:
    """Bidirectional T5 relative position bucketing (host-side, static shapes)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(n.astype(np.float32) / max_exact + 1e-20) / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(np.int64)
    val_large = np.minimum(val_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_large)


def compute_position_bias(rel_bias_table: Array, seq_len: int, cfg: T5Config) -> Array:
    """[H, S, S] bias from the bucket embedding table [num_buckets, H]."""
    ctx = np.arange(seq_len)[:, None]
    mem = np.arange(seq_len)[None, :]
    buckets = relative_position_bucket(
        mem - ctx, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
    )
    bias = rel_bias_table[jnp.asarray(buckets)]  # [S, S, H]
    return bias.transpose(2, 0, 1)


def init_t5_encoder(key, cfg: T5Config, dtype=jnp.float32) -> Params:
    def dense(key, i, o):
        return {"kernel": jax.random.normal(key, (i, o), dtype) * (i ** -0.5)}

    keys = jax.random.split(key, 8)
    blocks = []
    for li in range(cfg.num_layers):
        k = jax.random.fold_in(keys[0], li)
        ks = jax.random.split(k, 8)
        b = {
            "ln_attn": jnp.ones((cfg.d_model,), dtype),
            "q": dense(ks[0], cfg.d_model, cfg.num_heads * cfg.d_kv),
            "k": dense(ks[1], cfg.d_model, cfg.num_heads * cfg.d_kv),
            "v": dense(ks[2], cfg.d_model, cfg.num_heads * cfg.d_kv),
            "o": dense(ks[3], cfg.num_heads * cfg.d_kv, cfg.d_model),
            "ln_ff": jnp.ones((cfg.d_model,), dtype),
        }
        if cfg.feed_forward_proj == "gated-gelu":
            b["wi_0"] = dense(ks[4], cfg.d_model, cfg.d_ff)
            b["wi_1"] = dense(ks[5], cfg.d_model, cfg.d_ff)
        else:
            b["wi"] = dense(ks[4], cfg.d_model, cfg.d_ff)
        b["wo"] = dense(ks[6], cfg.d_ff, cfg.d_model)
        if cfg.per_layer_relative_bias or li == 0:
            b["rel_bias"] = jax.random.normal(ks[7], (cfg.relative_attention_num_buckets, cfg.num_heads), dtype) * 0.02
        blocks.append(b)

    params: Params = {
        "embed": jax.random.normal(keys[1], (cfg.vocab_size, cfg.d_model), dtype),
        "final_ln": jnp.ones((cfg.d_model,), dtype),
    }
    if cfg.per_layer_relative_bias:
        params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    else:
        rel = blocks[0].pop("rel_bias")
        params["rel_bias"] = rel
        params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return params


def t5_encode(params: Params, cfg: T5Config, input_ids: Array, attention_mask: Optional[Array] = None) -> Array:
    """input_ids: [B, S] -> hidden states [B, S, d_model]."""
    b, s = input_ids.shape
    h = params["embed"][input_ids]
    dtype = h.dtype

    if attention_mask is not None:
        mask_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9).astype(jnp.float32)
    else:
        mask_bias = jnp.zeros((b, 1, 1, s), jnp.float32)

    if not cfg.per_layer_relative_bias:
        pos_bias = compute_position_bias(params["rel_bias"].astype(jnp.float32), s, cfg)[None]

    def block(h, bp):
        if cfg.per_layer_relative_bias:
            bias = compute_position_bias(bp["rel_bias"].astype(jnp.float32), s, cfg)[None]
        else:
            bias = pos_bias
        bias = bias + mask_bias

        x = _rms_norm(bp["ln_attn"], h, cfg.layer_norm_epsilon)
        q = (x @ bp["q"]["kernel"]).reshape(b, s, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        k = (x @ bp["k"]["kernel"]).reshape(b, s, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        v = (x @ bp["v"]["kernel"]).reshape(b, s, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, -1) @ bp["o"]["kernel"]
        h = h + attn

        x = _rms_norm(bp["ln_ff"], h, cfg.layer_norm_epsilon)
        if cfg.feed_forward_proj == "gated-gelu":
            ff = jax.nn.gelu(x @ bp["wi_0"]["kernel"], approximate=True) * (x @ bp["wi_1"]["kernel"])
        else:
            ff = jax.nn.relu(x @ bp["wi"]["kernel"])
        h = h + ff @ bp["wo"]["kernel"]
        return h, None

    h, _ = jax.lax.scan(block, h, params["blocks"])
    return _rms_norm(params["final_ln"], h, cfg.layer_norm_epsilon)


def convert_t5_state_dict(sd: Dict[str, np.ndarray], cfg: T5Config, dtype=jnp.float32) -> Params:
    """HF T5EncoderModel / UMT5EncoderModel state dict -> vap_tpu pytree."""
    def t(name):
        return jnp.asarray(np.asarray(sd[name]).T, dtype)

    blocks = []
    for li in range(cfg.num_layers):
        pre = f"encoder.block.{li}.layer"
        b = {
            "ln_attn": jnp.asarray(sd[f"{pre}.0.layer_norm.weight"], dtype),
            "q": {"kernel": t(f"{pre}.0.SelfAttention.q.weight")},
            "k": {"kernel": t(f"{pre}.0.SelfAttention.k.weight")},
            "v": {"kernel": t(f"{pre}.0.SelfAttention.v.weight")},
            "o": {"kernel": t(f"{pre}.0.SelfAttention.o.weight")},
            "ln_ff": jnp.asarray(sd[f"{pre}.1.layer_norm.weight"], dtype),
            "wo": {"kernel": t(f"{pre}.1.DenseReluDense.wo.weight")},
        }
        if cfg.feed_forward_proj == "gated-gelu":
            b["wi_0"] = {"kernel": t(f"{pre}.1.DenseReluDense.wi_0.weight")}
            b["wi_1"] = {"kernel": t(f"{pre}.1.DenseReluDense.wi_1.weight")}
        else:
            b["wi"] = {"kernel": t(f"{pre}.1.DenseReluDense.wi.weight")}
        bias_key = f"{pre}.0.SelfAttention.relative_attention_bias.weight"
        if cfg.per_layer_relative_bias:
            b["rel_bias"] = jnp.asarray(sd[bias_key], dtype)
        blocks.append(b)

    params: Params = {
        "embed": jnp.asarray(sd["shared.weight"] if "shared.weight" in sd else sd["encoder.embed_tokens.weight"], dtype),
        "final_ln": jnp.asarray(sd["encoder.final_layer_norm.weight"], dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }
    if not cfg.per_layer_relative_bias:
        params["rel_bias"] = jnp.asarray(
            sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"], dtype
        )
    return params
