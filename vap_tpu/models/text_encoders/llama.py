"""LLaMA-style decoder used as a text ENCODER — functional JAX.

Behavioral reference: HF transformers LlamaModel as used by HunyuanVideo's
prompt path (llava-llama-3-8b; the pipeline feeds a templated prompt and
takes the last hidden states, dropping the template prefix —
finetrainers/models/hunyuan_video/base_specification.py conditions via
LlamaModel hidden states). Causal self-attention with GQA, half-split rotary
(rotate_half), SwiGLU MLP, RMSNorm. Layers run as one lax.scan.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import init_linear, linear, rms_norm

Array = jnp.ndarray
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128320
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    max_position_embeddings: int = 8192

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def llava_llama_8b(cls, **overrides) -> "LlamaConfig":
        return cls(**overrides)

    @classmethod
    def tiny(cls, **overrides) -> "LlamaConfig":
        base = dict(vocab_size=64, hidden_size=24, intermediate_size=48,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2, rope_theta=10000.0,
                    max_position_embeddings=32)
        base.update(overrides)
        return cls(**base)


def init_llama(key, cfg: LlamaConfig, dtype=jnp.float32) -> Params:
    d = cfg.hidden_size
    kvd = cfg.num_key_value_heads * cfg.head_dim

    def block(k):
        ks = jax.random.split(k, 7)
        return {
            "input_layernorm": {"scale": jnp.ones((d,), dtype)},
            "q_proj": init_linear(ks[0], d, d, bias=False, dtype=dtype),
            "k_proj": init_linear(ks[1], d, kvd, bias=False, dtype=dtype),
            "v_proj": init_linear(ks[2], d, kvd, bias=False, dtype=dtype),
            "o_proj": init_linear(ks[3], d, d, bias=False, dtype=dtype),
            "post_attention_layernorm": {"scale": jnp.ones((d,), dtype)},
            "gate_proj": init_linear(ks[4], d, cfg.intermediate_size, bias=False, dtype=dtype),
            "up_proj": init_linear(ks[5], d, cfg.intermediate_size, bias=False, dtype=dtype),
            "down_proj": init_linear(ks[6], cfg.intermediate_size, d, bias=False, dtype=dtype),
        }

    keys = jax.random.split(key, 3)
    blocks = [block(jax.random.fold_in(keys[0], i)) for i in range(cfg.num_hidden_layers)]
    return {
        "embed_tokens": jax.random.normal(keys[1], (cfg.vocab_size, d), dtype) * 0.02,
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": {"scale": jnp.ones((d,), dtype)},
    }


def _rotary(cfg: LlamaConfig, seq_len: int):
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, cfg.head_dim, 2, np.float32) / cfg.head_dim))
    freqs = np.outer(np.arange(seq_len, dtype=np.float32), inv)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


def _rotate_half(x: Array) -> Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def llama_encode(params: Params, cfg: LlamaConfig, input_ids: Array,
                 attention_mask: Optional[Array] = None,
                 hidden_layer: int = -1) -> Array:
    """input_ids: [B, S] -> hidden states [B, S, D].

    hidden_layer=-1 returns the final-norm output (HF last_hidden_state).
    Other negative indices address HF output_hidden_states — a tuple
    (embeds, block_1, ..., block_N) of UN-normed block outputs — so
    hidden_layer=-3 is what HunyuanVideo conditions on
    (num_hidden_layers_to_skip=2, reference pipeline_hunyuan_video.py:249,
    finetrainers/processors/llama.py:117)."""
    b, s = input_ids.shape
    h_q, h_kv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    x = params["embed_tokens"][input_ids]
    cos, sin = _rotary(cfg, s)
    cos = cos.astype(jnp.float32)[None, None]
    sin = sin.astype(jnp.float32)[None, None]

    bias = jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)[None, None]
    if attention_mask is not None:
        pad = jnp.where(attention_mask > 0, 0.0, -jnp.inf).astype(jnp.float32)
        bias = bias + pad[:, None, None, :]
        # fully-masked rows (causal row 0 of padded queries) stay finite via
        # the diagonal: HF keeps the self position unmasked for padded rows
        bias = jnp.maximum(bias, jnp.where(
            jnp.eye(s, dtype=bool)[None, None], 0.0, -jnp.inf))

    def block(x, bp):
        n = rms_norm(bp["input_layernorm"], x, cfg.rms_norm_eps)
        q = linear(bp["q_proj"], n).reshape(b, s, h_q, hd).transpose(0, 2, 1, 3)
        k = linear(bp["k_proj"], n).reshape(b, s, h_kv, hd).transpose(0, 2, 1, 3)
        v = linear(bp["v_proj"], n).reshape(b, s, h_kv, hd).transpose(0, 2, 1, 3)
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        q = (qf * cos + _rotate_half(qf) * sin).astype(x.dtype)
        k = (kf * cos + _rotate_half(kf) * sin).astype(x.dtype)
        if h_kv != h_q:  # GQA: repeat kv heads
            rep = h_q // h_kv
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        scores = (q.astype(jnp.float32) @ k.astype(jnp.float32).transpose(0, 1, 3, 2)
                  ) * (hd ** -0.5) + bias
        attn = (jax.nn.softmax(scores, axis=-1) @ v.astype(jnp.float32)).astype(x.dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden_size)
        x = x + linear(bp["o_proj"], attn)
        n = rms_norm(bp["post_attention_layernorm"], x, cfg.rms_norm_eps)
        mlp = linear(bp["down_proj"],
                     jax.nn.silu(linear(bp["gate_proj"], n)) * linear(bp["up_proj"], n))
        return x + mlp, None

    if hidden_layer != -1:
        # HF hidden_states = (embeds, block_1, ..., block_N), UN-normed:
        # run only the prefix of blocks whose output is requested instead of
        # stacking every layer's states (LLaMA-8B at S~350 would materialize
        # ~hundreds of MB per encode otherwise)
        n_blocks = jax.tree.leaves(params["blocks"])[0].shape[0]
        keep = n_blocks + 1 + hidden_layer
        if keep <= 0:
            return x  # the embedding layer itself
        sub = jax.tree.map(lambda a: a[:keep], params["blocks"])
        x, _ = jax.lax.scan(block, x, sub)
        return x
    x, _ = jax.lax.scan(block, x, params["blocks"])
    return rms_norm(params["norm"], x, cfg.rms_norm_eps)


def convert_llama_state_dict(sd: Dict[str, np.ndarray], cfg: LlamaConfig,
                             dtype=jnp.float32) -> Params:
    """HF LlamaModel state dict -> vap_tpu pytree (accepts keys with or
    without the `model.` prefix)."""
    pre = "model." if any(k.startswith("model.") for k in sd) else ""

    def lin(name):
        return {"kernel": jnp.asarray(np.asarray(sd[f"{pre}{name}.weight"]).T, dtype)}

    def rms(name):
        return {"scale": jnp.asarray(sd[f"{pre}{name}.weight"], dtype)}

    blocks = [{
        "input_layernorm": rms(f"layers.{i}.input_layernorm"),
        "q_proj": lin(f"layers.{i}.self_attn.q_proj"),
        "k_proj": lin(f"layers.{i}.self_attn.k_proj"),
        "v_proj": lin(f"layers.{i}.self_attn.v_proj"),
        "o_proj": lin(f"layers.{i}.self_attn.o_proj"),
        "post_attention_layernorm": rms(f"layers.{i}.post_attention_layernorm"),
        "gate_proj": lin(f"layers.{i}.mlp.gate_proj"),
        "up_proj": lin(f"layers.{i}.mlp.up_proj"),
        "down_proj": lin(f"layers.{i}.mlp.down_proj"),
    } for i in range(cfg.num_hidden_layers)]
    return {
        "embed_tokens": jnp.asarray(sd[f"{pre}embed_tokens.weight"], dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": rms("norm"),
    }
