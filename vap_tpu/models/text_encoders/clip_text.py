"""CLIP text encoder — functional JAX implementation.

Behavioral reference: HF transformers CLIPTextModel as used by the Flux spec's
CLIPPooledProcessor (finetrainers/processors/clip.py:39-75, returns
`pooler_output`) and SD-family pipelines. Causal self-attention over 77
tokens, quick-GELU MLPs, final layer norm; pooled output = hidden state at the
EOS token position. Blocks run as one lax.scan over stacked weights.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import init_layer_norm, init_linear, layer_norm, linear

Array = jnp.ndarray
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407
    hidden_act: str = "quick_gelu"

    @classmethod
    def clip_vit_l(cls, **overrides) -> "CLIPTextConfig":
        return cls(**overrides)

    @classmethod
    def tiny(cls, **overrides) -> "CLIPTextConfig":
        base = dict(vocab_size=64, hidden_size=16, intermediate_size=32,
                    num_hidden_layers=2, num_attention_heads=2,
                    max_position_embeddings=16, eos_token_id=63)
        base.update(overrides)
        return cls(**base)


def _act(cfg: CLIPTextConfig, x: Array) -> Array:
    if cfg.hidden_act == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if cfg.hidden_act in ("gelu", "gelu_new"):
        return jax.nn.gelu(x, approximate=cfg.hidden_act == "gelu_new")
    raise ValueError(cfg.hidden_act)


def init_clip_text(key, cfg: CLIPTextConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 4)
    d = cfg.hidden_size

    def block(k):
        ks = jax.random.split(k, 6)
        return {
            "layer_norm1": init_layer_norm(d, dtype=dtype),
            "q_proj": init_linear(ks[0], d, d, dtype=dtype),
            "k_proj": init_linear(ks[1], d, d, dtype=dtype),
            "v_proj": init_linear(ks[2], d, d, dtype=dtype),
            "out_proj": init_linear(ks[3], d, d, dtype=dtype),
            "layer_norm2": init_layer_norm(d, dtype=dtype),
            "fc1": init_linear(ks[4], d, cfg.intermediate_size, dtype=dtype),
            "fc2": init_linear(ks[5], cfg.intermediate_size, d, dtype=dtype),
        }

    blocks = [block(jax.random.fold_in(keys[0], i)) for i in range(cfg.num_hidden_layers)]
    return {
        "token_embedding": jax.random.normal(keys[1], (cfg.vocab_size, d), dtype) * 0.02,
        "position_embedding": jax.random.normal(keys[2], (cfg.max_position_embeddings, d), dtype) * 0.02,
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_layer_norm": init_layer_norm(d, dtype=dtype),
    }


def clip_text_encode(params: Params, cfg: CLIPTextConfig,
                     input_ids: Array) -> Tuple[Array, Array]:
    """input_ids: [B, S] int32 -> (last_hidden_state [B, S, D],
    pooler_output [B, D] taken at the EOS token position)."""
    b, s = input_ids.shape
    heads = cfg.num_attention_heads
    x = params["token_embedding"][input_ids] + params["position_embedding"][None, :s]
    d_head = cfg.hidden_size // heads
    causal = jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)

    def block(x, bp):
        h = layer_norm(bp["layer_norm1"], x, cfg.layer_norm_eps)
        q = linear(bp["q_proj"], h).reshape(b, s, heads, d_head).transpose(0, 2, 1, 3)
        k = linear(bp["k_proj"], h).reshape(b, s, heads, d_head).transpose(0, 2, 1, 3)
        v = linear(bp["v_proj"], h).reshape(b, s, heads, d_head).transpose(0, 2, 1, 3)
        scores = (q.astype(jnp.float32) @ k.astype(jnp.float32).transpose(0, 1, 3, 2)
                  ) * (d_head ** -0.5) + causal
        attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden_size)
        x = x + linear(bp["out_proj"], o)
        h = layer_norm(bp["layer_norm2"], x, cfg.layer_norm_eps)
        x = x + linear(bp["fc2"], _act(cfg, linear(bp["fc1"], h)))
        return x, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    x = layer_norm(params["final_layer_norm"], x, cfg.layer_norm_eps)
    if cfg.eos_token_id == 2:
        # Legacy hub configs (pre transformers#24773 — e.g. the openai
        # clip-vit-* checkpoints) ship eos_token_id=2, which never appears in
        # tokenized text; HF pools at the highest token id in each row (the
        # real EOT, 49407, is the vocabulary maximum). Mirrored exactly or
        # pooling would silently land on position 0 for those checkpoints.
        eos_pos = jnp.argmax(input_ids, axis=-1)
    else:
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = x[jnp.arange(b), eos_pos]
    return x, pooled


def convert_clip_text_state_dict(sd: Dict[str, np.ndarray], cfg: CLIPTextConfig,
                                 dtype=jnp.float32) -> Params:
    """HF CLIPTextModel state dict -> vap_tpu pytree."""
    def lin(name):
        return {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T, dtype),
                "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}

    def ln(name):
        return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype),
                "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}

    blocks = []
    for i in range(cfg.num_hidden_layers):
        pre = f"text_model.encoder.layers.{i}"
        blocks.append({
            "layer_norm1": ln(f"{pre}.layer_norm1"),
            "q_proj": lin(f"{pre}.self_attn.q_proj"),
            "k_proj": lin(f"{pre}.self_attn.k_proj"),
            "v_proj": lin(f"{pre}.self_attn.v_proj"),
            "out_proj": lin(f"{pre}.self_attn.out_proj"),
            "layer_norm2": ln(f"{pre}.layer_norm2"),
            "fc1": lin(f"{pre}.mlp.fc1"),
            "fc2": lin(f"{pre}.mlp.fc2"),
        })
    return {
        "token_embedding": jnp.asarray(sd["text_model.embeddings.token_embedding.weight"], dtype),
        "position_embedding": jnp.asarray(sd["text_model.embeddings.position_embedding.weight"], dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_layer_norm": ln("text_model.final_layer_norm"),
    }
