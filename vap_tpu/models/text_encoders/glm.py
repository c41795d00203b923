"""GLM-4 decoder used as a text ENCODER — functional JAX.

Behavioral reference: HF transformers GlmModel as used by CogView4's prompt
path (THUDM/CogView4-6B text_encoder; the pipeline takes the last hidden
states). LLaMA-like with GLM twists: qkv projections carry biases (o_proj
does not), the MLP is a fused gate_up projection, and rotary is PARTIAL
(head_dim * partial_rotary_factor dims) with interleaved-pair rotation —
the remaining dims pass through unrotated. Layers run as one lax.scan.
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
class GlmConfig:
    vocab_size: int = 151552
    hidden_size: int = 4096
    intermediate_size: int = 13696
    num_hidden_layers: int = 40
    num_attention_heads: int = 32
    num_key_value_heads: int = 2
    head_dim: int = 128
    partial_rotary_factor: float = 0.5
    rms_norm_eps: float = 1.5625e-07
    rope_theta: float = 10000.0

    @classmethod
    def glm_4_9b(cls, **overrides) -> "GlmConfig":
        return cls(**overrides)

    @classmethod
    def tiny(cls, **overrides) -> "GlmConfig":
        base = dict(vocab_size=64, hidden_size=24, intermediate_size=48,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2, head_dim=8)
        base.update(overrides)
        return cls(**base)


def init_glm(key, cfg: GlmConfig, dtype=jnp.float32) -> Params:
    d = cfg.hidden_size
    qd = cfg.num_attention_heads * cfg.head_dim
    kvd = cfg.num_key_value_heads * cfg.head_dim

    def block(k):
        ks = jax.random.split(k, 6)
        return {
            "input_layernorm": {"scale": jnp.ones((d,), dtype)},
            "q_proj": init_linear(ks[0], d, qd, dtype=dtype),
            "k_proj": init_linear(ks[1], d, kvd, dtype=dtype),
            "v_proj": init_linear(ks[2], d, kvd, dtype=dtype),
            "o_proj": init_linear(ks[3], qd, d, bias=False, dtype=dtype),
            "post_attention_layernorm": {"scale": jnp.ones((d,), dtype)},
            "gate_up_proj": init_linear(ks[4], d, 2 * cfg.intermediate_size,
                                        bias=False, dtype=dtype),
            "down_proj": init_linear(ks[5], cfg.intermediate_size, d,
                                     bias=False, dtype=dtype),
        }

    keys = jax.random.split(key, 3)
    blocks = [block(jax.random.fold_in(keys[0], i)) for i in range(cfg.num_hidden_layers)]
    return {
        "embed_tokens": jax.random.normal(keys[1], (cfg.vocab_size, d), dtype) * 0.02,
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": {"scale": jnp.ones((d,), dtype)},
    }


def _rotary(cfg: GlmConfig, seq_len: int):
    dim_r = int(cfg.head_dim * cfg.partial_rotary_factor)
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, dim_r, 2, dtype=np.float32) / dim_r))
    freqs = np.outer(np.arange(seq_len, dtype=np.float32), inv)  # [S, dim_r/2]
    cos = np.repeat(np.cos(freqs), 2, axis=-1)  # interleaved [S, dim_r]
    sin = np.repeat(np.sin(freqs), 2, axis=-1)
    return jnp.asarray(cos), jnp.asarray(sin), dim_r


def _rotate_interleaved(x: Array) -> Array:
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def glm_encode(params: Params, cfg: GlmConfig, input_ids: Array,
               attention_mask: Optional[Array] = None,
               hidden_layer: int = -1) -> Array:
    """input_ids: [B, S] -> hidden states [B, S, D].

    hidden_layer=-1 returns the final-norm output (HF last_hidden_state);
    hidden_layer=-2 returns the PENULTIMATE block's un-normed output (HF
    output_hidden_states[-2]) — what CogView4 conditions on (reference
    processors/glm.py:82, pipeline_cogview4.py:216)."""
    b, s = input_ids.shape
    h_q, h_kv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    x = params["embed_tokens"][input_ids]
    cos, sin, dim_r = _rotary(cfg, s)
    cos = cos.astype(jnp.float32)[None, None]
    sin = sin.astype(jnp.float32)[None, None]

    bias = jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)[None, None]
    if attention_mask is not None:
        pad = jnp.where(attention_mask > 0, 0.0, -jnp.inf).astype(jnp.float32)
        bias = bias + pad[:, None, None, :]
        bias = jnp.maximum(bias, jnp.where(
            jnp.eye(s, dtype=bool)[None, None], 0.0, -jnp.inf))

    def rope(t):
        tf = t.astype(jnp.float32)
        rot = tf[..., :dim_r] * cos + _rotate_interleaved(tf[..., :dim_r]) * sin
        return jnp.concatenate([rot, tf[..., dim_r:]], axis=-1).astype(t.dtype)

    def block(x, bp):
        n = rms_norm(bp["input_layernorm"], x, cfg.rms_norm_eps)
        q = linear(bp["q_proj"], n).reshape(b, s, h_q, hd).transpose(0, 2, 1, 3)
        k = linear(bp["k_proj"], n).reshape(b, s, h_kv, hd).transpose(0, 2, 1, 3)
        v = linear(bp["v_proj"], n).reshape(b, s, h_kv, hd).transpose(0, 2, 1, 3)
        q, k = rope(q), rope(k)
        if h_kv != h_q:
            rep = h_q // h_kv
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        scores = (q.astype(jnp.float32) @ k.astype(jnp.float32).transpose(0, 1, 3, 2)
                  ) * (hd ** -0.5) + bias
        attn = (jax.nn.softmax(scores, axis=-1) @ v.astype(jnp.float32)).astype(x.dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h_q * hd)
        x = x + linear(bp["o_proj"], attn)
        n = rms_norm(bp["post_attention_layernorm"], x, cfg.rms_norm_eps)
        gate, up = jnp.split(linear(bp["gate_up_proj"], n), 2, axis=-1)
        return x + linear(bp["down_proj"], up * jax.nn.silu(gate)), None

    if hidden_layer != -1:
        # HF hidden_states = (embeds, block_1, ..., block_N), UN-normed:
        # hidden_states[hidden_layer] is the output after running
        # N + 1 + hidden_layer blocks — scan only that prefix instead of
        # stacking every layer's states (GLM-4-9B at S~1k would materialize
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


def convert_glm_state_dict(sd: Dict[str, np.ndarray], cfg: GlmConfig,
                           dtype=jnp.float32) -> Params:
    """HF GlmModel state dict -> vap_tpu pytree."""
    pre = "model." if any(k.startswith("model.") for k in sd) else ""

    def lin(name, bias=True):
        p = {"kernel": jnp.asarray(np.asarray(sd[f"{pre}{name}.weight"]).T, dtype)}
        if bias and f"{pre}{name}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{pre}{name}.bias"], dtype)
        return p

    def rms(name):
        return {"scale": jnp.asarray(sd[f"{pre}{name}.weight"], dtype)}

    blocks = [{
        "input_layernorm": rms(f"layers.{i}.input_layernorm"),
        "q_proj": lin(f"layers.{i}.self_attn.q_proj"),
        "k_proj": lin(f"layers.{i}.self_attn.k_proj"),
        "v_proj": lin(f"layers.{i}.self_attn.v_proj"),
        "o_proj": lin(f"layers.{i}.self_attn.o_proj", bias=False),
        "post_attention_layernorm": rms(f"layers.{i}.post_attention_layernorm"),
        "gate_up_proj": lin(f"layers.{i}.mlp.gate_up_proj", bias=False),
        "down_proj": lin(f"layers.{i}.mlp.down_proj", bias=False),
    } for i in range(cfg.num_hidden_layers)]
    return {
        "embed_tokens": jnp.asarray(sd[f"{pre}embed_tokens.weight"], dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": rms("norm"),
    }


def cogview4_glm_embeds(params: Params, cfg: GlmConfig, tokenizer, prompts,
                        max_sequence_length: int = 1024,
                        always_pad: bool = False) -> Array:
    """CogView4 text conditioning (reference processors/glm.py:66-85 /
    pipeline_cogview4.py:190-216): tokenize padding='longest', LEFT-pad the
    ids to a multiple of 16 with pad_token_id, NO attention mask (pads are
    causally attended), and take the PENULTIMATE block's hidden states.

    always_pad: the reference training processor computes pad_length =
    16 - len % 16 without the % 16 guard, so an already-divisible length
    still gains 16 pad tokens; the inference pipeline guards it. Faithful
    to both."""
    import numpy as np

    if isinstance(prompts, str):
        prompts = [prompts]
    toks = tokenizer(prompts, padding="longest", max_length=max_sequence_length,
                     truncation=True, add_special_tokens=True, return_tensors="np")
    ids = np.asarray(toks["input_ids"])
    pad_id = getattr(tokenizer, "pad_token_id", None) or 0
    pad_length = 16 - ids.shape[1] % 16
    if not always_pad:
        pad_length %= 16
    if pad_length:
        pad = np.full((ids.shape[0], pad_length), pad_id, ids.dtype)
        ids = np.concatenate([pad, ids], axis=1)
    return glm_encode(params, cfg, jnp.asarray(ids), hidden_layer=-2)
