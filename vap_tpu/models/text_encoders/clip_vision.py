"""CLIP ViT vision encoder — functional JAX implementation.

Covers the reference's Wan-I2V image conditioning (CLIPVisionModel; the
pipeline takes the penultimate hidden state of 257 tokens —
pipeline_wan_i2v_mot.py:223-232). Pre-LN ViT with class token and learned
position embeddings; blocks run as one lax.scan.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..common import init_layer_norm, init_linear, layer_norm, linear

Array = jnp.ndarray
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    hidden_act: str = "gelu"  # CLIP-ViT-H; OpenAI CLIP uses "quick_gelu"
    layer_norm_eps: float = 1e-5

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1

    @classmethod
    def tiny(cls, **overrides) -> "CLIPVisionConfig":
        base = dict(hidden_size=24, intermediate_size=48, num_hidden_layers=2,
                    num_attention_heads=2, image_size=28, patch_size=14)
        base.update(overrides)
        return cls(**base)


def _act(cfg: CLIPVisionConfig, x: Array) -> Array:
    if cfg.hidden_act == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def init_clip_vision(key, cfg: CLIPVisionConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, cfg.num_hidden_layers + 4)
    d = cfg.hidden_size
    blocks = []
    for li in range(cfg.num_hidden_layers):
        bk = jax.random.split(ks[li], 6)
        blocks.append({
            "ln1": init_layer_norm(d, dtype=dtype),
            "q": init_linear(bk[0], d, d, dtype=dtype),
            "k": init_linear(bk[1], d, d, dtype=dtype),
            "v": init_linear(bk[2], d, d, dtype=dtype),
            "o": init_linear(bk[3], d, d, dtype=dtype),
            "ln2": init_layer_norm(d, dtype=dtype),
            "fc1": init_linear(bk[4], d, cfg.intermediate_size, dtype=dtype),
            "fc2": init_linear(bk[5], cfg.intermediate_size, d, dtype=dtype),
        })
    return {
        "patch_embed": {"kernel": 0.02 * jax.random.normal(
            ks[-1], (cfg.patch_size, cfg.patch_size, 3, d), dtype)},
        "class_embed": 0.02 * jax.random.normal(ks[-2], (d,), dtype),
        "pos_embed": 0.02 * jax.random.normal(ks[-3], (cfg.num_positions, d), dtype),
        "pre_ln": init_layer_norm(d, dtype=dtype),
        "post_ln": init_layer_norm(d, dtype=dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }


def clip_vision_encode(params: Params, cfg: CLIPVisionConfig, pixel_values: Array,
                       penultimate: bool = True) -> Array:
    """pixel_values: [B, H, W, 3] (CLIP-normalized). Returns hidden states
    [B, 257, D] — penultimate layer when `penultimate` (Wan's choice)."""
    b = pixel_values.shape[0]
    d = cfg.hidden_size
    heads = cfg.num_attention_heads
    eps = cfg.layer_norm_eps

    x = jax.lax.conv_general_dilated(
        pixel_values, params["patch_embed"]["kernel"].astype(pixel_values.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x.reshape(b, -1, d)
    cls = jnp.broadcast_to(params["class_embed"].astype(x.dtype), (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"].astype(x.dtype)
    x = layer_norm(params["pre_ln"], x, eps)

    def block(carry, bp):
        h = carry
        s = h.shape[1]
        y = layer_norm(bp["ln1"], h, eps)
        q = linear(bp["q"], y).reshape(b, s, heads, -1).transpose(0, 2, 1, 3)
        k = linear(bp["k"], y).reshape(b, s, heads, -1).transpose(0, 2, 1, 3)
        v = linear(bp["v"], y).reshape(b, s, heads, -1).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * (q.shape[-1] ** -0.5)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(b, s, d)
        h = h + linear(bp["o"], o)
        y = layer_norm(bp["ln2"], h, eps)
        h = h + linear(bp["fc2"], _act(cfg, linear(bp["fc1"], y)))
        return h, h

    _, hiddens = jax.lax.scan(block, x, params["blocks"])
    # hiddens[i] = output of layer i; HF hidden_states[-2] = output of layer L-1
    return hiddens[-2] if penultimate else hiddens[-1]


def convert_clip_vision_state_dict(sd: Dict[str, np.ndarray], cfg: CLIPVisionConfig,
                                   dtype=jnp.float32) -> Params:
    """HF CLIPVisionModel state dict -> vap_tpu pytree."""
    def lin(name):
        return {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T, dtype),
                "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}

    def ln(name):
        return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype),
                "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}

    pre = "vision_model"
    blocks = []
    for li in range(cfg.num_hidden_layers):
        bp = f"{pre}.encoder.layers.{li}"
        blocks.append({
            "ln1": ln(f"{bp}.layer_norm1"),
            "q": lin(f"{bp}.self_attn.q_proj"),
            "k": lin(f"{bp}.self_attn.k_proj"),
            "v": lin(f"{bp}.self_attn.v_proj"),
            "o": lin(f"{bp}.self_attn.out_proj"),
            "ln2": ln(f"{bp}.layer_norm2"),
            "fc1": lin(f"{bp}.mlp.fc1"),
            "fc2": lin(f"{bp}.mlp.fc2"),
        })
    conv_w = np.asarray(sd[f"{pre}.embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)
    return {
        "patch_embed": {"kernel": jnp.asarray(conv_w, dtype)},
        "class_embed": jnp.asarray(np.asarray(sd[f"{pre}.embeddings.class_embedding"]).reshape(-1), dtype),
        "pos_embed": jnp.asarray(sd[f"{pre}.embeddings.position_embedding.weight"], dtype),
        "pre_ln": ln(f"{pre}.pre_layrnorm") if f"{pre}.pre_layrnorm.weight" in sd else ln(f"{pre}.pre_layernorm"),
        "post_ln": ln(f"{pre}.post_layernorm"),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }
