"""Weight conversion: HF CogVideoX MOT checkpoint layout -> vap_tpu pytree.

Input is a flat {name: numpy array} dict (e.g. from safetensors or a torch
state_dict detached to numpy). Param names follow the reference
`CogVideoXTransformer3DMOTModel`; linear kernels are transposed to JAX
[in, out] layout and the conv patch projection is flattened to a linear
kernel over (C, ph, pw)-ordered patch pixels.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from .config import CogVideoXMOTConfig


def _lin(sd, name, dtype) -> Dict[str, Any]:
    p = {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T, dtype)}
    if f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _ln(sd, name, dtype) -> Dict[str, Any]:
    if f"{name}.weight" not in sd:
        return {}
    return {
        "scale": jnp.asarray(sd[f"{name}.weight"], dtype),
        "bias": jnp.asarray(sd[f"{name}.bias"], dtype),
    }


def _patch_embed(sd, prefix, cfg: CogVideoXMOTConfig, dtype) -> Dict[str, Any]:
    w = np.asarray(sd[f"{prefix}.proj.weight"])
    if cfg.patch_size_t is None:
        # conv2d [D, C, p, p] -> linear [C*p*p, D]
        kernel = w.reshape(w.shape[0], -1).T
    else:
        kernel = w.T
    p = {
        "proj": {"kernel": jnp.asarray(kernel, dtype), "bias": jnp.asarray(sd[f"{prefix}.proj.bias"], dtype)},
        "text_proj": _lin(sd, f"{prefix}.text_proj", dtype),
    }
    if f"{prefix}.pos_embedding" in sd:
        # trained joint pos buffer [1, L, D] -> [L, D] (I2V checkpoints,
        # use_learned_positional_embeddings)
        pe = np.asarray(sd[f"{prefix}.pos_embedding"])
        p["pos_embedding"] = jnp.asarray(pe.reshape(pe.shape[-2], pe.shape[-1]), dtype)
    return p


def _attention(sd, prefix, dtype) -> Dict[str, Any]:
    return {
        "to_q": _lin(sd, f"{prefix}.to_q", dtype),
        "to_k": _lin(sd, f"{prefix}.to_k", dtype),
        "to_v": _lin(sd, f"{prefix}.to_v", dtype),
        "to_out": _lin(sd, f"{prefix}.to_out.0", dtype),
        "norm_q": _ln(sd, f"{prefix}.norm_q", dtype),
        "norm_k": _ln(sd, f"{prefix}.norm_k", dtype),
    }


def _norm_zero(sd, prefix, dtype) -> Dict[str, Any]:
    return {"linear": _lin(sd, f"{prefix}.linear", dtype), "norm": _ln(sd, f"{prefix}.norm", dtype)}


def _ff(sd, prefix, dtype) -> Dict[str, Any]:
    return {"net_0": _lin(sd, f"{prefix}.net.0.proj", dtype), "net_2": _lin(sd, f"{prefix}.net.2", dtype)}


def _block(sd, i: int, has_mot: bool, dtype) -> Dict[str, Any]:
    pre = f"transformer_blocks.{i}"
    p = {
        "norm1": _norm_zero(sd, f"{pre}.norm1", dtype),
        "attn1": _attention(sd, f"{pre}.attn1", dtype),
        "norm2": _norm_zero(sd, f"{pre}.norm2", dtype),
        "ff": _ff(sd, f"{pre}.ff", dtype),
    }
    if has_mot:
        p.update({
            "norm1_mot_ref": _norm_zero(sd, f"{pre}.norm1_mot_ref", dtype),
            "attn1_mot_ref": _attention(sd, f"{pre}.attn1_mot_ref", dtype),
            "norm2_mot_ref": _norm_zero(sd, f"{pre}.norm2_mot_ref", dtype),
            "ff_mot_ref": _ff(sd, f"{pre}.ff_mot_ref", dtype),
        })
    return p


def convert_cogvideox_mot_state_dict(
    sd: Dict[str, np.ndarray], cfg: CogVideoXMOTConfig, dtype=jnp.float32
) -> Dict[str, Any]:
    import jax

    params: Dict[str, Any] = {
        "patch_embed": _patch_embed(sd, "patch_embed", cfg, dtype),
        "patch_embed_mot_ref": _patch_embed(sd, "patch_embed_mot_ref", cfg, dtype),
        "time_embedding": {
            "linear_1": _lin(sd, "time_embedding.linear_1", dtype),
            "linear_2": _lin(sd, "time_embedding.linear_2", dtype),
        },
        "time_embedding_mot_ref": {
            "linear_1": _lin(sd, "time_embedding_mot_ref.linear_1", dtype),
            "linear_2": _lin(sd, "time_embedding_mot_ref.linear_2", dtype),
        },
        "norm_final": _ln(sd, "norm_final", dtype),
        "norm_out": {"linear": _lin(sd, "norm_out.linear", dtype), "norm": _ln(sd, "norm_out.norm", dtype)},
        "proj_out": _lin(sd, "proj_out", dtype),
    }
    if cfg.ofs_embed_dim and "ofs_embedding.linear_1.weight" in sd:
        params["ofs_embedding"] = {
            "linear_1": _lin(sd, "ofs_embedding.linear_1", dtype),
            "linear_2": _lin(sd, "ofs_embedding.linear_2", dtype),
        }
    if cfg.reference_train_mode == "reference_independent":
        params["norm_final_mot_ref"] = _ln(sd, "norm_final_mot_ref", dtype)
        params["norm_out_mot_ref"] = {
            "linear": _lin(sd, "norm_out_mot_ref.linear", dtype),
            "norm": _ln(sd, "norm_out_mot_ref.norm", dtype),
        }
        params["proj_out_mot_ref"] = _lin(sd, "proj_out_mot_ref", dtype)
    if cfg.supported_effect_types:
        params["effect_embeddings"] = jnp.stack([
            jnp.asarray(np.asarray(sd[f"effect_embeddings.{t}"]).reshape(-1), dtype)
            for t in cfg.supported_effect_types
        ])
    if cfg.num_ref_embeddings:
        params["ref_embeddings"] = jnp.stack([
            jnp.asarray(np.asarray(sd[f"ref_embeddings.ref_{i}"]).reshape(-1), dtype)
            for i in range(cfg.num_ref_embeddings)
        ])

    segments = []
    for start, length, has_mot in cfg.mot_segments:
        blocks = [_block(sd, start + i, has_mot, dtype) for i in range(length)]
        segments.append(jax.tree.map(lambda *xs: jnp.stack(xs), *blocks))
    params["blocks"] = tuple(segments)
    return params


def torch_state_dict_to_numpy(model) -> Dict[str, np.ndarray]:
    """Helper for tests: torch module -> {name: numpy} (fp32)."""
    return {k: v.detach().float().cpu().numpy() for k, v in model.state_dict().items()}
