"""Weight conversion: HF WanTransformer3DMOTModel layout -> vap_tpu pytree."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .config import WanMOTConfig

Params = Dict[str, Any]


def _lin(sd, name, dtype) -> Params:
    p = {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T, dtype)}
    if f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _rms(sd, name, dtype) -> Params:
    return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype)}


def _ln(sd, name, dtype) -> Params:
    if f"{name}.weight" not in sd:
        return {}
    return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype), "bias": jnp.asarray(sd[f"{name}.bias"], dtype)}


def _attn(sd, pre, dtype, added_kv: bool) -> Params:
    p = {
        "to_q": _lin(sd, f"{pre}.to_q", dtype),
        "to_k": _lin(sd, f"{pre}.to_k", dtype),
        "to_v": _lin(sd, f"{pre}.to_v", dtype),
        "to_out": _lin(sd, f"{pre}.to_out.0", dtype),
        "norm_q": _rms(sd, f"{pre}.norm_q", dtype),
        "norm_k": _rms(sd, f"{pre}.norm_k", dtype),
    }
    if added_kv and f"{pre}.add_k_proj.weight" in sd:
        p["add_k_proj"] = _lin(sd, f"{pre}.add_k_proj", dtype)
        p["add_v_proj"] = _lin(sd, f"{pre}.add_v_proj", dtype)
        p["norm_added_k"] = _rms(sd, f"{pre}.norm_added_k", dtype)
    return p


def _ffn(sd, pre, dtype) -> Params:
    return {"net_0": _lin(sd, f"{pre}.net.0.proj", dtype), "net_2": _lin(sd, f"{pre}.net.2", dtype)}


def _block(sd, i, has_mot, cfg, dtype) -> Params:
    pre = f"blocks.{i}"
    p = {
        "attn1": _attn(sd, f"{pre}.attn1", dtype, False),
        "attn2": _attn(sd, f"{pre}.attn2", dtype, True),
        "norm2": _ln(sd, f"{pre}.norm2", dtype),
        "ffn": _ffn(sd, f"{pre}.ffn", dtype),
        "scale_shift_table": jnp.asarray(np.asarray(sd[f"{pre}.scale_shift_table"]).reshape(6, -1), dtype),
    }
    if has_mot:
        p.update({
            "attn1_mot_ref": _attn(sd, f"{pre}.attn1_mot_ref", dtype, False),
            "attn2_mot_ref": _attn(sd, f"{pre}.attn2_mot_ref", dtype, True),
            "norm2_mot_ref": _ln(sd, f"{pre}.norm2_mot_ref", dtype),
            "ffn_mot_ref": _ffn(sd, f"{pre}.ffn_mot_ref", dtype),
            "scale_shift_table_mot_ref": jnp.asarray(
                np.asarray(sd[f"{pre}.scale_shift_table_mot_ref"]).reshape(6, -1), dtype),
        })
    return p


def _cond_embedder(sd, pre, cfg: WanMOTConfig, dtype) -> Params:
    p = {
        "time_embedder": {
            "linear_1": _lin(sd, f"{pre}.time_embedder.linear_1", dtype),
            "linear_2": _lin(sd, f"{pre}.time_embedder.linear_2", dtype),
        },
        "time_proj": _lin(sd, f"{pre}.time_proj", dtype),
        "text_embedder": {
            "linear_1": _lin(sd, f"{pre}.text_embedder.linear_1", dtype),
            "linear_2": _lin(sd, f"{pre}.text_embedder.linear_2", dtype),
        },
    }
    if f"{pre}.image_embedder.ff.net.0.proj.weight" in sd:
        p["image_embedder"] = {
            "norm1": _ln(sd, f"{pre}.image_embedder.norm1", dtype),
            "ff": {
                "net_0": _lin(sd, f"{pre}.image_embedder.ff.net.0.proj", dtype),
                "net_2": _lin(sd, f"{pre}.image_embedder.ff.net.2", dtype),
            },
            "norm2": _ln(sd, f"{pre}.image_embedder.norm2", dtype),
        }
        if f"{pre}.image_embedder.pos_embed" in sd:
            p["image_embedder"]["pos_embed"] = jnp.asarray(sd[f"{pre}.image_embedder.pos_embed"], dtype)
    return p


def convert_wan_state_dict(sd: Dict[str, np.ndarray], cfg: WanMOTConfig, dtype=jnp.float32) -> Params:
    """Plain WanTransformer3DModel (T2V, control-trainer backbone) — the MoT
    conversion minus every *_mot_ref tensor."""
    w = np.asarray(sd["patch_embedding.weight"])
    params: Params = {
        "patch_embedding": {"kernel": jnp.asarray(w.reshape(w.shape[0], -1).T, dtype),
                            "bias": jnp.asarray(sd["patch_embedding.bias"], dtype)},
        "condition_embedder": _cond_embedder(sd, "condition_embedder", cfg, dtype),
        "proj_out": _lin(sd, "proj_out", dtype),
        "scale_shift_table": jnp.asarray(np.asarray(sd["scale_shift_table"]).reshape(2, -1), dtype),
    }
    blocks = [_block(sd, i, False, cfg, dtype) for i in range(cfg.num_layers)]
    params["blocks"] = (jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),)
    return params


def convert_wan_mot_state_dict(sd: Dict[str, np.ndarray], cfg: WanMOTConfig, dtype=jnp.float32) -> Params:
    pt, ph, pw = cfg.patch_size
    # conv3d [D, C, pt, ph, pw] -> linear [(C*pt*ph*pw), D]
    w = np.asarray(sd["patch_embedding.weight"])
    kernel = w.reshape(w.shape[0], -1).T
    w_ref = np.asarray(sd["patch_embedding_mot_ref.weight"])
    kernel_ref = w_ref.reshape(w_ref.shape[0], -1).T

    params: Params = {
        "patch_embedding": {"kernel": jnp.asarray(kernel, dtype),
                            "bias": jnp.asarray(sd["patch_embedding.bias"], dtype)},
        "patch_embedding_mot_ref": {"kernel": jnp.asarray(kernel_ref, dtype),
                                    "bias": jnp.asarray(sd["patch_embedding_mot_ref.bias"], dtype)},
        "condition_embedder": _cond_embedder(sd, "condition_embedder", cfg, dtype),
        "condition_embedder_mot_ref": _cond_embedder(sd, "condition_embedder_mot_ref", cfg, dtype),
        "proj_out": _lin(sd, "proj_out", dtype),
        "scale_shift_table": jnp.asarray(np.asarray(sd["scale_shift_table"]).reshape(2, -1), dtype),
    }
    if cfg.reference_train_mode == "reference_independent":
        params["proj_out_mot_ref"] = _lin(sd, "proj_out_mot_ref", dtype)
        params["scale_shift_table_mot_ref"] = jnp.asarray(
            np.asarray(sd["scale_shift_table_mot_ref"]).reshape(2, -1), dtype)

    segments = []
    for start, length, has_mot in cfg.mot_segments:
        blocks = [_block(sd, start + i, has_mot, cfg, dtype) for i in range(length)]
        segments.append(jax.tree.map(lambda *xs: jnp.stack(xs), *blocks))
    params["blocks"] = tuple(segments)
    return params
