"""Per-family export flatteners: vap_tpu pytree -> diffusers reference-name
state dict (the inverse of each family's convert_*_state_dict).

The reference exports trained transformers in diffusers layout so users can
load them with from_pretrained (finetrainers trainer save hooks +
spec._save_model paths); these flatteners do the same for every family. Each
is tested by round-tripping convert(flatten(params)) == params (tests/
test_export_flatten.py), which anchors them to the parity-tested converters.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

Params = Dict[str, Any]


def _np(x):
    return np.asarray(x)


class _Out(dict):
    """state-dict builder with the shared inverse primitives."""

    def lin(self, name, p):
        self[f"{name}.weight"] = _np(p["kernel"]).T
        if "bias" in p:
            self[f"{name}.bias"] = _np(p["bias"])

    def rms(self, name, p):
        self[f"{name}.weight"] = _np(p["scale"])

    def ln(self, name, p):
        if p:
            self[f"{name}.weight"] = _np(p["scale"])
            self[f"{name}.bias"] = _np(p["bias"])

    def ff(self, name, p):
        self.lin(f"{name}.net.0.proj", p["net_0"])
        self.lin(f"{name}.net.2", p["net_2"])

    def mlp(self, name, p):
        self.lin(f"{name}.linear_1", p["linear_1"])
        self.lin(f"{name}.linear_2", p["linear_2"])


def _unstack(seg):
    """Stacked block leaves -> list of per-layer pytrees."""
    n = jax.tree.leaves(seg)[0].shape[0]
    return [jax.tree.map(lambda x: x[i], seg) for i in range(n)]


# ---------------------------------------------------------------------------
# Wan (plain T2V + MoT) — inverse of models/wan/weights.py
# ---------------------------------------------------------------------------

def _wan_attn(out, pre, p):
    for sub in ("to_q", "to_k", "to_v"):
        out.lin(f"{pre}.{sub}", p[sub])
    out.lin(f"{pre}.to_out.0", p["to_out"])
    out.rms(f"{pre}.norm_q", p["norm_q"])
    out.rms(f"{pre}.norm_k", p["norm_k"])
    if "add_k_proj" in p:
        out.lin(f"{pre}.add_k_proj", p["add_k_proj"])
        out.lin(f"{pre}.add_v_proj", p["add_v_proj"])
        out.rms(f"{pre}.norm_added_k", p["norm_added_k"])


def _wan_block(out, pre, bp, has_mot):
    suffixes = ("", "_mot_ref") if has_mot else ("",)
    for suf in suffixes:
        _wan_attn(out, f"{pre}.attn1{suf}", bp[f"attn1{suf}"])
        _wan_attn(out, f"{pre}.attn2{suf}", bp[f"attn2{suf}"])
        out.ln(f"{pre}.norm2{suf}", bp[f"norm2{suf}"])
        out.ff(f"{pre}.ffn{suf}", bp[f"ffn{suf}"])
        out[f"{pre}.scale_shift_table{suf}"] = _np(
            bp[f"scale_shift_table{suf}"]).reshape(1, 6, -1)


def _wan_cond_embedder(out, pre, p):
    out.mlp(f"{pre}.time_embedder", p["time_embedder"])
    out.lin(f"{pre}.time_proj", p["time_proj"])
    out.mlp(f"{pre}.text_embedder", p["text_embedder"])
    if "image_embedder" in p:
        ie = p["image_embedder"]
        out.ln(f"{pre}.image_embedder.norm1", ie["norm1"])
        out.ff(f"{pre}.image_embedder.ff", ie["ff"])
        out.ln(f"{pre}.image_embedder.norm2", ie["norm2"])
        if "pos_embed" in ie:
            out[f"{pre}.image_embedder.pos_embed"] = _np(ie["pos_embed"])


def _wan_patch_embedding(out, name, p, cfg):
    pt, ph, pw = cfg.patch_size
    k = _np(p["kernel"]).T  # [D, C*pt*ph*pw]
    out[f"{name}.weight"] = k.reshape(k.shape[0], -1, pt, ph, pw)
    out[f"{name}.bias"] = _np(p["bias"])


def flatten_wan_state_dict(params: Params, cfg) -> Dict[str, np.ndarray]:
    """Plain WanTransformer3DModel (control backbone). NOTE: a control-widened
    patch_embedding round-trips through the widened in_channels in the conv
    reshape (kernel rows are (C, pt, ph, pw) with C outermost)."""
    out = _Out()
    _wan_patch_embedding(out, "patch_embedding", params["patch_embedding"], cfg)
    _wan_cond_embedder(out, "condition_embedder", params["condition_embedder"])
    out.lin("proj_out", params["proj_out"])
    out["scale_shift_table"] = _np(params["scale_shift_table"]).reshape(1, 2, -1)
    for i, bp in enumerate(_unstack(params["blocks"][0])):
        _wan_block(out, f"blocks.{i}", bp, has_mot=False)
    return dict(out)


def flatten_wan_mot_state_dict(params: Params, cfg) -> Dict[str, np.ndarray]:
    out = _Out()
    _wan_patch_embedding(out, "patch_embedding", params["patch_embedding"], cfg)
    _wan_patch_embedding(out, "patch_embedding_mot_ref",
                         params["patch_embedding_mot_ref"], cfg)
    _wan_cond_embedder(out, "condition_embedder", params["condition_embedder"])
    _wan_cond_embedder(out, "condition_embedder_mot_ref",
                       params["condition_embedder_mot_ref"])
    out.lin("proj_out", params["proj_out"])
    out["scale_shift_table"] = _np(params["scale_shift_table"]).reshape(1, 2, -1)
    if "proj_out_mot_ref" in params:
        out.lin("proj_out_mot_ref", params["proj_out_mot_ref"])
        out["scale_shift_table_mot_ref"] = _np(
            params["scale_shift_table_mot_ref"]).reshape(1, 2, -1)
    for (start, length, has_mot), seg in zip(cfg.mot_segments, params["blocks"]):
        for li, bp in enumerate(_unstack(seg)):
            _wan_block(out, f"blocks.{start + li}", bp, has_mot=has_mot)
    return dict(out)


# ---------------------------------------------------------------------------
# Flux — inverse of models/flux/transformer.py::convert_flux_state_dict
# ---------------------------------------------------------------------------

def _mmdit_attn(out, pre, p, added, pre_only):
    for sub in ("to_q", "to_k", "to_v"):
        out.lin(f"{pre}.{sub}", p[sub])
    out.rms(f"{pre}.norm_q", p["norm_q"])
    out.rms(f"{pre}.norm_k", p["norm_k"])
    if not pre_only:
        out.lin(f"{pre}.to_out.0", p["to_out"])
    if added:
        out.lin(f"{pre}.add_q_proj", p["add_q_proj"])
        out.lin(f"{pre}.add_k_proj", p["add_k_proj"])
        out.lin(f"{pre}.add_v_proj", p["add_v_proj"])
        out.rms(f"{pre}.norm_added_q", p["norm_added_q"])
        out.rms(f"{pre}.norm_added_k", p["norm_added_k"])
        out.lin(f"{pre}.to_add_out", p["to_add_out"])


def flatten_flux_state_dict(params: Params, cfg) -> Dict[str, np.ndarray]:
    out = _Out()
    out.lin("x_embedder", params["x_embedder"])
    out.lin("context_embedder", params["context_embedder"])
    tte = params["time_text_embed"]
    out.mlp("time_text_embed.timestep_embedder", tte["timestep_embedder"])
    out.mlp("time_text_embed.text_embedder", tte["text_embedder"])
    if "guidance_embedder" in tte:
        out.mlp("time_text_embed.guidance_embedder", tte["guidance_embedder"])
    for i, bp in enumerate(_unstack(params["dual_blocks"])):
        pre = f"transformer_blocks.{i}"
        out.lin(f"{pre}.norm1.linear", bp["norm1"]["linear"])
        out.lin(f"{pre}.norm1_context.linear", bp["norm1_context"]["linear"])
        _mmdit_attn(out, f"{pre}.attn", bp["attn"], added=True, pre_only=False)
        out.ff(f"{pre}.ff", bp["ff"])
        out.ff(f"{pre}.ff_context", bp["ff_context"])
    for i, bp in enumerate(_unstack(params["single_blocks"])):
        pre = f"single_transformer_blocks.{i}"
        out.lin(f"{pre}.norm.linear", bp["norm"]["linear"])
        out.lin(f"{pre}.proj_mlp", bp["proj_mlp"])
        out.lin(f"{pre}.proj_out", bp["proj_out"])
        _mmdit_attn(out, f"{pre}.attn", bp["attn"], added=False, pre_only=True)
    out.lin("norm_out.linear", params["norm_out"]["linear"])
    out.lin("proj_out", params["proj_out"])
    return dict(out)


# ---------------------------------------------------------------------------
# LTX-Video — inverse of models/ltx_video/transformer.py
# ---------------------------------------------------------------------------

def flatten_ltx_video_state_dict(params: Params, cfg) -> Dict[str, np.ndarray]:
    out = _Out()
    out.lin("proj_in", params["proj_in"])
    out.mlp("time_embed.emb.timestep_embedder", params["time_embed"])
    out.lin("time_embed.linear", params["time_linear"])
    out.mlp("caption_projection", params["caption_projection"])
    for i, bp in enumerate(_unstack(params["blocks"])):
        pre = f"transformer_blocks.{i}"
        for a in ("attn1", "attn2"):
            for sub in ("to_q", "to_k", "to_v"):
                out.lin(f"{pre}.{a}.{sub}", bp[a][sub])
            out.lin(f"{pre}.{a}.to_out.0", bp[a]["to_out"])
            out.rms(f"{pre}.{a}.norm_q", bp[a]["norm_q"])
            out.rms(f"{pre}.{a}.norm_k", bp[a]["norm_k"])
        out.ff(f"{pre}.ff", bp["ff"])
        out[f"{pre}.scale_shift_table"] = _np(bp["scale_shift_table"])
    out["scale_shift_table"] = _np(params["scale_shift_table"])
    out.lin("proj_out", params["proj_out"])
    return dict(out)


# ---------------------------------------------------------------------------
# CogView4 — inverse of models/cogview4/transformer.py
# ---------------------------------------------------------------------------

def flatten_cogview4_state_dict(params: Params, cfg) -> Dict[str, np.ndarray]:
    out = _Out()
    out.lin("patch_embed.proj", params["patch_embed"]["proj"])
    out.lin("patch_embed.text_proj", params["patch_embed"]["text_proj"])
    tce = params["time_condition_embed"]
    out.mlp("time_condition_embed.timestep_embedder", tce["timestep_embedder"])
    out.mlp("time_condition_embed.condition_embedder", tce["condition_embedder"])
    for i, bp in enumerate(_unstack(params["blocks"])):
        pre = f"transformer_blocks.{i}"
        out.lin(f"{pre}.norm1.linear", bp["norm1"]["linear"])
        for sub in ("to_q", "to_k", "to_v"):
            out.lin(f"{pre}.attn1.{sub}", bp["attn1"][sub])
        out.lin(f"{pre}.attn1.to_out.0", bp["attn1"]["to_out"])
        out.ff(f"{pre}.ff", bp["ff"])
    out.lin("norm_out.linear", params["norm_out"]["linear"])
    out.lin("proj_out", params["proj_out"])
    return dict(out)


# ---------------------------------------------------------------------------
# HunyuanVideo — inverse of models/hunyuan_video/transformer.py
# ---------------------------------------------------------------------------

def flatten_hunyuan_video_state_dict(params: Params, cfg) -> Dict[str, np.ndarray]:
    out = _Out()
    k = _np(params["x_embedder"]["kernel"]).T  # [D, C*pt*p*p]
    pt, p_, _ = (cfg.patch_size_t, cfg.patch_size, cfg.patch_size)
    out["x_embedder.proj.weight"] = k.reshape(k.shape[0], -1, pt, p_, p_)
    out["x_embedder.proj.bias"] = _np(params["x_embedder"]["bias"])

    ce = params["context_embedder"]
    out.mlp("context_embedder.time_text_embed.timestep_embedder",
            ce["time_text_embed"]["timestep_embedder"])
    out.mlp("context_embedder.time_text_embed.text_embedder",
            ce["time_text_embed"]["text_embedder"])
    out.lin("context_embedder.proj_in", ce["proj_in"])
    for i, bp in enumerate(_unstack(ce["refiner_blocks"])):
        pre = f"context_embedder.token_refiner.refiner_blocks.{i}"
        out.ln(f"{pre}.norm1", bp["norm1"])
        for sub in ("to_q", "to_k", "to_v"):
            out.lin(f"{pre}.attn.{sub}", bp["attn"][sub])
        out.lin(f"{pre}.attn.to_out.0", bp["attn"]["to_out"])
        out.ln(f"{pre}.norm2", bp["norm2"])
        out.ff(f"{pre}.ff", bp["ff"])
        out.lin(f"{pre}.norm_out.linear", bp["norm_out"]["linear"])

    tte = params["time_text_embed"]
    out.mlp("time_text_embed.timestep_embedder", tte["timestep_embedder"])
    out.mlp("time_text_embed.text_embedder", tte["text_embedder"])
    if "guidance_embedder" in tte:
        out.mlp("time_text_embed.guidance_embedder", tte["guidance_embedder"])

    for i, bp in enumerate(_unstack(params["dual_blocks"])):
        pre = f"transformer_blocks.{i}"
        out.lin(f"{pre}.norm1.linear", bp["norm1"]["linear"])
        out.lin(f"{pre}.norm1_context.linear", bp["norm1_context"]["linear"])
        _mmdit_attn(out, f"{pre}.attn", bp["attn"], added=True, pre_only=False)
        out.ff(f"{pre}.ff", bp["ff"])
        out.ff(f"{pre}.ff_context", bp["ff_context"])
    for i, bp in enumerate(_unstack(params["single_blocks"])):
        pre = f"single_transformer_blocks.{i}"
        out.lin(f"{pre}.norm.linear", bp["norm"]["linear"])
        out.lin(f"{pre}.proj_mlp", bp["proj_mlp"])
        out.lin(f"{pre}.proj_out", bp["proj_out"])
        _mmdit_attn(out, f"{pre}.attn", bp["attn"], added=False, pre_only=True)
    out.lin("norm_out.linear", params["norm_out"]["linear"])
    out.lin("proj_out", params["proj_out"])
    return dict(out)


# config-class-name -> flattener (checkpoint.export_safetensors dispatch)
FLATTENERS = {
    "WanMOTConfig": None,  # resolved below: MoT vs plain by param keys
    "FluxConfig": flatten_flux_state_dict,
    "LTXVideoConfig": flatten_ltx_video_state_dict,
    "CogView4Config": flatten_cogview4_state_dict,
    "HunyuanVideoConfig": flatten_hunyuan_video_state_dict,
}


def flatten_for_config(params: Params, cfg) -> Dict[str, np.ndarray]:
    name = type(cfg).__name__
    if name == "WanMOTConfig":
        fn = (flatten_wan_mot_state_dict if "patch_embedding_mot_ref" in params
              else flatten_wan_state_dict)
        return fn(params, cfg)
    fn = FLATTENERS.get(name)
    if fn is None:
        raise ValueError(f"no export flattener for config type {name}")
    return fn(params, cfg)
