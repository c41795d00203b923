"""Checkpoint / resume + exportable weights.

Two layers, mirroring the reference (SURVEY.md §5; finetrainers
PTDCheckpointer, parallel/ptd.py:309-440):
  (1) training state — params/optimizer/train-state/dataloader-state saved
      with orbax (async-capable, sharding-aware), step-numbered directories
      with a retention limit;
  (2) exportable weights — full (or LoRA) model weights written as
      safetensors in the HF reference layout so reference-ecosystem tools can
      load them (gather happens implicitly via orbax/host transfer).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


@dataclasses.dataclass
class TrainState:
    """Mirrors finetrainers TrainState (state.py:27-80)."""
    step: int = 0
    observed_data_samples: int = 0

    def to_dict(self):
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d):
        return cls(**{k: d[k] for k in ("step", "observed_data_samples") if k in d})


class Checkpointer:
    """orbax-backed checkpoint manager with retention limit and `latest` resume."""

    def __init__(self, directory: str, checkpointing_limit: Optional[int] = None, async_save: bool = True):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=checkpointing_limit,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self._dir, options=options)

    def _rank_state_dir(self, step: int) -> str:
        return os.path.join(self._dir, f"rank_state_{step}")

    def save(self, step: int, *, params, opt_state=None, train_state: Optional[TrainState] = None,
             dataloader_state: Optional[Dict[str, Any]] = None):
        import orbax.checkpoint as ocp

        items = {"params": ocp.args.StandardSave(params)}
        if opt_state is not None:
            items["opt_state"] = ocp.args.StandardSave(opt_state)
        meta = {}
        if train_state is not None:
            meta["train_state"] = train_state.to_dict()
        if dataloader_state is not None:
            if jax.process_count() > 1:
                # per-PROCESS stream state: orbax JsonSave writes only the
                # primary host's value, which would resume every rank from
                # rank 0's shard position (reference analog: DCP per-dp-rank
                # state keys, finetrainers data/dataloader.py:24-47). Each
                # process writes its own sidecar file instead.
                d = self._rank_state_dir(step)
                os.makedirs(d, exist_ok=True)
                with open(os.path.join(d, f"rank_{jax.process_index()}.json"), "w") as f:
                    json.dump(dataloader_state, f)
            else:
                meta["dataloader_state"] = dataloader_state
        if meta:
            items["meta"] = ocp.args.JsonSave(meta)
        self._mgr.save(step, args=ocp.args.Composite(**items))
        # prune rank-state sidecars for steps the manager dropped
        keep = set(self._mgr.all_steps()) | {step}
        import glob
        import shutil

        for d in glob.glob(os.path.join(self._dir, "rank_state_*")):
            try:
                if int(d.rsplit("_", 1)[1]) not in keep:
                    shutil.rmtree(d, ignore_errors=True)
            except ValueError:
                pass

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None, *, params_template=None, opt_state_template=None):
        import orbax.checkpoint as ocp

        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        items = {}
        if params_template is not None:
            items["params"] = ocp.args.StandardRestore(params_template)
        if opt_state_template is not None:
            items["opt_state"] = ocp.args.StandardRestore(opt_state_template)
        items["meta"] = ocp.args.JsonRestore()
        try:
            out = self._mgr.restore(step, args=ocp.args.Composite(**items))
        except Exception:
            out = self._mgr.restore(
                step, args=ocp.args.Composite(**{k: v for k, v in items.items() if k != "meta"}))
        result = {"step": step, "params": out.get("params"), "opt_state": out.get("opt_state")}
        meta = out.get("meta") or {}
        result["train_state"] = TrainState.from_dict(meta.get("train_state", {"step": step}))
        result["dataloader_state"] = meta.get("dataloader_state")
        rank_file = os.path.join(self._rank_state_dir(step),
                                 f"rank_{jax.process_index()}.json")
        if os.path.exists(rank_file):
            with open(rank_file) as f:
                result["dataloader_state"] = json.load(f)
        return result


# ---------------------------------------------------------------------------
# safetensors export in the HF reference layout
# ---------------------------------------------------------------------------

def _flatten_to_reference_names(params: Dict[str, Any], cfg) -> Dict[str, np.ndarray]:
    """Invert the weight converters: vap_tpu pytree -> {reference name: array}.

    Covers the CogVideoX MOT transformer layout (kernels transposed back to
    torch [out, in]; stacked block leaves unstacked per layer; the conv patch
    projection restored to [D, C, p, p])."""
    out: Dict[str, np.ndarray] = {}

    def lin(name, p):
        out[f"{name}.weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            out[f"{name}.bias"] = np.asarray(p["bias"])

    def ln(name, p):
        if p:
            out[f"{name}.weight"] = np.asarray(p["scale"])
            out[f"{name}.bias"] = np.asarray(p["bias"])

    def patch_embed(name, p):
        k = np.asarray(p["proj"]["kernel"]).T  # [D, C*p*p]
        if cfg.patch_size_t is None:
            k = k.reshape(k.shape[0], cfg.in_channels, cfg.patch_size, cfg.patch_size)
        out[f"{name}.proj.weight"] = k
        out[f"{name}.proj.bias"] = np.asarray(p["proj"]["bias"])
        lin(f"{name}.text_proj", p["text_proj"])
        if "pos_embedding" in p:
            out[f"{name}.pos_embedding"] = np.asarray(p["pos_embedding"])[None]

    def attn(name, p):
        for sub in ("to_q", "to_k", "to_v"):
            lin(f"{name}.{sub}", p[sub])
        lin(f"{name}.to_out.0", p["to_out"])
        ln(f"{name}.norm_q", p["norm_q"])
        ln(f"{name}.norm_k", p["norm_k"])

    def norm_zero(name, p):
        lin(f"{name}.linear", p["linear"])
        ln(f"{name}.norm", p["norm"])

    def ff(name, p):
        lin(f"{name}.net.0.proj", p["net_0"])
        lin(f"{name}.net.2", p["net_2"])

    patch_embed("patch_embed", params["patch_embed"])
    patch_embed("patch_embed_mot_ref", params["patch_embed_mot_ref"])
    for te in ("time_embedding", "time_embedding_mot_ref"):
        lin(f"{te}.linear_1", params[te]["linear_1"])
        lin(f"{te}.linear_2", params[te]["linear_2"])
    ln("norm_final", params["norm_final"])
    norm_zero("norm_out", params["norm_out"])
    lin("proj_out", params["proj_out"])
    if "norm_final_mot_ref" in params:
        ln("norm_final_mot_ref", params["norm_final_mot_ref"])
        norm_zero("norm_out_mot_ref", params["norm_out_mot_ref"])
        lin("proj_out_mot_ref", params["proj_out_mot_ref"])
    if "effect_embeddings" in params:
        for idx, t in enumerate(cfg.supported_effect_types):
            out[f"effect_embeddings.{t}"] = np.asarray(params["effect_embeddings"][idx]).reshape(1, 1, -1)
    if "ref_embeddings" in params:
        for idx in range(cfg.num_ref_embeddings):
            out[f"ref_embeddings.ref_{idx}"] = np.asarray(params["ref_embeddings"][idx]).reshape(1, 1, -1)

    for (start, length, has_mot), seg in zip(cfg.mot_segments, params["blocks"]):
        for li in range(length):
            bp = jax.tree.map(lambda x: x[li], seg)
            pre = f"transformer_blocks.{start + li}"
            norm_zero(f"{pre}.norm1", bp["norm1"])
            attn(f"{pre}.attn1", bp["attn1"])
            norm_zero(f"{pre}.norm2", bp["norm2"])
            ff(f"{pre}.ff", bp["ff"])
            if has_mot:
                norm_zero(f"{pre}.norm1_mot_ref", bp["norm1_mot_ref"])
                attn(f"{pre}.attn1_mot_ref", bp["attn1_mot_ref"])
                norm_zero(f"{pre}.norm2_mot_ref", bp["norm2_mot_ref"])
                ff(f"{pre}.ff_mot_ref", bp["ff_mot_ref"])
    return out


def export_safetensors(params: Dict[str, Any], cfg, path: str, metadata: Optional[Dict[str, str]] = None) -> str:
    """Write diffusers-format safetensors (cf. spec._save_model_videoasprompt_mot,
    cogvideox spec :940-956)."""
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    if type(cfg).__name__ == "CogVideoXMOTConfig":
        flat = _flatten_to_reference_names(params, cfg)
    else:
        from .export_flatten import flatten_for_config

        flat = flatten_for_config(params, cfg)
    flat = {k: np.ascontiguousarray(v) for k, v in flat.items()}
    save_file(flat, path, metadata=metadata or {"format": "pt"})
    return path


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load a safetensors state dict from a file, a sharded-index json, or a
    component directory (HF layout: model.safetensors or
    model.safetensors.index.json + shards), merging shards into one dict."""
    import json

    from safetensors.numpy import load_file

    if os.path.isdir(path):
        # transformers components ship model.safetensors; diffusers
        # components (transformer/vae) ship diffusion_pytorch_model.safetensors
        candidates = [
            "model.safetensors", "model.safetensors.index.json",
            "diffusion_pytorch_model.safetensors",
            "diffusion_pytorch_model.safetensors.index.json",
        ]
        for name in candidates:
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(f"no (sharded) safetensors under {path}")
    if path.endswith(".index.json"):
        with open(path) as f:
            shards = sorted(set(json.load(f)["weight_map"].values()))
        base = os.path.dirname(path)
        out: Dict[str, np.ndarray] = {}
        for shard in shards:
            out.update(load_file(os.path.join(base, shard)))
        return out
    return load_file(path)


_LORA_NAME_MAP = {"to_out": "to_out.0", "net_0": "net.0.proj", "net_2": "net.2"}


def export_lora_safetensors(
    lora: Dict[str, Any], cfg, path: str, *, rank: int, alpha: float,
    targets=None, metadata: Optional[Dict[str, str]] = None,
) -> str:
    """Write LoRA adapters as PEFT-layout safetensors with the lora config
    embedded in the header (the reference saves lora_config metadata alongside
    adapter weights — finetrainers/trainer/sft_trainer/trainer.py:390-441).

    Names follow the PEFT convention `transformer.<module>.lora_{A,B}.weight`
    with torch [out, in] orientation; stacked scan leaves are unstacked per
    transformer block."""
    from safetensors.numpy import save_file

    out: Dict[str, np.ndarray] = {}
    targets_seen = set()

    def add(name: str, short: str, node):
        targets_seen.add(short)
        out[f"transformer.{name}.lora_A.weight"] = np.ascontiguousarray(
            np.asarray(node["A"]).T)  # [r, in]
        out[f"transformer.{name}.lora_B.weight"] = np.ascontiguousarray(
            np.asarray(node["B"]).T)  # [out, r]

    def module(pre: str, sub: Dict[str, Any]):
        for key, val in sub.items():
            if not isinstance(val, dict) or ("A" in val and "B" in val):
                continue
            node = val.get("kernel")
            if isinstance(node, dict) and "A" in node:
                short = _LORA_NAME_MAP.get(key, key)
                add(f"{pre}.{short}", short, node)
            else:
                module(f"{pre}.{key}", val)

    # map stacked-scan block containers to HF module prefixes
    _BLOCK_PREFIX = {"blocks": "transformer_blocks",
                     "dual_blocks": "transformer_blocks",
                     "single_blocks": "single_transformer_blocks"}
    if hasattr(cfg, "mot_segments"):  # CogVideoX: segmented scan over blocks
        for (start, length, _), seg in zip(cfg.mot_segments, lora["blocks"]):
            for li in range(length):
                bp = jax.tree.map(lambda x: x[li], seg)
                module(f"transformer_blocks.{start + li}", bp)
    else:
        for key, prefix in _BLOCK_PREFIX.items():
            seg = lora.get(key)
            if seg is None or not jax.tree.leaves(seg):
                continue
            length = jax.tree.leaves(seg)[0].shape[0]
            for li in range(length):
                bp = jax.tree.map(lambda x: x[li], seg)
                module(f"{prefix}.{li}", bp)

    config = {
        "r": int(rank), "lora_alpha": float(alpha), "peft_type": "LORA",
        "target_modules": sorted(targets_seen),
    }
    meta = {"format": "pt", "lora_config": json.dumps(config)}
    meta.update(metadata or {})
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    save_file(out, path, metadata=meta)
    return path


def merge_lora_into_state_dict(sd: Dict[str, np.ndarray], lora_path: str,
                               scale: Optional[float] = None) -> Dict[str, np.ndarray]:
    """Fuse PEFT-layout LoRA adapters into an HF-layout transformer state
    dict (torch [out, in] orientation) BEFORE weight conversion — the JAX
    analog of the reference's pipe.load_lora_weights(...) + fuse at inference
    (reference examples/inference/inference.py loads adapters onto the torch
    transformer). Accepts this repo's export_lora_safetensors output or any
    diffusers-convention `transformer.<module>.lora_{A,B}.weight` file.

    `scale` defaults to lora_alpha / r from the embedded lora_config
    metadata (PEFT semantics), falling back to 1.0 when absent.
    """
    lora = load_safetensors(lora_path)
    if scale is None:
        meta = load_lora_metadata(lora_path)
        if "lora_alpha" in meta and "r" in meta:
            scale = float(meta["lora_alpha"]) / float(meta["r"])
        else:
            scale = 1.0
    out = dict(sd)
    merged = 0
    for key, a in lora.items():
        if not key.endswith(".lora_A.weight"):
            continue
        base = key[: -len(".lora_A.weight")]
        b = lora[base + ".lora_B.weight"]
        name = base[len("transformer."):] if base.startswith("transformer.") else base
        wkey = name + ".weight"
        if wkey not in out:
            raise KeyError(f"LoRA targets missing base weight {wkey!r} "
                           f"(from {lora_path})")
        w = np.asarray(out[wkey])
        delta = scale * (np.asarray(b, np.float32) @ np.asarray(a, np.float32))
        out[wkey] = (w.astype(np.float32) + delta).astype(w.dtype)
        merged += 1
    if merged == 0:
        raise ValueError(f"no '*.lora_A.weight' adapters found in {lora_path}")
    return out


def load_lora_metadata(path: str) -> Dict[str, Any]:
    """Read the embedded lora_config from a safetensors header."""
    import struct

    with open(path, "rb") as f:
        n = struct.unpack("<Q", f.read(8))[0]
        header = json.loads(f.read(n))
    meta = header.get("__metadata__", {})
    return json.loads(meta["lora_config"]) if "lora_config" in meta else {}
