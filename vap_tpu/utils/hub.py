"""Hub-aware checkpoint resolution.

The reference loads every component by hub id with revision/variant/cache_dir
(finetrainers/models/cogvideox/base_specification.py:307+, diffusers
from_pretrained semantics). This box has zero egress, so the JAX analog
resolves hub ids strictly against the local huggingface_hub cache
(`local_files_only=True`) and reports a clear error when the snapshot is not
cached. Local directory paths pass through untouched, so offline-only users
never need the hub machinery.
"""

from __future__ import annotations

import os
from typing import List, Optional


def resolve_model_dir(path_or_id: str, revision: Optional[str] = None,
                      cache_dir: Optional[str] = None) -> str:
    """A local directory path -> itself; anything else is treated as a hub
    repo id and resolved from the local huggingface_hub snapshot cache
    (never the network)."""
    if os.path.isdir(path_or_id):
        return path_or_id
    try:
        from huggingface_hub import snapshot_download

        return snapshot_download(path_or_id, revision=revision,
                                 cache_dir=cache_dir, local_files_only=True)
    except Exception as e:  # not cached / malformed id / hub unavailable
        raise FileNotFoundError(
            f"{path_or_id!r} is not a local directory and is not in the local "
            f"huggingface cache (revision={revision!r}, cache_dir={cache_dir!r}). "
            f"Download it on a connected machine first: {e}") from e


def variant_weight_files(directory: str, variant: Optional[str] = None,
                         suffix: str = ".safetensors") -> List[str]:
    """Weight files under `directory`, honoring diffusers variant naming:
    with variant 'fp16', `model.fp16.safetensors` is preferred and the
    non-variant `model.safetensors` is used only when no variant file
    exists (diffusers from_pretrained variant semantics)."""
    names = sorted(f for f in os.listdir(directory) if f.endswith(suffix))
    if not names:
        raise FileNotFoundError(f"no {suffix} weight files under {directory}")
    if variant:
        # 'model.fp16.safetensors' / sharded 'model.fp16-00001-of-00002.safetensors'
        tagged = [f for f in names if f".{variant}{suffix}" in f
                  or f".{variant}-" in f]
        if tagged:
            return [os.path.join(directory, f) for f in tagged]
    # untagged stems ('model', 'model-00001-of-00002') contain no dot
    untagged = [f for f in names if "." not in f[: -len(suffix)]]
    if untagged:
        return [os.path.join(directory, f) for f in untagged]
    # variant-only directory: falling back to ALL files would merge weights
    # of different variants (last-write-wins) — only safe when a single
    # variant tag is present
    tags = {f[: -len(suffix)].split(".")[1].split("-")[0] for f in names}
    if len(tags) > 1:
        raise FileNotFoundError(
            f"{directory} holds only variant-tagged weights for multiple "
            f"variants {sorted(tags)}; pass variant= to pick one")
    return [os.path.join(directory, f) for f in names]


def component_config_kwargs(cfg_cls, directory: Optional[str]) -> dict:
    """Read a component dir's config.json and keep only keys that are fields
    of cfg_cls (diffusers config files carry extra HF metadata), tuplifying
    lists so frozen dataclass configs stay hashable. Lets real checkpoints
    override the released-config defaults (e.g. block_idx_with_mot_ref,
    use_learned_positional_embeddings) instead of trusting hardcoded values."""
    import dataclasses
    import json

    if not directory:
        return {}
    path = os.path.join(directory, "config.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        raw = json.load(f)
    names = {f.name for f in dataclasses.fields(cfg_cls)}

    def tuplify(v):
        return tuple(v) if isinstance(v, list) else v

    return {k: tuplify(v) for k, v in raw.items() if k in names}
