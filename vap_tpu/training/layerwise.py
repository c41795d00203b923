"""Layerwise upcasting: float8 STORAGE for frozen weights.

Reference: --layerwise_upcasting_modules / _storage_dtype /
_skip_modules_pattern (finetrainers/args.py:406-409, :759) apply diffusers'
`apply_layerwise_casting` to the frozen transformer in LoRA training
(finetrainers/trainer/sft_trainer/trainer.py:184-190): parameters of leaf
modules not matching the skip patterns are stored in float8 and upcast to the
compute dtype at use, roughly halving the frozen base's resident memory.

TPU analog: cast matching param-tree leaves to float8_e4m3fn / float8_e5m2
(storage-only dtypes — v5e has no fp8 MXU, exactly like the pre-Hopper CUDA
devices the reference feature targets). `apply_lora` (training/lora.py)
upcasts them back to the surrounding compute dtype inside the jitted step, so
only transient per-step buffers pay the bf16 cost while the resident tree
stays half-size.
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
import jax.numpy as jnp

# reference finetrainers/args.py:409
DEFAULT_SKIP_PATTERNS = (
    "patch_embed", "pos_embed", "x_embedder", "context_embedder",
    "time_embed", r"^proj_in$", r"^proj_out$", "norm",
)

STORAGE_DTYPES = {
    "float8_e4m3fn": jnp.float8_e4m3fn,
    "float8_e5m2": jnp.float8_e5m2,
}

FLOAT8_DTYPES = tuple(jnp.dtype(d) for d in STORAGE_DTYPES.values())


def cast_layerwise_storage(params, storage_dtype="float8_e4m3fn",
                           skip_patterns: Sequence[str] = DEFAULT_SKIP_PATTERNS):
    """Cast floating param leaves to a float8 storage dtype, except leaves
    under a module whose fully-qualified dotted name matches any skip pattern.

    Matching mirrors diffusers' apply_layerwise_casting: during recursion every
    module's dotted fqn ("blocks.0.ff.net_0") is re.search'd against the
    patterns and a match skips the whole subtree — so reference-style dotted
    patterns like "ff.net" work, and anchored ones ("^proj_out$") only hit
    top-level modules. The leaf's own param name ("kernel"/"bias") is not a
    module and is excluded from matching.

    Raises if the patterns end up skipping nothing: the feature's contract is
    that norms/embeddings stay in the load dtype (that surviving dtype is also
    how `apply_lora` recovers the compute dtype), so casting every leaf is
    always a mis-configuration, not a valid request."""
    dt = STORAGE_DTYPES[storage_dtype] if isinstance(storage_dtype, str) else storage_dtype
    pats = [re.compile(p) for p in skip_patterns if p]
    counts = [0, 0]  # cast, skipped

    def cast(path, leaf):
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf
        names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        mods = names[:-1] if len(names) > 1 else names
        fqns = [".".join(mods[: i + 1]) for i in range(len(mods))]
        if any(p.search(f) for f in fqns for p in pats):
            counts[1] += 1
            return leaf
        counts[0] += 1
        return leaf.astype(dt)

    out = jax.tree_util.tree_map_with_path(cast, params)
    if counts[0] and not counts[1]:
        raise ValueError(
            "layerwise_upcasting skip patterns matched no module: every "
            f"floating leaf would be stored as {storage_dtype} and the tree's "
            "compute dtype would be unrecoverable. Check "
            f"--layerwise_upcasting_skip_modules_pattern (got {list(skip_patterns)!r}).")
    return out
