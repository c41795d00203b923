"""LoRA adapters over param-pytree kernels.

Replaces the reference's PEFT LoRA on the transformer (BASELINE config: LoRA
on the MoT expert; reference save path embeds lora_config metadata —
trainer.py:390-441). Functional design: an adapter tree holds (A, B) factors
for selected 2-D kernels (including stacked [L, in, out] block leaves);
`apply_lora` merges them into the base params inside the jitted step, so the
forward code is unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("to_q", "to_k", "to_v", "to_out", "net_0", "net_2")


def _is_target(path, leaf, targets, mot_only: bool) -> bool:
    names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
    if names[-1] != "kernel" or leaf.ndim < 2:
        return False
    parent = names[-2] if len(names) >= 2 else ""
    if parent not in targets:
        return False
    if mot_only:
        return any("_mot_ref" in n for n in names)
    return True


def init_lora(key, params, rank: int = 64, targets=DEFAULT_TARGETS, mot_only: bool = True,
              dtype=jnp.float32) -> Dict[str, Any]:
    """Adapter tree with the same structure as `params`: matching kernels get
    {"A": [..., in, r], "B": [..., r, out]}, everything else None."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    counter = [0]

    def make(path, leaf):
        if not _is_target(path, leaf, targets, mot_only):
            return None
        counter[0] += 1
        k = jax.random.fold_in(key, counter[0])
        *lead, fan_in, fan_out = leaf.shape
        a = jax.random.normal(k, (*lead, fan_in, rank), dtype) * (fan_in ** -0.5)
        b = jnp.zeros((*lead, rank, fan_out), dtype)
        return {"A": a, "B": b}

    return jax.tree_util.tree_map_with_path(
        make, params, is_leaf=lambda x: hasattr(x, "ndim"))


def _non_storage_dtype(params):
    """Compute dtype of a tree that may hold float8 STORAGE leaves
    (training/layerwise.py): the first floating non-f8 leaf's dtype.
    `cast_layerwise_storage` refuses to cast every floating leaf, so a tree it
    produced always keeps at least one leaf (norm scales under the default
    skip patterns) in the dtype it was loaded in; the bf16 fallback only
    covers hand-built all-f8 trees."""
    from .layerwise import FLOAT8_DTYPES

    for x in jax.tree_util.tree_leaves(params):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) \
                and jnp.dtype(x.dtype) not in FLOAT8_DTYPES:
            return x.dtype
    return jnp.bfloat16


def apply_lora(params, lora, alpha: float = 64.0, rank: int = 64):
    """Merged params: kernel + (alpha/rank) * A @ B (batched over stacked leading
    dims). float8 storage leaves (--layerwise_upcasting) are upcast to the
    tree's compute dtype here, inside the jitted step — the merged buffers are
    transient, so the resident tree stays at half size."""
    from .layerwise import FLOAT8_DTYPES

    scale = alpha / rank
    compute = _non_storage_dtype(params)

    def merge(p, l):
        if jnp.dtype(p.dtype) in FLOAT8_DTYPES:
            p = p.astype(compute)
        if l is None:
            return p
        delta = jnp.einsum("...ir,...ro->...io", l["A"], l["B"]) * scale
        return p + delta.astype(p.dtype)

    # params' array leaves line up with lora's {"A","B"}|None subtrees: tree_map
    # passes each leaf's corresponding lora subtree whole (tree-prefix rule).
    return jax.tree.map(merge, params, lora)


def lora_param_count(lora) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(lora))


def merge_lora_into_params(params, lora, alpha: float = 64.0, rank: int = 64):
    """Bake adapters into the base weights (for export)."""
    return apply_lora(params, lora, alpha, rank)
