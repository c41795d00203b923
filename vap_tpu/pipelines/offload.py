"""Module-level parameter offload for inference pipelines.

TPU-native equivalent of the reference's inference memory optimization
(reference README.md:202-260: `pipe.enable_model_cpu_offload()` /
`enable_sequential_cpu_offload()`, which drop CogVideoX from 40 GB to
~7.5 GB on A100). On a 16 GB v5e the FULL bf16 component set does not fit
either (T5-XXL ~9.1 GB + 5B transformer ~10.8 GB + VAE), so with offload
enabled the pipeline keeps `params` as HOST arrays and stages exactly ONE
component into device HBM at a time: text encoder -> VAE (image/ref
encode) -> transformer (the scanned denoise loop) -> VAE (decode). The
peak becomes the largest single component instead of the sum.

The reference's *sequential* (per-layer) offload tier — CogVideoX ~7.5 GB,
Wan ~8 GB — is covered by `pipelines/streamed.py`: the block stack streams
through HBM in double-buffered chunks during the denoise
(`offload_blocks_chunk`), which is what lets Wan-14B run at bf16 on a
single 16 GB v5e. For merely-tight (not overflowing) budgets, prefer W8A8
storage (`quantize_*_transformer`, halves the transformer) composed with
this module-level staging — it costs no extra weight traffic.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax


def stage_component(params: Dict[str, Any], name: str,
                    slot: List[Tuple[str, Any]]) -> Any:
    """Return a device-resident copy of ``params[name]``, keeping at most one
    staged component alive in ``slot`` (a 0/1-element list owned by the
    pipeline). Staging a different component first CLEARS the slot so XLA
    frees the previous component's HBM before the new `device_put`
    allocates."""
    if slot and slot[0][0] == name:
        return slot[0][1]
    slot.clear()
    staged = jax.device_put(params[name])
    slot.append((name, staged))
    return staged
