"""Training-free denoise-step caching (the PAB / AdaCache / TeaCache family).

Across adjacent diffusion timesteps the transformer's output changes slowly
through the middle of the trajectory (Pyramid Attention Broadcast,
arXiv:2408.12588; Adaptive Caching, arXiv:2411.02397). Caching the raw
CFG-batch model output and reusing it on scheduled steps skips entire
transformer forwards — the scheduler still advances every step, and CFG is
recombined per-step with that step's own (possibly dynamic) guidance scale,
so only the model output is approximated, never the trajectory mechanics.

Unlike per-block attention caching (PAB proper), caching the MODEL OUTPUT
costs one latent-sized buffer (~10 MB at 480p) instead of 42 blocks of
35k-token attention outputs (~18 GB — does not fit a 16 GB v5e), while
capturing the same skip structure at the coarsest granularity.

Schedule specs:

- "uniform:N[:warmup[:cooldown]]" — compute the forward on the first
  `warmup` steps (default 5), the last `cooldown` steps (default 5), and
  every Nth step in between; reuse the cached output otherwise. N=1 disables
  skipping.
- "adaptive:THRESH[:warmup[:cooldown]]" — TeaCache-style (arXiv:2411.19108)
  runtime schedule: accumulate the relative L1 change of the denoise input
  latents since the last computed step and recompute once it reaches THRESH
  (warmup/cooldown steps always compute). Unlike TeaCache we use the raw
  input distance, not a model-fitted polynomial rescaling — THRESH is a
  per-checkpoint knob (~0.05 conservative … 0.3 aggressive). THRESH=0
  computes every step. The decision runs inside the jitted scan
  (`lax.cond`), so skipped steps cost no model FLOPs and the number of
  computed steps is content-dependent.

Quality is content-dependent either way: this is an opt-in accelerator, OFF
by default everywhere, and should be validated per-checkpoint with
scripts/clip_score.py against an uncached run.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class StepCacheSpec:
    kind: str          # "uniform" | "adaptive"
    # uniform: the compute mask. adaptive: the FORCED mask (warmup/cooldown
    # steps that always compute); in-between steps decide at runtime.
    mask: np.ndarray
    thresh: float = 0.0  # adaptive only


def parse_step_cache(spec: Optional[str], num_steps: int) -> Optional[StepCacheSpec]:
    """spec string -> StepCacheSpec, or None when spec is None/'none'."""
    if spec is None or spec == "none":
        return None
    parts = spec.split(":")
    if parts[0] == "uniform":
        return StepCacheSpec("uniform", parse_step_cache_schedule(spec, num_steps))
    if parts[0] != "adaptive" or len(parts) < 2 or len(parts) > 4:
        raise ValueError(
            f"unknown step_cache spec {spec!r}; expected "
            "'uniform:N[:warmup[:cooldown]]' or 'adaptive:THRESH[:warmup[:cooldown]]'")
    thresh = float(parts[1])
    warmup = int(parts[2]) if len(parts) > 2 else 5
    cooldown = int(parts[3]) if len(parts) > 3 else 5
    if thresh < 0 or warmup < 1 or cooldown < 0:
        raise ValueError(
            f"invalid step_cache spec {spec!r}: need THRESH>=0, warmup>=1, cooldown>=0")
    if num_steps < 1:
        raise ValueError(f"step_cache needs num_inference_steps >= 1 (got {num_steps})")
    idx = np.arange(num_steps)
    forced = (idx < warmup) | (idx >= num_steps - cooldown)
    forced[0] = True
    return StepCacheSpec("adaptive", forced, thresh)


def parse_step_cache_schedule(spec: Optional[str], num_steps: int) -> Optional[np.ndarray]:
    """UNIFORM spec -> bool[num_steps] compute mask (True = run the
    transformer), or None when spec is None/'none'. Step 0 is always computed
    (nothing cached yet); the parser guarantees it. Adaptive specs have no
    static mask — use parse_step_cache for those."""
    if spec is None or spec == "none":
        return None
    parts = spec.split(":")
    if parts[0] == "adaptive":
        raise ValueError(
            f"step_cache spec {spec!r} has no static schedule (the computed "
            "steps are decided at runtime); use parse_step_cache")
    if parts[0] != "uniform" or len(parts) < 2 or len(parts) > 4:
        raise ValueError(
            f"unknown step_cache spec {spec!r}; expected 'uniform:N[:warmup[:cooldown]]'"
            " or 'adaptive:THRESH[:warmup[:cooldown]]'")
    n = int(parts[1])
    warmup = int(parts[2]) if len(parts) > 2 else 5
    cooldown = int(parts[3]) if len(parts) > 3 else 5
    if n < 1 or warmup < 1 or cooldown < 0:
        raise ValueError(f"invalid step_cache spec {spec!r}: need N>=1, warmup>=1, cooldown>=0")
    if num_steps < 1:
        raise ValueError(f"step_cache needs num_inference_steps >= 1 (got {num_steps})")
    idx = np.arange(num_steps)
    mask = (idx < warmup) | (idx >= num_steps - cooldown) | ((idx - warmup) % n == 0)
    mask[0] = True
    return mask
