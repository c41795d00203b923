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

Schedule spec: "uniform:N[:warmup[:cooldown]]" — compute the forward on the
first `warmup` steps (default 5), the last `cooldown` steps (default 5), and
every Nth step in between; reuse the cached output otherwise. N=1 disables
skipping. Quality is content-dependent: this is an opt-in accelerator, OFF
by default everywhere, and should be validated per-checkpoint with
scripts/clip_score.py against an uncached run.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def parse_step_cache_schedule(spec: Optional[str], num_steps: int) -> Optional[np.ndarray]:
    """spec -> bool[num_steps] compute mask (True = run the transformer), or
    None when spec is None/'none'. Step 0 is always computed (nothing cached
    yet); the parser guarantees it."""
    if spec is None or spec == "none":
        return None
    parts = spec.split(":")
    if parts[0] != "uniform" or len(parts) < 2 or len(parts) > 4:
        raise ValueError(
            f"unknown step_cache spec {spec!r}; expected 'uniform:N[:warmup[:cooldown]]'")
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
