"""Dynamic Degree + Motion Smoothness — the two flow-based headline metrics.

The reference's results table (reference README.md:73-81) reports
Dynamic Degree 77.08 and Motion Smoothness 98.59, produced externally by
VBench. This module is the in-framework equivalent, built on the JAX RAFT
encoder (vap_tpu/eval/raft.py, raft-things checkpoint).

Dynamic Degree (VBench `dynamic_degree` semantics, re-derived):
  * frames are sampled to ~8 fps (interval = round(fps / 8), floored at 1);
  * per consecutive pair, RAFT flow -> score = mean of the top 5% flow
    magnitudes;
  * a video is "dynamic" when at least `count_num` pair scores exceed
    `thres`, with thres = 6.0 * min(H, W) / 256 and
    count_num = round(4 * n_sampled / 16) (floored at 1 — VBench leaves very
    short clips with count_num 0, i.e. trivially dynamic; we don't);
  * the set-level Dynamic Degree is the fraction of dynamic videos x100.

Motion Smoothness: VBench drops the odd frames and measures how well the
AMT-S frame interpolator reconstructs them from the even ones
(score = 1 - MAE/255). AMT's checkpoints are torch-only and not available
offline, so this uses the documented-equivalent flow-based midpoint
interpolator: for even frames (e0, e1) with bidirectional RAFT flow f01/f10,
the dropped middle frame is reconstructed first-order as

    m(x) = 0.5 * e0(x - 0.5*f01(x)) + 0.5 * e1(x - 0.5*f10(x))

(backward warp with border clamping; occlusion-naive) and scored with the
same 1 - MAE/255 normalization. Absolute values differ slightly from AMT's
learned interpolator; the ranking it induces — jitter and temporal
inconsistency raise interpolation error — is the same signal.

TPU notes: all frame pairs of a video batch into ONE jitted raft_flow call
(frames ride the MXU together); shapes bucket per (n_pairs, H, W) so repeat
resolutions reuse the compiled graph.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .raft import RAFTConfig, pad_to_multiple_of_8, raft_flow, unpad

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# VBench dynamic-degree scoring rules
# ---------------------------------------------------------------------------

def sample_interval(fps: float, target_fps: float = 8.0) -> int:
    return max(1, int(round(fps / target_fps)))


def dynamic_params(height: int, width: int, n_sampled: int) -> Dict[str, float]:
    return {"thres": 6.0 * min(height, width) / 256.0,
            "count_num": max(1, round(4 * n_sampled / 16.0))}


def top5_flow_magnitude(flow: np.ndarray) -> float:
    """flow [H, W, 2] -> mean of the top 5% magnitudes (>= 1 element)."""
    rad = np.sqrt(np.square(flow[..., 0]) + np.square(flow[..., 1]))
    k = max(1, int(rad.size * 0.05))
    return float(np.mean(np.sort(rad, axis=None)[-k:]))


def is_dynamic(pair_scores: Sequence[float], thres: float, count_num: float) -> bool:
    return sum(1 for s in pair_scores if s > thres) >= count_num


# ---------------------------------------------------------------------------
# flow-based midpoint interpolation (motion smoothness)
# ---------------------------------------------------------------------------

def backward_warp(img: Array, flow: Array) -> Array:
    """img [B, H, W, C], flow [B, H, W, 2] (x, y) -> img sampled at
    x + flow(x), bilinear, border-clamped (edge pixels extend outward so
    frame borders don't read as interpolation error)."""
    b, h, w, c = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    x = jnp.clip(xs[None] + flow[..., 0], 0.0, w - 1.0)
    y = jnp.clip(ys[None] + flow[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    out = jnp.zeros_like(img, dtype=jnp.float32)
    flat = img.reshape(b, h * w, c).astype(jnp.float32)
    for dy in (0.0, 1.0):
        for dx in (0.0, 1.0):
            xi, yi = x0 + dx, y0 + dy
            # weights from the UNclipped corner (a clipped corner at the
            # border would double-count), indices from the clipped one
            wgt = jnp.maximum(1.0 - jnp.abs(x - xi), 0.0) * \
                jnp.maximum(1.0 - jnp.abs(y - yi), 0.0)
            idx = (jnp.clip(yi, 0, h - 1) * w +
                   jnp.clip(xi, 0, w - 1)).astype(jnp.int32).reshape(b, h * w, 1)
            val = jnp.take_along_axis(flat, jnp.broadcast_to(idx, (b, h * w, c)), axis=1)
            out = out + wgt[..., None] * val.reshape(b, h, w, c)
    return out


def interpolate_midpoint(e0: Array, e1: Array, f01: Array, f10: Array) -> Array:
    """First-order flow-based midpoint of frame pair (e0, e1): average of the
    two backward warps along half the respective forward flows."""
    return 0.5 * (backward_warp(e0, -0.5 * f01) + backward_warp(e1, -0.5 * f10))


# ---------------------------------------------------------------------------
# scorer
# ---------------------------------------------------------------------------

def _to_255(frames: np.ndarray) -> np.ndarray:
    """uint8 [0,255] or float [0,1] RGB frames -> float32 [0,255] (the range
    RAFT normalizes internally) — same input contract as CLIPScorer.

    The float range check tolerates mild overshoot (threshold 2.0, not
    1+eps): unclamped VAE decodes routinely emit values like 1.02, and
    misreading such a [0,1] video as [0,255] would feed RAFT near-black
    pixels and silently zero both flow metrics. A genuine [0,255] video
    with max < 2 is black to RAFT either way. Output is clamped to the
    valid range."""
    frames = np.asarray(frames)
    if frames.dtype != np.uint8 and float(frames.max(initial=0.0)) <= 2.0:
        frames = frames * 255.0
    return np.clip(frames.astype(np.float32), 0.0, 255.0)


class FlowMetrics:
    """Bundled RAFT params + jitted, shape-bucketed flow for the two
    flow-based metrics. Loads next to CLIPScorer in scripts/clip_score.py,
    the *_vap_bench.py scripts, the inference CLI and trainer validation."""

    def __init__(self, params, cfg: RAFTConfig = None, iters: int = None):
        self.params = params
        self.cfg = cfg or RAFTConfig.things()
        self.iters = self.cfg.iters if iters is None else iters
        self._flow = jax.jit(
            lambda a, b: raft_flow(self.params, self.cfg, a, b, iters=self.iters))

    @classmethod
    def from_pretrained(cls, checkpoint_path: str, iters: int = None) -> "FlowMetrics":
        """Load a princeton-vl/RAFT .pth checkpoint (raft-things.pth — the
        one VBench uses; DataParallel prefix tolerated). The architecture is
        inferred from the weight shapes (RAFTConfig.from_state_dict)."""
        import torch

        from .raft import convert_raft_state_dict

        sd = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
        cfg = RAFTConfig.from_state_dict(sd)
        return cls(convert_raft_state_dict(sd, cfg), cfg, iters=iters)

    def pair_flows(self, frames: np.ndarray) -> np.ndarray:
        """uint8/float RGB [F, H, W, 3] -> flow between consecutive frames
        [F-1, H, W, 2], one batched jit call."""
        frames = np.asarray(frames, np.float32)
        if frames.shape[0] < 2:
            raise ValueError("need at least 2 frames for flow")
        padded, pads = pad_to_multiple_of_8(frames)
        flow = self._flow(jnp.asarray(padded[:-1]), jnp.asarray(padded[1:]))
        return unpad(np.asarray(flow), pads)

    # -- dynamic degree ------------------------------------------------------

    def dynamic_degree_video(self, frames: np.ndarray, fps: float) -> Dict[str, object]:
        """One video -> {"dynamic": bool, "pair_scores", "thres", "count_num"}."""
        frames = _to_255(frames)
        sampled = frames[::sample_interval(fps)]
        if sampled.shape[0] < 2:
            sampled = frames[:2]
        h, w = sampled.shape[1:3]
        params = dynamic_params(h, w, sampled.shape[0])
        scores = [top5_flow_magnitude(f) for f in self.pair_flows(sampled)]
        return {"dynamic": is_dynamic(scores, params["thres"], params["count_num"]),
                "pair_scores": scores, **params}

    # -- motion smoothness ---------------------------------------------------

    def motion_smoothness_video(self, frames: np.ndarray) -> float:
        """One video -> [0, 1] smoothness = 1 - MAE(reconstructed odd frames,
        real odd frames)/255. Needs >= 3 frames."""
        frames = _to_255(frames)
        even, odd = frames[::2], frames[1::2]
        n = min(even.shape[0] - 1, odd.shape[0])
        if n < 1:
            raise ValueError("need >= 3 frames for motion smoothness")
        e0, e1, gt = even[:n], even[1:n + 1], odd[:n]
        (p0, pads), (p1, _) = pad_to_multiple_of_8(e0), pad_to_multiple_of_8(e1)
        f01 = self._flow(jnp.asarray(p0), jnp.asarray(p1))
        f10 = self._flow(jnp.asarray(p1), jnp.asarray(p0))
        mid = interpolate_midpoint(jnp.asarray(p0), jnp.asarray(p1), f01, f10)
        mid = unpad(np.asarray(mid), pads)
        mae = float(np.mean(np.abs(mid - gt)))
        return 1.0 - mae / 255.0


def dynamic_degree_set(flags: Sequence[bool]) -> float:
    """Set-level Dynamic Degree: percentage of dynamic videos (the table's
    77.08 is this number)."""
    return 100.0 * float(np.mean([bool(f) for f in flags])) if len(flags) else 0.0
