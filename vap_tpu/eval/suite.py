"""VideoMetricsSuite — one object that produces the reference's full
five-metric results table (reference README.md:73-81):

    CLIP Score 24.13 | Motion Smoothness 98.59 | Dynamic Degree 77.08 |
    Aesthetic Quality 57.71 | Alignment Score 70.44

The reference repo ships no eval code (its table came from external VBench
tooling plus a GPT alignment judge); this suite is the in-framework
equivalent built entirely from this repo's own functional encoders:

  * clip_score / aesthetic_quality — CLIPScorer (clip_score.py + aesthetic.py)
  * motion_smoothness / dynamic_degree — FlowMetrics (RAFT, flow_metrics.py)
  * alignment_score — CLIPScorer.alignment_score (gen-vs-reference-video
    CLIP embedding alignment; documented analog of the GPT judge)

Each capability is optional: pass only the model paths you have and the
suite reports the metrics those enable. `summarize` aggregates per-video
dicts into the set-level table (dynamic degree is a set-level percentage,
everything else a mean).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .clip_score import METRIC_REFERENCES, CLIPScorer
from .flow_metrics import FlowMetrics, dynamic_degree_set


class VideoMetricsSuite:
    """Bundle of the metric scorers behind one `score_video` call.

    Construct directly from prebuilt scorers (tests) or with
    `from_pretrained(clip_model_path, aesthetic_path, raft_path)`.
    """

    def __init__(self, clip_scorer: Optional[CLIPScorer] = None,
                 flow_metrics: Optional[FlowMetrics] = None):
        if clip_scorer is None and flow_metrics is None:
            raise ValueError("VideoMetricsSuite needs at least one scorer")
        self.clip_scorer = clip_scorer
        self.flow_metrics = flow_metrics

    @classmethod
    def from_pretrained(cls, clip_model_path: Optional[str] = None,
                        aesthetic_path: Optional[str] = None,
                        raft_path: Optional[str] = None,
                        raft_iters: Optional[int] = None) -> "VideoMetricsSuite":
        scorer = (CLIPScorer.from_pretrained(clip_model_path, aesthetic_path)
                  if clip_model_path else None)
        flow = (FlowMetrics.from_pretrained(raft_path, iters=raft_iters)
                if raft_path else None)
        return cls(scorer, flow)

    def score_video(self, frames: np.ndarray, caption: Optional[str] = None,
                    fps: float = 16.0,
                    ref_frames: Optional[np.ndarray] = None) -> Dict[str, object]:
        """One generated video -> whichever of the five metrics the loaded
        scorers (and provided caption / reference video) enable.

        frames / ref_frames: uint8 [0,255] or float [0,1] RGB [F, H, W, 3].
        Flow metrics need >= 3 frames; videos shorter than that simply omit
        them. `dynamic` is the per-video boolean — the table's Dynamic Degree
        is the set-level percentage from `summarize`.
        """
        out: Dict[str, object] = {}
        if self.clip_scorer is not None and caption is not None:
            out.update(self.clip_scorer.score_video_metrics(frames, caption))
        if self.clip_scorer is not None and ref_frames is not None:
            out["alignment_score"] = self.clip_scorer.alignment_score(
                frames, ref_frames)
        if self.flow_metrics is not None and np.asarray(frames).shape[0] >= 3:
            dd = self.flow_metrics.dynamic_degree_video(frames, fps=fps)
            out["dynamic"] = bool(dd["dynamic"])
            out["dynamic_pair_scores"] = dd["pair_scores"]
            out["motion_smoothness"] = self.flow_metrics.motion_smoothness_video(
                frames)
        return out

    @staticmethod
    def summarize(per_video: List[Dict[str, object]]) -> Dict[str, float]:
        """Per-video metric dicts -> the set-level results table. Means for
        clip/aesthetic/smoothness/alignment over the videos that have them;
        `dynamic_degree` = percentage of dynamic videos (VBench semantics)."""
        table: Dict[str, float] = {}
        for key in ("clip_score", "aesthetic_quality", "motion_smoothness",
                    "alignment_score"):
            vals = [v[key] for v in per_video if key in v]
            if vals:
                table[key] = float(np.mean(vals))
        flags = [v["dynamic"] for v in per_video if "dynamic" in v]
        if flags:
            table["dynamic_degree"] = dynamic_degree_set(flags)
        return table

    @staticmethod
    def format_table(table: Dict[str, float]) -> str:
        """Render a summary next to the published reference values."""
        lines = []
        for key, val in table.items():
            ref = METRIC_REFERENCES.get(key, "")
            lines.append(f"{key:>20}: {val:8.4f}   ({ref})")
        return "\n".join(lines)
