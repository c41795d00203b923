"""Quality cost of denoise-step caching, measured with the in-framework
CLIP scorer.

Step caching (pipelines/step_cache.py, the PAB/AdaCache family) trades
transformer forwards for an approximated model output; the speedup is
mechanical but the quality cost is content-dependent. This module closes the
loop the PAB paper (arXiv:2408.12588) closes with VBench: generate the same
prompt set with and without caching, score both with CLIPScorer, and report
`steps_computed vs clip_delta` per schedule. `passes_gate` is the promotion
rule bench.py-style defaults must satisfy before a cached schedule may be
advertised as loss-free.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..pipelines.step_cache import parse_step_cache

# default promotion gate: a cached schedule must keep the mean CLIP score
# within this absolute drop of the full-compute run (CLIP scores live on a
# 0-100 scale; the reference-table gap between VAP and the next-best open
# model is ~0.5, so half that is the loudest a "free" speedup may be)
DEFAULT_MAX_CLIP_DROP = 0.25


def evaluate_schedules(pipe, scorer, samples: Sequence[Dict[str, Any]],
                       schedules: Sequence[str] = ("uniform:2", "uniform:3"),
                       num_inference_steps: int = 50,
                       **gen_kwargs) -> List[Dict[str, Any]]:
    """Generate each sample once per schedule (None = full compute first) and
    CLIP-score against the sample's caption.

    samples: dicts with the pipeline call's per-sample fields — at least
    {"image", "prompt", "ref_videos", "prompt_mot_ref"}. gen_kwargs carries
    the shared call fields (height/width/num_frames/seed/...).

    Returns one row per schedule:
      {"schedule", "computed_steps", "total_steps", "clip_score",
       "clip_delta", "passes_gate"} — clip_delta = full - cached (positive =
    quality lost), and the full-compute row itself (schedule None,
    delta 0.0) leads the table.
    """
    def run(spec: Optional[str]) -> float:
        scores = []
        for s in samples:
            video = pipe(num_inference_steps=num_inference_steps,
                         step_cache=spec, **s, **gen_kwargs)
            frames = (np.asarray(video[0]) + 1.0) / 2.0
            scores.append(scorer.score_video(frames, str(s["prompt"])))
        return float(np.mean(scores))

    full = run(None)
    rows = [{"schedule": None, "computed_steps": num_inference_steps,
             "total_steps": num_inference_steps, "clip_score": full,
             "clip_delta": 0.0, "passes_gate": True}]
    for spec in schedules:
        sc = parse_step_cache(spec, num_inference_steps)
        cached = run(spec)
        delta = full - cached
        rows.append({
            "schedule": spec,
            # adaptive schedules decide at runtime — only the forced
            # warmup/cooldown floor is known statically
            "computed_steps": (int(sc.mask.sum()) if sc.kind == "uniform"
                               else f">={int(sc.mask.sum())} (runtime)"),
            "total_steps": num_inference_steps,
            "clip_score": cached,
            "clip_delta": delta,
            "passes_gate": passes_gate(delta),
        })
    return rows


def passes_gate(clip_delta: float,
                max_clip_drop: float = DEFAULT_MAX_CLIP_DROP) -> bool:
    """True when the cached run's CLIP drop is within the promotion budget.
    Negative deltas (cached scored higher — sampling noise) always pass."""
    return clip_delta <= max_clip_drop


def format_table(rows: List[Dict[str, Any]]) -> str:
    lines = [f"{'schedule':>12} {'computed':>9} {'clip_score':>11} "
             f"{'clip_delta':>11} {'gate':>5}"]
    for r in rows:
        lines.append(
            f"{str(r['schedule'] or 'full'):>12} "
            f"{r['computed_steps']:>6}/{r['total_steps']:<3}"
            f"{r['clip_score']:>10.4f} {r['clip_delta']:>11.4f} "
            f"{'PASS' if r['passes_gate'] else 'FAIL':>5}")
    return "\n".join(lines)
