"""Quality-metric evaluation over generated videos — the full five-metric
results table.

The reference's headline table (reference README.md:73-81) reports, for VAP:
CLIP Score 24.13, Motion Smoothness 98.59, Dynamic Degree 77.08, Aesthetic
Quality 57.71, Alignment Score 70.44 — produced externally by VBench plus a
GPT alignment judge (the reference repo ships no eval code). This CLI is the
in-framework equivalent: pass the model paths you have and it reports the
metrics those enable; with all three models and a reference-video column it
prints the whole table.

Usage:
  python scripts/clip_score.py --csv results.csv \\
      --model /path/to/clip-vit-large-patch14 \\
      --aesthetic_model /path/to/aesthetic.pth \\
      --raft_model /path/to/raft-things.pth
  # csv columns: video_path, caption[, ref_video_path]  (extras ignored;
  # ref_video_path enables alignment_score)
  python scripts/clip_score.py --videos out/*.mp4 --caption "a cat ..." ...

Weights load from local paths: an HF CLIPModel directory (tokenizer from the
same path), the LAION improved-aesthetic-predictor .pth, and the princeton-vl
raft-things.pth (the RAFT checkpoint VBench uses).
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--csv", help="CSV with video_path, caption[, ref_video_path]")
    p.add_argument("--videos", nargs="*", default=[], help="video files (with --caption)")
    p.add_argument("--caption", help="single caption for --videos")
    p.add_argument("--model", default=None,
                   help="local HF CLIPModel path: enables clip_score (and "
                        "alignment_score when ref videos are given)")
    p.add_argument("--aesthetic_model", default=None,
                   help="LAION improved-aesthetic-predictor .pth (with --model): "
                        "also report VBench-style aesthetic quality")
    p.add_argument("--raft_model", default=None,
                   help="princeton-vl raft-things.pth: also report "
                        "motion_smoothness and dynamic_degree")
    p.add_argument("--raft_iters", type=int, default=None,
                   help="RAFT refinement iterations (default: checkpoint config)")
    p.add_argument("--fps", type=float, default=None,
                   help="override the video fps used for dynamic-degree "
                        "sampling (default: from each container)")
    p.add_argument("--max_frames", type=int, default=None,
                   help="cap frames per video (default: all)")
    p.add_argument("--output_json", help="write per-video scores here")
    args = p.parse_args()
    if not args.model and not args.raft_model:
        p.error("pass --model and/or --raft_model (nothing to score with)")
    if args.aesthetic_model and not args.model:
        p.error("--aesthetic_model needs --model (shares its ViT pass)")

    rows = []
    if args.csv:
        with open(args.csv) as f:
            for row in csv.DictReader(f):
                caption = row.get("caption")
                if args.model and not caption:
                    p.error(f"--model given but CSV row for "
                            f"{row.get('video_path')!r} has no caption column/value")
                rows.append((row["video_path"], caption,
                             row.get("ref_video_path") or None))
    for v in args.videos:
        if not args.caption and args.model:
            p.error("--videos requires --caption when scoring with --model")
        rows.append((v, args.caption, None))
    if not rows:
        p.error("nothing to score: pass --csv or --videos")

    from vap_tpu.data.video import load_video
    from vap_tpu.eval import VideoMetricsSuite

    suite = VideoMetricsSuite.from_pretrained(
        args.model, args.aesthetic_model, args.raft_model, args.raft_iters)

    results = []
    for path, caption, ref_path in rows:
        frames, fps = load_video(path, max_frames=args.max_frames)
        ref_frames = None
        if ref_path and suite.clip_scorer is not None:
            ref_frames, _ = load_video(ref_path, max_frames=args.max_frames)
        m = suite.score_video(frames, caption, fps=args.fps or fps or 16.0,
                              ref_frames=ref_frames)
        m.pop("dynamic_pair_scores", None)
        results.append({"video_path": path, "caption": caption, **m})
        shown = "  ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in m.items())
        print(f"{shown}  {path}")

    summary = VideoMetricsSuite.summarize(results)
    print(f"\n=== set-level metrics over {len(results)} videos "
          f"(reference README.md:73-81 VAP row alongside) ===")
    print(VideoMetricsSuite.format_table(summary))
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump({**summary, "videos": results}, f, indent=1)


if __name__ == "__main__":
    main()
