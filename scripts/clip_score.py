"""CLIP-score evaluation over generated videos.

The quality side of the north star ("CLIP-score parity", reference
README.md:73-81: VAP = 24.13 on the VAP-Data benchmark). The reference repo
ships no eval code — external VBench tooling produced its table — so this is
the in-framework equivalent: per-frame CLIPScore (100 * max(cos, 0)) against
the caption, averaged per video, then over the set.

Usage:
  python scripts/clip_score.py --csv results.csv --model openai/clip-vit-large-patch14
  # csv columns: video_path, caption   (extra columns ignored)
  python scripts/clip_score.py --videos out/*.mp4 --caption "a cat ..." ...

Weights load from a local HF CLIPModel directory (safetensors/bin); the
tokenizer comes from the same path.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--csv", help="CSV with video_path, caption columns")
    p.add_argument("--videos", nargs="*", default=[], help="video files (with --caption)")
    p.add_argument("--caption", help="single caption for --videos")
    p.add_argument("--model", default="openai/clip-vit-large-patch14",
                   help="local HF CLIPModel path")
    p.add_argument("--aesthetic_model", default=None,
                   help="LAION improved-aesthetic-predictor .pth: also report "
                        "VBench-style aesthetic quality (reference table: 57.71)")
    p.add_argument("--max_frames", type=int, default=None,
                   help="cap frames per video (default: all)")
    p.add_argument("--output_json", help="write per-video scores here")
    args = p.parse_args()

    rows = []
    if args.csv:
        with open(args.csv) as f:
            for row in csv.DictReader(f):
                rows.append((row["video_path"], row["caption"]))
    for v in args.videos:
        if not args.caption:
            p.error("--videos requires --caption")
        rows.append((v, args.caption))
    if not rows:
        p.error("nothing to score: pass --csv or --videos")

    from vap_tpu.data.video import load_video
    from vap_tpu.eval import CLIPScorer

    scorer = CLIPScorer.from_pretrained(args.model, args.aesthetic_model)

    results = []
    for path, caption in rows:
        frames, _ = load_video(path, max_frames=args.max_frames)
        m = scorer.score_video_metrics(frames, caption)
        results.append({"video_path": path, "caption": caption, **m})
        extra = (f"  aesthetic={m['aesthetic_quality']:.4f}"
                 if "aesthetic_quality" in m else "")
        print(f"{m['clip_score']:7.3f}{extra}  {path}")

    summary = {"mean_clip_score": float(np.mean([r["clip_score"] for r in results]))}
    print(f"mean CLIP score over {len(results)} videos: "
          f"{summary['mean_clip_score']:.3f} "
          f"(reference VAP benchmark: 24.13, README.md:73-81)")
    if args.aesthetic_model:
        summary["mean_aesthetic_quality"] = float(
            np.mean([r["aesthetic_quality"] for r in results]))
        print(f"mean aesthetic quality: {summary['mean_aesthetic_quality']:.4f} "
              f"(reference table x100: 57.71)")
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump({**summary, "videos": results}, f, indent=1)


if __name__ == "__main__":
    main()
