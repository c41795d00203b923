"""Measure the CLIP-score cost of --step_cache schedules on a real checkpoint.

Runs a small fixed slice of the VAP-Data benchmark with full compute and with
each requested schedule, scores every generation with the in-framework CLIP
scorer, and prints the steps_computed-vs-clip_delta table that gates any
promotion of step caching to a default (vap_tpu/eval/step_cache_quality.py).

Usage (TPU, real checkpoint):
  python scripts/step_cache_quality.py --model_path <VAP-CogVideoX-5B> \\
      --benchmark_csv <VAP-Data>/benchmark.csv --clip_score_model <clip-L14> \\
      --schedules uniform:2 uniform:3 --limit 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "infer"))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True)
    p.add_argument("--model_name", default="cogvideox", choices=["cogvideox", "wan"])
    p.add_argument("--benchmark_csv", required=True)
    p.add_argument("--data_root", default=None)
    p.add_argument("--clip_score_model", required=True)
    p.add_argument("--schedules", nargs="+", default=["uniform:2", "uniform:3"])
    p.add_argument("--limit", type=int, default=4, help="benchmark rows to score")
    p.add_argument("--num_frames", type=int, default=49)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=720)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=6.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output_json", default=None)
    args = p.parse_args()

    if args.model_name == "cogvideox":
        from cog_vap import build_pipeline
    else:
        from wan_vap import build_pipeline
    from vap_tpu.data.dataset import VideoAsPromptValidationDataset
    from vap_tpu.data.video import resize_video
    from vap_tpu.eval import CLIPScorer
    from vap_tpu.eval.step_cache_quality import evaluate_schedules, format_table
    from vap_tpu.pipelines.cogvideox_i2v_mot import select_frames

    pipe = build_pipeline(args.model_path)
    scorer = CLIPScorer.from_pretrained(args.clip_score_model)
    ds = VideoAsPromptValidationDataset(
        args.benchmark_csv, root=args.data_root, num_frames=args.num_frames)

    samples = []
    for i, sample in enumerate(ds):
        if i >= args.limit:
            break
        ref = np.stack(select_frames(
            list(sample["ref_videos"][0]), args.num_frames, "evenly"))
        samples.append(dict(
            image=resize_video(sample["image"][None], args.height, args.width)[0],
            prompt=str(sample["caption"]),
            ref_videos=[resize_video(ref, args.height, args.width)],
            prompt_mot_ref=list(sample["caption_mot_ref"][:1])))

    gen_kwargs = dict(height=args.height, width=args.width,
                      num_frames=args.num_frames,
                      guidance_scale=args.guidance_scale, seed=args.seed)
    if args.model_name == "cogvideox":
        gen_kwargs["use_dynamic_cfg"] = True
    rows = evaluate_schedules(pipe, scorer, samples, args.schedules,
                              num_inference_steps=args.num_inference_steps,
                              **gen_kwargs)
    print(format_table(rows))
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
