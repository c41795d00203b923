"""Batched Wan2.1 VAP inference over the VAP-Data benchmark CSV
(port of infer/wan_vap_bench.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--benchmark_csv", required=True)
    p.add_argument("--data_root", default=None)
    p.add_argument("--output_dir", default="bench_outputs_wan")
    p.add_argument("--num_frames", type=int, default=49)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--step_cache", default=None, help="denoise step caching, uniform:N[:w[:c]] or adaptive:THRESH[:w[:c]] (PAB/TeaCache-family opt-in accelerator; vap_tpu/pipelines/step_cache.py)")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--shard_index", type=int, default=0)
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--clip_score_model", default=None,
                   help="local HF CLIPModel dir: score each generation against "
                        "its caption and report the benchmark mean (reference "
                        "README.md:73-81 metric, VAP = 24.13)")
    p.add_argument("--aesthetic_model", default=None,
                   help="LAION aesthetic-predictor .pth (with --clip_score_model): "
                        "also report aesthetic quality (reference table: 57.71)")
    p.add_argument("--raft_model", default=None,
                   help="princeton-vl raft-things.pth: also report motion "
                        "smoothness + dynamic degree (reference table: 98.59 / "
                        "77.08); with --clip_score_model the generation is also "
                        "scored for alignment against its reference video "
                        "(reference table: 70.44)")
    p.add_argument("--raft_iters", type=int, default=None)
    args = p.parse_args()

    suite = None
    if args.clip_score_model or args.raft_model:
        from vap_tpu.eval import VideoMetricsSuite

        suite = VideoMetricsSuite.from_pretrained(
            args.clip_score_model, args.aesthetic_model,
            args.raft_model, args.raft_iters)
    scores = []

    from wan_vap import build_pipeline
    from vap_tpu.data.dataset import VideoAsPromptValidationDataset
    from vap_tpu.data.video import export_to_video, resize_video
    from vap_tpu.pipelines.cogvideox_i2v_mot import select_frames

    pipe = build_pipeline(args.model_path)
    ds = VideoAsPromptValidationDataset(
        args.benchmark_csv, root=args.data_root, num_frames=args.num_frames,
        shard_index=args.shard_index, num_shards=args.num_shards)

    os.makedirs(args.output_dir, exist_ok=True)
    for i, sample in enumerate(ds):
        if args.limit and i >= args.limit:
            break
        ref = np.stack(select_frames(list(sample["ref_videos"][0]), args.num_frames, "evenly"))
        ref = resize_video(ref, args.height, args.width)
        image = resize_video(sample["image"][None], args.height, args.width)[0]

        video = pipe(
            image=image, prompt=sample["caption"], ref_videos=[ref],
            prompt_mot_ref=sample["caption_mot_ref"][:1],
            height=args.height, width=args.width, num_frames=args.num_frames,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale, seed=args.seed, step_cache=args.step_cache,
        )
        ours = (video[0] + 1.0) / 2.0
        ref01 = (ref + 1.0) / 2.0
        target = np.broadcast_to(((image + 1.0) / 2.0)[None], ours.shape)
        side_by_side = np.concatenate([ref01, target, ours], axis=2)
        out_path = os.path.join(args.output_dir, f"{args.shard_index:02d}_{i:04d}.mp4")
        export_to_video(side_by_side, out_path, fps=16)
        if suite is not None:
            m = suite.score_video(ours, str(sample["caption"]), fps=16.0,
                                  ref_frames=ref01)
            m.pop("dynamic_pair_scores", None)
            scores.append(m)
            print(f"[{i}] saved {out_path} " +
                  " ".join(f"{k}={v:.3f}" if isinstance(v, float) else f"{k}={v}"
                           for k, v in m.items()))
        else:
            print(f"[{i}] saved {out_path}")

    if scores:
        from vap_tpu.eval import VideoMetricsSuite

        print(f"=== benchmark metrics over {len(scores)} videos ===")
        print(VideoMetricsSuite.format_table(VideoMetricsSuite.summarize(scores)))


if __name__ == "__main__":
    main()
