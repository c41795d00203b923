"""Distributed batch inference CLI.

Port of the reference examples/inference/inference.py (:44 main, :154-460
Inference class): dataset-driven prompts, data-parallel sharding across hosts
(each process generates a disjoint slice), attention-provider selection
(incl. the int8 'sage' kernel), optional sequence-parallel attention over a
`seq` mesh axis (the reference's --cp_degree / --cp_rotate_method), multi-ref
sampling, effect-kind filtering, resumable output (skip-existing), and
side-by-side [ref ‖ generated] export like the reference bench scripts.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "infer"))

import numpy as np


class Inference:
    def __init__(self, args):
        self.args = args
        import jax

        from vap_tpu.ops.attention import attention_provider
        from vap_tpu.parallel import MeshConfig, make_mesh
        from vap_tpu.parallel.ring_attention import attention_mesh

        self._attention_provider = attention_provider
        self._attention_mesh = attention_mesh
        self.mesh = None
        if args.sp_degree > 1:
            mesh_cfg = MeshConfig(data=args.dp_degree, seq=args.sp_degree)
            devices = jax.devices()
            if len(devices) < mesh_cfg.world_size:
                devices = jax.devices("cpu")  # virtual-device testing
            self.mesh = make_mesh(mesh_cfg, devices)
        self.shard_index = jax.process_index() * args.dp_degree
        self.num_shards = max(jax.process_count(), 1) * args.dp_degree

        if args.model_name == "cogvideox":
            from cog_vap import build_pipeline
        else:
            from wan_vap import build_pipeline
        build_kwargs = dict(
            revision=getattr(args, "revision", None),
            variant=getattr(args, "variant", None),
            cache_dir=getattr(args, "cache_dir", None),
            transformer_id=getattr(args, "transformer_id", None),
            vae_id=getattr(args, "vae_id", None),
            text_encoder_id=getattr(args, "text_encoder_id", None),
            tokenizer_id=getattr(args, "tokenizer_id", None),
            transformer_dtype=getattr(args, "transformer_dtype", None),
            vae_dtype=getattr(args, "vae_dtype", None),
            text_encoder_dtype=getattr(args, "text_encoder_dtype", None),
            lora_path=getattr(args, "lora_path", None),
            lora_scale=getattr(args, "lora_scale", None),
            enable_vae_tiling=getattr(args, "enable_tiling", False),
            enable_vae_slicing=getattr(args, "enable_slicing", False),
            enable_model_offload=getattr(args, "enable_model_offload", False),
            offload_blocks_chunk=getattr(args, "offload_blocks_chunk", None),
        )
        if args.model_name == "wan":
            build_kwargs["image_encoder_id"] = getattr(args, "image_encoder_id", None)
        self.pipe = build_pipeline(args.model_path, **build_kwargs)
        self.suite = None
        if getattr(args, "clip_score_model", None) or getattr(args, "raft_model", None):
            from vap_tpu.eval import VideoMetricsSuite

            self.suite = VideoMetricsSuite.from_pretrained(
                getattr(args, "clip_score_model", None),
                getattr(args, "aesthetic_model", None),
                getattr(args, "raft_model", None),
                getattr(args, "raft_iters", None))

    def _gen_kwargs(self):
        args = self.args
        kw = dict(height=args.height, width=args.width, num_frames=args.num_frames,
                  num_inference_steps=args.num_inference_steps,
                  guidance_scale=args.guidance_scale, seed=args.seed,
                  step_cache=getattr(args, "step_cache", None))
        if args.model_name == "cogvideox":
            kw["use_dynamic_cfg"] = args.use_dynamic_cfg
        elif args.negative_prompt is not None:
            kw["negative_prompt"] = args.negative_prompt
        return kw

    def run(self):
        args = self.args
        from vap_tpu.data.dataset import VideoAsPromptValidationDataset
        from vap_tpu.data.video import export_to_video, resize_video
        from vap_tpu.pipelines.cogvideox_i2v_mot import select_frames

        ds = VideoAsPromptValidationDataset(
            args.dataset_file, root=args.data_root, num_frames=args.num_frames,
            shard_index=self.shard_index, num_shards=self.num_shards)

        os.makedirs(args.output_dir, exist_ok=True)
        provider = args.attn_provider if self.mesh is None else "ring"
        ctx = (self._attention_mesh(self.mesh, rotate_method=args.cp_rotate_method)
               if self.mesh is not None else _null_context())
        gen_kwargs = self._gen_kwargs()
        done = 0
        self.metrics = []
        with self._attention_provider(provider), ctx:
            for i, sample in enumerate(ds):
                if args.max_samples is not None and done >= args.max_samples:
                    break
                if args.kind and sample.get("kind") not in args.kind:
                    continue
                out = os.path.join(args.output_dir, f"{self.shard_index:02d}_{i:04d}.mp4")
                if args.skip_existing and os.path.exists(out):
                    done += 1
                    continue
                n_refs = min(args.sample_ref_videos_num, len(sample["ref_videos"]))
                refs = [
                    resize_video(
                        np.stack(select_frames(list(rv), args.num_frames, "evenly")),
                        args.height, args.width)
                    for rv in sample["ref_videos"][:n_refs]
                ]
                image = resize_video(sample["image"][None], args.height, args.width)[0]
                video = self.pipe(
                    image=image, prompt=sample["caption"], ref_videos=refs,
                    prompt_mot_ref=sample["caption_mot_ref"][:n_refs],
                    **gen_kwargs,
                )
                clip = (video[0] + 1.0) / 2.0
                if args.save_side_by_side:
                    # [ref ‖ generated] like the reference *_bench.py exports
                    side = np.concatenate([(refs[0] + 1.0) / 2.0, clip], axis=2)
                    export_to_video(side, out, fps=args.fps)
                else:
                    export_to_video(clip, out, fps=args.fps)
                done += 1
                if self.suite is not None:
                    m = self.suite.score_video(
                        clip, str(sample["caption"]), fps=float(args.fps),
                        ref_frames=(refs[0] + 1.0) / 2.0)
                    m.pop("dynamic_pair_scores", None)
                    self.metrics.append(m)
                    print(f"saved {out} " +
                          " ".join(f"{k}={v:.3f}" if isinstance(v, float)
                                   else f"{k}={v}" for k, v in m.items()))
                else:
                    print(f"saved {out}")
        if self.metrics:
            # per-process table (each process scores its own dp shard, like
            # the reference's per-rank artifact logging)
            from vap_tpu.eval import VideoMetricsSuite

            print(f"shard {self.shard_index} metrics over "
                  f"{len(self.metrics)} videos:")
            print(VideoMetricsSuite.format_table(
                VideoMetricsSuite.summarize(self.metrics)))


class _null_context:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def main():
    p = argparse.ArgumentParser("vap_tpu distributed inference")
    p.add_argument("--model_name", default="cogvideox", choices=["cogvideox", "wan"])
    p.add_argument("--model_path", required=True)
    p.add_argument("--dataset_file", required=True)
    p.add_argument("--data_root", default=None)
    p.add_argument("--output_dir", default="inference_outputs")
    p.add_argument("--dp_degree", type=int, default=1)
    p.add_argument("--sp_degree", type=int, default=1,
                   help="sequence-parallel degree (reference --cp_degree)")
    p.add_argument("--attn_provider", default="flash",
                   choices=["flash", "flash_varlen", "sage", "jax_flash", "xla", "ring"])
    p.add_argument("--cp_rotate_method", default="allgather",
                   choices=["allgather", "ppermute", "ulysses"],
                   help="KV rotation for sequence-parallel attention "
                        "(reference --cp_rotate_method allgather/alltoall)")
    p.add_argument("--num_frames", type=int, default=49)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=720)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=6.0)
    p.add_argument("--use_dynamic_cfg", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--negative_prompt", default=None)
    p.add_argument("--sample_ref_videos_num", type=int, default=1)
    p.add_argument("--kind", nargs="*", default=None,
                   help="only generate samples of these effect kinds")
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--skip_existing", action="store_true",
                   help="resume: skip outputs that already exist")
    p.add_argument("--save_side_by_side", action="store_true",
                   help="export [ref | generated] comparison videos")
    p.add_argument("--fps", type=int, default=16)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--step_cache", default=None, help="denoise step caching, uniform:N[:w[:c]] or adaptive:THRESH[:w[:c]] (PAB/TeaCache-family opt-in accelerator; vap_tpu/pipelines/step_cache.py)")
    p.add_argument("--clip_score_model", default=None,
                   help="local HF CLIPModel dir: score generations against "
                        "their captions (reference README.md:73-81 metric); "
                        "also enables alignment scoring vs the reference video")
    p.add_argument("--aesthetic_model", default=None,
                   help="LAION aesthetic-predictor .pth (with --clip_score_model)")
    p.add_argument("--raft_model", default=None,
                   help="princeton-vl raft-things.pth: also score motion "
                        "smoothness + dynamic degree")
    p.add_argument("--raft_iters", type=int, default=None)

    # per-component loading surface (reference inference.py:548-583)
    from cog_vap import DTYPE_STRINGS

    p.add_argument("--revision", default=None, help="hub revision when model ids resolve from the local HF cache")
    p.add_argument("--variant", default=None, help="weight-file variant, e.g. fp16")
    p.add_argument("--cache_dir", default=None, help="huggingface cache dir for hub-id resolution")
    p.add_argument("--transformer_id", default=None, help="override the transformer component dir / cached hub id")
    p.add_argument("--vae_id", default=None, help="override the VAE component dir / cached hub id")
    p.add_argument("--text_encoder_id", default=None, help="override the text-encoder component dir / cached hub id")
    p.add_argument("--image_encoder_id", default=None, help="override the image-encoder dir (wan only)")
    p.add_argument("--tokenizer_id", default=None, help="override the tokenizer dir / cached hub id")
    p.add_argument("--transformer_dtype", default=None, choices=DTYPE_STRINGS)
    p.add_argument("--vae_dtype", default=None, choices=DTYPE_STRINGS)
    p.add_argument("--text_encoder_dtype", default=None, choices=DTYPE_STRINGS)
    p.add_argument("--lora_path", default=None,
                   help="PEFT-layout LoRA safetensors fused into the "
                        "transformer at load (training export or diffusers "
                        "convention)")
    p.add_argument("--lora_scale", type=float, default=None,
                   help="LoRA fuse scale (default: lora_alpha/r from the "
                        "file's metadata)")
    p.add_argument("--enable_tiling", action="store_true",
                   help="force tiled VAE decode (reference enable_tiling)")
    p.add_argument("--enable_slicing", action="store_true",
                   help="decode batch elements one at a time (reference "
                        "enable_slicing)")
    p.add_argument("--enable_model_offload", action="store_true",
                   help="keep params on host, stage one component into HBM "
                        "at a time (reference enable_model_cpu_offload, "
                        "README.md:202-260 — fits T5-XXL + 5B transformer "
                        "inference on a 16 GB chip)")
    p.add_argument("--offload_blocks_chunk", type=int, default=None,
                   help="stream the block stack through HBM this many blocks "
                        "at a time during the denoise (reference "
                        "enable_sequential_cpu_offload analog — Wan-14B bf16 "
                        "on one 16 GB chip, CogVideoX at the ~7.5 GB tier)")
    args = p.parse_args()
    Inference(args).run()


if __name__ == "__main__":
    main()
