"""Single-sample Wan2.1 Video-As-Prompt inference.

Public-API port of the reference infer/wan_vap.py:69-124: 49f@480x832,
guidance 5.0, FlowMatch scheduler, fps 16 export.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_pipeline(model_path: str, dtype_str: str = "bfloat16", flow_shift: float = 3.0, *,
                   revision: str = None, variant: str = None, cache_dir: str = None,
                   transformer_id: str = None, vae_id: str = None,
                   text_encoder_id: str = None, image_encoder_id: str = None,
                   tokenizer_id: str = None,
                   transformer_dtype: str = None, vae_dtype: str = None,
                   text_encoder_dtype: str = None,
                   lora_path: str = None, lora_scale: float = None,
                   enable_vae_tiling: bool = False, enable_vae_slicing: bool = False,
                   enable_model_offload: bool = False,
                   offload_blocks_chunk: int = None):
    """Assemble the Wan2.1 VAP pipeline from a checkpoint directory or a
    cached hub id, with the reference inference CLI's per-component
    id/dtype/LoRA/tiling surface (reference examples/inference/
    inference.py:548-583). See infer/cog_vap.py build_pipeline."""
    from vap_tpu.models.text_encoders.clip_vision import CLIPVisionConfig, convert_clip_vision_state_dict
    from vap_tpu.models.text_encoders.t5 import T5Config, convert_t5_state_dict
    from vap_tpu.models.wan import WanMOTConfig, convert_wan_mot_state_dict
    from vap_tpu.models.wan.vae import WanVAEConfig
    from vap_tpu.models.wan.vae_weights import convert_wan_vae_state_dict
    from vap_tpu.ops.schedulers import FlowMatchEulerScheduler
    from vap_tpu.pipelines.wan_i2v_mot import WanVAPPipeline
    from vap_tpu.training.checkpoint import load_safetensors, merge_lora_into_state_dict
    from vap_tpu.utils.hub import resolve_model_dir, variant_weight_files

    try:
        from cog_vap import parse_dtype  # run as a script (infer/ on sys.path)
    except ImportError:
        from infer.cog_vap import parse_dtype  # imported as a package module

    dtype = parse_dtype(dtype_str)
    root = resolve_model_dir(model_path, revision, cache_dir)

    def comp_dir(sub, override=None):
        return (resolve_model_dir(override, revision, cache_dir) if override
                else os.path.join(root, sub))

    from vap_tpu.utils.hub import component_config_kwargs

    # checkpoint config.json overrides the released-config defaults
    t_cfg = WanMOTConfig.wan_14b_i2v_vap(**component_config_kwargs(
        WanMOTConfig, comp_dir("transformer", transformer_id)))
    vae_cfg = WanVAEConfig(**component_config_kwargs(
        WanVAEConfig, comp_dir("vae", vae_id)))
    txt_cfg = T5Config.umt5_xxl(**component_config_kwargs(
        T5Config, comp_dir("text_encoder", text_encoder_id)))
    clip_cfg = CLIPVisionConfig(**component_config_kwargs(
        CLIPVisionConfig, comp_dir("image_encoder", image_encoder_id)))

    def load_dir(sub, override=None):
        d = (resolve_model_dir(override, revision, cache_dir) if override
             else os.path.join(root, sub))
        sd = {}
        for f in variant_weight_files(d, variant):
            sd.update(load_safetensors(f))
        return sd

    import contextlib

    import jax

    # streamed block offload needs the whole param tree on host too
    enable_model_offload = enable_model_offload or bool(offload_blocks_chunk)

    t_sd = load_dir("transformer", transformer_id)
    if lora_path:
        t_sd = merge_lora_into_state_dict(t_sd, lora_path, lora_scale)
    # with offload the converted params must LAND on host memory — one
    # component at a time is staged into HBM per phase (pipelines/offload.py)
    host = (jax.default_device(jax.devices("cpu")[0]) if enable_model_offload
            else contextlib.nullcontext())
    with host:
        params = {
            "transformer": convert_wan_mot_state_dict(
                t_sd, t_cfg, parse_dtype(transformer_dtype) if transformer_dtype else dtype),
            "vae": convert_wan_vae_state_dict(
                load_dir("vae", vae_id), vae_cfg,
                parse_dtype(vae_dtype) if vae_dtype else dtype),
            "text_encoder": convert_t5_state_dict(
                load_dir("text_encoder", text_encoder_id), txt_cfg,
                parse_dtype(text_encoder_dtype) if text_encoder_dtype else dtype),
            "image_encoder": convert_clip_vision_state_dict(
                load_dir("image_encoder", image_encoder_id), clip_cfg, dtype),
        }
    tok_dir = (resolve_model_dir(tokenizer_id, revision, cache_dir) if tokenizer_id
               else os.path.join(root, "tokenizer"))
    if os.path.isdir(tok_dir):
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(tok_dir)
    else:
        tokenizer = None  # caller must set pipe.tokenizer (smoke checkpoints)
    return WanVAPPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg, clip_cfg=clip_cfg,
        params=params, tokenizer=tokenizer,
        scheduler=FlowMatchEulerScheduler(shift=flow_shift), dtype=dtype,
        enable_vae_tiling=enable_vae_tiling, enable_vae_slicing=enable_vae_slicing,
        enable_model_offload=enable_model_offload,
        offload_blocks_chunk=offload_blocks_chunk)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--ref_video", default=None,
                   help="semantic reference video (omit to sample a plain "
                        "crush_smol-style finetune on the base trunk)")
    p.add_argument("--ref_image", default=None,
                   help="target reference image (omit for T2V checkpoints)")
    p.add_argument("--prompt", required=True)
    p.add_argument("--prompt_ref", default=None,
                   help="reference-branch prompt (required with --ref_video)")
    p.add_argument("--output", default="output.mp4")
    p.add_argument("--num_frames", type=int, default=49)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--step_cache", default=None, help="denoise step caching, uniform:N[:w[:c]] or adaptive:THRESH[:w[:c]] (PAB/TeaCache-family opt-in accelerator; vap_tpu/pipelines/step_cache.py)")
    p.add_argument("--frames_selection", default="evenly", choices=["first", "evenly", "random"])
    p.add_argument("--enable_model_offload", action="store_true",
                   help="keep params on host, stage one component into HBM at "
                        "a time (reference enable_model_cpu_offload analog; "
                        "fits the full pipeline on a 16 GB chip)")
    p.add_argument("--offload_blocks_chunk", type=int, default=None,
                   help="stream the transformer block stack through HBM this "
                        "many blocks at a time during the denoise (reference "
                        "enable_sequential_cpu_offload analog; runs the 14B "
                        "at bf16 on one 16 GB chip, ~8 GB peak at 1; slow — "
                        "weights cross the host link every step)")
    args = p.parse_args()

    if args.ref_video and not args.prompt_ref:
        p.error("--ref_video requires --prompt_ref")

    from vap_tpu.data.video import export_to_video, load_video, normalize_video, resize_video
    from vap_tpu.pipelines.cogvideox_i2v_mot import select_frames

    image = None
    if args.ref_image:
        import cv2

        image = cv2.cvtColor(cv2.imread(args.ref_image), cv2.COLOR_BGR2RGB)
        image = normalize_video(resize_video(image[None].astype(np.float32) / 255.0, args.height, args.width))[0]

    ref_videos, prompt_mot_ref = None, None
    if args.ref_video:
        frames, _ = load_video(args.ref_video)
        frames = select_frames(list(frames), args.num_frames, args.frames_selection)
        ref_videos = [normalize_video(resize_video(
            np.stack(frames).astype(np.float32) / 255.0, args.height, args.width))]
        prompt_mot_ref = [args.prompt_ref]

    pipe = build_pipeline(args.model_path,
                          enable_model_offload=args.enable_model_offload,
                          offload_blocks_chunk=args.offload_blocks_chunk)
    video = pipe(
        image=image, prompt=args.prompt, ref_videos=ref_videos,
        prompt_mot_ref=prompt_mot_ref, height=args.height, width=args.width,
        num_frames=args.num_frames, num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale, seed=args.seed, step_cache=args.step_cache,
    )
    export_to_video((video[0] + 1.0) / 2.0, args.output, fps=16)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
