"""Single-sample Wan2.1 Video-As-Prompt inference.

Public-API port of the reference infer/wan_vap.py:69-124: 49f@480x832,
guidance 5.0, FlowMatch scheduler, fps 16 export.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_pipeline(model_path: str, dtype_str: str = "bfloat16", flow_shift: float = 3.0):
    import jax.numpy as jnp

    from vap_tpu.models.text_encoders.clip_vision import CLIPVisionConfig, convert_clip_vision_state_dict
    from vap_tpu.models.text_encoders.t5 import T5Config, convert_t5_state_dict
    from vap_tpu.models.wan import WanMOTConfig, convert_wan_mot_state_dict
    from vap_tpu.models.wan.vae import WanVAEConfig
    from vap_tpu.models.wan.vae_weights import convert_wan_vae_state_dict
    from vap_tpu.ops.schedulers import FlowMatchEulerScheduler
    from vap_tpu.pipelines.wan_i2v_mot import WanVAPPipeline
    from vap_tpu.training.checkpoint import load_safetensors

    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    t_cfg = WanMOTConfig.wan_14b_i2v_vap()
    vae_cfg = WanVAEConfig()
    txt_cfg = T5Config.umt5_xxl()
    clip_cfg = CLIPVisionConfig()

    def load_dir(sub):
        d = os.path.join(model_path, sub)
        sd = {}
        for f in sorted(os.listdir(d)):
            if f.endswith(".safetensors"):
                sd.update(load_safetensors(os.path.join(d, f)))
        return sd

    params = {
        "transformer": convert_wan_mot_state_dict(load_dir("transformer"), t_cfg, dtype),
        "vae": convert_wan_vae_state_dict(load_dir("vae"), vae_cfg, dtype),
        "text_encoder": convert_t5_state_dict(load_dir("text_encoder"), txt_cfg, dtype),
        "image_encoder": convert_clip_vision_state_dict(load_dir("image_encoder"), clip_cfg, dtype),
    }
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(os.path.join(model_path, "tokenizer"))
    return WanVAPPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg, clip_cfg=clip_cfg,
        params=params, tokenizer=tokenizer,
        scheduler=FlowMatchEulerScheduler(shift=flow_shift), dtype=dtype)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--ref_video", required=True)
    p.add_argument("--ref_image", required=True)
    p.add_argument("--prompt", required=True)
    p.add_argument("--prompt_ref", required=True)
    p.add_argument("--output", default="output.mp4")
    p.add_argument("--num_frames", type=int, default=49)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--step_cache", default=None, help="denoise step caching, e.g. uniform:2 (PAB/AdaCache-family opt-in accelerator; vap_tpu/pipelines/step_cache.py)")
    p.add_argument("--frames_selection", default="evenly", choices=["first", "evenly", "random"])
    args = p.parse_args()

    from vap_tpu.data.video import export_to_video, load_video, normalize_video, resize_video
    from vap_tpu.pipelines.cogvideox_i2v_mot import select_frames

    import cv2

    image = cv2.cvtColor(cv2.imread(args.ref_image), cv2.COLOR_BGR2RGB)
    image = normalize_video(resize_video(image[None].astype(np.float32) / 255.0, args.height, args.width))[0]

    frames, _ = load_video(args.ref_video)
    frames = select_frames(list(frames), args.num_frames, args.frames_selection)
    ref_video = normalize_video(resize_video(
        np.stack(frames).astype(np.float32) / 255.0, args.height, args.width))

    pipe = build_pipeline(args.model_path)
    video = pipe(
        image=image, prompt=args.prompt, ref_videos=[ref_video],
        prompt_mot_ref=[args.prompt_ref], height=args.height, width=args.width,
        num_frames=args.num_frames, num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale, seed=args.seed, step_cache=args.step_cache,
    )
    export_to_video((video[0] + 1.0) / 2.0, args.output, fps=16)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
