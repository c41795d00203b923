"""Single-sample CogVideoX Video-As-Prompt inference.

Public-API port of the reference infer/cog_vap.py:69-116: load the VAP
checkpoint, select 49 frames evenly from the reference video, generate
49f@480x720 with 50 steps / dynamic CFG (scale 6) / seed 42, export at fps 16
via atomic tmp+rename.

Usage:
    python infer/cog_vap.py --model_path /path/to/Video-As-Prompt-CogVideoX-5B \
        --ref_video ref.mp4 --ref_image target.jpg \
        --prompt "..." --prompt_ref "..." --output out.mp4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_pipeline(model_path: str, dtype_str: str = "bfloat16"):
    import jax.numpy as jnp

    from vap_tpu.models.cogvideox import CogVideoXMOTConfig, convert_cogvideox_mot_state_dict
    from vap_tpu.models.cogvideox.vae import CogVideoXVAEConfig
    from vap_tpu.models.cogvideox.vae_weights import convert_cogvideox_vae_state_dict
    from vap_tpu.models.text_encoders.t5 import T5Config, convert_t5_state_dict
    from vap_tpu.pipelines.cogvideox_i2v_mot import CogVideoXVAPPipeline
    from vap_tpu.training.checkpoint import load_safetensors

    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    t_cfg = CogVideoXMOTConfig.cogvideox_5b_i2v_vap()
    vae_cfg = CogVideoXVAEConfig()
    txt_cfg = T5Config.t5_xxl()

    def load_dir(sub):
        d = os.path.join(model_path, sub)
        sd = {}
        for f in sorted(os.listdir(d)):
            if f.endswith(".safetensors"):
                sd.update(load_safetensors(os.path.join(d, f)))
        return sd

    params = {
        "transformer": convert_cogvideox_mot_state_dict(load_dir("transformer"), t_cfg, dtype),
        "vae": convert_cogvideox_vae_state_dict(load_dir("vae"), vae_cfg, dtype),
        "text_encoder": convert_t5_state_dict(load_dir("text_encoder"), txt_cfg, dtype),
    }
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(os.path.join(model_path, "tokenizer"))
    return CogVideoXVAPPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg,
        params=params, tokenizer=tokenizer, dtype=dtype)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--ref_video", required=True)
    p.add_argument("--ref_image", required=True, help="target reference image")
    p.add_argument("--prompt", required=True)
    p.add_argument("--prompt_ref", required=True)
    p.add_argument("--output", default="output.mp4")
    p.add_argument("--num_frames", type=int, default=49)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=720)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=6.0)
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
        guidance_scale=args.guidance_scale, use_dynamic_cfg=True, seed=args.seed, step_cache=args.step_cache,
    )
    export_to_video((video[0] + 1.0) / 2.0, args.output, fps=16)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
