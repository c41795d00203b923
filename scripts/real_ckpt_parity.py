"""One-shot real-checkpoint parity + quality gate (VERDICT r4 missing #1).

Run this the moment the released weights are available (hub snapshot or local
dir). Stages:

  1. PARITY — load the checkpoint into BOTH the torch reference pipeline and
     the vap_tpu pipeline, run a short deterministic generation (same inputs,
     same init noise, posterior pinned to its mode) on CPU float32, and
     compare final latents. Passes when max|Δ| <= --atol.
  2. CLIP (optional, --clip_model + --image/--ref_video/--prompt) — generate
     with the vap_tpu pipeline and CLIP-score the output against the prompt
     (the CLIP-score half of the north star; reference README.md:73-81
     reports 24.13 on the VAP-Data benchmark).

Usage:
  python scripts/real_ckpt_parity.py --model_path ByteDance/Video-As-Prompt-CogVideoX-5B
  python scripts/real_ckpt_parity.py --model_path ByteDance/Video-As-Prompt-Wan2.1-14B --family wan
  python scripts/real_ckpt_parity.py --selftest   # tiny fabricated checkpoint, CPU, ~2 min

The parity stage needs no sample data (random inputs exercise every weight);
--num_frames 9 keeps the torch CPU forward tractable at the mandatory
480x720 spatial resolution (the released CogVideoX checkpoint's learned
positional embeddings fix H/W; frames may shrink).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIFFUSERS = "/root/reference/diffusers/src"

import numpy as np


class CharTokenizer:
    """Deterministic char tokenizer (pt + np), for --selftest / --fake_tokenizer."""

    model_max_length = 226
    added_tokens_encoder = {}

    def __call__(self, texts, padding=None, max_length=16, truncation=True,
                 add_special_tokens=True, return_attention_mask=True,
                 return_overflowing_tokens=False, return_length=False,
                 return_tensors="np"):
        if isinstance(texts, str):
            texts = [texts]
        if padding == "longest":
            max_length = max(1, max(len(t) for t in texts))
        ids = np.zeros((len(texts), max_length), np.int64)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t[:max_length]):
                ids[i, j] = (ord(ch) * 7 + j) % 100 + 1
        mask = (ids > 0).astype(np.int64)
        if return_tensors == "pt":
            import torch

            class B(dict):
                __getattr__ = dict.__getitem__

            return B(input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
        return {"input_ids": ids.astype(np.int32), "attention_mask": mask.astype(np.int32)}

    def batch_decode(self, ids):
        return [""] * len(ids)

    def tokenize(self, prompt):
        return list(prompt)


def _pin_posterior_mode():
    """Deterministic VAE encode on the torch side (posterior sample -> mode);
    the vap_tpu pipelines already use the mode."""
    from diffusers.models.autoencoders.vae import DiagonalGaussianDistribution

    DiagonalGaussianDistribution.sample = lambda self, generator=None: self.mode()


def _pil(frames):
    import PIL.Image

    return [PIL.Image.fromarray(f) for f in frames]


def run_cog_parity(args):
    import jax
    import jax.numpy as jnp
    import torch

    from infer.cog_vap import build_pipeline

    pipe = build_pipeline(args.model_path, "float32")
    t_cfg, vae_cfg = pipe.transformer_cfg, pipe.vae_cfg
    if args.fake_tokenizer:
        pipe.tokenizer = CharTokenizer()

    # torch reference side, from the SAME checkpoint dir
    from diffusers.models.autoencoders.autoencoder_kl_cogvideox import AutoencoderKLCogVideoX
    from diffusers.models.transformers.cogvideox_transformer_3d_mot import (
        CogVideoXTransformer3DMOTModel)
    from diffusers.pipelines.cogvideo.pipeline_cogvideox_image2video_mot import (
        CogVideoXImageToVideoMOTPipeline)
    from diffusers.schedulers import CogVideoXDDIMScheduler as TorchDDIM
    from transformers import T5EncoderModel

    from vap_tpu.utils.hub import resolve_model_dir

    root = resolve_model_dir(args.model_path)
    transformer = CogVideoXTransformer3DMOTModel.from_pretrained(
        os.path.join(root, "transformer"), torch_dtype=torch.float32).eval()
    vae = AutoencoderKLCogVideoX.from_pretrained(
        os.path.join(root, "vae"), torch_dtype=torch.float32).eval()
    text_encoder = T5EncoderModel.from_pretrained(
        os.path.join(root, "text_encoder"), torch_dtype=torch.float32).eval()
    if args.fake_tokenizer:
        tokenizer = CharTokenizer()
    else:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(os.path.join(root, "tokenizer"))
    sched_dir = os.path.join(root, "scheduler")
    scheduler = (TorchDDIM.from_pretrained(sched_dir) if os.path.isdir(sched_dir)
                 else TorchDDIM(timestep_spacing="trailing", prediction_type="v_prediction",
                                rescale_betas_zero_snr=True, snr_shift_scale=3.0))
    ref_pipe = CogVideoXImageToVideoMOTPipeline(
        tokenizer=tokenizer, text_encoder=text_encoder, vae=vae,
        transformer=transformer, scheduler=scheduler)
    _pin_posterior_mode()

    H, W, F, steps = args.height, args.width, args.num_frames, args.steps
    rng = np.random.default_rng(args.seed)
    img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    ref = rng.integers(0, 256, (F, H, W, 3), dtype=np.uint8)
    lat_f = (F - 1) // vae_cfg.temporal_compression_ratio + 1
    init_latents = rng.standard_normal(
        (1, lat_f, t_cfg.in_channels // 2, H // 8, W // 8)).astype(np.float32)
    prompt, prompt_ref = args.prompt or "a cat", args.prompt_ref or "explode it"
    max_len = t_cfg.max_text_seq_length

    t0 = time.time()
    with torch.no_grad():
        want = ref_pipe(
            image=_pil([img])[0], prompt=prompt, ref_videos=[_pil(ref)],
            prompt_mot_ref=[prompt_ref], height=H, width=W, num_frames=F,
            num_inference_steps=steps, guidance_scale=args.guidance_scale,
            use_dynamic_cfg=True, latents=torch.from_numpy(init_latents),
            max_sequence_length=max_len, output_type="latent",
            frames_selection="first",
        ).frames.numpy()
    print(f"torch reference: {time.time() - t0:.1f}s")

    t0 = time.time()
    from vap_tpu.ops.attention import attention_provider

    with jax.default_device(jax.devices("cpu")[0]), attention_provider("xla"):
        got = np.asarray(pipe(
            image=(img.astype(np.float32) / 127.5 - 1.0), prompt=prompt,
            ref_videos=[ref.astype(np.float32) / 127.5 - 1.0],
            prompt_mot_ref=[prompt_ref], height=H, width=W, num_frames=F,
            num_inference_steps=steps, guidance_scale=args.guidance_scale,
            use_dynamic_cfg=True, latents=jnp.asarray(init_latents),
            max_sequence_length=max_len, output_type="latent",
        ))
    print(f"vap_tpu: {time.time() - t0:.1f}s")
    return got, want


def run_wan_parity(args):
    import jax
    import jax.numpy as jnp
    import torch

    from infer.wan_vap import build_pipeline

    pipe = build_pipeline(args.model_path, "float32")
    vae_cfg = pipe.vae_cfg
    if args.fake_tokenizer:
        pipe.tokenizer = CharTokenizer()

    from diffusers.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan
    from diffusers.models.transformers.transformer_wan_mot import WanTransformer3DMOTModel
    from diffusers.pipelines.wan.pipeline_wan_i2v_mot import WanImageToVideoMOTPipeline
    from diffusers.schedulers import FlowMatchEulerDiscreteScheduler
    from transformers import CLIPImageProcessor, CLIPVisionModel, UMT5EncoderModel

    from vap_tpu.utils.hub import resolve_model_dir

    root = resolve_model_dir(args.model_path)
    transformer = WanTransformer3DMOTModel.from_pretrained(
        os.path.join(root, "transformer"), torch_dtype=torch.float32).eval()
    vae = AutoencoderKLWan.from_pretrained(
        os.path.join(root, "vae"), torch_dtype=torch.float32).eval()
    text_encoder = UMT5EncoderModel.from_pretrained(
        os.path.join(root, "text_encoder"), torch_dtype=torch.float32).eval()
    image_encoder = CLIPVisionModel.from_pretrained(
        os.path.join(root, "image_encoder"), torch_dtype=torch.float32).eval()
    image_processor = CLIPImageProcessor.from_pretrained(os.path.join(root, "image_processor"))
    if args.fake_tokenizer:
        tokenizer = CharTokenizer()
    else:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(os.path.join(root, "tokenizer"))
    scheduler = FlowMatchEulerDiscreteScheduler(shift=args.flow_shift)
    ref_pipe = WanImageToVideoMOTPipeline(
        tokenizer=tokenizer, text_encoder=text_encoder, image_encoder=image_encoder,
        image_processor=image_processor, transformer=transformer, vae=vae,
        scheduler=scheduler)

    H, W, F, steps = args.height, args.width, args.num_frames, args.steps
    rng = np.random.default_rng(args.seed)
    img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    ref = rng.integers(0, 256, (F, H, W, 3), dtype=np.uint8)
    lat_f = (F - 1) // 4 + 1
    init_latents = rng.standard_normal(
        (1, vae_cfg.z_dim, lat_f, H // 8, W // 8)).astype(np.float32)
    prompt, prompt_ref = args.prompt or "a cat", args.prompt_ref or "explode it"

    t0 = time.time()
    with torch.no_grad():
        want = ref_pipe(
            image=_pil([img])[0], prompt=prompt, ref_videos=[_pil(ref)],
            prompt_mot_ref=[prompt_ref], height=H, width=W, num_frames=F,
            num_inference_steps=steps, guidance_scale=args.guidance_scale,
            latents=torch.from_numpy(init_latents),
            output_type="latent",
        ).frames.numpy()
    print(f"torch reference: {time.time() - t0:.1f}s")

    t0 = time.time()
    from vap_tpu.ops.attention import attention_provider

    with jax.default_device(jax.devices("cpu")[0]), attention_provider("xla"):
        got = np.asarray(pipe(
            image=(img.astype(np.float32) / 127.5 - 1.0), prompt=prompt,
            ref_videos=[ref.astype(np.float32) / 127.5 - 1.0],
            prompt_mot_ref=[prompt_ref], height=H, width=W, num_frames=F,
            num_inference_steps=steps, guidance_scale=args.guidance_scale,
            latents=jnp.asarray(init_latents.transpose(0, 2, 3, 4, 1)),
            output_type="latent",
        ))
    got = got.transpose(0, 4, 1, 2, 3)  # [B,F,h,w,C] -> [B,C,F,h,w]
    print(f"vap_tpu: {time.time() - t0:.1f}s")
    return got, want


def run_clip(args, report):
    """Generate with the vap_tpu pipeline and CLIP-score vs the prompt."""
    import cv2
    import jax.numpy as jnp

    from vap_tpu.data.video import load_video, normalize_video, resize_video
    from vap_tpu.eval.clip_score import CLIPScorer

    if args.family == "wan":
        from infer.wan_vap import build_pipeline
    else:
        from infer.cog_vap import build_pipeline

    pipe = build_pipeline(args.model_path, "bfloat16")
    image = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
    image = normalize_video(resize_video(
        image[None].astype(np.float32) / 255.0, args.height, args.width))[0]
    ref = normalize_video(resize_video(
        load_video(args.ref_video).astype(np.float32) / 255.0, args.height, args.width))
    video = np.asarray(pipe(
        image=image, prompt=args.prompt, ref_videos=[ref],
        prompt_mot_ref=[args.prompt_ref or args.prompt],
        height=args.height, width=args.width, num_frames=args.clip_num_frames,
        num_inference_steps=args.clip_steps, guidance_scale=args.guidance_scale,
    ))
    scorer = CLIPScorer(args.clip_model)
    score = float(scorer.score_video((video + 1.0) / 2.0, args.prompt))
    report["clip_score"] = score
    print(f"CLIP score: {score:.2f} (reference VAP-Data benchmark: 24.13, README.md:81)")


def make_selftest_checkpoint(tmp):
    """Fabricate a tiny diffusers-layout CogVideoX VAP checkpoint."""
    import torch

    from diffusers.models.autoencoders.autoencoder_kl_cogvideox import AutoencoderKLCogVideoX
    from diffusers.models.transformers.cogvideox_transformer_3d_mot import (
        CogVideoXTransformer3DMOTModel)
    from transformers import T5Config as HFT5Config, T5EncoderModel

    torch.manual_seed(0)
    CogVideoXTransformer3DMOTModel(
        num_attention_heads=2, attention_head_dim=16, in_channels=8,
        out_channels=4, time_embed_dim=16, text_embed_dim=8, num_layers=2,
        sample_width=8, sample_height=8, sample_frames=9, max_text_seq_length=6,
        use_rotary_positional_embeddings=True,
        block_idx_with_mot_ref=[0, 1],
    ).save_pretrained(os.path.join(tmp, "transformer"))
    AutoencoderKLCogVideoX(
        block_out_channels=[8, 8, 8, 8], latent_channels=4,
        layers_per_block=1, norm_num_groups=4,
    ).save_pretrained(os.path.join(tmp, "vae"))
    T5EncoderModel(HFT5Config(
        vocab_size=128, d_model=8, d_kv=4, d_ff=16, num_layers=2, num_heads=2,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False, use_cache=False,
        tie_word_embeddings=False,
    )).save_pretrained(os.path.join(tmp, "text_encoder"))
    return tmp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", default=None)
    p.add_argument("--family", default="cogvideox", choices=["cogvideox", "wan"])
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--num_frames", type=int, default=9)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=720)
    p.add_argument("--guidance_scale", type=float, default=6.0)
    p.add_argument("--flow_shift", type=float, default=3.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--atol", type=float, default=5e-3)
    p.add_argument("--fake_tokenizer", action="store_true",
                   help="deterministic char tokenizer (checkpoints without a tokenizer dir)")
    p.add_argument("--selftest", action="store_true",
                   help="fabricate a tiny checkpoint and run the parity stage on it")
    # CLIP stage
    p.add_argument("--clip_model", default=None, help="CLIP checkpoint dir for scoring")
    p.add_argument("--image", default=None)
    p.add_argument("--ref_video", default=None)
    p.add_argument("--prompt", default=None)
    p.add_argument("--prompt_ref", default=None)
    p.add_argument("--clip_steps", type=int, default=50)
    p.add_argument("--clip_num_frames", type=int, default=49)
    p.add_argument("--output", default=None, help="write the report JSON here")
    args = p.parse_args(argv)

    if REFERENCE_DIFFUSERS not in sys.path and os.path.isdir(REFERENCE_DIFFUSERS):
        sys.path.insert(0, REFERENCE_DIFFUSERS)

    if args.selftest:
        import tempfile

        os.environ.setdefault("VAP_ATTN_PROVIDER", "xla")
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        tmp = tempfile.mkdtemp(prefix="vap_selftest_ckpt_")
        args.model_path = make_selftest_checkpoint(tmp)
        args.fake_tokenizer = True
        args.height = args.width = 32
        args.atol = 2e-3

    if not args.model_path:
        p.error("--model_path (or --selftest) required")

    got, want = (run_wan_parity if args.family == "wan" else run_cog_parity)(args)
    delta = np.abs(got.astype(np.float64) - want.astype(np.float64))
    report = {
        "model_path": args.model_path, "family": args.family,
        "steps": args.steps, "num_frames": args.num_frames,
        "height": args.height, "width": args.width,
        "max_abs_delta": float(delta.max()), "mean_abs_delta": float(delta.mean()),
        "ref_latent_rms": float(np.sqrt((want.astype(np.float64) ** 2).mean())),
        "parity_pass": bool(delta.max() <= args.atol), "atol": args.atol,
    }
    print(json.dumps(report))
    if args.clip_model and args.image and args.ref_video and args.prompt:
        run_clip(args, report)
    if args.output:
        with open(args.output, "w") as f:
            json.dump(report, f, indent=1)
    if not report["parity_pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
