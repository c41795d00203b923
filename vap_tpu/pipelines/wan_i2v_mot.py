"""Wan2.1 image-to-video Video-As-Prompt pipeline — TPU-native.

Behavioral port of WanImageToVideoMOTPipeline
(diffusers/src/diffusers/pipelines/wan/pipeline_wan_i2v_mot.py): UMT5 text
encode (zero-padded to 512), CLIP-vision encode of the target image and each
reference first frame, 36-channel conditioning
[noisy(16) ‖ mask(4) ‖ cond-latent(16)], clean reference latents at a fixed
near-zero timestep each step, FlowMatch Euler (or UniPC) stepping.

TPU-first: the denoise loop is one jit lax.scan. CFG is folded into the batch
— the reference runs two sequential forwards (:845-874), which is
mathematically identical for this batch-independent model; the equivalence
is verified against the reference pipeline end-to-end by
tests/test_pipeline_golden_parity.py::test_wan_pipeline_latent_parity.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.text_encoders.clip_vision import CLIPVisionConfig, clip_vision_encode
from ..models.text_encoders.t5 import T5Config, t5_encode
from ..models.wan.config import WanMOTConfig
from ..models.wan.transformer_mot import wan_forward, wan_mot_forward
from ..models.wan.vae import (
    WanVAEConfig,
    normalize_latents,
    denormalize_latents,
    wan_vae_decode_streamed,
    wan_vae_encode,
)
from ..ops.schedulers import FlowMatchEulerScheduler, UniPCScheduler

Array = jnp.ndarray

DEFAULT_NEGATIVE_PROMPT = (
    "Bright tones, overexposed, static, blurred details, subtitles, style, works, paintings, "
    "images, static, overall gray, worst quality, low quality, JPEG compression residue, ugly, "
    "incomplete, extra fingers, poorly drawn hands, poorly drawn faces, deformed, disfigured, "
    "misshapen limbs, fused fingers, still picture, messy background, three legs, many people "
    "in the background, walking backwards"
)


@functools.partial(jax.jit, static_argnums=(1,))
def _umt5_forward_jit(params, cfg, input_ids, attention_mask):
    out = t5_encode(params, cfg, input_ids, attention_mask)
    # reference zeroes embeddings past each prompt's length (encode_prompt)
    return out * attention_mask[..., None].astype(out.dtype)


@functools.partial(jax.jit, static_argnums=(1,))
def _clip_forward_jit(params, cfg, pixel_values):
    return clip_vision_encode(params, cfg, pixel_values)


@functools.partial(jax.jit, static_argnums=(1,))
def _wan_vae_encode_jit(params, cfg, video):
    moments = wan_vae_encode(params, cfg, video)
    mean, _ = jnp.split(moments, 2, axis=-1)  # sample_mode="argmax"
    return normalize_latents(cfg, mean)


# module-level so repeat decodes hit the trace cache instead of retracing a
# fresh lambda per call
_denormalize_jit = functools.partial(jax.jit, static_argnums=0)(denormalize_latents)


def _wan_vae_decode_jit(params, cfg, z):
    # NOT one outer jit: streamed per-chunk decode — a single graph over all
    # 13 latent-frame chunks lets XLA keep several chunks' 480p stage
    # tensors alive at once and exceeds a 16 GB chip; streaming bounds HBM
    # to one chunk's live set
    return wan_vae_decode_streamed(params, cfg, _denormalize_jit(cfg, z))


def make_i2v_mask(batch: int, num_frames: int, lat_h: int, lat_w: int, temporal_ratio: int = 4) -> np.ndarray:
    """First-frame mask, 4 channels per latent frame (pipeline :807-817).
    Returns [B, F_lat, lat_h, lat_w, 4] channel-last."""
    mask = np.ones((batch, 1, num_frames, lat_h, lat_w), np.float32)
    mask[:, :, 1:] = 0
    first = np.repeat(mask[:, :, :1], temporal_ratio, axis=2)
    mask = np.concatenate([first, mask[:, :, 1:]], axis=2)
    mask = mask.reshape(batch, -1, temporal_ratio, lat_h, lat_w).transpose(0, 2, 1, 3, 4)
    # [B, 4, F_lat, h, w] -> channel-last [B, F_lat, h, w, 4]
    return mask.transpose(0, 2, 3, 4, 1)


@dataclasses.dataclass
class WanVAPPipeline:
    transformer_cfg: WanMOTConfig
    vae_cfg: WanVAEConfig
    text_cfg: T5Config
    clip_cfg: Optional[CLIPVisionConfig]
    params: Dict[str, Any]   # transformer, vae, text_encoder, image_encoder
    tokenizer: Any = None
    image_processor: Any = None
    scheduler: Any = dataclasses.field(default_factory=lambda: FlowMatchEulerScheduler(shift=3.0))
    dtype: Any = jnp.bfloat16

    vae_scale_factor_spatial: int = 8
    vae_scale_factor_temporal: int = 4

    # decode-memory toggles (reference enable_tiling/enable_slicing,
    # examples/inference/inference.py:546-547)
    enable_vae_tiling: bool = False
    enable_vae_slicing: bool = False

    # module-level offload (reference README.md:202-260
    # enable_model_cpu_offload): params stay on HOST; one component at a
    # time is staged into device HBM (see pipelines/offload.py)
    enable_model_offload: bool = False
    # streamed block offload (reference enable_sequential_cpu_offload tier):
    # stage this many transformer blocks into HBM at a time during the
    # denoise — runs Wan-14B on a 16 GB chip at bf16 (pipelines/streamed.py).
    # Implies enable_model_offload semantics for the transformer; build the
    # pipeline with enable_model_offload=True so params land on host.
    offload_blocks_chunk: Optional[int] = None
    _staged: list = dataclasses.field(default_factory=list, repr=False)

    def _component(self, name: str):
        if not self.enable_model_offload:
            return self.params[name]
        from .offload import stage_component

        return stage_component(self.params, name, self._staged)

    def _decode(self, z: Array) -> Array:
        if self.enable_vae_slicing and z.shape[0] > 1:
            return jnp.concatenate(
                [self._decode_one(z[i:i + 1]) for i in range(z.shape[0])], axis=0)
        return self._decode_one(z)

    def _decode_one(self, z: Array) -> Array:
        if self.enable_vae_tiling:
            from ..models.wan.vae import wan_vae_decode_tiled

            z = _denormalize_jit(self.vae_cfg, z)
            return wan_vae_decode_tiled(self._component("vae"), self.vae_cfg, z)
        return _wan_vae_decode_jit(self._component("vae"), self.vae_cfg, z)

    def encode_prompt(self, prompt: str, max_length: int = 512) -> Array:
        toks = self.tokenizer([prompt], padding="max_length", max_length=max_length,
                              truncation=True, add_special_tokens=True, return_tensors="np")
        return _umt5_forward_jit(
            self._component("text_encoder"), self.text_cfg,
            jnp.asarray(toks["input_ids"]), jnp.asarray(toks["attention_mask"])).astype(self.dtype)

    def encode_image(self, image: np.ndarray) -> Array:
        """image: [H, W, 3] in [-1, 1] -> CLIP penultimate hidden [1, 257, D]."""
        px = self._clip_preprocess(image)
        return _clip_forward_jit(self._component("image_encoder"), self.clip_cfg, px).astype(self.dtype)

    def _clip_preprocess(self, image: np.ndarray) -> Array:
        """Resize to 224 + CLIP normalization (host side, bilinear)."""
        from ..data.video import resize_frame

        img01 = (np.asarray(image, np.float32) + 1.0) / 2.0
        size = self.clip_cfg.image_size
        img = resize_frame(img01, size, size)
        mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
        return jnp.asarray((img - mean) / std)[None]

    def _build_denoise_fn(self, use_unipc: bool, num_mot_ref: int,
                          step_cached: bool = False, plain: bool = False,
                          t2v: bool = False):
        key = (use_unipc, num_mot_ref, step_cached, plain, t2v)
        cache = self.__dict__.setdefault("_denoise_cache", {})
        if key in cache:
            return cache[key]
        cfg = self.transformer_cfg
        scheduler = self.scheduler

        @functools.partial(jax.jit, static_argnames=("do_cfg",))
        def denoise(params_t, latents, condition, ref_input, embeds, embeds_ref,
                    img_embeds, img_embeds_ref, timesteps, sigmas, guidance,
                    *step_cache_xs, do_cfg=True):
            """latents: [B, F, h, w, 16] fp32; condition [B, F, h, w, 20];
            ref_input [B, R*F, h, w, 36]; embeds [2B or B, 512, Dt]. When
            built with step_cached=True, one extra positional arg: bool[T]
            compute mask (pipelines/step_cache.py). plain=True runs the base
            trunk (wan_forward, no MoT stream — sampling a crush_smol-style
            generic finetune); t2v additionally drops the conditioning concat."""
            bsz = latents.shape[0]
            mult = 2 if do_cfg else 1
            if not t2v:
                cond_in = jnp.concatenate([condition.astype(self.dtype)] * mult, axis=0)
            if not plain:
                ref_in = jnp.concatenate([ref_input.astype(self.dtype)] * mult, axis=0)
                t_ref = jnp.ones((mult * bsz, num_mot_ref), jnp.float32)

            def raw_pred(latents, t):
                """One CFG-batch transformer forward -> fp32 [mult*B, ...]."""
                x_in = jnp.concatenate([latents.astype(self.dtype)] * mult, axis=0)
                if not t2v:
                    x_in = jnp.concatenate([x_in, cond_in], axis=-1)
                if plain:
                    pred = wan_forward(
                        params_t, cfg,
                        hidden_states=x_in,
                        timestep=jnp.broadcast_to(t, (mult * bsz,)),
                        encoder_hidden_states=embeds,
                        encoder_hidden_states_image=img_embeds,
                    )
                else:
                    pred, _ = wan_mot_forward(
                        params_t, cfg,
                        hidden_states=x_in,
                        timestep=jnp.broadcast_to(t, (mult * bsz,)),
                        encoder_hidden_states=embeds,
                        encoder_hidden_states_image=img_embeds,
                        hidden_states_mot_ref=ref_in,
                        timestep_mot_ref=t_ref,
                        encoder_hidden_states_mot_ref=embeds_ref,
                        encoder_hidden_states_image_mot_ref=img_embeds_ref,
                        num_mot_ref=num_mot_ref,
                    )
                return pred.astype(jnp.float32)

            def advance(pred, latents, m_prev, m_prev2, last_sample, per):
                if do_cfg:
                    uncond, cond = jnp.split(pred, 2, axis=0)
                    pred = uncond + per["guidance"] * (cond - uncond)
                if use_unipc:
                    latents, (m_prev, m_prev2, last_sample) = scheduler.step(
                        pred, latents, (m_prev, m_prev2, last_sample), per["coeffs"])
                else:
                    latents = scheduler.step(pred, latents, per["sigma"], per["sigma_next"])
                return latents, m_prev, m_prev2, last_sample

            z = jnp.zeros_like(latents)
            if use_unipc:
                per = {"t": timesteps, "guidance": guidance, "coeffs": sigmas}
            else:
                per = {"t": timesteps, "guidance": guidance,
                       "sigma": sigmas[:-1], "sigma_next": sigmas[1:]}

            if not step_cached:
                def step_fn(carry, per):
                    latents, m_prev, m_prev2, last_sample = carry
                    pred = raw_pred(latents, per["t"])
                    return advance(pred, latents, m_prev, m_prev2, last_sample, per), None

                (latents, _, _, _), _ = jax.lax.scan(step_fn, (latents, z, z, z), per)
                return latents

            # step-cached variants (PAB/AdaCache/TeaCache family,
            # pipelines/step_cache.py): reuse the carried raw CFG-batch
            # prediction on skipped steps
            cached0 = jnp.zeros((mult * bsz,) + latents.shape[1:], jnp.float32)

            if step_cached == "adaptive":
                # runtime schedule: accumulated relative L1 change of the
                # scan INPUT latents since the last computed step vs threshold
                per = dict(per, forced=step_cache_xs[0])
                thresh = step_cache_xs[1]

                def step_fn_adaptive(carry, per):
                    latents, m_prev, m_prev2, last_sample, cached, prev, accum = carry
                    d = jnp.mean(jnp.abs(latents - prev)) / (
                        jnp.mean(jnp.abs(prev)) + 1e-8)
                    accum = accum + d
                    compute = per["forced"] | (accum >= thresh)
                    pred = jax.lax.cond(
                        compute,
                        lambda lat: raw_pred(lat, per["t"]),
                        lambda lat: cached,
                        latents)
                    accum = jnp.where(compute, 0.0, accum)
                    new_latents, m_prev, m_prev2, last_sample = advance(
                        pred, latents, m_prev, m_prev2, last_sample, per)
                    return (new_latents, m_prev, m_prev2, last_sample,
                            pred, latents, accum), None

                (latents, _, _, _, _, _, _), _ = jax.lax.scan(
                    step_fn_adaptive,
                    (latents, z, z, z, cached0, latents, jnp.float32(0.0)), per)
                return latents

            per = dict(per, compute=step_cache_xs[0])

            def step_fn_cached(carry, per):
                latents, m_prev, m_prev2, last_sample, cached = carry
                pred = jax.lax.cond(
                    per["compute"],
                    lambda lat: raw_pred(lat, per["t"]),
                    lambda lat: cached,
                    latents)
                latents, m_prev, m_prev2, last_sample = advance(
                    pred, latents, m_prev, m_prev2, last_sample, per)
                return (latents, m_prev, m_prev2, last_sample, pred), None

            (latents, _, _, _, _), _ = jax.lax.scan(
                step_fn_cached, (latents, z, z, z, cached0), per)
            return latents

        cache[key] = denoise
        return denoise

    def _denoise_streamed(self, latents, condition, ref_input, embeds,
                          embeds_ref, img_embeds, img_embeds_ref, ts, sig_arg,
                          guidance, sc, use_unipc, plain, t2v, r, do_cfg):
        """Python-level denoise loop for streamed block offload
        (pipelines/streamed.py): each step stages the block stack through
        HBM chunk by chunk, so the scan cannot live inside one jit. The
        per-step math mirrors the jitted scan exactly (same raw_pred /
        CFG-combine / scheduler step; step-cache decisions move to host)."""
        from .streamed import StreamedWanTransformer

        runners = self.__dict__.setdefault("_streamed_runners", {})
        runner_key = (self.offload_blocks_chunk, plain, r)
        runner = runners.get(runner_key)
        if runner is None:
            runner = StreamedWanTransformer(
                self.params["transformer"], self.transformer_cfg,
                self.offload_blocks_chunk, mot=not plain, num_mot_ref=r)
            runners[runner_key] = runner

        bsz = latents.shape[0]
        mult = 2 if do_cfg else 1
        if not t2v:
            cond_in = jnp.concatenate([condition.astype(self.dtype)] * mult, axis=0)
        if not plain:
            ref_in = jnp.concatenate([ref_input.astype(self.dtype)] * mult, axis=0)
            t_ref = jnp.ones((mult * bsz, r), jnp.float32)

        def raw_pred(lat, t):
            x_in = jnp.concatenate([lat.astype(self.dtype)] * mult, axis=0)
            if not t2v:
                x_in = jnp.concatenate([x_in, cond_in], axis=-1)
            tt = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (mult * bsz,))
            if plain:
                pred = runner(hidden_states=x_in, timestep=tt,
                              encoder_hidden_states=embeds,
                              encoder_hidden_states_image=img_embeds)
            else:
                pred, _ = runner(hidden_states=x_in, timestep=tt,
                                 encoder_hidden_states=embeds,
                                 encoder_hidden_states_image=img_embeds,
                                 hidden_states_mot_ref=ref_in,
                                 timestep_mot_ref=t_ref,
                                 encoder_hidden_states_mot_ref=embeds_ref,
                                 encoder_hidden_states_image_mot_ref=img_embeds_ref,
                                 num_mot_ref=r)
            return pred.astype(jnp.float32)

        latents = latents.astype(jnp.float32)
        z = jnp.zeros_like(latents)
        m_prev, m_prev2, last_sample = z, z, z
        cached = None
        prev, accum = latents, 0.0
        for i in range(len(ts)):
            # step-cache decision on host (same semantics as the scan forms)
            if sc is None:
                compute = True
            elif sc.kind == "uniform":
                compute = bool(sc.mask[i])
            else:
                d = float(jnp.mean(jnp.abs(latents - prev))
                          / (jnp.mean(jnp.abs(prev)) + 1e-8))
                accum += d
                compute = bool(sc.mask[i]) or accum >= sc.thresh
                if compute:
                    accum = 0.0
                prev = latents
            if compute or cached is None:
                cached = raw_pred(latents, ts[i])
            pred = cached
            if do_cfg:
                uncond, cond = jnp.split(pred, 2, axis=0)
                pred = uncond + float(guidance[i]) * (cond - uncond)
            if use_unipc:
                per_coeffs = {k: v[i] for k, v in sig_arg.items()}
                latents, (m_prev, m_prev2, last_sample) = self.scheduler.step(
                    pred, latents, (m_prev, m_prev2, last_sample), per_coeffs)
            else:
                latents = self.scheduler.step(pred, latents, sig_arg[i], sig_arg[i + 1])
        runner.release()
        return latents

    def __call__(
        self,
        image: np.ndarray,                       # [H, W, 3] in [-1, 1]
        prompt: str = None,
        ref_videos: Optional[List[np.ndarray]] = None,   # list of [F, H, W, 3]
        prompt_mot_ref: Optional[List[str]] = None,
        negative_prompt: str = DEFAULT_NEGATIVE_PROMPT,
        negative_prompt_mot_ref: str = DEFAULT_NEGATIVE_PROMPT,
        height: int = 480,
        width: int = 832,
        num_frames: int = 49,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        seed: int = 42,
        max_sequence_length: int = 512,
        latents: Optional[Array] = None,
        output_type: str = "np",
        step_cache: Optional[str] = None,   # e.g. "uniform:2" — see pipelines/step_cache.py
    ):
        key = jax.random.PRNGKey(seed)
        do_cfg = guidance_scale > 1.0
        tcfg = self.transformer_cfg
        # plain mode (no reference videos): sample a crush_smol-style generic
        # finetune on the base trunk; T2V checkpoints (in_channels == z_dim)
        # additionally take no image/conditioning channels
        plain = not ref_videos
        t2v = plain and tcfg.in_channels == self.vae_cfg.z_dim
        mult = 2 if do_cfg else 1

        # 1. prompts (UMT5) + CLIP image embeds
        pe = self.encode_prompt(prompt, max_sequence_length)
        ne = self.encode_prompt(negative_prompt, max_sequence_length)
        embeds = jnp.concatenate([ne, pe], axis=0) if do_cfg else pe
        if plain:
            r = 1
            embeds_ref = jnp.zeros_like(embeds[:, :1])  # unused (DCE'd) dummy
        else:
            r = len(ref_videos)
            pe_ref = jnp.concatenate([self.encode_prompt(p, max_sequence_length) for p in prompt_mot_ref], axis=1)
            ne_ref = jnp.concatenate([self.encode_prompt(negative_prompt_mot_ref, max_sequence_length)] * r, axis=1)
            embeds_ref = jnp.concatenate([ne_ref, pe_ref], axis=0) if do_cfg else pe_ref

        if t2v or tcfg.image_dim is None:
            img_embeds = None
            img_embeds_ref = None
        else:
            img_embeds = jnp.concatenate([self.encode_image(image)] * mult, axis=0)
            if plain:
                img_embeds_ref = None
            else:
                img_embeds_ref = jnp.concatenate(
                    [jnp.concatenate([self.encode_image(rv[0]) for rv in ref_videos], axis=1)] * mult, axis=0)

        # 2. latents + 36ch conditioning
        f_lat = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        lat_h = height // self.vae_scale_factor_spatial
        lat_w = width // self.vae_scale_factor_spatial
        zc = self.vae_cfg.z_dim

        if t2v:
            condition = jnp.zeros((1, f_lat, lat_h, lat_w, 1), jnp.float32)  # unused dummy
        else:
            img5 = jnp.asarray(image, jnp.float32)[None, None]  # [1,1,H,W,3]
            video_cond = jnp.concatenate(
                [img5, jnp.zeros((1, num_frames - 1, height, width, 3), jnp.float32)], axis=1)
            cond_latent = _wan_vae_encode_jit(self._component("vae"), self.vae_cfg, video_cond.astype(self.dtype))
            mask = jnp.asarray(make_i2v_mask(1, num_frames, lat_h, lat_w, self.vae_scale_factor_temporal))
            condition = jnp.concatenate([mask.astype(cond_latent.dtype), cond_latent], axis=-1)  # [1,F,h,w,20]

        if plain:
            ref_input = jnp.zeros((1, f_lat, lat_h, lat_w, 1), jnp.float32)  # unused dummy
        else:
            ref_lat_list, ref_cond_list = [], []
            for rv in ref_videos:
                rv_j = jnp.asarray(rv, jnp.float32)[None]
                ref_lat_list.append(_wan_vae_encode_jit(self._component("vae"), self.vae_cfg, rv_j.astype(self.dtype)))
                first = rv_j[:, :1]
                vc = jnp.concatenate([first, jnp.zeros((1, num_frames - 1, height, width, 3), jnp.float32)], axis=1)
                cl = _wan_vae_encode_jit(self._component("vae"), self.vae_cfg, vc.astype(self.dtype))
                ref_cond_list.append(jnp.concatenate([mask.astype(cl.dtype), cl], axis=-1))
            ref_latents = jnp.concatenate(ref_lat_list, axis=1)      # [1, R*F, h, w, 16]
            ref_condition = jnp.concatenate(ref_cond_list, axis=1)   # [1, R*F, h, w, 20]
            ref_input = jnp.concatenate([ref_latents, ref_condition], axis=-1)  # 36ch

        key, nkey = jax.random.split(key)
        if latents is None:
            latents = jax.random.normal(nkey, (1, f_lat, lat_h, lat_w, zc), jnp.float32)

        # 3. scheduler arrays
        use_unipc = isinstance(self.scheduler, UniPCScheduler)
        ts = self.scheduler.timesteps(num_inference_steps).astype(np.float32)
        guidance = np.full_like(ts, guidance_scale)
        if use_unipc:
            coeffs = {k: jnp.asarray(v) for k, v in self.scheduler.step_coefficients(num_inference_steps).items()}
            sig_arg = coeffs
        else:
            sig_arg = jnp.asarray(self.scheduler.sigmas(num_inference_steps))

        from .step_cache import parse_step_cache

        sc = parse_step_cache(step_cache, num_inference_steps)
        if sc is None:
            cache_xs = ()
        elif sc.kind == "uniform":
            cache_xs = (jnp.asarray(sc.mask),)
        else:  # adaptive: forced mask + runtime threshold
            cache_xs = (jnp.asarray(sc.mask), jnp.float32(sc.thresh))
        if self.offload_blocks_chunk:
            latents = self._denoise_streamed(
                latents, condition, ref_input, embeds, embeds_ref,
                img_embeds, img_embeds_ref, ts, sig_arg, guidance,
                sc, use_unipc, plain, t2v, r, do_cfg)
        else:
            denoise = self._build_denoise_fn(use_unipc, r,
                                             step_cached=sc.kind if sc is not None else False,
                                             plain=plain, t2v=t2v)
            latents = denoise(
                self._component("transformer"), latents, condition, ref_input,
                embeds, embeds_ref, img_embeds, img_embeds_ref,
                jnp.asarray(ts), sig_arg, jnp.asarray(guidance), *cache_xs,
                do_cfg=do_cfg,
            )

        if output_type == "latent":
            return latents
        video = self._decode(latents.astype(self.dtype))
        return np.asarray(video.astype(jnp.float32))
