"""CogVideoX image-to-video Video-As-Prompt pipeline — TPU-native.

Behavioral port of CogVideoXImageToVideoMOTPipeline
(diffusers/src/diffusers/pipelines/cogvideo/pipeline_cogvideox_image2video_mot.py):
T5-encode target + per-reference prompts (with CFG negatives), VAE-encode the
first-frame image / reference videos (clean) / reference first frames, then a
50-step denoise with joint MoT attention and biased reference RoPE, DDIM or
DPM step, VAE decode.

TPU-first: the entire denoising loop is ONE jit-compiled lax.scan — CFG is
folded into the batch (2B), per-step scheduler scalars and the dynamic-CFG
schedule are precomputed host-side and scanned over, reference latents stay
clean and constant across steps (closed over, not re-concatenated per step).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.cogvideox.config import CogVideoXMOTConfig
from ..models.cogvideox.transformer_mot import cogvideox_mot_forward
from ..models.cogvideox.vae import (
    CogVideoXVAEConfig,
    posterior_mode,
    sample_posterior,
    vae_decode_wsplit,
    vae_encode,
)
from ..models.text_encoders.t5 import T5Config, t5_encode
from ..ops.rope import prepare_cogvideox_rotary_embeddings
from ..ops.schedulers import CogVideoXDDIMScheduler, CogVideoXDPMScheduler

Array = jnp.ndarray

DEFAULT_NEGATIVE_PROMPT = (
    "Bright tones, overexposed, static, blurred details, subtitles, style, works, paintings, "
    "images, static, overall gray, worst quality, low quality, JPEG compression residue, ugly, "
    "incomplete, extra fingers, poorly drawn hands, poorly drawn faces, deformed, disfigured, "
    "misshapen limbs, fused fingers, still picture, messy background, three legs, many people "
    "in the background, walking backwards"
)


def select_frames(frames: Sequence, num: int, mode: str = "evenly") -> List:
    """Frame selection first/evenly/random (pipeline :894-906, infer/cog_vap.py:45-63)."""
    if mode == "first":
        return list(frames[:num])
    if mode == "evenly":
        idx = np.linspace(0, len(frames) - 1, num).astype(np.int64)
        return [frames[i] for i in idx]
    if mode == "random":
        import random

        if len(frames) <= num:
            return list(frames)
        start = random.randint(0, len(frames) - num)
        return list(frames[start:start + num])
    raise ValueError(mode)


def dynamic_cfg_schedule(timesteps: np.ndarray, guidance_scale: float, num_inference_steps: int) -> np.ndarray:
    """Cosine dynamic CFG (pipeline :1036-1039), precomputed per step.

    The reference plugs the RAW timestep value (e.g. 999) into
    (steps - t)/steps — so the cosine argument is astronomically large and its
    value is pure float64 libm folklore. Compute in float64 exactly as
    math.cos does torch-side; float32 would diverge (parity-tested)."""
    t64 = np.asarray(timesteps, np.float64)
    return (1.0 + guidance_scale * (
        (1 - np.cos(np.pi * ((num_inference_steps - t64) / num_inference_steps) ** 5.0)) / 2
    )).astype(np.float32)


@functools.partial(jax.jit, static_argnums=(1,))
def _t5_forward_jit(params, cfg, input_ids):
    return t5_encode(params, cfg, input_ids)


@functools.partial(jax.jit, static_argnums=(1, 3))
def _vae_encode_mode_jit(params, cfg, video, scale=True):
    moments = vae_encode(params, cfg, video)
    z = posterior_mode(moments)
    # CogVideoX 1.5 checkpoints set invert_scale_latents: the team forgot the
    # scaling multiply during training, so IMAGE-conditioning latents stay
    # raw (reference prepare_latents :391-397) while ref-video latents and
    # the decode division keep the factor
    return z * cfg.scaling_factor if scale else z


def _vae_decode_jit(params, cfg, z):
    # streamed per-chunk jit bounds HBM to one temporal chunk; at >=480p the
    # full frame still needs ~17 GB (temp+conv cache, memory_analysis), so
    # wide outputs decode as 2 blended W-tiles (1.24x area vs the reference
    # 3x3 grid's 2.25x) — n_splits=1 is exact full-frame streaming
    n = 2 if z.shape[3] >= 80 else 1
    return vae_decode_wsplit(params, cfg, z, n)


@dataclasses.dataclass
class CogVideoXVAPPipeline:
    transformer_cfg: CogVideoXMOTConfig
    vae_cfg: CogVideoXVAEConfig
    text_cfg: T5Config
    params: Dict[str, Any]          # {"transformer", "vae", "text_encoder"}
    tokenizer: Any = None
    scheduler: Any = dataclasses.field(default_factory=CogVideoXDDIMScheduler)
    dtype: Any = jnp.bfloat16

    vae_scale_factor_spatial: int = 8
    vae_scale_factor_temporal: int = 4

    # decode-memory toggles (reference enable_tiling/enable_slicing,
    # examples/inference/inference.py:546-547): tiling forces the
    # reference-parity 3x3 overlap-blended grid decode instead of the
    # default W-split heuristic; slicing decodes batch elements one at a time
    enable_vae_tiling: bool = False
    enable_vae_slicing: bool = False

    # module-level offload (reference README.md:202-260
    # enable_model_cpu_offload): params stay on HOST; one component at a
    # time is staged into device HBM (see pipelines/offload.py)
    enable_model_offload: bool = False
    # streamed block offload (reference enable_sequential_cpu_offload tier,
    # README.md:202-260 '~7.5 GB'): stage this many transformer blocks into
    # HBM at a time during the denoise (pipelines/streamed.py). Build with
    # enable_model_offload=True so params land on host.
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
            from ..models.cogvideox.vae import vae_decode_tiled

            return vae_decode_tiled(self._component("vae"), self.vae_cfg, z)
        return _vae_decode_jit(self._component("vae"), self.vae_cfg, z)

    # ------------------------------------------------------------------
    # host-side preprocessing
    # ------------------------------------------------------------------
    def encode_prompt_tokens(self, prompt: str, max_length: int = 226) -> Tuple[np.ndarray, np.ndarray]:
        toks = self.tokenizer(
            [prompt], padding="max_length", max_length=max_length, truncation=True,
            add_special_tokens=True, return_tensors="np",
        )
        return toks["input_ids"], toks["attention_mask"]

    def _t5_forward(self, input_ids: Array) -> Array:
        # reference passes no attention mask to T5 and keeps all 226 positions
        # (pipeline _get_t5_prompt_embeds)
        return _t5_forward_jit(self._component("text_encoder"), self.text_cfg, input_ids).astype(self.dtype)

    def encode_prompt(self, prompt: str, negative_prompt: str, max_length: int = 226) -> Tuple[Array, Array]:
        ids, _ = self.encode_prompt_tokens(prompt, max_length)
        nids, _ = self.encode_prompt_tokens(negative_prompt, max_length)
        return self._t5_forward(jnp.asarray(ids)), self._t5_forward(jnp.asarray(nids))

    def _vae_encode_mode(self, video: Array, image_cond: bool = False) -> Array:
        scale = not (image_cond and self.vae_cfg.invert_scale_latents)
        return _vae_encode_mode_jit(self._component("vae"), self.vae_cfg,
                                    video.astype(self.dtype), scale)

    # ------------------------------------------------------------------
    # the jit-scanned denoise loop
    # ------------------------------------------------------------------
    def _build_denoise_fn(self, num_inference_steps: int, num_mot_ref: int, use_dpm: bool,
                          height: int, width: int, num_latent_frames: int, ref_type: str,
                          single_branch: bool = False, concat_refs: bool = False,
                          step_cached: bool = False, t2v: bool = False):
        key = (num_inference_steps, num_mot_ref, use_dpm, height, width, num_latent_frames,
               ref_type, single_branch, concat_refs, step_cached, t2v)
        cache = self.__dict__.setdefault("_denoise_cache", {})
        if key in cache:
            return cache[key]
        cfg = self.transformer_cfg
        rope = prepare_cogvideox_rotary_embeddings(
            height, width, num_latent_frames,
            attention_head_dim=cfg.attention_head_dim, patch_size=cfg.patch_size,
            patch_size_t=cfg.patch_size_t, sample_width=cfg.sample_width,
            sample_height=cfg.sample_height, vae_scale_factor_spatial=self.vae_scale_factor_spatial,
        )
        rope_ref = prepare_cogvideox_rotary_embeddings(
            height, width, num_latent_frames,
            attention_head_dim=cfg.attention_head_dim, patch_size=cfg.patch_size,
            patch_size_t=cfg.patch_size_t, sample_width=cfg.sample_width,
            sample_height=cfg.sample_height, vae_scale_factor_spatial=self.vae_scale_factor_spatial,
            mot_num=num_mot_ref, ref_type=ref_type,
        )

        scheduler = self.scheduler

        @functools.partial(jax.jit, static_argnames=("do_cfg",))
        def denoise(params_t, latents, image_latents, ref_latents, ref_image_latents,
                    prompt_embeds, prompt_embeds_ref, timesteps, step_scalars, guidance, key,
                    *step_cache_xs, do_cfg=True):
            """latents: [B, F, C, H, W] fp32; *_latents conditioned inputs in
            model dtype; prompt_embeds(2B if cfg) etc. When built with
            step_cached="uniform", one extra positional arg: bool[T] compute
            mask; "adaptive": (bool[T] forced mask, f32 threshold). See
            pipelines/step_cache.py."""
            bsz = latents.shape[0]
            mult = 2 if do_cfg else 1

            image_in = jnp.concatenate([image_latents] * mult, axis=0)
            ref_in = jnp.concatenate(
                [jnp.concatenate([ref_latents] * mult, axis=0),
                 jnp.concatenate([ref_image_latents] * mult, axis=0)], axis=2)

            def raw_pred(latents, t):
                """One CFG-batch transformer forward -> fp32 [mult*B, F, C, H, W]."""
                latent_in = jnp.concatenate([latents.astype(self.dtype)] * mult, axis=0)
                if not t2v:
                    latent_in = jnp.concatenate([latent_in, image_in], axis=2)

                if single_branch:
                    # ablation: one trunk over [target ‖ refs] with concat RoPE
                    # (pipeline :1003-1022); baseline: target only
                    tgt_frames = latents.shape[1]
                    if concat_refs:
                        latent_in = jnp.concatenate([latent_in, ref_in], axis=1)
                        rope_cat = (jnp.concatenate([rope[0], rope_ref[0]], axis=0),
                                    jnp.concatenate([rope[1], rope_ref[1]], axis=0))
                    else:
                        rope_cat = rope
                    noise_pred, _ = cogvideox_mot_forward(
                        params_t, cfg,
                        hidden_states=latent_in,
                        encoder_hidden_states=prompt_embeds,
                        timestep=jnp.broadcast_to(t, (mult * bsz,)),
                        image_rotary_emb=rope_cat,
                        hidden_states_mot_ref=ref_in,
                        encoder_hidden_states_mot_ref=prompt_embeds_ref,
                        image_rotary_emb_mot_ref=rope_ref,
                        num_mot_ref=num_mot_ref,
                        single_branch=True,
                    )
                    noise_pred = noise_pred[:, :tgt_frames]
                else:
                    noise_pred, _ = cogvideox_mot_forward(
                        params_t, cfg,
                        hidden_states=latent_in,
                        encoder_hidden_states=prompt_embeds,
                        timestep=jnp.broadcast_to(t, (mult * bsz,)),
                        image_rotary_emb=rope,
                        hidden_states_mot_ref=ref_in,
                        encoder_hidden_states_mot_ref=prompt_embeds_ref,
                        image_rotary_emb_mot_ref=rope_ref,
                        num_mot_ref=num_mot_ref,
                    )
                return noise_pred.astype(jnp.float32)

            def advance(noise_pred, latents, old_x0, key, per_step):
                """CFG combine + scheduler step (always runs, every step)."""
                if do_cfg:
                    uncond, cond = jnp.split(noise_pred, 2, axis=0)
                    noise_pred = uncond + per_step["guidance"] * (cond - uncond)
                if use_dpm:
                    key, nkey = jax.random.split(key)
                    noise = jax.random.normal(nkey, latents.shape, jnp.float32)
                    latents, old_x0 = scheduler.step(
                        noise_pred, latents, old_x0, per_step["coeffs"], noise)
                else:
                    a_t, b_t, ap_t = per_step["coeffs"]
                    latents = scheduler.step(noise_pred, latents, a_t, b_t, ap_t)
                return latents, old_x0, key

            per_step = {"t": timesteps, "guidance": guidance, "coeffs": step_scalars}
            latents = latents.astype(jnp.float32)
            init = (latents, jnp.zeros_like(latents), key)

            if not step_cached:
                def step_fn(carry, per_step):
                    latents, old_x0, key = carry
                    noise_pred = raw_pred(latents, per_step["t"])
                    return advance(noise_pred, latents, old_x0, key, per_step), None

                (latents, _, _), _ = jax.lax.scan(step_fn, init, per_step)
                return latents

            # step-cached variants: skip the transformer on reuse steps and
            # return the carried raw (pre-CFG) prediction — lax.cond runs
            # only the taken branch, so skipped steps cost no model FLOPs
            cached0 = jnp.zeros((mult * bsz,) + latents.shape[1:], jnp.float32)

            if step_cached == "adaptive":
                # TeaCache-family runtime schedule (pipelines/step_cache.py):
                # accumulate the relative L1 change of the scan INPUT latents
                # since the last computed step; recompute once it crosses the
                # threshold (or on forced warmup/cooldown steps)
                per_step = dict(per_step, forced=step_cache_xs[0])
                thresh = step_cache_xs[1]

                def step_fn_adaptive(carry, per_step):
                    latents, old_x0, key, cached, prev, accum = carry
                    d = jnp.mean(jnp.abs(latents - prev)) / (
                        jnp.mean(jnp.abs(prev)) + 1e-8)
                    accum = accum + d
                    compute = per_step["forced"] | (accum >= thresh)
                    noise_pred = jax.lax.cond(
                        compute,
                        lambda lat: raw_pred(lat, per_step["t"]),
                        lambda lat: cached,
                        latents)
                    accum = jnp.where(compute, 0.0, accum)
                    new_latents, old_x0, key = advance(
                        noise_pred, latents, old_x0, key, per_step)
                    return (new_latents, old_x0, key, noise_pred, latents, accum), None

                (latents, _, _, _, _, _), _ = jax.lax.scan(
                    step_fn_adaptive,
                    init + (cached0, latents, jnp.float32(0.0)), per_step)
                return latents

            per_step = dict(per_step, compute=step_cache_xs[0])

            def step_fn_cached(carry, per_step):
                latents, old_x0, key, cached = carry
                noise_pred = jax.lax.cond(
                    per_step["compute"],
                    lambda lat: raw_pred(lat, per_step["t"]),
                    lambda lat: cached,
                    latents)
                latents, old_x0, key = advance(noise_pred, latents, old_x0, key, per_step)
                return (latents, old_x0, key, noise_pred), None

            (latents, _, _, _), _ = jax.lax.scan(
                step_fn_cached, init + (cached0,), per_step)
            return latents

        cache[key] = denoise
        return denoise

    def _denoise_streamed(self, latents, image_latents, ref_latents,
                          ref_image_latents, prompt_embeds, prompt_embeds_ref,
                          ts, step_scalars, guidance, key, sc, use_dpm,
                          height, width, num_latent_frames, ref_type,
                          single_branch, concat_refs, t2v, num_mot_ref, do_cfg):
        """Python-level denoise loop for streamed block offload
        (pipelines/streamed.py): per-step math mirrors the jitted scan
        exactly (same raw_pred / CFG-combine / scheduler step / DPM key
        sequence; step-cache decisions move to host)."""
        from .streamed import StreamedCogTransformer

        cfg = self.transformer_cfg
        runners = self.__dict__.setdefault("_streamed_runners", {})
        runner_key = (self.offload_blocks_chunk, single_branch, num_mot_ref)
        runner = runners.get(runner_key)
        if runner is None:
            runner = StreamedCogTransformer(
                self.params["transformer"], cfg, self.offload_blocks_chunk,
                mot=not single_branch, num_mot_ref=num_mot_ref)
            runners[runner_key] = runner

        rope = prepare_cogvideox_rotary_embeddings(
            height, width, num_latent_frames,
            attention_head_dim=cfg.attention_head_dim, patch_size=cfg.patch_size,
            patch_size_t=cfg.patch_size_t, sample_width=cfg.sample_width,
            sample_height=cfg.sample_height, vae_scale_factor_spatial=self.vae_scale_factor_spatial,
        )
        rope_ref = prepare_cogvideox_rotary_embeddings(
            height, width, num_latent_frames,
            attention_head_dim=cfg.attention_head_dim, patch_size=cfg.patch_size,
            patch_size_t=cfg.patch_size_t, sample_width=cfg.sample_width,
            sample_height=cfg.sample_height, vae_scale_factor_spatial=self.vae_scale_factor_spatial,
            mot_num=num_mot_ref, ref_type=ref_type,
        )

        bsz = latents.shape[0]
        mult = 2 if do_cfg else 1
        image_in = jnp.concatenate([image_latents] * mult, axis=0)
        ref_in = jnp.concatenate(
            [jnp.concatenate([ref_latents] * mult, axis=0),
             jnp.concatenate([ref_image_latents] * mult, axis=0)], axis=2)

        def raw_pred(lat, t):
            latent_in = jnp.concatenate([lat.astype(self.dtype)] * mult, axis=0)
            if not t2v:
                latent_in = jnp.concatenate([latent_in, image_in], axis=2)
            tt = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (mult * bsz,))
            if single_branch:
                tgt_frames = lat.shape[1]
                if concat_refs:
                    latent_in = jnp.concatenate([latent_in, ref_in], axis=1)
                    rope_cat = (jnp.concatenate([rope[0], rope_ref[0]], axis=0),
                                jnp.concatenate([rope[1], rope_ref[1]], axis=0))
                else:
                    rope_cat = rope
                pred, _ = runner(
                    hidden_states=latent_in, encoder_hidden_states=prompt_embeds,
                    timestep=tt, image_rotary_emb=rope_cat, single_branch=True)
                pred = pred[:, :tgt_frames]
            else:
                pred, _ = runner(
                    hidden_states=latent_in, encoder_hidden_states=prompt_embeds,
                    timestep=tt, image_rotary_emb=rope,
                    hidden_states_mot_ref=ref_in,
                    encoder_hidden_states_mot_ref=prompt_embeds_ref,
                    image_rotary_emb_mot_ref=rope_ref, num_mot_ref=num_mot_ref)
            return pred.astype(jnp.float32)

        scheduler = self.scheduler
        latents = latents.astype(jnp.float32)
        old_x0 = jnp.zeros_like(latents)
        cached = None
        prev, accum = latents, 0.0
        for i in range(len(ts)):
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
            noise_pred = cached
            if do_cfg:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + float(guidance[i]) * (cond - uncond)
            per_coeffs = tuple(c[i] for c in step_scalars)
            if use_dpm:
                key, nkey = jax.random.split(key)
                noise = jax.random.normal(nkey, latents.shape, jnp.float32)
                latents, old_x0 = scheduler.step(
                    noise_pred, latents, old_x0, per_coeffs, noise)
            else:
                a_t, b_t, ap_t = per_coeffs
                latents = scheduler.step(noise_pred, latents, a_t, b_t, ap_t)
        runner.release()
        return latents

    # ------------------------------------------------------------------
    # full generation
    # ------------------------------------------------------------------
    def __call__(
        self,
        image: np.ndarray,                       # [H, W, 3] float in [-1, 1]
        prompt: str = None,
        ref_videos: Optional[List[np.ndarray]] = None,  # list of [F, H, W, 3] in [-1, 1]
        prompt_mot_ref: Optional[List[str]] = None,
        negative_prompt: str = DEFAULT_NEGATIVE_PROMPT,
        negative_prompt_mot_ref: str = DEFAULT_NEGATIVE_PROMPT,
        height: int = 480,
        width: int = 720,
        num_frames: int = 49,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        use_dynamic_cfg: bool = True,
        seed: int = 42,
        ref_type: str = "continous_negative",
        max_sequence_length: int = 226,
        prompt_embeds: Optional[Array] = None,
        negative_prompt_embeds: Optional[Array] = None,
        prompt_embeds_mot_ref: Optional[Array] = None,
        negative_prompt_embeds_mot_ref: Optional[Array] = None,
        latents: Optional[Array] = None,
        output_type: str = "np",
        ablation_single_branch: bool = False,
        baseline_single_condition: bool = False,
        step_cache: Optional[str] = None,   # e.g. "uniform:2" — see pipelines/step_cache.py
    ):
        key = jax.random.PRNGKey(seed)
        do_cfg = guidance_scale > 1.0
        # plain mode (no reference videos): sample a crush_smol-style
        # generic finetune — single trunk, no MoT stream; with image=None the
        # model is T2V (in_channels == latent channels, no image-latent concat)
        plain = not ref_videos and prompt_embeds_mot_ref is None
        t2v = plain and image is None
        single_branch = ablation_single_branch or baseline_single_condition or plain
        concat_refs = ablation_single_branch and not baseline_single_condition and not plain

        # 1. prompts
        if prompt_embeds is None:
            prompt_embeds, negative_prompt_embeds = self.encode_prompt(prompt, negative_prompt, max_sequence_length)
        embeds = jnp.concatenate([negative_prompt_embeds, prompt_embeds], axis=0) if do_cfg else prompt_embeds

        if plain:
            embeds_ref = jnp.zeros_like(embeds[:, :1])  # unused (DCE'd) dummy
        else:
            if prompt_embeds_mot_ref is None:
                pe_list, ne_list = [], []
                for p in prompt_mot_ref:
                    pe, ne = self.encode_prompt(p, negative_prompt_mot_ref, max_sequence_length)
                    pe_list.append(pe)
                    ne_list.append(ne)
                prompt_embeds_mot_ref = jnp.concatenate(pe_list, axis=1)
                negative_prompt_embeds_mot_ref = jnp.concatenate(ne_list, axis=1)
            embeds_ref = (
                jnp.concatenate([negative_prompt_embeds_mot_ref, prompt_embeds_mot_ref], axis=0)
                if do_cfg else prompt_embeds_mot_ref
            )

        # 2. latents
        num_latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        # CogVideoX 1.5 (patch_size_t=2): pad the latent frame count to a
        # multiple of patch_size_t; the leading pad frames are discarded
        # before decode (reference __call__ :884-893, :1080)
        pt = self.transformer_cfg.patch_size_t
        additional_frames = 0
        if pt is not None and num_latent_frames % pt != 0:
            additional_frames = pt - num_latent_frames % pt
            num_latent_frames += additional_frames
        lat_h = height // self.vae_scale_factor_spatial
        lat_w = width // self.vae_scale_factor_spatial
        latent_channels = (self.transformer_cfg.in_channels if t2v
                           else self.transformer_cfg.in_channels // 2)

        if t2v:
            image_latents = jnp.zeros(
                (1, num_latent_frames, lat_h, lat_w, latent_channels), jnp.float32)
        else:
            img = jnp.asarray(image, jnp.float32)[None, None]  # [1, 1, H, W, 3]
            image_latents = self._vae_encode_mode(img, image_cond=True)  # [1, 1, h, w, Cz]
            pad = jnp.zeros((1, num_latent_frames - 1, lat_h, lat_w, latent_channels), image_latents.dtype)
            image_latents = jnp.concatenate([image_latents, pad], axis=1)

        ref_lat_list, ref_img_lat_list = [], []
        for rv in (ref_videos or []):
            rv_j = jnp.asarray(rv, jnp.float32)[None]  # [1, F, H, W, 3]
            rl = self._vae_encode_mode(rv_j)
            if pt is not None:
                # reference prepare_latents :424-442: pad refs by repeating
                # the LAST latent frame up to a multiple of patch_size_t.
                # NB the reference computes `pt - size % pt`, which adds a
                # full extra pt when already divisible and then crashes at
                # the ref/ref-image channel concat (shape mismatch vs the
                # unpadded target); here the pad is 0 in that case so even
                # latent frame counts (e.g. 29f -> 8 latents at pt=2) work.
                extra = -rl.shape[1] % pt
                if extra:
                    rl = jnp.concatenate(
                        [rl, jnp.broadcast_to(rl[:, -1:], (1, extra) + rl.shape[2:])], axis=1)
            ref_lat_list.append(rl)
            first = rv_j[:, :1]
            fl = self._vae_encode_mode(first, image_cond=True)
            fl = jnp.concatenate(
                [fl, jnp.zeros((1, num_latent_frames - 1, lat_h, lat_w, latent_channels), fl.dtype)], axis=1)
            ref_img_lat_list.append(fl)
        if plain:
            # unused (DCE'd) dummies with consistent shapes
            ref_latents = jnp.zeros_like(image_latents)
            ref_image_latents = jnp.zeros_like(image_latents)
            num_mot_ref = 1
        else:
            ref_latents = jnp.concatenate(ref_lat_list, axis=1)
            ref_image_latents = jnp.concatenate(ref_img_lat_list, axis=1)
            num_mot_ref = ref_latents.shape[1] // num_latent_frames

        key, nkey = jax.random.split(key)
        if latents is None:
            latents = jax.random.normal(
                nkey, (1, num_latent_frames, latent_channels, lat_h, lat_w), jnp.float32)
        latents = latents * self.scheduler.init_noise_sigma

        # channel-last latents -> transformer layout [B, F, C, H, W]
        to_fchw = lambda x: x.transpose(0, 1, 4, 2, 3)
        image_latents_m = to_fchw(image_latents).astype(self.dtype)
        ref_latents_m = to_fchw(ref_latents).astype(self.dtype)
        ref_image_latents_m = to_fchw(ref_image_latents).astype(self.dtype)

        # 3. per-step scalars
        use_dpm = isinstance(self.scheduler, CogVideoXDPMScheduler)
        ts = self.scheduler.timesteps(num_inference_steps).astype(np.float32)
        coeffs = self.scheduler.step_coefficients(num_inference_steps)
        step_scalars = tuple(jnp.asarray(c) for c in coeffs)
        if use_dynamic_cfg:
            guidance = dynamic_cfg_schedule(ts, guidance_scale, num_inference_steps).astype(np.float32)
        else:
            guidance = np.full_like(ts, guidance_scale)

        from .step_cache import parse_step_cache

        sc = parse_step_cache(step_cache, num_inference_steps)
        if sc is None:
            cache_xs = ()
        elif sc.kind == "uniform":
            cache_xs = (jnp.asarray(sc.mask),)
        else:  # adaptive: forced mask + runtime threshold
            cache_xs = (jnp.asarray(sc.mask), jnp.float32(sc.thresh))
        key, dkey = jax.random.split(key)
        if self.offload_blocks_chunk:
            latents = self._denoise_streamed(
                latents, image_latents_m, ref_latents_m, ref_image_latents_m,
                embeds, embeds_ref, ts, step_scalars, guidance, dkey, sc,
                use_dpm, height, width, num_latent_frames, ref_type,
                single_branch, concat_refs, t2v, num_mot_ref, do_cfg)
        else:
            denoise = self._build_denoise_fn(
                num_inference_steps, num_mot_ref, use_dpm, height, width, num_latent_frames, ref_type,
                single_branch=single_branch, concat_refs=concat_refs,
                step_cached=sc.kind if sc is not None else False, t2v=t2v)
            latents = denoise(
                self._component("transformer"), latents, image_latents_m, ref_latents_m, ref_image_latents_m,
                embeds, embeds_ref, jnp.asarray(ts), step_scalars, jnp.asarray(guidance), dkey,
                *cache_xs, do_cfg=do_cfg,
            )

        if output_type == "latent":
            return latents

        # 4. decode: drop 1.5 pad frames, [B, F, C, H, W] -> channel-last,
        # unscale (the decode division keeps the factor even under
        # invert_scale_latents — reference decode_latents :491-496)
        latents = latents[:, additional_frames:]
        z = latents.transpose(0, 1, 3, 4, 2).astype(self.dtype) / self.vae_cfg.scaling_factor
        video = self._decode(z)
        return np.asarray(video.astype(jnp.float32))
