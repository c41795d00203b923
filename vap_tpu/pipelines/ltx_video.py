"""LTX-Video text-to-video pipeline — jit-scanned denoise.

Behavioral reference: diffusers LTXPipeline (pipeline_ltx.py): T5 prompt
embeds with attention mask, packed latents, FlowMatchEuler sigmas
linspace(1, 1/N) with Flux-style exponential dynamic shifting over the video
sequence length, two-branch CFG folded into the batch, per-frame-rate RoPE
interpolation, per-channel latent denormalization before decode.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ltx_video import LTXVideoConfig, ltx_video_forward, pack_ltx_latents
from ..models.ltx_video.vae import (
    LTXVideoVAEConfig, denormalize_latents, ltx_vae_decode)
from ..models.text_encoders.t5 import T5Config, t5_encode
from .flux import calculate_shift, shift_sigmas


@dataclasses.dataclass
class LTXVideoPipeline:
    transformer_cfg: LTXVideoConfig
    vae_cfg: LTXVideoVAEConfig
    text_cfg: T5Config
    params: Dict[str, Any]  # transformer / vae / text_encoder
    tokenizer: Any = None
    dtype: Any = jnp.bfloat16
    frame_rate: float = 25.0
    vae_temporal_compression: int = 8
    vae_spatial_compression: int = 32

    def encode_prompt(self, prompt: str, max_length: int = 128):
        # reference _get_t5_prompt_embeds (pipeline_ltx.py:248-270): the T5
        # runs WITHOUT the attention mask (pads attended) and the embeds are
        # NOT zeroed — masking only happens via the transformer's
        # encoder_attention_mask
        toks = self.tokenizer([prompt], padding="max_length", max_length=max_length,
                              truncation=True, add_special_tokens=True,
                              return_tensors="np")
        mask = jnp.asarray(toks["attention_mask"], jnp.float32)
        embeds = t5_encode(self.params["text_encoder"], self.text_cfg,
                           jnp.asarray(toks["input_ids"]))
        return embeds.astype(self.dtype), mask

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        height: int = 512,
        width: int = 768,
        num_frames: int = 161,
        num_inference_steps: int = 50,
        guidance_scale: float = 3.0,
        seed: int = 0,
        max_sequence_length: int = 128,
        latents=None,
        output_type: str = "np",
    ) -> np.ndarray:
        cfg = self.transformer_cfg
        tc, sc = self.vae_temporal_compression, self.vae_spatial_compression
        lf = (num_frames - 1) // tc + 1
        lh, lw = height // sc, width // sc
        seq_len = lf * lh * lw

        cond, cond_mask = self.encode_prompt(prompt, max_sequence_length)
        uncond, uncond_mask = self.encode_prompt(negative_prompt, max_sequence_length)
        embeds = jnp.concatenate([uncond, cond], axis=0)
        masks = jnp.concatenate([uncond_mask, cond_mask], axis=0)

        if latents is None:
            key = jax.random.PRNGKey(seed)
            latents = jax.random.normal(
                key, (1, cfg.in_channels, lf, lh, lw), jnp.float32)
        packed = pack_ltx_latents(jnp.asarray(latents, jnp.float32),
                                  cfg.patch_size, cfg.patch_size_t)

        sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
        sigmas = shift_sigmas(sigmas, calculate_shift(seq_len))
        sig = np.append(sigmas, 0.0).astype(np.float32)
        deltas = jnp.asarray(sig[1:] - sig[:-1])
        sig_t = jnp.asarray(sig[:-1])

        rope_scale = (tc / self.frame_rate, float(sc), float(sc))
        g = jnp.float32(guidance_scale)

        def step(x, args):
            t, dt = args
            pred = ltx_video_forward(
                self.params["transformer"], cfg,
                hidden_states=jnp.concatenate([x, x], axis=0).astype(self.dtype),
                encoder_hidden_states=embeds,
                timestep=jnp.full((2,), t * 1000.0, jnp.float32),
                num_frames=lf // cfg.patch_size_t, height=lh // cfg.patch_size,
                width=lw // cfg.patch_size,
                rope_interpolation_scale=rope_scale,
                encoder_attention_mask=masks,
                remat=False,
            ).astype(jnp.float32)
            uncond_p, cond_p = pred[:1], pred[1:]
            noise_pred = uncond_p + g * (cond_p - uncond_p)
            return x + dt * noise_pred, None

        @jax.jit
        def denoise(packed):
            out, _ = jax.lax.scan(step, packed, (sig_t, deltas))
            return out

        packed = denoise(packed)
        if output_type == "latent":
            return packed  # packed latents, as in the reference pipeline
        # unpack [B, S, C*pt*p*p] -> [B, C, F, H, W] (inverse of pack)
        b = packed.shape[0]
        pt, p = cfg.patch_size_t, cfg.patch_size
        z = packed.reshape(b, lf // pt, lh // p, lw // p, -1, pt, p, p)
        z = z.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(b, -1, lf, lh, lw)
        z = denormalize_latents(self.vae_cfg, z.transpose(0, 2, 3, 4, 1))  # NFHWC
        video = ltx_vae_decode(self.params["vae"], self.vae_cfg, z.astype(self.dtype))
        return np.asarray(jnp.clip(video.astype(jnp.float32), -1, 1))
