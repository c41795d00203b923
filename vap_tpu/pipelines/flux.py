"""Flux text-to-image pipeline — jit-scanned denoise.

Behavioral reference: diffusers FluxPipeline (used by the Flux spec's
validation path, finetrainers/models/flux/base_specification.py:366-389):
CLIP pooled + T5 sequence prompts, packed 16-ch latents at (h/16, w/16),
FlowMatchEuler sigmas linspace(1, 1/N) with resolution-dependent dynamic
shifting (base_shift 0.5 @256 tokens -> max_shift 1.15 @4096), guidance
DISTILLED into an embedding (single forward per step, no CFG batch).

TPU-native: the whole 28/50-step loop is one lax.scan inside jit; per-step
Euler deltas are precomputed host-side.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.autoencoder_kl import AutoencoderKLConfig, unscale_latents, vae2d_decode
from ..models.flux import FluxConfig, flux_forward, prepare_latent_image_ids, unpack_latents
from ..models.text_encoders.clip_text import CLIPTextConfig, clip_text_encode
from ..models.text_encoders.t5 import T5Config, t5_encode


def calculate_shift(seq_len: int, base_seq_len: int = 256, max_seq_len: int = 4096,
                    base_shift: float = 0.5, max_shift: float = 1.15) -> float:
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return seq_len * m + b


def shift_sigmas(sigmas: np.ndarray, mu: float) -> np.ndarray:
    return math.exp(mu) / (math.exp(mu) + (1.0 / sigmas - 1.0))


@dataclasses.dataclass
class FluxPipeline:
    transformer_cfg: FluxConfig
    vae_cfg: AutoencoderKLConfig
    text_cfg: T5Config                 # T5 (text_encoder_2)
    clip_text_cfg: CLIPTextConfig
    params: Dict[str, Any]             # transformer / vae / text_encoder / text_encoder_2
    tokenizer: Any = None              # T5 tokenizer
    clip_tokenizer: Any = None
    dtype: Any = jnp.bfloat16

    def encode_prompt(self, prompt: str, max_sequence_length: int = 512):
        toks = self.tokenizer([prompt], padding="max_length",
                              max_length=max_sequence_length, truncation=True,
                              add_special_tokens=True, return_tensors="np")
        embeds = t5_encode(self.params["text_encoder_2"], self.text_cfg,
                           jnp.asarray(toks["input_ids"]))
        clip_len = min(77, self.clip_text_cfg.max_position_embeddings)
        ctoks = (self.clip_tokenizer or self.tokenizer)(
            [prompt], padding="max_length", max_length=clip_len, truncation=True,
            return_tensors="np")
        _, pooled = clip_text_encode(self.params["text_encoder"], self.clip_text_cfg,
                                     jnp.asarray(ctoks["input_ids"]))
        return embeds.astype(self.dtype), pooled.astype(self.dtype)

    def __call__(
        self,
        prompt: str,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 28,
        guidance_scale: float = 3.5,
        seed: int = 0,
        max_sequence_length: int = 512,
        latents=None,
        output_type: str = "np",
    ) -> np.ndarray:
        cfg = self.transformer_cfg
        comp = self.vae_cfg.spatial_compression
        h2 = height // (comp * 2)  # packed grid
        w2 = width // (comp * 2)
        seq_len = h2 * w2
        c_packed = cfg.in_channels

        embeds, pooled = self.encode_prompt(prompt, max_sequence_length)
        if latents is None:
            key = jax.random.PRNGKey(seed)
            latents = jax.random.normal(key, (1, seq_len, c_packed), jnp.float32)
        latents = jnp.asarray(latents).astype(self.dtype)  # packed [1, S, C]

        sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
        mu = calculate_shift(seq_len)
        sigmas = shift_sigmas(sigmas, mu)
        sig = np.append(sigmas, 0.0).astype(np.float32)
        deltas = jnp.asarray(sig[1:] - sig[:-1])
        sig_t = jnp.asarray(sig[:-1])

        img_ids = prepare_latent_image_ids(h2, w2)
        guidance = jnp.full((1,), guidance_scale, jnp.float32)

        def fwd(x, t):
            return flux_forward(
                self.params["transformer"], cfg,
                hidden_states=x,
                encoder_hidden_states=embeds,
                pooled_projections=pooled,
                timestep=t,
                img_ids=img_ids,
                guidance=guidance if cfg.guidance_embeds else None,
                remat=False,
            )

        def step(x, args):
            t, dt = args
            pred = fwd(x, t[None])
            return (x.astype(jnp.float32) + dt * pred.astype(jnp.float32)).astype(x.dtype), None

        @jax.jit
        def denoise(latents):
            out, _ = jax.lax.scan(step, latents, (sig_t, deltas))
            return out

        latents = denoise(latents)
        if output_type == "latent":
            return latents
        z = unpack_latents(latents.astype(jnp.float32), h2 * 2, w2 * 2)  # [1, C, h, w]
        z = unscale_latents(self.vae_cfg, z.transpose(0, 2, 3, 1)).astype(self.dtype)
        image = vae2d_decode(self.params["vae"], self.vae_cfg, z)
        return np.asarray(jnp.clip(image.astype(jnp.float32), -1, 1))
