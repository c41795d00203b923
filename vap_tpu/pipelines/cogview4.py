"""CogView4 text-to-image pipeline — jit-scanned denoise.

Behavioral reference: diffusers CogView4Pipeline (pipeline_cogview4.py):
GLM-4 prompt embeds (penultimate layer, 'longest' left-padded to /16),
16-ch latents at (h/8, w/8), FlowMatchEuler sigmas floor(linspace(1000,1,N))/1000 with
LINEAR resolution-dependent shifting (mu = sqrt(seq/256)*0.75 + 0.25;
sigma' = mu / (mu + 1/sigma - 1)), two sequential CFG forwards (cond and
uncond text differ in length and GLM pads are attended — they cannot share
a batch), SDXL-style size conditions.

TPU-native: the full loop is one lax.scan (two forwards per step under CFG).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.autoencoder_kl import AutoencoderKLConfig, unscale_latents, vae2d_decode
from ..models.cogview4 import CogView4Config, cogview4_forward
from ..models.text_encoders.glm import GlmConfig


def calculate_shift(seq_len: int, base_seq_len: int = 256,
                    base_shift: float = 0.25, max_shift: float = 0.75) -> float:
    return (seq_len / base_seq_len) ** 0.5 * max_shift + base_shift


def shift_sigmas_linear(sigmas: np.ndarray, mu: float) -> np.ndarray:
    return mu / (mu + (1.0 / sigmas - 1.0))


@dataclasses.dataclass
class CogView4Pipeline:
    transformer_cfg: CogView4Config
    vae_cfg: AutoencoderKLConfig
    text_cfg: Optional[GlmConfig]
    params: Dict[str, Any]          # transformer / vae / text_encoder
    tokenizer: Any = None
    dtype: Any = jnp.bfloat16

    def encode_prompt(self, prompt: str, max_length: int = 1024):
        # reference pipeline_cogview4.py:190-216: 'longest' + left-pad to a
        # multiple of 16, penultimate hidden layer, no attention mask
        from ..models.text_encoders.glm import cogview4_glm_embeds

        return cogview4_glm_embeds(
            self.params["text_encoder"], self.text_cfg, self.tokenizer,
            prompt, max_sequence_length=max_length).astype(self.dtype)

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        guidance_scale: float = 3.5,
        seed: int = 0,
        max_sequence_length: int = 1024,
        latents=None,
        output_type: str = "np",
    ) -> np.ndarray:
        cfg = self.transformer_cfg
        comp = self.vae_cfg.spatial_compression
        lh, lw = height // comp, width // comp
        seq_len = (lh * lw) // cfg.patch_size ** 2

        # cond/uncond embeds have DIFFERENT lengths ('longest' padding) and
        # GLM pads are attended — CFG cannot fold into the batch; the
        # reference runs two sequential forwards (pipeline_cogview4.py:622-646)
        cond = self.encode_prompt(prompt, max_sequence_length)
        uncond = self.encode_prompt(negative_prompt, max_sequence_length)

        if latents is None:
            key = jax.random.PRNGKey(seed)
            latents = jax.random.normal(key, (1, cfg.in_channels, lh, lw), jnp.float32)
        latents = jnp.asarray(latents, jnp.float32)

        # reference sigma base (pipeline_cogview4.py:589-595): integer
        # timesteps linspace(1000, 1, N) floored, over num_train_timesteps —
        # NOT linspace(1, 1/N)
        ts = np.linspace(1000.0, 1.0, num_inference_steps).astype(np.int64)
        sigmas = ts.astype(np.float32) / 1000.0
        sigmas = shift_sigmas_linear(sigmas, calculate_shift(seq_len))
        sig = np.append(sigmas, 0.0).astype(np.float32)
        deltas = jnp.asarray(sig[1:] - sig[:-1])
        sig_t = jnp.asarray(sig[:-1])

        size = jnp.asarray([[height, width]], jnp.float32)
        crop = jnp.zeros((1, 2), jnp.float32)
        g = jnp.float32(guidance_scale)
        do_cfg = guidance_scale > 1.0

        def fwd(x, t, embeds):
            return cogview4_forward(
                self.params["transformer"], cfg,
                hidden_states=x.astype(self.dtype),
                encoder_hidden_states=embeds,
                timestep=jnp.full((1,), t * 1000.0, jnp.float32),
                original_size=size, target_size=size, crop_coords=crop,
                remat=False,
            ).astype(jnp.float32)

        def step(x, args):
            t, dt = args
            cond_p = fwd(x, t, cond)
            if do_cfg:
                uncond_p = fwd(x, t, uncond)
                noise_pred = uncond_p + g * (cond_p - uncond_p)
            else:
                noise_pred = cond_p
            return x + dt * noise_pred, None

        @jax.jit
        def denoise(latents):
            out, _ = jax.lax.scan(step, latents, (sig_t, deltas))
            return out

        z = denoise(latents)
        if output_type == "latent":
            return z
        z = unscale_latents(self.vae_cfg, z.transpose(0, 2, 3, 1)).astype(self.dtype)
        image = vae2d_decode(self.params["vae"], self.vae_cfg, z)
        return np.asarray(jnp.clip(image.astype(jnp.float32), -1, 1))
