"""HunyuanVideo text-to-video pipeline — jit-scanned denoise.

Behavioral reference: diffusers HunyuanVideoPipeline
(pipeline_hunyuan_video.py): LLaMA prompt embeds with an instruction template
(crop_start tokens dropped) + CLIP-L pooled prompt, guidance DISTILLED into an
embedding (single forward per step; true-CFG optional), FlowMatchEuler with
constant sigma shift (flow_shift=7.0 by default for 720p),
sigmas = linspace(1, 0, N+1)[:-1].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hunyuan_video import HunyuanVideoConfig, hunyuan_video_forward
from ..models.hunyuan_video.vae import (
    HunyuanVideoVAEConfig, hunyuan_vae_decode)
from ..models.text_encoders.clip_text import CLIPTextConfig, clip_text_encode
from ..models.text_encoders.llama import LlamaConfig, llama_encode

# the reference's default llava template (pipeline_hunyuan_video.py:70-83)
DEFAULT_PROMPT_TEMPLATE_PREFIX = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the video by detailing "
    "the following aspects: 1. The main content and theme of the video."
    "2. The color, shape, size, texture, quantity, text, and spatial relationships of the objects."
    "3. Actions, events, behaviors temporal relationships, physical movement changes of the objects."
    "4. background environment, light, style and atmosphere."
    "5. camera angles, movements, and transitions used in the video:<|eot_id|>"
    "<|start_header_id|>user<|end_header_id|>\n\n"
)
DEFAULT_PROMPT_TEMPLATE_SUFFIX = "<|eot_id|>"


def shift_sigmas_constant(sigmas: np.ndarray, shift: float) -> np.ndarray:
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


@dataclasses.dataclass
class HunyuanVideoPipeline:
    transformer_cfg: HunyuanVideoConfig
    vae_cfg: HunyuanVideoVAEConfig
    text_cfg: LlamaConfig
    clip_text_cfg: CLIPTextConfig
    params: Dict[str, Any]  # transformer / vae / text_encoder / text_encoder_2
    tokenizer: Any = None       # LLaMA tokenizer
    clip_tokenizer: Any = None
    dtype: Any = jnp.bfloat16
    flow_shift: float = 7.0

    def encode_prompt(self, prompt: str, max_length: int = 256,
                      use_template: bool = True, crop_start: int = 95):
        # reference _get_llama_prompt_embeds (pipeline_hunyuan_video.py:
        # 199-256): llava template + crop_start, and conditioning comes from
        # hidden_states[-3] (num_hidden_layers_to_skip=2), not the final norm
        text = (DEFAULT_PROMPT_TEMPLATE_PREFIX + prompt +
                DEFAULT_PROMPT_TEMPLATE_SUFFIX) if use_template else prompt
        pad_len = max_length + (crop_start if use_template else 0)
        toks = self.tokenizer([text], padding="max_length", max_length=pad_len,
                              truncation=True, return_tensors="np")
        hidden = llama_encode(self.params["text_encoder"], self.text_cfg,
                              jnp.asarray(toks["input_ids"]),
                              jnp.asarray(toks["attention_mask"]),
                              hidden_layer=-3)
        mask_np = np.asarray(toks["attention_mask"], np.float32)
        if use_template:
            hidden = hidden[:, crop_start:]
            mask_np = mask_np[:, crop_start:]
        # the transformer reduces the mask to per-sample KV lengths for the
        # fused varlen attention (hunyuan transformer docstring) — validate
        # the contiguous right-padding assumption HERE, while the mask is
        # still a concrete host array (inside jit the reduction is silent)
        lens = mask_np.sum(axis=-1).astype(np.int64)
        prefix = (np.arange(mask_np.shape[-1])[None, :] < lens[:, None]).astype(np.float32)
        if not np.array_equal(mask_np, prefix):
            raise ValueError(
                "LLaMA attention mask is not a contiguous right-padded prefix; "
                "the fused varlen attention assumes suffix padding. Use a "
                "right-padding tokenizer configuration.")
        mask = jnp.asarray(mask_np)
        clip_len = min(77, self.clip_text_cfg.max_position_embeddings)
        ctoks = (self.clip_tokenizer or self.tokenizer)(
            [prompt], padding="max_length", max_length=clip_len, truncation=True,
            return_tensors="np")
        _, pooled = clip_text_encode(self.params["text_encoder_2"], self.clip_text_cfg,
                                     jnp.asarray(ctoks["input_ids"]))
        return hidden.astype(self.dtype), mask, pooled.astype(self.dtype)

    def __call__(
        self,
        prompt: str,
        height: int = 720,
        width: int = 1280,
        num_frames: int = 129,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        seed: int = 0,
        max_sequence_length: int = 256,
        use_template: bool = True,
        latents=None,
        output_type: str = "np",
    ) -> np.ndarray:
        cfg = self.transformer_cfg
        sc = self.vae_cfg.spatial_compression_ratio
        tc = self.vae_cfg.temporal_compression_ratio
        lf = (num_frames - 1) // tc + 1
        lh, lw = height // sc, width // sc

        embeds, mask, pooled = self.encode_prompt(prompt, max_sequence_length, use_template)
        if latents is None:
            key = jax.random.PRNGKey(seed)
            latents = jax.random.normal(
                key, (1, self.vae_cfg.latent_channels, lf, lh, lw), jnp.float32)
        latents = jnp.asarray(latents, jnp.float32)

        sigmas = np.linspace(1.0, 0.0, num_inference_steps + 1)[:-1]
        sigmas = shift_sigmas_constant(sigmas, self.flow_shift)
        sig = np.append(sigmas, 0.0).astype(np.float32)
        deltas = jnp.asarray(sig[1:] - sig[:-1])
        sig_t = jnp.asarray(sig[:-1])
        guidance = jnp.full((1,), guidance_scale * 1000.0, jnp.float32)

        def step(x, args):
            t, dt = args
            pred = hunyuan_video_forward(
                self.params["transformer"], cfg,
                hidden_states=x.astype(self.dtype),
                encoder_hidden_states=embeds,
                pooled_projections=pooled,
                timestep=jnp.full((1,), t * 1000.0, jnp.float32),
                guidance=guidance,
                encoder_attention_mask=mask,
                remat=False,
            ).astype(jnp.float32)
            return x + dt * pred, None

        @jax.jit
        def denoise(latents):
            out, _ = jax.lax.scan(step, latents, (sig_t, deltas))
            return out

        z = denoise(latents)
        if output_type == "latent":
            return z  # pre-unscale, as in the reference pipeline
        z = z / self.vae_cfg.scaling_factor
        z = z.transpose(0, 2, 3, 4, 1).astype(self.dtype)  # -> [B, F, H, W, C]
        video = hunyuan_vae_decode(self.params["vae"], self.vae_cfg, z)
        return np.asarray(jnp.clip(video.astype(jnp.float32), -1, 1))
