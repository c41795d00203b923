"""Control model specifications — Wan (video) and CogView4 (image).

TPU-native counterparts of the reference control specs
(finetrainers/models/wan/control_specification.py and
finetrainers/models/cogview4/control_specification.py): text conditions are
unchanged from the base specs; latent preparation additionally VAE-encodes the
control signal; validation samples with the live (widened + LoRA) weights
under per-step control channel concatenation (the reference's
`control_channel_concat` transformer patch, patches/dependencies/diffusers/
control.py — here the concat simply lives inside the jitted denoise step).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.schedulers.flow_match import FlowMatchEulerScheduler
from .control_trainer import apply_frame_conditioning_on_latents
from .specs import SUPPORTED_MODEL_SPECS, CogView4Spec, WanSpec


def _load_media(sample: Dict[str, Any], key: str):
    """Resolve an array or a path column to a normalized [-1,1] array."""
    v = sample.get(key)
    if v is None:
        return None
    if isinstance(v, str):
        if key.endswith("video"):
            from ..data.generic import _load_video_norm

            return _load_video_norm(v)
        from ..data.generic import load_image

        return load_image(v)
    return np.asarray(v)


class WanControlSpec(WanSpec):
    """Wan2.1 T2V control spec (reference WanControlModelSpecification). The
    transformer config passed in must already have widened in_channels
    (control_in_channels); weights loaded from a T2V checkpoint are widened by
    models.wan.expand_patch_embedding."""

    def prepare_conditions(self, sample: Dict[str, Any], max_length: int = 512) -> Dict[str, Any]:
        if "encoder_hidden_states" in sample:
            return {"encoder_hidden_states": np.asarray(sample["encoder_hidden_states"], np.float32)}
        toks = self.tokenizer([sample["caption"]], padding="max_length", max_length=max_length,
                              truncation=True, add_special_tokens=True, return_tensors="np")
        hidden = self._t5(self.params["text_encoder"],
                          jnp.asarray(toks["input_ids"]), jnp.asarray(toks["attention_mask"]))
        return {"encoder_hidden_states": np.asarray(hidden, np.float32)}

    def prepare_latents(self, sample: Dict[str, Any]) -> Dict[str, Any]:
        def enc(video_np: np.ndarray) -> np.ndarray:
            v = jnp.asarray(video_np, jnp.float32)[None].astype(self.dtype)
            return np.asarray(self._vae(self.params["vae"], v), np.float32)

        control = sample.get("control_video")
        if control is None:
            raise ValueError("control training requires a control_video column "
                             "(use ControlDatasetWrapper)")
        return {"latents": enc(sample["video"]), "control_latents": enc(control)}

    # ------------------------------------------------------------------
    def validation(self, merged_params, sample: Dict[str, Any], *,
                   num_inference_steps: int = 30, seed: int = 42,
                   guidance_scale: float = 5.0, shift: float = 3.0,
                   frame_conditioning_type: str = "full",
                   frame_conditioning_index: int = 0,
                   concatenate_mask: bool = False, **_) -> np.ndarray:
        """T2V sampling with per-step [x ‖ control] concat (reference
        control_specification.py:321-388). sample: caption + control_video
        (array or path; falls back to canny of `video`)."""
        from ..models.wan.transformer_mot import wan_forward
        from ..models.wan.vae import denormalize_latents, wan_vae_decode

        control = _load_media(sample, "control_video")
        if control is None:
            video = _load_media(sample, "video")
            if video is None:
                raise ValueError("validation sample needs control_video or video")
            from .control import canny_control

            control = canny_control(video)
        ctrl_lat = jnp.asarray(self._vae(
            self.params["vae"], jnp.asarray(control, jnp.float32)[None].astype(self.dtype)),
            jnp.float32)

        cond = self.prepare_conditions(sample)["encoder_hidden_states"]
        uncond = self.prepare_conditions(
            {"caption": sample.get("negative_prompt", "")})["encoder_hidden_states"]
        text = jnp.asarray(np.concatenate([cond, uncond], axis=0), self.dtype)

        ctrl = apply_frame_conditioning_on_latents(
            ctrl_lat, jax.random.PRNGKey(seed + 1), frame_conditioning_type,
            frame_conditioning_index, concatenate_mask)
        ctrl2 = jnp.concatenate([ctrl, ctrl], axis=0).astype(self.dtype)

        sched = FlowMatchEulerScheduler(shift=shift)
        sigmas = jnp.asarray(sched.sigmas(num_inference_steps))
        x = jax.random.normal(jax.random.PRNGKey(seed), ctrl_lat.shape[:4] + (16,), jnp.float32)

        cfg = self.transformer_cfg

        @jax.jit
        def denoise(x, text, ctrl2):
            def body(x, i):
                sigma, sigma_next = sigmas[i], sigmas[i + 1]
                hidden = jnp.concatenate(
                    [jnp.concatenate([x, x], axis=0).astype(self.dtype), ctrl2], axis=-1)
                t = jnp.full((2,), sigma * 1000.0, jnp.float32)
                v = wan_forward(merged_params, cfg, hidden_states=hidden,
                                timestep=t, encoder_hidden_states=text)
                v_c, v_u = jnp.split(v.astype(jnp.float32), 2, axis=0)
                v = v_u + guidance_scale * (v_c - v_u)
                return sched.step(v, x, sigma, sigma_next), None

            x, _ = jax.lax.scan(body, x, jnp.arange(num_inference_steps))
            return x

        x = denoise(x, text, ctrl2)
        video = wan_vae_decode(self.params["vae"],
                               self.vae_cfg, denormalize_latents(self.vae_cfg, x).astype(self.dtype))
        return np.asarray(jnp.clip(video[0].astype(jnp.float32), -1, 1))


class CogView4ControlSpec(CogView4Spec):
    """CogView4 control spec (reference CogView4ControlModelSpecification):
    canny-or-custom control image, channel-concatenated."""

    def prepare_latents(self, sample: Dict[str, Any]) -> Dict[str, Any]:
        out = super().prepare_latents(sample)
        control = sample.get("control_image")
        if control is None:
            raise ValueError("control training requires a control_image column")
        img = jnp.asarray(control, jnp.float32)[None].astype(self.dtype)
        lat = np.asarray(self._vae(self.params["vae"], img), np.float32)
        out["control_latents"] = lat.transpose(0, 3, 1, 2)
        return out

    def validation(self, merged_params, sample: Dict[str, Any], *,
                   num_inference_steps: int = 30, seed: int = 42,
                   guidance_scale: float = 5.0, **_) -> np.ndarray:
        from ..models.autoencoder_kl import unscale_latents, vae2d_decode
        from ..models.cogview4.transformer import cogview4_forward

        control = _load_media(sample, "control_image")
        if control is None:
            image = _load_media(sample, "image")
            if image is None:
                raise ValueError("validation sample needs control_image or image")
            from .control import canny_control

            control = canny_control(image[None])[0]
        img = jnp.asarray(control, jnp.float32)[None].astype(self.dtype)
        ctrl_lat = jnp.asarray(self._vae(self.params["vae"], img), jnp.float32).transpose(0, 3, 1, 2)

        cond = self.prepare_conditions(sample)["encoder_hidden_states"]
        uncond = self.prepare_conditions(
            {"caption": sample.get("negative_prompt", "")})["encoder_hidden_states"]
        text = jnp.asarray(np.concatenate([cond, uncond], axis=0), self.dtype)
        ctrl2 = jnp.concatenate([ctrl_lat, ctrl_lat], axis=0).astype(self.dtype)

        b, c, h, w = ctrl_lat.shape
        cfgm = self.transformer_cfg
        seq = (h * w) // (cfgm.patch_size ** 2)
        mu = (seq / 256) ** 0.5 * 0.75 + 0.25
        sched = FlowMatchEulerScheduler(shift=1.0)
        base = sched.sigmas(num_inference_steps)
        sigmas = jnp.asarray(mu / (mu + (1.0 / np.maximum(base, 1e-9) - 1.0)) * (base > 0))
        size = jnp.asarray([[h * 8, w * 8]], jnp.float32)
        size2 = jnp.concatenate([size, size], axis=0)
        x = jax.random.normal(jax.random.PRNGKey(seed), (1, c, h, w), jnp.float32)

        @jax.jit
        def denoise(x, text, ctrl2):
            def body(x, i):
                sigma, sigma_next = sigmas[i], sigmas[i + 1]
                hidden = jnp.concatenate(
                    [jnp.concatenate([x, x], axis=0).astype(self.dtype), ctrl2], axis=1)
                t = jnp.full((2,), sigma * 1000.0, jnp.float32)
                pred = cogview4_forward(
                    merged_params, cfgm, hidden_states=hidden,
                    encoder_hidden_states=text, timestep=t,
                    original_size=size2, target_size=size2,
                    crop_coords=jnp.zeros((2, 2), jnp.float32), remat=False)
                p_c, p_u = jnp.split(pred.astype(jnp.float32), 2, axis=0)
                pred = p_u + guidance_scale * (p_c - p_u)
                return sched.step(pred, x, sigma, sigma_next), None

            x, _ = jax.lax.scan(body, x, jnp.arange(num_inference_steps))
            return x

        x = denoise(x, text, ctrl2)
        z = unscale_latents(self.vae_cfg, x.transpose(0, 2, 3, 1).astype(self.dtype))
        img_out = vae2d_decode(self.params["vae"], self.vae_cfg, z)
        return np.asarray(jnp.clip(img_out[0].astype(jnp.float32), -1, 1))


for _tt in ("control_lora", "control_full_finetune"):
    SUPPORTED_MODEL_SPECS[("wan", _tt)] = WanControlSpec
    SUPPORTED_MODEL_SPECS[("cogview4", _tt)] = CogView4ControlSpec
