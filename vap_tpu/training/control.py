"""Control training (channel-expanded input conditioning).

Mirrors the reference ControlTrainer (finetrainers/trainer/control_trainer/):
the patch-embedding input layer is widened to accept [noisy ‖ control] latents
(2x in_features, +1 for frame-conditioning masks), with the original weights
copied into the first half and the control half zero-initialized; the control
condition is channel-concatenated every step. Control signals: canny edges or
frame conditioning (first-frame replication), computed host-side.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.cogvideox.config import CogVideoXMOTConfig
from ..models.cogvideox.transformer_mot import cogvideox_mot_forward
from ..ops.schedulers.common import add_noise, get_velocity, make_alphas_cumprod
from .train_step import _rope_tables


def expand_patch_embed_for_control(params: Dict[str, Any], extra_in_features: int,
                                   frame_conditioning_mask: bool = False) -> Dict[str, Any]:
    """Widen patch_embed.proj to accept control channels (control_trainer
    trainer.py:104-152): old kernel rows keep their weights, new rows start at
    zero so training begins at the unconditioned function."""
    proj = params["patch_embed"]["proj"]
    kernel = proj["kernel"]
    extra = extra_in_features + (1 if frame_conditioning_mask else 0)
    new_kernel = jnp.concatenate(
        [kernel, jnp.zeros((extra, kernel.shape[1]), kernel.dtype)], axis=0)
    out = dict(params)
    out["patch_embed"] = dict(params["patch_embed"], proj=dict(proj, kernel=new_kernel))
    return out


def canny_control(video: np.ndarray, low: int = 100, high: int = 200) -> np.ndarray:
    """Canny edges per frame ([F, H, W, 3] in [-1,1] -> same shape), the
    reference's CannyProcessor equivalent (finetrainers/processors/canny.py)."""
    import cv2

    frames = ((video + 1.0) * 127.5).astype(np.uint8)
    edges = []
    for f in frames:
        e = cv2.Canny(cv2.cvtColor(f, cv2.COLOR_RGB2GRAY), low, high)
        edges.append(np.repeat(e[..., None], 3, axis=-1))
    return np.stack(edges).astype(np.float32) / 127.5 - 1.0


def frame_conditioning_control(video: np.ndarray, mode: str = "first") -> np.ndarray:
    """Frame-conditioning control: replicate the first frame (or zeros past it)."""
    out = np.zeros_like(video)
    if mode == "first":
        out[:] = video[:1]
    elif mode == "first_and_last":
        out[:] = 0
        out[0] = video[0]
        out[-1] = video[-1]
    return out


@dataclasses.dataclass(frozen=True)
class ControlTrainStepConfig:
    model: CogVideoXMOTConfig      # with in_channels widened for control
    control_type: str = "canny"    # canny | frame_conditioning
    num_train_timesteps: int = 1000
    remat: bool = True


def control_loss(params, cfg: ControlTrainStepConfig, batch, key):
    """v-pred loss with [noisy ‖ control-latent] channel concat. batch:
    latents, control_latents (both [B, F, C, H, W]), encoder_hidden_states."""
    latents = batch["latents"].astype(jnp.float32)
    b, f_lat, c, lat_h, lat_w = latents.shape
    alphas_cumprod = jnp.asarray(make_alphas_cumprod(rescale_betas_zero_snr=True))

    k_t, k_n = jax.random.split(key)
    timesteps = jax.random.randint(k_t, (b,), 0, cfg.num_train_timesteps)
    noise = jax.random.normal(k_n, latents.shape, jnp.float32)
    noisy = add_noise(alphas_cumprod, latents, noise, timesteps)
    hidden = jnp.concatenate([noisy, batch["control_latents"].astype(jnp.float32)], axis=2)

    rope, _ = _rope_tables(cfg.model, lat_h, lat_w, f_lat, 1, "continous_negative")
    dtype = batch["encoder_hidden_states"].dtype
    velocity, _ = cogvideox_mot_forward(
        params, cfg.model,
        hidden_states=hidden.astype(dtype),
        encoder_hidden_states=batch["encoder_hidden_states"],
        timestep=timesteps.astype(jnp.float32),
        image_rotary_emb=rope,
        hidden_states_mot_ref=hidden.astype(dtype)[:, :0],  # unused
        encoder_hidden_states_mot_ref=batch["encoder_hidden_states"][:, :0],
        image_rotary_emb_mot_ref=rope,
        num_mot_ref=1,
        remat=cfg.remat,
        single_branch=True,
    )
    pred = get_velocity(alphas_cumprod, velocity.astype(jnp.float32), noisy, timesteps)
    weights = (1.0 / (1.0 - alphas_cumprod[timesteps])).reshape(b, 1, 1, 1, 1)
    loss = jnp.mean(weights * jnp.square(pred - latents))
    return loss, {"loss": loss}


def control_trainable_mask(params) -> Any:
    """Train the widened input layer (and optionally the full trunk); the
    reference trains LoRA + the control injection layer — here the injection
    layer itself is marked trainable."""
    def mark(path, leaf):
        names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        return "patch_embed" in names and "proj" in names
    return jax.tree_util.tree_map_with_path(mark, params)


def make_control_train_step(cfg: ControlTrainStepConfig, optimizer: optax.GradientTransformation,
                            full_finetune: bool = False):
    from .train_step import merge_params, partition_params

    def init_fn(params):
        if full_finetune:
            mask = jax.tree.map(lambda _: True, params)
        else:
            mask = control_trainable_mask(params)
        train, frozen = partition_params(params, mask)
        return train, frozen, optimizer.init(train)

    def step_fn(train_params, frozen_params, opt_state, batch, key):
        def loss_fn(tp):
            merged = merge_params(tp, frozen_params)
            return control_loss(merged, cfg, batch, key)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(train_params)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, train_params)
        train_params = optax.apply_updates(train_params, updates)
        return train_params, opt_state, metrics

    return init_fn, step_fn
