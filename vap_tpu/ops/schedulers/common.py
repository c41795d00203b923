"""Shared noise-schedule math (pure numpy/jnp, no state).

Matches the reference CogVideoX schedulers
(diffusers/src/diffusers/schedulers/scheduling_ddim_cogvideox.py:51-125):
scaled-linear betas computed in float64, SD3-style SNR shift, optional
zero-terminal-SNR rescale.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def make_betas(num_train_timesteps: int, beta_start: float, beta_end: float, beta_schedule: str) -> np.ndarray:
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float32)
    if beta_schedule == "scaled_linear":
        return (np.linspace(beta_start ** 0.5, beta_end ** 0.5, num_train_timesteps, dtype=np.float64) ** 2)
    if beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        betas = [
            min(1 - alpha_bar((i + 1) / num_train_timesteps) / alpha_bar(i / num_train_timesteps), 0.999)
            for i in range(num_train_timesteps)
        ]
        return np.array(betas, dtype=np.float32)
    raise NotImplementedError(beta_schedule)


def rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    abar_sqrt = np.sqrt(alphas_cumprod)
    abar_sqrt_0 = abar_sqrt[0].copy()
    abar_sqrt_T = abar_sqrt[-1].copy()
    abar_sqrt = abar_sqrt - abar_sqrt_T
    abar_sqrt = abar_sqrt * abar_sqrt_0 / (abar_sqrt_0 - abar_sqrt_T)
    return abar_sqrt ** 2


def make_alphas_cumprod(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.0120,
    beta_schedule: str = "scaled_linear",
    snr_shift_scale: float = 3.0,
    rescale_betas_zero_snr: bool = False,
) -> np.ndarray:
    betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
    alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
    # SD3-style SNR shift
    alphas_cumprod = alphas_cumprod / (snr_shift_scale + (1 - snr_shift_scale) * alphas_cumprod)
    if rescale_betas_zero_snr:
        alphas_cumprod = rescale_zero_terminal_snr(alphas_cumprod)
    return alphas_cumprod.astype(np.float32)


def make_timesteps(num_train_timesteps: int, num_inference_steps: int, spacing: str = "trailing", steps_offset: int = 0) -> np.ndarray:
    if spacing == "linspace":
        return np.linspace(0, num_train_timesteps - 1, num_inference_steps).round()[::-1].astype(np.int64)
    if spacing == "leading":
        step_ratio = num_train_timesteps // num_inference_steps
        t = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        return t + steps_offset
    if spacing == "trailing":
        step_ratio = num_train_timesteps / num_inference_steps
        return np.round(np.arange(num_train_timesteps, 0, -step_ratio)).astype(np.int64) - 1
    raise ValueError(spacing)


def _bcast(x: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape + (1,) * (like.ndim - x.ndim))


def add_noise(alphas_cumprod: jnp.ndarray, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
    a = alphas_cumprod[timesteps].astype(sample.dtype)
    sqrt_a = _bcast(jnp.sqrt(a), sample)
    sqrt_1ma = _bcast(jnp.sqrt(1.0 - a), sample)
    return sqrt_a * sample + sqrt_1ma * noise


def get_velocity(alphas_cumprod: jnp.ndarray, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
    a = alphas_cumprod[timesteps].astype(sample.dtype)
    sqrt_a = _bcast(jnp.sqrt(a), sample)
    sqrt_1ma = _bcast(jnp.sqrt(1.0 - a), sample)
    return sqrt_a * noise - sqrt_1ma * sample
