"""Flow-matching Euler scheduler (Wan2.1 path), pure functions.

Matches diffusers FlowMatchEulerDiscreteScheduler with static time shift:
sigma' = shift * sigma / (1 + (shift - 1) * sigma); model predicts the flow
velocity v = noise - x0; the Euler update is x += (sigma_next - sigma) * v.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FlowMatchEulerScheduler:
    num_train_timesteps: int = 1000
    shift: float = 3.0

    init_noise_sigma: float = 1.0
    order: int = 1

    def sigmas(self, num_inference_steps: int) -> np.ndarray:
        """Per-step sigma grid with a terminal 0 (len = steps + 1).

        Matches the reference two-stage construction
        (scheduling_flow_match_euler_discrete.py:117-135 + set_timesteps):
        training sigmas are shifted once to derive [sigma_max, sigma_min],
        the inference linspace over that range is then shifted again.
        """
        s_min0 = 1.0 / self.num_train_timesteps
        sigma_min = self.shift * s_min0 / (1 + (self.shift - 1) * s_min0)
        sigma_max = 1.0
        t = np.linspace(sigma_max * self.num_train_timesteps, sigma_min * self.num_train_timesteps,
                        num_inference_steps, dtype=np.float64)
        s = t / self.num_train_timesteps
        s = self.shift * s / (1 + (self.shift - 1) * s)
        return np.concatenate([s, [0.0]]).astype(np.float32)

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        return (self.sigmas(num_inference_steps)[:-1] * self.num_train_timesteps).astype(np.float32)

    def step(self, model_output, sample, sigma, sigma_next):
        # fp32 update (the reference upcasts sample to float32 in step)
        x = sample.astype(jnp.float32) + (sigma_next - sigma) * model_output.astype(jnp.float32)
        return x.astype(sample.dtype)

    # training utilities -----------------------------------------------------
    @staticmethod
    def scale_noise(x0, noise, sigma):
        """Forward process x_t = (1 - σ) x0 + σ n (finetrainers flow_match_xt,
        functional/diffusion.py:15-21)."""
        return (1.0 - sigma) * x0 + sigma * noise

    @staticmethod
    def target(x0, noise):
        """Flow-matching target n - x0 (functional/diffusion.py:18-21)."""
        return noise - x0
