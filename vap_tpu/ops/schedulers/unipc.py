"""UniPC multistep scheduler (order-2, bh2, predictor+corrector) over flow sigmas.

Faithful to the reference UniPCMultistepScheduler
(diffusers/src/diffusers/schedulers/scheduling_unipc_multistep.py) with the
configuration Wan exercises: solver_order=2, solver_type="bh2",
predict_x0=True, lower_order_final=True, corrector enabled,
prediction_type="flow_prediction", use_flow_sigmas=True.

Restructured for lax.scan: all per-step scalars are precomputed in float64
numpy; the carry is (m_prev, m_prev2, last_sample) where m_* are x0-converted
model outputs.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _lam(sigma: float) -> float:
    """lambda = log(alpha) - log(sigma) for flow sigmas (alpha = 1 - sigma)."""
    if sigma <= 0.0:
        return 40.0  # effectively +inf: expm1(-40) == -1 to fp32 precision
    return float(np.log(1.0 - sigma) - np.log(sigma))


@dataclasses.dataclass(frozen=True)
class UniPCScheduler:
    num_train_timesteps: int = 1000
    shift: float = 3.0
    solver_order: int = 2

    init_noise_sigma: float = 1.0
    order: int = 1

    def sigmas(self, num_inference_steps: int) -> np.ndarray:
        """Flow sigma grid (scheduling_unipc_multistep.py:379-393)."""
        alphas = np.linspace(1, 1 / self.num_train_timesteps, num_inference_steps + 1)
        s = 1.0 - alphas
        s = np.flip(self.shift * s / (1 + (self.shift - 1) * s))[:-1].copy()
        return np.concatenate([s, [0.0]]).astype(np.float32)

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """int64-truncated timesteps, as the reference feeds the model."""
        s = self.sigmas(num_inference_steps)[:-1]
        return (s * self.num_train_timesteps).astype(np.int64).astype(np.float32)

    def step_coefficients(self, num_inference_steps: int):
        """Dict of per-step scalar arrays [steps] for predictor + corrector."""
        sig = self.sigmas(num_inference_steps).astype(np.float64)
        n = num_inference_steps
        cols = {k: [] for k in (
            "sigma", "c_ratio", "c_alpha", "c_hphi1", "c_r0", "c_r1", "c_rinv", "c_order",
            "p_ratio", "p_alpha", "p_hphi1", "p_rinv", "p_order",
        )}
        for i in range(n):
            s_i, s_next = sig[i], sig[i + 1]
            lam_i = _lam(s_i)
            cols["sigma"].append(s_i)

            # ---- corrector at step i (corrects last_sample -> sample) ----
            if i > 0:
                s_im1 = sig[i - 1]
                lam_im1 = _lam(s_im1)
                h_c = lam_i - lam_im1
                hh = -h_c
                hphi1 = np.expm1(hh)
                b_h = hphi1  # bh2
                if i >= 2:
                    lam_im2 = _lam(sig[i - 2])
                    r1 = (lam_im2 - lam_im1) / h_c
                    # solve [[1,1],[r1,1]] x = [b0, b1]
                    hk1 = hphi1 / hh - 1.0
                    b0 = hk1 / b_h
                    hk2 = hk1 / hh - 0.5
                    b1 = hk2 * 2.0 / b_h
                    rc0 = (b0 - b1) / (1.0 - r1)
                    rc1 = b0 - rc0
                    order_c = 2.0
                    rinv_c = 1.0 / r1
                else:
                    rc0, rc1, rinv_c, order_c = 0.0, 0.5, 0.0, 1.0
                cols["c_ratio"].append(s_i / s_im1)
                cols["c_alpha"].append(1.0 - s_i)
                cols["c_hphi1"].append(hphi1)
                cols["c_r0"].append(rc0)
                cols["c_r1"].append(rc1)
                cols["c_rinv"].append(rinv_c)
                cols["c_order"].append(order_c)
            else:
                for k in ("c_ratio", "c_alpha", "c_hphi1", "c_r0", "c_r1", "c_rinv"):
                    cols[k].append(0.0)
                cols["c_order"].append(0.0)

            # ---- predictor at step i (sample -> prev_sample) ----
            h_p = _lam(s_next) - lam_i
            hh = -h_p
            hphi1_p = np.expm1(hh)
            # this_order = min(solver_order, n - i, lower_order_nums + 1)
            order_p = min(self.solver_order, n - i, i + 1)
            if order_p >= 2:
                lam_im1 = _lam(sig[i - 1])
                r1_p = (lam_im1 - lam_i) / h_p
                rinv_p = 1.0 / r1_p
            else:
                rinv_p = 0.0
            cols["p_ratio"].append(s_next / s_i)
            cols["p_alpha"].append(1.0 - s_next)
            cols["p_hphi1"].append(hphi1_p)
            cols["p_rinv"].append(rinv_p)
            cols["p_order"].append(float(order_p))
        return {k: np.asarray(v, np.float32) for k, v in cols.items()}

    @staticmethod
    def convert_to_x0(model_output, sample, sigma):
        """flow_prediction: x0 = x_t - sigma * v (scheduling_unipc_multistep.py:617)."""
        return sample - sigma * model_output

    def step(self, model_output, sample, carry, c):
        """One UniPC step. carry = (m_prev, m_prev2, last_sample); c = dict of
        this step's scalars. Returns (prev_sample, new_carry)."""
        m_prev, m_prev2, last_sample = carry
        x = sample.astype(jnp.float32)
        m_t = self.convert_to_x0(model_output.astype(jnp.float32), x, c["sigma"])

        # corrector: refine the current sample using this step's model output
        b_h = c["c_hphi1"]  # bh2: B_h == h_phi_1
        base_c = c["c_ratio"] * last_sample - c["c_alpha"] * c["c_hphi1"] * m_prev
        d1_t = m_t - m_prev
        corr_o1 = base_c - c["c_alpha"] * b_h * (0.5 * d1_t)
        d1_c = (m_prev2 - m_prev) * c["c_rinv"]
        corr_o2 = base_c - c["c_alpha"] * b_h * (c["c_r0"] * d1_c + c["c_r1"] * d1_t)
        x = jnp.where(c["c_order"] == 0.0, x, jnp.where(c["c_order"] == 1.0, corr_o1, corr_o2))

        # predictor
        b_h_p = c["p_hphi1"]
        base_p = c["p_ratio"] * x - c["p_alpha"] * c["p_hphi1"] * m_t
        d1_p = (m_prev - m_t) * c["p_rinv"]
        pred_o2 = base_p - c["p_alpha"] * b_h_p * (0.5 * d1_p)
        prev_sample = jnp.where(c["p_order"] == 1.0, base_p, pred_o2)

        new_carry = (m_t, m_prev, x)
        return prev_sample.astype(sample.dtype), new_carry

    def init_carry(self, sample_shape, dtype=jnp.float32):
        z = jnp.zeros(sample_shape, dtype)
        return (z, z, z)
