"""Scheduler parity vs the reference torch schedulers (deterministic trajectories)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vap_tpu.ops.schedulers import (
    CogVideoXDDIMScheduler,
    CogVideoXDPMScheduler,
    FlowMatchEulerScheduler,
    UniPCScheduler,
)
from vap_tpu.ops.schedulers.common import add_noise, get_velocity

STEPS = 8
SHAPE = (1, 2, 4, 4, 4)


def _fake_model(x, i):
    # deterministic pseudo-model output so trajectories are comparable
    return 0.3 * x + 0.01 * (i + 1)


def test_ddim_trajectory(torch_reference):
    torch = torch_reference
    from diffusers.schedulers.scheduling_ddim_cogvideox import CogVideoXDDIMScheduler as RefDDIM

    ref = RefDDIM(
        prediction_type="v_prediction", rescale_betas_zero_snr=True,
        snr_shift_scale=3.0, timestep_spacing="trailing",
    )
    ref.set_timesteps(STEPS)
    ours = CogVideoXDDIMScheduler()
    np.testing.assert_array_equal(ours.timesteps(STEPS), ref.timesteps.numpy())

    a_t, b_t, ap_t = ours.step_coefficients(STEPS)

    rng = np.random.default_rng(0)
    x_ref = rng.standard_normal(SHAPE).astype(np.float32)
    x_our = x_ref.copy()
    for i, t in enumerate(ref.timesteps):
        mo = _fake_model(x_ref, i)
        x_ref = ref.step(torch.from_numpy(mo), t, torch.from_numpy(x_ref), return_dict=False)[0].numpy()
        x_our = np.asarray(ours.step(jnp.asarray(_fake_model(x_our, i)), jnp.asarray(x_our), a_t[i], b_t[i], ap_t[i]))
        np.testing.assert_allclose(x_our, x_ref, atol=1e-5, rtol=1e-4)


def test_ddim_add_noise_get_velocity(torch_reference):
    torch = torch_reference
    from diffusers.schedulers.scheduling_ddim_cogvideox import CogVideoXDDIMScheduler as RefDDIM

    ref = RefDDIM(prediction_type="v_prediction", rescale_betas_zero_snr=True, snr_shift_scale=3.0)
    ours = CogVideoXDDIMScheduler()
    ac = jnp.asarray(ours.alphas_cumprod)

    rng = np.random.default_rng(1)
    x = rng.standard_normal(SHAPE).astype(np.float32)
    n = rng.standard_normal(SHAPE).astype(np.float32)
    ts = np.array([123], np.int64)

    ref_noisy = ref.add_noise(torch.from_numpy(x), torch.from_numpy(n), torch.from_numpy(ts)).numpy()
    got_noisy = np.asarray(add_noise(ac, jnp.asarray(x), jnp.asarray(n), jnp.asarray(ts)))
    np.testing.assert_allclose(got_noisy, ref_noisy, atol=1e-6)

    ref_v = ref.get_velocity(torch.from_numpy(x), torch.from_numpy(n), torch.from_numpy(ts)).numpy()
    got_v = np.asarray(get_velocity(ac, jnp.asarray(x), jnp.asarray(n), jnp.asarray(ts)))
    np.testing.assert_allclose(got_v, ref_v, atol=1e-6)


def test_dpm_trajectory(torch_reference, monkeypatch):
    torch = torch_reference
    import diffusers.schedulers.scheduling_dpm_cogvideox as ref_mod

    # zero the stochastic term for determinism
    monkeypatch.setattr(
        ref_mod, "randn_tensor",
        lambda shape, generator=None, device=None, dtype=None: torch.zeros(shape, dtype=dtype),
    )
    ref = ref_mod.CogVideoXDPMScheduler(
        prediction_type="v_prediction", rescale_betas_zero_snr=True,
        snr_shift_scale=3.0, timestep_spacing="trailing",
    )
    ref.set_timesteps(STEPS)
    ours = CogVideoXDPMScheduler()
    coeffs = ours.step_coefficients(STEPS)

    rng = np.random.default_rng(2)
    x_ref = rng.standard_normal(SHAPE).astype(np.float32)
    x_our = x_ref.copy()
    old_ref = None
    old_our = jnp.zeros(SHAPE, jnp.float32)
    ts = ref.timesteps
    for i, t in enumerate(ts):
        mo = _fake_model(x_ref, i)
        x_ref, old_ref = ref.step(
            torch.from_numpy(mo), old_ref, t, ts[i - 1] if i > 0 else None,
            torch.from_numpy(x_ref), return_dict=False,
        )
        x_ref = x_ref.numpy()
        old_ref = old_ref if isinstance(old_ref, torch.Tensor) else torch.from_numpy(np.asarray(old_ref))
        step_coeffs = tuple(c[i] for c in coeffs)
        x_our_j, old_our = ours.step(
            jnp.asarray(_fake_model(x_our, i)), jnp.asarray(x_our), old_our, step_coeffs,
            jnp.zeros(SHAPE, jnp.float32),
        )
        x_our = np.asarray(x_our_j)
        np.testing.assert_allclose(x_our, x_ref, atol=2e-5, rtol=1e-4)


def test_flow_match_trajectory(torch_reference):
    torch = torch_reference
    from diffusers.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler as RefFM,
    )

    ref = RefFM(shift=3.0)
    ref.set_timesteps(STEPS)
    ours = FlowMatchEulerScheduler(shift=3.0)
    np.testing.assert_allclose(ours.sigmas(STEPS), ref.sigmas.numpy(), atol=1e-6)
    np.testing.assert_allclose(ours.timesteps(STEPS), ref.timesteps.numpy(), atol=1e-3)

    sig = ours.sigmas(STEPS)
    rng = np.random.default_rng(3)
    x_ref = rng.standard_normal(SHAPE).astype(np.float32)
    x_our = x_ref.copy()
    for i, t in enumerate(ref.timesteps):
        mo = _fake_model(x_ref, i)
        x_ref = ref.step(torch.from_numpy(mo), t, torch.from_numpy(x_ref), return_dict=False)[0].numpy()
        x_our = np.asarray(ours.step(jnp.asarray(_fake_model(x_our, i)), jnp.asarray(x_our), sig[i], sig[i + 1]))
        np.testing.assert_allclose(x_our, x_ref, atol=1e-5, rtol=1e-4)


def test_unipc_trajectory(torch_reference):
    torch = torch_reference
    from diffusers.schedulers.scheduling_unipc_multistep import UniPCMultistepScheduler as RefUniPC

    ref = RefUniPC(
        solver_order=2, prediction_type="flow_prediction",
        use_flow_sigmas=True, flow_shift=3.0,
    )
    ref.set_timesteps(STEPS)
    ours = UniPCScheduler(shift=3.0)
    np.testing.assert_allclose(ours.timesteps(STEPS), ref.timesteps.numpy().astype(np.float32), atol=1e-2)

    coeffs = ours.step_coefficients(STEPS)
    rng = np.random.default_rng(4)
    x_ref = rng.standard_normal(SHAPE).astype(np.float32)
    x_our = x_ref.copy()
    carry = ours.init_carry(SHAPE)
    for i, t in enumerate(ref.timesteps):
        mo = _fake_model(x_ref, i)
        x_ref = ref.step(torch.from_numpy(mo), t, torch.from_numpy(x_ref), return_dict=False)[0].numpy()
        c = {k: v[i] for k, v in coeffs.items()}
        x_our_j, carry = ours.step(jnp.asarray(_fake_model(x_our, i)), jnp.asarray(x_our), carry, c)
        x_our = np.asarray(x_our_j)
        np.testing.assert_allclose(x_our, x_ref, atol=1e-4, rtol=1e-3, err_msg=f"step {i}")
