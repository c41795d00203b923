"""Dynamic Degree / Motion Smoothness metric semantics (vap_tpu/eval/
flow_metrics.py) — scoring rules, warping/interpolation math, and the
FlowMetrics plumbing over a tiny RAFT."""

import numpy as np
import jax
import jax.numpy as jnp

from vap_tpu.eval.flow_metrics import (
    FlowMetrics,
    backward_warp,
    dynamic_degree_set,
    dynamic_params,
    interpolate_midpoint,
    is_dynamic,
    sample_interval,
    top5_flow_magnitude,
)
from vap_tpu.eval.raft import RAFTConfig, init_raft


def test_sample_interval():
    assert sample_interval(24.0) == 3
    assert sample_interval(16.0) == 2
    assert sample_interval(8.0) == 1
    assert sample_interval(2.0) == 1  # floored at 1, never 0


def test_dynamic_params_scaling():
    p = dynamic_params(256, 480, 16)
    assert p["thres"] == 6.0 and p["count_num"] == 4
    p = dynamic_params(128, 512, 16)
    assert p["thres"] == 3.0
    assert dynamic_params(256, 256, 2)["count_num"] == 1  # floored at 1


def test_top5_flow_magnitude():
    flow = np.zeros((10, 10, 2), np.float32)
    flow[0, :5, 0] = 10.0  # exactly 5% of 100 pixels
    assert top5_flow_magnitude(flow) == 10.0
    assert top5_flow_magnitude(np.zeros((4, 4, 2), np.float32)) == 0.0


def test_is_dynamic_counting():
    assert is_dynamic([7, 7, 1, 1], thres=6.0, count_num=2)
    assert not is_dynamic([7, 1, 1, 1], thres=6.0, count_num=2)
    assert not is_dynamic([6.0, 6.0], thres=6.0, count_num=1)  # strict >


def test_dynamic_degree_set():
    assert dynamic_degree_set([True, True, False, False]) == 50.0
    assert dynamic_degree_set([]) == 0.0


def test_backward_warp_identity_and_shift():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 6, 8, 3).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(backward_warp(img, jnp.zeros((1, 6, 8, 2)))),
        np.asarray(img), atol=1e-6)
    # flow (+2, 0): output(x) = img(x+2) with the right border clamped
    flow = jnp.zeros((1, 6, 8, 2)).at[..., 0].set(2.0)
    got = np.asarray(backward_warp(img, flow))
    np.testing.assert_allclose(got[:, :, :6], np.asarray(img)[:, :, 2:], atol=1e-6)
    np.testing.assert_allclose(got[:, :, 6:], np.asarray(img)[:, :, 7:8].repeat(2, 2),
                               atol=1e-6)


def test_interpolate_midpoint_constant_translation():
    """A smooth pattern translating at constant velocity: with the true flow,
    the flow-based midpoint reconstructs the real middle frame closely."""
    h, w, v = 32, 48, 4.0
    ys, xs = np.meshgrid(np.arange(h), np.arange(w + 8), indexing="ij")
    pattern = (127.5 + 80 * np.sin(xs / 3.0) * np.cos(ys / 5.0)).astype(np.float32)
    frame = lambda t: np.stack([pattern[:, int(t * v):int(t * v) + w]] * 3, -1)
    e0, gt, e1 = frame(0), frame(1), frame(2)
    f01 = np.zeros((1, h, w, 2), np.float32)
    f01[..., 0] = -2 * v  # content moves left by 2v pixels across the pair
    mid = interpolate_midpoint(jnp.asarray(e0[None]), jnp.asarray(e1[None]),
                               jnp.asarray(f01), jnp.asarray(-f01))
    err = np.mean(np.abs(np.asarray(mid)[0, :, 8:-8] - gt[:, 8:-8]))
    base = np.mean(np.abs(e0[:, 8:-8] - gt[:, 8:-8]))
    assert err < 2.0 and err < base / 10


def _tiny_metrics():
    cfg = RAFTConfig.tiny()
    return FlowMetrics(init_raft(jax.random.PRNGKey(0), cfg), cfg, iters=2)


def test_flow_metrics_plumbing():
    fm = _tiny_metrics()
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, size=(9, 24, 32, 3)).astype(np.uint8)

    flows = fm.pair_flows(frames[:4])
    assert flows.shape == (3, 24, 32, 2) and np.isfinite(flows).all()

    out = fm.dynamic_degree_video(frames, fps=24.0)  # interval 3 -> 3 sampled
    assert set(out) == {"dynamic", "pair_scores", "thres", "count_num"}
    assert len(out["pair_scores"]) == 2
    assert out["thres"] == 6.0 * 24 / 256

    s = fm.motion_smoothness_video(frames)
    assert 0.0 <= s <= 1.0

    # [0,1]-float input contract matches uint8
    s2 = fm.motion_smoothness_video(frames.astype(np.float32) / 255.0)
    assert abs(s - s2) < 1e-4


def test_motion_smoothness_static_video_with_true_flow():
    """With exact (zero) flow a static video scores exactly 1 — the metric's
    fixed point, independent of RAFT accuracy."""
    fm = _tiny_metrics()
    fm._flow = lambda a, b: jnp.zeros(a.shape[:3] + (2,), jnp.float32)
    frames = np.stack([np.full((16, 16, 3), 87, np.uint8)] * 5)
    assert fm.motion_smoothness_video(frames) == 1.0


def test_to_255_tolerates_unclamped_decode_overshoot():
    """Unclamped VAE decodes emit floats slightly above 1.0; the range
    heuristic must still read them as [0,1] video (a 1+eps threshold fed
    RAFT near-black pixels and silently zeroed both metrics)."""
    from vap_tpu.eval.flow_metrics import _to_255

    overshoot = np.full((2, 4, 4, 3), 0.5, np.float32)
    overshoot[0, 0, 0, 0] = 1.02
    out = _to_255(overshoot)
    assert abs(out[1, 0, 0, 0] - 127.5) < 1e-3  # scaled, not passed through
    assert out.max() <= 255.0
    # genuine [0,255] floats pass through (and clamp)
    big = np.full((1, 4, 4, 3), 200.0, np.float32)
    big[0, 0, 0, 0] = 260.0
    out = _to_255(big)
    assert abs(out[0, 1, 1, 1] - 200.0) < 1e-3 and out.max() == 255.0
