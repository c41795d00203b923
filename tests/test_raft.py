"""Golden parity for the JAX RAFT flow encoder (vap_tpu/eval/raft.py) vs the
torch oracle (tests/torch_raft_ref.py, princeton state-dict naming) — the
encoder behind the Dynamic Degree / Motion Smoothness headline metrics."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vap_tpu.eval.raft import (
    RAFTConfig,
    build_corr_pyramid,
    convert_raft_state_dict,
    corr_lookup,
    init_raft,
    pad_to_multiple_of_8,
    raft_flow,
    unpad,
    upsample_flow_convex,
)
from torch_raft_ref import CorrBlock, TorchRAFT


def _randomize_bn_stats(model, seed=0):
    """Random (not identity) running stats so the batch-norm eval path is
    actually exercised by parity."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)


@pytest.fixture(scope="module")
def tiny_pair():
    cfg = RAFTConfig.tiny()
    oracle = TorchRAFT(cfg).eval()
    _randomize_bn_stats(oracle)
    params = convert_raft_state_dict(
        {k: v.numpy() for k, v in oracle.state_dict().items()}, cfg)
    return cfg, oracle, params


def _frames(b, h, w, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(b, h, w, 3)).astype(np.float32)


def test_flow_golden_parity(tiny_pair):
    cfg, oracle, params = tiny_pair
    i1, i2 = _frames(2, 40, 48, seed=3), _frames(2, 40, 48, seed=4)
    want = oracle(torch.from_numpy(i1).permute(0, 3, 1, 2),
                  torch.from_numpy(i2).permute(0, 3, 1, 2), iters=cfg.iters)
    got = raft_flow(params, cfg, jnp.asarray(i1), jnp.asarray(i2))
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(),
                               atol=2e-4, rtol=1e-3)


def test_corr_lookup_matches_grid_sample(tiny_pair):
    """The correlation window layout (incl. the princeton meshgrid transpose
    quirk) and the zero-padding bilinear taps match torch grid_sample."""
    cfg, _, _ = tiny_pair
    rng = np.random.RandomState(0)
    f1 = rng.randn(1, 5, 6, cfg.fnet_dim).astype(np.float32)
    f2 = rng.randn(1, 5, 6, cfg.fnet_dim).astype(np.float32)
    # off-grid, partially out-of-bounds query coords
    coords = rng.uniform(-2.0, 8.0, size=(1, 5, 6, 2)).astype(np.float32)

    tb = CorrBlock(torch.from_numpy(f1).permute(0, 3, 1, 2),
                   torch.from_numpy(f2).permute(0, 3, 1, 2),
                   cfg.corr_levels, cfg.corr_radius)
    want = tb(torch.from_numpy(coords).permute(0, 3, 1, 2))

    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), cfg.corr_levels)
    got = corr_lookup(pyr, jnp.asarray(coords), cfg.corr_radius)
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(),
                               atol=1e-5, rtol=1e-5)


def test_convex_upsample_matches_unfold():
    rng = np.random.RandomState(1)
    flow = rng.randn(2, 3, 4, 2).astype(np.float32)
    mask = rng.randn(2, 3, 4, 64 * 9).astype(np.float32)
    got = upsample_flow_convex(jnp.asarray(flow), jnp.asarray(mask))

    tfl = torch.from_numpy(flow).permute(0, 3, 1, 2)
    tm = torch.from_numpy(mask).permute(0, 3, 1, 2)
    n, _, h, w = tfl.shape
    m = torch.softmax(tm.view(n, 1, 9, 8, 8, h, w), dim=2)
    up = torch.nn.functional.unfold(8 * tfl, (3, 3), padding=1).view(n, 2, 9, 1, 1, h, w)
    want = torch.sum(m * up, dim=2).permute(0, 1, 4, 2, 5, 3).reshape(n, 2, 8 * h, 8 * w)
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_pad_unpad_roundtrip():
    frames = _frames(1, 37, 45)
    padded, pads = pad_to_multiple_of_8(frames)
    assert padded.shape[1] % 8 == 0 and padded.shape[2] % 8 == 0
    # replicate padding, split evenly (sintel mode)
    assert pads == (1, 2, 1, 2)
    np.testing.assert_array_equal(unpad(padded, pads), frames)
    # already-aligned input passes through untouched
    aligned = _frames(1, 40, 48)
    out, pads0 = pad_to_multiple_of_8(aligned)
    assert pads0 == (0, 0, 0, 0) and out is aligned


def test_init_matches_converted_tree_structure(tiny_pair):
    cfg, _, params = tiny_pair
    fresh = init_raft(jax.random.PRNGKey(0), cfg)
    want = jax.tree_util.tree_structure(params)
    got = jax.tree_util.tree_structure(fresh)
    assert want == got
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(fresh)):
        assert a.shape == b.shape


def test_flow_jits_and_batches(tiny_pair):
    cfg, _, params = tiny_pair
    fn = jax.jit(lambda a, b: raft_flow(params, cfg, a, b, iters=2))
    i1, i2 = _frames(3, 16, 24), _frames(3, 16, 24, seed=9)
    out = fn(jnp.asarray(i1), jnp.asarray(i2))
    assert out.shape == (3, 16, 24, 2)
    assert np.isfinite(np.asarray(out)).all()
