"""Parity tests: RoPE tables and rotary application vs the reference (torch CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vap_tpu.ops import rope as jrope


@pytest.mark.parametrize("mot_num,ref_type", [
    (0, "continous_negative"),
    (1, "continous_negative"),
    (2, "continous_negative"),
    # NOTE: the reference's combine step crashes for discrete_long_reference with
    # mot_num>=2 (temporal_size is not updated, embeddings.py:887-905); it is only
    # ever used with one reference video. Our implementation generalizes.
    (1, "discrete_long_reference"),
])
def test_3d_rope_matches_reference(torch_reference, mot_num, ref_type):
    from diffusers.models.embeddings import get_3d_rotary_pos_embed as torch_rope

    crops = ((0, 0), (24, 36))
    grid = (6, 9)
    tsize = 4
    dim = 32

    ref_cos, ref_sin = torch_rope(
        embed_dim=dim, crops_coords=crops, grid_size=grid, temporal_size=tsize,
        mot_num=mot_num, ref_type=ref_type,
    )
    got_cos, got_sin = jrope.get_3d_rotary_pos_embed(
        embed_dim=dim, crops_coords=crops, grid_size=grid, temporal_size=tsize,
        mot_num=mot_num, ref_type=ref_type,
    )
    np.testing.assert_allclose(np.asarray(got_cos), ref_cos.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_sin), ref_sin.numpy(), atol=1e-5)


def test_3d_rope_slice_grid(torch_reference):
    from diffusers.models.embeddings import get_3d_rotary_pos_embed as torch_rope

    dim = 32
    ref_cos, ref_sin = torch_rope(
        embed_dim=dim, crops_coords=None, grid_size=(4, 6), temporal_size=3,
        grid_type="slice", max_size=(8, 12), mot_num=1,
    )
    got_cos, got_sin = jrope.get_3d_rotary_pos_embed(
        embed_dim=dim, crops_coords=None, grid_size=(4, 6), temporal_size=3,
        grid_type="slice", max_size=(8, 12), mot_num=1,
    )
    np.testing.assert_allclose(np.asarray(got_cos), ref_cos.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_sin), ref_sin.numpy(), atol=1e-5)


def test_apply_rotary_matches_reference(torch_reference):
    import torch
    from diffusers.models.embeddings import apply_rotary_emb as torch_apply
    from diffusers.models.embeddings import get_3d_rotary_pos_embed as torch_rope

    dim = 32
    cos, sin = torch_rope(
        embed_dim=dim, crops_coords=((0, 0), (24, 36)), grid_size=(6, 9), temporal_size=4,
    )
    x = torch.randn(2, 3, cos.shape[0], dim)
    ref = torch_apply(x, (cos, sin))
    got = jrope.apply_rotary_emb(jnp.asarray(x.numpy()), jnp.asarray(cos.numpy()), jnp.asarray(sin.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)


def test_crop_region_matches_reference():
    # independently check against the reference formula for several aspect ratios
    cases = [((30, 45), 45, 30), ((17, 45), 45, 30), ((30, 20), 45, 30)]
    for src, tw, th in cases:
        region = jrope.get_resize_crop_region_for_grid(src, tw, th)
        (t, l), (b, r) = region
        assert 0 <= t <= b <= th and 0 <= l <= r <= tw
