"""Round-trip tests for the per-family export flatteners: convert(flatten(p))
must reproduce p exactly, anchoring export to the parity-tested converters
(reference exports diffusers-layout weights per family via the trainer save
hooks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.training.export_flatten import (
    flatten_cogview4_state_dict,
    flatten_flux_state_dict,
    flatten_hunyuan_video_state_dict,
    flatten_ltx_video_state_dict,
    flatten_wan_mot_state_dict,
    flatten_wan_state_dict,
)


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(la) == len(lb)
    for p, v in la:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(lb[jax.tree_util.keystr(p)]),
                                      err_msg=jax.tree_util.keystr(p))


def test_roundtrip_wan_mot():
    from vap_tpu.models.wan import (
        WanMOTConfig, convert_wan_mot_state_dict, init_wan_mot)

    cfg = WanMOTConfig.tiny()
    params = init_wan_mot(jax.random.PRNGKey(0), cfg, jnp.float32)
    sd = flatten_wan_mot_state_dict(params, cfg)
    _assert_tree_equal(convert_wan_mot_state_dict(sd, cfg, jnp.float32), params)


def test_roundtrip_wan_plain():
    from vap_tpu.models.wan import (
        WanMOTConfig, convert_wan_state_dict, init_wan)

    cfg = WanMOTConfig.tiny(block_idx_with_mot_ref=(), image_dim=None,
                            added_kv_proj_dim=None)
    params = init_wan(jax.random.PRNGKey(0), cfg, jnp.float32)
    sd = flatten_wan_state_dict(params, cfg)
    _assert_tree_equal(convert_wan_state_dict(sd, cfg, jnp.float32), params)


def test_roundtrip_flux():
    from vap_tpu.models.flux import FluxConfig, convert_flux_state_dict, init_flux

    cfg = FluxConfig.tiny()
    params = init_flux(jax.random.PRNGKey(0), cfg, jnp.float32)
    sd = flatten_flux_state_dict(params, cfg)
    _assert_tree_equal(convert_flux_state_dict(sd, cfg, jnp.float32), params)


def test_roundtrip_ltx():
    from vap_tpu.models.ltx_video import (
        LTXVideoConfig, convert_ltx_video_state_dict, init_ltx_video)

    cfg = LTXVideoConfig.tiny()
    params = init_ltx_video(jax.random.PRNGKey(0), cfg, jnp.float32)
    sd = flatten_ltx_video_state_dict(params, cfg)
    _assert_tree_equal(convert_ltx_video_state_dict(sd, cfg, jnp.float32), params)


def test_roundtrip_cogview4():
    from vap_tpu.models.cogview4 import (
        CogView4Config, convert_cogview4_state_dict, init_cogview4)

    cfg = CogView4Config.tiny()
    params = init_cogview4(jax.random.PRNGKey(0), cfg, jnp.float32)
    sd = flatten_cogview4_state_dict(params, cfg)
    _assert_tree_equal(convert_cogview4_state_dict(sd, cfg, jnp.float32), params)


def test_roundtrip_hunyuan():
    from vap_tpu.models.hunyuan_video import (
        HunyuanVideoConfig, convert_hunyuan_video_state_dict, init_hunyuan_video)

    cfg = HunyuanVideoConfig.tiny()
    params = init_hunyuan_video(jax.random.PRNGKey(0), cfg, jnp.float32)
    sd = flatten_hunyuan_video_state_dict(params, cfg)
    _assert_tree_equal(convert_hunyuan_video_state_dict(sd, cfg, jnp.float32), params)
