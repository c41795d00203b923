"""Real-checkpoint converter inventory (VERDICT r4 missing #1): instantiate
the reference torch MOT models and VAEs at the FULL released configs on the
meta device (zero memory, real shapes) and assert the weight converters
consume every state-dict key and produce exactly the shapes a config-built
vap_tpu model carries, and that the exporters invert them key-for-key.

Reference param spaces covered:
  cogvideox_transformer_3d_mot.py:517-1107 (11.1B params, 2018 keys)
  transformer_wan_mot.py:702-1000          (14B + 5B expert)
  autoencoder_kl_cogvideox.py / autoencoder_kl_wan.py

Memory trick: converters/exporters run on zero-strided numpy views
(np.broadcast_to of a scalar) with the module's `jnp` swapped for a
shape-faithful shim, so an 11B-param inventory costs ~nothing.
"""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/repo")

from conftest import REFERENCE_DIFFUSERS, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


def _fake(shape, dtype=np.float32):
    return np.broadcast_to(np.zeros((), dtype), tuple(int(s) for s in shape))


def _shim_jnp():
    """Shape-faithful stand-in for the converters' jnp usage."""
    def asarray(x, dtype=None):
        return _fake(np.shape(x))

    def stack(xs, axis=0):
        xs = list(xs)
        return _fake((len(xs),) + np.shape(xs[0]))

    return types.SimpleNamespace(asarray=asarray, stack=stack,
                                 float32=np.float32, bfloat16=np.float32)


class _RecordingSD:
    """Dict-like over {key: shape} that returns zero-strided arrays and
    records which keys the converter consumed."""

    def __init__(self, shapes):
        self.shapes = dict(shapes)
        self.consumed = set()

    def __contains__(self, k):
        return k in self.shapes

    def __getitem__(self, k):
        self.consumed.add(k)
        return _fake(self.shapes[k])

    def __iter__(self):
        return iter(self.shapes)

    def keys(self):
        return self.shapes.keys()


def _shapes_of_tree(tree):
    """pytree (of arrays or ShapeDtypeStructs) -> {path: shape}."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out[jax.tree_util.keystr(path)] = tuple(np.shape(leaf))
    return out


def _fake_tree(tree):
    """eval_shape output -> same pytree with zero-strided numpy leaves."""
    return jax.tree.map(lambda s: _fake(s.shape), tree)


def _torch_meta_shapes(build):
    import torch

    with torch.device("meta"):
        model = build()
    return {k: tuple(v.shape) for k, v in model.state_dict().items()}


def _assert_same_inventory(got: dict, want: dict, label: str):
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, (
        f"{label}: missing={missing[:8]} ({len(missing)}) extra={extra[:8]} ({len(extra)})")
    bad = {k: (got[k], want[k]) for k in want if tuple(got[k]) != tuple(want[k])}
    assert not bad, f"{label}: shape mismatches: {dict(list(bad.items())[:8])}"


@pytest.fixture(autouse=True)
def _ref_path():
    if REFERENCE_DIFFUSERS not in sys.path:
        sys.path.insert(0, REFERENCE_DIFFUSERS)
    yield


# ---------------------------------------------------------------------------
# CogVideoX MOT transformer @ released 5B config
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ref_mode", [None, "reference_independent"])
def test_cogvideox_mot_full_config_inventory(monkeypatch, ref_mode):
    from vap_tpu.models.cogvideox import (
        CogVideoXMOTConfig, init_cogvideox_mot)
    from vap_tpu.models.cogvideox import weights as W
    from vap_tpu.training.checkpoint import _flatten_to_reference_names

    cfg = CogVideoXMOTConfig.cogvideox_5b_i2v_vap(reference_train_mode=ref_mode)

    def build():
        from diffusers.models.transformers.cogvideox_transformer_3d_mot import (
            CogVideoXTransformer3DMOTModel)

        return CogVideoXTransformer3DMOTModel(
            num_attention_heads=cfg.num_attention_heads,
            attention_head_dim=cfg.attention_head_dim,
            in_channels=cfg.in_channels,
            out_channels=cfg.out_channels,
            num_layers=cfg.num_layers,
            text_embed_dim=cfg.text_embed_dim,
            time_embed_dim=cfg.time_embed_dim,
            use_rotary_positional_embeddings=True,
            use_learned_positional_embeddings=True,
            block_idx_with_mot_ref=list(cfg.block_idx_with_mot_ref),
            reference_train_mode=ref_mode,
        )

    torch_shapes = _torch_meta_shapes(build)
    assert len(torch_shapes) >= 2000  # 11.1B-param released layout

    # -- production: init at cfg -> exporter == torch layout, key for key
    init_tree = jax.eval_shape(
        lambda: init_cogvideox_mot(jax.random.PRNGKey(0), cfg, jnp.float32))
    flat = _flatten_to_reference_names(_fake_tree(init_tree), cfg)
    _assert_same_inventory({k: v.shape for k, v in flat.items()}, torch_shapes,
                           "export(init) vs torch")

    # -- consumption: converter reads EVERY released key and rebuilds the
    #    exact init-tree shapes
    sd = _RecordingSD(torch_shapes)
    monkeypatch.setattr(W, "jnp", _shim_jnp())
    params = W.convert_cogvideox_mot_state_dict(sd, cfg, np.float32)
    assert sd.consumed == set(torch_shapes), (
        f"unconsumed: {sorted(set(torch_shapes) - sd.consumed)[:8]}")
    _assert_same_inventory(_shapes_of_tree(params), _shapes_of_tree(init_tree),
                           "convert(torch) vs init")


# ---------------------------------------------------------------------------
# Wan MOT transformer @ released 14B config
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ref_mode", [None, "reference_independent"])
def test_wan_mot_full_config_inventory(monkeypatch, ref_mode):
    from vap_tpu.models.wan import WanMOTConfig, init_wan_mot
    from vap_tpu.models.wan import weights as W
    from vap_tpu.training.export_flatten import flatten_wan_mot_state_dict

    cfg = WanMOTConfig.wan_14b_i2v_vap(reference_train_mode=ref_mode)

    def build():
        from diffusers.models.transformers.transformer_wan_mot import (
            WanTransformer3DMOTModel)

        return WanTransformer3DMOTModel(
            in_channels=cfg.in_channels,
            out_channels=cfg.out_channels,
            image_dim=cfg.image_dim,
            added_kv_proj_dim=cfg.added_kv_proj_dim,
            block_idx_with_mot_ref=list(cfg.block_idx_with_mot_ref),
            reference_train_mode=ref_mode,
        )

    torch_shapes = _torch_meta_shapes(build)

    init_tree = jax.eval_shape(
        lambda: init_wan_mot(jax.random.PRNGKey(0), cfg, jnp.float32))
    flat = flatten_wan_mot_state_dict(_fake_tree(init_tree), cfg)
    _assert_same_inventory({k: v.shape for k, v in flat.items()}, torch_shapes,
                           "export(init) vs torch")

    sd = _RecordingSD(torch_shapes)
    monkeypatch.setattr(W, "jnp", _shim_jnp())
    params = W.convert_wan_mot_state_dict(sd, cfg, np.float32)
    assert sd.consumed == set(torch_shapes), (
        f"unconsumed: {sorted(set(torch_shapes) - sd.consumed)[:8]}")
    _assert_same_inventory(_shapes_of_tree(params), _shapes_of_tree(init_tree),
                           "convert(torch) vs init")


# ---------------------------------------------------------------------------
# VAEs @ released configs
# ---------------------------------------------------------------------------

def test_cogvideox_vae_full_config_inventory(monkeypatch):
    from vap_tpu.models.cogvideox.vae import CogVideoXVAEConfig, init_cogvideox_vae
    from vap_tpu.models.cogvideox import vae_weights as W

    cfg = CogVideoXVAEConfig()  # defaults == released 5B VAE layout

    def build():
        from diffusers.models.autoencoders.autoencoder_kl_cogvideox import (
            AutoencoderKLCogVideoX)

        return AutoencoderKLCogVideoX(
            block_out_channels=list(cfg.block_out_channels),
            latent_channels=cfg.latent_channels,
            layers_per_block=cfg.layers_per_block,
            norm_num_groups=cfg.norm_num_groups,
            temporal_compression_ratio=cfg.temporal_compression_ratio,
        )

    torch_shapes = _torch_meta_shapes(build)

    sd = _RecordingSD(torch_shapes)
    monkeypatch.setattr(W, "jnp", _shim_jnp())
    params = W.convert_cogvideox_vae_state_dict(sd, cfg, np.float32)
    assert sd.consumed == set(torch_shapes), (
        f"unconsumed: {sorted(set(torch_shapes) - sd.consumed)[:8]}")

    init_tree = jax.eval_shape(
        lambda: init_cogvideox_vae(jax.random.PRNGKey(0), cfg, jnp.float32))
    _assert_same_inventory(_shapes_of_tree(params), _shapes_of_tree(init_tree),
                           "convert(torch) vs init")


def test_wan_vae_full_config_inventory(monkeypatch):
    from vap_tpu.models.wan.vae import WanVAEConfig
    from vap_tpu.models.wan import vae_weights as W

    cfg = WanVAEConfig()  # defaults == released Wan2.1 VAE layout

    def build():
        from diffusers.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan

        return AutoencoderKLWan(
            base_dim=cfg.base_dim, z_dim=cfg.z_dim,
            dim_mult=list(cfg.dim_mult), num_res_blocks=cfg.num_res_blocks,
            attn_scales=list(cfg.attn_scales),
            temperal_downsample=list(cfg.temperal_downsample),
            latents_mean=list(cfg.latents_mean),
            latents_std=list(cfg.latents_std),
        )

    torch_shapes = _torch_meta_shapes(build)

    sd = _RecordingSD(torch_shapes)
    monkeypatch.setattr(W, "jnp", _shim_jnp())
    params = W.convert_wan_vae_state_dict(sd, cfg, np.float32)
    assert sd.consumed == set(torch_shapes), (
        f"unconsumed: {sorted(set(torch_shapes) - sd.consumed)[:8]}")

    from vap_tpu.models.wan.vae import init_wan_vae

    init_tree = jax.eval_shape(
        lambda: init_wan_vae(jax.random.PRNGKey(0), cfg, jnp.float32))
    _assert_same_inventory(_shapes_of_tree(params), _shapes_of_tree(init_tree),
                           "convert(torch) vs init")
