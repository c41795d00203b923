"""Rotary position embeddings (1D/3D) with Video-As-Prompt temporal bias.

Pure functions producing (cos, sin) tables. Numerics match the reference
implementation (diffusers fork, models/embeddings.py:816-950 and :1140-1256):
  * interleaved ("repeat_interleave") real RoPE
  * 3D split of head_dim into t : h : w = d/4 : 3d/8 : 3d/8
  * MoT reference bias: temporal grid placed at negative positions
    ("continous_negative") or at positive offset blocks
    ("discrete_long_reference", start_point=50, gap=30)

Tables are computed in float32 on host/device and are tiny relative to
activations; they are meant to be computed once per shape and closed over by
the jitted denoise step.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def get_1d_rotary_pos_embed(
    dim: int,
    pos: np.ndarray,
    theta: float = 10000.0,
    linear_factor: float = 1.0,
    ntk_factor: float = 1.0,
    repeat_interleave_real: bool = True,
    freqs_dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray]:
    """Real-valued 1D RoPE table: returns (cos, sin) each of shape [S, dim]."""
    assert dim % 2 == 0
    pos = np.asarray(pos, dtype=np.float32)
    theta = theta * ntk_factor
    freqs = (
        1.0 / (theta ** (np.arange(0, dim, 2, dtype=freqs_dtype)[: dim // 2] / dim)) / linear_factor
    )  # [D/2]
    freqs = np.outer(pos, freqs)  # [S, D/2]
    if repeat_interleave_real:
        cos = np.repeat(np.cos(freqs), 2, axis=1).astype(np.float32)  # [S, D]
        sin = np.repeat(np.sin(freqs), 2, axis=1).astype(np.float32)
    else:
        cos = np.concatenate([np.cos(freqs), np.cos(freqs)], axis=-1).astype(np.float32)
        sin = np.concatenate([np.sin(freqs), np.sin(freqs)], axis=-1).astype(np.float32)
    return cos, sin


def get_resize_crop_region_for_grid(src, tgt_width, tgt_height):
    """Aspect-preserving crop region used by CogVideoX spatial RoPE."""
    tw = tgt_width
    th = tgt_height
    h, w = src
    r = h / w
    if r > (th / tw):
        resize_height = th
        resize_width = int(round(th / h * w))
    else:
        resize_width = tw
        resize_height = int(round(tw / w * h))
    crop_top = int(round((th - resize_height) / 2.0))
    crop_left = int(round((tw - resize_width) / 2.0))
    return (crop_top, crop_left), (crop_top + resize_height, crop_left + resize_width)


def get_3d_rotary_pos_embed(*args, **kwargs) -> Tuple[Array, Array]:
    """jnp wrapper over the cached numpy table builder (safe to call inside
    jit traces: the cache holds host numpy arrays, never tracers)."""
    cos, sin = _get_3d_rotary_pos_embed_np(*args, **kwargs)
    return jnp.asarray(cos), jnp.asarray(sin)


@functools.lru_cache(maxsize=64)
def _get_3d_rotary_pos_embed_np(
    embed_dim: int,
    crops_coords: Optional[Tuple[Tuple[int, int], Tuple[int, int]]],
    grid_size: Tuple[int, int],
    temporal_size: int,
    theta: float = 10000.0,
    grid_type: str = "linspace",
    max_size: Optional[Tuple[int, int]] = None,
    mot_num: int = 0,
    ref_type: str = "continous_negative",
    start_point: int = 50,
    gap: int = 30,
) -> Tuple[Array, Array]:
    """3D video RoPE; returns (cos, sin) of shape [T*H*W, embed_dim].

    With ``mot_num > 0`` the temporal grid is replaced by the Video-As-Prompt
    reference bias so that reference-video tokens land at distinct temporal
    positions relative to the target tokens.
    """
    grid_size_h, grid_size_w = grid_size

    if grid_type == "linspace":
        start, stop = crops_coords
        grid_h = np.linspace(start[0], stop[0] * (grid_size_h - 1) / grid_size_h, grid_size_h, dtype=np.float32)
        grid_w = np.linspace(start[1], stop[1] * (grid_size_w - 1) / grid_size_w, grid_size_w, dtype=np.float32)
        grid_t = np.linspace(0, temporal_size * (temporal_size - 1) / temporal_size, temporal_size, dtype=np.float32)
        if mot_num > 0:
            if ref_type == "continous_negative":
                t_range = temporal_size * (temporal_size - 1) / temporal_size - 0 + 1
                temporal_size = temporal_size * mot_num
                grid_t = np.linspace(-mot_num * t_range, -1, temporal_size, dtype=np.float32)
            elif ref_type == "discrete_long_reference":
                start_offsets = start_point + np.arange(mot_num, dtype=np.float32) * gap
                base_range = np.arange(temporal_size, dtype=np.float32)
                grid_t = (start_offsets[:, None] + base_range[None, :]).reshape(-1).astype(np.float32)
                temporal_size = temporal_size * mot_num
            else:
                raise ValueError(f"Invalid ref_type: {ref_type}")
    elif grid_type == "slice":
        max_h, max_w = max_size
        grid_h = np.arange(max_h, dtype=np.float32)
        grid_w = np.arange(max_w, dtype=np.float32)
        grid_t = np.arange(temporal_size, dtype=np.float32)
        if mot_num > 0:
            grid_t = np.arange(-mot_num * temporal_size, 0, dtype=np.float32)
            temporal_size = temporal_size * mot_num
    else:
        raise ValueError(f"Invalid grid_type: {grid_type}")

    dim_t = embed_dim // 4
    dim_h = embed_dim // 8 * 3
    dim_w = embed_dim // 8 * 3

    t_cos, t_sin = get_1d_rotary_pos_embed(dim_t, grid_t, theta=theta)
    h_cos, h_sin = get_1d_rotary_pos_embed(dim_h, grid_h, theta=theta)
    w_cos, w_sin = get_1d_rotary_pos_embed(dim_w, grid_w, theta=theta)

    if grid_type == "slice":
        t_cos, t_sin = t_cos[:temporal_size], t_sin[:temporal_size]
        h_cos, h_sin = h_cos[:grid_size_h], h_sin[:grid_size_h]
        w_cos, w_sin = w_cos[:grid_size_w], w_sin[:grid_size_w]

    def combine(ft, fh, fw):
        ft = np.broadcast_to(ft[:, None, None, :], (temporal_size, grid_size_h, grid_size_w, ft.shape[-1]))
        fh = np.broadcast_to(fh[None, :, None, :], (temporal_size, grid_size_h, grid_size_w, fh.shape[-1]))
        fw = np.broadcast_to(fw[None, None, :, :], (temporal_size, grid_size_h, grid_size_w, fw.shape[-1]))
        out = np.concatenate([ft, fh, fw], axis=-1)
        return out.reshape(temporal_size * grid_size_h * grid_size_w, -1)

    return combine(t_cos, h_cos, w_cos), combine(t_sin, h_sin, w_sin)


def apply_rotary_emb(x: Array, cos: Array, sin: Array) -> Array:
    """Apply interleaved real RoPE. x: [..., S, D]; cos/sin: [S, D].

    Matches the reference `apply_rotary_emb(..., use_real_unbind_dim=-1)`:
    pairs are (x[2i], x[2i+1]) and the rotated tensor interleaves
    (-x_imag, x_real). Math is done in float32 and cast back.
    """
    x_f = x.astype(jnp.float32)
    xr = x_f.reshape(*x.shape[:-1], -1, 2)
    x_real = xr[..., 0]
    x_imag = xr[..., 1]
    x_rotated = jnp.stack([-x_imag, x_real], axis=-1).reshape(x.shape)
    out = x_f * cos + x_rotated * sin
    return out.astype(x.dtype)


def prepare_cogvideox_rotary_embeddings(
    height: int,
    width: int,
    num_latent_frames: int,
    *,
    attention_head_dim: int,
    patch_size: int,
    patch_size_t: Optional[int],
    sample_width: int,
    sample_height: int,
    vae_scale_factor_spatial: int = 8,
    mot_num: int = 0,
    ref_type: str = "continous_negative",
) -> Tuple[Array, Array]:
    """Per-sample RoPE tables as built by the reference pipeline
    (pipeline_cogvideox_image2video_mot.py:605-652)."""
    grid_height = height // (vae_scale_factor_spatial * patch_size)
    grid_width = width // (vae_scale_factor_spatial * patch_size)
    base_size_width = sample_width // patch_size
    base_size_height = sample_height // patch_size

    if patch_size_t is None:
        grid_crops_coords = get_resize_crop_region_for_grid(
            (grid_height, grid_width), base_size_width, base_size_height
        )
        return get_3d_rotary_pos_embed(
            embed_dim=attention_head_dim,
            crops_coords=grid_crops_coords,
            grid_size=(grid_height, grid_width),
            temporal_size=num_latent_frames,
            mot_num=mot_num,
            ref_type=ref_type,
        )
    else:
        base_num_frames = (num_latent_frames + patch_size_t - 1) // patch_size_t
        return get_3d_rotary_pos_embed(
            embed_dim=attention_head_dim,
            crops_coords=None,
            grid_size=(grid_height, grid_width),
            temporal_size=base_num_frames,
            grid_type="slice",
            max_size=(base_size_height, base_size_width),
            mot_num=mot_num,
            ref_type=ref_type,
        )
