"""CogVideoX 3D-causal VAE — TPU-native JAX implementation.

Mirrors AutoencoderKLCogVideoX (diffusers/src/diffusers/models/autoencoders/
autoencoder_kl_cogvideox.py): 8x spatial / 4x temporal compression, causal
3D convolutions whose temporal state (`conv_cache`) streams across temporal
frame batches, group norm in the encoder and spatially-conditioned norm
(zq) in the decoder.

TPU-first decisions:
  * channel-last layout [B, F, H, W, C] (TPU conv native layout);
  * the conv cache is an explicit pytree threaded through pure functions, so
    frame-batch streaming composes with jit and bounds HBM exactly like the
    reference's 8GB offload path bounds VRAM;
  * convolutions run in the model dtype with fp32 group norms.

API: encode(params, video) -> latent moments [B, F', H', W', 2*Cz];
     decode(params, latents) -> video [B, F, H, W, C].
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CogVideoXVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    latent_channels: int = 16
    layers_per_block: int = 3
    norm_eps: float = 1e-6
    norm_num_groups: int = 32
    temporal_compression_ratio: int = 4
    scaling_factor: float = 1.15258426
    invert_scale_latents: bool = False
    sample_height: int = 480
    sample_width: int = 720

    @property
    def temporal_compress_level(self) -> int:
        return int(np.log2(self.temporal_compression_ratio))

    @classmethod
    def tiny(cls, **overrides) -> "CogVideoXVAEConfig":
        base = dict(block_out_channels=(8, 8, 8, 8), latent_channels=4,
                    layers_per_block=1, norm_num_groups=4)
        base.update(overrides)
        return cls(**base)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _sum2d_wins(h: int, w: int, cin: int) -> bool:
    """Shape rule for the kt-tap decomposition, from the TPU shootout
    (scripts/conv3d_bench.py, v5e, bf16, RTT-free timing — r5 rerun covering
    the encoder shapes the r4 rule extrapolated to):
      sum2d wins:  480p W-split decode 128ch w=368 (96.4 vs 72.0 TFLOP/s),
                   small stages 256ch/120p (23.1 vs 14.2) and 512ch/60p
                   (24.5 vs 12.8)
      ndhwc wins:  240p 256ch (79.0 vs 71.4), full-W 480p encode at 3ch
                   (3.6 vs 3.2) and 128ch (81.3 vs 77.2), 240p 128ch
                   (54.6 vs 44.8)
    Encoded as: tiny spatial extents always decompose; otherwise only the
    wide-but-W-split low-channel decode regime does."""
    if h * w <= 16 * 1024:
        return True
    return cin <= 128 and h * w >= 128 * 1024 and w <= 512


def _conv3d(p: Params, x: Array, strides=(1, 1, 1), padding="VALID") -> Array:
    """x: [B, F, H, W, C]; kernel: [kt, kh, kw, Cin, Cout].

    VAP_VAE_CONV3D selects the 3x3x3 conv lowering:
      auto (default) — exact kt-tap decomposition (sum over temporal taps of
        2D convs batching B*F_out frames) on shapes where the TPU shootout
        measured it faster (_sum2d_wins), NDHWC elsewhere
      sum2d — force the decomposition everywhere
      ndhwc — force the single 3-spatial-dim conv (pre-r4 default)
    Both lowerings are exact (same math, different emitter path); parity is
    gated by tests/test_vae_cogvideox.py::test_sum2d_conv3d_matches_default."""
    k = p["kernel"].astype(x.dtype)
    mode = os.environ.get("VAP_VAE_CONV3D", "auto")
    if mode not in ("auto", "sum2d", "ndhwc"):
        raise ValueError(
            f"VAP_VAE_CONV3D={mode!r}: expected 'auto', 'sum2d' or 'ndhwc'")
    want_sum2d = mode == "sum2d" or (
        mode == "auto" and _sum2d_wins(x.shape[2], x.shape[3], x.shape[4]))
    if (want_sum2d and k.shape[0] > 1
            and strides == (1, 1, 1) and padding != "VALID"
            and padding[0] == (0, 0)):
        b, f_in, h, w, cin = x.shape
        kt = k.shape[0]
        f_out = f_in - kt + 1
        y = None
        for dt in range(kt):
            xs = x[:, dt:dt + f_out].reshape(b * f_out, h, w, cin)
            yd = jax.lax.conv_general_dilated(
                xs, k[dt], window_strides=(1, 1), padding=padding[1:],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = yd if y is None else y + yd
        y = y.reshape(b, f_out, *y.shape[1:])
    else:
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=strides, padding=padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _conv2d(p: Params, x: Array, strides=(1, 1), padding="VALID") -> Array:
    """x: [N, H, W, C]; kernel: [kh, kw, Cin, Cout]."""
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def causal_conv3d(p: Params, x: Array, cache: Optional[Array], time_kernel: int, spatial_pad: int) -> Tuple[Array, Array]:
    """Causal conv: temporal left-pad from cache (or repeated first frame),
    constant spatial padding (CogVideoXCausalConv3d, autoencoder_kl_cogvideox.py:69-146).

    Returns (out, new_cache) where new_cache holds the last (kt-1) input frames.
    """
    if time_kernel > 1:
        if cache is None:
            pad_frames = jnp.repeat(x[:, :1], time_kernel - 1, axis=1)
        else:
            pad_frames = cache.astype(x.dtype)
        x = jnp.concatenate([pad_frames, x], axis=1)
        new_cache = x[:, -(time_kernel - 1):]
    else:
        new_cache = jnp.zeros((x.shape[0], 0) + x.shape[2:], x.dtype)
    pad = ((0, 0), (spatial_pad, spatial_pad), (spatial_pad, spatial_pad))
    return _conv3d(p, x, padding=pad), new_cache


def group_norm(p: Params, x: Array, num_groups: int, eps: float) -> Array:
    """GroupNorm over channel-last video tensors, fp32 math.

    Written as three fused passes over the bf16 input (mean-reduce,
    centered-var-reduce, normalize) with the f32 convert INSIDE each
    consumer expression: binding one shared f32 copy forces XLA to
    materialize it (a 1.4 GB buffer per 480p norm at the decoder's last
    stage), while per-consumer converts fuse into the reduces/elementwise.
    """
    orig_shape = x.shape
    c = orig_shape[-1]
    xg = x.reshape(orig_shape[0], -1, num_groups, c // num_groups)
    mean = jnp.mean(xg.astype(jnp.float32), axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg.astype(jnp.float32) - mean), axis=(1, 3), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xf = (xg.astype(jnp.float32) - mean) * inv
    xf = xf.reshape(orig_shape)
    xf = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return xf.astype(x.dtype)


def _nearest_axis(x: Array, axis: int, out_size: int) -> Array:
    """torch F.interpolate(mode='nearest') exact indexing floor(i*in/out) on
    one axis. Integer upscale factors lower to broadcast+reshape (free-ish on
    TPU) instead of a gather — the decoder's 2x upsamples and the
    SpatialNorm3D zq resizes are all integer factors in practice."""
    axis = axis % x.ndim
    in_size = x.shape[axis]
    if out_size == in_size:
        return x
    if out_size % in_size == 0:
        r = out_size // in_size
        x = jnp.expand_dims(x, axis + 1)   # [..., in, 1, ...]
        bshape = list(x.shape)
        bshape[axis + 1] = r
        x = jnp.broadcast_to(x, bshape)    # fuses into consumers (no tile copy)
        shape = list(bshape)
        shape[axis] = in_size * r
        del shape[axis + 1]
        return x.reshape(shape)
    idx = (np.arange(out_size) * in_size / out_size).astype(np.int32)
    return jnp.take(x, idx, axis=axis)


def _torch_nearest_resize(x: Array, out_h: int, out_w: int) -> Array:
    """torch F.interpolate(mode='nearest') exact over the two spatial axes of
    [..., H, W, C]."""
    x = _nearest_axis(x, -3, out_h)
    return _nearest_axis(x, -2, out_w)


def _torch_nearest_resize_t(x: Array, out_f: int) -> Array:
    """nearest resize along the frame axis [B, F, ...]."""
    return _nearest_axis(x, 1, out_f)


def _resize_zq(zq: Array, fF: int, fH: int, fW: int) -> Array:
    """SpatialNorm3D's nearest resize to the target (F, H, W) extent, with
    the odd-frame-count first-frame special case (reference :169-186)."""
    if fF > 1 and fF % 2 == 1:
        z_first, z_rest = zq[:, :1], zq[:, 1:]
        z_first = _torch_nearest_resize(_torch_nearest_resize_t(z_first, 1), fH, fW)
        z_rest = _torch_nearest_resize(_torch_nearest_resize_t(z_rest, fF - 1), fH, fW)
        return jnp.concatenate([z_first, z_rest], axis=1)
    return _torch_nearest_resize(_torch_nearest_resize_t(zq, fF), fH, fW)


def spatial_norm3d(p: Params, f: Array, zq: Array, cache: Dict, num_groups: int) -> Tuple[Array, Dict]:
    """CogVideoXSpatialNorm3D (autoencoder_kl_cogvideox.py:149-196).

    f: [B, F, H, W, C]; zq: [B, Fz, Hz, Wz, Cz].

    The reference resizes zq to f's extent, then applies the 1x1x1 convs.
    Nearest resize is pixel replication and the convs are pointwise, so they
    commute EXACTLY: conv(resize(zq)) == resize(conv(zq)). Convolving first
    keeps every big tensor at C (lane-aligned) channels — resized 16-channel
    zq tensors get 8x lane padding on TPU (T(8,128) tiling), which is what
    OOMed the full-frame decode — and runs the convs at zq's small spatial
    extent instead of f's.
    """
    new_cache: Dict[str, Any] = {}
    conv_y, new_cache["conv_y"] = causal_conv3d(p["conv_y"], zq, cache.get("conv_y"), 1, 0)
    conv_b, new_cache["conv_b"] = causal_conv3d(p["conv_b"], zq, cache.get("conv_b"), 1, 0)
    conv_y = _resize_zq(conv_y, f.shape[1], f.shape[2], f.shape[3])
    conv_b = _resize_zq(conv_b, f.shape[1], f.shape[2], f.shape[3])
    norm_f = group_norm(p["norm_layer"], f, num_groups, 1e-6)
    return norm_f * conv_y + conv_b, new_cache


def resnet_block(
    p: Params, cfg: CogVideoXVAEConfig, x: Array, zq: Optional[Array], cache: Dict,
) -> Tuple[Array, Dict]:
    """CogVideoXResnetBlock3D (no temb: VAE uses temb_channels=0)."""
    new_cache: Dict[str, Any] = {}
    h = x
    if zq is not None:
        h, new_cache["norm1"] = spatial_norm3d(p["norm1"], h, zq, cache.get("norm1", {}), cfg.norm_num_groups)
    else:
        h = group_norm(p["norm1"], h, cfg.norm_num_groups, cfg.norm_eps)
    h = jax.nn.silu(h)
    h, new_cache["conv1"] = causal_conv3d(p["conv1"], h, cache.get("conv1"), 3, 1)

    if zq is not None:
        h, new_cache["norm2"] = spatial_norm3d(p["norm2"], h, zq, cache.get("norm2", {}), cfg.norm_num_groups)
    else:
        h = group_norm(p["norm2"], h, cfg.norm_num_groups, cfg.norm_eps)
    h = jax.nn.silu(h)
    h, new_cache["conv2"] = causal_conv3d(p["conv2"], h, cache.get("conv2"), 3, 1)

    if "conv_shortcut" in p:
        # 1x1x1 SafeConv3d shortcut (in_channels != out_channels, no cache)
        x = _conv3d(p["conv_shortcut"], x)
    return h + x, new_cache


def downsample3d(p: Params, x: Array, compress_time: bool) -> Array:
    """CogVideoXDownsample3D (downsampling.py:288-354): optional causal temporal
    avg-pool then stride-2 conv2d with asymmetric (0,1,0,1) padding."""
    if compress_time:
        f = x.shape[1]
        if f % 2 == 1:
            x_first, x_rest = x[:, :1], x[:, 1:]
            if x_rest.shape[1] > 0:
                x_rest = 0.5 * (x_rest[:, 0::2] + x_rest[:, 1::2])
            x = jnp.concatenate([x_first, x_rest], axis=1)
        else:
            x = 0.5 * (x[:, 0::2] + x[:, 1::2])
    b, f, h, w, c = x.shape
    x = x.reshape(b * f, h, w, c)
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    x = _conv2d(p["conv"], x, strides=(2, 2))
    return x.reshape(b, f, *x.shape[1:])


def upsample3d(p: Params, x: Array, compress_time: bool) -> Array:
    """CogVideoXUpsample3D (upsampling.py:359-420): nearest 2x spatial (and
    causal 2x temporal) then conv2d."""
    b, f, h, w, c = x.shape
    if compress_time:
        if f > 1 and f % 2 == 1:
            x_first, x_rest = x[:, 0], x[:, 1:]
            x_first = _torch_nearest_resize(x_first, 2 * h, 2 * w)
            x_rest = _torch_nearest_resize_t(x_rest, 2 * (f - 1))
            x_rest = _torch_nearest_resize(x_rest, 2 * h, 2 * w)
            x = jnp.concatenate([x_first[:, None], x_rest], axis=1)
        elif f > 1:
            x = _torch_nearest_resize_t(x, 2 * f)
            x = _torch_nearest_resize(x, 2 * h, 2 * w)
        else:
            x = _torch_nearest_resize(x[:, 0], 2 * h, 2 * w)[:, None]
    else:
        x = _torch_nearest_resize(x, 2 * h, 2 * w)
    b, f2, h2, w2, c = x.shape
    x = x.reshape(b * f2, h2, w2, c)
    x = _conv2d(p["conv"], x, padding=((1, 1), (1, 1)))
    return x.reshape(b, f2, *x.shape[1:])


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------

def encoder_forward(p: Params, cfg: CogVideoXVAEConfig, x: Array, cache: Optional[Dict]) -> Tuple[Array, Dict]:
    cache = cache or {}
    new_cache: Dict[str, Any] = {}
    h, new_cache["conv_in"] = causal_conv3d(p["conv_in"], x, cache.get("conv_in"), 3, 1)

    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        bc = cache.get(f"down_block_{i}", {})
        nbc: Dict[str, Any] = {}
        for j in range(cfg.layers_per_block):
            h, nbc[f"resnet_{j}"] = resnet_block(p[f"down_block_{i}"][f"resnet_{j}"], cfg, h, None, bc.get(f"resnet_{j}", {}))
        if i < n_blocks - 1:
            h = downsample3d(p[f"down_block_{i}"]["downsampler"], h, compress_time=i < cfg.temporal_compress_level)
        new_cache[f"down_block_{i}"] = nbc

    mc = cache.get("mid_block", {})
    nmc: Dict[str, Any] = {}
    for j in range(2):
        h, nmc[f"resnet_{j}"] = resnet_block(p["mid_block"][f"resnet_{j}"], cfg, h, None, mc.get(f"resnet_{j}", {}))
    new_cache["mid_block"] = nmc

    h = group_norm(p["norm_out"], h, cfg.norm_num_groups, 1e-6)
    h = jax.nn.silu(h)
    h, new_cache["conv_out"] = causal_conv3d(p["conv_out"], h, cache.get("conv_out"), 3, 1)
    return h, new_cache


def decoder_forward(p: Params, cfg: CogVideoXVAEConfig, z: Array, cache: Optional[Dict]) -> Tuple[Array, Dict]:
    cache = cache or {}
    new_cache: Dict[str, Any] = {}
    h, new_cache["conv_in"] = causal_conv3d(p["conv_in"], z, cache.get("conv_in"), 3, 1)

    mc = cache.get("mid_block", {})
    nmc: Dict[str, Any] = {}
    for j in range(2):
        h, nmc[f"resnet_{j}"] = resnet_block(p["mid_block"][f"resnet_{j}"], cfg, h, z, mc.get(f"resnet_{j}", {}))
    new_cache["mid_block"] = nmc

    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        bc = cache.get(f"up_block_{i}", {})
        nbc: Dict[str, Any] = {}
        for j in range(cfg.layers_per_block + 1):
            h, nbc[f"resnet_{j}"] = resnet_block(p[f"up_block_{i}"][f"resnet_{j}"], cfg, h, z, bc.get(f"resnet_{j}", {}))
        if i < n_blocks - 1:
            h = upsample3d(p[f"up_block_{i}"]["upsampler"], h, compress_time=i < cfg.temporal_compress_level)
        new_cache[f"up_block_{i}"] = nbc

    h, new_cache["norm_out"] = spatial_norm3d(p["norm_out"], h, z, cache.get("norm_out", {}), cfg.norm_num_groups)
    h = jax.nn.silu(h)
    h, new_cache["conv_out"] = causal_conv3d(p["conv_out"], h, cache.get("conv_out"), 3, 1)
    return h, new_cache


# ---------------------------------------------------------------------------
# public API with temporal frame-batch streaming
# ---------------------------------------------------------------------------

NUM_SAMPLE_FRAMES_BATCH = 8
NUM_LATENT_FRAMES_BATCH = 2


def vae_encode(params: Params, cfg: CogVideoXVAEConfig, video: Array,
               frame_batch: Optional[int] = NUM_SAMPLE_FRAMES_BATCH) -> Array:
    """video: [B, F, H, W, 3] -> latent moments [B, F', H', W', 2*Cz].

    Streams over temporal frame batches with the conv cache carried, matching
    AutoencoderKLCogVideoX._encode (autoencoder_kl_cogvideox.py:1148-1171).
    NOTE: encoder chunking is also semantic — group_norm normalizes over the
    chunk's (F, H, W) extent. The default of 8 sample frames matches the
    reference training configuration; treat frame_batch as a parity knob.
    """
    num_frames = video.shape[1]
    fb = frame_batch or num_frames
    num_batches = max(num_frames // fb, 1)
    remaining = num_frames % fb
    cache = None
    outs = []
    for i in range(num_batches):
        start = fb * i + (0 if i == 0 else remaining)
        end = fb * (i + 1) + remaining
        part, cache = encoder_forward(params["encoder"], cfg, video[:, start:end], cache)
        outs.append(part)
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


def vae_decode(params: Params, cfg: CogVideoXVAEConfig, latents: Array,
               frame_batch: Optional[int] = NUM_LATENT_FRAMES_BATCH) -> Array:
    """latents: [B, F', H', W', Cz] -> video [B, F, H, W, 3] in [-1, 1].

    Streams over latent frame batches of 2 (autoencoder_kl_cogvideox.py:1201-1224).
    WARNING: decode chunking is SEMANTIC, not just a memory knob — the decoder's
    SpatialNorm3D interpolates zq per chunk, and the checkpoint was trained at
    frame_batch=2 (see the reference's own comment, :1060-1073). Keep 2.
    """
    num_frames = latents.shape[1]
    fb = frame_batch or num_frames
    if fb < 2:
        raise ValueError("chunked decode needs frame_batch >= 2 (the "
                         "temporal-upsample cache drops frames below that)")
    num_batches = max(num_frames // fb, 1)
    remaining = num_frames % fb
    cache = None
    outs = []
    for i in range(num_batches):
        start = fb * i + (0 if i == 0 else remaining)
        end = fb * (i + 1) + remaining
        part, cache = decoder_forward(params["decoder"], cfg, latents[:, start:end], cache)
        outs.append(part)
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


def vae_decode_streamed(params: Params, cfg: CogVideoXVAEConfig, latents: Array,
                        frame_batch: int = NUM_LATENT_FRAMES_BATCH) -> Array:
    """Full-frame decode with each temporal frame-batch in its OWN jit call,
    carrying the conv-cache pytree between calls.

    Numerically identical to vae_decode (same chunking), but bounds HBM to one
    chunk's live set: a single jit over the whole chunk loop lets XLA overlap
    chunks and keep several 1.3 GB stage tensors alive at once, which exceeds
    a 16 GB v5e at 480p. Two compilations total (first chunk: 3 latent frames,
    no cache; steady state: 2 frames + cache), reused across calls via
    jax.jit's cache. This is the decode path for real 49f@480p inference on a
    single chip — 1.0x frame area vs the tiled path's ~1.4-2.25x overlap.
    """
    num_frames = latents.shape[1]
    fb = frame_batch or num_frames
    if fb < 2:
        raise ValueError("chunked decode needs frame_batch >= 2 (the "
                         "temporal-upsample cache drops frames below that)")
    num_batches = max(num_frames // fb, 1)
    remaining = num_frames % fb
    cache = None
    outs = []
    for i in range(num_batches):
        start = fb * i + (0 if i == 0 else remaining)
        end = fb * (i + 1) + remaining
        part, cache = _jitted_chunk_decode(cfg, _conv3d_mode())(params, latents[:, start:end], cache)
        # serialize chunks: async dispatch would enqueue every chunk's
        # execution at once, and each enqueued execution holds its temp
        # arena (~10 GB at 480p) — a scalar host read forces completion
        # (block_until_ready does not synchronize under the axon transport)
        np.asarray(jax.device_get(part[0, 0, 0, 0, 0]))
        outs.append(part)
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


def vae_decode_wsplit(params: Params, cfg: CogVideoXVAEConfig, latents: Array,
                      n_splits: int = 2, overlap_lat: int = 8,
                      frame_batch: int = NUM_LATENT_FRAMES_BATCH) -> Array:
    """Width-split decode: n evenly-sized W tiles with a blended overlap,
    each tile decoded via the streamed per-chunk path.

    The v5e-16GB sweet spot for 49f@480p: full-frame decode needs ~17 GB
    (temp 14 + conv cache 2.6, measured via memory_analysis), while the
    reference-parity 3x3 tiled path does 2.25x the frame area. Two 49-latent
    tiles do 1.09x the area with a 64-px blend. The default overlap is from
    the r5 TPU sweep (overlap 22/12/8 => 4.92/4.42/4.26 s; seam-vs-exact at
    240p full-frame: mean |delta| 0.0079/0.0106/0.0119 on [-1,1] pixels,
    p99 0.031/0.045/0.047 — random weights, so an upper bound on real
    checkpoints). n_splits=1 degenerates to exact full-frame streaming
    decode.

    frame_batch must be >= 2: the temporal-upsample cache path drops frames
    at 1-latent-frame chunks (and 2 is the reference's
    num_latent_frames_batch_size, which group-norm statistics depend on).
    """
    if frame_batch is not None and frame_batch < 2:
        raise ValueError("vae_decode_wsplit needs frame_batch >= 2 (the "
                         "temporal-upsample cache drops frames below that)")
    b, f, h, w, c = latents.shape
    if n_splits <= 1:
        return vae_decode_streamed(params, cfg, latents, frame_batch)
    step = -(-(w - overlap_lat) // n_splits)          # non-overlapping stride
    span = step + overlap_lat                          # tile width (latent)
    starts = [min(i * step, w - span) for i in range(n_splits)]
    tiles = [
        vae_decode_streamed(params, cfg, latents[:, :, :, s:s + span], frame_batch)
        for s in starts
    ]
    pieces = []
    for i in range(n_splits):
        tile = tiles[i]
        if i > 0:
            ext = (starts[i - 1] + span - starts[i]) * 8
            tile = _blend_h(tiles[i - 1], tile, ext)
            tiles[i] = tile  # later splits blend against the blended tile
        if i < n_splits - 1:
            tile = tile[:, :, :, :(starts[i + 1] - starts[i]) * 8]
        pieces.append(tile)
    return jnp.concatenate(pieces, axis=3)


def sample_posterior(moments: Array, key) -> Array:
    """DiagonalGaussianDistribution.sample over channel-last moments."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def posterior_mode(moments: Array) -> Array:
    mean, _ = jnp.split(moments, 2, axis=-1)
    return mean


# ---------------------------------------------------------------------------
# random init (tests / bench; real use loads converted HF weights)
# ---------------------------------------------------------------------------

def _init_conv3d(key, kt, kh, kw, cin, cout, dtype):
    fan_in = kt * kh * kw * cin
    return {
        "kernel": jax.random.normal(key, (kt, kh, kw, cin, cout), dtype) * (fan_in ** -0.5),
        "bias": jnp.zeros((cout,), dtype),
    }


def _init_conv2d(key, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    return {
        "kernel": jax.random.normal(key, (kh, kw, cin, cout), dtype) * (fan_in ** -0.5),
        "bias": jnp.zeros((cout,), dtype),
    }


def _init_norm(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _init_spatial_norm(key, c, zq, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "norm_layer": _init_norm(c, dtype),
        "conv_y": _init_conv3d(k1, 1, 1, 1, zq, c, dtype),
        "conv_b": _init_conv3d(k2, 1, 1, 1, zq, c, dtype),
    }


def _init_resnet(key, cin, cout, zq, dtype):
    ks = jax.random.split(key, 5)
    p = {
        "conv1": _init_conv3d(ks[0], 3, 3, 3, cin, cout, dtype),
        "conv2": _init_conv3d(ks[1], 3, 3, 3, cout, cout, dtype),
    }
    if zq is None:
        p["norm1"] = _init_norm(cin, dtype)
        p["norm2"] = _init_norm(cout, dtype)
    else:
        p["norm1"] = _init_spatial_norm(ks[2], cin, zq, dtype)
        p["norm2"] = _init_spatial_norm(ks[3], cout, zq, dtype)
    if cin != cout:
        p["conv_shortcut"] = _init_conv3d(ks[4], 1, 1, 1, cin, cout, dtype)
    return p


def init_cogvideox_vae(key, cfg: CogVideoXVAEConfig, dtype=jnp.float32) -> Params:
    boc = cfg.block_out_channels
    n = len(boc)
    keys = jax.random.split(key, 64)
    ki = iter(keys)

    enc: Params = {
        "conv_in": _init_conv3d(next(ki), 3, 3, 3, cfg.in_channels, boc[0], dtype),
        "norm_out": _init_norm(boc[-1], dtype),
        "conv_out": _init_conv3d(next(ki), 3, 3, 3, boc[-1], 2 * cfg.latent_channels, dtype),
        "mid_block": {
            f"resnet_{j}": _init_resnet(next(ki), boc[-1], boc[-1], None, dtype) for j in range(2)
        },
    }
    cin = boc[0]
    for i in range(n):
        blk: Params = {}
        for j in range(cfg.layers_per_block):
            blk[f"resnet_{j}"] = _init_resnet(next(ki), cin if j == 0 else boc[i], boc[i], None, dtype)
        if i < n - 1:
            blk["downsampler"] = {"conv": _init_conv2d(next(ki), 3, 3, boc[i], boc[i], dtype)}
        enc[f"down_block_{i}"] = blk
        cin = boc[i]

    rev = list(reversed(boc))
    zq = cfg.latent_channels
    dec: Params = {
        "conv_in": _init_conv3d(next(ki), 3, 3, 3, cfg.latent_channels, rev[0], dtype),
        "norm_out": _init_spatial_norm(next(ki), rev[-1], zq, dtype),
        "conv_out": _init_conv3d(next(ki), 3, 3, 3, rev[-1], cfg.out_channels, dtype),
        "mid_block": {
            f"resnet_{j}": _init_resnet(next(ki), rev[0], rev[0], zq, dtype) for j in range(2)
        },
    }
    cin = rev[0]
    for i in range(n):
        blk = {}
        for j in range(cfg.layers_per_block + 1):
            blk[f"resnet_{j}"] = _init_resnet(next(ki), cin if j == 0 else rev[i], rev[i], zq, dtype)
        if i < n - 1:
            blk["upsampler"] = {"conv": _init_conv2d(next(ki), 3, 3, rev[i], rev[i], dtype)}
        dec[f"up_block_{i}"] = blk
        cin = rev[i]

    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# spatial tiling with overlap blending (tiled_encode/tiled_decode,
# autoencoder_kl_cogvideox.py:1255-1444) — bounds HBM at high resolution the
# way the reference's low-memory path bounds VRAM.
# ---------------------------------------------------------------------------

TILE_SAMPLE_MIN_H = 240
TILE_SAMPLE_MIN_W = 360
TILE_OVERLAP_H = 1 / 6
TILE_OVERLAP_W = 1 / 5


def _blend_v(a: Array, b: Array, extent: int) -> Array:
    """Blend bottom rows of tile `a` into top rows of tile `b` (H axis=2)."""
    extent = min(a.shape[2], b.shape[2], extent)
    if extent == 0:
        return b
    w = (jnp.arange(extent, dtype=jnp.float32) / extent).reshape(1, 1, extent, 1, 1)
    top = a[:, :, -extent:].astype(jnp.float32) * (1 - w) + b[:, :, :extent].astype(jnp.float32) * w
    return jnp.concatenate([top.astype(b.dtype), b[:, :, extent:]], axis=2)


def _blend_h(a: Array, b: Array, extent: int) -> Array:
    """Blend right cols of tile `a` into left cols of tile `b` (W axis=3)."""
    extent = min(a.shape[3], b.shape[3], extent)
    if extent == 0:
        return b
    w = (jnp.arange(extent, dtype=jnp.float32) / extent).reshape(1, 1, 1, extent, 1)
    left = a[:, :, :, -extent:].astype(jnp.float32) * (1 - w) + b[:, :, :, :extent].astype(jnp.float32) * w
    return jnp.concatenate([left.astype(b.dtype), b[:, :, :, extent:]], axis=3)


def vae_decode_tiled(
    params: Params, cfg: CogVideoXVAEConfig, latents: Array,
    tile_sample_min_height: int = TILE_SAMPLE_MIN_H,
    tile_sample_min_width: int = TILE_SAMPLE_MIN_W,
    decode_fn=None,
) -> Array:
    """Spatially tiled decode with overlap blending. latents channel-last.

    `decode_fn(params, tile)` defaults to a per-tile-shape jitted vae_decode so
    only one tile's graph is live at a time (a single jit over all tiles keeps
    every tile's buffers resident and OOMs at 480p on a 16GB chip)."""
    if decode_fn is None:
        decode_fn = _jitted_tile_decode(cfg, conv_mode=_conv3d_mode())
    b, f, h, w, c = latents.shape
    tlh = tile_sample_min_height // 8
    tlw = tile_sample_min_width // 8
    overlap_h = int(tlh * (1 - TILE_OVERLAP_H))
    overlap_w = int(tlw * (1 - TILE_OVERLAP_W))
    blend_h_ext = int(tile_sample_min_height * TILE_OVERLAP_H)
    blend_w_ext = int(tile_sample_min_width * TILE_OVERLAP_W)
    row_limit_h = tile_sample_min_height - blend_h_ext
    row_limit_w = tile_sample_min_width - blend_w_ext

    rows = []
    for i in range(0, h, overlap_h):
        row = []
        for j in range(0, w, overlap_w):
            tile = latents[:, :, i:i + tlh, j:j + tlw]
            row.append(decode_fn(params, tile))
        rows.append(row)

    result_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j in range(len(row)):
            tile = row[j]
            if i > 0:
                tile = _blend_v(rows[i - 1][j], tile, blend_h_ext)
            if j > 0:
                tile = _blend_h(row[j - 1], tile, blend_w_ext)
            # reference blend_v/h mutate the tile in place: later neighbors
            # must blend against the already-blended tile
            row[j] = tile
            result_row.append(tile[:, :, :row_limit_h, :row_limit_w])
        result_rows.append(jnp.concatenate(result_row, axis=3))
    return jnp.concatenate(result_rows, axis=2)


def vae_encode_tiled(
    params: Params, cfg: CogVideoXVAEConfig, video: Array,
    tile_sample_min_height: int = TILE_SAMPLE_MIN_H,
    tile_sample_min_width: int = TILE_SAMPLE_MIN_W,
    encode_fn=None,
) -> Array:
    """Spatially tiled encode with overlap blending in latent space."""
    if encode_fn is None:
        encode_fn = _jitted_tile_encode(cfg, conv_mode=_conv3d_mode())
    b, f, h, w, c = video.shape
    overlap_h = int(tile_sample_min_height * (1 - TILE_OVERLAP_H))
    overlap_w = int(tile_sample_min_width * (1 - TILE_OVERLAP_W))
    tlh = tile_sample_min_height // 8
    tlw = tile_sample_min_width // 8
    blend_h_ext = int(tlh * TILE_OVERLAP_H)
    blend_w_ext = int(tlw * TILE_OVERLAP_W)
    row_limit_h = tlh - blend_h_ext
    row_limit_w = tlw - blend_w_ext

    rows = []
    for i in range(0, h, overlap_h):
        row = []
        for j in range(0, w, overlap_w):
            tile = video[:, :, i:i + tile_sample_min_height, j:j + tile_sample_min_width]
            row.append(encode_fn(params, tile))
        rows.append(row)

    result_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j in range(len(row)):
            tile = row[j]
            if i > 0:
                tile = _blend_v(rows[i - 1][j], tile, blend_h_ext)
            if j > 0:
                tile = _blend_h(row[j - 1], tile, blend_w_ext)
            # reference blend_v/h mutate the tile in place: later neighbors
            # must blend against the already-blended tile
            row[j] = tile
            result_row.append(tile[:, :, :row_limit_h, :row_limit_w])
        result_rows.append(jnp.concatenate(result_row, axis=3))
    return jnp.concatenate(result_rows, axis=2)


import functools as _functools


def _conv3d_mode() -> Optional[str]:
    """Part of every jitted-decode cache key: VAP_VAE_CONV3D is read at
    trace time inside _conv3d, so a changed env var must map to a fresh
    trace, not a stale jit-cache hit."""
    return os.environ.get("VAP_VAE_CONV3D")


@_functools.lru_cache(maxsize=8)
def _jitted_tile_decode(cfg: CogVideoXVAEConfig, frame_batch: Optional[int] = None,
                        conv_mode: Optional[str] = None):
    return jax.jit(lambda p, z: vae_decode(p, cfg, z, frame_batch))


@_functools.lru_cache(maxsize=8)
def _jitted_chunk_decode(cfg: CogVideoXVAEConfig, conv_mode: Optional[str] = None):
    """One decoder frame-batch step; retraces once per (chunk shape, cache
    structure) — two graphs for the standard 13-frame stream. The incoming
    cache is donated: its buffers are dead after the step, and keeping them
    alongside the new cache would double-buffer ~1 GB at 480p."""
    @_functools.partial(jax.jit, donate_argnums=(2,))
    def step(p, z, cache):
        return decoder_forward(p["decoder"], cfg, z, cache)

    return step


@_functools.lru_cache(maxsize=8)
def _jitted_tile_encode(cfg: CogVideoXVAEConfig, frame_batch: Optional[int] = None,
                        conv_mode: Optional[str] = None):
    return jax.jit(lambda p, x: vae_encode(p, cfg, x, frame_batch))
