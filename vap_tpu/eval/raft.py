"""RAFT optical flow (Teed & Deng, ECCV 2020) — functional JAX, channel-last.

Dynamic Degree, one of the five headline metrics in the reference's results
table (reference README.md:73-81, "Dynamic Degree 77.08"), is computed by
VBench from RAFT optical flow (the princeton-vl/RAFT "raft-things" checkpoint).
The reference repo ships no eval code; this module is the in-framework flow
encoder behind `vap_tpu.eval.dynamic_degree` and
`vap_tpu.eval.motion_smoothness`.

Architecture (princeton-vl/RAFT core/, re-derived from the paper + the
published state-dict layout; no code copied):

  fnet  : BasicEncoder(out=256, instance norm)  — 7x7/2 stem, 3 residual
          stages (64, 96/2, 128/2), 1x1 head -> features at 1/8 resolution
  cnet  : BasicEncoder(out=hidden+context, batch norm) on image1, split into
          GRU state (tanh) and context (relu)
  corr  : all-pairs correlation volume / sqrt(D), 4-level avg-pool pyramid,
          per-iteration bilinear lookup in a (2r+1)^2 window
  update: motion encoder (corr 1x1->3x3, flow 7x7->3x3, fuse 3x3) ->
          SepConvGRU ((1,5) then (5,1) gates) -> flow head + convex-upsample
          mask (8x8, 3x3-neighborhood softmax weights, x0.25)

`convert_raft_state_dict` maps the princeton checkpoint naming
(`fnet.*`, `cnet.*`, `update_block.*`, optional DataParallel `module.`
prefix) so the published raft-things.pth loads directly.

TPU notes: NHWC so every conv lowers onto the MXU; the GRU iterations are a
`lax.scan`; the correlation lookup is a batched gather (4 corner taps with
zero-padding masks, exactly torch grid_sample(align_corners=True,
padding_mode="zeros") semantics); static shapes throughout — one compile per
input resolution. f32 by default: the model is ~5M params and flow deltas are
small; bf16 saves nothing that matters here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    fnet_dim: int = 256
    hidden_dim: int = 128
    context_dim: int = 128
    encoder_stem: int = 64
    encoder_channels: Tuple[int, int, int] = (64, 96, 128)
    corr_levels: int = 4
    corr_radius: int = 4
    # motion-encoder widths (convc1, convc2, convf1, convf2); the fuse conv
    # outputs motion_dim-2 channels so cat(out, flow) is motion_dim wide
    motion_corr_c1: int = 256
    motion_corr_c2: int = 192
    motion_flow_c1: int = 128
    motion_flow_c2: int = 64
    motion_dim: int = 128
    flow_head_hidden: int = 256
    iters: int = 20

    @classmethod
    def things(cls, **overrides) -> "RAFTConfig":
        """The raft-things eval configuration VBench uses."""
        return cls(**overrides)

    @classmethod
    def tiny(cls, **overrides) -> "RAFTConfig":
        base = dict(fnet_dim=16, hidden_dim=8, context_dim=8, encoder_stem=8,
                    encoder_channels=(8, 12, 16), corr_levels=2, corr_radius=2,
                    motion_corr_c1=16, motion_corr_c2=12, motion_flow_c1=8,
                    motion_flow_c2=8, motion_dim=16, flow_head_hidden=16,
                    iters=4)
        base.update(overrides)
        return cls(**base)

    @property
    def corr_planes(self) -> int:
        return self.corr_levels * (2 * self.corr_radius + 1) ** 2

    @classmethod
    def from_state_dict(cls, sd, **overrides) -> "RAFTConfig":
        """Infer the architecture from a princeton-naming state dict (shapes
        fully determine every width; corr levels/radius solve
        levels * (2r+1)^2 = convc1 in-channels, radius-major so the
        published (4, 4) wins for 324 planes). `iters` is not a checkpoint
        property — override it or keep the default."""
        if any(k.startswith("module.") for k in sd):
            sd = {k[len("module."):]: v for k, v in sd.items()}
        shp = lambda k: tuple(sd[k].shape)
        planes = shp("update_block.encoder.convc1.weight")[1]
        for radius in (4, 3, 2, 1):
            side = (2 * radius + 1) ** 2
            if planes % side == 0 and 1 <= planes // side <= 6:
                levels = planes // side
                break
        else:
            raise ValueError(f"cannot factor corr planes {planes}")
        hidden = shp("update_block.gru.convz1.weight")[0]
        base = dict(
            fnet_dim=shp("fnet.conv2.weight")[0],
            hidden_dim=hidden,
            context_dim=shp("cnet.conv2.weight")[0] - hidden,
            encoder_stem=shp("fnet.conv1.weight")[0],
            encoder_channels=tuple(
                shp(f"fnet.layer{i}.0.conv1.weight")[0] for i in (1, 2, 3)),
            corr_levels=levels, corr_radius=radius,
            motion_corr_c1=shp("update_block.encoder.convc1.weight")[0],
            motion_corr_c2=shp("update_block.encoder.convc2.weight")[0],
            motion_flow_c1=shp("update_block.encoder.convf1.weight")[0],
            motion_flow_c2=shp("update_block.encoder.convf2.weight")[0],
            motion_dim=shp("update_block.encoder.conv.weight")[0] + 2,
            flow_head_hidden=shp("update_block.flow_head.conv1.weight")[0],
        )
        base.update(overrides)
        return cls(**base)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _conv2d(p: Params, x: Array, stride: int = 1) -> Array:
    """x: [B, H, W, C]; kernel stored [kh, kw, cin, cout]. Padding is the
    explicit symmetric k//2 torch uses — NOT XLA "SAME", whose asymmetric
    (lo, hi) split at stride 2 samples different positions and breaks
    checkpoint parity."""
    kh, kw = p["kernel"].shape[:2]
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride),
        ((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"].astype(x.dtype)


def _instance_norm(x: Array, eps: float = 1e-5) -> Array:
    """torch InstanceNorm2d(affine=False, track_running_stats=False)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _batch_norm(p: Params, x: Array, eps: float = 1e-5) -> Array:
    """torch BatchNorm2d in eval mode (running statistics)."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    y = (x.astype(jnp.float32) - p["mean"]) * inv * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def _norm(p, x, kind: str) -> Array:
    if kind == "instance":
        return _instance_norm(x)
    if kind == "batch":
        return _batch_norm(p, x)
    raise ValueError(f"unknown norm kind {kind!r}")


# ---------------------------------------------------------------------------
# feature / context encoder
# ---------------------------------------------------------------------------

def _residual_block(p: Params, x: Array, stride: int, norm: str) -> Array:
    y = jax.nn.relu(_norm(p.get("norm1"), _conv2d(p["conv1"], x, stride), norm))
    y = jax.nn.relu(_norm(p.get("norm2"), _conv2d(p["conv2"], y), norm))
    if "downsample" in p:
        x = _norm(p["downsample"].get("norm"),
                  _conv2d(p["downsample"]["conv"], x, stride), norm)
    return jax.nn.relu(x + y)


def basic_encoder(p: Params, x: Array, norm: str) -> Array:
    """[B, H, W, 3] -> [B, H/8, W/8, out]. Stem 7x7/2 then three 2-block
    stages at strides (1, 2, 2), 1x1 head."""
    x = jax.nn.relu(_norm(p.get("norm1"), _conv2d(p["conv1"], x, 2), norm))
    for li, stage in enumerate((p["layer1"], p["layer2"], p["layer3"])):
        stride = 1 if li == 0 else 2
        x = _residual_block(stage[0], x, stride, norm)
        x = _residual_block(stage[1], x, 1, norm)
    return _conv2d(p["conv2"], x)


# ---------------------------------------------------------------------------
# correlation volume
# ---------------------------------------------------------------------------

def build_corr_pyramid(fmap1: Array, fmap2: Array, levels: int) -> list:
    """All-pairs correlation / sqrt(D): [B, H, W, D] x2 ->
    [(B*H*W, H/2^l, W/2^l)] for l in range(levels) (avg-pool pyramid over
    the *second* image's spatial dims, floor semantics on odd sizes)."""
    b, h, w, d = fmap1.shape
    f1 = fmap1.reshape(b, h * w, d).astype(jnp.float32)
    f2 = fmap2.reshape(b, h * w, d).astype(jnp.float32)
    corr = jnp.einsum("bqd,bkd->bqk", f1, f2) / jnp.sqrt(jnp.float32(d))
    corr = corr.reshape(b * h * w, h, w)
    pyramid = [corr]
    for _ in range(levels - 1):
        corr = jax.lax.reduce_window(
            corr, 0.0, jax.lax.add, (1, 2, 2), (1, 2, 2), "VALID") * 0.25
        pyramid.append(corr)
    return pyramid


def _bilinear_gather(img: Array, x: Array, y: Array) -> Array:
    """img [N, H, W]; x, y [N, K] pixel coordinates -> [N, K].
    Exactly torch grid_sample(mode="bilinear", padding_mode="zeros",
    align_corners=True) after the princeton bilinear_sampler's unnormalize:
    each of the four corner taps is zeroed when it falls outside the image."""
    n, h, w = img.shape
    flat = img.reshape(n, h * w)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    out = jnp.zeros_like(x)
    for dy in (0.0, 1.0):
        for dx in (0.0, 1.0):
            xi, yi = x0 + dx, y0 + dy
            wgt = (1.0 - jnp.abs(x - xi)) * (1.0 - jnp.abs(y - yi))
            valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            idx = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
            val = jnp.take_along_axis(flat, idx, axis=1)
            out = out + jnp.where(valid, wgt * val, 0.0)
    return out


def corr_lookup(pyramid: list, coords: Array, radius: int) -> Array:
    """coords [B, H, W, 2] (x, y at 1/8 res) -> [B, H, W, levels*(2r+1)^2].

    Window layout matches the princeton CorrBlock exactly, including its
    meshgrid quirk: flattened channel (i, j) of each level samples
    (x + lin[i], y + lin[j]) with lin = linspace(-r, r, 2r+1) — the offsets
    are *transposed* relative to the natural (row=y, col=x) reading, which is
    what the published checkpoints were trained with."""
    b, h, w, _ = coords.shape
    lin = jnp.linspace(-radius, radius, 2 * radius + 1, dtype=jnp.float32)
    dx = jnp.repeat(lin, 2 * radius + 1)   # offset added to x, varies slowest
    dy = jnp.tile(lin, 2 * radius + 1)     # offset added to y, varies fastest
    cx = coords[..., 0].reshape(b * h * w, 1).astype(jnp.float32)
    cy = coords[..., 1].reshape(b * h * w, 1).astype(jnp.float32)
    out = []
    for lvl, corr in enumerate(pyramid):
        scale = 1.0 / (2 ** lvl)
        out.append(_bilinear_gather(corr, cx * scale + dx[None], cy * scale + dy[None]))
    return jnp.concatenate(out, axis=-1).reshape(b, h, w, -1)


# ---------------------------------------------------------------------------
# update block
# ---------------------------------------------------------------------------

def _motion_encoder(p: Params, flow: Array, corr: Array) -> Array:
    cor = jax.nn.relu(_conv2d(p["convc1"], corr))
    cor = jax.nn.relu(_conv2d(p["convc2"], cor))
    flo = jax.nn.relu(_conv2d(p["convf1"], flow))
    flo = jax.nn.relu(_conv2d(p["convf2"], flo))
    out = jax.nn.relu(_conv2d(p["conv"], jnp.concatenate([cor, flo], -1)))
    return jnp.concatenate([out, flow], -1)


def _sep_conv_gru(p: Params, h: Array, x: Array) -> Array:
    for sfx in ("1", "2"):  # (1,5) horizontal pass then (5,1) vertical pass
        hx = jnp.concatenate([h, x], -1)
        z = jax.nn.sigmoid(_conv2d(p["convz" + sfx], hx))
        r = jax.nn.sigmoid(_conv2d(p["convr" + sfx], hx))
        q = jnp.tanh(_conv2d(p["convq" + sfx], jnp.concatenate([r * h, x], -1)))
        h = (1.0 - z) * h + z * q
    return h


def _flow_head(p: Params, x: Array) -> Array:
    return _conv2d(p["conv2"], jax.nn.relu(_conv2d(p["conv1"], x)))


def _upsample_mask(p: Params, net: Array) -> Array:
    return 0.25 * _conv2d(p["conv2"], jax.nn.relu(_conv2d(p["conv1"], net)))


def upsample_flow_convex(flow: Array, mask: Array) -> Array:
    """Convex 8x upsampling: flow [B, H, W, 2] (1/8 res), mask
    [B, H, W, 64*9] -> [B, 8H, 8W, 2]. Output pixel (8h+a, 8w+b) is the
    softmax-weighted sum over the 3x3 neighborhood of 8*flow at (h, w);
    mask channels decompose as (k=3x3 tap, a, b) — torch unfold tap order
    (ky, kx) row-major."""
    b, h, w, _ = flow.shape
    f8 = (8.0 * flow).astype(jnp.float32)
    pad = jnp.pad(f8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = jnp.stack([pad[:, ky:ky + h, kx:kx + w, :]
                      for ky in range(3) for kx in range(3)], axis=3)  # [B,H,W,9,2]
    m = jax.nn.softmax(mask.reshape(b, h, w, 9, 8, 8).astype(jnp.float32), axis=3)
    up = jnp.einsum("bhwkmn,bhwkc->bhwmnc", m, taps)                   # [B,H,W,8,8,2]
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def _coords_grid(b: int, h: int, w: int) -> Array:
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return jnp.broadcast_to(jnp.stack([xs, ys], -1), (b, h, w, 2))


def raft_flow(params: Params, cfg: RAFTConfig, image1: Array, image2: Array,
              iters: int = None) -> Array:
    """image1/image2: RGB [B, H, W, 3] in [0, 255], H and W multiples of 8
    (see `pad_to_multiple_of_8`) -> upsampled flow [B, H, W, 2] (x, y) in
    pixels. Matches princeton RAFT.forward(test_mode=True)[1]."""
    iters = cfg.iters if iters is None else iters
    img1 = 2.0 * (image1.astype(jnp.float32) / 255.0) - 1.0
    img2 = 2.0 * (image2.astype(jnp.float32) / 255.0) - 1.0
    b = img1.shape[0]

    fmaps = basic_encoder(params["fnet"], jnp.concatenate([img1, img2], 0),
                          norm="instance")
    fmap1, fmap2 = fmaps[:b], fmaps[b:]
    pyramid = build_corr_pyramid(fmap1, fmap2, cfg.corr_levels)

    cnet = basic_encoder(params["cnet"], img1, norm="batch")
    net = jnp.tanh(cnet[..., :cfg.hidden_dim])
    inp = jax.nn.relu(cnet[..., cfg.hidden_dim:])

    _, h8, w8, _ = fmap1.shape
    coords0 = _coords_grid(b, h8, w8)

    def step(carry, _):
        net, coords1 = carry
        corr = corr_lookup(pyramid, coords1, cfg.corr_radius)
        flow = coords1 - coords0
        motion = _motion_encoder(params["update"]["encoder"], flow, corr)
        net = _sep_conv_gru(params["update"]["gru"], net,
                            jnp.concatenate([inp, motion], -1))
        delta = _flow_head(params["update"]["flow_head"], net)
        return (net, coords1 + delta), None

    (net, coords1), _ = jax.lax.scan(step, (net, coords0), None, length=iters)
    mask = _upsample_mask(params["update"]["mask"], net)
    return upsample_flow_convex(coords1 - coords0, mask)


def pad_to_multiple_of_8(frames: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int, int, int]]:
    """Replicate-pad [..., H, W, C] so H, W are multiples of 8, split evenly
    (princeton InputPadder 'sintel' mode — what VBench's dynamic_degree uses).
    Returns (padded, (top, bottom, left, right)) for later cropping."""
    h, w = frames.shape[-3], frames.shape[-2]
    ph, pw = -h % 8, -w % 8
    pads = (ph // 2, ph - ph // 2, pw // 2, pw - pw // 2)
    if ph or pw:
        cfg = [(0, 0)] * (frames.ndim - 3) + [(pads[0], pads[1]), (pads[2], pads[3]), (0, 0)]
        frames = np.pad(frames, cfg, mode="edge")
    return frames, pads


def unpad(flow: np.ndarray, pads: Tuple[int, int, int, int]) -> np.ndarray:
    t, b, l, r = pads
    h, w = flow.shape[-3], flow.shape[-2]
    return flow[..., t:h - b, l:w - r, :]


# ---------------------------------------------------------------------------
# init / conversion
# ---------------------------------------------------------------------------

def _init_conv(key, kh, kw, cin, cout, dtype=jnp.float32) -> Params:
    scale = 1.0 / np.sqrt(kh * kw * cin)
    return {"kernel": jax.random.uniform(key, (kh, kw, cin, cout), dtype,
                                         -scale, scale),
            "bias": jnp.zeros((cout,), dtype)}


def _init_bn(c, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}


def _init_encoder(key, cfg: RAFTConfig, out_dim: int, norm: str,
                  dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 32))
    stem = cfg.encoder_stem
    p: Params = {"conv1": _init_conv(next(keys), 7, 7, 3, stem, dtype)}
    if norm == "batch":
        p["norm1"] = _init_bn(stem, dtype)
    cin = stem
    for li, cout in enumerate(cfg.encoder_channels):
        stride = 1 if li == 0 else 2
        blocks = []
        for bi in range(2):
            bp = {"conv1": _init_conv(next(keys), 3, 3, cin, cout, dtype),
                  "conv2": _init_conv(next(keys), 3, 3, cout, cout, dtype)}
            if norm == "batch":
                bp["norm1"] = _init_bn(cout, dtype)
                bp["norm2"] = _init_bn(cout, dtype)
            if bi == 0 and stride != 1:
                bp["downsample"] = {"conv": _init_conv(next(keys), 1, 1, cin, cout, dtype)}
                if norm == "batch":
                    bp["downsample"]["norm"] = _init_bn(cout, dtype)
            blocks.append(bp)
            cin = cout
        p[f"layer{li + 1}"] = blocks
    p["conv2"] = _init_conv(next(keys), 1, 1, cin, out_dim, dtype)
    return p


def init_raft(key, cfg: RAFTConfig, dtype=jnp.float32) -> Params:
    kf, kc, *ku = jax.random.split(key, 17)
    md = cfg.motion_dim
    return {
        "fnet": _init_encoder(kf, cfg, cfg.fnet_dim, "instance", dtype),
        "cnet": _init_encoder(kc, cfg, cfg.hidden_dim + cfg.context_dim, "batch", dtype),
        "update": {
            "encoder": {
                "convc1": _init_conv(ku[0], 1, 1, cfg.corr_planes, cfg.motion_corr_c1, dtype),
                "convc2": _init_conv(ku[1], 3, 3, cfg.motion_corr_c1, cfg.motion_corr_c2, dtype),
                "convf1": _init_conv(ku[2], 7, 7, 2, cfg.motion_flow_c1, dtype),
                "convf2": _init_conv(ku[3], 3, 3, cfg.motion_flow_c1, cfg.motion_flow_c2, dtype),
                "conv": _init_conv(ku[4], 3, 3, cfg.motion_corr_c2 + cfg.motion_flow_c2,
                                   md - 2, dtype),
            },
            "gru": {
                "convz1": _init_conv(ku[5], 1, 5, cfg.hidden_dim + cfg.context_dim + md, cfg.hidden_dim, dtype),
                "convr1": _init_conv(ku[6], 1, 5, cfg.hidden_dim + cfg.context_dim + md, cfg.hidden_dim, dtype),
                "convq1": _init_conv(ku[7], 1, 5, cfg.hidden_dim + cfg.context_dim + md, cfg.hidden_dim, dtype),
                "convz2": _init_conv(ku[8], 5, 1, cfg.hidden_dim + cfg.context_dim + md, cfg.hidden_dim, dtype),
                "convr2": _init_conv(ku[9], 5, 1, cfg.hidden_dim + cfg.context_dim + md, cfg.hidden_dim, dtype),
                "convq2": _init_conv(ku[10], 5, 1, cfg.hidden_dim + cfg.context_dim + md, cfg.hidden_dim, dtype),
            },
            "flow_head": {
                "conv1": _init_conv(ku[11], 3, 3, cfg.hidden_dim, cfg.flow_head_hidden, dtype),
                "conv2": _init_conv(ku[12], 3, 3, cfg.flow_head_hidden, 2, dtype),
            },
            "mask": {
                "conv1": _init_conv(ku[13], 3, 3, cfg.hidden_dim, cfg.flow_head_hidden, dtype),
                "conv2": _init_conv(ku[14], 1, 1, cfg.flow_head_hidden, 64 * 9, dtype),
            },
        },
    }


def _cv(sd, name, dtype) -> Params:
    """torch Conv2d [cout, cin, kh, kw] -> {kernel [kh, kw, cin, cout], bias}."""
    return {"kernel": jnp.asarray(np.asarray(sd[name + ".weight"]).transpose(2, 3, 1, 0), dtype),
            "bias": jnp.asarray(np.asarray(sd[name + ".bias"]), dtype)}


def _bn(sd, name, dtype) -> Params:
    return {"scale": jnp.asarray(np.asarray(sd[name + ".weight"]), dtype),
            "bias": jnp.asarray(np.asarray(sd[name + ".bias"]), dtype),
            "mean": jnp.asarray(np.asarray(sd[name + ".running_mean"]), dtype),
            "var": jnp.asarray(np.asarray(sd[name + ".running_var"]), dtype)}


def _convert_encoder(sd, prefix: str, norm: str, dtype) -> Params:
    p: Params = {"conv1": _cv(sd, prefix + ".conv1", dtype)}
    if norm == "batch":
        p["norm1"] = _bn(sd, prefix + ".norm1", dtype)
    for li in (1, 2, 3):
        blocks = []
        for bi in (0, 1):
            base = f"{prefix}.layer{li}.{bi}"
            bp = {"conv1": _cv(sd, base + ".conv1", dtype),
                  "conv2": _cv(sd, base + ".conv2", dtype)}
            if norm == "batch":
                bp["norm1"] = _bn(sd, base + ".norm1", dtype)
                bp["norm2"] = _bn(sd, base + ".norm2", dtype)
            if base + ".downsample.0.weight" in sd:
                bp["downsample"] = {"conv": _cv(sd, base + ".downsample.0", dtype)}
                if norm == "batch":
                    bp["downsample"]["norm"] = _bn(sd, base + ".downsample.1", dtype)
            blocks.append(bp)
        p[f"layer{li}"] = blocks
    p["conv2"] = _cv(sd, prefix + ".conv2", dtype)
    return p


def convert_raft_state_dict(sd: Dict[str, np.ndarray], cfg: RAFTConfig = None,
                            dtype=jnp.float32) -> Params:
    """princeton-vl/RAFT checkpoint (raft-things.pth etc.; DataParallel
    `module.` prefix tolerated) -> vap_tpu pytree. Instance-norm layers are
    affine-free in the checkpoints, so fnet carries conv weights only."""
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items() if k.startswith("module.")}
    ub = "update_block"
    return {
        "fnet": _convert_encoder(sd, "fnet", "instance", dtype),
        "cnet": _convert_encoder(sd, "cnet", "batch", dtype),
        "update": {
            "encoder": {k: _cv(sd, f"{ub}.encoder.{k}", dtype)
                        for k in ("convc1", "convc2", "convf1", "convf2", "conv")},
            "gru": {k: _cv(sd, f"{ub}.gru.{k}", dtype)
                    for k in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2")},
            "flow_head": {"conv1": _cv(sd, f"{ub}.flow_head.conv1", dtype),
                          "conv2": _cv(sd, f"{ub}.flow_head.conv2", dtype)},
            "mask": {"conv1": _cv(sd, f"{ub}.mask.0", dtype),
                     "conv2": _cv(sd, f"{ub}.mask.2", dtype)},
        },
    }
