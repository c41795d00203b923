"""Attention dispatch: one joint full-attention op with pluggable providers.

The reference framework routes every SDPA call through a provider registry
(finetrainers/models/attention_dispatch.py) covering flash/cudnn/xformers
CUDA backends. On TPU one Pallas flash kernel covers the need; providers:

  * "flash"  — Pallas TPU flash attention (vap_tpu/ops/flash_attention.py)
  * "sage"   — int8-QK flash attention (SageAttention analog; inference only —
               its VJP falls back to the bf16 kernel's backward)
  * "xla"    — plain jnp einsum softmax (XLA-fused; works on any backend)
  * "ring"   — sequence-sharded ring attention over a mesh axis (shard_map +
               Pallas per-shard kernel); see vap_tpu/parallel/ring_attention.py

Selection is a context variable (mirrors the reference's `attention_provider`
context manager) so pipelines/trainers can switch providers per phase.
"""

from __future__ import annotations

import contextlib
import os
import threading
from typing import Optional

import jax
import jax.numpy as jnp

from .flash_attention import flash_attention

Array = jnp.ndarray

_state = threading.local()

_VALID_PROVIDERS = ("flash", "sage", "jax_flash", "xla", "ring", "null")


def _parse_provider_spec(spec: str) -> dict:
    """'sage' -> {'default': 'sage'}; 'sage cross:xla' -> per-site overrides.

    The reference's per-module provider selection (--attn_provider_training
    'module:provider', finetrainers/trainer/base.py:48-101) keys on torch
    module names; the functional analog keys on attention SITES — 'joint'
    (the MoT joint self-attention), 'cross' (Wan per-ref cross-attention),
    'default' (everything else).
    """
    out = {}
    for part in spec.replace(",", " ").split():
        if ":" in part:
            site, name = part.split(":", 1)
        else:
            site, name = "default", part
        if name not in _VALID_PROVIDERS:
            raise ValueError(f"unknown attention provider {name!r}; valid: {_VALID_PROVIDERS}")
        out[site] = name
    if not out:
        raise ValueError(f"empty attention provider spec {spec!r}")
    return out


def _default_provider() -> str:
    env = os.environ.get("VAP_ATTN_PROVIDER")
    if env:
        return env
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend at import time
        platform = "cpu"
    # the in-repo kernel matches the jax library kernel (~65 TFLOP/s at VAP
    # shapes) with native ragged-length support (scripts/attn_bench.py)
    return "flash" if platform == "tpu" else "xla"


def get_attention_provider(site: str = "default") -> str:
    m = getattr(_state, "providers", None)
    if m:
        return m.get(site) or m.get("default") or _default_provider()
    return _default_provider()


@contextlib.contextmanager
def attention_provider(spec: str):
    """Context manager selecting the attention backend (cf. reference
    finetrainers attention_provider, attention_dispatch.py:416-460).

    Accepts a bare provider name ('sage') or a per-site spec
    ('sage joint:flash cross:xla').
    """
    m = _parse_provider_spec(spec)
    prev = getattr(_state, "providers", None)
    _state.providers = m
    try:
        yield
    finally:
        _state.providers = prev


def dense_attention(q: Array, k: Array, v: Array, scale: Optional[float] = None) -> Array:
    """Reference dense attention. q/k/v: [B, H, S, D]. fp32 softmax."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v).astype(q.dtype)


def jax_flash_attention(q: Array, k: Array, v: Array, scale: Optional[float] = None) -> Array:
    """jax.experimental.pallas library flash kernel with segment-id masking for
    ragged lengths (requires seq % 512 == 0 internally; we pad and mask)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention as _lib_flash,
    )
    from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, sq, d = q.shape
    skv = k.shape[2]
    blk = 1024  # pad to the block size so block_q/block_k divide evenly
    pad_q = (-sq) % blk
    pad_kv = (-skv) % blk

    def padseq(x, pad):
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0))) if pad else x

    qp, kp, vp = padseq(q, pad_q), padseq(k, pad_kv), padseq(v, pad_kv)
    seg = None
    if pad_q or pad_kv:
        q_ids = (jnp.arange(sq + pad_q) >= sq).astype(jnp.int32)[None].repeat(b, 0)
        kv_ids = (jnp.arange(skv + pad_kv) >= skv).astype(jnp.int32)[None].repeat(b, 0) * 2
        seg = SegmentIds(q=q_ids, kv=kv_ids)  # pads get non-matching ids
    bq = min(1024, qp.shape[2])
    bkv = min(1024, kp.shape[2])
    bs = BlockSizes(block_q=bq, block_k_major=bkv, block_k=bkv, block_b=1,
                    block_q_major_dkv=bq, block_k_major_dkv=bkv, block_k_dkv=bkv, block_q_dkv=bq,
                    block_k_major_dq=bkv, block_k_dq=bkv, block_q_dq=bq)
    out = _lib_flash(qp, kp, vp, segment_ids=seg, causal=False, sm_scale=scale, block_sizes=bs)
    return out[:, :, :sq]


def scaled_dot_product_attention(
    q: Array,
    k: Array,
    v: Array,
    scale: Optional[float] = None,
    provider: Optional[str] = None,
    site: str = "default",
) -> Array:
    """Full (non-causal, unmasked) attention over [B, H, S, D] tensors.

    `site` names the attention call site for per-site provider overrides
    ('joint' = MoT joint self-attention, 'cross' = Wan per-ref cross-attn).
    """
    provider = provider or get_attention_provider(site)
    if provider == "flash":
        return flash_attention(q, k, v, scale)
    elif provider == "sage":
        from .flash_attention import flash_attention_int8

        return flash_attention_int8(q, k, v, scale)
    elif provider == "jax_flash":
        return jax_flash_attention(q, k, v, scale)
    elif provider == "xla":
        return dense_attention(q, k, v, scale)
    elif provider == "null":
        # PROFILING ONLY: skips the attention math so a step timed under
        # 'null' isolates the non-attention (linear/elementwise/layout) cost.
        # The tiny q/k terms keep a real data dependency — returning bare v
        # lets XLA dead-code every producer that only feeds attention (in the
        # MoT joint block that deletes the whole reference branch)
        eps = jnp.asarray(1e-30, q.dtype)
        if v.shape[2] == q.shape[2]:
            return v + (q + k) * eps
        return jnp.broadcast_to(v[:, :, :1], q.shape).astype(q.dtype) + (q + k[:, :, :q.shape[2]]) * eps
    elif provider == "ring":
        from ..parallel.ring_attention import get_attention_mesh, sequence_parallel_attention

        ctx = get_attention_mesh()
        if ctx is None:
            # no mesh installed: degenerate to the local fused kernel
            return flash_attention(q, k, v, scale)
        mesh, axis, rotate_method = ctx
        return sequence_parallel_attention(q, k, v, mesh, axis, scale,
                                           rotate_method=rotate_method)
    raise ValueError(f"unknown attention provider {provider!r}")
