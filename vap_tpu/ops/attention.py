"""Attention dispatch: one joint full-attention op with pluggable providers.

The reference framework routes every SDPA call through a provider registry
(finetrainers/models/attention_dispatch.py) covering flash/cudnn/xformers
CUDA backends. On TPU one Pallas flash kernel covers the need; providers:

  * "flash"  — Pallas TPU flash attention (vap_tpu/ops/flash_attention.py)
  * "flash_varlen" — same kernel family with per-sample KV lengths (the
               reference's FLASH_VARLEN, attention_dispatch.py:809-889);
               "flash" also routes to it automatically when the call site
               passes kv_lens, mirroring how the reference derives
               cu_seqlens from the attention mask. Packed sequences
               (cu_seqlens' true form) are the segment_ids argument —
               fused fwd+bwd via one-hot extension dims
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

_VALID_PROVIDERS = ("flash", "flash_varlen", "sage", "jax_flash", "xla", "ring", "null")


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


def jax_flash_attention(q: Array, k: Array, v: Array, scale: Optional[float] = None,
                        kv_lens: Optional[Array] = None,
                        segment_ids: Optional[tuple] = None) -> Array:
    """jax.experimental.pallas library flash kernel with segment-id masking for
    ragged lengths (requires seq % 512 == 0 internally; we pad and mask).
    kv_lens adds per-sample valid KV lengths via the same segment ids;
    segment_ids ((q_seg, kv_seg, num_segments)) passes packed-sequence ids
    straight through (pads get out-of-range sentinels)."""
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
    if segment_ids is not None:
        q_ids = jnp.pad(segment_ids[0].astype(jnp.int32), ((0, 0), (0, pad_q)),
                        constant_values=-1)
        kv_ids = jnp.pad(segment_ids[1].astype(jnp.int32), ((0, 0), (0, pad_kv)),
                         constant_values=-2)
        seg = SegmentIds(q=q_ids, kv=kv_ids)
    elif pad_q or pad_kv or kv_lens is not None:
        q_ids = (jnp.arange(sq + pad_q) >= sq).astype(jnp.int32)[None].repeat(b, 0)
        if kv_lens is not None:
            kv_ids = (jnp.arange(skv + pad_kv)[None]
                      >= kv_lens.astype(jnp.int32)[:, None]).astype(jnp.int32) * 2
        else:
            kv_ids = (jnp.arange(skv + pad_kv) >= skv).astype(jnp.int32)[None].repeat(b, 0) * 2
        seg = SegmentIds(q=q_ids, kv=kv_ids)  # pads get non-matching ids
    bq = min(1024, qp.shape[2])
    bkv = min(1024, kp.shape[2])
    bs = BlockSizes(block_q=bq, block_k_major=bkv, block_k=bkv, block_b=1,
                    block_q_major_dkv=bq, block_k_major_dkv=bkv, block_k_dkv=bkv, block_q_dkv=bq,
                    block_k_major_dq=bkv, block_k_dq=bkv, block_q_dq=bq)
    out = _lib_flash(qp, kp, vp, segment_ids=seg, causal=False, sm_scale=scale, block_sizes=bs)
    return out[:, :, :sq]


def dense_attention_masked(q: Array, k: Array, v: Array,
                           kv_lens: Optional[Array] = None,
                           scale: Optional[float] = None) -> Array:
    """Dense attention with per-sample valid KV lengths (suffix key masking).

    f32 scores AND f32 AV — bit-parity with the masked-SDPA call sites the
    models previously inlined (e.g. HunyuanVideo's key-biased joint
    attention), which the reference runs through torch SDPA with an additive
    float mask.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    if kv_lens is not None:
        lens = kv_lens.astype(jnp.int32)
        keep = jnp.arange(k.shape[2])[None, :] < lens[:, None]
        # finite -1e30 (not -inf): an all-masked row would make softmax
        # over all -inf emit NaN; with a finite bias it emits uniform p,
        # which the any-valid gate below turns into the exact zeros the
        # fused varlen kernels return for kv_lens == 0
        s = s + jnp.where(keep, 0.0, -1e30).astype(jnp.float32)[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    if kv_lens is not None:
        p = p * (lens > 0).astype(jnp.float32)[:, None, None, None]
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(v.dtype)


def dense_attention_segmented(q: Array, k: Array, v: Array,
                              q_segment_ids: Array, kv_segment_ids: Array,
                              scale: Optional[float] = None) -> Array:
    """Dense reference for packed-sequence attention: query i attends key j
    iff q_segment_ids[b, i] == kv_segment_ids[b, j]. f32 scores and AV.
    Queries with no matching key (padding ids) return zeros."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    same = q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]   # [B, Sq, Skv]
    s = s + jnp.where(same, 0.0, -1e30).astype(jnp.float32)[:, None]
    p = jax.nn.softmax(s, axis=-1)
    p = p * jnp.any(same, axis=-1).astype(jnp.float32)[:, None, :, None]
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(v.dtype)


def scaled_dot_product_attention(
    q: Array,
    k: Array,
    v: Array,
    scale: Optional[float] = None,
    provider: Optional[str] = None,
    site: str = "default",
    kv_lens: Optional[Array] = None,
    segment_ids: Optional[tuple] = None,
) -> Array:
    """Full (non-causal) attention over [B, H, S, D] tensors.

    `site` names the attention call site for per-site provider overrides
    ('joint' = MoT joint self-attention, 'cross' = Wan per-ref cross-attn).

    `kv_lens` ([B] int, optional) gives per-sample valid KV lengths (suffix
    key padding — the layout right-padded tokenizer masks produce). This is
    the TPU-native FLASH_VARLEN/SAGE_VARLEN surface: the reference providers
    derive cu_seqlens from the attention mask and unpad
    (attention_dispatch.py:533-551); here the lengths mask inside the fused
    kernels with no repacking. Queries are never masked (reference attn_mask
    semantics are key-only).

    `segment_ids` ((q_seg [B,Sq], kv_seg [B,Skv], num_segments), optional)
    gives PACKED-sequence masking — query i attends key j iff their ids
    match (the reference FLASH_VARLEN's cu_seqlens form; ids must lie in
    [0, num_segments), out-of-range = padding). Mutually exclusive with
    kv_lens: packing subsumes ragged lengths.
    """
    provider = provider or get_attention_provider(site)
    if segment_ids is not None and kv_lens is not None:
        raise ValueError("segment_ids and kv_lens are mutually exclusive — "
                         "give padding its own out-of-range segment id")
    if provider in ("flash", "flash_varlen"):
        if segment_ids is not None:
            from .flash_attention import flash_attention_segmented

            return flash_attention_segmented(q, k, v, *segment_ids, scale)
        if kv_lens is not None:
            from .flash_attention import flash_attention_varlen

            return flash_attention_varlen(q, k, v, kv_lens, scale)
        return flash_attention(q, k, v, scale)
    elif provider == "sage":
        if segment_ids is not None:
            # int8 one-hots cannot carry the -1e30 mask products — packed
            # segments ride the bf16 kernel instead (still fused)
            from .flash_attention import flash_attention_segmented

            return flash_attention_segmented(q, k, v, *segment_ids, scale)
        from .flash_attention import flash_attention_int8

        return flash_attention_int8(q, k, v, scale, kv_lens=kv_lens)
    elif provider == "jax_flash":
        return jax_flash_attention(q, k, v, scale, kv_lens=kv_lens,
                                   segment_ids=segment_ids)
    elif provider == "xla":
        if segment_ids is not None:
            return dense_attention_segmented(q, k, v, segment_ids[0],
                                             segment_ids[1], scale)
        if kv_lens is not None:
            return dense_attention_masked(q, k, v, kv_lens, scale)
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
            if segment_ids is not None:
                from .flash_attention import flash_attention_segmented

                return flash_attention_segmented(q, k, v, *segment_ids, scale)
            if kv_lens is not None:
                from .flash_attention import flash_attention_varlen

                return flash_attention_varlen(q, k, v, kv_lens, scale)
            return flash_attention(q, k, v, scale)
        mesh, axis, rotate_method = ctx
        return sequence_parallel_attention(q, k, v, mesh, axis, scale,
                                           rotate_method=rotate_method,
                                           kv_lens=kv_lens,
                                           segment_ids=segment_ids)
    raise ValueError(f"unknown attention provider {provider!r}")
