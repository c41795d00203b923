"""Sequence-parallel (context-parallel) attention over a mesh axis.

The reference implements CP as torch ring attention with two KV rotation
methods, "allgather" and "alltoall" (finetrainers/models/attention_dispatch.py
:82-92, :465-469; the trainer defaults to allgather — trainer/base.py:81-83).
TPU-native equivalents of both:

- ``rotate_method="allgather"`` (default, matches the reference default):
  queries stay sharded on the token axis, K/V are all-gathered over the `seq`
  mesh axis (XLA schedules the gather on ICI and overlaps it with compute),
  and the local attention is the Pallas flash kernel. Simplest and fastest
  when the gathered KV fits in HBM.

- ``rotate_method="ppermute"``: true ring attention. Each device keeps only
  its KV shard; KV blocks rotate around the `seq` ring via `lax.ppermute`
  while a streaming online-softmax (m, l, acc) accumulates exact attention.
  KV memory stays O(S/n) per chip — use for very long joint sequences.

- ``rotate_method="ulysses"``: head-scatter sequence parallelism (DeepSpeed-
  Ulysses decomposition; no reference counterpart — SURVEY §2.3 marks it
  absent upstream). One `all_to_all` reshards q/k/v from seq-sharded
  [B, H, S/n, D] to head-sharded [B, H/n, S, D], local attention runs over
  the FULL sequence on H/n heads, and one `all_to_all` reshards the output
  back. Per-device comm is 4·(S/n)·H·D·(n-1)/n elements vs allgather-KV's
  2·S·H·D·(n-1)/n — i.e. 2/n of the traffic, and it rides ICI as a single
  fused collective. Needs H divisible by the seq degree; the joint-attention
  softmax is exact because heads are independent.

Exposed both as an explicit shard_map wrapper (`sequence_parallel_attention`)
and through the "ring" provider of vap_tpu.ops.attention when an attention
mesh context is installed.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.attention import (
    dense_attention,
    dense_attention_masked,
    dense_attention_segmented,
)
from ..ops.flash_attention import (
    flash_attention,
    flash_attention_segmented,
    flash_attention_varlen,
)

_ctx = threading.local()


@contextlib.contextmanager
def attention_mesh(mesh: Mesh, axis: str = "seq", rotate_method: str = "allgather"):
    """Install the mesh used by the 'ring' attention provider.

    rotate_method matches the reference's --cp_rotate_method knob:
    "allgather" (default) or "ppermute" (true ring, the alltoall analog).
    """
    prev = getattr(_ctx, "mesh_axis", None)
    _ctx.mesh_axis = (mesh, axis, rotate_method)
    try:
        yield
    finally:
        _ctx.mesh_axis = prev


def get_attention_mesh():
    return getattr(_ctx, "mesh_axis", None)


def _local_attention(q, k, v, scale, platform: str, kv_lens=None,
                     segment_ids=None):
    if segment_ids is not None:
        q_seg, kv_seg, n_seg = segment_ids
        if platform == "tpu":
            return flash_attention_segmented(q, k, v, q_seg, kv_seg, n_seg, scale)
        return dense_attention_segmented(q, k, v, q_seg, kv_seg, scale)
    if platform == "tpu":
        if kv_lens is not None:
            return flash_attention_varlen(q, k, v, kv_lens, scale)
        return flash_attention(q, k, v, scale)
    if kv_lens is not None:
        return dense_attention_masked(q, k, v, kv_lens, scale)
    return dense_attention(q, k, v, scale)


def _mesh_platform(mesh: Mesh) -> str:
    try:
        return mesh.devices.flat[0].platform
    except Exception:  # pragma: no cover - abstract meshes
        return jax.devices()[0].platform


def _ring_body(q_loc, k_loc, v_loc, *, axis: str, n: int, scale: float,
               kv_lens=None, q_seg=None, kv_seg=None):
    """One shard's streaming ring attention: rotate KV blocks around the
    `axis` ring with ppermute, accumulating exact softmax online (fp32
    m/l/acc carry, flash-attention style). Exact for any block order because
    softmax is permutation-invariant over keys.

    kv_lens ([B] int, replicated): per-sample GLOBAL valid KV length. The
    perm sends block i -> i+1, so at ring step t this device (index `my`)
    holds the KV shard that started on device (my - t) mod n; its global key
    positions are block·skv + arange(skv), masked against kv_lens. A fully
    masked block would leave the running max untouched at -1e30 and alias
    p == 1, so the max is floored at -1e4 (unreachable by real scores) to
    flush those p to exact zero.

    q_seg/kv_seg ([B, sq]/[B, skv] int, SHARDED like q/k): packed-sequence
    ids — query i attends key j iff ids match; kv_seg blocks rotate around
    the ring with their K/V, and the same -1e4 floor handles ring steps
    whose block carries no matching keys. Padding-query outputs are
    unspecified-but-finite (same contract as flash_attention_segmented) —
    slice them away. Mutually exclusive with kv_lens.
    """
    b, h, sq, d = q_loc.shape
    skv = k_loc.shape[2]
    qf = q_loc.astype(jnp.float32) * scale
    perm = [(i, (i + 1) % n) for i in range(n)]
    masked = kv_lens is not None or q_seg is not None
    my = jax.lax.axis_index(axis) if kv_lens is not None else None

    def step(carry, t):
        if q_seg is not None:
            acc, m, l, k_cur, v_cur, seg_cur = carry
        else:
            acc, m, l, k_cur, v_cur = carry
            seg_cur = None
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_cur.astype(jnp.float32))
        if kv_lens is not None:
            block = jnp.mod(my - t, n)
            pos = block * skv + jnp.arange(skv)                      # global
            keep = pos[None, :] < kv_lens.astype(jnp.int32)[:, None]  # [B, skv]
            s = jnp.where(keep[:, None, None, :], s, -1e30)
        if q_seg is not None:
            same = q_seg[:, :, None] == seg_cur[:, None, :]          # [B, sq, skv]
            s = jnp.where(same[:, None], s, -1e30)
        m_new = jnp.maximum(m, s.max(axis=-1))
        if masked:
            m_new = jnp.maximum(m_new, -1e4)
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + p.sum(axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32))
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        if q_seg is not None:
            seg_nxt = jax.lax.ppermute(seg_cur, axis, perm)
            return (acc_new, m_new, l_new, k_nxt, v_nxt, seg_nxt), None
        return (acc_new, m_new, l_new, k_nxt, v_nxt), None

    init = (
        jnp.zeros((b, h, sq, d), jnp.float32),
        jnp.full((b, h, sq), -jnp.inf, jnp.float32),
        jnp.zeros((b, h, sq), jnp.float32),
        k_loc, v_loc,
    )
    if q_seg is not None:
        init = init + (kv_seg.astype(jnp.int32),)
        (acc, _, l, *_), _ = jax.lax.scan(step, init, jnp.arange(n))
        l = jnp.where(l == 0.0, 1.0, l)
    elif kv_lens is not None:
        (acc, _, l, _, _), _ = jax.lax.scan(step, init, jnp.arange(n))
        l = jnp.where(l == 0.0, 1.0, l)
    else:
        # xs=None keeps the jaxpr (and thus every persisted compile-cache
        # entry for seq-parallel train/denoise graphs) identical to the
        # pre-varlen form — scan-over-iota is a different cache key
        (acc, _, l, _, _), _ = jax.lax.scan(step, init, None, length=n)
    return (acc / l[..., None]).astype(q_loc.dtype)


def sequence_parallel_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    mesh: Mesh, axis: str = "seq", scale: Optional[float] = None,
    rotate_method: str = "allgather",
    kv_lens: Optional[jnp.ndarray] = None,
    segment_ids: Optional[tuple] = None,
) -> jnp.ndarray:
    """q/k/v: [B, H, S, D] with S sharded over `axis`. Returns out with the
    same sharding. Softmax is exact for both rotate methods.

    rotate_method: "allgather" gathers full KV per shard (reference default);
    "ppermute" streams KV blocks around the ring (O(S/n) KV memory);
    "ulysses" all-to-alls to head sharding (lowest traffic when H % n == 0).

    kv_lens ([B] int, replicated across the mesh): per-sample GLOBAL valid
    KV length (suffix padding) — varlen under sequence parallelism, which
    the reference's ring providers never supported (FLASH_VARLEN lacks
    supports_cp, attention_dispatch.py:779). allgather/ulysses see the full
    KV stream locally, so the fused varlen kernels apply directly; ppermute
    masks each rotating block against its global key offsets.

    segment_ids ((q_seg [B,S], kv_seg [B,S], num_segments)): PACKED-sequence
    masking under sequence parallelism — beyond the reference, whose
    cu_seqlens providers also lack supports_cp. The id arrays shard with the
    token axis; allgather/ulysses gather kv ids (and for ulysses q ids)
    alongside KV, the ppermute ring rotates kv_seg blocks with their K/V.
    Mutually exclusive with kv_lens.
    """
    if rotate_method not in ("allgather", "ppermute", "ulysses"):
        raise ValueError(f"unknown rotate_method: {rotate_method!r}")
    if segment_ids is not None and kv_lens is not None:
        raise ValueError("segment_ids and kv_lens are mutually exclusive")
    platform = _mesh_platform(mesh)
    if mesh.shape[axis] == 1:
        return _local_attention(q, k, v, scale, platform, kv_lens=kv_lens,
                                segment_ids=segment_ids)
    n = mesh.shape[axis]
    sm_scale = scale if scale is not None else q.shape[-1] ** -0.5
    n_seg = segment_ids[2] if segment_ids is not None else None

    if rotate_method == "ulysses" and q.shape[1] % n != 0:
        raise ValueError(
            f"rotate_method='ulysses' needs the head count divisible by the "
            f"sequence degree: H={q.shape[1]} % {axis}={n} != 0. Use "
            f"'allgather' or 'ppermute' for this config.")

    if rotate_method == "ppermute":
        def body(q_loc, k_loc, v_loc, lens=None, q_seg=None, kv_seg=None):
            return _ring_body(q_loc, k_loc, v_loc, axis=axis, n=n,
                              scale=sm_scale, kv_lens=lens,
                              q_seg=q_seg, kv_seg=kv_seg)
    elif rotate_method == "ulysses":
        def body(q_loc, k_loc, v_loc, lens=None, q_seg=None, kv_seg=None):
            # [B, H, S/n, D] -> [B, H/n, S, D]: scatter heads, gather tokens
            qh, kh, vh = (
                jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2,
                                   tiled=True)
                for x in (q_loc, k_loc, v_loc))
            seg = None
            if q_seg is not None:
                # heads split, tokens gather: ids are per-token, so a plain
                # all_gather over the axis reconstructs the full id rows
                seg = (jax.lax.all_gather(q_seg, axis, axis=1, tiled=True),
                       jax.lax.all_gather(kv_seg, axis, axis=1, tiled=True),
                       n_seg)
            oh = _local_attention(qh, kh, vh, scale, platform, kv_lens=lens,
                                  segment_ids=seg)
            return jax.lax.all_to_all(oh, axis, split_axis=2, concat_axis=1,
                                      tiled=True)
    else:
        def body(q_loc, k_loc, v_loc, lens=None, q_seg=None, kv_seg=None):
            k_full = jax.lax.all_gather(k_loc, axis, axis=2, tiled=True)
            v_full = jax.lax.all_gather(v_loc, axis, axis=2, tiled=True)
            seg = None
            if q_seg is not None:
                seg = (q_seg,
                       jax.lax.all_gather(kv_seg, axis, axis=1, tiled=True),
                       n_seg)
            return _local_attention(q_loc, k_full, v_full, scale, platform,
                                    kv_lens=lens, segment_ids=seg)

    spec = P(None, None, axis, None)
    seg_spec = P(None, axis)
    if segment_ids is not None:
        return jax.shard_map(
            lambda q, k, v, qs, ks: body(q, k, v, None, qs, ks),
            mesh=mesh, in_specs=(spec, spec, spec, seg_spec, seg_spec),
            out_specs=spec, check_vma=False,
        )(q, k, v, segment_ids[0].astype(jnp.int32),
          segment_ids[1].astype(jnp.int32))
    if kv_lens is not None:
        return jax.shard_map(
            body, mesh=mesh, in_specs=(spec, spec, spec, P(None)),
            out_specs=spec, check_vma=False,
        )(q, k, v, kv_lens.astype(jnp.int32))
    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
