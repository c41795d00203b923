"""Pallas TPU flash attention (forward + backward), full (non-causal) attention.

This is the hot kernel of Video-As-Prompt: joint MoT attention over the
concatenated [text ‖ video ‖ ref_text×N ‖ ref_video×N] token stream (the
reference concatenates per-branch Q/K/V and calls a fused SDPA —
cogvideox_transformer_3d_mot.py:424-431). Here the same math runs as an
online-softmax tiled kernel that never materializes the S×S score matrix.

Layout: q, k, v are [B, H, S, D]. Sequence lengths may be ragged; inputs are
padded to the block size and the padded key columns are masked to -inf.
The forward also returns the per-row logsumexp for the backward pass.

Block sizes default to (256, 512) which keeps VMEM well under budget for
D ≤ 128 while giving the MXU large tiles.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
# transposed forward: block_q is the lane dim — bigger amortizes VPU stat ops
# (90.8 TFLOP/s at (4096, 512) vs 63.7 for the row kernel, scripts/attn_bench.py)
DEFAULT_BLOCK_Q_T = 4096
NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _varlen_valid(kv_lens: Array, kv_len_cap: int, length: int, heads: int = 1) -> Array:
    """[B(*heads), length] bool mask of valid key positions for ragged
    per-sample KV lengths (suffix padding), capped at the static kv length.
    heads>1 repeats each sample's row for the head-major [B*H, ...] layout."""
    lens = jnp.minimum(kv_lens.astype(jnp.int32), kv_len_cap)
    if heads > 1:
        lens = jnp.repeat(lens, heads)
    return jnp.arange(length)[None, :] < lens[:, None]


SEG_BIG = 1e30  # one-hot mask-row magnitude: products land at -1e30 (= NEG_INF)


def _segment_onehot_ext(q_seg, kv_seg, num_segments, heads, q_pad, k_pad,
                        q_dtype, k_dtype):
    """Extension blocks that make the MXU itself compute packed-segment masking.

    Packed sequences (multiple independent samples concatenated along one
    sequence row — the form the reference's FLASH_VARLEN provider expresses
    with cu_seqlens, finetrainers/models/attention_dispatch.py:613-889) need
    a q-DEPENDENT key mask, which the per-(b,h) bias column cannot express.
    Instead the mask rides G = num_segments extra contraction dims of the
    same extended operands that already carry scale/bias/rowsum:

        qt rows   D+1 .. D+G:  BIG * onehot(q_seg)       (one row per segment)
        k_ext cols D+1 .. D+G:  onehot(kv_seg) - 1        (0 same / -1 other)

    so the QK^T matmul picks up  sum_g BIG*[q_seg=g] * ([kv_seg=g] - 1)
    = 0 when segments match, -BIG when they differ — scores arrive
    pre-masked with ZERO extra kernel work. At D=64 the one-hots occupy
    sublane rows the dim_ext round-up already pads with zeros (dim_ext=72),
    so up to 7 segments are literally free; each further 8 segments round
    dim_ext up by 8.

    ids outside [0, num_segments) (canonically -1) mark padding: such
    queries match no one-hot row and attend everything (callers slice their
    outputs away; the bound path gives them the global bound so they stay
    finite), and such keys mismatch every in-range query and are masked.

    Returns (q_oh [B*heads, q_pad, G], k_oh [B*heads, k_pad, G]).
    """
    g = jnp.arange(num_segments, dtype=jnp.int32)
    qs = jnp.repeat(q_seg.astype(jnp.int32), heads, axis=0)
    ks = jnp.repeat(kv_seg.astype(jnp.int32), heads, axis=0)

    def pad_ids(ids, size):
        pad = size - ids.shape[1]
        return jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1) if pad else ids

    qs = pad_ids(qs, q_pad)
    ks = pad_ids(ks, k_pad)
    q_oh = (qs[:, :, None] == g).astype(q_dtype) * jnp.asarray(SEG_BIG, q_dtype)
    k_oh = (ks[:, :, None] == g).astype(k_dtype) - jnp.asarray(1.0, k_dtype)
    return q_oh, k_oh


def _pad_to(x: Array, axis: int, multiple: int) -> Array:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

LANES = 128


def _fwd_kernel(q_ref, k_ref, v_ref, kvb_ref, o_ref, lse_ref, acc_sc, m_sc, l_sc, *, scale, kv_len, block_k, varlen=False):
    """VPU-lean online-softmax step.

    The VPU, not the MXU, bounds D=64 attention, so:
      * softmax stats (m, l) live as [block_q, 128] lane-replicated registers;
        the per-element correction uses `jnp.tile` of a full 128-lane vector
        instead of a 1-lane broadcast across the whole [bq, bk] scores tile;
      * the scale is folded into q on the small [bq, D] tile;
      * the key-padding mask is applied only in the LAST kv block.
    (A ones-column-on-V row-sum trick was tried and reverted: it doubles the
    AV matmul's output lanes at D=64, costing more MXU than the saved VPU.)
    """
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)

    q = (q_ref[0].astype(jnp.float32) * scale).astype(k_ref.dtype)  # [bq, D]
    k = k_ref[0]  # [bk, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]

    # padded key columns: one additive bias row (0 valid / -inf pad) — cheaper
    # and more pipeline-friendly than per-step masking or lax.cond. varlen
    # mode carries a per-(b,h) bias (ragged per-sample lengths) and always
    # applies it.
    if varlen:
        s = s + kvb_ref[0, 0]
    elif kv_len % block_k != 0:
        s = s + kvb_ref[0]

    m_prev = m_sc[:]  # [bq, 128]
    m_cur = jnp.max(s, axis=1)[:, None]  # [bq, 1]
    m_new = jnp.maximum(m_prev, m_cur)   # [bq, 128]
    if varlen:
        # a fully-masked kv block leaves m at NEG_INF and exp(s - m) == 1 for
        # its masked columns, polluting l; flooring m flushes those p to 0.
        # Real scores below -1e4 nats are unreachable for sane activations.
        m_new = jnp.maximum(m_new, -1e4)
    p_f32 = jnp.exp(s - jnp.tile(m_new, (1, block_k // LANES)))
    p = p_f32.astype(v_ref.dtype)
    alpha = jnp.exp(m_prev - m_new)      # [bq, 128]

    pv = jax.lax.dot_general(
        p, v_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, D]
    d = acc_sc.shape[-1]
    acc_sc[:] = acc_sc[:] * alpha[:, :d] + pv
    l_sc[:] = alpha * l_sc[:] + jnp.sum(p_f32, axis=1)[:, None]
    m_sc[:] = m_new

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_sc[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_sc[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_sc[:, :1] + jnp.log(l_safe))[:, 0]


def _fwd_kernel_scalar_bound(bnd_ref, q_ref, k_ref, v_ref, kvb_ref, o_ref, lse_ref,
                             acc_sc, l_sc, *, kv_len, block_k, scale_log2e,
                             varlen=False):
    """Row-major bound-softmax step for D >= 128.

    A per-(b,h) SCALAR softmax reference point (centered between the
    Cauchy-Schwarz upper bound and a sampled lower bound — see the caller)
    replaces the running max: the subtract is a free scalar op instead of
    the row-kernel's expensive [bq, 1] -> [bq, bk] lane-tile broadcast, and
    the accumulator/denominator never rescale. Per step: one MXU QK^T,
    scalar-sub+exp2+cast fused VPU pass, row-sum reduce, one MXU PV.
    """
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        l_sc[:] = jnp.zeros_like(l_sc)

    q = (q_ref[0].astype(jnp.float32) * scale_log2e).astype(k_ref.dtype)  # [bq, D]
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk], log2 domain
    if varlen:
        s = s + kvb_ref[0, 0]
    elif kv_len % block_k != 0:
        s = s + kvb_ref[0]

    p_f32 = jnp.exp2(s - bnd_ref[0, 0, 0])  # scalar broadcast — free
    pv = jax.lax.dot_general(
        p_f32.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, D]
    acc_sc[:] += pv
    l_sc[:] += jnp.sum(p_f32, axis=1)[:, None]

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_sc[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_sc[:] / l_safe).astype(o_ref.dtype)
        # natural-log lse: ln2 * (B + log2 l)
        lse_ref[0, 0] = (0.6931471805599453 * (bnd_ref[0, 0, 0] + jnp.log2(l_safe)))[:, 0]


def _flash_attention_forward(q, k, v, scale, block_q, block_k, use_bound=True,
                             kv_lens=None):
    batch, heads, q_len, dim = q.shape
    kv_len = k.shape[2]
    varlen = kv_lens is not None

    qp = _pad_to(q.reshape(batch * heads, q_len, dim), 1, block_q)
    kp = _pad_to(k.reshape(batch * heads, kv_len, dim), 1, block_k)
    vp = _pad_to(v.reshape(batch * heads, kv_len, dim), 1, block_k)
    bh, q_pad, _ = qp.shape
    k_pad = kp.shape[1]
    nq = q_pad // block_q
    nk = k_pad // block_k
    # 8 sublanes: TPU lowering needs the last two block dims % (8, 128)
    if varlen:
        # per-SAMPLE ragged lengths: every kv block needs its own bias row.
        # The bias is identical across heads, so it is materialized
        # per-sample ([B, 8, k_pad], not [B*H, ...]) and the index_map
        # folds the head out of the grid index — 1/H the HBM footprint.
        kv_bias = jnp.broadcast_to(
            jnp.where(_varlen_valid(kv_lens, kv_len, k_pad), 0.0, NEG_INF
                      ).astype(jnp.float32)[:, None, :],
            (batch, 8, k_pad))
        kvb_spec = pl.BlockSpec((1, 8, block_k),
                                lambda b, qi, ki: (b // heads, 0, ki))
    else:
        kv_bias = jnp.broadcast_to(
            jnp.where(jnp.arange(k_pad) < kv_len, 0.0, NEG_INF).astype(jnp.float32)[None], (8, k_pad))
        kvb_spec = pl.BlockSpec((8, block_k), lambda b, qi, ki: (0, ki))

    grid = (bh, nq, nk)

    def _runmax_call(qp, kp, vp, kv_bias):
        return pl.pallas_call(
            functools.partial(_fwd_kernel, scale=scale, kv_len=kv_len, block_k=block_k,
                              varlen=varlen),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, dim), lambda b, qi, ki: (b, qi, 0)),
                pl.BlockSpec((1, block_k, dim), lambda b, qi, ki: (b, ki, 0)),
                pl.BlockSpec((1, block_k, dim), lambda b, qi, ki: (b, ki, 0)),
                kvb_spec,
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, dim), lambda b, qi, ki: (b, qi, 0)),
                pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, q_pad, dim), q.dtype),
                jax.ShapeDtypeStruct((bh, 1, q_pad), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, dim), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(qp, kp, vp, kv_bias)

    if use_bound:
        # Per-(b,h) scalar softmax reference point. It does NOT need to bound
        # the max score — it cancels exactly between numerator and
        # denominator — it only needs to sit within ~±110 doublings of the
        # true max (exp2 headroom both ways in f32/bf16). The Cauchy-Schwarz
        # upper bound alone drifts ~sqrt(D)*gain^2 above the max (breaks at
        # D=128, qk gain ~3), so center between it and a cheap LOWER bound:
        # the actual max score of query row 0. distance(ref, true_max)
        # <= (upper - lower)/2, far inside the budget for any real data.
        qf32 = q.reshape(bh, q_len, dim).astype(jnp.float32)
        kf32 = k.reshape(bh, kv_len, dim).astype(jnp.float32)
        validK = None
        if varlen:
            # reference point and probes over VALID keys only: a garbage
            # suffix would otherwise inflate the bound until every valid
            # exp2 underflows. Zeroed rows keep `upper` an upper bound for
            # the (bias-masked, -1e30) invalid scores too.
            validK = _varlen_valid(kv_lens, kv_len, kv_len, heads)  # [bh, kv_len]
            kf32 = kf32 * validK[:, :, None].astype(jnp.float32)
        qn_max = jnp.max(jnp.linalg.norm(qf32, axis=-1), axis=-1)
        kn_max = jnp.max(jnp.linalg.norm(kf32, axis=-1), axis=-1)
        upper = qn_max * kn_max * (scale * LOG2_E)
        s0 = jnp.einsum("bd,bkd->bk", qf32[:, 0], kf32)
        if varlen:
            s0 = jnp.where(validK, s0, -jnp.inf)
        lower = jnp.max(s0, axis=-1) * (scale * LOG2_E)
        bnd = (0.5 * (upper + lower)).reshape(bh, 1, 1)
        if varlen:
            # lens == 0 gives lower = -inf; keep bnd finite (the safe-check
            # below already forces the runmax fallback for that batch)
            bnd = jnp.maximum(bnd, -1e4)

        # Silent-underflow guard (advisor r2): a query row whose own max
        # score sits >~126 doublings BELOW the reference has every exp2
        # underflow — l==0 and an all-zero output row with no error. Probe a
        # per-row LOWER bound on each row's max (its best score against the
        # first key block, one thin matmul ~0.3% of QK^T) and fall back to
        # the running-max kernel whenever any row's gap exceeds the exp2
        # budget, so pathological activations stay correct instead of
        # training on zeroed attention.
        probe = jnp.einsum("bqd,bkd->bqk", qf32, kf32[:, : min(kv_len, 128)])
        if varlen:
            probe = jnp.where(validK[:, None, : min(kv_len, 128)], probe, -jnp.inf)
        row_lb = jnp.max(probe, axis=-1) * (scale * LOG2_E)     # [bh, q_len]
        safe = jnp.all(bnd[:, 0, 0][:, None] - row_lb < 110.0)

        def _bound_call(ops):
            bnd, qp, kp, vp, kv_bias = ops
            return pl.pallas_call(
                functools.partial(_fwd_kernel_scalar_bound, kv_len=kv_len,
                                  block_k=block_k, scale_log2e=scale * LOG2_E,
                                  varlen=varlen),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, 1, 1), lambda b, qi, ki: (b, 0, 0), memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, block_q, dim), lambda b, qi, ki: (b, qi, 0)),
                    pl.BlockSpec((1, block_k, dim), lambda b, qi, ki: (b, ki, 0)),
                    pl.BlockSpec((1, block_k, dim), lambda b, qi, ki: (b, ki, 0)),
                    kvb_spec,
                ],
                out_specs=[
                    pl.BlockSpec((1, block_q, dim), lambda b, qi, ki: (b, qi, 0)),
                    pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((bh, q_pad, dim), q.dtype),
                    jax.ShapeDtypeStruct((bh, 1, q_pad), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_q, dim), jnp.float32),
                    pltpu.VMEM((block_q, LANES), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary"),
                ),
            )(bnd, qp, kp, vp, kv_bias)

        out, lse = jax.lax.cond(
            safe, _bound_call, lambda ops: _runmax_call(*ops[1:]),
            (bnd, qp, kp, vp, kv_bias))
        out = out[:, :q_len].reshape(batch, heads, q_len, dim)
        lse = lse[:, 0, :q_len].reshape(batch, heads, q_len)
        return out, lse

    out, lse = _runmax_call(qp, kp, vp, kv_bias)
    out = out[:, :q_len].reshape(batch, heads, q_len, dim)
    lse = lse[:, 0, :q_len].reshape(batch, heads, q_len)
    return out, lse


# ---------------------------------------------------------------------------
# transposed-layout forward: S^T = K @ Q^T, O^T = V^T @ P
#
# Why: at D=64 the row-major layout wastes the MXU twice — QK^T contracts over
# K=64 (half the systolic depth) AND P@V emits N=64 output lanes (half the
# array width). Transposing the score/accumulator tiles fixes the second loss:
# V^T[D, bk] @ P[bk, bq] contracts over bk (full depth) and emits bq lanes
# (full width), lifting the MXU ceiling from ~2/4 to ~3/4 of peak. It also
# turns every softmax-stat broadcast from a lane-tile (expensive jnp.tile)
# into a sublane broadcast (free), and folds log2(e) into the q scale so the
# VPU computes exp2 directly — one fewer full pass over the score tile.
# ---------------------------------------------------------------------------

LOG2_E = 1.4426950408889634


def _fwd_kernel_t(qt_ref, k_ref, vt_ref, o_ref, lse_ref, acc_sc, m_sc,
                  *, dim, floor_m=False):
    """Per-step work is two matmuls + three VPU passes over the score tile
    (subtract-broadcast, exp2, bf16 cast). Scale, key-padding mask, and the
    softmax row-sum all ride the MXU via the extended contraction rows:

      qt_ext[dim_ext, bq]: rows 0..D-1 = q^T * scale*log2e, row D = ones
      k_ext [bk, dim_ext]: cols 0..D-1 = k,   col D = 0 valid / -1e30 padded
      vt_ext[dim_ext, bk]: rows 0..D-1 = v^T, row D = ones

    so st = k_ext @ qt_ext lands pre-scaled AND pre-masked (the MXU contracts
    128-deep regardless, making the extra rows free), and acc row D carries
    the online softmax denominator through the exact same rescale recurrence
    as the numerator.
    """
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)

    st = jax.lax.dot_general(
        k_ref[0], qt_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bk, bq], log2-domain, masked

    m_prev = m_sc[:]                               # [8, bq] (row-replicated)
    m_cur = jnp.max(st, axis=0, keepdims=True)     # [1, bq]
    m_new = jnp.maximum(m_prev, m_cur)             # [8, bq]
    if floor_m:
        # segment masking: a fully cross-segment tile leaves m at ~-1e30 and
        # p == 1 for its masked columns; the floor flushes those p to zero so
        # a query whose segment is EMPTY on the kv side emits exact zeros
        # (l == 0 -> l_safe) instead of the mean of every v. Real log2-domain
        # scores below -1e4 are unreachable for sane activations. Static arg:
        # non-segmented jaxprs (and their compile-cache keys) are unchanged.
        m_new = jnp.maximum(m_new, -1e4)
    p = jnp.exp2(st - m_new[:1]).astype(vt_ref.dtype)  # sublane broadcast sub
    alpha = jnp.exp2(m_prev - m_new)               # [8, bq]

    pv = jax.lax.dot_general(
        vt_ref[0], p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [dim_ext, bq] — full MXU depth (bk) and width (bq); row D = sum_k p
    acc_sc[:] = acc_sc[:] * alpha[:1] + pv
    m_sc[:] = m_new

    @pl.when(ki == nk - 1)
    def _finalize():
        l = acc_sc[dim:dim + 1]  # rows 0..dim-1 = numerator, row dim = l
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_sc[:] / l_safe).astype(o_ref.dtype)
        # natural-log lse for the (row-major) backward: ln2 * (m + log2 l)
        lse_ref[0, 0] = (0.6931471805599453 * (m_sc[:1] + jnp.log2(l_safe)))[0]


def _fwd_kernel_t_bound(qt_ref, bnd_ref, k_ref, vt_ref, o_ref, lse_ref, acc_sc, *, dim):
    """Bound-softmax bf16 transposed forward: same trick as the int8 variant
    (see _fwd_kernel_t_i8_bound) — bnd_ref[1, bq] upper-bounds the log2-domain
    score per query (Hölder over the scaled q and per-dim |k| max), so the
    running max, its reduce pass, and the accumulator rescale all vanish.
    The masked key column (-1e30 in k_ext's extension) only drives scores
    further below the bound, so padding still contributes exactly zero."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_sc[:] = jnp.zeros_like(acc_sc)

    st = jax.lax.dot_general(
        k_ref[0], qt_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bk, bq], log2-domain, masked
    p = jnp.exp2(st - bnd_ref[0]).astype(vt_ref.dtype)

    acc_sc[:] += jax.lax.dot_general(
        vt_ref[0], p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [dim_ext, bq]; row D = denominator (ones row of vt)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = acc_sc[dim:dim + 1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_sc[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0] = (0.6931471805599453 * (bnd_ref[0] + jnp.log2(l_safe)))[0]


def _flash_attention_forward_t(q, k, v, scale, block_q, block_k, use_bound=True,
                               kv_lens=None, segment_ids=None):
    """Transposed-layout tiled forward. Same contract as
    _flash_attention_forward (returns out [B,H,Sq,D] and natural-log lse).

    kv_lens ([B] int): per-sample valid KV length (suffix padding). Ragged
    masking rides the SAME extension rows the fixed-length path already
    carries — the bias column of k_ext becomes per-(b,h), and invalid v
    rows + their ones-row entries are zeroed so a fully-masked kv block
    (where the running max never leaves NEG_INF and p == 1) still
    contributes exactly zero to both the numerator and the denominator.
    Invalid k rows are zeroed too, so the Hölder/CS reference point stays
    tight over the valid keys (a garbage suffix would otherwise inflate it
    until every valid exp2 underflows) while remaining a valid upper bound
    for the zeroed rows — which the bias column pins to -1e30 regardless.

    segment_ids ((q_seg [B,Sq], kv_seg [B,Skv], num_segments)): packed-
    sequence masking — query i attends key j iff q_seg[i] == kv_seg[j].
    The mask rides extra one-hot contraction dims (_segment_onehot_ext);
    the kernels are untouched. Mutually exclusive with kv_lens (packing
    subsumes ragged lengths: give padding its own out-of-range id).
    """
    batch, heads, q_len, dim = q.shape
    kv_len = k.shape[2]
    n_seg = segment_ids[2] if segment_ids is not None else 0
    # extra contraction rows for mask/rowsum (+ segment one-hots); round
    # sublanes up to 8
    dim_ext = ((dim + 1 + n_seg + 7) // 8) * 8

    qp = _pad_to(q.reshape(batch * heads, q_len, dim), 1, block_q)
    kp = _pad_to(k.reshape(batch * heads, kv_len, dim), 1, block_k)
    vp = _pad_to(v.reshape(batch * heads, kv_len, dim), 1, block_k)
    bh = qp.shape[0]
    q_pad, k_pad = qp.shape[1], kp.shape[1]

    if kv_lens is not None:
        valid = _varlen_valid(kv_lens, kv_len, k_pad, heads)        # [bh, k_pad]
        kv_bias_col = jnp.where(valid, 0.0, NEG_INF).astype(k.dtype)[:, :, None]
        ones_col = valid.astype(v.dtype)[:, :, None]
        vp = vp * valid[:, :, None].astype(vp.dtype)
        # ZERO invalid k rows: the Hölder/CS bound below must be tight over
        # VALID keys only — garbage in the masked suffix would otherwise
        # inflate the reference point until every valid exp2 underflows
        # (silent all-zero rows). The kernel never sees these rows' scores
        # anyway (bias column pins them to -1e30); zeroed rows keep the
        # bound an upper bound for them too.
        kp = kp * valid[:, :, None].astype(kp.dtype)
    else:
        kv_bias = jnp.where(jnp.arange(k_pad) < kv_len, 0.0, NEG_INF).astype(k.dtype)
        kv_bias_col = jnp.broadcast_to(kv_bias[None, :, None], (bh, k_pad, 1))
        ones_col = jnp.ones((bh, k_pad, 1), v.dtype)

    if segment_ids is not None:
        q_oh, k_oh = _segment_onehot_ext(segment_ids[0], segment_ids[1], n_seg,
                                         heads, q_pad, k_pad, q.dtype, k.dtype)
        q_ext_cols = [q_oh, jnp.zeros((bh, q_pad, dim_ext - dim - 1 - n_seg), q.dtype)]
        k_ext_cols = [k_oh, jnp.zeros((bh, k_pad, dim_ext - dim - 1 - n_seg), k.dtype)]
    else:
        q_ext_cols = [jnp.zeros((bh, q_pad, dim_ext - dim - 1), q.dtype)]
        k_ext_cols = [jnp.zeros((bh, k_pad, dim_ext - dim - 1), k.dtype)]

    # extended operands (one fused HBM pass each, ~ms at VAP sizes)
    qt = jnp.concatenate([
        (qp.astype(jnp.float32) * (scale * LOG2_E)).astype(q.dtype),
        jnp.ones((bh, q_pad, 1), q.dtype),
        *q_ext_cols,
    ], axis=-1).transpose(0, 2, 1)  # [bh, dim_ext, q_pad]
    k_ext = jnp.concatenate([
        kp,
        kv_bias_col,
        *k_ext_cols,
    ], axis=-1)  # [bh, k_pad, dim_ext]
    vt = jnp.concatenate([
        vp,
        ones_col,
        jnp.zeros((bh, k_pad, dim_ext - dim - 1), v.dtype),
    ], axis=-1).transpose(0, 2, 1)  # [bh, dim_ext, k_pad]

    nq = q_pad // block_q
    nk = k_pad // block_k
    grid = (bh, nq, nk)
    if use_bound:
        # per-query bound on the scaled log2-domain score: min of Hölder
        # (sum_d |q_d| * max_j |k_jd|) and Cauchy-Schwarz (||q|| * max||k||) —
        # see the int8 bound path for why both are needed; -60 gives
        # two-sided exp2 headroom
        kf32 = k.reshape(bh, kv_len, dim).astype(jnp.float32)
        if kv_lens is not None:
            # bound over VALID keys only (invalid rows are bias-masked in the
            # kernel, and zeroed rows keep the bound valid for them)
            kf32 = kf32 * valid[:, :kv_len, None].astype(jnp.float32)
        qf32 = q.reshape(bh, q_len, dim).astype(jnp.float32) * (scale * LOG2_E)
        if segment_ids is not None:
            # per-SEGMENT key stats: each query's bound is computed over its
            # own segment's keys, keeping the reference point as tight as an
            # unpacked batch would get (a louder co-packed segment would
            # otherwise inflate it until this segment's exp2 underflows).
            # Out-of-range (padding) ids attend everything, so they get the
            # GLOBAL stats — a valid upper bound that keeps them finite.
            qs = jnp.repeat(segment_ids[0].astype(jnp.int32), heads, axis=0)
            ks = jnp.repeat(segment_ids[1].astype(jnp.int32), heads, axis=0)
            absk = jnp.abs(kf32)
            knorm = jnp.linalg.norm(kf32, axis=-1)                   # [bh, kv]
            # one scatter-max pass over all (bh, kv) rows instead of a
            # G-times-unrolled masked max: rows are bucketed into bh*G flat
            # segments (invalid/padding key ids contribute 0, and the final
            # maximum(., 0) reproduces the masked-max's zero floor for
            # empty segments)
            valid_k = (ks >= 0) & (ks < n_seg)
            seg_flat = (jnp.clip(ks, 0, n_seg - 1)
                        + jnp.arange(bh, dtype=jnp.int32)[:, None] * n_seg)
            kmax_g = jnp.maximum(jax.ops.segment_max(
                jnp.where(valid_k[:, :, None], absk, 0.0).reshape(bh * kv_len, dim),
                seg_flat.reshape(-1), num_segments=bh * n_seg,
            ).reshape(bh, n_seg, dim), 0.0)                          # [bh, G, dim]
            knorm_g = jnp.maximum(jax.ops.segment_max(
                jnp.where(valid_k, knorm, 0.0).reshape(-1),
                seg_flat.reshape(-1), num_segments=bh * n_seg,
            ).reshape(bh, n_seg), 0.0)                               # [bh, G]
            oh_q = (qs[:, :, None] == jnp.arange(n_seg)).astype(jnp.float32)
            kmax_q = jnp.einsum("bqg,bgd->bqd", oh_q, kmax_g)        # [bh, S, dim]
            knorm_q = jnp.einsum("bqg,bg->bq", oh_q, knorm_g)
            in_range = (qs >= 0) & (qs < n_seg)
            kmax_q = jnp.where(in_range[:, :, None], kmax_q,
                               jnp.max(absk, axis=1)[:, None, :])
            knorm_q = jnp.where(in_range, knorm_q, jnp.max(knorm, axis=1)[:, None])
            holder = jnp.sum(jnp.abs(qf32) * kmax_q, axis=-1)
            cs = jnp.linalg.norm(qf32, axis=-1) * knorm_q
        else:
            kmax = jnp.max(jnp.abs(kf32), axis=1)
            holder = jnp.einsum("bsd,bd->bs", jnp.abs(qf32), kmax)
            knorm_max = jnp.max(jnp.linalg.norm(kf32, axis=-1), axis=-1)
            cs = jnp.linalg.norm(qf32, axis=-1) * knorm_max[:, None]
        bnd = jnp.minimum(holder, cs) - 60.0
        bnd = _pad_to(bnd[:, None], 2, block_q)  # [bh, 1, q_pad]
        out_t, lse = pl.pallas_call(
            functools.partial(_fwd_kernel_t_bound, dim=dim),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, dim_ext, block_q), lambda b, qi, ki: (b, 0, qi)),
                pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi)),
                pl.BlockSpec((1, block_k, dim_ext), lambda b, qi, ki: (b, ki, 0)),
                pl.BlockSpec((1, dim_ext, block_k), lambda b, qi, ki: (b, 0, ki)),
            ],
            out_specs=[
                pl.BlockSpec((1, dim_ext, block_q), lambda b, qi, ki: (b, 0, qi)),
                pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, dim_ext, q_pad), q.dtype),
                jax.ShapeDtypeStruct((bh, 1, q_pad), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((dim_ext, block_q), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(qt, bnd, k_ext, vt)
        out = out_t[:, :dim, :q_len].reshape(batch, heads, dim, q_len).transpose(0, 1, 3, 2)
        lse = lse[:, 0, :q_len].reshape(batch, heads, q_len)
        return out, lse
    out_t, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_t, dim=dim,
                          floor_m=segment_ids is not None),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dim_ext, block_q), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, block_k, dim_ext), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, dim_ext, block_k), lambda b, qi, ki: (b, 0, ki)),
        ],
        out_specs=[
            pl.BlockSpec((1, dim_ext, block_q), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, dim_ext, q_pad), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, q_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((dim_ext, block_q), jnp.float32),
            pltpu.VMEM((8, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qt, k_ext, vt)

    out = out_t[:, :dim, :q_len].reshape(batch, heads, dim, q_len).transpose(0, 1, 3, 2)
    lse = lse[:, 0, :q_len].reshape(batch, heads, q_len)
    return out, lse


# ---------------------------------------------------------------------------
# int8 QK^T forward (SageAttention analog — arXiv:2410.02367's INT8 QK with
# K smoothing, the survey's stretch item). QK^T runs on the int8 MXU at 2x
# the bf16 rate; P@V stays bf16 (Sage keeps PV in high precision too).
# Inference-only: no VJP (training uses the bf16 kernels).
#
# Quantization (outside the kernel, one fused HBM pass):
#   k_s   = k - mean_tokens(k)        # per (b,h,d); softmax-invariant shift:
#                                     # it moves every score of a query by the
#                                     # same q·k_mean (Sage's K smoothing)
#   s_q   = max|q| / 127 per (b,h);  q_i8 = round(q / s_q)
#   s_k   = max|k_s| / 127 per (b,h); k_i8 = round(k_s / s_k)
#   sqk   = s_q * s_k * softmax_scale * log2(e)   # folded into one scalar
# In-kernel: st = (k_i8 @ q_i8^T).f32 * sqk lands directly in the log2 domain
# of the transposed-layout online softmax.
# ---------------------------------------------------------------------------


def _fwd_kernel_t_i8(sqk_ref, kt_ref, qt_ref, vt_ref, o_ref, lse_ref,
                     acc_sc, m_sc, *, dim):
    """Padded-key masking is FREE here: padded v rows and their ones-row
    entries are zeroed outside, so padded keys contribute 0 to both the
    numerator and the denominator (their p only perturbs the running max m,
    which cancels between numerator and denominator exactly)."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)

    st_i32 = jax.lax.dot_general(
        kt_ref[0], qt_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [bk, bq] — int8 MXU, 2x bf16 rate
    sqk = sqk_ref[0, 0, 0]
    # convert+scale as one f32 pass; an int32-domain max with the scale folded
    # into the [1,bq] row was tried and is SLOWER (88.9 vs 104.2 TFLOP/s —
    # integer VPU reductions don't pipeline as well as f32 here)
    st = st_i32.astype(jnp.float32) * sqk  # log2-domain scores

    m_prev = m_sc[:]
    m_cur = jnp.max(st, axis=0, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(st - m_new[:1]).astype(vt_ref.dtype)
    alpha = jnp.exp2(m_prev - m_new)

    pv = jax.lax.dot_general(
        vt_ref[0], p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [dim_ext, bq]; row D carries the softmax row-sum (ones row of vt)
    acc_sc[:] = acc_sc[:] * alpha[:1] + pv
    m_sc[:] = m_new

    @pl.when(ki == nk - 1)
    def _finalize():
        l = acc_sc[dim:dim + 1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_sc[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0] = (0.6931471805599453 * (m_sc[:1] + jnp.log2(l_safe)))[0]


def _fwd_kernel_t_i8_bound_unrolled(sqk_ref, bnd_ref, kt_ref, qt_ref, vt_ref,
                                    o_ref, lse_ref, acc_sc, *, dim, unroll):
    """Bound-softmax int8 kernel, kv-subtile-unrolled.

    Same math as _fwd_kernel_t_i8_bound, but the kv block is processed as
    `unroll` independent sub-tiles whose QK dots, exp2 passes and PV dots are
    all issued inside ONE kernel body. The sub-tiles share no data, so Mosaic
    can run sub-tile i's exp2 (VPU) under sub-tile i+1's QK dot (MXU) —
    attacking the ~19% of the 151 TFLOP/s cycle bound the serial kernel left
    on the table (docs/ROOFLINE.md "imperfect VPU/MXU overlap")."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_sc[:] = jnp.zeros_like(acc_sc)

    sqk = sqk_ref[0, 0, 0]
    bnd = bnd_ref[0]
    bk = kt_ref.shape[2] // unroll
    sts = [jax.lax.dot_general(
        kt_ref[0, :, u * bk:(u + 1) * bk], qt_ref[0],
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        for u in range(unroll)]
    ps = [jnp.exp2(st.astype(jnp.float32) * sqk - bnd).astype(vt_ref.dtype)
          for st in sts]
    acc = acc_sc[:]
    for u in range(unroll):
        acc = acc + jax.lax.dot_general(
            vt_ref[0, :, u * bk:(u + 1) * bk], ps[u],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc_sc[:] = acc

    @pl.when(ki == nk - 1)
    def _finalize():
        l = acc_sc[dim:dim + 1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_sc[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0] = (0.6931471805599453 * (bnd_ref[0] + jnp.log2(l_safe)))[0]


def _fwd_kernel_t_i8_bound(sqk_ref, bnd_ref, kt_ref, qt_ref, vt_ref, o_ref, lse_ref,
                           acc_sc, *, dim):
    """Bound-softmax int8 kernel: no running max, no rescale.

    bnd_ref[1, bq] is a per-query-token UPPER BOUND on the log2-domain score
    (Hölder: sqk * sum_d |q_i8[d]| * max_j |k_i8[j,d]|), computed outside in
    one pass. p = exp2(st - bound) can only underflow, never overflow, and
    f32/bf16 share the exponent range, so a ~30-60 doubling gap costs zero
    relative precision (floating point); the bound cancels exactly between
    numerator and denominator at finalize. This deletes the max-reduce pass,
    the maximum(), and the accumulator rescale from the inner loop — the
    VPU-bound part of the kernel (cf. FlashDecoding++'s unified-max softmax,
    arXiv:2311.01282, but with a per-query provable bound instead of a
    heuristic constant).
    """
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_sc[:] = jnp.zeros_like(acc_sc)

    st_i32 = jax.lax.dot_general(
        kt_ref[0], qt_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [bk, bq]
    sqk = sqk_ref[0, 0, 0]
    p = jnp.exp2(st_i32.astype(jnp.float32) * sqk - bnd_ref[0]).astype(vt_ref.dtype)

    acc_sc[:] += jax.lax.dot_general(
        vt_ref[0], p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [dim_ext, bq]; row D = running denominator (ones row of vt)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = acc_sc[dim:dim + 1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_sc[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0] = (0.6931471805599453 * (bnd_ref[0] + jnp.log2(l_safe)))[0]


def _flash_attention_forward_t_i8(q, k, v, scale, block_q, block_k, use_bound=True,
                                  kv_lens=None):
    """int8-QK transposed forward. Same contract as the bf16 forwards.

    kv_lens: per-sample ragged masking is free here — it rides the same
    vt zeroing the fixed-length path uses (invalid keys contribute zero to
    numerator and denominator; their scores only perturb the running max,
    which cancels exactly). Invalid k rows are zeroed BEFORE K-smoothing and
    quantization so a garbage suffix can neither widen the int8 range nor
    inflate the Hölder/CS bound (which must stay ≥ every in-kernel score —
    zeroed rows score q·(-k_mean), safely inside it).
    """
    batch, heads, q_len, dim = q.shape
    kv_len = k.shape[2]
    if dim % 32 != 0:
        raise ValueError(f"int8 path needs head_dim % 32 == 0, got {dim}")
    dim_ext = ((dim + 1 + 7) // 8) * 8

    qf = q.reshape(batch * heads, q_len, dim).astype(jnp.float32)
    kf = k.reshape(batch * heads, kv_len, dim).astype(jnp.float32)
    vp = _pad_to(v.reshape(batch * heads, kv_len, dim), 1, block_k)
    bh = qf.shape[0]

    if kv_lens is not None:
        kf = kf * _varlen_valid(kv_lens, kv_len, kv_len, heads
                                )[:, :, None].astype(jnp.float32)

    # K smoothing + per-(b,h) symmetric int8 quantization
    k_mean = jnp.mean(kf, axis=1, keepdims=True)
    ks = kf - k_mean
    s_q = jnp.max(jnp.abs(qf), axis=(1, 2), keepdims=True) / 127.0
    s_k = jnp.max(jnp.abs(ks), axis=(1, 2), keepdims=True) / 127.0
    s_q = jnp.maximum(s_q, 1e-8)
    s_k = jnp.maximum(s_k, 1e-8)
    q_i8 = jnp.round(qf / s_q).astype(jnp.int8)
    k_i8 = jnp.round(ks / s_k).astype(jnp.int8)
    sqk = (s_q * s_k * scale * LOG2_E).reshape(bh, 1, 1).astype(jnp.float32)

    qt = _pad_to(q_i8, 1, block_q).transpose(0, 2, 1)   # [bh, dim, q_pad]
    kt = _pad_to(k_i8, 1, block_k).transpose(0, 2, 1)   # [bh, dim, k_pad]
    q_pad, k_pad = qt.shape[2], kt.shape[2]

    if kv_lens is not None:
        valid = _varlen_valid(kv_lens, kv_len, k_pad, heads)         # [bh, k_pad]
        valid_col = valid.astype(v.dtype)[:, :, None]
        vp = vp * valid[:, :, None].astype(vp.dtype)
    else:
        kv_valid = (jnp.arange(k_pad) < kv_len).astype(v.dtype)  # masks the ones row
        valid_col = jnp.broadcast_to(kv_valid[None, :, None], (bh, k_pad, 1))
    vt = jnp.concatenate([
        vp,
        valid_col,
        jnp.zeros((bh, k_pad, dim_ext - dim - 1), v.dtype),
    ], axis=-1).transpose(0, 2, 1)  # [bh, dim_ext, k_pad]

    nq = q_pad // block_q
    nk = k_pad // block_k
    grid = (bh, nq, nk)
    if use_bound:
        # per-query Hölder bound on the int32 dot: sum_d |q_d| * max_j |k_jd|
        # (tight enough that the exp2 gap stays ~tens of doublings; provable,
        # so p = exp2(st - bound) <= 1 always)
        # two provable score bounds, take the tighter per query:
        #   Hölder:        sum_d |q_d| * max_j |k_jd|   (tight when one dim dominates)
        #   Cauchy-Schwarz: ||q||_2 * max_j ||k_j||_2   (tight for qk-normed heads —
        #     Hölder grows ~linearly in D and can open a >186-doubling gap for
        #     learned qk-norm gains >~2.3, which would silently underflow)
        qf32 = q_i8.astype(jnp.float32)
        kf32 = k_i8.astype(jnp.float32)
        kmax = jnp.max(jnp.abs(kf32), axis=1)                           # [bh, dim]
        holder = jnp.einsum("bsd,bd->bs", jnp.abs(qf32), kmax)
        knorm_max = jnp.max(jnp.linalg.norm(kf32, axis=-1), axis=-1)    # [bh]
        cs = jnp.linalg.norm(qf32, axis=-1) * knorm_max[:, None]        # [bh, S]
        # reference point = bound - 60: p = exp2(st - ref) <= 2^60 (f32/bf16
        # headroom 2^127), and underflow of the max score now needs a
        # bound-to-max gap > 186 doublings instead of 126
        bnd = jnp.minimum(holder, cs) * sqk[:, :, 0] - 60.0             # [bh, S] log2-domain
        bnd = _pad_to(bnd[:, None], 2, block_q)                         # [bh, 1, q_pad]
        unroll = int(os.environ.get("VAP_SAGE_UNROLL", "1"))
        kern = (functools.partial(_fwd_kernel_t_i8_bound, dim=dim) if unroll <= 1
                else functools.partial(_fwd_kernel_t_i8_bound_unrolled,
                                       dim=dim, unroll=unroll))
        out_t, lse = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, 1), lambda b, qi, ki: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi)),
                pl.BlockSpec((1, dim, block_k), lambda b, qi, ki: (b, 0, ki)),
                pl.BlockSpec((1, dim, block_q), lambda b, qi, ki: (b, 0, qi)),
                pl.BlockSpec((1, dim_ext, block_k), lambda b, qi, ki: (b, 0, ki)),
            ],
            out_specs=[
                pl.BlockSpec((1, dim_ext, block_q), lambda b, qi, ki: (b, 0, qi)),
                pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, dim_ext, q_pad), q.dtype),
                jax.ShapeDtypeStruct((bh, 1, q_pad), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((dim_ext, block_q), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(sqk, bnd, kt, qt, vt)
        out = out_t[:, :dim, :q_len].reshape(batch, heads, dim, q_len).transpose(0, 1, 3, 2)
        lse = lse[:, 0, :q_len].reshape(batch, heads, q_len)
        return out, lse
    out_t, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_t_i8, dim=dim),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda b, qi, ki: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, dim, block_k), lambda b, qi, ki: (b, 0, ki)),
            pl.BlockSpec((1, dim, block_q), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, dim_ext, block_k), lambda b, qi, ki: (b, 0, ki)),
        ],
        out_specs=[
            pl.BlockSpec((1, dim_ext, block_q), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, dim_ext, q_pad), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, q_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((dim_ext, block_q), jnp.float32),
            pltpu.VMEM((8, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(sqk, kt, qt, vt)

    out = out_t[:, :dim, :q_len].reshape(batch, heads, dim, q_len).transpose(0, 1, 3, 2)
    lse = lse[:, 0, :q_len].reshape(batch, heads, q_len)
    return out, lse


def flash_attention_int8(q: Array, k: Array, v: Array,
                         scale: Optional[float] = None,
                         block_q: int = DEFAULT_BLOCK_Q_T,
                         block_k: int = 512,
                         kv_lens: Optional[Array] = None) -> Array:
    """SageAttention-analog int8-QK flash attention (inference only).

    kv_lens ([B] int, optional): per-sample valid KV length (suffix
    padding) — the varlen analog of the reference's SAGE_VARLEN provider
    (finetrainers/models/attention_dispatch.py:1593+).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    bq = max(min(block_q, _cdiv(q.shape[2], LANES) * LANES), LANES)
    bk = max(min(block_k, _cdiv(k.shape[2], 8) * 8), 8)
    return _flash_attention_forward_t_i8(q, k, v, scale, bq, bk, kv_lens=kv_lens)[0]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _row_stat_tiled(row, block_k):
    """[bq] row stats -> [bq, block_k] via one lane broadcast + cheap tiling."""
    lanes = jnp.tile(row[:, None], (1, LANES))
    return jnp.tile(lanes, (1, block_k // LANES))

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvb_ref, dq_ref, dq_sc, *, scale, kv_len, block_k, varlen=False):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_sc[:] = jnp.zeros_like(dq_sc)

    q = (q_ref[0].astype(jnp.float32) * scale).astype(k_ref.dtype)
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if varlen:
        s = s + kvb_ref[0, 0]
    elif kv_len % block_k != 0:
        s = s + kvb_ref[0]

    p = jnp.exp(s - _row_stat_tiled(lse_ref[0, 0], s.shape[-1]))  # [bq, bk]
    do = do_ref[0].astype(jnp.float32)
    dp = jax.lax.dot_general(
        do.astype(v_ref.dtype), v_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    ds = p * (dp - _row_stat_tiled(delta_ref[0, 0], s.shape[-1]))  # [bq, bk]
    dq_sc[:] += scale * jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _fin():
        dq_ref[0] = dq_sc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, kvb_ref, dk_ref, dv_ref, dk_sc, dv_sc, *, scale, kv_len, block_k, varlen=False):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)
    ki = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(qi == 0)
    def _init():
        dk_sc[:] = jnp.zeros_like(dk_sc)
        dv_sc[:] = jnp.zeros_like(dv_sc)

    q = (q_ref[0].astype(jnp.float32) * scale).astype(k_ref.dtype)  # [bq, D]
    k = k_ref[0]  # [bk, D]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if varlen:
        s = s + kvb_ref[0, 0]
    elif kv_len % block_k != 0:
        s = s + kvb_ref[0]
    p = jnp.exp(s - _row_stat_tiled(lse_ref[0, 0], s.shape[-1]))  # [bq, bk]

    do = do_ref[0].astype(jnp.float32)  # [bq, D]
    dv_sc[:] += jax.lax.dot_general(
        p.astype(do_ref.dtype), do.astype(do_ref.dtype), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bk, D]
    dp = jax.lax.dot_general(
        do.astype(v_ref.dtype), v_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    ds = p * (dp - _row_stat_tiled(delta_ref[0, 0], s.shape[-1]))  # [bq, bk]
    dk_sc[:] += scale * jax.lax.dot_general(
        ds.astype(q_ref.dtype), q_ref[0],
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [bk, D]

    @pl.when(qi == nq - 1)
    def _fin():
        dk_ref[0] = dk_sc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_sc[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# transposed-layout backward: scores as S^T = K_ext Q_ext^T (MXU-carried
# scale/mask, exp2 log2-domain) and dq accumulated as dq^T = K^T dS^T — every
# lse/delta broadcast becomes a free [1, bq] sublane row instead of the
# row-major kernels' jnp.tile lane tiles, and the dq matmul runs at full MXU
# depth (bk) and width (bq). dk/dv keep [bk, D] outputs (D=64 half-width,
# unavoidable without transposing P in-kernel).
# ---------------------------------------------------------------------------


def _bwd_dq_kernel_t(qt_ref, kext_ref, kt_ref, vt_ref, dot_ref, lse2_ref,
                     delta_ref, dqt_ref, dq_sc, *, scale):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_sc[:] = jnp.zeros_like(dq_sc)

    st = jax.lax.dot_general(
        kext_ref[0], qt_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [bk, bq] log2, masked
    p = jnp.exp2(st - lse2_ref[0])                   # [1,bq] sublane broadcast
    dpt = jax.lax.dot_general(
        vt_ref[0], dot_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [bk, bq]
    dst = (p * (dpt - delta_ref[0])).astype(kt_ref.dtype)
    dq_sc[:] += jax.lax.dot_general(
        kt_ref[0], dst, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [dim, bq] full MXU

    @pl.when(ki == nk - 1)
    def _fin():
        dqt_ref[0] = (dq_sc[:] * scale).astype(dqt_ref.dtype)


def _bwd_dkv_kernel_t(qt_ref, q_ref, kext_ref, vt_ref, do_ref, dot_ref,
                      lse2_ref, delta_ref, dk_ref, dv_ref, dk_sc, dv_sc, *, scale):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_sc[:] = jnp.zeros_like(dk_sc)
        dv_sc[:] = jnp.zeros_like(dv_sc)

    st = jax.lax.dot_general(
        kext_ref[0], qt_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [bk, bq]
    p = jnp.exp2(st - lse2_ref[0])
    dv_sc[:] += jax.lax.dot_general(
        p.astype(do_ref.dtype), do_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [bk, D]
    dpt = jax.lax.dot_general(
        vt_ref[0], dot_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [bk, bq]
    dst = (p * (dpt - delta_ref[0])).astype(q_ref.dtype)
    dk_sc[:] += jax.lax.dot_general(
        dst, q_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [bk, D]

    @pl.when(qi == nq - 1)
    def _fin():
        dk_ref[0] = (dk_sc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_sc[:].astype(dv_ref.dtype)


DEFAULT_BLOCK_Q_BWD_T = 2048
# bf16 sweep at [2,48,35552,64] (scripts/attn_bench.py --impl bwd):
# (2048,1024) 426.7 ms > (1024,1024) 428.6 > (4096,512) 435.0 > (2048,512)
# 441.3; (4096,1024) overflows VMEM. f32 operand tiles are twice the size —
# keep bk=512 there (block_q already halves below).
DEFAULT_BLOCK_K_BWD_T = 1024
DEFAULT_BLOCK_K_BWD_T_F32 = 512


def _flash_attention_backward_t(scale, block_q, block_k, res, g, kv_lens=None,
                                segment_ids=None):
    q, k, v, out, lse = res
    batch, heads, q_len, dim = q.shape
    kv_len = k.shape[2]
    n_seg = segment_ids[2] if segment_ids is not None else 0
    dim_ext = ((dim + 1 + n_seg + 7) // 8) * 8
    # fp32 inputs (training without an explicit bf16 cast) double the VMEM
    # footprint of every operand tile — the (2048, 512) blocks overflow the
    # 16 MB scoped-vmem stack by ~2% there, so halve block_q for f32.
    # dim_ext > 128 (segmented attention at D >= 128) roughly doubles the
    # per-tile footprint the D=64 sweep assumed — halve block_q there too.
    if q.dtype == jnp.bfloat16 and dim_ext <= 128:
        bq_default, bk_default = DEFAULT_BLOCK_Q_BWD_T, DEFAULT_BLOCK_K_BWD_T
    else:
        bq_default, bk_default = DEFAULT_BLOCK_Q_BWD_T // 2, DEFAULT_BLOCK_K_BWD_T_F32
    if os.environ.get("VAP_ATTN_BWD_BLOCKS"):  # block sweep (scripts/attn_bench.py)
        bq_default, bk_default = (
            int(x) for x in os.environ["VAP_ATTN_BWD_BLOCKS"].split("x"))
    block_q = max(min(bq_default, _cdiv(q_len, LANES) * LANES), LANES)
    block_k = max(min(bk_default, _cdiv(kv_len, 8) * 8), 8)

    delta = jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32), axis=-1)  # [B,H,Sq]

    qp = _pad_to(q.reshape(batch * heads, q_len, dim), 1, block_q)
    kp = _pad_to(k.reshape(batch * heads, kv_len, dim), 1, block_k)
    vp = _pad_to(v.reshape(batch * heads, kv_len, dim), 1, block_k)
    dop = _pad_to(g.reshape(batch * heads, q_len, dim), 1, block_q)
    bh = qp.shape[0]
    q_pad, k_pad = qp.shape[1], kp.shape[1]

    # log2-domain lse; padded q rows get a large value so p == 0
    lse2 = _pad_to(lse.reshape(bh, 1, q_len) * LOG2_E, 2, block_q)
    if q_pad != q_len:
        lse2 = lse2.at[:, :, q_len:].set(jnp.float32(-NEG_INF))
    deltap = _pad_to(delta.reshape(bh, 1, q_len), 2, block_q)

    if segment_ids is not None:
        q_oh, k_oh = _segment_onehot_ext(segment_ids[0], segment_ids[1], n_seg,
                                         heads, q_pad, k_pad, q.dtype, k.dtype)
        q_ext_cols = [q_oh, jnp.zeros((bh, q_pad, dim_ext - dim - 1 - n_seg), q.dtype)]
        k_ext_cols = [k_oh, jnp.zeros((bh, k_pad, dim_ext - dim - 1 - n_seg), k.dtype)]
    else:
        q_ext_cols = [jnp.zeros((bh, q_pad, dim_ext - dim - 1), q.dtype)]
        k_ext_cols = [jnp.zeros((bh, k_pad, dim_ext - dim - 1), k.dtype)]

    # extended transposed operands (fwd-t layout: scale*log2e folded into q,
    # mask column + segment one-hots on k, ones row on v — extra rows cancel
    # against zero rows of do^T in the dP^T matmul). Segment-masked pairs get
    # p = exp2(st - lse2) = 0 exactly, so their dq/dk/dv contributions vanish
    # with no kernel changes.
    qt = jnp.concatenate([
        (qp.astype(jnp.float32) * (scale * LOG2_E)).astype(q.dtype),
        jnp.ones((bh, q_pad, 1), q.dtype),
        *q_ext_cols,
    ], axis=-1).transpose(0, 2, 1)  # [bh, dim_ext, q_pad]
    if kv_lens is not None:
        # varlen: per-(b,h) bias column — p = exp2(st - lse2) lands exactly 0
        # for invalid keys, so their dk/dv rows and dq contributions vanish
        kv_bias_col = jnp.where(
            _varlen_valid(kv_lens, kv_len, k_pad, heads), 0.0, NEG_INF
        ).astype(k.dtype)[:, :, None]
    else:
        kv_bias = jnp.where(jnp.arange(k_pad) < kv_len, 0.0, NEG_INF).astype(k.dtype)
        kv_bias_col = jnp.broadcast_to(kv_bias[None, :, None], (bh, k_pad, 1))
    k_ext = jnp.concatenate([
        kp,
        kv_bias_col,
        *k_ext_cols,
    ], axis=-1)  # [bh, k_pad, dim_ext]
    vt = jnp.concatenate([
        vp,
        jnp.ones((bh, k_pad, 1), v.dtype),
        jnp.zeros((bh, k_pad, dim_ext - dim - 1), v.dtype),
    ], axis=-1).transpose(0, 2, 1)  # [bh, dim_ext, k_pad]
    kt = kp.transpose(0, 2, 1)      # [bh, dim, k_pad] raw
    dot_ext = jnp.concatenate([
        dop,
        jnp.zeros((bh, q_pad, dim_ext - dim), g.dtype),
    ], axis=-1).transpose(0, 2, 1)  # [bh, dim_ext, q_pad]

    nq = q_pad // block_q
    nk = k_pad // block_k

    dqt = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_t, scale=scale),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, dim_ext, block_q), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, block_k, dim_ext), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, dim, block_k), lambda b, qi, ki: (b, 0, ki)),
            pl.BlockSpec((1, dim_ext, block_k), lambda b, qi, ki: (b, 0, ki)),
            pl.BlockSpec((1, dim_ext, block_q), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, dim, block_q), lambda b, qi, ki: (b, 0, qi)),
        out_shape=jax.ShapeDtypeStruct((bh, dim, q_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((dim, block_q), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qt, k_ext, kt, vt, dot_ext, lse2, deltap)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_t, scale=scale),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, dim_ext, block_q), lambda b, ki, qi: (b, 0, qi)),
            pl.BlockSpec((1, block_q, dim), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, block_k, dim_ext), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, dim_ext, block_k), lambda b, ki, qi: (b, 0, ki)),
            pl.BlockSpec((1, block_q, dim), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, dim_ext, block_q), lambda b, ki, qi: (b, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda b, ki, qi: (b, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda b, ki, qi: (b, 0, qi)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, dim), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_k, dim), lambda b, ki, qi: (b, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, k_pad, dim), k.dtype),
            jax.ShapeDtypeStruct((bh, k_pad, dim), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dim), jnp.float32),
            pltpu.VMEM((block_k, dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qt, qp, k_ext, vt, dop, dot_ext, lse2, deltap)

    dq = dqt[:, :, :q_len].reshape(batch, heads, dim, q_len).transpose(0, 1, 3, 2)
    dk = dk[:, :kv_len].reshape(batch, heads, kv_len, dim)
    dv = dv[:, :kv_len].reshape(batch, heads, kv_len, dim)
    return dq, dk, dv


def _flash_attention_backward(scale, block_q, block_k, res, g, kv_lens=None,
                              segment_ids=None):
    q, k, v, out, lse = res
    batch, heads, q_len, dim = q.shape
    kv_len = k.shape[2]
    varlen = kv_lens is not None

    if segment_ids is not None:
        # packed-segment masking only exists in the transposed layout (the
        # row-major kernels' bias row is q-independent); at D >= 128 the
        # one-hot rows cost one extra MXU depth-pass on the score matmuls
        return _flash_attention_backward_t(scale, block_q, block_k, res, g,
                                           segment_ids=segment_ids)
    if dim + 1 <= 128:
        return _flash_attention_backward_t(scale, block_q, block_k, res, g,
                                           kv_lens=kv_lens)

    delta = jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32), axis=-1)  # [B,H,Sq]

    qp = _pad_to(q.reshape(batch * heads, q_len, dim), 1, block_q)
    kp = _pad_to(k.reshape(batch * heads, kv_len, dim), 1, block_k)
    vp = _pad_to(v.reshape(batch * heads, kv_len, dim), 1, block_k)
    dop = _pad_to(g.reshape(batch * heads, q_len, dim), 1, block_q)
    # pad lse with +inf-ish small p: use NEG_INF so exp(s - lse) with lse=-inf would
    # explode; padded q rows instead get lse=+large so p=0.
    lsep = _pad_to(lse.reshape(batch * heads, 1, q_len), 2, block_q)
    pad_rows = lsep.shape[2] - q_len
    if pad_rows:
        lsep = lsep.at[:, :, q_len:].set(jnp.float32(-NEG_INF))
    deltap = _pad_to(delta.reshape(batch * heads, 1, q_len), 2, block_q)

    bh, q_pad, _ = qp.shape
    k_pad = kp.shape[1]
    nq = q_pad // block_q
    nk = k_pad // block_k
    if varlen:
        # per-sample ([B, ...]) bias, head folded out by the index_map — the
        # same dedup as the forward (the array is identical across heads)
        kv_bias = jnp.broadcast_to(
            jnp.where(_varlen_valid(kv_lens, kv_len, k_pad), 0.0, NEG_INF
                      ).astype(jnp.float32)[:, None, :], (batch, 8, k_pad))
        kvb_spec_q = pl.BlockSpec((1, 8, block_k),
                                  lambda b, qi, ki: (b // heads, 0, ki))
        kvb_spec_k = pl.BlockSpec((1, 8, block_k),
                                  lambda b, ki, qi: (b // heads, 0, ki))
    else:
        kv_bias = jnp.broadcast_to(
            jnp.where(jnp.arange(k_pad) < kv_len, 0.0, NEG_INF).astype(jnp.float32)[None], (8, k_pad))
        kvb_spec_q = pl.BlockSpec((8, block_k), lambda b, qi, ki: (0, ki))
        kvb_spec_k = pl.BlockSpec((8, block_k), lambda b, ki, qi: (0, ki))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=kv_len, block_k=block_k,
                          varlen=varlen),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, dim), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, dim), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, dim), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_q, dim), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi)),
            kvb_spec_q,
        ],
        out_specs=pl.BlockSpec((1, block_q, dim), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, q_pad, dim), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp, dop, lsep, deltap, kv_bias)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, kv_len=kv_len, block_k=block_k,
                          varlen=varlen),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, dim), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, block_k, dim), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_k, dim), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_q, dim), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, ki, qi: (b, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda b, ki, qi: (b, 0, qi)),
            kvb_spec_k,
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, dim), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_k, dim), lambda b, ki, qi: (b, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, k_pad, dim), k.dtype),
            jax.ShapeDtypeStruct((bh, k_pad, dim), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dim), jnp.float32),
            pltpu.VMEM((block_k, dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp, dop, lsep, deltap, kv_bias)

    dq = dq[:, :q_len].reshape(batch, heads, q_len, dim)
    dk = dk[:, :kv_len].reshape(batch, heads, kv_len, dim)
    dv = dv[:, :kv_len].reshape(batch, heads, kv_len, dim)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _forward_dispatch(q, k, v, scale, block_q, block_k, kv_lens=None,
                      segment_ids=None):
    """Pick the forward layout. The transposed kernel wins whenever the ones
    row fits inside the MXU's native 128-deep contraction (D+1 <= 128, i.e.
    every D < 128 pays nothing for it); at D >= 128 the extra row would add a
    full second depth-pass to QK^T, so the row-major kernel stays.

    segment_ids (packed sequences) always take the transposed layout — the
    mask is q-dependent and only the extension-dim trick expresses it. At
    D >= 128 that costs one extra depth-pass on QK^T (and a halved block_q
    for VMEM); at D < 128 it is free."""
    dim = q.shape[-1]
    if segment_ids is not None:
        n_seg = segment_ids[2]
        if (block_q, block_k) == (DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K):
            block_q, block_k = ((DEFAULT_BLOCK_Q_T, 512)
                                if dim + 1 + n_seg <= 128 else (2048, 512))
        bq = max(min(block_q, _cdiv(q.shape[2], LANES) * LANES), LANES)
        bk = max(min(block_k, _cdiv(k.shape[2], 8) * 8), 8)
        return _flash_attention_forward_t(q, k, v, scale, bq, bk,
                                          segment_ids=segment_ids)
    if dim + 1 <= 128:
        if (block_q, block_k) == (DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K):
            # caller kept the row-kernel defaults -> use the tuned T blocks
            block_q, block_k = DEFAULT_BLOCK_Q_T, 512
        # transposed layout: block_q is the LANE dim — round to 128 and clamp
        # so short sequences don't pad to a huge tile
        bq = max(min(block_q, _cdiv(q.shape[2], LANES) * LANES), LANES)
        bk = max(min(block_k, _cdiv(k.shape[2], 8) * 8), 8)
        return _flash_attention_forward_t(q, k, v, scale, bq, bk, kv_lens=kv_lens)
    if (block_q, block_k) == (DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K):
        # tuned row-forward blocks: 163.3 TFLOP/s at D=128 (2048,1024) vs
        # 159.1 at (1024,1024) — sweep in scripts/attn_bench.py --dim 128
        block_q = 2048
    # Row layout: block_q is the LANE dim of the lse tile and block_k is
    # tiled by LANES inside the running-max kernel (`block_k // LANES`), so
    # both must be multiples of 128 — an 8-rounded block from a short,
    # unaligned KV (e.g. Wan's 257-token CLIP image context at D=128) traced
    # a (bq, 264) score against a (bq, 256) tile and failed. The kv-bias row
    # masks the padded tail, so LANES-rounding is shape-only.
    block_q = max(min(block_q, _cdiv(q.shape[2], LANES) * LANES), LANES)
    block_k = max(min(block_k, _cdiv(k.shape[2], LANES) * LANES), LANES)
    return _flash_attention_forward(q, k, v, scale, block_q, block_k, kv_lens=kv_lens)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> Array:
    """Fused full attention. q/k/v: [B, H, S, D] -> [B, H, Sq, D]."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out, _ = _forward_dispatch(q, k, v, scale, block_q, block_k)
    return out


def _fa_fwd(q, k, v, scale, block_q, block_k):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out, lse = _forward_dispatch(q, k, v, scale, block_q, block_k)
    return out, (q, k, v, out, lse)


def _fa_bwd(scale, block_q, block_k, res, g):
    if scale is None:
        scale = res[0].shape[-1] ** -0.5
    return _flash_attention_backward(scale, block_q, block_k, res, g)


flash_attention.defvjp(_fa_fwd, _fa_bwd)


# ---------------------------------------------------------------------------
# varlen public API — the reference's FLASH_VARLEN provider
# (finetrainers/models/attention_dispatch.py:809-889: per-sample cu_seqlens
# derived from a right-padded attention mask). The TPU-native form keeps the
# dense [B, H, S, D] layout and masks per-sample KEY suffixes inside the
# kernels (no unpad/repad host work); queries stay unmasked, matching the
# reference's key-only attn_mask semantics.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention_varlen(
    q: Array,
    k: Array,
    v: Array,
    kv_lens: Array,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> Array:
    """Fused full attention with per-sample valid KV lengths.

    q/k/v: [B, H, S, D]; kv_lens: [B] int — sample b attends only to keys
    [0, kv_lens[b]) (suffix padding, as produced by right-padded tokenizer
    masks). Differentiable in q/k/v; dk/dv rows of invalid keys are zero.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out, _ = _forward_dispatch(q, k, v, scale, block_q, block_k, kv_lens=kv_lens)
    return out


def _fav_fwd(q, k, v, kv_lens, scale, block_q, block_k):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out, lse = _forward_dispatch(q, k, v, scale, block_q, block_k, kv_lens=kv_lens)
    return out, (q, k, v, out, lse, kv_lens)


def _fav_bwd(scale, block_q, block_k, res, g):
    q, k, v, out, lse, kv_lens = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    dq, dk, dv = _flash_attention_backward(
        scale, block_q, block_k, (q, k, v, out, lse), g, kv_lens=kv_lens)
    import numpy as np  # float0 cotangent for the integer lengths

    return dq, dk, dv, np.zeros(kv_lens.shape, jax.dtypes.float0)


flash_attention_varlen.defvjp(_fav_fwd, _fav_bwd)


# ---------------------------------------------------------------------------
# packed-sequence (segment ids) public API — the reference FLASH_VARLEN
# provider's cu_seqlens form (attention_dispatch.py:613-889 concatenates
# samples into one packed stream with cumulative boundaries). The TPU-native
# form keeps dense [B, H, S, D] tensors and masks cross-segment pairs inside
# the fused kernels via extra one-hot contraction dims (_segment_onehot_ext)
# — free at D < 128, no unpack/repack host work, and unlike the reference's
# varlen providers it has a fused backward.
# ---------------------------------------------------------------------------


def _check_segment_args(q, k, q_segment_ids, kv_segment_ids, num_segments):
    if not isinstance(num_segments, int) or num_segments < 1:
        raise ValueError(f"num_segments must be a static positive int, got {num_segments!r}")
    if q_segment_ids.shape != (q.shape[0], q.shape[2]):
        raise ValueError(f"q_segment_ids must be [B, Sq] = {(q.shape[0], q.shape[2])}, "
                         f"got {q_segment_ids.shape}")
    if kv_segment_ids.shape != (k.shape[0], k.shape[2]):
        raise ValueError(f"kv_segment_ids must be [B, Skv] = {(k.shape[0], k.shape[2])}, "
                         f"got {kv_segment_ids.shape}")
    if not jnp.issubdtype(q_segment_ids.dtype, jnp.integer) or \
            not jnp.issubdtype(kv_segment_ids.dtype, jnp.integer):
        raise ValueError("segment ids must be integer arrays")


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def flash_attention_segmented(
    q: Array,
    k: Array,
    v: Array,
    q_segment_ids: Array,
    kv_segment_ids: Array,
    num_segments: int,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> Array:
    """Fused attention over PACKED sequences.

    q/k/v: [B, H, S, D]; q_segment_ids [B, Sq] / kv_segment_ids [B, Skv]
    (int): query i attends key j iff their ids are equal. num_segments is the
    STATIC number of distinct segment ids; ids must lie in
    [0, num_segments). Ids outside that range (canonically -1) mark padding:
    padding keys are masked from every in-range query, and padding queries'
    outputs are unspecified (finite, meant to be sliced away — they attend
    all keys).

    Differentiable in q/k/v with a fused backward; cross-segment dk/dv/dq
    contributions are exactly zero, so perturbing one segment's tensors
    never changes another segment's outputs or gradients (bit-exact).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    _check_segment_args(q, k, q_segment_ids, kv_segment_ids, num_segments)
    out, _ = _forward_dispatch(q, k, v, scale, block_q, block_k,
                               segment_ids=(q_segment_ids, kv_segment_ids, num_segments))
    return out


def _fas_fwd(q, k, v, q_segment_ids, kv_segment_ids, num_segments, scale, block_q, block_k):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    _check_segment_args(q, k, q_segment_ids, kv_segment_ids, num_segments)
    out, lse = _forward_dispatch(q, k, v, scale, block_q, block_k,
                                 segment_ids=(q_segment_ids, kv_segment_ids, num_segments))
    return out, (q, k, v, out, lse, q_segment_ids, kv_segment_ids)


def _fas_bwd(num_segments, scale, block_q, block_k, res, g):
    q, k, v, out, lse, q_seg, kv_seg = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    dq, dk, dv = _flash_attention_backward(
        scale, block_q, block_k, (q, k, v, out, lse), g,
        segment_ids=(q_seg, kv_seg, num_segments))
    import numpy as np  # float0 cotangents for the integer ids

    return (dq, dk, dv,
            np.zeros(q_seg.shape, jax.dtypes.float0),
            np.zeros(kv_seg.shape, jax.dtypes.float0))


flash_attention_segmented.defvjp(_fas_fwd, _fas_bwd)
