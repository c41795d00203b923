"""Fused W8A8 linear kernel for the TPU int8 MXU.

The inference W8A8 path (models/common.py `_int8_linear`, the SmoothQuant-style
recipe: per-output-channel int8 weights x dynamically per-token-quantized int8
activations — reference capability: SageAttention-class quantized inference,
finetrainers/models/attention_dispatch.py SAGE providers) runs through XLA's
`dot_general`, which measures only ~131 TFLOP/s on a v5e whose int8 MXU peak
is ~394 (scripts/linear_bench.py). This kernel fuses

    per-(token, K-chunk) abs-max quantize -> int8 MXU matmul -> f32 dequant
    epilogue (* s_x * s_w + bias)

into one VMEM-resident pass so the bf16 activations are read from HBM exactly
once per N-tile and the int32 accumulator never round-trips.

Quantization granularity: activations are scaled per (row, K-chunk) — finer
than `_int8_linear`'s per-row-over-full-K scales, so accuracy is strictly
better; the int8 accuracy gate (tests/test_int8_gate.py) covers both paths.

Grid: (M/bm, N/bn, K/bk), k innermost ("arbitrary"); f32 accumulator scratch
carries partial sums across K chunks; the x block index map depends only on
(m, k) so Mosaic keeps the x chunk resident while n sweeps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# default tile: x [512,1536]bf16 (1.5 MB) + w [1536,1024]i8 (1.5 MB) double-
# buffered + acc [512,1024]f32 (2 MB) + out [512,1024]bf16 ~= 10 MB of the
# v5e's ~16 MB VMEM; HBM traffic at (K,N)=(3072,3072): x 3 passes + w 139
# streams ~= 2.6 GB ~= 3.2 ms, overlappable with the 3.4 ms int8-MXU time.
BLOCK_M = 512
BLOCK_N = 1024
BLOCK_K = 1536


def _w8a8_kernel(x_ref, w_ref, sw_ref, b_ref, o_ref, acc_sc, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_sc[...] = jnp.zeros_like(acc_sc)

    xf = x_ref[...].astype(jnp.float32)                       # [bm, bk]
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-8)
    x_i8 = jnp.round(xf * (127.0 / amax)).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_i8, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                         # int8 MXU, 2x bf16
    acc_sc[...] += acc.astype(jnp.float32) * (amax * (1.0 / 127.0))

    @pl.when(k == nk - 1)
    def _fin():
        y = acc_sc[...] * sw_ref[...] + b_ref[...]
        o_ref[...] = y.astype(o_ref.dtype)


def _pick(total: int, preferred: int) -> int:
    for b in (preferred, 1024, 512, 256, 128):
        if b <= preferred and total % b == 0:
            return b
    return 0


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k"))
def _w8a8_call(x2d, w_i8, s_w, bias, block_m, block_n, block_k):
    M, K = x2d.shape
    N = w_i8.shape[1]
    m_pad = -M % block_m
    if m_pad:
        x2d = jnp.pad(x2d, ((0, m_pad), (0, 0)))
    nm, nn, nk = (M + m_pad) // block_m, N // block_n, K // block_k

    out = pl.pallas_call(
        functools.partial(_w8a8_kernel, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda m, n, k: (m, k)),
            pl.BlockSpec((block_k, block_n), lambda m, n, k: (k, n)),
            pl.BlockSpec((1, block_n), lambda m, n, k: (0, n)),
            pl.BlockSpec((1, block_n), lambda m, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((M + m_pad, N), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x2d, w_i8, s_w.reshape(1, N).astype(jnp.float32),
      bias.reshape(1, N).astype(jnp.float32))
    return out[:M] if m_pad else out


def supported(p, x) -> bool:
    """Shapes the kernel handles: 2-D int8 weight whose K and N are tileable."""
    w = p["w_i8"]
    return (w.ndim == 2 and x.shape[-1] == w.shape[0]
            and _pick(w.shape[0], BLOCK_K) >= 128
            and _pick(w.shape[1], BLOCK_N) >= 128)


def int8_linear_pallas(p, x):
    """Drop-in for models/common.py `_int8_linear` on TPU backends.

    p: {"w_i8": [K, N] int8, "s_w": [N], "bias"?: [N]}; x: [..., K] bf16/f32.
    Shapes the kernel cannot tile (K or N not a multiple of 128, or a stacked
    >2-D weight — see `supported`) fall back to the XLA `_int8_linear` path so
    the drop-in contract holds for every shape that path accepts.
    """
    if not supported(p, x):
        from vap_tpu.models.common import _int8_linear

        return _int8_linear(p, x)
    w_i8, s_w = p["w_i8"], p["s_w"]
    K, N = w_i8.shape
    bias = p.get("bias")
    if bias is None:
        bias = jnp.zeros((N,), jnp.float32)
    x2d = x.reshape(-1, K)
    bk = _pick(K, BLOCK_K)
    bn = _pick(N, BLOCK_N)
    bm = BLOCK_M
    out = _w8a8_call(x2d, w_i8, s_w, bias, bm, bn, bk)
    return out.reshape(x.shape[:-1] + (N,))
