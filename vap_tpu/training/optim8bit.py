"""Blockwise 8-bit Adam/AdamW for TPU (optax transform).

The reference offers bitsandbytes `adam-8bit`/`adamw-8bit`
(finetrainers/optimizer.py:118-160) to shrink optimizer state for multi-billion
parameter trainables. bitsandbytes is CUDA-only; this is a TPU-native
equivalent: both Adam moments are stored as int8 with per-block (2048-element)
absmax scales, dequantized/requantized inside the (jitted) update. Like bnb's
nonlinear dynamic map, the codes are nonlinear — linear absmax quantization
diverges because within-block dynamic range on the variance moment leaves
small-v elements with code 0 while the m error is sized by the block max. We
use power-law codes (fully vectorizable on the VPU): sign·sqrt for the first
moment, fourth-root for the (non-negative) second moment, giving fine
resolution near zero where Adam's ratio is most sensitive.

State per parameter leaf: int8 m/v codes plus fp32 scales — ~2.06 bytes/param
vs 8 bytes for fp32 Adam. All shapes are static; the transform jits and
shards like any optax optimizer (scales/codes inherit the param sharding over
the flattened axis).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

BLOCK_SIZE = 2048


class _Quantized(NamedTuple):
    code: jnp.ndarray   # int8 [nblocks, block]
    scale: jnp.ndarray  # f32  [nblocks, 1]


class ScaleByAdam8bitState(NamedTuple):
    count: jnp.ndarray
    mu: object   # pytree of _Quantized
    nu: object   # pytree of _Quantized


def _pad_len(n: int, block: int) -> int:
    return (n + block - 1) // block * block


def _quantize_m(x: jnp.ndarray, block: int) -> _Quantized:
    """Signed sign·sqrt code: c = 127·sign(x)·sqrt(|x|/absmax)."""
    xb = x.reshape(-1, block)
    scale = jnp.max(jnp.abs(xb), axis=1, keepdims=True)
    u = jnp.sqrt(jnp.abs(xb) / jnp.where(scale > 0, scale, 1.0))
    code = jnp.clip(jnp.round(127.0 * jnp.sign(xb) * u), -127, 127).astype(jnp.int8)
    return _Quantized(code=code, scale=scale.astype(jnp.float32))


def _dequantize_m(q: _Quantized) -> jnp.ndarray:
    u = q.code.astype(jnp.float32) / 127.0
    return (q.scale * jnp.sign(u) * u * u).reshape(-1)


def _quantize_v(x: jnp.ndarray, block: int) -> _Quantized:
    """Non-negative fourth-root code: c = 127·(x/max)^(1/4)."""
    xb = x.reshape(-1, block)
    scale = jnp.max(xb, axis=1, keepdims=True)
    u = (xb / jnp.where(scale > 0, scale, 1.0)) ** 0.25
    code = jnp.clip(jnp.round(127.0 * u), 0, 127).astype(jnp.int8)
    return _Quantized(code=code, scale=scale.astype(jnp.float32))


def _dequantize_v(q: _Quantized) -> jnp.ndarray:
    u = q.code.astype(jnp.float32) / 127.0
    return (q.scale * (u * u) * (u * u)).reshape(-1)


def _zeros_q(n: int, block: int) -> _Quantized:
    npad = _pad_len(max(n, 1), block)
    return _Quantized(code=jnp.zeros((npad // block, block), jnp.int8),
                      scale=jnp.zeros((npad // block, 1), jnp.float32))


def scale_by_adam_8bit(
    b1: float = 0.9,
    b2: float = 0.99,
    eps: float = 1e-8,
    block_size: int = BLOCK_SIZE,
) -> optax.GradientTransformation:
    """Adam moment tracking with int8 blockwise-quantized state."""

    def init_fn(params):
        def zq(p):
            return _zeros_q(p.size, block_size)
        return ScaleByAdam8bitState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zq, params),
            nu=jax.tree.map(zq, params),
        )

    def update_fn(updates, state, params=None):
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c

        def leaf(g, mq, nq):
            n = g.size
            npad = _pad_len(max(n, 1), block_size)
            gf = jnp.zeros((npad,), jnp.float32).at[:n].set(
                g.reshape(-1).astype(jnp.float32))
            m = b1 * _dequantize_m(mq) + (1.0 - b1) * gf
            v = b2 * _dequantize_v(nq) + (1.0 - b2) * gf * gf
            upd = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            return (upd[:n].reshape(g.shape).astype(g.dtype),
                    _quantize_m(m, block_size), _quantize_v(v, block_size))

        flat_u, tdef = jax.tree.flatten(updates)
        # flatten_up_to stops at update-leaf positions, yielding _Quantized
        # nodes (which are themselves pytrees) as the "leaves"
        flat_m = tdef.flatten_up_to(state.mu)
        flat_n = tdef.flatten_up_to(state.nu)
        out = [leaf(g, mq, nq) for g, mq, nq in zip(flat_u, flat_m, flat_n)]
        new_updates = tdef.unflatten([o[0] for o in out])
        new_mu = tdef.unflatten([o[1] for o in out])
        new_nu = tdef.unflatten([o[2] for o in out])
        return new_updates, ScaleByAdam8bitState(count=count, mu=new_mu, nu=new_nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adam_8bit(learning_rate, b1=0.9, b2=0.99, eps=1e-8,
              block_size: int = BLOCK_SIZE) -> optax.GradientTransformation:
    return optax.chain(
        scale_by_adam_8bit(b1=b1, b2=b2, eps=eps, block_size=block_size),
        optax.scale_by_learning_rate(learning_rate),
    )


def adamw_8bit(learning_rate, b1=0.9, b2=0.99, eps=1e-8,
               weight_decay: float = 1e-4, mask: Optional[object] = None,
               block_size: int = BLOCK_SIZE) -> optax.GradientTransformation:
    return optax.chain(
        scale_by_adam_8bit(b1=b1, b2=b2, eps=eps, block_size=block_size),
        optax.add_decayed_weights(weight_decay, mask),
        optax.scale_by_learning_rate(learning_rate),
    )
