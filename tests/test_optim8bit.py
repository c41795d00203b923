"""Blockwise int8 Adam: state dtype/memory and trajectory parity vs fp32 Adam
(reference capability: bitsandbytes adam-8bit/adamw-8bit,
finetrainers/optimizer.py:118-160)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from vap_tpu.training.optim8bit import adam_8bit, adamw_8bit, scale_by_adam_8bit
from vap_tpu.training.optimizer import get_lr_schedule, get_optimizer


def _quadratic_params(key):
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.normal(k1, (37, 11)),  # not a multiple of block size
        "b": jax.random.normal(k2, (11,)),
    }


def test_state_is_int8():
    params = _quadratic_params(jax.random.PRNGKey(0))
    tx = scale_by_adam_8bit(block_size=64)
    state = tx.init(params)
    assert state.mu["w"].code.dtype == jnp.int8
    assert state.nu["b"].code.dtype == jnp.int8
    # per-param state bytes: int8 codes x2 + f32 scales x2 per block
    n = params["w"].size
    codes = state.mu["w"].code.size + state.nu["w"].code.size
    scales = (state.mu["w"].scale.size + state.nu["w"].scale.size) * 4
    assert codes + scales < 8 * n / 2.5  # well under fp32 Adam's 8 bytes/param


def test_tracks_fp32_adam():
    key = jax.random.PRNGKey(1)
    params = _quadratic_params(key)
    target = jax.tree.map(lambda p: p * 0.0 + 1.0, params)

    def loss(p):
        return sum((jnp.asarray(a - b) ** 2).sum() for a, b in
                   zip(jax.tree.leaves(p), jax.tree.leaves(target)))

    def run(tx, steps=250):
        p = params
        s = tx.init(p)

        @jax.jit
        def step(p, s):
            g = jax.grad(loss)(p)
            u, s = tx.update(g, s, p)
            return optax.apply_updates(p, u), s

        for _ in range(steps):
            p, s = step(p, s)
        return float(loss(p))

    l8 = run(adam_8bit(5e-2, block_size=64))
    l32 = run(optax.adam(5e-2, b1=0.9, b2=0.99))
    # both should make strong progress on a quadratic; 8-bit within 2x of fp32
    assert l8 < float(loss(params)) * 0.05
    assert l8 < max(l32 * 2.0, 1e-2)


def test_adamw_8bit_decays_weights():
    params = {"w": jnp.ones((8, 8))}
    tx = adamw_8bit(1e-2, weight_decay=0.1, block_size=64)
    s = tx.init(params)
    g = {"w": jnp.zeros((8, 8))}
    u, _ = tx.update(g, s, params)
    p2 = optax.apply_updates(params, u)
    assert float(jnp.abs(p2["w"]).mean()) < 1.0  # pulled toward zero


@pytest.mark.parametrize("name", ["adamw-8bit", "adam-8bit"])
def test_get_optimizer_8bit(name):
    tx = get_optimizer(name, get_lr_schedule("constant", 1e-3))
    params = {"w": jnp.ones((4, 4))}
    s = tx.init(params)
    u, _ = tx.update({"w": jnp.full((4, 4), 0.5)}, s, params)
    assert np.isfinite(np.asarray(u["w"])).all()
