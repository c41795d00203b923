"""Packed-sequence (segment-id) flash attention — the reference
FLASH_VARLEN provider's cu_seqlens form (finetrainers/models/
attention_dispatch.py:613-889 packs samples into one stream with cumulative
boundaries; here dense [B,H,S,D] tensors + per-token segment ids).

Covers: forward parity vs the dense segment-masked reference (bound and
running-max paths, D=64 free-rows case and D=128 extra-depth case, bf16),
backward/grad parity, exact cross-segment invariance, empty segments,
padding ids, provider routing (flash/sage fallback/xla/jax_flash), and the
kv_lens mutual-exclusion contract.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vap_tpu.ops.attention import (
    attention_provider,
    dense_attention_segmented,
    scaled_dot_product_attention,
)
from vap_tpu.ops.flash_attention import (
    _flash_attention_forward_t,
    flash_attention_segmented,
)

ON_TPU = bool(os.environ.get("VAP_TEST_TPU"))
ATOL = 6e-3 if ON_TPU else 2e-3


def _run(fn, *args):
    if ON_TPU:
        return fn(*args)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return fn(*args)


def _qkv(seed, B, H, S, D, skv=None):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(seed), 3)
    skv = skv or S
    return (jax.random.normal(kq, (B, H, S, D), jnp.float32),
            jax.random.normal(kk, (B, H, skv, D), jnp.float32),
            jax.random.normal(kv, (B, H, skv, D), jnp.float32))


def _packed_ids(S, bounds):
    """Contiguous packing: bounds = [l0, l1, ...] segment lengths; the tail
    beyond sum(bounds) gets the padding id -1."""
    ids = np.full((S,), -1, np.int32)
    pos = 0
    for g, ln in enumerate(bounds):
        ids[pos:pos + ln] = g
        pos += ln
    return jnp.asarray(ids)


# ---------------------------------------------------------------------------
# forward parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dim", [64, 128])
def test_segmented_forward_matches_dense(dim):
    """D=64: the one-hots ride the free dim_ext rows; D=128: they add a
    second MXU depth-pass (still the transposed layout)."""
    B, H, S = 2, 2, 640
    q, k, v = _qkv(0, B, H, S, dim)
    ids = jnp.stack([_packed_ids(S, [200, 300, 140]),
                     _packed_ids(S, [512, 100])])  # row 1: 28 padding tokens
    ref = dense_attention_segmented(q, k, v, ids, ids)
    got = _run(lambda *a: flash_attention_segmented(*a, num_segments=3), q, k, v, ids, ids)
    # padding queries (id -1) have unspecified outputs — compare valid rows
    m = np.broadcast_to(np.asarray(ids >= 0)[:, None, :, None], ref.shape)
    np.testing.assert_allclose(np.asarray(got) * m, np.asarray(ref) * m,
                               atol=ATOL, rtol=2e-3)


def test_segmented_forward_bf16():
    B, H, S = 2, 2, 512
    q, k, v = (x.astype(jnp.bfloat16) for x in _qkv(1, B, H, S, 64))
    ids = jnp.stack([_packed_ids(S, [256, 256]), _packed_ids(S, [100, 412])])
    ref = dense_attention_segmented(q, k, v, ids, ids)
    got = _run(lambda *a: flash_attention_segmented(*a, num_segments=2), q, k, v, ids, ids)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref, np.float32),
                               atol=2.5e-2, rtol=2e-2)


def test_segmented_running_max_path_matches_dense():
    """use_bound=False exercises the running-max kernel, whose accumulator
    must exactly wipe tiles that were fully cross-segment (alpha == 0)."""
    B, H, S = 2, 2, 640
    q, k, v = _qkv(2, B, H, S, 64)
    ids = jnp.stack([_packed_ids(S, [64, 576]), _packed_ids(S, [600, 40])])
    ref = dense_attention_segmented(q, k, v, ids, ids)

    def fwd(q, k, v, ids):
        out, _ = _flash_attention_forward_t(q, k, v, 64 ** -0.5, 128, 512,
                                            use_bound=False,
                                            segment_ids=(ids, ids, 2))
        return out

    got = _run(fwd, q, k, v, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=ATOL, rtol=2e-3)


def test_segmented_cross_attention_ragged_kv():
    """Sq != Skv packing (e.g. packed cross-attention): query segments pick
    out their own KV spans."""
    B, H, Sq, Skv = 2, 2, 384, 640
    q, k, v = _qkv(3, B, H, Sq, 64, skv=Skv)
    q_ids = jnp.stack([_packed_ids(Sq, [128, 256]), _packed_ids(Sq, [300, 84])])
    kv_ids = jnp.stack([_packed_ids(Skv, [400, 240]), _packed_ids(Skv, [100, 500])])
    ref = dense_attention_segmented(q, k, v, q_ids, kv_ids)
    got = _run(lambda *a: flash_attention_segmented(*a, num_segments=2),
               q, k, v, q_ids, kv_ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=ATOL, rtol=2e-3)


@pytest.mark.parametrize("use_bound", [True, False])
def test_segmented_empty_segment_returns_zeros(use_bound):
    """A query segment with no matching keys (empty on the KV side) must
    emit exactly zero rows, not NaN: the bound path via p == 0 everywhere,
    the running-max path via the floor_m flush."""
    B, H, S = 1, 2, 256
    q, k, v = _qkv(4, B, H, S, 64)
    q_ids = _packed_ids(S, [128, 128])[None]
    kv_ids = _packed_ids(S, [256])[None]          # only segment 0 has keys

    def fwd(q, k, v):
        out, _ = _flash_attention_forward_t(q, k, v, 64 ** -0.5, 128, 256,
                                            use_bound=use_bound,
                                            segment_ids=(q_ids, kv_ids, 2))
        return out

    out = np.asarray(_run(fwd, q, k, v))
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[:, :, 128:], 0.0)


# ---------------------------------------------------------------------------
# exact cross-segment invariance — stronger than any tolerance: rewriting
# one segment's q/k/v must not change another segment's outputs AT ALL
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("use_bound", [True, False])
def test_segmented_cross_segment_invariance_bitexact(use_bound):
    B, H, S = 1, 2, 512
    q, k, v = _qkv(5, B, H, S, 64)
    ids = _packed_ids(S, [200, 312])[None]

    def fwd(q, k, v):
        out, _ = _flash_attention_forward_t(q, k, v, 64 ** -0.5, 128, 512,
                                            use_bound=use_bound,
                                            segment_ids=(ids, ids, 2))
        return out

    base = _run(fwd, q, k, v)
    # garbage (including huge values) in segment 1 must not leak into seg 0
    blast = jnp.where((jnp.arange(S) >= 200)[None, None, :, None],
                      1e4 * jnp.ones_like(q), 0.0)
    got = _run(fwd, q + blast, k + blast, v + blast)
    np.testing.assert_array_equal(np.asarray(base)[:, :, :200],
                                  np.asarray(got)[:, :, :200])


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def test_segmented_grads_match_dense():
    B, H, S, D = 2, 2, 384, 64
    q, k, v = _qkv(6, B, H, S, D)
    ids = jnp.stack([_packed_ids(S, [128, 128, 128]), _packed_ids(S, [300, 84])])

    def loss_fused(q, k, v):
        out = flash_attention_segmented(q, k, v, ids, ids, 3)
        return jnp.sum(jnp.sin(out))

    def loss_dense(q, k, v):
        out = dense_attention_segmented(q, k, v, ids, ids)
        return jnp.sum(jnp.sin(out))

    g_fused = _run(lambda *a: jax.grad(loss_fused, argnums=(0, 1, 2))(*a), q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for gf, gd, name in zip(g_fused, g_dense, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                                   atol=5e-3, rtol=5e-3, err_msg=f"d{name}")


def test_segmented_grads_zero_across_segments():
    """dk/dv rows of segment 1 must be exactly zero when the loss reads only
    segment 0's outputs."""
    B, H, S, D = 1, 2, 256, 64
    q, k, v = _qkv(7, B, H, S, D)
    ids = _packed_ids(S, [96, 160])[None]

    def loss(q, k, v):
        out = flash_attention_segmented(q, k, v, ids, ids, 2)
        return jnp.sum(out[:, :, :96] ** 2)

    dq, dk, dv = _run(lambda *a: jax.grad(loss, argnums=(0, 1, 2))(*a), q, k, v)
    np.testing.assert_array_equal(np.asarray(dq)[:, :, 96:], 0.0)
    np.testing.assert_array_equal(np.asarray(dk)[:, :, 96:], 0.0)
    np.testing.assert_array_equal(np.asarray(dv)[:, :, 96:], 0.0)


# ---------------------------------------------------------------------------
# provider routing + contract
# ---------------------------------------------------------------------------

def test_provider_routing_segment_ids():
    B, H, S = 1, 2, 256
    q, k, v = _qkv(8, B, H, S, 64)
    ids = _packed_ids(S, [100, 156])[None]
    seg = (ids, ids, 2)
    ref = dense_attention_segmented(q, k, v, ids, ids)
    for prov in ("flash", "sage", "xla"):
        with attention_provider(prov):
            got = _run(lambda *a: scaled_dot_product_attention(*a, segment_ids=seg),
                       q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=ATOL,
                                   rtol=2e-3, err_msg=prov)


@pytest.mark.skipif(not ON_TPU, reason="library kernel needs a real TPU")
def test_provider_routing_jax_flash_segment_ids():
    B, H, S = 1, 2, 1024
    q, k, v = _qkv(9, B, H, S, 64)
    ids = _packed_ids(S, [400, 624])[None]
    with attention_provider("jax_flash"):
        got = scaled_dot_product_attention(q, k, v, segment_ids=(ids, ids, 2))
    ref = dense_attention_segmented(q, k, v, ids, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=ATOL, rtol=2e-3)


def test_segment_ids_and_kv_lens_mutually_exclusive():
    q, k, v = _qkv(10, 1, 1, 128, 64)
    ids = _packed_ids(128, [128])[None]
    with pytest.raises(ValueError, match="mutually exclusive"):
        scaled_dot_product_attention(q, k, v, kv_lens=jnp.array([64]),
                                     segment_ids=(ids, ids, 1))


def test_segment_args_validated():
    q, k, v = _qkv(11, 1, 1, 128, 64)
    ids = _packed_ids(128, [128])[None]
    with pytest.raises(ValueError, match="num_segments"):
        flash_attention_segmented(q, k, v, ids, ids, 0)
    with pytest.raises(ValueError, match="q_segment_ids"):
        flash_attention_segmented(q, k, v, ids[:, :64], ids, 1)
    with pytest.raises(ValueError, match="integer"):
        flash_attention_segmented(q, k, v, ids.astype(jnp.float32), ids, 1)


# ---------------------------------------------------------------------------
# packed segments under sequence parallelism (beyond the reference: its
# cu_seqlens providers lack supports_cp)
# ---------------------------------------------------------------------------

def _mesh8():
    from vap_tpu.parallel import MeshConfig, make_mesh

    if len(jax.devices("cpu")) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return make_mesh(MeshConfig(data=2, fsdp=2, seq=2, tensor=1),
                     jax.devices("cpu")[:8])


@pytest.mark.parametrize("rotate", ["allgather", "ppermute", "ulysses"])
def test_seq_parallel_segments_match_dense(rotate):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vap_tpu.parallel.ring_attention import sequence_parallel_attention

    mesh = _mesh8()
    B, H, S, D = 2, 4, 64, 16
    q, k, v = _qkv(21, B, H, S, D)
    # segment 1 of sample 0 spans the seq-shard boundary (shards of 32);
    # sample 1 packs three segments with a padded tail
    ids = jnp.stack([_packed_ids(S, [20, 30, 14]), _packed_ids(S, [10, 22, 12])])
    seg = (ids, ids, 3)
    with jax.default_device(jax.devices("cpu")[0]):
        ref = dense_attention_segmented(q, k, v, ids, ids)
    spec = NamedSharding(mesh, P(None, None, "seq", None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    got = sequence_parallel_attention(qs, ks, vs, mesh, "seq",
                                      rotate_method=rotate, segment_ids=seg)
    got, ref = np.asarray(got), np.asarray(ref)
    # padding-query rows are unspecified (both -1 rows here resolve the same
    # way in every path, but only compare the contract: in-range rows)
    valid = np.asarray(ids >= 0)
    np.testing.assert_allclose(got[:, :, :, :][np.broadcast_to(
        valid[:, None, :, None], got.shape)],
        ref[np.broadcast_to(valid[:, None, :, None], ref.shape)],
        atol=1e-5, rtol=1e-5)


def test_dispatch_ring_with_segment_ids_uses_installed_mesh():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vap_tpu.parallel.ring_attention import attention_mesh

    mesh = _mesh8()
    B, H, S, D = 2, 4, 64, 16
    q, k, v = _qkv(22, B, H, S, D)
    ids = jnp.stack([_packed_ids(S, [40, 24]), _packed_ids(S, [15, 15, 15])])
    with jax.default_device(jax.devices("cpu")[0]):
        ref = dense_attention_segmented(q, k, v, ids, ids)
    spec = NamedSharding(mesh, P(None, None, "seq", None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    with attention_mesh(mesh, "seq", rotate_method="ppermute"):
        with attention_provider("ring"):
            got = scaled_dot_product_attention(qs, ks, vs, segment_ids=(ids, ids, 3))
    valid = np.asarray(ids >= 0)
    m = np.broadcast_to(valid[:, None, :, None], np.asarray(got).shape)
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(ref)[m],
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("rotate", ["allgather", "ppermute", "ulysses"])
def test_seq_parallel_segment_grads_match_dense(rotate):
    """Segment gradients under every rotate method match the dense
    segment-masked reference (valid rows only): covers differentiating
    through the id all_gathers (allgather/ulysses) and the integer-carry
    ppermute ring."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vap_tpu.parallel.ring_attention import sequence_parallel_attention

    mesh = _mesh8()
    B, H, S, D = 1, 2, 32, 8
    q, k, v = _qkv(23, B, H, S, D)
    ids = _packed_ids(S, [12, 16])[None]
    valid = (ids >= 0).astype(jnp.float32)[:, None, :, None]
    spec = NamedSharding(mesh, P(None, None, "seq", None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))

    def loss_sp(q, k, v):
        out = sequence_parallel_attention(q, k, v, mesh, "seq",
                                          rotate_method=rotate,
                                          segment_ids=(ids, ids, 2))
        return ((out.astype(jnp.float32) * valid) ** 2).mean()

    def loss_ref(q, k, v):
        out = dense_attention_segmented(q, k, v, ids, ids)
        return ((out.astype(jnp.float32) * valid) ** 2).mean()

    g = jax.grad(loss_sp, argnums=(0, 1, 2))(qs, ks, vs)
    with jax.default_device(jax.devices("cpu")[0]):
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gi, gr in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(gi), np.asarray(gr),
                                   atol=1e-6, rtol=1e-5)


def test_segmented_rectangular_grads_match_dense():
    """Fused-kernel backward in the rectangular Sq != Skv regime (the shape
    allgather seq-parallelism feeds it on TPU: local queries vs gathered
    keys) — grads vs the dense segment reference."""
    B, H, Sq, Skv, D = 1, 2, 128, 256, 64
    q, k, v = _qkv(24, B, H, Sq, D, skv=Skv)
    q_ids = _packed_ids(Sq, [60, 50])[None]
    kv_ids = _packed_ids(Skv, [120, 100])[None]
    validq = (q_ids >= 0).astype(jnp.float32)[:, None, :, None]

    def loss_fused(q, k, v):
        out = flash_attention_segmented(q, k, v, q_ids, kv_ids, 2)
        return ((out.astype(jnp.float32) * validq) ** 2).mean()

    def loss_ref(q, k, v):
        out = dense_attention_segmented(q, k, v, q_ids, kv_ids)
        return ((out.astype(jnp.float32) * validq) ** 2).mean()

    g = _run(jax.grad(loss_fused, argnums=(0, 1, 2)), q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gi, gr in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(gi), np.asarray(gr),
                                   atol=ATOL, rtol=1e-2)
