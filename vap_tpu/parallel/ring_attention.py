"""Sequence-parallel (context-parallel) attention over a mesh axis.

The reference implements CP as torch ring attention with an "allgather" KV
rotation (finetrainers/models/attention_dispatch.py:82-92, rotate method set
at trainer/base.py:81-83). The TPU-native equivalent: queries stay sharded on
the token axis, K/V are all-gathered over the `seq` mesh axis (XLA schedules
the gather on ICI and overlaps it with compute), and the local attention is
the Pallas flash kernel.

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

from ..ops.attention import dense_attention
from ..ops.flash_attention import flash_attention

_ctx = threading.local()


@contextlib.contextmanager
def attention_mesh(mesh: Mesh, axis: str = "seq"):
    """Install the mesh used by the 'ring' attention provider."""
    prev = getattr(_ctx, "mesh_axis", None)
    _ctx.mesh_axis = (mesh, axis)
    try:
        yield
    finally:
        _ctx.mesh_axis = prev


def get_attention_mesh():
    return getattr(_ctx, "mesh_axis", None)


def _local_attention(q, k, v, scale, platform: str):
    if platform == "tpu":
        return flash_attention(q, k, v, scale)
    return dense_attention(q, k, v, scale)


def _mesh_platform(mesh: Mesh) -> str:
    try:
        return mesh.devices.flat[0].platform
    except Exception:  # pragma: no cover - abstract meshes
        return jax.devices()[0].platform


def sequence_parallel_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    mesh: Mesh, axis: str = "seq", scale: Optional[float] = None,
) -> jnp.ndarray:
    """q/k/v: [B, H, S, D] with S sharded over `axis`. Returns out with the
    same sharding. K/V are all-gathered inside the shard; softmax is exact."""
    platform = _mesh_platform(mesh)
    if mesh.shape[axis] == 1:
        return _local_attention(q, k, v, scale, platform)

    def body(q_loc, k_loc, v_loc):
        k_full = jax.lax.all_gather(k_loc, axis, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v_loc, axis, axis=2, tiled=True)
        return _local_attention(q_loc, k_full, v_full, scale, platform)

    spec = P(None, None, axis, None)
    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
