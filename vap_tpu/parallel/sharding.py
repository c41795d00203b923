"""Parameter/activation sharding rules (NamedSharding partition specs).

Supersedes the reference's per-strategy torch code paths (DDP replicate,
FSDP2 fully_shard, DTensor FFN-only TP — finetrainers/parallel/ptd.py:473-512,
models/wan/base_specification.py:1080-1116): here one spec pytree expresses
DDP / FSDP / HSDP / TP simultaneously and XLA inserts the collectives.

Conventions (CogVideoX MoT transformer param tree):
  * attention qkv + ff.net_0 kernels: column-parallel over "tensor",
    row dim sharded over "fsdp"
  * attention out + ff.net_2 kernels: row-parallel over "tensor",
    output dim sharded over "fsdp"
  * other 2-D kernels: output dim over "fsdp" (ZeRO-3-like)
  * 1-D params (norms, biases): replicated
  * stacked block leaves keep the leading layer axis unsharded
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_PARALLEL = ("to_q", "to_k", "to_v", "net_0")
ROW_PARALLEL = ("to_out", "net_2")


def _spec_for(path, leaf) -> P:
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    in_blocks = "blocks" in names
    ndim = leaf.ndim
    base = 1 if in_blocks else 0  # stacked block leaves carry a leading L axis

    def pad(spec_tail):
        return P(*([None] * base + list(spec_tail)))

    is_kernel = names[-1] == "kernel"
    parent = names[-2] if len(names) >= 2 else ""

    if is_kernel and ndim - base == 2:
        if parent in COLUMN_PARALLEL:
            return pad(["fsdp", "tensor"])
        if parent in ROW_PARALLEL:
            return pad(["tensor", "fsdp"])
        return pad([None, "fsdp"])
    if names[-1] == "bias" and ndim - base == 1 and parent in COLUMN_PARALLEL:
        return pad(["tensor"])
    if names[-1] in ("effect_embeddings", "ref_embeddings") and ndim == 2:
        return P(None, "fsdp")
    if is_kernel and ndim - base == 5:  # VAE conv3d [kt,kh,kw,I,O]
        return pad([None, None, None, None, "fsdp"])
    if is_kernel and ndim - base == 4:  # conv2d
        return pad([None, None, None, "fsdp"])
    if names[-1] == "embed" and ndim == 2:  # T5 vocab embedding
        return P(None, "fsdp")
    return P(*([None] * ndim))


def transformer_param_specs(params: Dict[str, Any]):
    """PartitionSpec pytree matching an arbitrary vap_tpu param tree."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def shard_params(params, mesh: Mesh):
    specs = transformer_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_sharding(mesh: Mesh, ndim: int, *, frame_axis: int = None) -> NamedSharding:
    """Batch over (data, fsdp); optionally shard the latent frame axis over seq
    (the CP plan: the token stream is frame-major so frame sharding == token
    sharding, cf. finetrainers/models/_metadata/transformer.py:48-65)."""
    spec = [None] * ndim
    spec[0] = ("data", "fsdp")
    if frame_axis is not None:
        spec[frame_axis] = "seq"
    return NamedSharding(mesh, P(*spec))


def put_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Place every batch tensor with its training sharding: batch dim over
    (data, fsdp) and — when the mesh has a seq axis — the frame axis of 5D
    latent tensors over seq, so the train step sees data already laid out for
    sequence parallelism instead of resharding it every step.

    Single-host: plain device_put. Multi-host: each process holds only ITS
    shard of the global batch (the dataloader shards by process), so the
    global array is assembled with jax.make_array_from_process_local_data —
    device_put of a host-local array under a global sharding is invalid
    there."""
    import numpy as np

    seq = dict(mesh.shape).get("seq", 1)
    multihost = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if isinstance(v, list):
            continue
        arr = np.asarray(v)
        frame_axis = 1 if (seq > 1 and arr.ndim == 5 and arr.shape[1] % seq == 0) else None
        sharding = batch_sharding(mesh, arr.ndim, frame_axis=frame_axis)
        if multihost:
            out[k] = jax.make_array_from_process_local_data(sharding, arr)
        else:
            out[k] = jax.device_put(arr, sharding)
    return out
