"""Device mesh construction.

Replaces the reference's 5-D torch DeviceMesh (pp, dp_replicate, dp_shard,
cp, tp — finetrainers/parallel/ptd.py:172-220) with a jax.sharding.Mesh over
axes (data, fsdp, seq, tensor):

  data   — batch data parallelism (DDP / dp_replicate)
  fsdp   — parameter sharding (FSDP2 / dp_shard); data×fsdp = HSDP
  seq    — context parallelism over the joint token stream (ring/CP)
  tensor — megatron-style tensor parallelism (supersedes the reference's
           FFN-only TP plan)

Pipeline parallelism is intentionally absent, as in the reference (the mesh
dim exists there but raises NotImplementedError — sft_trainer/trainer.py:130).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "fsdp", "seq", "tensor")


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    fsdp: int = 1
    seq: int = 1
    tensor: int = 1

    @property
    def world_size(self) -> int:
        return self.data * self.fsdp * self.seq * self.tensor

    @classmethod
    def for_devices(cls, n: int, *, fsdp: Optional[int] = None, seq: Optional[int] = None,
                    tensor: int = 1) -> "MeshConfig":
        """Heuristic factorization: prefer seq (long joint sequences) then fsdp."""
        remaining = n // tensor
        if seq is None:
            seq = 2 if remaining % 2 == 0 else 1
        remaining //= seq
        if fsdp is None:
            fsdp = 2 if remaining % 2 == 0 else 1
        remaining //= fsdp
        return cls(data=remaining, fsdp=fsdp, seq=seq, tensor=tensor)


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < cfg.world_size:
        raise ValueError(f"need {cfg.world_size} devices, have {len(devices)}")
    devs = np.asarray(devices[: cfg.world_size]).reshape(cfg.data, cfg.fsdp, cfg.seq, cfg.tensor)
    return Mesh(devs, AXES)
