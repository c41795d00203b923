"""Flux (FLUX.1) transformer config.

Mirrors the reference FluxTransformer2DModel config surface
(diffusers/src/diffusers/models/transformers/transformer_flux.py:232-246):
19 dual-stream + 38 single-stream blocks, packed 2x2 latents (in_channels=64),
3-axis RoPE (16, 56, 56), optional guidance embeddings (FLUX.1-dev).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    patch_size: int = 1
    in_channels: int = 64
    out_channels: Optional[int] = None
    num_layers: int = 19
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    pooled_projection_dim: int = 768
    guidance_embeds: bool = True
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 10000.0

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def output_channels(self) -> int:
        return self.out_channels or self.in_channels

    @classmethod
    def flux_dev(cls, **overrides) -> "FluxConfig":
        return cls(**overrides)

    @classmethod
    def tiny(cls, **overrides) -> "FluxConfig":
        base = dict(
            in_channels=16, num_layers=2, num_single_layers=2,
            attention_head_dim=16, num_attention_heads=2,
            joint_attention_dim=24, pooled_projection_dim=20,
            guidance_embeds=True, axes_dims_rope=(4, 6, 6),
        )
        base.update(overrides)
        return cls(**base)
