"""CogView4 transformer config (reference CogView4Transformer2DModel,
diffusers/src/diffusers/models/transformers/transformer_cogview4.py:620-660)."""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class CogView4Config:
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 30
    attention_head_dim: int = 40
    num_attention_heads: int = 64
    text_embed_dim: int = 4096
    time_embed_dim: int = 512
    condition_dim: int = 256
    rope_axes_dim: Tuple[int, int] = (256, 256)
    rope_theta: float = 10000.0

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def pooled_projection_dim(self) -> int:
        return 3 * 2 * self.condition_dim

    @classmethod
    def cogview4_6b(cls, **overrides) -> "CogView4Config":
        return cls(**overrides)

    @classmethod
    def tiny(cls, **overrides) -> "CogView4Config":
        base = dict(in_channels=4, out_channels=4, num_layers=2,
                    attention_head_dim=8, num_attention_heads=2,
                    text_embed_dim=20, time_embed_dim=16, condition_dim=4,
                    rope_axes_dim=(8, 8))
        base.update(overrides)
        return cls(**base)
