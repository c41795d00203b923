"""LTX-Video transformer config (reference LTXVideoTransformer3DModel,
diffusers/src/diffusers/models/transformers/transformer_ltx.py:302-350)."""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class LTXVideoConfig:
    in_channels: int = 128
    out_channels: int = 128
    patch_size: int = 1
    patch_size_t: int = 1
    num_attention_heads: int = 32
    attention_head_dim: int = 64
    cross_attention_dim: int = 2048
    num_layers: int = 28
    caption_channels: int = 4096
    norm_eps: float = 1e-6
    rope_base_num_frames: int = 20
    rope_base_height: int = 2048
    rope_base_width: int = 2048
    rope_theta: float = 10000.0

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def ltx_video_2b(cls, **overrides) -> "LTXVideoConfig":
        return cls(**overrides)

    @classmethod
    def tiny(cls, **overrides) -> "LTXVideoConfig":
        # cross_attention_dim == inner_dim, as in the real model (captions are
        # projected to inner_dim before cross attention)
        base = dict(in_channels=8, out_channels=8, num_attention_heads=2,
                    attention_head_dim=12, cross_attention_dim=24,
                    num_layers=2, caption_channels=20)
        base.update(overrides)
        return cls(**base)
