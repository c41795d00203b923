"""Resolution-bucketed batching (mirrors finetrainers ResolutionSampler,
data/sampler.py:17-60): buffer (condition, latent) pairs keyed by latent
spatial shape, emit a batch when a bucket fills."""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


class ResolutionSampler:
    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self._buckets: Dict[Tuple, List[Tuple[Any, Any]]] = {}
        self._ready_key = None

    def consume(self, condition: Dict[str, Any], latent: Dict[str, Any]):
        # Bucket by EVERY tensor shape, not just the latent spatial dims:
        # conditions can be variable-length too (CogView4's GLM embeds pad
        # 'longest' to a per-caption multiple of 16), and collate
        # concatenates — mixed shapes in one bucket would crash mid-training.
        def shapes(d):
            return tuple(sorted(
                (k, tuple(np.asarray(v).shape))
                for k, v in d.items()
                if isinstance(v, np.ndarray) or hasattr(v, "shape")))

        key = (shapes(latent), shapes(condition))
        self._buckets.setdefault(key, []).append((condition, latent))
        if len(self._buckets[key]) >= self.batch_size:
            self._ready_key = key

    @property
    def is_ready(self) -> bool:
        return self._ready_key is not None

    def get_batch(self) -> Tuple[List[Any], List[Any]]:
        key = self._ready_key
        items = self._buckets.pop(key)[: self.batch_size]
        self._ready_key = None
        conditions = [c for c, _ in items]
        latents = [l for _, l in items]
        return conditions, latents


def collate_tensor_dicts(dicts: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack dict-of-array samples along a new batch axis (lists pass through)."""
    out: Dict[str, Any] = {}
    for k in dicts[0]:
        v0 = dicts[0][k]
        if isinstance(v0, np.ndarray) or hasattr(v0, "shape"):
            out[k] = np.concatenate([np.asarray(d[k]) for d in dicts], axis=0)
        else:
            out[k] = [d[k] for d in dicts]
    return out
