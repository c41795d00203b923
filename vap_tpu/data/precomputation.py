"""Condition/latent precomputation.

Mirrors finetrainers/data/precomputation.py: an in-memory preprocessor that
buffers `num_items` processed samples per rank, and an on-disk preprocessor
that writes .npz files once (optionally for the whole dataset,
`consume_once`) and replays them — so the T5/VAE encoders can be unloaded
during the training loop (the reference orchestrates load/unload around
passes, sft_trainer/trainer.py:1225-1318).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np


def _save_npz(path: str, data: Dict[str, Any]):
    arrays = {k: v for k, v in data.items() if isinstance(v, np.ndarray)}
    meta = {k: v for k, v in data.items() if not isinstance(v, np.ndarray)}
    np.savez(path, __meta__=np.asarray(repr(meta)), **arrays)


def _load_npz(path: str) -> Dict[str, Any]:
    import ast

    with np.load(path, allow_pickle=False) as z:
        out = {k: z[k] for k in z.files if k != "__meta__"}
        if "__meta__" in z.files:
            out.update(ast.literal_eval(str(z["__meta__"])))
    return out


class InMemoryPreprocessor:
    """Buffer `num_items` (condition, latent) pairs in host memory
    (InMemoryDistributedDataPreprocessor, precomputation.py:55-143)."""

    def __init__(self, data_iter: Iterator, prepare_conditions: Callable, prepare_latents: Callable,
                 num_items: int = 8):
        self._iter = data_iter
        self._prepare_conditions = prepare_conditions
        self._prepare_latents = prepare_latents
        self.num_items = num_items
        self._buffer: List = []

    def consume(self) -> List:
        self._buffer = []
        for _ in range(self.num_items):
            sample = next(self._iter)
            self._buffer.append((self._prepare_conditions(sample), self._prepare_latents(sample)))
        return self._buffer


class PrecomputedPreprocessor:
    """Write precomputed (condition, latent) .npz shards per rank, then replay.

    `consume_once=True` precomputes the entire (finite) dataset on the first
    pass and replays the cache forever after (precomputation.py:146-431).

    Reuse is gated on a cross-rank completeness manifest, matching the
    reference's rank-coordinated reuse validation
    (PrecomputedDistributedDataPreprocessor, precomputation.py:146-431):
    each rank records {count, signature, complete} in its manifest after a
    full pass, and `is_cached()` accepts the cache only when EVERY rank's
    manifest exists, its signature matches this run's, and the .npz files on
    disk agree with the recorded count — a corrupted or partially-written
    shard on any rank forces re-precompute instead of silent reuse."""

    MANIFEST = "manifest.json"

    def __init__(self, directory: str, rank: int = 0, world_size: int = 1,
                 reuse: bool = True, signature: Optional[Dict[str, Any]] = None):
        self.root = directory
        self.rank = rank
        self.world_size = max(1, world_size)
        self.signature = signature
        self.dir = os.path.join(directory, f"rank_{rank}")
        os.makedirs(self.dir, exist_ok=True)
        self.reuse = reuse

    def _rank_dir(self, rank: int) -> str:
        return os.path.join(self.root, f"rank_{rank}")

    def _npz_counts(self, rank: int) -> Dict[str, int]:
        d = self._rank_dir(rank)
        names = os.listdir(d) if os.path.isdir(d) else []
        return {"cond": sum(1 for f in names
                            if f.startswith("cond_") and f.endswith(".npz")),
                "lat": sum(1 for f in names
                           if f.startswith("lat_") and f.endswith(".npz"))}

    def _rank_complete(self, rank: int) -> bool:
        import json

        path = os.path.join(self._rank_dir(rank), self.MANIFEST)
        try:
            with open(path) as f:
                m = json.load(f)
        except (OSError, ValueError):
            return False
        if not m.get("complete"):
            return False
        if m.get("world_size") != self.world_size:
            # a cache produced under a different world size shards the
            # dataset differently — reusing a subset of its rank dirs would
            # silently drop (or duplicate) samples
            return False
        if self.signature is not None and m.get("signature") != self.signature:
            return False
        counts = self._npz_counts(rank)
        return counts["cond"] == counts["lat"] == m.get("count")

    def is_cached(self) -> bool:
        return self.reuse and all(
            self._rank_complete(r) for r in range(self.world_size))

    def precompute(self, data_iter: Iterator, prepare_conditions: Callable, prepare_latents: Callable,
                   max_items: Optional[int] = None):
        import json

        # stale shards must not leak into the replay (a signature change
        # reaches here with old files still on disk)
        for f in os.listdir(self.dir):
            if f.endswith(".npz") or f == self.MANIFEST:
                os.remove(os.path.join(self.dir, f))
        count = 0
        for sample in data_iter:
            cond = prepare_conditions(sample)
            lat = prepare_latents(sample)
            _save_npz(os.path.join(self.dir, f"cond_{count:06d}.npz"), cond)
            _save_npz(os.path.join(self.dir, f"lat_{count:06d}.npz"), lat)
            count += 1
            if max_items and count >= max_items:
                break
        manifest = {"complete": True, "count": count, "rank": self.rank,
                    "world_size": self.world_size, "signature": self.signature}
        tmp = os.path.join(self.dir, self.MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.dir, self.MANIFEST))
        return count

    def __iter__(self):
        files = sorted(f for f in os.listdir(self.dir) if f.startswith("cond_"))
        for f in files:
            idx = f[len("cond_"):-len(".npz")]
            cond = _load_npz(os.path.join(self.dir, f))
            lat = _load_npz(os.path.join(self.dir, f"lat_{idx}.npz"))
            yield cond, lat

    def __len__(self):
        return len([f for f in os.listdir(self.dir) if f.startswith("cond_")])
