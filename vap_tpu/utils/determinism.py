"""Determinism helpers.

The reference seeds torch/python/DTensor RNG per mesh with per-PP-rank offsets
(finetrainers/utils/torch.py:175-228). JAX is deterministic by construction
given explicit PRNG keys; this helper covers the host-side RNGs (dataset
shuffling, frame selection) and returns the root key for device-side use.
"""

from __future__ import annotations

import random

import numpy as np


def enable_determinism(seed: int, process_index: int = 0):
    """Seed host RNGs (optionally offset per process, mirroring the per-rank
    offsets of the reference) and return the root jax PRNG key."""
    import jax

    effective = seed + process_index
    random.seed(effective)
    np.random.seed(effective % (2 ** 32))
    return jax.random.PRNGKey(seed)
