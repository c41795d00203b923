"""Streamed (chunked per-layer) transformer offload for inference.

TPU-native analog of the reference's `pipe.enable_sequential_cpu_offload()`
tier (reference README.md:202-260: CogVideoX 40 GB -> ~7.5 GB, Wan 64 GB ->
~8 GB on A100 by loading ONE LAYER at a time). Module-level offload
(pipelines/offload.py) caps peak HBM at the largest component — but a 14B
bf16 Wan transformer (~28 GB) does not fit a 16 GB v5e even alone. This
module streams the BLOCK STACK through HBM in chunks instead:

- the transformer's non-block parameters (embedders + output heads, ~2% of
  weights) stay resident for the whole denoise;
- the stacked block segments are pre-sliced on the host into chunks of
  `chunk_blocks`; each forward stages chunk c+1 with an async `device_put`
  BEFORE running chunk c, so the host->HBM transfer of the next chunk
  overlaps the current chunk's compute (double buffering);
- peak HBM = resident params + 2 chunks + activations. For Wan-14B at
  chunk_blocks=4 that is ~1 GB + 2x2.6 GB + ~2 GB ≈ 8 GB — the reference's
  sequential-offload figure, at full bf16 precision.

The cost is weight traffic: the full stack crosses the host link every
denoise step (50 x 28 GB for the 14B default). Like the reference's
sequential offload this trades wall-clock for memory; prefer multi-chip
sharding (`docs/SHARDING.md`) when more chips exist, and W8A8 storage to
halve both the footprint and the traffic.

The per-chunk forwards reuse the transformers' prologue / run-segment /
epilogue decompositions (models/wan/transformer_mot.py,
models/cogvideox/transformer_mot.py), so the streamed path shares one
implementation with the monolithic forwards. `StreamedWanTransformer` /
`StreamedCogTransformer` are drop-in callables for the respective
`*_forward` functions.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax

from ..models.cogvideox.transformer_mot import (
    cog_epilogue,
    cog_prologue,
    cog_run_segment,
)
from ..models.wan.transformer_mot import (
    wan_epilogue,
    wan_prologue,
    wan_run_segment,
)

Params = Dict[str, Any]


def _slice_chunks(host_params: Params, cfg, chunk_blocks: int, mot: bool):
    """Pre-slice the stacked block segments into (has_mot, host_subtree)
    chunks — one host copy at init, device_put per use."""
    if chunk_blocks < 1:
        raise ValueError(f"chunk_blocks must be >= 1 (got {chunk_blocks})")
    chunks = []
    segments = host_params["blocks"]
    seg_meta = cfg.mot_segments if mot else [(None, None, False)] * len(segments)
    for (_, _, has_mot), seg in zip(seg_meta, segments):
        length = jax.tree.leaves(seg)[0].shape[0]
        for s in range(0, length, chunk_blocks):
            e = min(s + chunk_blocks, length)
            chunks.append((bool(has_mot), jax.tree.map(lambda x: x[s:e], seg)))
    return chunks


@functools.partial(jax.jit, static_argnames=("cfg", "mot", "r"))
def _prologue_jit(params, cfg, mot, r, hidden_states, timestep,
                  encoder_hidden_states, encoder_hidden_states_image,
                  hidden_states_mot_ref, timestep_mot_ref,
                  encoder_hidden_states_mot_ref,
                  encoder_hidden_states_image_mot_ref):
    return wan_prologue(
        params, cfg, hidden_states=hidden_states, timestep=timestep,
        encoder_hidden_states=encoder_hidden_states,
        encoder_hidden_states_image=encoder_hidden_states_image,
        hidden_states_mot_ref=hidden_states_mot_ref,
        timestep_mot_ref=timestep_mot_ref,
        encoder_hidden_states_mot_ref=encoder_hidden_states_mot_ref,
        encoder_hidden_states_image_mot_ref=encoder_hidden_states_image_mot_ref,
        num_mot_ref=r, mot=mot)


@functools.partial(jax.jit, static_argnames=("cfg", "has_mot", "r"))
def _segment_jit(seg_params, carry, aux, cfg, has_mot, r):
    return wan_run_segment(seg_params, cfg, has_mot, carry, aux, num_mot_ref=r)


@functools.partial(jax.jit, static_argnames=("cfg", "ppf", "pph", "ppw", "r"))
def _epilogue_jit(params, carry, aux, cfg, ppf, pph, ppw, r):
    return wan_epilogue(params, cfg, carry, aux, ppf, pph, ppw, num_mot_ref=r)


class StreamedWanTransformer:
    """Callable with the wan_(mot_)forward signature that streams the block
    stack through device memory. `host_params` must live on host (build the
    pipeline under jax.default_device(cpu), as enable_model_offload does)."""

    def __init__(self, host_params: Params, cfg, chunk_blocks: int, *,
                 mot: bool, num_mot_ref: int = 1):
        self.cfg = cfg
        self.mot = mot
        self.r = num_mot_ref
        self._resident_host = {k: v for k, v in host_params.items() if k != "blocks"}
        self._resident = None  # staged lazily, freed via release()
        self.chunks: List[Tuple[bool, Params]] = _slice_chunks(
            host_params, cfg, chunk_blocks, mot)
        # observability for tests and memory accounting
        self.max_staged = 0
        self.num_forwards = 0

    def release(self):
        """Drop the device-resident copies (end of the denoise phase)."""
        self._resident = None

    def __call__(self, params_ignored=None, cfg_ignored=None, *, hidden_states,
                 timestep, encoder_hidden_states,
                 encoder_hidden_states_image=None, hidden_states_mot_ref=None,
                 timestep_mot_ref=None, encoder_hidden_states_mot_ref=None,
                 encoder_hidden_states_image_mot_ref=None, num_mot_ref: int = 1,
                 remat: bool = False):
        cfg = self.cfg
        _, f, h, w, _ = hidden_states.shape
        pt, ph, pw = cfg.patch_size
        ppf, pph, ppw = f // pt, h // ph, w // pw
        if self._resident is None:
            self._resident = jax.device_put(self._resident_host)

        carry, aux = _prologue_jit(
            self._resident, cfg, self.mot, self.r, hidden_states, timestep,
            encoder_hidden_states, encoder_hidden_states_image,
            hidden_states_mot_ref, timestep_mot_ref,
            encoder_hidden_states_mot_ref, encoder_hidden_states_image_mot_ref)

        carry = self._stream_blocks(_segment_jit, carry, aux)
        self.num_forwards += 1
        return _epilogue_jit(self._resident, carry, aux, cfg, ppf, pph, ppw, self.r)

    def _stream_blocks(self, segment_jit, carry, aux):
        staged_next = jax.device_put(self.chunks[0][1])
        for i, (has_mot, _) in enumerate(self.chunks):
            staged = staged_next
            if i + 1 < len(self.chunks):
                # async: the next chunk's host->HBM DMA overlaps this
                # chunk's compute
                staged_next = jax.device_put(self.chunks[i + 1][1])
                self.max_staged = max(self.max_staged, 2)
            else:
                staged_next = None
                self.max_staged = max(self.max_staged, 1)
            carry = segment_jit(staged, carry, aux, self.cfg, has_mot, self.r)
            staged = None  # free this chunk's HBM before the next iteration
        return carry


@functools.partial(jax.jit, static_argnames=("cfg", "mot", "r"))
def _cog_prologue_jit(params, cfg, mot, r, hidden_states, encoder_hidden_states,
                      timestep, image_rotary_emb, hidden_states_mot_ref,
                      encoder_hidden_states_mot_ref, image_rotary_emb_mot_ref,
                      timestep_mot_ref, effect_ids, ofs):
    return cog_prologue(
        params, cfg, hidden_states=hidden_states,
        encoder_hidden_states=encoder_hidden_states, timestep=timestep,
        image_rotary_emb=image_rotary_emb,
        hidden_states_mot_ref=hidden_states_mot_ref,
        encoder_hidden_states_mot_ref=encoder_hidden_states_mot_ref,
        image_rotary_emb_mot_ref=image_rotary_emb_mot_ref, num_mot_ref=r,
        timestep_mot_ref=timestep_mot_ref, effect_ids=effect_ids, ofs=ofs,
        mot=mot)


@functools.partial(jax.jit, static_argnames=("cfg", "has_mot", "r"))
def _cog_segment_jit(seg_params, carry, aux, cfg, has_mot, r):
    return cog_run_segment(seg_params, cfg, has_mot, carry, aux, num_mot_ref=r)


@functools.partial(jax.jit, static_argnames=("cfg", "num_frames", "height",
                                             "width", "r"))
def _cog_epilogue_jit(params, carry, aux, cfg, num_frames, height, width, r):
    return cog_epilogue(params, cfg, carry, aux, num_frames, height, width,
                        num_mot_ref=r)


class StreamedCogTransformer(StreamedWanTransformer):
    """CogVideoX variant of the streamed runner — the reference's own
    sequential-offload example (README.md:202-260: CogVideoX 40 GB ->
    ~7.5 GB). `mot=False` is the single-branch/plain trunk path."""

    def __call__(self, params_ignored=None, cfg_ignored=None, *, hidden_states,
                 encoder_hidden_states, timestep, image_rotary_emb,
                 hidden_states_mot_ref=None, encoder_hidden_states_mot_ref=None,
                 image_rotary_emb_mot_ref=None, num_mot_ref: int = 1,
                 timestep_mot_ref=None, effect_ids=None, ofs=None,
                 remat: bool = False, single_branch: bool = False):
        cfg = self.cfg
        _, num_frames, _, height, width = hidden_states.shape
        assert single_branch == (not self.mot), \
            "runner built for the other branch mode"
        if self._resident is None:
            self._resident = jax.device_put(self._resident_host)

        carry, aux = _cog_prologue_jit(
            self._resident, cfg, self.mot, self.r, hidden_states,
            encoder_hidden_states, timestep, image_rotary_emb,
            hidden_states_mot_ref, encoder_hidden_states_mot_ref,
            image_rotary_emb_mot_ref, timestep_mot_ref, effect_ids, ofs)
        carry = self._stream_blocks(_cog_segment_jit, carry, aux)
        self.num_forwards += 1
        return _cog_epilogue_jit(self._resident, carry, aux, cfg,
                                 num_frames, height, width, self.r)
