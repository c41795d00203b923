"""Aesthetic-quality evaluation — the LAION aesthetic predictor head.

The reference's benchmark table (reference README.md:73-81) reports
"Aesthetic Quality 57.71" via VBench, whose aesthetic_quality dimension is
the LAION improved-aesthetic-predictor: a small MLP regression head on
L2-normalized CLIP ViT-L/14 image embeddings, scored per frame, averaged
over the video, and divided by 10 into [0, 1] (VBench reports it x100).

This module is the head only; the CLIP embedding comes from
vap_tpu.eval.clip_score.clip_image_embed (already L2-normalized). The other
two VBench metrics in the reference table — Motion Smoothness (AMT
frame-interpolation model) and Dynamic Degree (RAFT optical flow) — need
third-party video models with no JAX ports and are intentionally out of
scope; CLIP score + aesthetic quality are the two that reduce to the
framework's own encoders.

Weights: https://github.com/christophschuhmann/improved-aesthetic-predictor
(sac+logos+ava1-l14-linearMSE.pth) — a torch nn.Sequential of
Linear(768,1024)/Dropout/Linear(1024,128)/Dropout/Linear(128,64)/Dropout/
Linear(64,16)/Linear(16,1); state-dict keys "layers.{0,2,4,6,7}.{weight,bias}".
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
Params = List[Tuple[Array, Array]]


def convert_aesthetic_state_dict(sd: Dict[str, Any], dtype=jnp.float32) -> Params:
    """torch state dict (Sequential "layers.N.weight"/"layers.N.bias", torch
    [out, in] layout) -> list of (kernel [in, out], bias [out]) in layer order."""
    # released checkpoint nests the Sequential as "layers.N.*"; a bare
    # Sequential state dict uses "N.*" — accept both
    flat = {k[len("layers."):] if k.startswith("layers.") else k: v
            for k, v in sd.items()}
    idxs = sorted({int(k.split(".")[0]) for k in flat
                   if k.split(".")[0].isdigit() and k.endswith(".weight")})
    if not idxs:
        raise ValueError(
            f"no '[layers.]N.weight' keys in state dict (got {sorted(sd)[:5]}...)")
    return [
        (jnp.asarray(np.asarray(flat[f"{i}.weight"]).T, dtype),
         jnp.asarray(np.asarray(flat[f"{i}.bias"]), dtype))
        for i in idxs
    ]


def init_aesthetic(key, embed_dim: int = 768,
                   widths: Tuple[int, ...] = (1024, 128, 64, 16, 1),
                   dtype=jnp.float32) -> Params:
    import jax

    params = []
    d = embed_dim
    for i, w in enumerate(widths):
        k = jax.random.fold_in(key, i)
        params.append((jax.random.normal(k, (d, w), dtype) * d ** -0.5,
                       jnp.zeros((w,), dtype)))
        d = w
    return params


def aesthetic_head(params: Params, embeds: Array) -> Array:
    """L2-normalized CLIP image embeddings [B, D] -> raw predictor scores [B]
    (typically ~[0, 10]). Dropout layers are eval-mode no-ops; every Linear
    except the last is followed by nothing (the predictor is linear stacks
    without activations, matching the released Sequential)."""
    x = embeds
    for kernel, bias in params:
        x = x @ kernel + bias
    return x[..., 0]


def video_aesthetic_score(params: Params, embeds: Array) -> Array:
    """Frame embeddings [F, D] -> scalar VBench-style aesthetic quality in
    [0, 1]: mean raw score over frames / 10."""
    return jnp.mean(aesthetic_head(params, embeds)) / 10.0
