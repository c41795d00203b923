"""Aesthetic-predictor head: golden parity vs the torch Sequential layout
(the LAION improved-aesthetic-predictor architecture) + CLIPScorer metrics
integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.eval import (
    aesthetic_head,
    convert_aesthetic_state_dict,
    init_aesthetic,
    video_aesthetic_score,
)


def _torch_predictor(embed_dim=12):
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    # same Sequential indices as the released predictor: Linear layers at
    # 0/2/4/6/7 with Dropouts between (eval-mode no-ops)
    return nn.Sequential(
        nn.Linear(embed_dim, 10), nn.Dropout(0.2),
        nn.Linear(10, 8), nn.Dropout(0.2),
        nn.Linear(8, 6), nn.Dropout(0.1),
        nn.Linear(6, 4), nn.Linear(4, 1),
    ).eval()


def test_aesthetic_head_golden_parity(torch_reference):
    import torch

    m = _torch_predictor()
    params = convert_aesthetic_state_dict(
        {k: v.numpy() for k, v in m.state_dict().items()})
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((5, 12)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    with torch.no_grad():
        ref = m(torch.from_numpy(emb)).numpy()[:, 0]
    with jax.default_device(jax.devices("cpu")[0]):
        out = aesthetic_head(params, jnp.asarray(emb))
        vid = float(video_aesthetic_score(params, jnp.asarray(emb)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)
    assert np.isclose(vid, ref.mean() / 10.0, atol=1e-5)


def test_convert_rejects_foreign_state_dict():
    with pytest.raises(ValueError):
        convert_aesthetic_state_dict({"not_layers.0.weight": np.zeros((1, 1))})


def test_clip_scorer_aesthetic_metrics():
    pytest.importorskip("cv2")
    from tests.test_clip_score import FakeTokenizer
    from vap_tpu.eval import CLIPScoreConfig, CLIPScorer, init_clip_score

    cfg = CLIPScoreConfig.tiny()
    key = jax.random.PRNGKey(3)
    params = init_clip_score(key, cfg)
    aest = init_aesthetic(jax.random.fold_in(key, 1), embed_dim=cfg.projection_dim,
                          widths=(6, 1))
    scorer = CLIPScorer(params, cfg, FakeTokenizer(cfg.text.eos_token_id,
                                                   cfg.text.vocab_size),
                        aesthetic_params=aest)
    frames = np.random.default_rng(5).uniform(0, 1, (3, 36, 36, 3)).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        m = scorer.score_video_metrics(frames, "a caption")
        s = scorer.score_video(frames, "a caption")
    assert set(m) == {"clip_score", "aesthetic_quality"}
    assert np.isclose(m["clip_score"], s)
    assert np.isfinite(m["aesthetic_quality"])
