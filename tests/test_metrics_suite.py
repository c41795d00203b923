"""VideoMetricsSuite — the one-object five-metric surface (suite.py),
CLIPScorer.alignment_score semantics, and RAFTConfig shape inference."""

import numpy as np
import pytest

import jax

from vap_tpu.eval import CLIPScoreConfig, CLIPScorer, VideoMetricsSuite, init_clip_score
from vap_tpu.eval.flow_metrics import FlowMetrics
from vap_tpu.eval.raft import RAFTConfig, init_raft

from test_clip_score import FakeTokenizer


def _scorer():
    cfg = CLIPScoreConfig.tiny()
    params = init_clip_score(jax.random.PRNGKey(3), cfg)
    return CLIPScorer(params, cfg, FakeTokenizer(cfg.text.eos_token_id,
                                                 cfg.text.vocab_size))


def _flow():
    cfg = RAFTConfig.tiny()
    return FlowMetrics(init_raft(jax.random.PRNGKey(0), cfg), cfg, iters=2)


def _video(seed, f=5, h=24, w=32):
    return np.random.RandomState(seed).randint(
        0, 256, size=(f, h, w, 3)).astype(np.uint8)


def test_alignment_score_self_is_high():
    s = _scorer()
    vid = _video(1)
    self_score = s.alignment_score(vid, vid)
    other = s.alignment_score(vid, 255 - _video(2))
    assert 0.0 <= other <= self_score <= 100.0
    assert self_score > 90.0  # frames vs their own mean embedding


def test_suite_all_five_metrics():
    suite = VideoMetricsSuite(_scorer(), _flow())
    per = [suite.score_video(_video(i), caption="a cat", fps=8.0,
                             ref_frames=_video(10 + i)) for i in range(2)]
    for m in per:
        assert {"clip_score", "alignment_score", "dynamic",
                "motion_smoothness"} <= set(m)
    table = VideoMetricsSuite.summarize(per)
    assert {"clip_score", "alignment_score", "motion_smoothness",
            "dynamic_degree"} <= set(table)
    assert table["dynamic_degree"] in (0.0, 50.0, 100.0)
    rendered = VideoMetricsSuite.format_table(table)
    assert "reference 77.08" in rendered and "clip_score" in rendered


def test_suite_partial_capabilities():
    flow_only = VideoMetricsSuite(flow_metrics=_flow())
    m = flow_only.score_video(_video(3), caption="ignored", fps=8.0)
    assert "clip_score" not in m and "motion_smoothness" in m

    clip_only = VideoMetricsSuite(clip_scorer=_scorer())
    m = clip_only.score_video(_video(3), caption="a dog")
    assert "motion_smoothness" not in m and "clip_score" in m
    # too-short videos simply omit the flow metrics
    m = VideoMetricsSuite(_scorer(), _flow()).score_video(
        _video(4, f=2), caption="x", fps=8.0)
    assert "motion_smoothness" not in m and "clip_score" in m

    with pytest.raises(ValueError):
        VideoMetricsSuite()


def test_raft_config_from_state_dict_roundtrip():
    torch = pytest.importorskip("torch")
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_raft_ref import TorchRAFT

    for cfg in (RAFTConfig.tiny(), RAFTConfig.tiny(corr_levels=1, corr_radius=3,
                                                   hidden_dim=12, context_dim=4)):
        sd = {k: v.numpy() for k, v in TorchRAFT(cfg).state_dict().items()}
        # iters is not a checkpoint property — inferred configs keep the default
        got = RAFTConfig.from_state_dict(sd, iters=cfg.iters)
        assert got == cfg
    # DataParallel prefix tolerated
    sd_dp = {"module." + k: v for k, v in sd.items()}
    assert RAFTConfig.from_state_dict(sd_dp, iters=cfg.iters) == cfg


def test_raft_config_from_state_dict_things_shapes():
    """The published raft-things geometry (324 corr planes) factors to the
    real (levels=4, radius=4), not an aliased pair."""
    cfg = RAFTConfig.things()
    fake = {
        "update_block.encoder.convc1.weight": np.zeros(
            (cfg.motion_corr_c1, cfg.corr_planes, 1, 1)),
        "update_block.encoder.convc2.weight": np.zeros((cfg.motion_corr_c2, 1, 3, 3)),
        "update_block.encoder.convf1.weight": np.zeros((cfg.motion_flow_c1, 2, 7, 7)),
        "update_block.encoder.convf2.weight": np.zeros((cfg.motion_flow_c2, 1, 3, 3)),
        "update_block.encoder.conv.weight": np.zeros((cfg.motion_dim - 2, 1, 3, 3)),
        "update_block.gru.convz1.weight": np.zeros((cfg.hidden_dim, 1, 1, 5)),
        "update_block.flow_head.conv1.weight": np.zeros(
            (cfg.flow_head_hidden, cfg.hidden_dim, 3, 3)),
        "fnet.conv1.weight": np.zeros((cfg.encoder_stem, 3, 7, 7)),
        "fnet.conv2.weight": np.zeros((cfg.fnet_dim, 1, 1, 1)),
        "cnet.conv2.weight": np.zeros((cfg.hidden_dim + cfg.context_dim, 1, 1, 1)),
        **{f"fnet.layer{i}.0.conv1.weight": np.zeros((c, 1, 3, 3))
           for i, c in zip((1, 2, 3), cfg.encoder_channels)},
    }
    got = RAFTConfig.from_state_dict(fake)
    assert (got.corr_levels, got.corr_radius) == (4, 4)
    assert got == cfg
