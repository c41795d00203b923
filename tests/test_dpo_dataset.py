"""DPO V2 pair-construction semantics (reference VideoAsPromptDPOV2Dataset,
finetrainers/data/dataset.py:839-1174): staged curriculum thresholds,
ref-pool fallback, score-bin frequency reweighting — VERDICT r2 missing #3
(a reference user's vap_data.csv must drive DPO without precomputed pairs)."""

import json
import math
import os

import numpy as np
import pytest

import vap_tpu.data.dataset as ds_mod
from vap_tpu.data.dataset import DPO_STAGE_SCHEDULE, VideoAsPromptDPODataset


def _write_csv(tmp_path, rows):
    import pandas as pd

    df = pd.DataFrame(rows)
    df.to_csv(tmp_path / "vap_data.csv", index=False)
    return tmp_path


def _make_rows(n_per_kind=8, kinds=("explode", "melt")):
    """Scores spread over 0..100 with guaranteed pool coverage per kind."""
    scores = [100, 95, 85, 60, 40, 25, 10, 0]
    rows = []
    for kind in kinds:
        for i, s in enumerate(scores[:n_per_kind]):
            name = f"{kind}_{i}.mp4"
            rows.append({
                "video_paths": name,
                "tar_video_caption": f"cap {name}",
                "ref_video_paths": json.dumps([f"{kind}_0.mp4"]),
                "kind": kind,
                "split": "train",
                "reference_alignment_score": float(s),
            })
    return rows


@pytest.fixture
def dpo_ds(tmp_path, monkeypatch):
    root = _write_csv(tmp_path, _make_rows())
    # pair construction is what is under test — skip real video IO
    monkeypatch.setattr(ds_mod, "_decode_resampled",
                        lambda path: np.zeros((2, 4, 4, 3), np.float32))
    return VideoAsPromptDPODataset(
        str(root), meta_df_name="vap_data.csv", infinite=True,
        mask_caption_ratio=0.0, seed=0)


def test_stage1_thresholds(dpo_ds):
    """Epoch 0-1: win score >= 90, lose <= 10 (stage_schedule[0])."""
    score = dpo_ds.score_by_path
    it = iter(dpo_ds)
    for _ in range(24):
        s = next(it)
        pair = s["_pair"] if "_pair" in s else None
        # recover the chosen pair from captions (cap <name>)
        win = s["caption"].split()[-1]
        lose = s["caption_lose"].split()[-1]
        ref = s["caption_mot_ref"][0].split()[-1]
        assert score[win] >= 90, (win, score[win])
        assert score[lose] <= 10, (lose, score[lose])
        assert score[ref] == 100 or 80 < score[ref] < 100
        assert win != lose
        assert ref not in (win, lose)
        if dpo_ds._current_stage() is not DPO_STAGE_SCHEDULE[0]:
            break


def test_stage2_thresholds(dpo_ds):
    """After 2 epochs the curriculum widens to win >= 80 / lose <= 30."""
    score = dpo_ds.score_by_path
    dpo_ds._sample_index = 2 * len(dpo_ds)  # jump to stage 2
    assert dpo_ds._current_stage() == DPO_STAGE_SCHEDULE[1]
    it = iter(dpo_ds)
    seen_mid_lose = False
    for _ in range(48):
        s = next(it)
        win = s["caption"].split()[-1]
        lose = s["caption_lose"].split()[-1]
        assert score[win] >= 80
        assert score[lose] <= 30
        seen_mid_lose = seen_mid_lose or 10 < score[lose] <= 30
    # the widened lose pool (scores in (10, 30]) is actually sampled
    assert seen_mid_lose


def test_pair_weight_formula(dpo_ds):
    """weight = ((|s0-s1| * beta) / max(sqrt(p0*p1), eps)) ** alpha with p =
    score-bin frequency (reference :974-1035, :1127-1135)."""
    d = dpo_ds
    # score-0 rows are filtered (threshold 0 is strict, like the reference's
    # filter_and_update_refs), leaving 14 videos; each decade bin holds 2
    win, lose = "explode_0.mp4", "explode_6.mp4"  # scores 100, 10
    p = 2.0 / 14.0
    expect = ((90.0 * d.beta) / max(math.sqrt(p * p), d.prob_eps)) ** d.alpha
    assert d._pair_weight(win, lose) == pytest.approx(expect)
    # and it reaches the emitted sample
    it = iter(d)
    s = next(it)
    w = s["dpo_weight"]
    assert w > 0
    d2 = VideoAsPromptDPODataset(
        d.root, meta_df_name="vap_data.csv", infinite=True,
        mask_caption_ratio=0.0, seed=0, reweight=False)
    assert next(iter(d2))["dpo_weight"] == 1.0


def test_row_multiple_of_48_truncation(tmp_path, monkeypatch):
    """>= 16 train rows are truncated to a multiple of 48 (reference
    :921-923); fewer rows are kept as-is."""
    monkeypatch.setattr(ds_mod, "_decode_resampled",
                        lambda path: np.zeros((2, 4, 4, 3), np.float32))
    # 13 kinds x 8 rows = 104; the 13 score-0 rows are filtered -> 91 ->
    # truncated to the largest multiple of 48 -> 48
    rows = _make_rows(n_per_kind=8, kinds=tuple(f"k{i}" for i in range(13)))
    root = _write_csv(tmp_path, rows)
    d = VideoAsPromptDPODataset(str(root), meta_df_name="vap_data.csv", seed=0)
    assert len(d) == 48
    small = VideoAsPromptDPODataset(
        str(_write_csv(tmp_path, _make_rows(n_per_kind=4, kinds=("a",)))),
        meta_df_name="vap_data.csv", seed=0)
    assert len(small) == 4


def test_explicit_pair_columns_fast_path(tmp_path, monkeypatch):
    monkeypatch.setattr(ds_mod, "_decode_resampled",
                        lambda path: np.zeros((2, 4, 4, 3), np.float32))
    rows = [{
        "video_paths": "a.mp4", "win_video_paths": "a.mp4",
        "lose_video_paths": "b.mp4", "dpo_weight": 0.5,
        "tar_video_caption": "cap a.mp4",
        "ref_video_paths": json.dumps(["c.mp4"]),
        "kind": "explode", "split": "train",
        "reference_alignment_score": 100.0,
    }, {
        "video_paths": "c.mp4", "win_video_paths": "c.mp4",
        "lose_video_paths": "a.mp4", "dpo_weight": 1.5,
        "tar_video_caption": "cap c.mp4",
        "ref_video_paths": json.dumps(["a.mp4"]),
        "kind": "explode", "split": "train",
        "reference_alignment_score": 90.0,
    }]
    root = _write_csv(tmp_path, rows)
    d = VideoAsPromptDPODataset(str(root), meta_df_name="vap_data.csv",
                                mask_caption_ratio=0.0, seed=0)
    s = next(iter(d))
    assert "video_lose" in s
    assert s["dpo_weight"] in (0.5, 1.5)


def test_resume_state_roundtrip(dpo_ds):
    it = iter(dpo_ds)
    for _ in range(5):
        next(it)
    state = dpo_ds.state_dict()
    a = [next(it) for _ in range(3)]

    d2 = VideoAsPromptDPODataset(
        dpo_ds.root, meta_df_name="vap_data.csv", infinite=True,
        mask_caption_ratio=0.0, seed=0)
    d2.load_state_dict(state)
    b = [next(iter(d2)) for _ in range(3)]
    for x, y in zip(a, b):
        assert x["caption"] == y["caption"]
        assert x["caption_lose"] == y["caption_lose"]
        assert x["dpo_weight"] == y["dpo_weight"]


def test_stage_advances_across_epochs(dpo_ds):
    """Code-review r3: the base iterator reset _sample_index each epoch, so
    epoch = _sample_index // n was stuck at 0 and the curriculum never
    advanced. Iterating past 2 epochs must reach stage 2 naturally."""
    n = len(dpo_ds)
    it = iter(dpo_ds)
    for _ in range(2 * n + 1):
        next(it)
    assert dpo_ds._current_stage() == DPO_STAGE_SCHEDULE[1]


def test_truncation_is_global_not_per_shard(tmp_path, monkeypatch):
    """Code-review r3: truncating shard-local rows could empty a 16-47-row
    shard and leave its infinite iterator spinning forever."""
    monkeypatch.setattr(ds_mod, "_decode_resampled",
                        lambda path: np.zeros((2, 4, 4, 3), np.float32))
    rows = _make_rows(n_per_kind=8, kinds=tuple(f"k{i}" for i in range(13)))
    root = _write_csv(tmp_path, rows)
    # 91 usable rows globally -> truncate to 48 -> shard 0/4 gets 12 rows
    shards = [VideoAsPromptDPODataset(str(root), meta_df_name="vap_data.csv",
                                      seed=0, shard_index=i, num_shards=4)
              for i in range(4)]
    assert sum(len(s) for s in shards) == 48
    assert all(len(s) == 12 for s in shards)
