"""Data layer: CSV dataset semantics, bucketing, dataloader, video IO."""

import json
import os

import numpy as np
import pytest

from vap_tpu.data.dataset import (
    VideoAsPromptDataset,
    VideoAsPromptValidationDataset,
    filter_and_update_refs,
)
from vap_tpu.data.dataloader import PrefetchingDataLoader
from vap_tpu.data.sampler import ResolutionSampler, collate_tensor_dicts
from vap_tpu.data.video import (
    export_to_video,
    get_resample_indices,
    load_video,
    normalize_video,
    resize_to_nearest_bucket,
)


def _make_dataset_dir(tmp_path, n=6):
    import pandas as pd

    vids = []
    for i in range(n):
        frames = (np.random.default_rng(i).uniform(0, 1, (12, 32, 48, 3)) * 255).astype(np.uint8)
        p = tmp_path / f"vid_{i}.mp4"
        export_to_video(frames, str(p), fps=16)
        vids.append(f"vid_{i}.mp4")

    rows = []
    for i, v in enumerate(vids):
        rows.append({
            "video_paths": v,
            "tar_video_caption": f"caption {i}",
            "ref_video_paths": json.dumps([vids[(i + 1) % n]]),
            "kind": "explode" if i % 2 == 0 else "melt",
            "split": "train",
            "reference_alignment_score": 10.0 if i != 3 else 1.0,  # row 3 filtered
        })
    pd.DataFrame(rows).to_csv(tmp_path / "vap_data.csv", index=False)
    return tmp_path


def test_filter_and_update_refs():
    rows = [
        {"video_paths": "a", "kind": "x", "reference_alignment_score": 9, "ref_video_paths": ["b"]},
        {"video_paths": "b", "kind": "x", "reference_alignment_score": 2, "ref_video_paths": ["a"]},
        {"video_paths": "c", "kind": "x", "reference_alignment_score": 8, "ref_video_paths": ["b"]},
    ]
    out = filter_and_update_refs(rows, alignment_score_threshold=5, seed=0)
    paths = {r["video_paths"] for r in out}
    assert paths == {"a", "c"}
    # refs pointing at the filtered row get re-sampled within the same kind
    for r in out:
        assert r["ref_video_paths"], r
        assert "b" not in r["ref_video_paths"]


def test_vap_dataset_iteration(tmp_path):
    root = _make_dataset_dir(tmp_path)
    ds = VideoAsPromptDataset(str(root), sample_ref_videos_num=1, mask_caption_ratio=0.0)
    samples = list(ds)
    assert len(samples) == 5  # row 3 filtered by alignment score
    s = samples[0]
    assert s["video"].ndim == 4 and s["video"].shape[-1] == 3
    assert -1.01 <= s["video"].min() and s["video"].max() <= 1.01
    assert len(s["ref_videos"]) == 1
    assert isinstance(s["caption"], str) and s["caption"]
    assert s["effect_types"][0] in ("explode", "melt")


def test_vap_dataset_resume(tmp_path):
    root = _make_dataset_dir(tmp_path)
    ds = VideoAsPromptDataset(str(root))
    it = iter(ds)
    next(it)
    next(it)
    state = ds.state_dict()
    assert state["sample_index"] == 2

    ds2 = VideoAsPromptDataset(str(root))
    ds2.load_state_dict(state)
    remaining = list(ds2)
    assert len(remaining) == 3


def test_dataset_sharding(tmp_path):
    root = _make_dataset_dir(tmp_path)
    d0 = VideoAsPromptDataset(str(root), shard_index=0, num_shards=2)
    d1 = VideoAsPromptDataset(str(root), shard_index=1, num_shards=2)
    assert len(d0) + len(d1) == 5
    assert not ({r["video_paths"] for r in d0.rows} & {r["video_paths"] for r in d1.rows})


def test_prefetching_dataloader(tmp_path):
    root = _make_dataset_dir(tmp_path)
    ds = VideoAsPromptDataset(str(root))
    dl = PrefetchingDataLoader(ds, prefetch=2)
    assert len(list(dl)) == 5
    assert "dataset" in dl.state_dict()


def test_resolution_sampler():
    s = ResolutionSampler(batch_size=2)
    a = {"latents": np.zeros((1, 2, 4, 4, 4))}
    b = {"latents": np.zeros((1, 3, 4, 4, 4))}  # different bucket
    s.consume({"c": 1}, a)
    assert not s.is_ready
    s.consume({"c": 2}, b)
    s.consume({"c": 3}, dict(a))
    assert s.is_ready
    conds, lats = s.get_batch()
    assert [c["c"] for c in conds] == [1, 3]
    batch = collate_tensor_dicts(lats)
    assert batch["latents"].shape[0] == 2


def test_video_io_roundtrip(tmp_path):
    frames = (np.random.default_rng(0).uniform(0, 1, (8, 32, 48, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "t.mp4")
    export_to_video(frames, p, fps=16)
    loaded, fps = load_video(p)
    assert loaded.shape == frames.shape
    assert abs(fps - 16) < 0.5


def test_resample_and_buckets():
    idx = get_resample_indices(total_frames=32, original_fps=32, target_fps=16)
    assert len(idx) == 16
    frames = np.zeros((60, 100, 200, 3), np.float32)  # aspect 0.5
    out, first_only = resize_to_nearest_bucket(frames, [(49, 60, 120), (49, 100, 100)])
    assert out.shape == (49, 60, 120, 3)
    assert not first_only


def test_native_decoder_matches_cv2(tmp_path):
    from vap_tpu import native

    if not native.available():
        pytest.skip("native decoder not built")
    frames = (np.random.default_rng(3).uniform(0, 1, (10, 64, 96, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "n.mp4")
    export_to_video(frames, p, fps=16)

    import cv2

    cap = cv2.VideoCapture(p)
    ref = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        ref.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    ref = np.stack(ref)

    got = native.decode_video(p)
    np.testing.assert_array_equal(got, ref)
    sel = native.decode_video(p, indices=[0, 4, 9], out_h=32, out_w=48)
    assert sel.shape == (3, 32, 48, 3)
    batch = native.decode_batch([p, p], [None, [1, 2]], 64, 96, nthreads=2)
    assert batch[0].shape[0] == 10 and batch[1].shape[0] == 2


# ---------------------------------------------------------------------------
# frames_selection (reference functional/video.py:66-126)
# ---------------------------------------------------------------------------

def test_frames_selection_modes():
    frames = np.arange(9, dtype=np.uint8).reshape(9, 1, 1, 1) * np.ones(
        (9, 4, 4, 3), np.uint8)
    buckets = ((5, 4, 4),)
    ev, _ = resize_to_nearest_bucket(frames, buckets, "evenly")
    assert list(ev[:, 0, 0, 0].astype(int)) == [0, 2, 4, 6, 8]
    fi, _ = resize_to_nearest_bucket(frames, buckets, "first")
    assert list(fi[:, 0, 0, 0].astype(int)) == [0, 1, 2, 3, 4]
    import random

    ra, _ = resize_to_nearest_bucket(frames, buckets, "random", rng=random.Random(0))
    vals = list(ra[:, 0, 0, 0].astype(int))
    assert vals == list(range(vals[0], vals[0] + 5))  # contiguous window
    with pytest.raises(ValueError):
        resize_to_nearest_bucket(frames, buckets, "center")


# ---------------------------------------------------------------------------
# --dataset_config -> dataset construction (reference trainer.py:327-389)
# ---------------------------------------------------------------------------

def _args_stub(tmp_path, **kw):
    from vap_tpu.training.args import TrainingArgs

    base = dict(data_root=str(tmp_path), training_type="video_as_prompt_mot",
                output_dir=str(tmp_path / "out"))
    base.update(kw)
    return TrainingArgs(**base)


def test_dataset_config_vap_with_annotations(tmp_path):
    from vap_tpu.data.config import build_datasets_from_config

    _make_dataset_dir(tmp_path)
    cfg = {"datasets": [{
        "dataset_type": "video",
        "video_resolution_buckets": [[5, 16, 16]],
        "frames_selection": "first",
        "reshape_mode": "bicubic",
        "meta_df_name": "vap_data.csv",
    }]}
    path = tmp_path / "training.json"
    path.write_text(json.dumps(cfg))
    ds = build_datasets_from_config(str(path), _args_stub(tmp_path), family="cogvideox")
    sample = next(iter(ds))
    # VAP sample (training type drives the kind) + per-dataset annotations
    assert "ref_videos" in sample
    assert sample["_resolution_buckets"] == ((5, 16, 16),)
    assert sample["_frames_selection"] == "first"
    # stateful: resume round-trips through the wrapper
    state = ds.state_dict()
    ds.load_state_dict(state)


def test_dataset_config_combined_and_generic(tmp_path):
    from vap_tpu.data.config import build_datasets_from_config
    from vap_tpu.data.generic import CombinedDataset

    root_a = tmp_path / "a"
    root_b = tmp_path / "b"
    for root in (root_a, root_b):
        root.mkdir()
        for i in range(2):
            frames = (np.random.default_rng(i).uniform(0, 1, (6, 16, 16, 3)) * 255
                      ).astype(np.uint8)
            export_to_video(frames, str(root / f"v{i}.mp4"), fps=16)
            (root / f"v{i}.txt").write_text(f"cap {i}")
    cfg = {"datasets": [
        {"data_root": str(root_a), "dataset_type": "video",
         "video_resolution_buckets": [[5, 16, 16]]},
        {"data_root": str(root_b), "dataset_type": "video"},
    ]}
    path = tmp_path / "training.json"
    path.write_text(json.dumps(cfg))
    args = _args_stub(tmp_path, training_type="sft")
    ds = build_datasets_from_config(str(path), args, family="ltx_video")
    assert isinstance(ds, CombinedDataset)
    sample = next(iter(ds))
    assert "video" in sample and "caption" in sample


def test_dataset_config_unknown_key_raises(tmp_path):
    from vap_tpu.data.config import build_datasets_from_config

    path = tmp_path / "training.json"
    path.write_text(json.dumps({"datasets": [
        {"dataset_type": "video", "sample_ref_videos_num": 3}]}))
    with pytest.raises(ValueError, match="unknown dataset_config keys"):
        build_datasets_from_config(str(path), _args_stub(tmp_path), family="cogvideox")


def test_dataset_config_bad_reshape_mode_raises(tmp_path):
    from vap_tpu.data.config import build_datasets_from_config

    path = tmp_path / "training.json"
    path.write_text(json.dumps({"datasets": [
        {"dataset_type": "video", "reshape_mode": "center_crop"}]}))
    with pytest.raises(ValueError, match="reshape_mode"):
        build_datasets_from_config(str(path), _args_stub(tmp_path), family="cogvideox")


def test_sampler_buckets_by_all_tensor_shapes():
    """Code-review r3: conditions can be variable-length (CogView4 'longest'
    GLM embeds) — the sampler must not batch samples whose condition shapes
    differ, or collate's np.concatenate crashes mid-training."""
    s = ResolutionSampler(2)
    lat = {"latents": np.zeros((1, 4, 8, 8), np.float32)}
    s.consume({"encoder_hidden_states": np.zeros((1, 16, 8), np.float32)}, dict(lat))
    s.consume({"encoder_hidden_states": np.zeros((1, 32, 8), np.float32)}, dict(lat))
    assert not s.is_ready  # different text lengths: separate buckets
    s.consume({"encoder_hidden_states": np.zeros((1, 16, 8), np.float32)}, dict(lat))
    assert s.is_ready
    conds, lats = s.get_batch()
    out = collate_tensor_dicts(conds)
    assert out["encoder_hidden_states"].shape == (2, 16, 8)


def test_load_safetensors_diffusers_component_dir(tmp_path):
    """Code-review r3: diffusers components ship diffusion_pytorch_model
    .safetensors — a real HF checkpoint dir must not be silently treated as
    absent (which random-initialized the transformer)."""
    from safetensors.numpy import save_file

    from vap_tpu.training.checkpoint import load_safetensors

    d = tmp_path / "transformer"
    d.mkdir()
    save_file({"w": np.ones((2, 2), np.float32)},
              str(d / "diffusion_pytorch_model.safetensors"))
    sd = load_safetensors(str(d))
    assert "w" in sd and sd["w"].shape == (2, 2)


def test_native_decode_unaligned_row_stride(tmp_path):
    """Regression: sws_scale's SIMD paths overran tightly-packed output rows
    whose stride (out_w*3) is not SIMD-aligned — 40px-wide videos smashed
    the heap ('corrupted size vs. prev_size'). The decoder now scales into
    a 64-byte-aligned temp and copies tight rows out."""
    import numpy as np

    from vap_tpu.data.video import export_to_video, load_video

    frames = (np.random.default_rng(9).uniform(0, 1, (5, 40, 40, 3)) * 255).astype(np.uint8)
    path = str(tmp_path / "v40.mp4")
    export_to_video(frames, path, fps=8)
    out, fps = load_video(path)
    assert out.shape == (5, 40, 40, 3) and fps == 8.0
    try:
        from vap_tpu.native import decode_video
    except Exception:
        return
    resized = decode_video(path, out_h=37, out_w=53)  # odd target dims too
    assert resized.shape == (5, 37, 53, 3)
