"""Generic dataset layer: layout auto-detection, decode, state resume,
preprocessing wrapper, combination (reference dataset.py:136-700, 1364-1660)."""

import json
import os
import tarfile

import numpy as np
import pytest

from vap_tpu.data.generic import (
    CombinedDataset,
    DatasetPreprocessingWrapper,
    ImageCaptionFilePairDataset,
    ImageFolderDataset,
    VideoCaptionFilePairDataset,
    VideoFileCaptionFileListDataset,
    VideoWebDataset,
    initialize_dataset,
    remove_llm_prefixes,
)
from vap_tpu.data.video import export_to_video


def _write_png(path, seed=0, size=16):
    import cv2

    img = (np.random.default_rng(seed).uniform(0, 255, (size, size, 3))).astype(np.uint8)
    cv2.imwrite(str(path), img)


def _write_mp4(path, seed=0, frames=5, size=16):
    fr = (np.random.default_rng(seed).uniform(0, 1, (frames, size, size, 3)) * 255).astype(np.uint8)
    export_to_video(fr, str(path), fps=8)


def test_image_caption_pair_and_dispatch(tmp_path):
    for i in range(3):
        (tmp_path / f"s{i}.txt").write_text(f"caption {i}")
        _write_png(tmp_path / f"s{i}.png", seed=i)
    ds = initialize_dataset(str(tmp_path), "image")
    assert isinstance(ds, ImageCaptionFilePairDataset)
    samples = list(ds)
    assert len(samples) == 3
    assert samples[0]["caption"] == "caption 0"
    assert samples[0]["image"].shape == (16, 16, 3)
    assert -1.0 <= samples[0]["image"].min() and samples[0]["image"].max() <= 1.0


def test_video_caption_pair_state_resume(tmp_path):
    for i in range(4):
        (tmp_path / f"v{i}.txt").write_text(f"vid {i}")
        _write_mp4(tmp_path / f"v{i}.mp4", seed=i)
    ds = initialize_dataset(str(tmp_path), "video")
    assert isinstance(ds, VideoCaptionFilePairDataset)
    it = iter(ds)
    next(it), next(it)
    state = ds.state_dict()
    assert state["sample_index"] == 2

    ds2 = VideoCaptionFilePairDataset(str(tmp_path))
    ds2.load_state_dict(state)
    assert next(iter(ds2))["caption"] == "vid 2"  # resumes mid-stream


def test_file_list_dataset(tmp_path):
    vids = []
    for i in range(2):
        _write_mp4(tmp_path / f"clip{i}.mp4", seed=i)
        vids.append(f"clip{i}.mp4")
    (tmp_path / "prompts.txt").write_text("a\nb")
    (tmp_path / "videos.txt").write_text("\n".join(vids))
    ds = initialize_dataset(str(tmp_path), "video")
    assert isinstance(ds, VideoFileCaptionFileListDataset)
    s = list(ds)
    assert [x["caption"] for x in s] == ["a", "b"]
    assert s[0]["video"].ndim == 4

    # mismatched list lengths must raise
    (tmp_path / "prompts.txt").write_text("only-one")
    with pytest.raises(ValueError):
        VideoFileCaptionFileListDataset(str(tmp_path))


def test_folder_dataset_metadata_csv(tmp_path):
    import pandas as pd

    for i in range(2):
        _write_png(tmp_path / f"img{i}.png", seed=i)
    pd.DataFrame([{"file_name": f"img{i}.png", "caption": f"c{i}"} for i in range(2)]
                 ).to_csv(tmp_path / "metadata.csv", index=False)
    ds = initialize_dataset(str(tmp_path), "image")
    assert isinstance(ds, ImageFolderDataset)
    s = list(ds)
    assert s[1]["caption"] == "c1" and s[1]["image"].shape == (16, 16, 3)


def test_webdataset_tar(tmp_path):
    _write_mp4(tmp_path / "a.mp4", seed=1)
    _write_mp4(tmp_path / "b.mp4", seed=2)
    (tmp_path / "a.txt").write_text("cap a")
    (tmp_path / "b.json").write_text(json.dumps({"caption": "cap b"}))
    shard = tmp_path / "shards" / "0000.tar"
    os.makedirs(shard.parent)
    with tarfile.open(shard, "w") as tf:
        for f in ("a.mp4", "a.txt", "b.mp4", "b.json"):
            tf.add(tmp_path / f, arcname=f)
    ds = initialize_dataset(str(tmp_path / "shards"), "video")
    assert isinstance(ds, VideoWebDataset)
    s = {x["caption"]: x for x in ds}
    assert set(s) == {"cap a", "cap b"}
    assert s["cap a"]["video"].ndim == 4


def test_preprocessing_wrapper_and_combine(tmp_path):
    for i in range(2):
        (tmp_path / f"s{i}.txt").write_text("The video shows a dancing cat")
        _write_png(tmp_path / f"s{i}.png", seed=i)
    base = ImageCaptionFilePairDataset(str(tmp_path))
    wrapped = DatasetPreprocessingWrapper(
        base, id_token="TOK", remove_common_llm_caption_prefixes=True)
    s = next(iter(wrapped))
    assert s["caption"] == "TOK a dancing cat"

    combined = CombinedDataset([ImageCaptionFilePairDataset(str(tmp_path)),
                                ImageCaptionFilePairDataset(str(tmp_path))],
                               buffer_size=2, shuffle=True)
    assert len(list(combined)) == 4
    assert len(combined) == 4


def test_remove_llm_prefixes():
    assert remove_llm_prefixes("In the video, a dog runs") == "a dog runs"
    assert remove_llm_prefixes("plain caption") == "plain caption"


def test_initialize_dataset_errors(tmp_path):
    with pytest.raises(ValueError):
        initialize_dataset(str(tmp_path), "audio")
    with pytest.raises(FileNotFoundError):
        initialize_dataset(str(tmp_path / "nope"), "image")
    os.makedirs(tmp_path / "empty")
    with pytest.raises(ValueError):
        initialize_dataset(str(tmp_path / "empty"), "image")
