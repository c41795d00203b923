"""Video-As-Prompt datasets (CSV-metadata driven, checkpoint-stateful).

Mirrors the reference data layer (finetrainers/data/dataset.py):
  * `filter_and_update_refs` — alignment-score filtering + per-`kind` reference
    re-sampling (:61-117)
  * `VideoAsPromptDataset` — vap_data.csv rows (video_paths, tar_video_caption,
    ref_video_paths JSON list, kind, split, reference_alignment_score), fps
    resample to 16, per-sample random choice of `sample_ref_videos_num` refs
    with `mask_ref_ratio` dropout and `mask_caption_ratio` caption dropout
    (:701-837); resumable via `_sample_index`
  * `VideoAsPromptDPODataset` — win/lose pairs + dpo_weight (:839-1174)
  * `VideoAsPromptValidationDataset` — benchmark-CSV driven samples (:1244+)

Decoding uses cv2 (host CPU) instead of decord; frames come out as float32
[-1, 1] arrays [F, H, W, 3].
"""

from __future__ import annotations

import json
import os
import random
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from .video import get_resample_indices, load_video, normalize_video

TARGET_FPS = 16


def filter_and_update_refs(
    rows: List[Dict[str, Any]],
    alignment_score_threshold: float,
    seed: Optional[int] = None,
) -> List[Dict[str, Any]]:
    """Drop rows below the alignment-score threshold; repair rows whose refs
    were all filtered out by sampling a same-`kind` replacement."""
    rng = random.Random(seed)
    alive = [r for r in rows if r.get("_valid", 1) > 0 and r["reference_alignment_score"] > alignment_score_threshold]
    alive_paths = {str(r["video_paths"]) for r in alive}
    pools_by_kind: Dict[str, List[str]] = {}
    for r in alive:
        pools_by_kind.setdefault(r["kind"], []).append(str(r["video_paths"]))

    out = []
    for r in alive:
        self_path = str(r["video_paths"])
        refs = [p for p in r["ref_video_paths"] if p in alive_paths and p != self_path]
        if not refs:
            pool = [p for p in pools_by_kind.get(r["kind"], []) if p != self_path]
            if not pool:
                continue
            refs = [rng.choice(pool)]
        r = dict(r)
        r["ref_video_paths"] = refs
        out.append(r)
    return out


def _read_csv_rows(path: str) -> List[Dict[str, Any]]:
    import pandas as pd

    df = pd.read_csv(path)
    rows = df.to_dict("records")
    for r in rows:
        if isinstance(r.get("ref_video_paths"), str):
            r["ref_video_paths"] = json.loads(r["ref_video_paths"])
    return rows


def _decode_resampled(path: str) -> np.ndarray:
    frames, fps = load_video(path)
    if abs(fps - TARGET_FPS) > 1e-3:
        idx = _ref_resample_indices(fps, TARGET_FPS, len(frames))
        frames = frames[idx]
    return normalize_video(frames)


def _ref_resample_indices(source_fps: float, target_fps: float, n: int) -> np.ndarray:
    """Reference resampling (dataset.py:119-135): round + de-dup."""
    if abs(source_fps - target_fps) < 1e-6:
        return np.arange(n)
    num_target = int(n * (target_fps / source_fps))
    if num_target < 1:
        return np.array([n // 2])
    idx = np.round(np.linspace(0, n - 1, num=num_target)).astype(int)
    _, uniq = np.unique(idx, return_index=True)
    return idx[np.sort(uniq)]


class VideoAsPromptDataset:
    """Iterable VAP training dataset; state = consumed-sample index."""

    def __init__(
        self,
        root: str,
        meta_df_name: str = "vap_data.csv",
        infinite: bool = False,
        sample_ref_videos_num: int = 1,
        mask_ref_ratio: float = 0.0,
        mask_caption_ratio: float = 0.02,
        alignment_score_threshold: float = 5.0,
        baseline_single_condition: Optional[str] = None,
        ablation_scaling_data_num: int = 99_999_999,
        shuffle_seed: int = 42,
        shard_index: int = 0,
        num_shards: int = 1,
        seed: int = 0,
    ):
        self.root = root
        self.infinite = infinite
        self.sample_ref_videos_num = sample_ref_videos_num
        self.mask_ref_ratio = mask_ref_ratio
        self.mask_caption_ratio = mask_caption_ratio

        rows = _read_csv_rows(os.path.join(root, meta_df_name))
        if baseline_single_condition is not None:
            rows = [r for r in rows if r["kind"] == baseline_single_condition]
        rows = [r for r in rows if r.get("split", "train") == "train"]
        rng = random.Random(shuffle_seed)
        rng.shuffle(rows)
        rows = filter_and_update_refs(rows, alignment_score_threshold, seed=shuffle_seed)
        rows = rows[: min(len(rows), ablation_scaling_data_num)]
        # shard across data-parallel hosts (replaces split_dataset_by_node)
        self.rows = rows[shard_index::num_shards]

        self.caption_by_path = {str(r["video_paths"]): r["tar_video_caption"] for r in rows}
        self.kind_by_path = {str(r["video_paths"]): r["kind"] for r in rows}
        self._sample_index = 0
        self._rng = random.Random(seed)

    def state_dict(self) -> Dict[str, Any]:
        # rng state covers ref-selection / caption-mask draws so a resumed run
        # replays the exact sample stream of an uninterrupted one; stored
        # JSON-serializably (checkpoint meta is JsonSave)
        v, internal, gauss = self._rng.getstate()
        return {"sample_index": self._sample_index,
                "rng_state": [v, list(internal), gauss]}

    def load_state_dict(self, state: Dict[str, Any]):
        self._sample_index = state["sample_index"]
        rs = state.get("rng_state")
        if rs is not None:
            self._rng.setstate((rs[0], tuple(rs[1]), rs[2]))

    def __len__(self) -> int:
        return len(self.rows)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        while True:
            start = self._sample_index % max(len(self.rows), 1)
            for row in self.rows[start:]:
                self._sample_index += 1
                try:
                    sample = self._make_sample(row)
                except (OSError, ValueError):
                    continue
                yield sample
            if not self.infinite:
                break
            self._sample_index = 0

    def _make_sample(self, row: Dict[str, Any]) -> Dict[str, Any]:
        video = _decode_resampled(os.path.join(self.root, str(row["video_paths"])))
        refs, ref_captions, effect_types = [], [], []
        chosen = self._rng.sample(
            list(row["ref_video_paths"]), min(self.sample_ref_videos_num, len(row["ref_video_paths"])))
        for ref_name in chosen:
            if self._rng.random() < self.mask_ref_ratio and refs:
                continue
            refs.append(_decode_resampled(os.path.join(self.root, ref_name)))
            ref_captions.append(str(self.caption_by_path.get(ref_name, "")).strip())
            effect_types.append(self.kind_by_path.get(ref_name, row["kind"]))

        caption = row["tar_video_caption"]
        if self._rng.random() < self.mask_caption_ratio:
            caption = ""
            ref_captions = [""] * len(ref_captions)

        return {
            "video": video,
            "caption": caption,
            "ref_videos": refs,
            "caption_mot_ref": ref_captions,
            "effect_types": effect_types,
            "kind": row["kind"],
        }


class VideoAsPromptDPODataset(VideoAsPromptDataset):
    """Win/lose preference pairs for DPO (dataset.py:839-1174). The CSV carries
    win_video_paths / lose_video_paths / dpo_weight columns."""

    def _make_sample(self, row: Dict[str, Any]) -> Dict[str, Any]:
        sample = super()._make_sample(dict(row, video_paths=row["win_video_paths"]))
        lose = _decode_resampled(os.path.join(self.root, str(row["lose_video_paths"])))
        sample["video_lose"] = lose
        sample["dpo_weight"] = float(row.get("dpo_weight", 1.0))
        return sample


class VideoAsPromptValidationDataset:
    """Benchmark/validation samples (dataset.py:1244-1362): each row yields the
    target first frame + prompt and the reference video(s) + prompt(s)."""

    def __init__(self, csv_path: str, root: Optional[str] = None, num_frames: int = 49,
                 shard_index: int = 0, num_shards: int = 1):
        self.root = root or os.path.dirname(os.path.abspath(csv_path))
        rows = _read_csv_rows(csv_path)
        self.rows = rows[shard_index::num_shards]
        self.num_frames = num_frames

    def __len__(self):
        return len(self.rows)

    def __iter__(self):
        for row in self.rows:
            video = _decode_resampled(os.path.join(self.root, str(row["video_paths"])))
            refs = [
                _decode_resampled(os.path.join(self.root, p)) for p in row["ref_video_paths"]
            ]
            yield {
                "image": video[0],
                "video": video,
                "caption": row["tar_video_caption"],
                "ref_videos": refs,
                "caption_mot_ref": [row.get("ref_video_caption", row["tar_video_caption"])] * len(refs),
                "kind": row.get("kind"),
            }
