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
        self._global_rows = rows
        self._shard = (shard_index, num_shards)
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


DPO_STAGE_SCHEDULE = (
    {"epochs": 2, "pos_min": 90, "neg_max": 10},
    {"epochs": 10_000, "pos_min": 80, "neg_max": 30},
)


class VideoAsPromptDPODataset(VideoAsPromptDataset):
    """Win/lose preference pairs for DPO (reference VideoAsPromptDPOV2Dataset,
    dataset.py:839-1174): pairs are CONSTRUCTED per row from
    reference_alignment_score —

      * staged curriculum: epoch-indexed (pos_min, neg_max) decade thresholds
        (2 epochs at 90/10, then 80/30) pick win from {score >= pos_min} and
        lose from {score <= neg_max} within the row's kind (:890-893,
        :1076-1100)
      * the MoT reference video comes from the score==100 pool, falling back
        to 80<score<100, banning the chosen pair (:1057-1065, :1122-1126)
      * score-based reweighting: weight = ((|s_win - s_lose| * beta) /
        max(sqrt(p_win * p_lose), prob_eps)) ** alpha with p = frequency of
        the video's score bin (freq_bin_width decades + smoothing)
        (:974-1035, :1127-1135)

    The reference filters at threshold 0 for DPO regardless of the SFT
    threshold flag (:905-908) and truncates the train rows to a multiple of
    48 (:921-923) — both matched. Rows whose pools are empty are skipped.
    Fast path: a CSV that already carries win_video_paths / lose_video_paths
    (+ optional dpo_weight) is used as-is."""

    def __init__(self, root: str, *, reweight: bool = True, alpha: float = 1.0,
                 beta: float = 0.02, prob_eps: float = 1e-8,
                 freq_bin_width: int = 10, freq_smoothing: float = 0.0,
                 stage_schedule=DPO_STAGE_SCHEDULE, **kw):
        assert 1 <= int(freq_bin_width) <= 100 and 100 % int(freq_bin_width) == 0, \
            f"freq_bin_width must divide 100; got {freq_bin_width}"
        kw["alignment_score_threshold"] = 0.0  # reference DPO filters at 0
        super().__init__(root, **kw)
        # pools/dicts are built over ALL splits (the reference builds its
        # caption/kind/score dicts and pools before the split filter,
        # :913-935) — re-read the CSV rather than reuse the train-only rows
        meta = kw.get("meta_df_name", "vap_data.csv")
        all_rows = _read_csv_rows(os.path.join(root, meta))
        self._all_rows = filter_and_update_refs(all_rows, 0.0, seed=kw.get("shuffle_seed", 42))
        self.reweight = bool(reweight)
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.prob_eps = float(prob_eps)
        self.freq_bin_width = int(freq_bin_width)
        self.freq_smoothing = float(freq_smoothing)
        self.stage_schedule = list(stage_schedule)

        self._explicit_pairs = bool(self.rows) and "win_video_paths" in self.rows[0]
        if self._explicit_pairs:
            return

        # reference truncates to a multiple of 48 when >= 16 rows (:921-923).
        # Truncation applies to the GLOBAL train rows (as in the reference,
        # which truncates before distributed sharding) — truncating each
        # shard independently could empty a small shard entirely and leave
        # its infinite iterator spinning without ever yielding.
        g = self._global_rows
        if len(g) >= 16:
            g = g[: len(g) - (len(g) % 48)]
        shard_index, num_shards = self._shard
        self._global_rows = g
        self.rows = g[shard_index::num_shards]

        self.score_by_path = {
            str(r["video_paths"]): float(r["reference_alignment_score"])
            for r in self._all_rows
        }
        self.caption_by_path = {
            str(r["video_paths"]): r["tar_video_caption"] for r in self._all_rows}
        self.kind_by_path = {
            str(r["video_paths"]): r["kind"] for r in self._all_rows}
        by_kind: Dict[str, List[str]] = {}
        for p, kind in self.kind_by_path.items():
            by_kind.setdefault(kind, []).append(p)
        # decade-threshold pools (reference :941-957)
        self.pos_pools: Dict[str, Dict[int, List[str]]] = {}
        self.neg_pools: Dict[str, Dict[int, List[str]]] = {}
        self.ref_pool_eq100: Dict[str, List[str]] = {}
        self.ref_pool_80_100: Dict[str, List[str]] = {}
        for kind, vids in by_kind.items():
            s = self.score_by_path
            self.pos_pools[kind] = {
                b: [v for v in vids if s[v] >= b] for b in range(0, 101, 10)}
            self.neg_pools[kind] = {
                b: [v for v in vids if s[v] <= b] for b in range(0, 101, 10)}
            self.ref_pool_eq100[kind] = [v for v in vids if s[v] == 100]
            self.ref_pool_80_100[kind] = [v for v in vids if 80 < s[v] < 100]

        # per-video score-bin frequency for reweighting (reference :974-1035)
        bin_w = self.freq_bin_width
        max_idx = 100 // bin_w

        def to_bin(score: float) -> int:
            s = min(max(score, 0.0), 100.0)
            return max_idx if int(s) >= 100 else int(s) // bin_w

        counts = {i: 0.0 for i in range(max_idx + 1)}
        for p, score in self.score_by_path.items():
            counts[to_bin(score)] += 1.0
        if self.freq_smoothing > 0.0:
            for i in counts:
                counts[i] += self.freq_smoothing
        total = sum(counts.values()) or 1.0
        self.prob_by_path = {
            p: counts[to_bin(score)] / total for p, score in self.score_by_path.items()}

    def __len__(self) -> int:
        return len(self.rows)

    def _current_stage(self) -> Dict[str, int]:
        n = max(len(self.rows), 1)
        epoch = self._sample_index // n
        start = 0
        for st in self.stage_schedule:
            if start <= epoch < start + st["epochs"]:
                return st
            start += st["epochs"]
        return self.stage_schedule[-1]

    def _pair_weight(self, win: str, lose: str) -> float:
        if not self.reweight:
            return 1.0
        s0 = self.score_by_path.get(win, 0.0)
        s1 = self.score_by_path.get(lose, 0.0)
        p0 = self.prob_by_path.get(win, 1.0)
        p1 = self.prob_by_path.get(lose, 1.0)
        prob = (max(p0, self.prob_eps) * max(p1, self.prob_eps)) ** 0.5
        return (abs(s0 - s1) * self.beta / max(prob, self.prob_eps)) ** self.alpha

    def _construct_pair(self, row: Dict[str, Any]):
        """(win, lose, ref, weight) for this row per the current stage, or
        None when a pool is empty (row skipped, as in the reference)."""
        stage = self._current_stage()
        pos_min = min(max((stage["pos_min"] // 10) * 10, 0), 100)
        neg_max = min(max((stage["neg_max"] // 10) * 10, 0), 100)
        kind = row["kind"]
        pos_pool = self.pos_pools.get(kind, {}).get(pos_min, [])
        neg_pool = self.neg_pools.get(kind, {}).get(neg_max, [])
        if not pos_pool or not neg_pool:
            return None
        win = self._rng.choice(pos_pool)
        lose_candidates = [v for v in neg_pool if v != win]
        if not lose_candidates:
            return None
        lose = self._rng.choice(lose_candidates)
        ban = {win, lose}
        ref_pool = [v for v in self.ref_pool_eq100.get(kind, []) if v not in ban]
        if not ref_pool:
            ref_pool = [v for v in self.ref_pool_80_100.get(kind, []) if v not in ban]
        if not ref_pool:
            return None
        ref = self._rng.choice(ref_pool)
        return win, lose, ref, self._pair_weight(win, lose)

    def _make_sample(self, row: Dict[str, Any]) -> Dict[str, Any]:
        if self._explicit_pairs:
            sample = super()._make_sample(dict(row, video_paths=row["win_video_paths"]))
            lose = _decode_resampled(os.path.join(self.root, str(row["lose_video_paths"])))
            sample["video_lose"] = lose
            sample["dpo_weight"] = float(row.get("dpo_weight", 1.0))
            return sample

        pair = self._construct_pair(row)
        if pair is None:
            raise ValueError(f"no DPO pair for kind {row['kind']!r} at this stage")
        win, lose, ref, weight = pair
        win_v = _decode_resampled(os.path.join(self.root, win))
        lose_v = _decode_resampled(os.path.join(self.root, lose))
        ref_v = _decode_resampled(os.path.join(self.root, ref))
        caption = str(self.caption_by_path.get(win, "")).strip()
        caption_lose = str(self.caption_by_path.get(lose, "")).strip()
        ref_caption = str(self.caption_by_path.get(ref, "")).strip()
        if self._rng.random() < self.mask_caption_ratio:
            caption = caption_lose = ref_caption = ""
        return {
            "video": win_v,
            "video_lose": lose_v,
            "caption": caption,
            "caption_lose": caption_lose,
            "ref_videos": [ref_v],
            "caption_mot_ref": [ref_caption],
            "effect_types": [row["kind"]],
            "kind": row["kind"],
            "dpo_weight": float(weight),
        }


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
