"""--dataset_config consumption: build (possibly combined) datasets from a
training.json datasets list (reference sft_trainer/trainer.py:327-389 +
finetrainers/data/dataset.py:1542-1618).

Reference semantics: the dataset KIND follows the training type —
video_as_prompt_mot builds the VAP dataset regardless of the entry's
dataset_type (which then only drives preprocessing), while sft/lora/control
build an auto-detected generic dataset of that type. Per-entry keys
(buckets, frames_selection, meta_df_name, ...) override the global flags.
Unknown keys raise, so a config nothing reads fails loudly instead of
shipping as decoration.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

_ENTRY_KEYS = {
    "data_root", "dataset_file", "dataset_type", "caption_options",
    "meta_df_name", "video_resolution_buckets", "image_resolution_buckets",
    "reshape_mode", "frames_selection", "remove_common_llm_caption_prefixes",
    "id_token", "_comment",
}


class DatasetAnnotationWrapper:
    """Attach per-dataset preprocessing hints (resolution buckets, frame
    selection) to each sample so the trainer's bucket-fit honors them; state
    passes through to the wrapped stateful iterable."""

    def __init__(self, dataset, annotations: Dict[str, Any]):
        self.dataset = dataset
        self.annotations = annotations
        self.infinite = getattr(dataset, "infinite", False)

    def __len__(self):
        return len(self.dataset)

    def __iter__(self):
        for sample in self.dataset:
            yield {**sample, **self.annotations}

    def state_dict(self):
        return self.dataset.state_dict()

    def load_state_dict(self, state):
        self.dataset.load_state_dict(state)


def _tuplify_buckets(b):
    return tuple(tuple(int(x) for x in row) for row in b)


def _annotations(entry: Dict[str, Any]) -> Dict[str, Any]:
    ann = {}
    if "video_resolution_buckets" in entry:
        ann["_resolution_buckets"] = _tuplify_buckets(entry["video_resolution_buckets"])
    if "image_resolution_buckets" in entry:
        ann["_image_resolution_buckets"] = _tuplify_buckets(entry["image_resolution_buckets"])
    if "frames_selection" in entry:
        ann["_frames_selection"] = str(entry["frames_selection"])
    return ann


def build_dataset_from_entry(entry: Dict[str, Any], args, *, family: str,
                             shard_index: int = 0, num_shards: int = 1):
    """One datasets-list entry -> a stateful iterable dataset."""
    unknown = set(entry) - _ENTRY_KEYS
    if unknown:
        raise ValueError(f"unknown dataset_config keys: {sorted(unknown)} "
                         f"(valid: {sorted(_ENTRY_KEYS - {'_comment'})})")
    if entry.get("caption_options"):
        raise ValueError("dataset_config caption_options is not supported; "
                         "use caption .txt files / metadata columns")
    if entry.get("reshape_mode", "bicubic") != "bicubic":
        raise ValueError(
            f"reshape_mode {entry['reshape_mode']!r} is not implemented "
            "(bicubic only, matching this build's resize path)")
    if entry.get("data_root") and entry.get("dataset_file"):
        raise ValueError("dataset_config entry: data_root and dataset_file are "
                         "mutually exclusive (reference trainer.py:342-343)")
    dataset_file = entry.get("dataset_file")
    if dataset_file:
        # a metadata FILE: its directory is the media root. VAP datasets read
        # it as meta_df_name; generic folder datasets require it to be the
        # metadata.* file that initialize_dataset auto-detects.
        if not os.path.isfile(dataset_file):
            raise ValueError(f"dataset_file {dataset_file!r} is not a file")
        root = os.path.dirname(os.path.abspath(dataset_file))
    else:
        root = entry.get("data_root") or args.data_root
    if not root:
        raise ValueError("dataset_config entry needs data_root (or --data_root)")
    dataset_type = entry.get("dataset_type", "video")
    if dataset_type not in ("video", "image"):
        raise ValueError(f"dataset_type must be video|image, got {dataset_type!r}")

    if args.training_type in ("video_as_prompt_mot", "dpo") or args.dpo:
        # VAP training builds the VAP dataset regardless of dataset_type
        # (reference trainer.py:350-368 initialize_videoasprompt_dataset)
        from .dataset import VideoAsPromptDataset, VideoAsPromptDPODataset

        ds_cls = (VideoAsPromptDPODataset
                  if (args.dpo or args.training_type == "dpo") else VideoAsPromptDataset)
        ds = ds_cls(
            root,
            meta_df_name=(os.path.basename(dataset_file) if dataset_file
                          else entry.get("meta_df_name", args.meta_df_name)),
            infinite=True,
            sample_ref_videos_num=args.sample_ref_videos_num,
            mask_ref_ratio=args.mask_ref_ratio,
            mask_caption_ratio=args.mask_caption_ratio,
            alignment_score_threshold=args.alignment_score_threshold,
            baseline_single_condition=args.baseline_single_condition,
            ablation_scaling_data_num=args.ablation_scaling_data_num,
            shard_index=shard_index,
            num_shards=num_shards,
            seed=args.seed + shard_index,
        )
        if entry.get("remove_common_llm_caption_prefixes",
                     args.remove_common_llm_caption_prefixes) or \
                entry.get("id_token", args.id_token):
            from .generic import DatasetPreprocessingWrapper

            ds = DatasetPreprocessingWrapper(
                ds,
                id_token=entry.get("id_token", args.id_token),
                remove_common_llm_caption_prefixes=entry.get(
                    "remove_common_llm_caption_prefixes",
                    args.remove_common_llm_caption_prefixes))
    else:
        from .generic import DatasetPreprocessingWrapper, initialize_dataset

        if dataset_file and not os.path.basename(dataset_file).startswith("metadata"):
            raise ValueError(
                "generic dataset_file must be a metadata.{csv,json,jsonl} file "
                f"(auto-detected by initialize_dataset); got {dataset_file!r} — "
                "use data_root for folder/caption-pair/webdataset layouts")
        ds = initialize_dataset(root, dataset_type, infinite=True)
        if num_shards > 1 and hasattr(ds, "_items"):
            ds._items = ds._items[shard_index::num_shards]
        ds = DatasetPreprocessingWrapper(
            ds,
            id_token=entry.get("id_token", args.id_token),
            remove_common_llm_caption_prefixes=entry.get(
                "remove_common_llm_caption_prefixes",
                args.remove_common_llm_caption_prefixes))

    ann = _annotations(entry)
    return DatasetAnnotationWrapper(ds, ann) if ann else ds


def build_datasets_from_config(path: str, args, *, family: str,
                               shard_index: int = 0, num_shards: int = 1):
    """Load a training.json and build the (combined) dataset it describes."""
    with open(path) as f:
        cfg = json.load(f)
    entries = cfg.get("datasets")
    if not isinstance(entries, list) or not entries:
        raise ValueError(f"{path} must contain a non-empty 'datasets' list")
    datasets = [
        build_dataset_from_entry(e, args, family=family,
                                 shard_index=shard_index, num_shards=num_shards)
        for e in entries
    ]
    if len(datasets) == 1:
        return datasets[0]
    from .generic import combine_datasets

    return combine_datasets(datasets, shuffle=True)
