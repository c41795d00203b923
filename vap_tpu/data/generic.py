"""Generic (non-VAP) training datasets for the other model families.

TPU-native counterpart of the reference's generic dataset layer
(finetrainers/data/dataset.py:136-700 + initialize_dataset :1542-1610 +
IterableDatasetPreprocessingWrapper :1364-1492 + IterableCombinedDataset
:1494-1539). Five local layouts are auto-detected, mirroring the reference's
dispatch order:

  1. metadata file (metadata.csv / metadata.jsonl / metadata.json) ->
     Image/VideoFolderDataset
  2. .tar shards -> Image/VideoWebDataset (stdlib tarfile, no webdataset dep)
  3. per-sample caption/data file pairs (a.txt + a.mp4) ->
     Image/VideoCaptionFilePairDataset
  4. caption.txt + image.txt/video.txt file lists ->
     Image/VideoFileCaptionFileListDataset

All datasets are infinite-capable iterables with checkpointable
state_dict()/load_state_dict() (sample_index), decode on the host with cv2,
and emit channel-last float32 arrays in [-1, 1] ([H, W, 3] images,
[F, H, W, 3] videos) — the TPU-friendly layout used across vap_tpu (the
reference emits torch CHW).
"""

from __future__ import annotations

import io
import json
import os
import random
import tarfile
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

from .video import load_video, normalize_video

SUPPORTED_IMAGE_EXTENSIONS = ("jpg", "jpeg", "png")
SUPPORTED_VIDEO_EXTENSIONS = ("mp4", "mov")
COMMON_CAPTION_FILES = ("caption.txt", "captions.txt", "prompt.txt", "prompts.txt")
COMMON_IMAGE_FILES = ("image.txt", "images.txt")
COMMON_VIDEO_FILES = ("video.txt", "videos.txt")

_BEGINNINGS = ("This video", "The video", "This clip", "The clip", "The animation",
               "This image", "The image", "This picture", "The picture")
_CONTINUATIONS = ("shows", "depicts", "features", "captures", "highlights",
                  "introduces", "presents")
COMMON_LLM_START_PHRASES = (
    "In the video,", "In this video,", "In this video clip,", "In the clip,", "Caption:",
    *(f"{b} {c}" for b in _BEGINNINGS for c in _CONTINUATIONS),
)


def load_image(path_or_bytes) -> np.ndarray:
    """Decode an image to float32 [-1, 1], [H, W, 3] RGB."""
    import cv2

    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = np.frombuffer(path_or_bytes, np.uint8)
        img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
    else:
        img = cv2.imread(str(path_or_bytes), cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError(f"failed to decode image {path_or_bytes!r:.80}")
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img.astype(np.float32) / 127.5 - 1.0


def _load_video_norm(path: str) -> np.ndarray:
    frames, _ = load_video(path)
    return normalize_video(frames)


def remove_llm_prefixes(caption: str) -> str:
    """Strip common LLM-captioner lead-ins (reference constants.py:84-95,
    functional_common.remove_prefix)."""
    c = caption.lstrip()
    for phrase in COMMON_LLM_START_PHRASES:
        if c.startswith(phrase):
            c = c[len(phrase):].lstrip()
            break
    return c


class _StatefulIterable:
    """Shared skeleton: index-resumable infinite iteration over `self._items`,
    one decoded sample per item via `_make_sample`."""

    def __init__(self, infinite: bool = False):
        self.infinite = infinite
        self._items: List[Any] = []
        self._sample_index = 0

    def state_dict(self) -> Dict[str, int]:
        return {"sample_index": self._sample_index}

    def load_state_dict(self, state: Dict[str, int]):
        self._sample_index = state["sample_index"]

    def __len__(self) -> int:
        return len(self._items)

    def _make_sample(self, item) -> Dict[str, Any]:  # pragma: no cover - abstract
        raise NotImplementedError

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        while True:
            start = self._sample_index % max(len(self._items), 1)
            for item in self._items[start:]:
                self._sample_index += 1
                yield self._make_sample(item)
            if not self.infinite:
                break
            self._sample_index = 0


def _find_media_for_caption(caption_path: str, extensions: Sequence[str]) -> Optional[str]:
    base = os.path.splitext(caption_path)[0]
    found = [f"{base}.{ext}" for ext in extensions if os.path.exists(f"{base}.{ext}")]
    if len(found) > 1:
        raise ValueError(f"multiple data files for caption {caption_path}: {found}")
    return found[0] if found else None


class ImageCaptionFilePairDataset(_StatefulIterable):
    """a.txt + a.{jpg,jpeg,png} pairs (reference dataset.py:136-207)."""

    media_key = "image"
    extensions = SUPPORTED_IMAGE_EXTENSIONS

    def __init__(self, root: str, infinite: bool = False):
        super().__init__(infinite)
        self.root = root
        for fname in sorted(os.listdir(root)):
            if not fname.endswith(".txt"):
                continue
            media = _find_media_for_caption(os.path.join(root, fname), self.extensions)
            if media:
                self._items.append((os.path.join(root, fname), media))

    def _decode(self, path: str) -> np.ndarray:
        return load_image(path)

    def _make_sample(self, item) -> Dict[str, Any]:
        caption_path, media_path = item
        with open(caption_path) as f:
            caption = f.read().strip()
        return {"caption": caption, self.media_key: self._decode(media_path)}


class VideoCaptionFilePairDataset(ImageCaptionFilePairDataset):
    """a.txt + a.{mp4,mov} pairs (reference dataset.py:209-280)."""

    media_key = "video"
    extensions = SUPPORTED_VIDEO_EXTENSIONS

    def _decode(self, path: str) -> np.ndarray:
        return _load_video_norm(path)


class ImageFileCaptionFileListDataset(_StatefulIterable):
    """caption.txt + image.txt line-aligned lists (reference dataset.py:282-359)."""

    media_key = "image"
    media_list_files = COMMON_IMAGE_FILES

    def __init__(self, root: str, infinite: bool = False):
        super().__init__(infinite)
        self.root = root
        caption_files = [f for f in COMMON_CAPTION_FILES if os.path.exists(os.path.join(root, f))]
        media_files = [f for f in self.media_list_files if os.path.exists(os.path.join(root, f))]
        if len(caption_files) != 1:
            raise FileNotFoundError(
                f"need exactly one of {COMMON_CAPTION_FILES} in {root}, found {caption_files}")
        if len(media_files) != 1:
            raise FileNotFoundError(
                f"need exactly one of {self.media_list_files} in {root}, found {media_files}")
        with open(os.path.join(root, caption_files[0])) as f:
            captions = f.read().splitlines()
        with open(os.path.join(root, media_files[0])) as f:
            media = [os.path.join(root, line) for line in f.read().splitlines()]
        if len(captions) != len(media):
            raise ValueError(f"{len(captions)} captions != {len(media)} media files")
        self._items = list(zip(captions, media))

    def _decode(self, path: str) -> np.ndarray:
        return load_image(path)

    def _make_sample(self, item) -> Dict[str, Any]:
        caption, media_path = item
        return {"caption": caption, self.media_key: self._decode(media_path)}


class VideoFileCaptionFileListDataset(ImageFileCaptionFileListDataset):
    """caption.txt + video.txt lists (reference dataset.py:361-438)."""

    media_key = "video"
    media_list_files = COMMON_VIDEO_FILES

    def _decode(self, path: str) -> np.ndarray:
        return _load_video_norm(path)


def _read_metadata_rows(root: str) -> List[Dict[str, Any]]:
    for name in ("metadata.csv", "metadata.jsonl", "metadata.json"):
        path = os.path.join(root, name)
        if not os.path.exists(path):
            continue
        if name.endswith(".csv"):
            import pandas as pd

            return pd.read_csv(path).to_dict("records")
        if name.endswith(".jsonl"):
            with open(path) as f:
                return [json.loads(line) for line in f if line.strip()]
        with open(path) as f:
            return json.load(f)
    raise FileNotFoundError(f"no metadata.{{csv,jsonl,json}} in {root}")


class ImageFolderDataset(_StatefulIterable):
    """imagefolder layout: metadata file with file_name + caption columns
    (reference dataset.py:440-475, HF `imagefolder`)."""

    media_key = "image"

    def __init__(self, root: str, infinite: bool = False):
        super().__init__(infinite)
        self.root = root
        self._items = _read_metadata_rows(root)

    def _decode(self, path: str) -> np.ndarray:
        return load_image(path)

    def _make_sample(self, row) -> Dict[str, Any]:
        row = dict(row)
        fname = row.pop("file_name", None) or row.pop(self.media_key, None)
        caption = row.pop("caption", row.pop("text", row.pop("prompt", "")))
        sample = {"caption": str(caption),
                  self.media_key: self._decode(os.path.join(self.root, str(fname)))}
        sample.update(row)  # pass through extra metadata columns
        return sample


class VideoFolderDataset(ImageFolderDataset):
    """videofolder layout (reference dataset.py:477-512)."""

    media_key = "video"

    def _decode(self, path: str) -> np.ndarray:
        return _load_video_norm(path)


_WDS_CAPTION_KEYS = ("txt", "text", "caption", "captions", "prompt", "prompts",
                     "short_caption", "long_caption", "description", "descriptions")


class ImageWebDataset(_StatefulIterable):
    """WebDataset-style .tar shards grouped by key (reference dataset.py:
    514-606), read with stdlib tarfile — samples pair a caption entry
    (.txt/.json) with a media entry by shared basename."""

    media_key = "image"
    extensions = SUPPORTED_IMAGE_EXTENSIONS

    def __init__(self, root: str, infinite: bool = False):
        super().__init__(infinite)
        self.root = root
        shards = []
        for dirpath, _, files in os.walk(root):
            shards += [os.path.join(dirpath, f) for f in files if f.endswith(".tar")]
        if not shards:
            raise FileNotFoundError(f"no .tar shards under {root}")
        # items are (shard, key) pairs so state is index-resumable
        self._items = []
        for shard in sorted(shards):
            with tarfile.open(shard) as tf:
                keys = sorted({os.path.splitext(n)[0] for n in tf.getnames()
                               if os.path.splitext(n)[1].lstrip(".") in self.extensions})
            self._items += [(shard, key) for key in keys]

    def _decode(self, data: bytes) -> np.ndarray:
        return load_image(data)

    def _make_sample(self, item) -> Dict[str, Any]:
        shard, key = item
        caption, media = "", None
        with tarfile.open(shard) as tf:
            for name in tf.getnames():
                base, ext = os.path.splitext(name)
                if base != key:
                    continue
                ext = ext.lstrip(".")
                if ext in self.extensions:
                    media = tf.extractfile(name).read()
                elif ext in _WDS_CAPTION_KEYS or ext == "txt":
                    caption = tf.extractfile(name).read().decode().strip()
                elif ext == "json":
                    meta = json.loads(tf.extractfile(name).read())
                    for ck in _WDS_CAPTION_KEYS:
                        if ck in meta:
                            caption = str(meta[ck])
                            break
        if media is None:
            raise ValueError(f"no media for key {key} in {shard}")
        return {"caption": caption, self.media_key: self._decode(media)}


class VideoWebDataset(ImageWebDataset):
    media_key = "video"
    extensions = SUPPORTED_VIDEO_EXTENSIONS

    def _decode(self, data: bytes) -> np.ndarray:
        import tempfile

        # cv2 lacks an in-memory video decoder; spill to tmpfs
        with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
            f.write(data)
            f.flush()
            return _load_video_norm(f.name)


class DatasetPreprocessingWrapper(_StatefulIterable):
    """Column rename/drop, id_token prefixing, LLM caption-prefix removal
    (reference IterableDatasetPreprocessingWrapper, dataset.py:1364-1492 —
    bucket fitting happens later in the trainer, matching its flow)."""

    def __init__(self, dataset, *, id_token: Optional[str] = None,
                 rename_columns: Optional[Dict[str, str]] = None,
                 drop_columns: Optional[List[str]] = None,
                 remove_common_llm_caption_prefixes: bool = False):
        self.dataset = dataset
        self.id_token = id_token
        self.rename_columns = rename_columns or {}
        self.drop_columns = drop_columns or []
        self.remove_prefixes = remove_common_llm_caption_prefixes
        self.infinite = getattr(dataset, "infinite", False)

    def __len__(self):
        return len(self.dataset)

    def state_dict(self):
        return self.dataset.state_dict()

    def load_state_dict(self, state):
        self.dataset.load_state_dict(state)

    def __iter__(self):
        for sample in self.dataset:
            for col in self.drop_columns:
                sample.pop(col, None)
            sample = {self.rename_columns.get(k, k): v for k, v in sample.items()}
            caption = sample.get("caption", "")
            if self.remove_prefixes:
                caption = remove_llm_prefixes(caption)
            if self.id_token:
                caption = f"{self.id_token} {caption}"
            sample["caption"] = caption
            yield sample


class ControlDatasetWrapper(_StatefulIterable):
    """Augment samples with a control signal (reference IterableControlDataset,
    trainer/control_trainer/data.py:29-135): `canny` computes per-frame edges
    host-side; `none` copies the media; `custom` expects control_image /
    control_video columns already present in the dataset."""

    def __init__(self, dataset, control_type: str = "canny"):
        if control_type not in ("canny", "custom", "none"):
            raise ValueError(f"unknown control_type {control_type!r}")
        self.dataset = dataset
        self.control_type = control_type
        self.infinite = getattr(dataset, "infinite", False)

    def __len__(self):
        return len(self.dataset)

    def state_dict(self):
        return self.dataset.state_dict()

    def load_state_dict(self, state):
        self.dataset.load_state_dict(state)

    def __iter__(self):
        from ..training.control import canny_control

        for sample in self.dataset:
            if self.control_type == "custom":
                if "control_image" not in sample and "control_video" not in sample:
                    raise ValueError(
                        "control_type=custom requires control_image/control_video "
                        "columns in the dataset")
            elif "control_image" not in sample and "control_video" not in sample:
                if "image" in sample:
                    sample["control_image"] = (
                        canny_control(sample["image"][None])[0]
                        if self.control_type == "canny" else sample["image"].copy())
                elif "video" in sample:
                    sample["control_video"] = (
                        canny_control(sample["video"])
                        if self.control_type == "canny" else sample["video"].copy())
            yield sample


class CombinedDataset(_StatefulIterable):
    """Round-robin/shuffled combination of several datasets (reference
    IterableCombinedDataset, dataset.py:1494-1539)."""

    def __init__(self, datasets: List, buffer_size: int = 8, shuffle: bool = False,
                 seed: int = 0):
        self.datasets = datasets
        self.buffer_size = buffer_size
        self.shuffle = shuffle
        self.infinite = any(getattr(d, "infinite", False) for d in datasets)
        self._rng = random.Random(seed)

    def __len__(self):
        return sum(len(d) for d in self.datasets)

    def state_dict(self):
        return {"datasets": [d.state_dict() for d in self.datasets]}

    def load_state_dict(self, state):
        for d, s in zip(self.datasets, state["datasets"]):
            d.load_state_dict(s)

    def __iter__(self):
        iters = [iter(d) for d in self.datasets]
        buffer: List = []
        while iters:
            for it in list(iters):
                try:
                    buffer.append(next(it))
                except StopIteration:
                    iters.remove(it)
                if len(buffer) >= self.buffer_size:
                    if self.shuffle:
                        self._rng.shuffle(buffer)
                    yield from buffer
                    buffer = []
        yield from buffer


def _has_caption_pairs(root: str, extensions) -> bool:
    for fname in os.listdir(root):
        if fname.endswith(".txt") and _find_media_for_caption(
                os.path.join(root, fname), extensions):
            return True
    return False


def initialize_dataset(root: str, dataset_type: str = "video",
                       infinite: bool = False):
    """Auto-detect the local dataset layout (reference dataset.py:1542-1610 /
    _initialize_local_dataset). Hub datasets require network and are not
    supported in this offline build — pass a local path."""
    if dataset_type not in ("image", "video"):
        raise ValueError(f"dataset_type must be image|video, got {dataset_type}")
    if not os.path.isdir(root):
        raise FileNotFoundError(
            f"{root} is not a local directory (hub datasets need network access; "
            "download locally first)")
    img = dataset_type == "image"
    if any(os.path.exists(os.path.join(root, m))
           for m in ("metadata.csv", "metadata.jsonl", "metadata.json")):
        return (ImageFolderDataset if img else VideoFolderDataset)(root, infinite)
    has_tars = any(f.endswith(".tar") for _, _, fs in os.walk(root) for f in fs)
    if has_tars:
        return (ImageWebDataset if img else VideoWebDataset)(root, infinite)
    exts = SUPPORTED_IMAGE_EXTENSIONS if img else SUPPORTED_VIDEO_EXTENSIONS
    if _has_caption_pairs(root, exts):
        return (ImageCaptionFilePairDataset if img else VideoCaptionFilePairDataset)(root, infinite)
    lists = COMMON_IMAGE_FILES if img else COMMON_VIDEO_FILES
    if any(os.path.exists(os.path.join(root, f)) for f in lists):
        return (ImageFileCaptionFileListDataset if img else VideoFileCaptionFileListDataset)(root, infinite)
    raise ValueError(
        f"could not infer dataset layout under {root}: expected a metadata file, "
        ".tar shards, caption/media file pairs, or caption/media list files")


def combine_datasets(datasets: List, buffer_size: int = 8, shuffle: bool = False):
    return CombinedDataset(datasets, buffer_size=buffer_size, shuffle=shuffle)
