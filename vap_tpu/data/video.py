"""Host-side video IO and preprocessing.

Replaces the reference's decord/ffmpeg pipeline (finetrainers/data/dataset.py
:802, :1317-1319; diffusers export_to_video): cv2 decode/encode, fps
resampling to 16 (get_resample_indices, dataset.py:119-135), bucket fitting
(functional/video.py:48-126), [-1, 1] normalization.
"""

from __future__ import annotations

import os
import tempfile
from typing import List, Optional, Sequence, Tuple

import numpy as np


def load_video(path: str, max_frames: Optional[int] = None) -> Tuple[np.ndarray, float]:
    """Returns (frames [F, H, W, 3] uint8 RGB, fps).

    Prefers the native C++ decoder (vap_tpu/native, libavcodec + thread pool);
    falls back to cv2."""
    try:
        from .. import native

        if native.available():
            n, h, w, fps = native.video_info(path)
            count = min(n, max_frames) if max_frames else n
            frames = native.decode_video(path, indices=range(count))
            if len(frames):
                return frames, fps
    except Exception:
        pass
    import cv2

    cap = cv2.VideoCapture(path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 16.0
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        if max_frames and len(frames) >= max_frames:
            break
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return np.stack(frames), float(fps)


def export_to_video(frames: np.ndarray, path: str, fps: int = 16) -> str:
    """frames: [F, H, W, 3] float in [0, 1] or uint8. Atomic write via tmp +
    rename (mirrors infer/cog_vap.py:23-42 export_via_tmp)."""
    import cv2

    if frames.dtype != np.uint8:
        frames = (np.clip(frames, 0, 1) * 255).round().astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    h, w = frames.shape[1:3]
    fd, tmp = tempfile.mkstemp(suffix=".mp4", dir=os.path.dirname(os.path.abspath(path)) or ".")
    os.close(fd)
    try:
        writer = cv2.VideoWriter(tmp, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        for f in frames:
            writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        writer.release()
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return path


def get_resample_indices(total_frames: int, original_fps: float, target_fps: float = 16.0) -> List[int]:
    """fps resampling to 16 (VideoAsPromptDataset, dataset.py:119-135)."""
    duration = total_frames / max(original_fps, 1e-6)
    target_count = max(int(round(duration * target_fps)), 1)
    idx = np.linspace(0, total_frames - 1, target_count).round().astype(np.int64)
    return idx.tolist()


def resize_frame(frame: np.ndarray, height: int, width: int) -> np.ndarray:
    """Bilinear (antialias) resize of one [H, W, 3] float frame."""
    import cv2

    return cv2.resize(frame, (width, height), interpolation=cv2.INTER_AREA
                      if frame.shape[0] > height else cv2.INTER_LINEAR)


def resize_video(frames: np.ndarray, height: int, width: int) -> np.ndarray:
    return np.stack([resize_frame(f, height, width) for f in frames])


def normalize_video(frames: np.ndarray) -> np.ndarray:
    """uint8/float[0,1] -> float32 in [-1, 1]."""
    f = frames.astype(np.float32)
    if frames.dtype == np.uint8:
        f = f / 255.0
    return f * 2.0 - 1.0


def resize_to_nearest_bucket_image(
    image: np.ndarray, buckets: Sequence[Tuple[int, int]]
) -> np.ndarray:
    """Fit an image [H, W, 3] to the aspect-nearest (height, width) bucket
    (finetrainers/functional/image.py resize_to_nearest_bucket_image)."""
    h, w = image.shape[:2]
    aspect = h / w
    bh, bw = min(buckets, key=lambda s: abs(s[0] / s[1] - aspect))
    return resize_video(image[None], bh, bw)[0]


def resize_to_nearest_bucket(
    frames: np.ndarray, buckets: Sequence[Tuple[int, int, int]],
    frames_selection: str = "evenly", rng=None,
) -> Tuple[np.ndarray, bool]:
    """Fit a video to the nearest (frames, height, width) bucket
    (finetrainers/functional/video.py:66-126): nearest-or-smaller frame
    bucket, aspect-nearest spatial bucket, temporal selection per
    frames_selection — 'evenly' (linspace, the reference default), 'first',
    or 'random' (contiguous window at a random start)."""
    f, h, w = frames.shape[:3]
    frame_buckets = sorted({b[0] for b in buckets})
    fb = max([b for b in frame_buckets if b <= f], default=frame_buckets[0])
    spatial = [(bh, bw) for (bf, bh, bw) in buckets if bf == fb]
    aspect = h / w
    bh, bw = min(spatial, key=lambda s: abs(s[0] / s[1] - aspect))

    first_frame_only = f < fb
    if f > fb:
        if frames_selection == "evenly":
            idx = np.linspace(0, f - 1, fb).astype(np.int64)
            frames = frames[idx]
        elif frames_selection == "first":
            frames = frames[:fb]
        elif frames_selection == "random":
            import random as _random

            start = (rng or _random).randint(0, f - fb)
            frames = frames[start:start + fb]
        else:
            raise ValueError(
                f"invalid frames_selection {frames_selection!r}; "
                "choose from 'evenly', 'first', 'random'")
    out = resize_video(frames, bh, bw)
    return out, first_frame_only
