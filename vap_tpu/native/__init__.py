"""ctypes bindings for the native host runtime (C++ video decoder).

Builds lazily with `make` on first use; falls back to the cv2 path in
vap_tpu/data/video.py when the shared library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libvap_decoder.so")
_lib = None


def _load(build: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vap_video_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double)]
    lib.vap_video_info.restype = ctypes.c_int
    lib.vap_decode_video.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.vap_decode_video.restype = ctypes.c_int
    lib.vap_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int)), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    lib.vap_decode_batch.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def video_info(path: str) -> Tuple[int, int, int, float]:
    """(num_frames, height, width, fps)"""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = ctypes.c_int()
    h = ctypes.c_int()
    w = ctypes.c_int()
    fps = ctypes.c_double()
    rc = lib.vap_video_info(path.encode(), ctypes.byref(n), ctypes.byref(h), ctypes.byref(w), ctypes.byref(fps))
    if rc < 0:
        raise IOError(f"vap_video_info({path}) failed: {rc}")
    return n.value, h.value, w.value, fps.value


def decode_video(path: str, indices: Optional[Sequence[int]] = None,
                 out_h: Optional[int] = None, out_w: Optional[int] = None) -> np.ndarray:
    """Decode (selected) frames to uint8 RGB [F, out_h, out_w, 3]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n, h, w, _ = video_info(path)
    out_h = out_h or h
    out_w = out_w or w
    if indices is None:
        idx = np.arange(n, dtype=np.int32)
    else:
        idx = np.asarray(sorted(indices), dtype=np.int32)
    out = np.empty((len(idx), out_h, out_w, 3), np.uint8)
    rc = lib.vap_decode_video(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(idx))
    if rc < 0:
        raise IOError(f"vap_decode_video({path}) failed: {rc}")
    return out[:rc]


def decode_batch(paths: List[str], indices: List[Optional[Sequence[int]]],
                 out_h: int, out_w: int, nthreads: int = 8) -> List[np.ndarray]:
    """Decode multiple files concurrently on the native thread pool."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = len(paths)
    idx_arrays = []
    for p, ind in zip(paths, indices):
        if ind is None:
            cnt, _, _, _ = video_info(p)
            ind = range(cnt)
        idx_arrays.append(np.asarray(sorted(ind), dtype=np.int32))
    outs = [np.empty((len(ix), out_h, out_w, 3), np.uint8) for ix in idx_arrays]

    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_outs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for o in outs])
    c_idx = (ctypes.POINTER(ctypes.c_int) * n)(
        *[ix.ctypes.data_as(ctypes.POINTER(ctypes.c_int)) for ix in idx_arrays])
    c_n_idx = (ctypes.c_int * n)(*[len(ix) for ix in idx_arrays])
    results = (ctypes.c_int * n)()
    lib.vap_decode_batch(c_paths, n, c_outs, out_h, out_w, c_idx, c_n_idx, nthreads, results)
    final = []
    for o, r, p in zip(outs, results, paths):
        if r < 0:
            raise IOError(f"decode failed for {p}: {r}")
        final.append(o[:r])
    return final
