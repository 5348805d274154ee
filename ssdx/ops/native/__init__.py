"""ctypes loader for the native host-side kernels (ssdx_native.cpp).

The shared library is compiled on first use with g++ (cached next to the
source, rebuilt when the source is newer).  Everything degrades gracefully:
``available()`` is False when no compiler is present and callers fall back to
the numpy implementations.
"""
from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["available", "match_detections", "match_detections_ignore", "nms_diou"]

_DIR = Path(__file__).parent
_SRC = _DIR / "ssdx_native.cpp"
_LIB = _DIR / "libssdx_native.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
        lib.ssdx_match_detections.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.c_float, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.ssdx_match_detections.restype = None
        lib.ssdx_match_detections_ignore.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.ssdx_match_detections_ignore.restype = None
        lib.ssdx_nms_diou.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_float, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ssdx_nms_diou.restype = ctypes.c_int32
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def match_detections(
    det_boxes: np.ndarray, gt_boxes: np.ndarray, iou_thresh: float
) -> np.ndarray:
    """Greedy COCO matching: det_boxes [n,4] (score-desc order) vs gt_boxes
    [m,4]; returns uint8 TP flags [n]."""
    lib = _load()
    det = np.ascontiguousarray(det_boxes, np.float32)
    gt = np.ascontiguousarray(gt_boxes, np.float32)
    out = np.zeros(len(det), np.uint8)
    lib.ssdx_match_detections(
        _fptr(det), np.int32(len(det)), _fptr(gt), np.int32(len(gt)),
        np.float32(iou_thresh), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def match_detections_ignore(
    det_boxes: np.ndarray,
    gt_boxes: np.ndarray,
    gt_ig: np.ndarray,
    iou_thresh: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Ignore-aware greedy COCO matching (pycocotools evaluateImg) for one
    (image, class, area-range) group.

    det_boxes [n,4] score-desc; gt_boxes [m,4]; gt_ig [m] bool (True =
    out-of-range GT).  Returns (tp [n] bool, matched_ignored [n] bool) —
    the exact contract of ssdx.eval.map._match_with_ignore.  GTs are sorted
    non-ignored-first here (the kernel requires it; the matching result is
    order-independent given that invariant).
    """
    lib = _load()
    order = np.argsort(np.asarray(gt_ig, bool), kind="stable")
    det = np.ascontiguousarray(det_boxes, np.float32)
    gt = np.ascontiguousarray(np.asarray(gt_boxes)[order], np.float32)
    ig = np.ascontiguousarray(np.asarray(gt_ig, np.uint8)[order])
    tp = np.zeros(len(det), np.uint8)
    mig = np.zeros(len(det), np.uint8)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.ssdx_match_detections_ignore(
        _fptr(det), np.int32(len(det)), _fptr(gt), np.int32(len(gt)),
        ig.ctypes.data_as(u8), np.float32(iou_thresh),
        tp.ctypes.data_as(u8), mig.ctypes.data_as(u8),
    )
    return tp.astype(bool), mig.astype(bool)


def nms_diou(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    """Exact greedy DIoU-NMS; returns kept indices (score-desc order)."""
    lib = _load()
    b = np.ascontiguousarray(boxes, np.float32)
    s = np.ascontiguousarray(scores, np.float32)
    keep = np.zeros(len(b), np.int32)
    n = lib.ssdx_nms_diou(
        _fptr(b), _fptr(s), np.int32(len(b)), np.float32(thresh),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return keep[:n].copy()
