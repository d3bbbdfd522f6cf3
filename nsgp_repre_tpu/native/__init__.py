"""ctypes bindings for the native C++ evaluation kernels (native/).

Builds the .so on first use if the toolchain is available (g++/make are
baked into the image); every consumer falls back to numpy when the
library is missing, so the framework works without a compiler too.
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))), "native")
_SO_PATH = osp.join(_NATIVE_DIR, "libnsgp_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return osp.exists(_SO_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not osp.exists(_SO_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    # boxes are float64: float32 rounding flips the area-range
    # classification of boundary boxes vs the pycocotools oracle
    lib.coco_match.argtypes = [
        f64p, ctypes.c_int, f64p, u8p, ctypes.c_int,
        f64p, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        u8p, u8p, u8p,
    ]
    lib.coco_match.restype = None
    lib.voc_tpfp.argtypes = [
        f64p, ctypes.c_int, f64p, u8p, ctypes.c_int,
        ctypes.c_double, f32p, f32p,
    ]
    lib.voc_tpfp.restype = None
    _lib = lib
    return _lib


def coco_match_native(det_boxes, gt_boxes, gt_crowd, iou_thrs, area_lo, area_hi):
    """Returns (dt_matched (T,D) bool, dt_ignore (T,D) bool, gt_ignore (G,) bool)
    or None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    det_boxes = np.ascontiguousarray(det_boxes, np.float64)
    gt_boxes = np.ascontiguousarray(gt_boxes, np.float64)
    gt_crowd = np.ascontiguousarray(gt_crowd, np.uint8)
    iou_thrs = np.ascontiguousarray(iou_thrs, np.float64)
    D, G, T = len(det_boxes), len(gt_boxes), len(iou_thrs)
    dtm = np.zeros((T, max(D, 1)), np.uint8)
    dti = np.zeros((T, max(D, 1)), np.uint8)
    gti = np.zeros(max(G, 1), np.uint8)
    lib.coco_match(
        det_boxes, D, gt_boxes, gt_crowd, G, iou_thrs, T,
        float(area_lo), float(area_hi), dtm, dti, gti,
    )
    return dtm[:, :D].astype(bool), dti[:, :D].astype(bool), gti[:G].astype(bool)


def voc_tpfp_native(det_boxes, gt_boxes, gt_ignore, iou_thr):
    """Returns (tp, fp) float32 arrays or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    det_boxes = np.ascontiguousarray(det_boxes, np.float64)
    gt_boxes = np.ascontiguousarray(gt_boxes, np.float64)
    gt_ignore = np.ascontiguousarray(gt_ignore, np.uint8)
    D, G = len(det_boxes), len(gt_boxes)
    tp = np.zeros(max(D, 1), np.float32)
    fp = np.zeros(max(D, 1), np.float32)
    lib.voc_tpfp(det_boxes, D, gt_boxes, gt_ignore, G, float(iou_thr), tp, fp)
    return tp[:D], fp[:D]
