"""ctypes bindings to the native host library (csrc/socio_host.cpp).

Native replacements for the reference's cv2/scipy/PIL host hot paths, with
pure-python/numpy fallbacks when the library can't be built. `available()`
reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        so_path = os.path.join(root, "csrc", "libsocio_host.so")
        if not os.path.exists(so_path):
            import importlib.util
            spec = importlib.util.spec_from_file_location(
                "socio_build", os.path.join(root, "csrc", "build.py"))
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            so_path = mod.build()
        lib = ctypes.CDLL(so_path)
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        c_f32p = ctypes.POINTER(ctypes.c_float)
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_f64p = ctypes.POINTER(ctypes.c_double)
        i64 = ctypes.c_int64
        lib.resize_bilinear_u8.argtypes = [c_u8p, i64, i64, i64, c_u8p, i64, i64]
        lib.resize_nearest_u8.argtypes = [c_u8p, i64, i64, i64, c_u8p, i64, i64]
        lib.patchify_normalize.argtypes = [c_u8p, i64, i64, c_f32p, c_f32p,
                                           i64, i64, i64, c_f32p]
        lib.connected_components.argtypes = [c_u8p, i64, i64, c_i32p]
        lib.connected_components.restype = i64
        lib.component_boxes.argtypes = [c_u8p, i64, i64, i64, c_i64p, i64]
        lib.component_boxes.restype = i64
        lib.hungarian.argtypes = [c_f64p, i64, i64, c_i64p]
        lib.mask_iou.argtypes = [c_u8p, c_u8p, i64]
        lib.mask_iou.restype = ctypes.c_double
        lib.render_overlay.argtypes = [c_u8p, i64, i64, c_i64p, i64,
                                       ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
                                       i64, c_u8p, i64, i64,
                                       ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
                                       ctypes.c_double]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def resize_u8(img: np.ndarray, out_hw: Tuple[int, int], mode: str = "bilinear"
              ) -> np.ndarray:
    """uint8 (H, W[, C]) resize."""
    lib = _load()
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    oh, ow = out_hw
    out = np.empty((oh, ow, c), np.uint8)
    if lib is not None:
        fn = lib.resize_bilinear_u8 if mode == "bilinear" else lib.resize_nearest_u8
        fn(_ptr(img, ctypes.c_uint8), h, w, c, _ptr(out, ctypes.c_uint8), oh, ow)
    else:
        from PIL import Image
        resample = Image.Resampling.BILINEAR if mode == "bilinear" else Image.Resampling.NEAREST
        out = np.asarray(Image.fromarray(img.squeeze() if squeeze else img)
                         .resize((ow, oh), resample))
        out = out.reshape(oh, ow, c)
    return out[:, :, 0] if squeeze else out


def patchify_normalize(img: np.ndarray, mean: np.ndarray, std: np.ndarray,
                       patch_size: int = 14, merge_size: int = 2,
                       temporal_patch_size: int = 2) -> Optional[np.ndarray]:
    """uint8 HWC (pre-resized) → (S, 3*tps*ps*ps) float32 Qwen patch rows.
    Returns None if the native lib is unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    gh, gw = h // patch_size, w // patch_size
    out = np.empty((gh * gw, 3 * temporal_patch_size * patch_size ** 2), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.patchify_normalize(_ptr(img, ctypes.c_uint8), h, w,
                           _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
                           patch_size, merge_size, temporal_patch_size,
                           _ptr(out, ctypes.c_float))
    return out


def connected_components_count(mask: np.ndarray) -> int:
    lib = _load()
    mask = np.ascontiguousarray((np.asarray(mask) > 0).astype(np.uint8))
    h, w = mask.shape
    if lib is not None:
        return int(lib.connected_components(_ptr(mask, ctypes.c_uint8), h, w, None))
    import cv2
    n, *_ = cv2.connectedComponentsWithStats(mask * 255, connectivity=8)
    return n - 1


def component_boxes(mask: np.ndarray, min_area: int = 10, max_boxes: int = 512
                    ) -> List[List[int]]:
    """[x1, y1, x2, y2] per component with pixel area > min_area."""
    lib = _load()
    mask = np.ascontiguousarray((np.asarray(mask) > 0).astype(np.uint8))
    h, w = mask.shape
    if lib is not None:
        out = np.zeros((max_boxes, 5), np.int64)
        n = int(lib.component_boxes(_ptr(mask, ctypes.c_uint8), h, w, min_area,
                                    _ptr(out, ctypes.c_int64), max_boxes))
        return out[:n, :4].tolist()
    import cv2
    contours, _ = cv2.findContours(mask * 255, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    boxes = []
    for cnt in contours:
        if cv2.contourArea(cnt) > min_area:
            x, y, bw, bh = cv2.boundingRect(cnt)
            boxes.append([x, y, x + bw, y + bh])
    return boxes


def hungarian(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal-cost assignment (scipy linear_sum_assignment equivalent)."""
    lib = _load()
    cost = np.ascontiguousarray(cost, np.float64)
    n, m = cost.shape
    if lib is None:
        from scipy.optimize import linear_sum_assignment
        return linear_sum_assignment(cost)
    if n <= m:
        out = np.zeros(n, np.int64)
        lib.hungarian(_ptr(cost, ctypes.c_double), n, m, _ptr(out, ctypes.c_int64))
        return np.arange(n), out
    costT = np.ascontiguousarray(cost.T)
    out = np.zeros(m, np.int64)
    lib.hungarian(_ptr(costT, ctypes.c_double), m, n, _ptr(out, ctypes.c_int64))
    return out, np.arange(m)


def mask_iou_native(a: np.ndarray, b: np.ndarray, empty_value: float = 0.0) -> float:
    lib = _load()
    a = np.ascontiguousarray((np.asarray(a) > 0).astype(np.uint8)).reshape(-1)
    b = np.ascontiguousarray((np.asarray(b) > 0).astype(np.uint8)).reshape(-1)
    if lib is not None:
        v = float(lib.mask_iou(_ptr(a, ctypes.c_uint8), _ptr(b, ctypes.c_uint8),
                               a.size))
        return empty_value if v < 0 else v
    inter = np.logical_and(a, b).sum()
    uni = np.logical_or(a, b).sum()
    return empty_value if uni == 0 else float(inter / uni)


def render_overlay(img: np.ndarray, boxes: List[List[int]],
                   mask: Optional[np.ndarray], *,
                   box_color=(0, 0, 255), box_width: int = 2,
                   mask_color=(255, 0, 0), alpha: float = 0.4) -> np.ndarray:
    """RGB uint8 copy with bbox outlines + alpha mask overlay (native render
    path for the stage-2 restage)."""
    lib = _load()
    out = np.ascontiguousarray(np.asarray(img), np.uint8).copy()
    h, w = out.shape[:2]
    if lib is not None:
        barr = np.ascontiguousarray(np.asarray(boxes, np.int64).reshape(-1, 4)) \
            if boxes else np.zeros((0, 4), np.int64)
        if mask is not None:
            m = np.ascontiguousarray((np.asarray(mask) > 0).astype(np.uint8))
            mp, mh, mw = _ptr(m, ctypes.c_uint8), m.shape[0], m.shape[1]
        else:
            mp, mh, mw = None, 0, 0
        lib.render_overlay(_ptr(out, ctypes.c_uint8), h, w,
                           _ptr(barr, ctypes.c_int64), len(barr),
                           box_color[0], box_color[1], box_color[2], box_width,
                           mp, mh, mw, mask_color[0], mask_color[1],
                           mask_color[2], alpha)
        return out
    # fallback: PIL
    from PIL import Image, ImageDraw
    pil = Image.fromarray(out)
    draw = ImageDraw.Draw(pil)
    for b in boxes or []:
        draw.rectangle([(b[0], b[1]), (b[2], b[3])],
                       outline=tuple(box_color), width=box_width)
    out = np.asarray(pil).copy()
    if mask is not None:
        m = resize_u8((np.asarray(mask) > 0).astype(np.uint8) * 255, (h, w),
                      "nearest") > 0
        out[m] = (out[m] * (1 - alpha) + np.array(mask_color) * alpha).astype(np.uint8)
    return out
