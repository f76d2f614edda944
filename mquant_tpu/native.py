"""ctypes bindings for the native host-side data kernels (native/).

Every function has a numpy fallback so the framework works without the .so
(build with ``make -C native``). The native path accelerates the calibration /
evaluation data loader: image resize+normalize, model-order patchify, int8
quantize, and split-half int4 (un)packing for artifact creation.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("MQUANT_DISABLE_NATIVE") == "1":
        return None
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (os.path.join(here, "native", "libmquant_native.so"),
                 "libmquant_native.so"):
        try:
            lib = ctypes.CDLL(cand)
            lib.mq_version.restype = ctypes.c_int
            if lib.mq_version() >= 1:
                _LIB = lib
                break
        except OSError:
            continue
    return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def resize_normalize(img_u8: np.ndarray, size: Tuple[int, int],
                     mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)) -> np.ndarray:
    """uint8 (H, W, C) → float32 (dh, dw, C), bilinear + normalize."""
    dh, dw = size
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    sh, sw, c = img_u8.shape
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    lib = _load()
    if lib is not None:
        out = np.empty((dh, dw, c), np.float32)
        lib.mq_resize_normalize(
            _ptr(img_u8, ctypes.c_uint8), sh, sw, c,
            _ptr(out, ctypes.c_float), dh, dw,
            _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float))
        return out
    # numpy fallback (align_corners=True bilinear, matching the C++)
    ys = np.linspace(0, sh - 1, dh)
    xs = np.linspace(0, sw - 1, dw)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, sh - 1)
    x1 = np.minimum(x0 + 1, sw - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    f = img_u8.astype(np.float32)
    v = ((1 - wy) * ((1 - wx) * f[y0][:, x0] + wx * f[y0][:, x1])
         + wy * ((1 - wx) * f[y1][:, x0] + wx * f[y1][:, x1]))
    return ((v / 255.0 - mean) / std).astype(np.float32)


def patchify_2d(img: np.ndarray, p: int) -> np.ndarray:
    """float32 (H, W, C) → (gh*gw, p*p*C) — native mirror of
    models.vision.patchify_2d (single image)."""
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    gh, gw = h // p, w // p
    lib = _load()
    if lib is not None:
        out = np.empty((gh * gw, p * p * c), np.float32)
        lib.mq_patchify_2d(_ptr(img, ctypes.c_float), h, w, c, p,
                           _ptr(out, ctypes.c_float))
        return out
    x = img.reshape(gh, p, gw, p, c).transpose(0, 2, 1, 3, 4)
    return x.reshape(gh * gw, p * p * c)


def patchify_qwen2vl(img: np.ndarray, p: int) -> np.ndarray:
    """float32 (H, W, C) → (gh*gw, p*p*2*C) — native mirror of
    models.vision.patchify_qwen2vl (single image, temporal dup, merge order)."""
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    gh, gw = h // p, w // p
    lib = _load()
    if lib is not None:
        out = np.empty((gh * gw, p * p * 2 * c), np.float32)
        lib.mq_patchify_qwen2vl(_ptr(img, ctypes.c_float), h, w, c, p,
                                _ptr(out, ctypes.c_float))
        return out
    x = img.reshape(gh, p, gw, p, c).transpose(0, 2, 1, 3, 4)
    x = np.concatenate([x[..., None, :], x[..., None, :]], axis=-2)
    x = x.reshape(gh, gw, -1)
    x = x.reshape(gh // 2, 2, gw // 2, 2, x.shape[-1]).transpose(0, 2, 1, 3, 4)
    return x.reshape(gh * gw, -1)


def quantize_int8(x: np.ndarray, scale: float) -> np.ndarray:
    x = np.ascontiguousarray(x, np.float32)
    lib = _load()
    if lib is not None:
        out = np.empty(x.shape, np.int8)
        lib.mq_quantize_int8(_ptr(x, ctypes.c_float), ctypes.c_float(scale),
                             _ptr(out, ctypes.c_int8), ctypes.c_int64(x.size))
        return out
    return np.clip(np.rint(x / scale), -127, 127).astype(np.int8)


def pack_int4(q: np.ndarray) -> np.ndarray:
    """int8 (in, out) in [-8,7] → split-half packed (in/2, out)."""
    q = np.ascontiguousarray(q, np.int8)
    n, m = q.shape
    lib = _load()
    if lib is not None:
        out = np.empty((n // 2, m), np.int8)
        lib.mq_pack_int4(_ptr(q, ctypes.c_int8), n, m, _ptr(out, ctypes.c_int8))
        return out
    lo = q[: n // 2].astype(np.uint8) & 0x0F
    hi = q[n // 2:].astype(np.uint8) & 0x0F
    return (lo | (hi << 4)).astype(np.int8)


def unpack_int4(packed: np.ndarray) -> np.ndarray:
    packed = np.ascontiguousarray(packed, np.int8)
    half, m = packed.shape
    lib = _load()
    if lib is not None:
        out = np.empty((half * 2, m), np.int8)
        lib.mq_unpack_int4(_ptr(packed, ctypes.c_int8), half * 2, m,
                           _ptr(out, ctypes.c_int8))
        return out
    u = packed.astype(np.uint8)
    lo = (u & 0x0F).astype(np.int8)
    hi = ((u >> 4) & 0x0F).astype(np.int8)
    lo = np.where(lo >= 8, lo - 16, lo)
    hi = np.where(hi >= 8, hi - 16, hi)
    return np.concatenate([lo, hi], axis=0).astype(np.int8)
