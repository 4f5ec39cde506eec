"""Native host ops: ctypes bindings over libhostops.so (hostops.cc).

Compiled on first use (``make`` in this directory); every entry point has a
pure-numpy fallback so the package works without a toolchain.  See
hostops.cc for why these are native: they sit on the host half of the
host->HBM boundary, feeding quantized u8 batches to the device.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libhostops.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) <
            os.path.getmtime(os.path.join(_DIR, "hostops.cc"))):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # no toolchain -> numpy fallback
            warnings.warn(f"hostops native build failed ({e}); "
                          "using numpy fallbacks")
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        warnings.warn(f"hostops load failed ({e}); using numpy fallbacks")
        return None

    i64, i32, f32 = ctypes.c_int64, ctypes.c_int32, ctypes.c_float
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.i8ie_quantize_u8.argtypes = [f32p, i64, f32, i32, u8p]
    lib.i8ie_dequantize_u8.argtypes = [u8p, i64, f32, i32, f32p]
    lib.i8ie_normalize_nchw.argtypes = [u8p, i64, i64, i64, i64, f32p, f32p,
                                        f32p]
    lib.i8ie_resize_bilinear.argtypes = [u8p, i64, i64, i64, i64, i64, i64,
                                         u8p]
    lib.i8ie_preprocess_quantize.argtypes = [u8p, i64, i64, i64, i64, f32p,
                                             f32p, f32, i32, u8p]
    lib.i8ie_s2d_quantized.argtypes = [u8p, i64, i64, i64, i64, i64, i64,
                                       i64, i32, u8p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def quantize_u8(x: np.ndarray, scale: float, zero_point: int) -> np.ndarray:
    """f32 -> u8 asymmetric affine quantization on the host."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    lib = _load()
    if lib is None:
        t = np.clip(x / scale + zero_point, 0, 255)
        return t.astype(np.uint8)
    out = np.empty(x.shape, dtype=np.uint8)
    lib.i8ie_quantize_u8(_f32p(x), x.size, scale, zero_point, _u8p(out))
    return out


def dequantize_u8(q: np.ndarray, scale: float, zero_point: int) -> np.ndarray:
    q = np.ascontiguousarray(q, dtype=np.uint8)
    lib = _load()
    if lib is None:
        return (q.astype(np.float32) - zero_point) * scale
    out = np.empty(q.shape, dtype=np.float32)
    lib.i8ie_dequantize_u8(_u8p(q), q.size, scale, zero_point, _f32p(out))
    return out


def normalize_nchw(img_nhwc_u8: np.ndarray, mean, std) -> np.ndarray:
    """u8 NHWC images -> normalized f32 NCHW (ToTensor + Normalize)."""
    img = np.ascontiguousarray(img_nhwc_u8, dtype=np.uint8)
    n, h, w, c = img.shape
    mean = np.ascontiguousarray(mean, dtype=np.float32)
    std = np.ascontiguousarray(std, dtype=np.float32)
    lib = _load()
    if lib is None:
        x = img.astype(np.float32) / 255.0
        x = (x - mean) / std
        return np.ascontiguousarray(x.transpose(0, 3, 1, 2))
    out = np.empty((n, c, h, w), dtype=np.float32)
    lib.i8ie_normalize_nchw(_u8p(img), n, h, w, c, _f32p(mean), _f32p(std),
                            _f32p(out))
    return out


def resize_bilinear(img_nhwc_u8: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Bilinear resize u8 NHWC -> u8 NHWC (half-pixel centers)."""
    img = np.ascontiguousarray(img_nhwc_u8, dtype=np.uint8)
    n, h, w, c = img.shape
    lib = _load()
    if lib is None:
        ys = np.clip((np.arange(oh) + 0.5) * h / oh - 0.5, 0, h - 1)
        xs = np.clip((np.arange(ow) + 0.5) * w / ow - 0.5, 0, w - 1)
        y0 = ys.astype(np.int64); y1 = np.minimum(h - 1, y0 + 1)
        x0 = xs.astype(np.int64); x1 = np.minimum(w - 1, x0 + 1)
        wy = (ys - y0).astype(np.float32)[None, :, None, None]
        wx = (xs - x0).astype(np.float32)[None, None, :, None]
        f = img.astype(np.float32)
        top = f[:, y0][:, :, x0] * (1 - wx) + f[:, y0][:, :, x1] * wx
        bot = f[:, y1][:, :, x0] * (1 - wx) + f[:, y1][:, :, x1] * wx
        return (top * (1 - wy) + bot * wy + 0.5).astype(np.uint8)
    out = np.empty((n, oh, ow, c), dtype=np.uint8)
    lib.i8ie_resize_bilinear(_u8p(img), n, h, w, c, oh, ow, _u8p(out))
    return out


def preprocess_quantize(img_nhwc_u8: np.ndarray, mean, std, scale: float,
                        zero_point: int) -> np.ndarray:
    """Fused ingest: u8 NHWC -> normalize -> quantize -> u8 NCHW.

    The result feeds a converted model's quantized input directly (wrap with
    ``Tensor(jnp.asarray(out), scale, zp)``) — the host->device transfer is
    1/4 the bytes of the f32 path.
    """
    img = np.ascontiguousarray(img_nhwc_u8, dtype=np.uint8)
    n, h, w, c = img.shape
    mean = np.ascontiguousarray(mean, dtype=np.float32)
    std = np.ascontiguousarray(std, dtype=np.float32)
    lib = _load()
    if lib is None:
        x = normalize_nchw(img, mean, std)
        return quantize_u8(x, scale, zero_point)
    out = np.empty((n, c, h, w), dtype=np.uint8)
    lib.i8ie_preprocess_quantize(_u8p(img), n, h, w, c, _f32p(mean),
                                 _f32p(std), scale, zero_point, _u8p(out))
    return out


def s2d_quantized(q_nchw: np.ndarray, kernel: int, stride: int, padding: int,
                  zero_point: int) -> np.ndarray:
    """First-conv ingest pre-layout: u8 NCHW -> zp-pad + space-to-depth.

    One native pass producing the [n, hp/s, wp/s, s*s*c] u8 block layout
    that ops/conv.py's stride-1 rewritten conv consumes directly (see
    hostops.cc i8ie_s2d_quantized; numpy fallback mirrors ops/conv.s2d_input).
    """
    q = np.ascontiguousarray(q_nchw, dtype=np.uint8)
    n, c, h, w = q.shape
    k, s, p = int(kernel), int(stride), int(padding)
    lib = _load()
    if lib is None:
        from ..ops.conv import s2d_input
        x = np.ascontiguousarray(q.transpose(0, 2, 3, 1))
        if p:
            x = np.pad(x, ((0, 0), (p, p), (p, p), (0, 0)),
                       constant_values=np.uint8(zero_point))
        return s2d_input(x, k, k, s, np.uint8(zero_point))
    kp = -(-k // s)
    oh = (h + 2 * p - k) // s + 1
    ow = (w + 2 * p - k) // s + 1
    hb, wb = oh + kp - 1, ow + kp - 1
    out = np.empty((n, hb, wb, s * s * c), dtype=np.uint8)
    lib.i8ie_s2d_quantized(_u8p(q), n, c, h, w, k, s, p, int(zero_point),
                           _u8p(out))
    return out
