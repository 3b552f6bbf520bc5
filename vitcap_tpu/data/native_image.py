"""ctypes wrapper for the native image pipeline (native/imageproc.cpp):
fused JPEG decode + PIL-compatible bicubic resize + center crop.

The predict path's host cost is dominated by jpeg decode + resize
(~17 ms/image/core through PIL on the dev host); the native path decodes
at a DCT-scaled size (libjpeg M/8 scaling, never below the resize target)
and resizes only the crop window, cutting the per-image host cost ~3x.
Same build-on-first-use + atomic-rename pattern as data/native_tsv.py;
callers fall back to PIL when the toolchain or libjpeg is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import os.path as op
import subprocess
import tempfile
from typing import Optional

import numpy as np

_NATIVE_DIR = op.normpath(op.join(op.dirname(__file__), "..", "..",
                                  "native"))
_SRC = op.join(_NATIVE_DIR, "imageproc.cpp")
_LIB = op.join(_NATIVE_DIR, "libimageproc.so")

_lib = None
_tried = False


def _build() -> Optional[str]:
    try:
        if not op.isfile(_SRC):
            return None
        if op.isfile(_LIB) and \
                os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_NATIVE_DIR)
        os.close(fd)
    except OSError as e:                         # pragma: no cover
        logging.info("native imageproc unavailable: %s", e)
        return None
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", tmp, "-ljpeg"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _LIB)
        return _LIB
    except Exception as e:                       # pragma: no cover
        logging.info("native imageproc build failed: %s", e)
        try:
            os.remove(tmp)
        except OSError:
            pass
        return None


def _get_lib():
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.vc_jpeg_dims.restype = ctypes.c_int
            lib.vc_jpeg_dims.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.vc_jpeg_decode.restype = ctypes.c_int
            lib.vc_jpeg_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
            lib.vc_resize_bicubic_crop.restype = None
            lib.vc_resize_bicubic_crop.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
            _lib = lib
        except OSError as e:                     # pragma: no cover
            logging.info("native imageproc load failed: %s", e)
            return None
    return _lib


def available() -> bool:
    return _get_lib() is not None


def decode_jpeg(data: bytes, min_short: int = 0) -> Optional[np.ndarray]:
    """JPEG bytes -> (h, w, 3) uint8 RGB, decoded at the smallest libjpeg
    M/8 scale whose short side stays >= min_short (0 = full size).
    None when the lib is unavailable or the payload is not a JPEG."""
    lib = _get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.vc_jpeg_dims(data, len(data), min_short,
                        ctypes.byref(w), ctypes.byref(h)):
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.vc_jpeg_decode(data, len(data), min_short,
                          out.ctypes.data_as(ctypes.c_void_p),
                          w.value, h.value):
        return None
    return out


def resize_bicubic_crop(img: np.ndarray, resize_wh, crop_xywh
                        ) -> Optional[np.ndarray]:
    """PIL-compatible antialiased bicubic resize of uint8 HWC `img` to
    (rw, rh), materializing only the (cx, cy, cw, ch) crop window."""
    lib = _get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    sh, sw = img.shape[:2]
    rw, rh = resize_wh
    cx, cy, cw, ch = crop_xywh
    dst = np.empty((ch, cw, 3), np.uint8)
    lib.vc_resize_bicubic_crop(
        img.ctypes.data_as(ctypes.c_void_p), sw, sh, rw, rh,
        cx, cy, cw, ch, dst.ctypes.data_as(ctypes.c_void_p))
    return dst


def decode_resize_center_crop(data: bytes, resize_size: int,
                              crop_size: int,
                              fast: bool = False) -> Optional[np.ndarray]:
    """The fused predict-path transform: decode -> short-side resize to
    `resize_size` (torchvision Resize(int) semantics) -> center crop to
    (crop_size, crop_size).  Returns uint8 HWC or None on any failure
    (caller falls back to PIL).

    fast=False decodes at full size — output is BIT-EXACT vs the PIL
    decode+resize+crop path (tested).  fast=True decodes at the smallest
    libjpeg M/8 DCT scale covering `resize_size` (~2.4x on large images;
    mean deviation <1 LSB, same class as PIL's Image.draft)."""
    lib = _get_lib()
    if lib is None:
        return None
    # target dims follow the ORIGINAL image size (torchvision Resize(int)
    # computes them before any decode-time scaling)
    w0 = ctypes.c_int()
    h0 = ctypes.c_int()
    if lib.vc_jpeg_dims(data, len(data), 0, ctypes.byref(w0),
                        ctypes.byref(h0)):
        return None
    w, h = w0.value, h0.value
    if w < h:
        nw, nh = resize_size, int(resize_size * h / w)
    else:
        nw, nh = int(resize_size * w / h), resize_size
    img = decode_jpeg(data, min_short=resize_size if fast else 0)
    if img is None:
        return None
    left = (nw - crop_size) // 2
    top = (nh - crop_size) // 2
    if left < 0 or top < 0:
        return None                  # image smaller than crop: PIL path
    return resize_bicubic_crop(img, (nw, nh),
                               (left, top, crop_size, crop_size))
