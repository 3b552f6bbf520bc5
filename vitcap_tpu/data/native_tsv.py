"""ctypes wrapper for the native TSV line-index builder
(native/tsvtools.cpp).

Python's per-line offset scan (tsv.generate_lineidx) is the reference's
approach (tsv_io.py:294-308) and takes minutes on multi-GB TSVs; the C++
scanner runs at disk speed and writes the `.lineidx.8b` binary sidecar
directly.  Same build-on-first-use + atomic-rename pattern as
evals/native_cider.py; callers fall back to the Python scan when the
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import os.path as op
import subprocess
import tempfile
from typing import Optional

_NATIVE_DIR = op.normpath(op.join(op.dirname(__file__), "..", "..",
                                  "native"))
_SRC = op.join(_NATIVE_DIR, "tsvtools.cpp")
_LIB = op.join(_NATIVE_DIR, "libtsvtools.so")

_lib = None
_tried = False


def _build() -> Optional[str]:
    try:
        if not op.isfile(_SRC):
            return None
        if op.isfile(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_NATIVE_DIR)
        os.close(fd)
    except OSError as e:                         # pragma: no cover
        logging.info("native tsvtools unavailable: %s", e)
        return None
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _LIB)
        return _LIB
    except Exception as e:                       # pragma: no cover
        logging.info("native tsvtools build failed: %s", e)
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
        if path:
            try:
                lib = ctypes.CDLL(path)
                lib.build_lineidx_8b.argtypes = [ctypes.c_char_p,
                                                 ctypes.c_char_p]
                lib.build_lineidx_8b.restype = ctypes.c_longlong
                _lib = lib
            except OSError as e:                 # pragma: no cover
                # stale/foreign-arch binary: fall back to the Python scan
                logging.info("native tsvtools load failed: %s", e)
    return _lib


def build_lineidx_8b(tsv_path: str, out_path: str) -> Optional[int]:
    """Write the `.lineidx.8b` sidecar natively; returns the line count or
    None if the native path is unavailable/failed (caller falls back to the
    Python scan)."""
    lib = _get_lib()
    if lib is None:
        return None
    n = lib.build_lineidx_8b(tsv_path.encode(), out_path.encode())
    return int(n) if n >= 0 else None
