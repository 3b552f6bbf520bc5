"""ctypes wrapper for the native C++ CIDEr-D scorer (native/cider.cpp).

Builds the shared library on first use (g++ -O3 -shared) next to the
source, with an atomic rename so concurrent processes don't race.  Falls
back to the pure-Python scorer (evals.metrics.CiderD) if the toolchain or
binary is unavailable.  Used for the SCST reward hot path (per-iteration
corpus-mode CIDEr over B*(K+1) captions).
"""

from __future__ import annotations

import ctypes
import logging
import os
import os.path as op
import subprocess
import tempfile
from typing import Dict, List, Optional, Tuple

import numpy as np

_NATIVE_DIR = op.normpath(op.join(op.dirname(__file__), "..", "..",
                                  "native"))
_SRC = op.join(_NATIVE_DIR, "cider.cpp")
_LIB = op.join(_NATIVE_DIR, "libcider.so")

_lib = None
_tried = False


def _build() -> Optional[str]:
    if op.isfile(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    tmp = tempfile.mktemp(suffix=".so", dir=_NATIVE_DIR)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _LIB)
        return _LIB
    except Exception as e:                       # pragma: no cover
        logging.info("native cider build failed: %s", e)
        try:
            os.remove(tmp)
        except OSError:
            pass
        return None


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.ciderd_corpus.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
    lib.ciderd_corpus.restype = None
    _lib = lib
    return _lib


def _intern(sentences: List[List[str]], vocab: Dict[str, int]
            ) -> Tuple[np.ndarray, np.ndarray]:
    words, offs = [], [0]
    for s in sentences:
        for w in s:
            words.append(vocab.setdefault(w, len(vocab)))
        offs.append(len(words))
    return (np.asarray(words, np.int32),
            np.asarray(offs, np.int64))


def ciderd_corpus_native(gts: Dict[str, List[str]],
                         res: Dict[str, List[str]],
                         sigma: float = 6.0
                         ) -> Optional[Tuple[float, np.ndarray]]:
    """Same interface/result as metrics.CiderD(df='corpus').compute_score;
    returns None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    keys = list(gts.keys())
    vocab: Dict[str, int] = {}
    hyps = [res[k][0].split() for k in keys]
    refs: List[List[str]] = []
    img_off = [0]
    for k in keys:
        for r in gts[k]:
            refs.append(r.split())
        img_off.append(len(refs))
    hw, ho = _intern(hyps, vocab)
    rw, ro = _intern(refs, vocab)
    io = np.asarray(img_off, np.int64)
    out = np.zeros(len(keys), np.float64)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    # guard against empty arrays (ctypes.data of empty array is fine)
    lib.ciderd_corpus(p(hw, ctypes.c_int32), p(ho, ctypes.c_int64),
                      p(rw, ctypes.c_int32), p(ro, ctypes.c_int64),
                      p(io, ctypes.c_int64), len(keys),
                      ctypes.c_double(sigma), p(out, ctypes.c_double))
    return float(out.mean()), out
