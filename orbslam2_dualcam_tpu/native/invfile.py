"""ctypes wrapper for the native inverted-file index (invfile.cpp).

Compiled lazily with g++ -O2 into this package directory the first time it
is imported; subsequent imports reuse the cached .so (rebuilt when the
source is newer)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Set, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "invfile.cpp")
_SO = os.path.join(_DIR, "_invfile.so")


def _build() -> str:
    if (not os.path.exists(_SO) or
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
               "-o", _SO + ".tmp"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(_SO + ".tmp", _SO)
    return _SO


_lib = ctypes.CDLL(_build())
_lib.invfile_create.restype = ctypes.c_void_p
_lib.invfile_create.argtypes = [ctypes.c_int, ctypes.c_int]
_lib.invfile_destroy.argtypes = [ctypes.c_void_p]
_lib.invfile_add.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
                             ctypes.c_void_p, ctypes.c_int]
_lib.invfile_erase.argtypes = [ctypes.c_void_p, ctypes.c_int64]
_lib.invfile_clear.argtypes = [ctypes.c_void_p]
_lib.invfile_query.restype = ctypes.c_int
_lib.invfile_query.argtypes = [ctypes.c_void_p, ctypes.c_int,
                               ctypes.c_void_p, ctypes.c_int,
                               ctypes.c_void_p, ctypes.c_int,
                               ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_int]


class NativeInvertedFile:
    """Per-camera word -> keyframe postings with shared-word queries."""

    def __init__(self, n_cameras: int, n_words: int, cap: int = 4096):
        self._h = _lib.invfile_create(n_cameras, n_words)
        self._cap = cap

    def __del__(self):
        if getattr(self, "_h", None):
            _lib.invfile_destroy(self._h)
            self._h = None

    def add(self, kid: int, cam: int, words: np.ndarray) -> None:
        w = np.ascontiguousarray(words, np.int32)
        _lib.invfile_add(self._h, kid, cam, w.ctypes.data, len(w))

    def erase(self, kid: int) -> None:
        _lib.invfile_erase(self._h, kid)

    def clear(self) -> None:
        _lib.invfile_clear(self._h)

    def query(self, resp_cam: int, words: np.ndarray,
              exclude=()) -> Dict[int, int]:
        w = np.ascontiguousarray(words, np.int32)
        ex = np.ascontiguousarray(list(exclude), np.int64)
        kids = np.empty(self._cap, np.int64)
        cnts = np.empty(self._cap, np.int32)
        n = _lib.invfile_query(self._h, resp_cam, w.ctypes.data, len(w),
                               ex.ctypes.data, len(ex), kids.ctypes.data,
                               cnts.ctypes.data, self._cap)
        return dict(zip(kids[:n].tolist(), cnts[:n].tolist()))
