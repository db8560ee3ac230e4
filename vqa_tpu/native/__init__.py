"""Native host-side prep acceleration (SURVEY.md C4; 'native where it pays').

A C++ tokenizer+encoder loaded via ctypes (pybind11 isn't in this image; the
C ABI keeps the binding dependency-free). Built on demand with g++ into the
package directory and cached; everything degrades gracefully to the Python
tokenizer when a compiler isn't available — the Python implementation is the
semantics oracle either way (tests/test_native.py).

Usage:
    enc = NativeEncoder(wid_to_word)           # full table, <pad>/<unk> first
    ids, lengths = enc.encode_batch(questions, maxlength=26, pad="right")
"""

from __future__ import annotations

import ctypes
import fcntl
import os
import subprocess
import tempfile
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "tokenizer.cc")
_SO = os.path.join(_DIR, "_tokenizer.so")

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            # compile under a file lock to a temp file, then atomic-rename:
            # concurrent prep processes must never dlopen a half-written .so
            with open(_SO + ".lock", "w") as lockf:
                fcntl.flock(lockf, fcntl.LOCK_EX)
                try:
                    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
                        os.close(fd)
                        try:
                            subprocess.run(
                                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                                 _SRC, "-o", tmp],
                                check=True,
                                capture_output=True,
                            )
                            os.replace(tmp, _SO)
                        finally:
                            if os.path.exists(tmp):
                                os.unlink(tmp)
                finally:
                    fcntl.flock(lockf, fcntl.LOCK_UN)
        lib = ctypes.CDLL(_SO)
        lib.vt_build.restype = ctypes.c_void_p
        lib.vt_build.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.vt_free.argtypes = [ctypes.c_void_p]
        lib.vt_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32,
        ]
        _lib = lib
        return lib
    except (subprocess.CalledProcessError, OSError) as e:
        _build_error = str(e)
        return None


def available() -> bool:
    return _build() is not None


class NativeEncoder:
    """Vocab-bound tokenizer+encoder over the C++ core."""

    def __init__(self, wid_to_word: Sequence[str]):
        lib = _build()
        if lib is None:
            raise RuntimeError(f"native tokenizer unavailable: {_build_error}")
        self._lib = lib
        blob = "\n".join(wid_to_word).encode("utf-8")
        self._handle = ctypes.c_void_p(lib.vt_build(blob, len(blob)))

    def encode_batch(
        self, questions: Sequence[str], maxlength: int, pad: str = "right"
    ) -> Tuple[np.ndarray, np.ndarray]:
        n = len(questions)
        blob = "\n".join(q.replace("\n", " ") for q in questions).encode("utf-8")
        out = np.empty((n, maxlength), dtype=np.int32)
        lengths = np.empty(n, dtype=np.int32)
        self._lib.vt_encode_batch(
            self._handle,
            blob,
            len(blob),
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            maxlength,
            1 if pad == "right" else 0,
        )
        return out, lengths

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.vt_free(handle)
