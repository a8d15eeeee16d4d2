"""Byte-level BPE tokenizer: ctypes bindings over the native C++ core
(native/tokenizer.cpp), with a pure-Python fallback.

The native library is built on demand (`make -C native`) and loaded via
ctypes — no pybind11 in this image. Vocab format: a merges list of
(left_id, right_id, new_id) ranked by priority, plus optional byte-token
remapping handled by the caller.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnnop_tokenizer.so")


def _load_native():
    src = os.path.join(_NATIVE_DIR, "tokenizer.cpp")
    stale = (
        os.path.exists(_LIB_PATH)
        and os.path.exists(src)
        and os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
    )
    if not os.path.exists(_LIB_PATH) or stale:
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-B"] if stale
                else ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
            )
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.tok_create.restype = ctypes.c_void_p
    lib.tok_create.argtypes = [
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_uint32,
    ]
    lib.tok_destroy.argtypes = [ctypes.c_void_p]
    lib.tok_encode.restype = ctypes.c_uint32
    lib.tok_encode.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32),
    ]
    return lib


_LIB = None
_LIB_TRIED = False


def _lib():
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB = _load_native()
        _LIB_TRIED = True
    return _LIB


class BPETokenizer:
    """merges: ordered list of (left_id, right_id, new_id); ids 0..255 are
    raw bytes. decode() inverts via a recursive expansion table."""

    def __init__(self, merges: list[tuple[int, int, int]]):
        self.merges = list(merges)
        self._expand = {}
        for left, right, new in merges:
            self._expand[new] = (left, right)
        lib = _lib()
        self._handle = None
        if lib is not None:
            lefts = np.asarray([m[0] for m in merges], np.uint32)
            rights = np.asarray([m[1] for m in merges], np.uint32)
            ids = np.asarray([m[2] for m in merges], np.uint32)
            self._lefts, self._rights, self._ids = lefts, rights, ids  # keep alive
            self._handle = lib.tok_create(
                lefts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                rights.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                len(merges),
            )

    def __del__(self):
        lib = _lib()
        if lib is not None and getattr(self, "_handle", None):
            lib.tok_destroy(self._handle)
            self._handle = None

    @property
    def native(self) -> bool:
        return self._handle is not None

    def encode(self, text: str) -> list[int]:
        data = text.encode("utf-8")
        if self._handle is not None:
            lib = _lib()
            buf = np.frombuffer(data, np.uint8)
            out = np.empty(max(len(data), 1), np.uint32)
            n = lib.tok_encode(
                self._handle,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                len(data),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            )
            return out[:n].astype(int).tolist()
        return self._encode_py(data)

    def _encode_py(self, data: bytes) -> list[int]:
        ranks = {
            (left, right): (rank, new)
            for rank, (left, right, new) in enumerate(self.merges)
        }
        toks = list(data)
        while True:
            best = None
            for i in range(len(toks) - 1):
                r = ranks.get((toks[i], toks[i + 1]))
                if r is not None and (best is None or r[0] < best[0]):
                    best = (r[0], i, r[1])
            if best is None:
                return toks
            _, i, new = best
            toks[i : i + 2] = [new]

    def decode(self, ids: list[int]) -> str:
        out = bytearray()

        def expand(t):
            if t < 256:
                out.append(t)
            else:
                left, right = self._expand[t]
                expand(left)
                expand(right)

        for t in ids:
            expand(t)
        return out.decode("utf-8", errors="replace")
