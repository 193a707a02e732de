"""ctypes bindings for the native data-plane helpers (fastload.c).

The shared object is built on first use with the system compiler and cached
next to the source; everything degrades to numpy fallbacks when no compiler
is available, so the framework never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastload.c")
_SO = os.path.join(_HERE, "_fastload.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-fPIC", "-shared", "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=120,
            )
            return _SO
        except (FileNotFoundError, subprocess.SubprocessError) as exc:
            last = exc
    log.info("fastload native build unavailable: %s", last)
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _SO if os.path.isfile(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC) else _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.parse_ints.restype = ctypes.c_long
        lib.parse_ints.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
        ]
        lib.parse_file.restype = ctypes.c_long
        lib.parse_file.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
        ]
        lib.pad_pack.restype = None
        lib.pad_pack.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_long),
            ctypes.c_long, ctypes.c_long, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def parse_token_file(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        with open(path) as f:
            return np.asarray(f.readline().split(), dtype=np.int32)
    size = os.path.getsize(path)
    max_out = size // 2 + 2
    out = np.empty(max_out, np.int32)
    n = lib.parse_file(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_out,
    )
    if n < 0:
        raise ValueError(f"failed to parse token file {path}")
    return out[:n].copy()


def parse_tokens(text: bytes) -> np.ndarray:
    lib = _load()
    if lib is None:
        return np.asarray(text.split(), dtype=np.int32)
    max_out = len(text) // 2 + 2
    out = np.empty(max_out, np.int32)
    n = lib.parse_ints(
        text, len(text), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_out,
    )
    if n < 0:
        raise ValueError("malformed token text")
    return out[:n].copy()


def pad_pack(rows: List[np.ndarray], t: int, pad_value: int) -> np.ndarray:
    """Ragged int32 rows -> [len(rows), t] padded matrix."""
    b = len(rows)
    lib = _load()
    if lib is None:
        out = np.full((b, t), pad_value, np.int32)
        for i, r in enumerate(rows):
            n = min(len(r), t)
            out[i, :n] = r[:n]
        return out
    flat = np.concatenate([np.asarray(r, np.int32) for r in rows]) if rows \
        else np.empty(0, np.int32)
    offsets = np.zeros(b + 1, np.int64)
    np.cumsum([len(r) for r in rows], out=offsets[1:])
    out = np.empty((b, t), np.int32)
    lib.pad_pack(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        b, t, pad_value,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
