"""Native (C++) runtime components, loaded via ctypes.

Built on demand with g++ into a shared object cached next to the sources.
Every native component has a pure-Python fallback (the engine works without
a toolchain); formats are binary-identical so the two interoperate on the
same files.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LOAD_FAILED = False


def _build(so_path: str) -> bool:
    src = os.path.join(_HERE, "wal.cpp")
    cmd = [
        "g++",
        "-O2",
        "-shared",
        "-fPIC",
        "-std=c++17",
        src,
        "-o",
        so_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native library; None if unavailable."""
    global _LIB, _LOAD_FAILED
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _LOAD_FAILED:
            return None
        so_path = os.path.join(_HERE, "_qdrant_native.so")
        src = os.path.join(_HERE, "wal.cpp")
        if not os.path.exists(so_path) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(so_path)
        ):
            if not _build(so_path):
                _LOAD_FAILED = True
                return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            _LOAD_FAILED = True
            return None
        # WAL API
        lib.wal_open.restype = ctypes.c_void_p
        lib.wal_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.wal_next_op.restype = ctypes.c_uint64
        lib.wal_next_op.argtypes = [ctypes.c_void_p]
        lib.wal_append.restype = ctypes.c_uint64
        lib.wal_append.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_uint32,
        ]
        lib.wal_sync.argtypes = [ctypes.c_void_p]
        lib.wal_ack.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.wal_close.argtypes = [ctypes.c_void_p]
        lib.wal_read_from.restype = ctypes.c_void_p
        lib.wal_read_from.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.wal_cursor_next.restype = ctypes.c_int64
        lib.wal_cursor_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.wal_cursor_payload.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.wal_cursor_payload.argtypes = [ctypes.c_void_p]
        lib.wal_cursor_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB
