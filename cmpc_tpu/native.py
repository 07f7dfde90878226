"""ctypes bindings for the native host-runtime library (native/).

The reference reaches all its native muscle through Python bindings
(dartpy, casadi); here the first-party native pieces — URDF parsing
(urdf_parser.cpp) and the binary trace sink (trace_sink.cpp) — load from
`native/libcmpc_host.so` the same way.  Everything degrades gracefully:
:func:`available` gates callers, and the pure-Python equivalents
(rbd.urdf.parse_urdf, runtime.trace) remain the fallback, so the library
is an accelerator, never a hard dependency.

Build with `make -C native` (or :func:`build`).
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcmpc_host.so")
_lib = None


def build(quiet: bool = True) -> bool:
    """Compile the native library in-tree; returns success."""
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True, capture_output=quiet)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.cmpc_parse_urdf.restype = ctypes.c_int
    lib.cmpc_parse_urdf.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                    ctypes.c_long]
    lib.ts_open.restype = ctypes.c_void_p
    lib.ts_open.argtypes = [ctypes.c_char_p, ctypes.c_uint, ctypes.c_uint]
    lib.ts_append.restype = ctypes.c_int
    lib.ts_append.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_float), ctypes.c_uint]
    lib.ts_flush.restype = ctypes.c_int
    lib.ts_flush.argtypes = [ctypes.c_void_p]
    lib.ts_rows_written.restype = ctypes.c_long
    lib.ts_rows_written.argtypes = [ctypes.c_void_p]
    lib.ts_close.restype = ctypes.c_int
    lib.ts_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def parse_urdf_spec(path: str, cap: int = 1 << 22) -> dict:
    """Parse a URDF with the native parser -> robot spec dict (the same
    format as rbd.urdf._read_urdf_xml)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    buf = ctypes.create_string_buffer(cap)
    n = lib.cmpc_parse_urdf(path.encode(), buf, cap)
    if n == -1:
        raise FileNotFoundError(path)
    if n < 0:
        raise ValueError(f"cmpc_parse_urdf failed with code {n}")
    return json.loads(buf.raw[:n].decode())


class TraceSink:
    """Streamed float32 row logger backed by the native buffered writer."""

    MAGIC = b"CMPCTRC1"

    def __init__(self, path: str, ncols: int, buf_rows: int = 4096):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built (make -C native)")
        self._lib = lib
        self._h = lib.ts_open(path.encode(), ncols, buf_rows)
        if not self._h:
            raise OSError(f"ts_open failed for {path}")
        self.ncols = ncols
        self.path = path

    def append(self, rows: np.ndarray) -> None:
        rows = np.ascontiguousarray(rows, dtype=np.float32)
        if rows.ndim == 1:
            rows = rows[None, :]
        assert rows.shape[1] == self.ncols
        rc = self._lib.ts_append(
            self._h, rows.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rows.shape[0])
        if rc != 0:
            raise OSError(f"ts_append failed ({rc})")

    def rows_written(self) -> int:
        return int(self._lib.ts_rows_written(self._h))

    def close(self) -> None:
        if self._h:
            self._lib.ts_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    @staticmethod
    def read(path: str) -> np.ndarray:
        """Load a sink file -> (rows, ncols) float32 array."""
        with open(path, "rb") as f:
            magic = f.read(8)
            if magic != TraceSink.MAGIC:
                raise ValueError(f"{path}: not a CMPCTRC1 file")
            ncols = int(np.frombuffer(f.read(8), np.uint32)[0])
            data = np.frombuffer(f.read(), np.float32)
        return data.reshape(-1, ncols)
