"""Native (C++) IO runtime with transparent pure-Python fallbacks.

The shared library is built lazily from ``remode_native.cpp`` with the
system g++ on first use and cached next to the source; if no compiler is
available every entry point silently falls back to numpy implementations
with identical semantics (the tests cover both paths).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "remode_native.cpp")
_LIB = os.path.join(_HERE, "_remode_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib():
    """The loaded ctypes library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.rmd_parse_float_file.restype = ctypes.c_long
        lib.rmd_parse_float_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_float,
        ]
        lib.rmd_write_ply.restype = ctypes.c_int
        lib.rmd_write_ply.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        lib.rmd_read_pgm.restype = ctypes.c_int
        lib.rmd_read_pgm.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


def parse_float_file(path: str, count: int, scale: float = 1.0) -> np.ndarray:
    """Parse ``count`` whitespace-separated floats, scaled. The dataset's
    .depth files store centimetres; pass scale=0.01 for metres
    (test/dataset.cpp:180)."""
    lib = get_lib()
    if lib is not None:
        out = np.empty(count, np.float32)
        n = lib.rmd_parse_float_file(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            count,
            scale,
        )
        if n == count:
            return out
        if n >= 0:
            raise ValueError(f"{path}: expected {count} floats, found {n}")
        raise FileNotFoundError(path)
    with open(path) as f:
        vals = np.array(f.read().split(), dtype=np.float32)
    if vals.size < count:
        raise ValueError(f"{path}: expected {count} floats, found {vals.size}")
    return vals[:count] * scale


def write_ply(path: str, xyz: np.ndarray, intensity: np.ndarray) -> None:
    """Binary little-endian PLY with per-point intensity (the file-export
    analog of the reference's PointXYZI cloud, src/publisher.cpp:69-104)."""
    xyz = np.ascontiguousarray(xyz, np.float32).reshape(-1, 3)
    intensity = np.ascontiguousarray(intensity, np.float32).reshape(-1)
    assert xyz.shape[0] == intensity.shape[0]
    n = xyz.shape[0]
    lib = get_lib()
    if lib is not None:
        rc = lib.rmd_write_ply(
            path.encode(),
            xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            intensity.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
        )
        if rc == 0:
            return
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float intensity\nend_header\n"
    )
    data = np.concatenate([xyz, intensity[:, None]], axis=1).astype("<f4")
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(data.tobytes())


def read_pgm(path: str) -> np.ndarray:
    """Binary 8-bit PGM (P5) -> uint8 [H, W]."""
    lib = get_lib()
    if lib is not None:
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = lib.rmd_read_pgm(path.encode(), None, 0, ctypes.byref(w), ctypes.byref(h))
        if rc == 0:
            out = np.empty(h.value * w.value, np.uint8)
            rc = lib.rmd_read_pgm(
                path.encode(),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                out.size,
                ctypes.byref(w),
                ctypes.byref(h),
            )
            if rc == 0:
                return out.reshape(h.value, w.value)
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic != b"P5":
            raise ValueError(f"{path}: not a binary PGM")
        dims = []
        while len(dims) < 3:
            line = f.readline()
            if line.startswith(b"#"):
                continue
            dims += [int(tok) for tok in line.split()]
        w_, h_ = dims[0], dims[1]
        return np.frombuffer(f.read(w_ * h_), np.uint8).reshape(h_, w_)
