"""Native (C++) helpers, compiled on demand with the system toolchain.

No pip installs and no pybind11 exist in the deployment image, so native
code ships as sources compiled to a shared object on first use (g++ -O3,
cached beside the sources; falls back cleanly when no compiler exists)
and bound through ctypes.

Current components:
- exr_native.cpp: EXR scanline-block codec hot loops (inflate + ZIP
  predictor + HALF<->FLOAT + channel de/interleave). utils/exr.py uses it
  automatically when available.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

_DIR = Path(__file__).parent
_LOCK = threading.Lock()
_LIBS: dict[str, object] = {}


def _build(name: str) -> Path | None:
    src = _DIR / f"{name}.cpp"
    so = _DIR / f"{name}.so"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(src), "-o", str(so), "-lz"],
            check=True, capture_output=True, timeout=120,
        )
        return so
    except (OSError, subprocess.SubprocessError):
        return None


def load(name: str):
    """Load (building if needed) a native library; None when unavailable.
    Thread-safe; failures are cached as None."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        so = _build(name)
        lib = None
        if so is not None:
            try:
                lib = ctypes.CDLL(str(so))
            except OSError:
                lib = None
        _LIBS[name] = lib
        return lib


def exr_lib():
    """The EXR codec library with argtypes configured, or None."""
    lib = load("exr_native")
    if lib is None:
        return None
    if not getattr(lib, "_configured", False):
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.exr_decode_blocks.restype = ctypes.c_int
        lib.exr_decode_blocks.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i32p, ctypes.c_int, ctypes.c_int, f32p,
        ]
        lib.exr_compress_block.restype = ctypes.c_int64
        lib.exr_compress_block.argtypes = [
            u8p, ctypes.c_int64, u8p, ctypes.c_int64,
        ]
        lib._configured = True
    return lib
