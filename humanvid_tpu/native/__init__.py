"""Native (C++) host runtime: libav video decode/encode.

The reference leans on external native binaries for all IO-heavy work —
decord's C++ random-access decoder and PyAV's ffmpeg bindings
(reference ``environment.yml:276,86``; ``src/utils/util.py:82-197``). This
package builds an in-tree C++ core (``videodec.cpp``) against the system
FFmpeg and exposes it via ctypes (``humanvid_tpu.data.native_video``).

``load_library()`` compiles on first use (cached by source mtime) so the repo
carries source, not binaries.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "videodec.cpp")
_SO = os.path.join(_DIR, "libhvt_video.so")

_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _needs_build() -> bool:
    return not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC)


def build() -> str:
    """Compile the shared library (idempotent); returns its path."""
    if _needs_build():
        cmd = [
            os.environ.get("CXX", "g++"), "-O2", "-fPIC", "-std=c++17", "-shared",
            "-o", _SO, _SRC, "-lavformat", "-lavcodec", "-lavutil", "-lswscale",
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _SO


def load_library() -> ctypes.CDLL:
    """Build if needed and load the native library (raises on failure)."""
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            raise RuntimeError(f"native video library unavailable: {_build_error}")
        try:
            path = build()
            lib = ctypes.CDLL(path)
        except Exception as e:  # compiler or ffmpeg libs missing
            _build_error = str(e)
            raise RuntimeError(f"native video library unavailable: {e}") from e

        c = ctypes
        lib.hvt_last_error.restype = c.c_char_p
        lib.hvt_vd_open.restype = c.c_void_p
        lib.hvt_vd_open.argtypes = [c.c_char_p]
        lib.hvt_vd_width.restype = c.c_int
        lib.hvt_vd_width.argtypes = [c.c_void_p]
        lib.hvt_vd_height.restype = c.c_int
        lib.hvt_vd_height.argtypes = [c.c_void_p]
        lib.hvt_vd_frames.restype = c.c_int64
        lib.hvt_vd_frames.argtypes = [c.c_void_p]
        lib.hvt_vd_fps.restype = c.c_double
        lib.hvt_vd_fps.argtypes = [c.c_void_p]
        lib.hvt_vd_read.restype = c.c_int
        lib.hvt_vd_read.argtypes = [
            c.c_void_p, c.POINTER(c.c_int64), c.c_int64, c.POINTER(c.c_uint8)
        ]
        lib.hvt_vd_close.argtypes = [c.c_void_p]
        lib.hvt_ve_open.restype = c.c_void_p
        lib.hvt_ve_open.argtypes = [c.c_char_p, c.c_int, c.c_int, c.c_double, c.c_int]
        lib.hvt_ve_write.restype = c.c_int
        lib.hvt_ve_write.argtypes = [c.c_void_p, c.POINTER(c.c_uint8), c.c_int64]
        lib.hvt_ve_close.restype = c.c_int
        lib.hvt_ve_close.argtypes = [c.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False
