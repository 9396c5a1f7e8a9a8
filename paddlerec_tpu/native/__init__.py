"""Native (C++) runtime components and their ctypes bindings.

The reference ships C++ for its data path (tools/dataset/parser.cpp, the
engine-side QueueDataset readers) and serving path (tools/inference/cpp
cube KV client).  The TPU-era equivalents live in ``native/``:

  * criteo_parser   — stdin→stdout preprocess filter (pipe_command style)
  * libfastreader   — multithreaded slot-text → array batch parser
  * libcubekv       — mmap'd sorted-KV embedding shards for serving

Binaries build on demand with g++ (cached under native/build/); every
Python wrapper degrades gracefully when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_NATIVE_DIR = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native")
)
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")


class NativeUnavailable(RuntimeError):
    pass


def _build(target: str, sources, extra_flags=()) -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    out = os.path.join(_BUILD_DIR, target)
    srcs = [os.path.join(_NATIVE_DIR, s) for s in sources]
    if os.path.exists(out) and all(
        os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs
    ):
        return out
    cmd = ["g++", "-O3", "-std=c++17", *extra_flags, "-o", out, *srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise NativeUnavailable(
            f"building {target} failed: {detail}"
        ) from e
    return out


def build_criteo_parser() -> str:
    """Build (if needed) and return the criteo_parser binary path."""
    return _build("criteo_parser", ["criteo_parser.cpp"])


_fastreader: Optional[ctypes.CDLL] = None


def fastreader() -> ctypes.CDLL:
    global _fastreader
    if _fastreader is None:
        so = _build(
            "libfastreader.so", ["fast_reader.cpp"],
            ["-shared", "-fPIC", "-pthread"],
        )
        lib = ctypes.CDLL(so)
        lib.frd_parse_file.restype = ctypes.c_long
        lib.frd_parse_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_long,
            ctypes.c_int, ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_float),
        ]
        lib.frd_count_lines.restype = ctypes.c_long
        lib.frd_count_lines.argtypes = [ctypes.c_char_p]
        _fastreader = lib
    return _fastreader


_cubekv: Optional[ctypes.CDLL] = None


def cubekv() -> ctypes.CDLL:
    global _cubekv
    if _cubekv is None:
        so = _build("libcubekv.so", ["cube_kv.cpp"], ["-shared", "-fPIC"])
        lib = ctypes.CDLL(so)
        lib.cube_build.restype = ctypes.c_int
        lib.cube_build.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
        ]
        lib.cube_open.restype = ctypes.c_void_p
        lib.cube_open.argtypes = [ctypes.c_char_p]
        lib.cube_dim.restype = ctypes.c_long
        lib.cube_dim.argtypes = [ctypes.c_void_p]
        lib.cube_count.restype = ctypes.c_long
        lib.cube_count.argtypes = [ctypes.c_void_p]
        lib.cube_lookup.restype = ctypes.c_long
        lib.cube_lookup.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_longlong),
            ctypes.c_long, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.cube_close.restype = None
        lib.cube_close.argtypes = [ctypes.c_void_p]
        _cubekv = lib
    return _cubekv


def build_cube_server() -> str:
    """Build (if needed) and return the cube_server daemon binary."""
    return _build("cube_server", ["cube_server.cpp"], ["-pthread"])
