"""Native (C++) runtime components.

The compute path is JAX/XLA/Pallas; host-side runtime pieces that the
reference delegated to native libraries (GL rendering via OSMesa/EGL,
ffmpeg encoding — SURVEY.md §2c items 2 and 4) are provided here as
first-party C++ built on demand with the system toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC_DIR = os.path.join(_REPO, "native")
_BUILD_DIR = os.path.join(_SRC_DIR, "build")

_lock = threading.Lock()
_libs = {}


def _build(name: str) -> str:
    """Compile native/<name>.cc into build/lib<name>.so (mtime-cached)."""
    src = os.path.join(_SRC_DIR, f"{name}.cc")
    out = os.path.join(_BUILD_DIR, f"lib{name}.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        src, "-o", out,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return out


def load_library(name: str) -> ctypes.CDLL:
    with _lock:
        if name not in _libs:
            _libs[name] = ctypes.CDLL(_build(name))
        return _libs[name]
