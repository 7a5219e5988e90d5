"""Native (C++) kernels, built on demand with g++ and bound via ctypes.

Currently: `marching_cubes` — the mesh-extraction kernel replacing the
reference's patched scikit-image wheel. The shared library is compiled
once into this directory (`_marching_cubes.so`) and cached; rebuilds are
triggered by a newer source mtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}


def _build(name: str, src: str, out: str):
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:  # pragma: no cover
        raise RuntimeError(
            f"failed to build native kernel {name}:\n{e.stderr}") from e


def load_library(name: str) -> ctypes.CDLL:
    """Loads (building if stale) the shared library for `<name>.cpp`."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        src = os.path.join(_DIR, f"{name}.cpp")
        out = os.path.join(_DIR, f"_{name}.so")
        if not os.path.exists(out) or (os.path.getmtime(out)
                                       < os.path.getmtime(src)):
            _build(name, src, out)
        lib = ctypes.CDLL(out)
        _LIBS[name] = lib
        return lib
