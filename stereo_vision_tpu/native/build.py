"""Build/load the native host extensions.

Compiles each .cpp with g++ (-O3 -fopenmp) into a cached shared object
next to the package, on first use. No pybind11 — plain CPython C API (the
environment ships no pybind11; SURVEY.md environment notes). Falls back
gracefully: callers use numpy/queue paths when the toolchain or compiled
module is unavailable.

Modules:
  host_ops   — grayscale pack + brightness scans (host_ops.cpp)
  frame_ring — blocking frame-window ring buffer (frame_ring.cpp)
"""

from __future__ import annotations

import importlib.util
import subprocess
import sys
import sysconfig
from pathlib import Path

_HERE = Path(__file__).parent
_CACHE_DIR = _HERE / "_build"

_SOURCES = {
    "host_ops": _HERE / "host_ops.cpp",
    "frame_ring": _HERE / "frame_ring.cpp",
}


def _so_path(name: str) -> Path:
    tag = sysconfig.get_config_var("SOABI") or "cpython"
    return _CACHE_DIR / f"_{name}.{tag}.so"


def build(name: str = "host_ops", force: bool = False) -> Path | None:
    """Compile the named extension; returns the .so path or None on failure."""
    src = _SOURCES[name]
    so = _so_path(name)
    if so.exists() and not force and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    _CACHE_DIR.mkdir(exist_ok=True)
    include = sysconfig.get_path("include")
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-fopenmp",
        f"-I{include}",
        str(src),
        "-o",
        str(so),
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
    except (OSError, subprocess.SubprocessError):
        return None
    if r.returncode != 0:
        sys.stderr.write(f"{name} build failed:\n{r.stderr}\n")
        return None
    return so


def load(name: str = "host_ops"):
    """Import the compiled module (building if needed); None on failure."""
    so = build(name)
    if so is None:
        return None
    spec = importlib.util.spec_from_file_location(f"_{name}", so)
    if spec is None or spec.loader is None:
        return None
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except ImportError:
        return None
    return mod
