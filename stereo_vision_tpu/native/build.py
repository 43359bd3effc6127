"""Build/load the native host-ops extension.

Compiles host_ops.cpp with g++ (-O3 -march=native -fopenmp) into a cached
shared object next to the package, on first use. No pybind11 — plain
CPython C API (the environment ships no pybind11; SURVEY.md environment
notes). Falls back gracefully: callers use numpy paths when the toolchain
or compiled module is unavailable.
"""

from __future__ import annotations

import importlib.util
import subprocess
import sys
import sysconfig
from pathlib import Path

_SRC = Path(__file__).with_name("host_ops.cpp")
_CACHE_DIR = Path(__file__).parent / "_build"


def _so_path() -> Path:
    tag = sysconfig.get_config_var("SOABI") or "cpython"
    return _CACHE_DIR / f"_host_ops.{tag}.so"


def build(force: bool = False) -> Path | None:
    """Compile the extension; returns the .so path or None on failure."""
    so = _so_path()
    if so.exists() and not force and so.stat().st_mtime >= _SRC.stat().st_mtime:
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
        str(_SRC),
        "-o",
        str(so),
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
    except (OSError, subprocess.SubprocessError):
        return None
    if r.returncode != 0:
        sys.stderr.write(f"host_ops build failed:\n{r.stderr}\n")
        return None
    return so


def load():
    """Import the compiled module (building if needed); None on failure."""
    so = build()
    if so is None:
        return None
    spec = importlib.util.spec_from_file_location("_host_ops", so)
    if spec is None or spec.loader is None:
        return None
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except ImportError:
        return None
    return mod
