"""Build + load the native (C++) components via ctypes.

The reference leans on external C binaries (bwa, samtools, HDF5 — ref
env.py27nanomod.yml); this framework's native layer is built in-tree with
g++ and loaded through ctypes, with a pure-Python fallback when no compiler
is available.  Libraries are rebuilt automatically when the source is newer
than the cached .so.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_CACHE = {}


_EXTRA_FLAGS = {
    "annotate_core": ["-pthread"],
    "fast5_ingest": ["-lz", "-pthread"],
    "fast5_write": ["-lz", "-pthread"],
    "sort_core": ["-pthread"],
    "traceback": ["-pthread"],
    "format_core": ["-pthread"],
}

# optional faster deflate backend (standard zlib output): first flag set
# that links wins; plain zlib is the guaranteed fallback
_OPTIONAL_FLAGS = {
    "fast5_write": [["-l:libdeflate.so.0"], ["-ldeflate"],
                    ["-DNO_LIBDEFLATE"]],
    "fast5_ingest": [["-l:libdeflate.so.0"], ["-ldeflate"],
                     ["-DNO_LIBDEFLATE"]],
}


def _build(name: str) -> str:
    src = os.path.join(_DIR, f"{name}.cpp")
    lib = os.path.join(_DIR, f"lib{name}.so")
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", lib, src] + _EXTRA_FLAGS.get(name, [])
    last = None
    for opt in _OPTIONAL_FLAGS.get(name, [[]]):
        try:
            subprocess.run(cmd + opt, check=True, capture_output=True)
            return lib
        except subprocess.CalledProcessError as e:
            last = e
    raise last


def load_native(name: str):
    """ctypes.CDLL for nanomod_tpu/native/<name>.cpp, building on demand.
    Returns None when the toolchain is unavailable."""
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        try:
            lib = ctypes.CDLL(_build(name))
        except (OSError, subprocess.CalledProcessError, FileNotFoundError):
            lib = None
        _CACHE[name] = lib
        return lib


def native_available(name: str) -> bool:
    return load_native(name) is not None
