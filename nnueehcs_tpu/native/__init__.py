"""Native (C++) fast path for delimited-text dataset ingest.

``load_delimited`` parses large numeric tables via a multithreaded
mmap+strtod C++ parser (``fastload.cpp``), bound through ctypes.  The
shared library is compiled lazily with the system ``g++`` on first use and
cached; any failure (no compiler, malformed file, non-numeric cells) falls
back to the pandas reader transparently — the native path is an
optimisation, never a requirement.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB = None
_LIB_LOCK = threading.Lock()
_BUILD_FAILED = False

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    'fastload.cpp')


def _cache_dir() -> str:
    d = os.environ.get('NNUEEHCS_TPU_NATIVE_DIR') or os.path.join(
        os.path.expanduser('~'), '.cache', 'nnueehcs_tpu_native')
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> Optional[str]:
    so_path = os.path.join(_cache_dir(), '_fastload.so')
    if os.path.exists(so_path) and \
            os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    cmd = ['g++', '-O3', '-std=c++17', '-shared', '-fPIC',
           '-o', so_path, _SRC, '-lpthread']
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so_path
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def _get_lib():
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    with _LIB_LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        so_path = _build()
        if so_path is None:
            _BUILD_FAILED = True
            return None
        lib = ctypes.CDLL(so_path)
        lib.fl_parse.restype = ctypes.POINTER(ctypes.c_double)
        lib.fl_parse.argtypes = [ctypes.c_char_p, ctypes.c_char,
                                 ctypes.c_long,
                                 ctypes.POINTER(ctypes.c_long),
                                 ctypes.POINTER(ctypes.c_long)]
        lib.fl_free.restype = None
        lib.fl_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        _LIB = lib
    return _LIB


_DELIM_MAP = {r'\s+': 0, ' ': 0, '\t': 0, ',': ord(','), ';': ord(';'),
              '|': ord('|')}


def load_delimited(path: str, delimiter: str,
                   skip_rows: int = 0) -> Optional[np.ndarray]:
    """Parse a numeric delimited file into a (rows, cols) float64 array.
    Returns None when the native path is unavailable or the file isn't a
    clean numeric table (caller falls back to pandas)."""
    if not isinstance(path, str) or delimiter not in _DELIM_MAP:
        return None
    lib = _get_lib()
    if lib is None:
        return None
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    ptr = lib.fl_parse(path.encode(), _DELIM_MAP[delimiter], skip_rows,
                       ctypes.byref(rows), ctypes.byref(cols))
    if not ptr:
        return None
    try:
        n = rows.value * cols.value
        arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
        return arr.reshape(rows.value, cols.value)
    finally:
        lib.fl_free(ptr)
