"""ctypes bridge to the native C++ parser (libsidtpu).

The native library implements the identical mpileup grammar as
``sid_tpu.io.pileup_py`` (reference grammar: pileup.cpp:70-167) with a
multithreaded byte-range scanner, filling preallocated NumPy buffers in one
pass. It is built from ``sid_tpu/native`` via ``python -m sid_tpu.native.build``
(plain g++, no external deps). When the shared library is absent the Python
backend is used transparently.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

_LIB_NAMES = ("libsidtpu.so",)
_lib: Optional[ctypes.CDLL] = None
_lib_checked = False


def _find_library() -> Optional[str]:
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [
        os.path.join(here, "..", "native", name) for name in _LIB_NAMES
    ] + [os.path.join(here, "..", "..", "build", name) for name in _LIB_NAMES]
    env = os.environ.get("SIDTPU_NATIVE_LIB")
    if env:
        candidates.insert(0, env)
    for c in candidates:
        if os.path.exists(c):
            return os.path.abspath(c)
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    path = _find_library()
    if path is None and not os.environ.get("SIDTPU_NO_BUILD"):
        try:
            from sid_tpu.native.build import build

            path = build(verbose=False)
        except Exception:
            return None
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    # int sidtpu_parse(const char* data, int64 n, int want_reads,
    #                  SidParseOut* out)  -- see sid_tpu/native/parser.cpp
    lib.sidtpu_parse.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse(data: bytes, parse_bq: bool, parse_mq: bool, errors,
          terms_only: bool = False):
    """Parse via the native library. Falls back by raising if unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libsidtpu is not built")
    from sid_tpu.native.bridge import parse_with_lib

    return parse_with_lib(lib, data, parse_bq, parse_mq, errors,
                          terms_only=terms_only)
