"""Native (C++) components.

The reference implements its performance-critical machinery in native
code (Rust + SIMD intrinsics). Here the *compute* path is native via
XLA/Pallas; the one CPU-side hot spot is circuit construction (ROBDD
builds at circuit-build time), implemented in C++ (`bdd_native.cpp`)
with a pure-Python fallback (`circuits/bdd.py`).

`get_native_bdd()` returns the compiled extension module or None.
The extension is built on demand into this directory; see `build.py`.
"""

from __future__ import annotations

import os

_cached = None
_tried = False


def get_native_bdd():
    global _cached, _tried
    if _tried:
        return _cached
    _tried = True
    try:
        from . import bdd_native  # pre-built in-tree

        _cached = bdd_native
        return _cached
    except ImportError:
        pass
    try:
        from .build import build_extension

        _cached = build_extension()
    except Exception:
        _cached = None
    return _cached
