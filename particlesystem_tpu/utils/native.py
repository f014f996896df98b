"""ctypes bindings for the native runtime library (native/psnative.cpp).

Builds on demand with the in-repo Makefile if the shared object is missing;
every entry point has a pure-Python fallback so the framework works without
a toolchain (``has_native()`` reports which path is active).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libpsnative.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


class PsPlane(ctypes.Structure):
    _fields_ = [("px", ctypes.c_float), ("py", ctypes.c_float),
                ("pz", ctypes.c_float), ("nx", ctypes.c_float),
                ("ny", ctypes.c_float), ("nz", ctypes.c_float),
                ("restitution", ctypes.c_float), ("friction", ctypes.c_float)]


class PsSphere(ctypes.Structure):
    _fields_ = [("cx", ctypes.c_float), ("cy", ctypes.c_float),
                ("cz", ctypes.c_float), ("radius", ctypes.c_float),
                ("restitution", ctypes.c_float), ("friction", ctypes.c_float)]


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    lib.ps_now.restype = ctypes.c_double
    lib.ps_ring_create.restype = ctypes.c_void_p
    lib.ps_ring_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
    lib.ps_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.ps_ring_try_push.restype = ctypes.c_int
    lib.ps_ring_try_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_size_t]
    lib.ps_ring_try_pop.restype = ctypes.c_int
    lib.ps_ring_try_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_size_t]
    lib.ps_ring_fill.restype = ctypes.c_size_t
    lib.ps_ring_fill.argtypes = [ctypes.c_void_p]
    lib.ps_emitter_step.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(PsPlane), ctypes.c_int,
        ctypes.POINTER(PsSphere), ctypes.c_int,
    ]
    _lib = lib
    return _lib


def has_native() -> bool:
    return get_lib() is not None
