"""Shared ctypes loader for the native runtime library (native/evaluator.cpp).

Exposes the row-VM gate evaluator plus the scalar field kernels
(inner product, constant Montgomery multiply, RLC) used by the CPU
runtime paths — the roles rayon + halo2curves' 64-bit field arithmetic
play for the reference.  Built lazily with g++; callers must handle a
None return (no toolchain)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from functools import lru_cache

_NATIVE_DIR = os.path.join(
    os.path.dirname(__file__), "..", "..", "native"
)
_SRC = os.path.join(_NATIVE_DIR, "evaluator.cpp")
_SO = os.path.join(_NATIVE_DIR, "libmiraeval.so")
_build_lock = threading.Lock()

u64p = ctypes.POINTER(ctypes.c_uint64)
i32p = ctypes.POINTER(ctypes.c_int32)


@lru_cache(maxsize=1)
def load():
    with _build_lock:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            try:
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-pthread", _SRC, "-o", _SO,
                    ],
                    check=True,
                    capture_output=True,
                )
            except (OSError, subprocess.CalledProcessError):
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
    lib.mira_eval_fold.argtypes = [
        u64p, i32p, ctypes.c_size_t, ctypes.c_size_t,
        u64p, u64p, u64p,
        u64p, ctypes.c_size_t,
        u64p, ctypes.c_size_t,
        ctypes.c_size_t,
        u64p, ctypes.c_int, u64p,
    ]
    lib.mira_eval_fold.restype = None
    lib.mira_inner_product_mont.argtypes = [
        u64p, u64p, u64p, ctypes.c_size_t, ctypes.c_int, u64p,
    ]
    lib.mira_inner_product_mont.restype = None
    lib.mira_mul_const_mont.argtypes = [
        u64p, u64p, u64p, ctypes.c_size_t, ctypes.c_int, u64p,
    ]
    lib.mira_mul_const_mont.restype = None
    lib.mira_rlc_mont.argtypes = [
        u64p, u64p, u64p, u64p, ctypes.c_size_t, ctypes.c_int, u64p,
    ]
    lib.mira_rlc_mont.restype = None
    lib.mira_lincomb_mont.argtypes = [
        u64p, u64p, u64p,
        ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_int,
        u64p,
    ]
    lib.mira_lincomb_mont.restype = None
    return lib


def available() -> bool:
    return load() is not None
