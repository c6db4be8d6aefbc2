"""Native host kernels (C, loaded via ctypes; built on first import).

Currently: the 8-bit BGR<->Lab fixed-point conversions — the host image-I/O
side of every edit. Falls back silently to the NumPy implementations in
nle_tpu.color.lab when no C compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "labcolor.c")
_SO = os.path.join(_DIR, "_labcolor.so")
# Local-build marker: the .so is compiled with -march=native, so a binary
# copied from another machine (or shipped in a wheel) must not be trusted.
_MARKER = os.path.join(_DIR, "_labcolor.built")

_lib = None
# One build/load at a time: the serving server calls the Lab conversion
# from concurrent request threads, and two first-callers racing the
# check-build-dlopen sequence could have one compiler rewriting the very
# .so the other just dlopen'ed (SIGBUS on its file-backed mappings).
_load_lock = threading.Lock()


def _build() -> bool:
    # Compile to a private temp name, then os.replace into place: CDLL in
    # this (or another) process always opens a COMPLETE file — never one a
    # linker is still writing — and the old inode stays valid for anyone
    # who already mapped it.
    tmp = f"{_SO}.tmp-{os.getpid()}"
    flag_sets = (
        ["-O3", "-march=native", "-fopenmp", "-shared", "-fPIC"],
        ["-O3", "-shared", "-fPIC"],   # retry without OpenMP
    )
    for flags in flag_sets:
        for cc in ("cc", "gcc", "clang"):
            try:
                subprocess.run(
                    [cc, *flags, _SRC, "-o", tmp],
                    check=True, capture_output=True,
                )
                os.replace(tmp, _SO)
                return True
            except (OSError, subprocess.CalledProcessError):
                continue
    if os.path.exists(tmp):
        os.unlink(tmp)
    return False


def load():
    """Load (building if needed) the native library; None if unavailable.
    Thread-safe: concurrent first calls serialize on a lock."""
    global _lib
    if _lib is not None:
        return _lib
    with _load_lock:
        if _lib is not None:
            return _lib
        return _load_locked()


def _load_locked():
    global _lib
    try:
        import platform

        marker = f"{platform.node()}:{os.path.getmtime(_SRC)}"
        stale = True
        if os.path.exists(_SO) and os.path.exists(_MARKER):
            with open(_MARKER) as fh:
                stale = fh.read().strip() != marker
        if stale:
            if not _build():
                return None
            with open(_MARKER, "w") as fh:
                fh.write(marker)
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.bgr2lab_u8.argtypes = [u8p, u8p, ctypes.c_size_t, i32p, i32p, i32p,
                               ctypes.c_int32, ctypes.c_int32]
    lib.bgr2lab_u8.restype = None
    lib.lab2bgr_u8.argtypes = [u8p, u8p, ctypes.c_size_t, i32p, i32p, i32p,
                               ctypes.c_int32, ctypes.c_int32, i64p, u8p,
                               i32p, i32p]
    lib.lab2bgr_u8.restype = None
    _lib = lib
    return lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def bgr2lab_u8(bgr: np.ndarray, gamma_tab, cbrt_tab, coeffs, l_scale, l_shift):
    lib = load()
    assert lib is not None
    bgr = np.ascontiguousarray(bgr, np.uint8)
    out = np.empty_like(bgr)
    lib.bgr2lab_u8(
        _ptr(bgr, ctypes.c_uint8), _ptr(out, ctypes.c_uint8),
        bgr.size // 3,
        _ptr(gamma_tab, ctypes.c_int32), _ptr(cbrt_tab, ctypes.c_int32),
        _ptr(coeffs, ctypes.c_int32),
        int(l_scale), int(l_shift),
    )
    return out


def lab2bgr_u8(lab: np.ndarray, y_tab, ify_tab, ab_tab, min_ab, coeffs,
               gamma_tab, adiv_tab, bdiv_tab):
    lib = load()
    assert lib is not None
    lab = np.ascontiguousarray(lab, np.uint8)
    out = np.empty_like(lab)
    lib.lab2bgr_u8(
        _ptr(lab, ctypes.c_uint8), _ptr(out, ctypes.c_uint8),
        lab.size // 3,
        _ptr(y_tab, ctypes.c_int32), _ptr(ify_tab, ctypes.c_int32),
        _ptr(ab_tab, ctypes.c_int32), int(min_ab), int(ab_tab.size),
        _ptr(coeffs, ctypes.c_int64), _ptr(gamma_tab, ctypes.c_uint8),
        _ptr(adiv_tab, ctypes.c_int32), _ptr(bdiv_tab, ctypes.c_int32),
    )
    return out
