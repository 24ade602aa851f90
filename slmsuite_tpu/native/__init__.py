"""
Native (C) runtime components, loaded via ctypes.

The TPU compute path is jax/XLA/Pallas; these C kernels cover host-side
hot loops around it — currently the frame-rate SLM write-path conversion
(:mod:`phase2gray`). Compiled on demand with the system compiler and
cached next to the source; everything degrades gracefully to numpy if no
compiler is available.
"""

import ctypes
import os
import subprocess
import sysconfig
import warnings

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_TRIED = False


def _build_library():
    """Compile phase2gray.c to a shared library (cached)."""
    source = os.path.join(_HERE, "phase2gray.c")
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    target = os.path.join(_HERE, "_phase2gray" + suffix)

    if os.path.exists(target) and os.path.getmtime(target) >= os.path.getmtime(source):
        return target

    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-shared", "-fPIC", "-o", target, source, "-lm"]
    subprocess.run(cmd, check=True, capture_output=True)
    return target


def _get_library():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        path = _build_library()
        lib = ctypes.CDLL(path)
        for name, phase_t, disp_t in [
            ("phase2gray_u8", ctypes.c_double, ctypes.c_uint8),
            ("phase2gray_u16", ctypes.c_double, ctypes.c_uint16),
            ("phase2gray_f32_u8", ctypes.c_float, ctypes.c_uint8),
        ]:
            fn = getattr(lib, name)
            fn.argtypes = [
                ctypes.POINTER(phase_t),
                ctypes.POINTER(disp_t),
                ctypes.c_size_t,
                ctypes.c_int,
            ]
            fn.restype = None
        _LIB = lib
    except Exception as err:
        warnings.warn(f"Native phase2gray unavailable ({err}); using numpy.")
        _LIB = None
    return _LIB


def phase2gray_native(phase, out, bitresolution):
    """
    Single-pass ``phase`` (radians) -> integer ``out`` conversion for
    power-of-two ``bitresolution`` and ``phase_scaling == 1``.

    Returns ``True`` on success, ``False`` if the native path is
    unavailable or unsupported for these dtypes (caller falls back).
    """
    lib = _get_library()
    if lib is None:
        return False
    if bitresolution & (bitresolution - 1):
        return False
    if not (phase.flags["C_CONTIGUOUS"] and out.flags["C_CONTIGUOUS"]):
        return False

    n = phase.size
    if phase.dtype == np.float64 and out.dtype == np.uint8:
        lib.phase2gray_u8(
            phase.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, bitresolution,
        )
    elif phase.dtype == np.float64 and out.dtype == np.uint16:
        lib.phase2gray_u16(
            phase.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            n, bitresolution,
        )
    elif phase.dtype == np.float32 and out.dtype == np.uint8:
        lib.phase2gray_f32_u8(
            phase.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, bitresolution,
        )
    else:
        return False
    return True
