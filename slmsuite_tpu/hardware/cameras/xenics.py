"""
Xenics infrared cameras (Cheetah, Wildcat, Bobcat, ...) via the Xeneth
SDK, bound with :mod:`ctypes` (``xeneth64.dll`` / ``libxeneth.so``).

Parity: reference ``slmsuite/hardware/cameras/xenics.py`` (``Cheetah640``
and SDK binding); ours is a lean generic binding of the entry points used.
"""

import ctypes
import ctypes.util
import warnings

import numpy as np

from slmsuite_tpu.hardware.cameras.camera import Camera

_LIB = None

#: Xeneth error codes (subset).
I_OK = 0

#: Frame-type constant: native frame format.
_FT_NATIVE = 0

#: GetFrame flags: blocking wait for a new frame.
_XGF_BLOCKING = 1


def _load_sdk():
    global _LIB
    if _LIB is not None:
        return _LIB
    for name in ("xeneth64", "xeneth", "libxeneth.so"):
        try:
            path = ctypes.util.find_library(name) or name
            _LIB = ctypes.CDLL(path)
            break
        except OSError:
            continue
    if _LIB is None:
        raise ImportError(
            "Xeneth SDK not found (xeneth64.dll / libxeneth.so); install it "
            "from Xenics."
        )
    _LIB.XC_OpenCamera.restype = ctypes.c_uint32
    _LIB.XC_OpenCamera.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p]
    return _LIB


class Cheetah640(Camera):
    """
    Xenics camera through Xeneth. Despite the name (kept for parity with
    the reference driver), any Xeneth-enumerable camera works — geometry
    and bitdepth are queried from the device.
    """

    def __init__(self, url="cam://0", calibration=None, verbose=True, **kwargs):
        """
        Parameters
        ----------
        url : str
            Xeneth connection URL, e.g. ``'cam://0'`` or ``'gev://<ip>'``.
        calibration : str OR None
            Path to a ``.xca`` calibration pack to load.
        **kwargs
            Passed to :meth:`.Camera.__init__`.
        """
        self._lib = _load_sdk()
        if verbose:
            print(f"Xeneth camera '{url}' initializing... ", end="")
        self.handle = self._lib.XC_OpenCamera(url.encode(), None, None)
        if not self._lib.XC_IsInitialised(self.handle):
            raise RuntimeError(f"Could not initialize Xenics camera at '{url}'.")

        if calibration is not None:
            status = self._lib.XC_LoadCalibration(
                self.handle, calibration.encode(), ctypes.c_ulong(1)
            )
            if status != I_OK:
                warnings.warn(f"Calibration load failed with status {status}.")

        width = int(self._lib.XC_GetWidth(self.handle))
        height = int(self._lib.XC_GetHeight(self.handle))
        bitdepth = int(self._lib.XC_GetBitSize(self.handle))
        self._frame_bytes = int(self._lib.XC_GetFrameSize(self.handle))
        self._buffer = np.zeros(
            (height, width), dtype=np.uint16 if bitdepth > 8 else np.uint8
        )

        status = self._lib.XC_StartCapture(self.handle)
        if status != I_OK:
            raise RuntimeError(f"XC_StartCapture failed with status {status}.")
        if verbose:
            print("success")

        super().__init__(
            (width, height),
            bitdepth=bitdepth,
            name=f"Xenics_{url}",
            **kwargs,
        )

    def close(self):
        """Stop capture and close the connection."""
        if getattr(self, "handle", None):
            self._lib.XC_StopCapture(self.handle)
            self._lib.XC_CloseCamera(self.handle)
            self.handle = None

    @staticmethod
    def info(verbose=True):
        """Enumerate Xeneth devices (indices of ``cam://N``)."""
        lib = _load_sdk()
        count = ctypes.c_uint32(0)
        lib.XCD_EnumerateDevices(None, ctypes.byref(count), ctypes.c_uint32(1))
        found = [f"cam://{i}" for i in range(count.value)]
        if verbose:
            print("Xeneth devices:", found)
        return found

    def _get_exposure_hw(self):
        value = ctypes.c_double(0)
        self._lib.XC_GetPropertyValueF(
            self.handle, b"IntegrationTime", ctypes.byref(value)
        )
        return float(value.value) / 1e6

    def _set_exposure_hw(self, exposure_s):
        self._lib.XC_SetPropertyValueF(
            self.handle, b"IntegrationTime", ctypes.c_double(exposure_s * 1e6), b""
        )

    def set_property(self, name, value):
        """Set an arbitrary Xeneth property (numeric or string)."""
        if isinstance(value, str):
            self._lib.XC_SetPropertyValue(
                self.handle, name.encode(), value.encode(), b""
            )
        else:
            self._lib.XC_SetPropertyValueF(
                self.handle, name.encode(), ctypes.c_double(value), b""
            )

    def get_property(self, name):
        """Read a numeric Xeneth property."""
        value = ctypes.c_double(0)
        self._lib.XC_GetPropertyValueF(self.handle, name.encode(), ctypes.byref(value))
        return float(value.value)

    def _get_image_hw(self, timeout_s=1):
        status = self._lib.XC_GetFrame(
            self.handle, _FT_NATIVE, _XGF_BLOCKING,
            self._buffer.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_uint32(self._buffer.nbytes),
        )
        if status != I_OK:
            raise RuntimeError(f"XC_GetFrame failed with status {status}.")
        return np.copy(self._buffer)
