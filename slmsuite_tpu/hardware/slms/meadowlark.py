"""
Meadowlark Optics SLMs via the Blink SDK (``Blink_C_wrapper.dll``).

Supports the HDMI-interfaced SDK and the PCIe (1920/1024 "HSP") SDKs,
which expose slightly different C entry points; the variant is detected
from the DLL's exported symbols. The SDK is Windows-only and loaded with
:mod:`ctypes`; this module imports cleanly without it.

Parity: reference ``slmsuite/hardware/slms/meadowlark.py`` (``Meadowlark``).
"""

import ctypes
import os
import warnings

import numpy as np

from slmsuite_tpu.hardware.slms.slm import SLM

#: Default install roots searched for the Blink SDK.
_DEFAULT_SDK_ROOTS = [
    "C:\\Program Files\\Meadowlark Optics\\Blink OverDrive Plus\\SDK",
    "C:\\Program Files\\Meadowlark Optics\\Blink 1920 HDMI\\SDK",
    "C:\\Program Files\\Meadowlark Optics",
]


#: Package-data SDK compatibility matrix (feature support per Blink SDK
#: generation; same facts as the reference's ``meadowlark.csv`` table).
SDK_TABLE_PATH = os.path.join(os.path.dirname(__file__), "meadowlark.csv")


def sdk_feature_table(path=SDK_TABLE_PATH):
    """
    Blink-SDK compatibility matrix as
    ``{feature: {"hdmi": ..., "pcie": ..., "legacy_pcie": ...}}``.
    Boolean-ish cells parse to bools; free-text cells (tested models,
    resolutions, versions) stay strings. Use to check whether a call
    like :meth:`Meadowlark.get_temperature` is meaningful on the
    detected ``sdk_interface`` before driving hardware.
    """
    import csv

    def parse(cell):
        if cell in ("yes", "y"):
            return True
        if cell in ("no", "n", ""):
            return False
        return cell

    with open(path, newline="") as f:
        rows = list(csv.reader(f))
    header = rows[0][1:]
    return {
        row[0]: dict(zip(header, (parse(c) for c in row[1:])))
        for row in rows[1:]
    }


def _find_dll(sdk_path=None):
    """Locate ``Blink_C_wrapper.dll`` under ``sdk_path`` or default roots."""
    roots = [sdk_path] if sdk_path else _DEFAULT_SDK_ROOTS
    for root in roots:
        if root is None or not os.path.isdir(root):
            continue
        for dirpath, _, filenames in os.walk(root):
            for fname in filenames:
                if fname.lower() == "blink_c_wrapper.dll":
                    return os.path.join(dirpath, fname)
    raise FileNotFoundError(
        "Blink_C_wrapper.dll not found. Install the Meadowlark Blink SDK or "
        "pass sdk_path pointing at it."
    )


class Meadowlark(SLM):
    """
    Meadowlark SLM through the Blink SDK.

    Attributes
    ----------
    slm_lib : ctypes.CDLL
        Handle to ``Blink_C_wrapper``.
    sdk_interface : {'hdmi', 'pcie'}
        Which SDK generation was detected.
    slm_number : int
        Board index (PCIe SDKs support multiple boards).
    """

    def __init__(
        self,
        verbose=True,
        sdk_path=None,
        lut_path=None,
        slm_number=1,
        wav_um=1,
        pitch_um=(8, 8),
        **kwargs,
    ):
        """
        Parameters
        ----------
        sdk_path : str OR None
            Root to search for the Blink SDK DLL (default: standard installs).
        lut_path : str OR None
            Path to a ``.lut`` calibration file, or a directory to search;
            the SDK's default LUT is used if None.
        slm_number : int
            1-indexed board number (PCIe only).
        wav_um, pitch_um, **kwargs
            See :meth:`.SLM.__init__`.
        """
        if verbose:
            print("Meadowlark SLM initializing... ", end="")
        dll_path = _find_dll(sdk_path)
        self.slm_lib = ctypes.CDLL(dll_path)
        self.slm_number = int(slm_number)

        # The HDMI SDK exports Write_image(data, is_8bit); the PCIe SDK
        # exports Write_image(board, data, size, ...) plus board counting.
        self.sdk_interface = (
            "pcie" if hasattr(self.slm_lib, "Get_last_error_message") or
            hasattr(self.slm_lib, "Set_true_frames") else "hdmi"
        )

        if self.sdk_interface == "pcie":
            n_boards = ctypes.c_uint(0)
            constructed = ctypes.c_bool(False)
            # bit_depth=12, is_nematic=1, RAM_write=1, use_GPU=0, max_transients=10
            self.slm_lib.Create_SDK(
                ctypes.c_uint(12), ctypes.byref(n_boards), ctypes.byref(constructed),
                ctypes.c_bool(True), ctypes.c_bool(True), ctypes.c_bool(False),
                ctypes.c_uint(10), ctypes.c_char_p(b""),
            )
            if not constructed.value or n_boards.value < slm_number:
                raise RuntimeError(
                    f"Blink PCIe SDK init failed "
                    f"({n_boards.value} board(s) found, requested {slm_number})."
                )
            width = self.slm_lib.Get_image_width(ctypes.c_uint(slm_number))
            height = self.slm_lib.Get_image_height(ctypes.c_uint(slm_number))
            depth = self.slm_lib.Get_image_depth(ctypes.c_uint(slm_number))
            bitdepth = int(depth) if depth in (8, 12, 16) else 12
        else:
            self.slm_lib.Create_SDK()
            width = self.slm_lib.Get_Width()
            height = self.slm_lib.Get_Height()
            depth = self.slm_lib.Get_Depth()
            bitdepth = int(depth) if depth in (8, 12, 16) else 8

        self._load_lut(lut_path)
        if verbose:
            print("success")

        super().__init__(
            (int(width), int(height)),
            bitdepth=bitdepth,
            name=kwargs.pop("name", f"Meadowlark_{slm_number}"),
            wav_um=wav_um,
            pitch_um=pitch_um,
            settle_time_s=kwargs.pop("settle_time_s", 0.3),
            **kwargs,
        )
        self.set_phase(None)

    @staticmethod
    def _locate_lut_file(search_path, slm_shape=None):
        """
        Pick the ``.lut`` file to load from ``search_path`` (searched
        recursively). Meadowlark ships per-device calibrations named like
        ``slm5758_at532.lut``; when several files are present, prefer one
        whose name carries the SLM's own dimensions, else fall back to
        the most recently created file (warning). Ref
        ``meadowlark.py:968-1018``.
        """
        import glob

        files = set(
            glob.glob(os.path.join(str(search_path), "**", "*.lut"),
                      recursive=True)
        )
        if len(files) == 1:
            return files.pop()
        if not files:
            raise FileNotFoundError(f"No .lut file found in '{search_path}'.")
        if slm_shape:
            matching = {
                f for f in files
                if str(slm_shape[1]) in os.path.basename(f)
                and str(slm_shape[0]) in os.path.basename(f)
            }
            if len(matching) == 1:
                return matching.pop()
            if matching:
                files = matching
        best = max(files, key=os.path.getctime)
        warnings.warn(
            f"Multiple LUT files located. Defaulting to the most recent "
            f"one: {best}.")
        return best

    def _load_lut(self, lut_path):
        """Load a voltage lookup table (the phase-to-voltage calibration
        of the liquid crystal); directories are searched via
        :meth:`_locate_lut_file`, preferring a file matching this SLM's
        dimensions."""
        if lut_path is not None and os.path.isdir(lut_path):
            slm_shape = tuple(self.shape) if hasattr(self, "shape") else None
            lut_path = self._locate_lut_file(lut_path, slm_shape)
        if lut_path is None:
            return None
        if not os.path.exists(lut_path):
            raise FileNotFoundError(f"Failed to locate LUT at: '{lut_path}'.")
        encoded = str(lut_path).encode("utf-8")
        if self.sdk_interface == "pcie":
            success = self.slm_lib.Load_LUT_file(
                ctypes.c_uint(self.slm_number), encoded
            )
            if success != 1:
                warnings.warn(f"Failed to load LUT file: '{lut_path}'.")
        else:
            self.slm_lib.Load_lut(encoded)
        return str(lut_path)

    #: Whether image writes wait for an external input trigger (PCIe).
    _wait_for_trigger = False
    #: Whether image writes emit an output trigger pulse (PCIe).
    _output_pulse = False

    @property
    def is_pcie(self):
        """Whether the detected SDK uses a PCIe connection."""
        return self.sdk_interface == "pcie"

    def _set_phase_hw(self, display):
        data = np.ascontiguousarray(display)
        ptr = data.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
        if self.sdk_interface == "pcie":
            self.slm_lib.Write_image(
                ctypes.c_uint(self.slm_number), ptr, ctypes.c_uint(data.size),
                ctypes.c_uint(int(self._wait_for_trigger)),
                ctypes.c_uint(0),  # flip_immediate
                ctypes.c_uint(int(self._output_pulse)),
                ctypes.c_uint(5000),
            )
            self.slm_lib.ImageWriteComplete(
                ctypes.c_uint(self.slm_number), ctypes.c_uint(5000)
            )
        else:
            self.slm_lib.Write_image(ptr, ctypes.c_uint(self.bitdepth == 8))

    def set_input_trigger(self, on=False):
        """Wait for an external input trigger before each image write
        (PCIe SDKs only)."""
        if not self.is_pcie:
            raise NotImplementedError("HDMI SLMs do not support input triggering.")
        if hasattr(self.slm_lib, "SetWaitForTrigger"):
            self.slm_lib.SetWaitForTrigger(
                ctypes.c_uint(self.slm_number), ctypes.c_bool(on)
            )
            self.slm_lib.SetFlipImmediate(
                ctypes.c_uint(self.slm_number), ctypes.c_bool(False)
            )
        self._wait_for_trigger = bool(on)

    def set_output_trigger(self, on=False):
        """Emit an output trigger pulse synchronized with each image
        write (PCIe SDKs only)."""
        if not self.is_pcie:
            raise NotImplementedError("HDMI SLMs do not support output triggering.")
        self._output_pulse = bool(on)

    def load_lut(self, lut_path):
        """Load a voltage lookup table (``.lut`` file, or a directory to
        search for one — see :meth:`_locate_lut_file` for the selection
        rules). Returns the path that was loaded."""
        return self._load_lut(lut_path)

    def get_last_error_message(self):
        """Last SDK error message (PCIe SDKs only)."""
        if not self.is_pcie:
            raise NotImplementedError(
                "Error message retrieval not supported for this model."
            )
        self.slm_lib.Get_last_error_message.restype = ctypes.c_char_p
        return self.slm_lib.Get_last_error_message().decode("utf-8")

    def get_version_info(self):
        """Blink SDK version string."""
        self.slm_lib.Get_version_info.restype = ctypes.c_char_p
        return self.slm_lib.Get_version_info().decode("utf-8")

    def get_temperature(self):
        """Return the SLM temperature in deg C."""
        if self.sdk_interface == "pcie":
            self.slm_lib.Read_SLM_temperature.restype = ctypes.c_double
            return float(self.slm_lib.Read_SLM_temperature(
                ctypes.c_uint(self.slm_number)
            ))
        self.slm_lib.Get_SLMTemp.restype = ctypes.c_double
        return float(self.slm_lib.Get_SLMTemp())

    def get_coverglass_voltage(self):
        """Return the coverglass voltage in V."""
        if self.sdk_interface == "pcie":
            self.slm_lib.Read_coverglass_voltage.restype = ctypes.c_double
            return float(self.slm_lib.Read_coverglass_voltage(
                ctypes.c_uint(self.slm_number)
            ))
        self.slm_lib.Get_SLMVCom.restype = ctypes.c_double
        return float(self.slm_lib.Get_SLMVCom())

    def close(self):
        """Release the SDK."""
        if getattr(self, "slm_lib", None) is not None:
            self.slm_lib.Delete_SDK()
            self.slm_lib = None

    def close_sdk(self):
        """Release the SDK (alias of :meth:`close` for API parity)."""
        self.close()

    @staticmethod
    def info(verbose=True):
        """The Blink SDK does not enumerate; returns the DLL path found."""
        path = _find_dll(None)
        if verbose:
            print("Blink SDK:", path)
        return [path]
