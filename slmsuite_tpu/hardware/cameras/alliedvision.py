"""
Allied Vision cameras via :mod:`vmbpy` (Vimba X).

The Vimba API is context-manager based; this driver holds the system and
camera contexts open between :meth:`__init__` and :meth:`close` so the
camera behaves like the other drivers.

Parity: reference ``slmsuite/hardware/cameras/alliedvision.py``
(``AlliedVision``).
"""

import numpy as np

from slmsuite_tpu.hardware.cameras.camera import Camera

try:
    import vmbpy
except ImportError:
    vmbpy = None


class AlliedVision(Camera):
    """Allied Vision camera through vmbpy."""

    sdk = None

    def __init__(self, serial="", verbose=True, **kwargs):
        """
        Parameters
        ----------
        serial : str
            Camera ID; empty selects the first camera found.
        **kwargs
            Passed to :meth:`.Camera.__init__`.
        """
        if vmbpy is None:
            raise ImportError("vmbpy (Vimba X) is required for Allied Vision cameras.")

        if AlliedVision.sdk is None:
            if verbose:
                print("vmbpy initializing... ", end="")
            AlliedVision.sdk = vmbpy.VmbSystem.get_instance()
            AlliedVision.sdk.__enter__()
            if verbose:
                print("success")

        cameras = AlliedVision.sdk.get_all_cameras()
        if not cameras:
            raise RuntimeError("No Allied Vision cameras found.")
        if serial:
            self.cam = AlliedVision.sdk.get_camera_by_id(str(serial))
        else:
            self.cam = cameras[0]

        if verbose:
            print(f"AlliedVision {self.cam.get_id()} initializing... ", end="")
        self.cam.__enter__()

        for feature, value in [
            ("ExposureAuto", "Off"), ("GainAuto", "Off"), ("Gain", 0),
        ]:
            try:
                self.cam.get_feature_by_name(feature).set(value)
            except Exception:
                pass

        width = int(self.cam.get_feature_by_name("WidthMax").get())
        height = int(self.cam.get_feature_by_name("HeightMax").get())
        if verbose:
            print("success")

        super().__init__(
            (width, height),
            bitdepth=8,
            name=f"AlliedVision_{self.cam.get_id()}",
            **kwargs,
        )

    def close(self, close_sdk=True):
        """Exit the camera (and optionally system) contexts."""
        if getattr(self, "cam", None) is not None:
            self.cam.__exit__(None, None, None)
            self.cam = None
        if close_sdk and AlliedVision.sdk is not None:
            AlliedVision.sdk.__exit__(None, None, None)
            AlliedVision.sdk = None

    @staticmethod
    def info(verbose=True):
        """Return IDs of connected Allied Vision cameras."""
        if vmbpy is None:
            raise ImportError("vmbpy is required.")
        with vmbpy.VmbSystem.get_instance() as sdk:
            ids = [camera.get_id() for camera in sdk.get_all_cameras()]
        if verbose:
            print("AlliedVision IDs:", ids)
        return ids

    def _get_exposure_hw(self):
        return float(self.cam.get_feature_by_name("ExposureTime").get()) / 1e6

    def _set_exposure_hw(self, exposure_s):
        self.cam.get_feature_by_name("ExposureTime").set(float(exposure_s * 1e6))

    def _get_image_hw(self, timeout_s=1):
        frame = self.cam.get_frame(timeout_ms=int(timeout_s * 1e3))
        return np.squeeze(np.array(frame.as_numpy_ndarray(), copy=True))
