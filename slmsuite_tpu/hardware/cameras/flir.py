"""
FLIR/Teledyne cameras via the Spinnaker SDK (:mod:`PySpin`).

Parity: reference ``slmsuite/hardware/cameras/flir.py`` (``FLIR``).
"""

import warnings

import numpy as np

from slmsuite_tpu.hardware.cameras.camera import Camera

try:
    import PySpin
except ImportError:
    PySpin = None


class FLIR(Camera):
    """
    FLIR camera through Spinnaker.

    The Spinnaker ``System`` singleton is shared across instances and
    released when the last camera closes.
    """

    sdk = None
    _instances = 0

    def __init__(self, serial="", verbose=True, **kwargs):
        """
        Parameters
        ----------
        serial : str
            Camera serial; empty selects the first camera found.
        **kwargs
            Passed to :meth:`.Camera.__init__`.
        """
        if PySpin is None:
            raise ImportError("PySpin (Spinnaker SDK) is required for FLIR cameras.")

        if FLIR.sdk is None:
            if verbose:
                print("PySpin initializing... ", end="")
            FLIR.sdk = PySpin.System.GetInstance()
            if verbose:
                print("success")

        camera_list = FLIR.sdk.GetCameras()
        try:
            if not serial:
                if camera_list.GetSize() == 0:
                    raise RuntimeError("No FLIR cameras found.")
                self.cam = camera_list.GetByIndex(0)
            else:
                self.cam = camera_list.GetBySerial(str(serial))
        finally:
            camera_list.Clear()

        if verbose:
            print(f"FLIR camera {serial or '(first)'} initializing... ", end="")
        self.cam.Init()
        FLIR._instances += 1

        nodemap = self.cam.GetNodeMap()

        # Manual exposure/gain so feedback measurements are repeatable.
        self.cam.ExposureAuto.SetValue(PySpin.ExposureAuto_Off)
        self.cam.GainAuto.SetValue(PySpin.GainAuto_Off)
        self.cam.Gain.SetValue(0)
        try:
            self.cam.GammaEnable.SetValue(False)
        except PySpin.SpinnakerException:
            pass
        self.cam.AcquisitionMode.SetValue(PySpin.AcquisitionMode_Continuous)

        width = int(self.cam.WidthMax.GetValue())
        height = int(self.cam.HeightMax.GetValue())
        try:
            bitdepth = int(
                PySpin.CEnumerationPtr(
                    nodemap.GetNode("PixelSize")
                ).GetIntValue()
            )
        except Exception:
            bitdepth = 8

        self.cam.BeginAcquisition()
        if verbose:
            print("success")

        super().__init__(
            (width, height),
            bitdepth=bitdepth,
            name=f"FLIR_{serial or self.cam.DeviceSerialNumber.GetValue()}",
            **kwargs,
        )

    def close(self):
        """End acquisition and release the camera (and SDK if last)."""
        if getattr(self, "cam", None) is None:
            return
        try:
            self.cam.EndAcquisition()
        except Exception:
            pass
        self.cam.DeInit()
        del self.cam
        self.cam = None
        FLIR._instances -= 1
        if FLIR._instances <= 0 and FLIR.sdk is not None:
            FLIR.sdk.ReleaseInstance()
            FLIR.sdk = None

    @staticmethod
    def info(verbose=True):
        """Return serial numbers of connected FLIR cameras."""
        if PySpin is None:
            raise ImportError("PySpin (Spinnaker SDK) is required.")
        own_sdk = FLIR.sdk is None
        sdk = FLIR.sdk or PySpin.System.GetInstance()
        camera_list = sdk.GetCameras()
        serials = []
        for i in range(camera_list.GetSize()):
            cam = camera_list.GetByIndex(i)
            serials.append(
                PySpin.CStringPtr(
                    cam.GetTLDeviceNodeMap().GetNode("DeviceSerialNumber")
                ).GetValue()
            )
        camera_list.Clear()
        if own_sdk:
            sdk.ReleaseInstance()
        if verbose:
            print("FLIR serials:", serials)
        return serials

    def _get_exposure_hw(self):
        return float(self.cam.ExposureTime.GetValue()) / 1e6

    def _set_exposure_hw(self, exposure_s):
        exposure_us = float(
            np.clip(
                exposure_s * 1e6,
                self.cam.ExposureTime.GetMin(),
                self.cam.ExposureTime.GetMax(),
            )
        )
        self.cam.ExposureTime.SetValue(exposure_us)

    def _get_image_hw(self, timeout_s=1):
        image = self.cam.GetNextImage(int(timeout_s * 1e3))
        try:
            if image.IsIncomplete():
                raise RuntimeError(
                    f"FLIR image incomplete: {image.GetImageStatus()}."
                )
            frame = np.array(image.GetNDArray(), copy=True)
        finally:
            image.Release()
        return frame

    def flush(self, timeout_s=1):
        """Drain buffered frames so the next grab is fresh."""
        while True:
            try:
                image = self.cam.GetNextImage(30)
            except PySpin.SpinnakerException:
                break
            image.Release()
