"""
The Imaging Source cameras via :mod:`imagingcontrol4` (IC4).

Parity: reference ``slmsuite/hardware/cameras/imagingsource.py``
(``ImagingSource``).
"""

import numpy as np

from slmsuite_tpu.hardware.cameras.camera import Camera

try:
    import imagingcontrol4 as ic4
except ImportError:
    ic4 = None


class ImagingSource(Camera):
    """The Imaging Source camera through the IC4 SDK."""

    _library_initialized = False

    def __init__(self, serial="", verbose=True, **kwargs):
        """
        Parameters
        ----------
        serial : str
            Device serial; empty selects the first device found.
        **kwargs
            Passed to :meth:`.Camera.__init__`.
        """
        if ic4 is None:
            raise ImportError(
                "imagingcontrol4 (IC4) is required for Imaging Source cameras."
            )
        if not ImagingSource._library_initialized:
            ic4.Library.init()
            ImagingSource._library_initialized = True

        devices = ic4.DeviceEnum.devices()
        if not devices:
            raise RuntimeError("No Imaging Source cameras found.")
        device = None
        if serial:
            for candidate in devices:
                if candidate.serial == str(serial):
                    device = candidate
                    break
            if device is None:
                raise RuntimeError(f"Imaging Source serial {serial} not found.")
        else:
            device = devices[0]

        if verbose:
            print(f"ImagingSource {device.serial} initializing... ", end="")
        self.grabber = ic4.Grabber()
        self.grabber.device_open(device)
        self.prop_map = self.grabber.device_property_map

        for name, value in [
            ("ExposureAuto", "Off"), ("GainAuto", "Off"), ("Gain", 0.0),
        ]:
            try:
                self.prop_map.set_value(name, value)
            except ic4.IC4Exception:
                pass

        width = int(self.prop_map.get_value_int("Width"))
        height = int(self.prop_map.get_value_int("Height"))

        self.sink = ic4.SnapSink()
        self.grabber.stream_setup(
            self.sink, setup_option=ic4.StreamSetupOption.ACQUISITION_START
        )
        if verbose:
            print("success")

        super().__init__(
            (width, height),
            bitdepth=8,
            name=f"ImagingSource_{device.serial}",
            **kwargs,
        )

    def close(self):
        """Stop the stream and close the device."""
        if getattr(self, "grabber", None) is not None:
            if self.grabber.is_streaming:
                self.grabber.stream_stop()
            self.grabber.device_close()
            self.grabber = None

    @staticmethod
    def info(verbose=True):
        """Return serials of connected Imaging Source cameras."""
        if ic4 is None:
            raise ImportError("imagingcontrol4 is required.")
        if not ImagingSource._library_initialized:
            ic4.Library.init()
            ImagingSource._library_initialized = True
        serials = [device.serial for device in ic4.DeviceEnum.devices()]
        if verbose:
            print("ImagingSource serials:", serials)
        return serials

    def _get_exposure_hw(self):
        return float(self.prop_map.get_value_float("ExposureTime")) / 1e6

    def _set_exposure_hw(self, exposure_s):
        self.prop_map.set_value("ExposureTime", float(exposure_s * 1e6))

    def _get_image_hw(self, timeout_s=1):
        buffer = self.sink.snap_single(int(timeout_s * 1e3))
        frame = np.copy(np.squeeze(buffer.numpy_wrap()))
        buffer.release()
        return frame
