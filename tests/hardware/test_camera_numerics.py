"""
Numeric tests of the camera pipelines the calibration stack leans on:
HDR stitching (reference ``camera.py:774-919``), the autofocus
Fourier-contrast metric and its Lorentzian fit (``:1276-1427``), and
pixel-calibration data shapes (``cameraslms.py:626-898``).
"""

import numpy as np
import pytest

from slmsuite_tpu.hardware.cameras.camera import Camera


def _scene(shape=(32, 32)):
    """High-dynamic-range scene: a bright peak on a dim gradient."""
    yy, xx = np.meshgrid(*(np.arange(s, dtype=float) for s in shape), indexing="ij")
    scene = 1.0 + xx / 4 + 900.0 * np.exp(-((xx - 8) ** 2 + (yy - 8) ** 2) / 4)
    return scene


class TestHDRAnalysis:
    """Pure stitch math (static method; no hardware)."""

    def test_recovers_dynamic_range(self):
        scene = _scene()
        maxval = 1023.0
        power = 4
        # Exposure stack: each frame saturates at the camera's full scale.
        imgs = np.stack(
            [np.minimum(scene * power**i, maxval) for i in range(3)]
        )
        stitched = Camera.get_image_hdr_analysis(
            imgs, overexposure_threshold=maxval / 2, exposure_power=power
        )
        # Saturated peak pixels keep the base exposure's values; dim
        # pixels are overwritten with rescaled long-exposure data, so the
        # whole scene matches ground truth without saturation artifacts.
        np.testing.assert_allclose(stitched, np.minimum(scene, maxval), rtol=1e-6)

    def test_explicit_exposure_times(self):
        scene = _scene()
        times = np.array([1.0, 3.7, 16.9])  # Hardware-quantized exposures.
        imgs = np.stack([np.minimum(scene * t, 1023.0) for t in times])
        stitched = Camera.get_image_hdr_analysis(
            imgs, overexposure_threshold=512.0, exposure_power=times
        )
        np.testing.assert_allclose(stitched, np.minimum(scene, 1023.0), rtol=1e-6)

    def test_zero_exposures_skipped(self):
        scene = _scene()
        imgs = np.stack([scene, np.zeros_like(scene)])
        stitched = Camera.get_image_hdr_analysis(
            imgs, exposure_power=np.array([1.0, 0.0])
        )
        np.testing.assert_allclose(stitched, scene)

    def test_all_nonpositive_times_raise(self):
        with pytest.raises(ValueError):
            Camera.get_image_hdr_analysis(
                np.zeros((2, 4, 4)), exposure_power=np.array([0.0, 0.0])
            )


class _FakeHDRCamera(Camera):
    """Exposure-faithful synthetic camera: counts = scene * exposure,
    clipped to the bitdepth."""

    def __init__(self, scene, **kwargs):
        self._scene = np.asarray(scene, dtype=float)
        self._exposure = 1.0
        super().__init__(
            (self._scene.shape[1], self._scene.shape[0]),
            bitdepth=10,
            name="fake_hdr",
            **kwargs,
        )

    def close(self):
        pass

    def _get_exposure_hw(self):
        return self._exposure

    def _set_exposure_hw(self, exposure_s):
        self._exposure = float(exposure_s)

    def _get_image_hw(self, timeout_s=1):
        counts = self._scene * self._exposure
        return np.minimum(counts, self.bitresolution - 1).astype(np.uint16)


class TestHDRCapture:
    def test_capture_loop_restores_exposure(self):
        cam = _FakeHDRCamera(_scene())
        cam.set_exposure(1.0)
        img = cam.get_image(hdr=(3, 4))
        assert cam.get_exposure() == 1.0  # Restored after the stack.
        # The dim gradient is recovered beyond the single-exposure noise
        # floor: a single base exposure quantizes 1.25 to 1, HDR doesn't.
        single = cam.get_image(hdr=False).astype(float)
        scene = _scene()
        dim = scene < 16
        assert (
            np.abs(img[dim] - scene[dim]).mean()
            < np.abs(single[dim] - scene[dim]).mean()
        )

    def test_fully_saturated_keeps_base_frame(self):
        """When every exposure saturates, no overwrite applies and the
        stitch degenerates to the base frame (no division artifacts)."""
        cam = _FakeHDRCamera(np.full((16, 16), 5000.0))  # Saturates always.
        cam.set_exposure(1.0)
        img = cam.get_image_hdr((3, 2))
        np.testing.assert_array_equal(img, np.full((16, 16), 1023.0))

    def test_return_raw(self):
        cam = _FakeHDRCamera(_scene())
        cam.set_exposure(1.0)
        imgs, times = cam.get_image_hdr((3, 2), return_raw=True)
        assert imgs.shape == (3, 32, 32)
        np.testing.assert_allclose(times, [1.0, 2.0, 4.0])


class _FakeFocusCamera(Camera):
    """Synthetic camera whose sharpness depends on a ``z`` position:
    a Gaussian spot with waist growing away from focus at z=0.7."""

    z_true = 0.7

    def __init__(self):
        self.z = 0.0
        yy, xx = np.meshgrid(np.arange(64.0), np.arange(64.0), indexing="ij")
        self._rsq = (xx - 32) ** 2 + (yy - 32) ** 2
        super().__init__((64, 64), bitdepth=16, name="fake_focus")

    def close(self):
        pass

    def _get_exposure_hw(self):
        return 1.0

    def _set_exposure_hw(self, exposure_s):
        pass

    def _get_image_hw(self, timeout_s=1):
        waist_sq = 4.0 * (1.0 + 10.0 * (self.z - self.z_true) ** 2)
        img = 30000.0 * np.exp(-self._rsq / waist_sq)
        return img.astype(np.uint16)


class TestAutofocus:
    def test_metric_prefers_sharp(self):
        cam = _FakeFocusCamera()
        cam.z = cam.z_true
        sharp = Camera._autofocus_metric(cam._get_image_hw())
        cam.z = cam.z_true + 1.5
        blurred = Camera._autofocus_metric(cam._get_image_hw())
        assert sharp > blurred

    def test_autofocus_finds_focus(self):
        cam = _FakeFocusCamera()

        def set_z(z):
            cam.z = z

        z_opt = cam.autofocus(set_z, get_z=0.0, range_z=2.0)
        assert abs(z_opt - cam.z_true) < 0.2
        assert cam.z == z_opt  # The actuator was left at the optimum.

    def test_autofocus_all_failures_raise(self):
        cam = _FakeFocusCamera()

        def set_z(z):
            raise RuntimeError("actuator dead")

        with pytest.raises(RuntimeError, match="Autofocus failed"):
            cam.autofocus(set_z, get_z=0.0, range_z=1.0)


class TestPixelCalibrationShapes:
    def test_data_shapes(self, fourierslm_calibrated):
        fs = fourierslm_calibrated
        periods = [8, 16]
        cal = fs.pixel_calibrate(levels=2, periods=periods, orders=1)
        data = np.asarray(cal["data"])
        N = 2          # levels
        P = len(periods)
        M = 3          # orders -1, 0, 1
        assert data.shape == (2, P, N, N, M)
        assert np.all(np.isfinite(data))
        # Metadata round-trips through the calibration dict.
        assert "pixel" in fs.calibrations
        assert np.array_equal(fs.calibrations["pixel"]["orders"], [-1, 0, 1])


class TestPixelCalibrationFit:
    def test_phase_response_recovered(self, fourierslm_calibrated):
        """The simulated SLM's phase response is exactly linear
        (2pi * level / bitresolution); the binary-grating fit recovers it."""
        fs = fourierslm_calibrated
        fs.pixel_calibrate(levels=4, periods=[8, 16], orders=1)
        cal = fs.pixel_calibration_process(fit=True, plot=False)

        fit = cal["phase_fit"]
        levels = fit["levels"]
        expected = 2 * np.pi * levels / fs.slm.bitresolution
        expected -= expected[0]
        measured = np.asarray(fit["phase"])
        # The power matrix only determines phases up to a global sign.
        error = min(
            np.abs(measured - expected).max(),
            np.abs(-measured - expected).max(),
        )
        assert error < 0.3  # Radians; ideal response spans ~4.7 rad.
        assert fit["rmse"] < 0.2 * fit["amplitude"]
