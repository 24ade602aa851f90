"""Tests for the Camera abstraction (mirrors reference tests/hardware/test_cameras.py)."""

import numpy as np
import pytest

from slmsuite_tpu.hardware.cameras.camera import Camera
from slmsuite_tpu.hardware.cameras.simulated import SimulatedCamera
from slmsuite_tpu.hardware.slms.simulated import SimulatedSLM
from slmsuite_tpu.holography.toolbox import phase as tphase


class TestConstruction:
    def test_shape(self, camera):
        assert camera.shape == (512, 512)

    def test_transform_shapes(self, slm):
        cam = SimulatedCamera(slm, resolution=(128, 96), rot="90")
        assert cam.shape == (128, 96)  # Rotated: (width, height).

    def test_bad_capture_attempts(self, slm):
        with pytest.raises(ValueError):
            SimulatedCamera(slm, capture_attempts=0)


class TestExposure:
    def test_get_set(self, camera):
        camera.set_exposure(0.25)
        assert camera.get_exposure() == 0.25

    def test_bounds_clip(self, slm):
        cam = SimulatedCamera(slm, exposure_bounds_s=(0.01, 1.0))
        with pytest.warns(UserWarning):
            cam.set_exposure(100)
        assert cam.exposure_s == 1.0


class TestCapture:
    def test_get_image(self, camera):
        img = camera.get_image()
        assert img.shape == tuple(camera.shape)
        assert camera.last_image is img

    def test_get_images(self, camera):
        imgs = camera.get_images(3)
        assert imgs.shape == (3,) + tuple(camera.shape)

    def test_averaging(self, camera):
        img1 = camera.get_image(averaging=False)
        img4 = camera.get_image(averaging=4)
        # Summed, not averaged: scales ~4x (saturation aside).
        assert img4.sum() >= 3 * img1.sum()

    def test_image_scales_with_exposure(self, slm, camera):
        slm.set_phase(None)
        camera.set_exposure(0.5)
        dim = camera.get_image().astype(float)
        camera.set_exposure(2.0)
        bright = camera.get_image().astype(float)
        assert bright.sum() > dim.sum()

    def test_capture_retries(self, slm):
        cam = SimulatedCamera(slm, capture_attempts=3)
        fails = {"n": 0}
        original = SimulatedCamera._get_image_hw

        def flaky(self, timeout_s=None):
            if fails["n"] < 2:
                fails["n"] += 1
                raise RuntimeError("transient")
            return original(self, timeout_s)

        cam._get_image_hw = flaky.__get__(cam)
        with pytest.warns(UserWarning):
            img = cam.get_image()
        assert img is not None and fails["n"] == 2


class TestHDR:
    def test_hdr_analysis(self):
        rng = np.random.default_rng(0)
        base = rng.uniform(0, 50, (16, 16))
        imgs = np.stack([np.clip(base * 2**i, 0, 255) for i in range(3)])
        stitched = Camera.get_image_hdr_analysis(imgs, overexposure_threshold=128)
        # Low-signal areas use the longest unsaturated exposure -> better SNR,
        # but values stay on the base scale.
        assert np.allclose(stitched[base * 4 < 128], base[base * 4 < 128], atol=1)

    def test_hdr_capture(self, slm, camera):
        slm.set_phase(None)
        camera.set_exposure(0.01)
        img = camera.get_image(hdr=(2, 2))
        assert img.shape == tuple(camera.shape)
        assert camera.exposure_s == 0.01  # Restored.


class TestSimulatedCamera:
    def test_zeroth_order_lands_at_b(self, slm, camera):
        slm.set_phase(None)
        camera.set_exposure(1)
        img = camera.get_image()
        peak = np.unravel_index(np.argmax(img), img.shape)
        assert abs(peak[0] - 256) <= 1 and abs(peak[1] - 256) <= 1

    def test_blaze_moves_spot(self, slm, camera):
        from tests.conftest import RIG_M, RIG_B

        kxy = np.array([[0.003], [0.001]])
        slm.set_phase(tphase.blaze(slm, kxy.ravel()), phase_correct=False)
        img = camera.get_image()
        peak = np.unravel_index(np.argmax(img), img.shape)
        expected = RIG_M @ kxy + RIG_B
        assert abs(peak[1] - expected[0, 0]) <= 2
        assert abs(peak[0] - expected[1, 0]) <= 2

    def test_noise_injection(self, slm, camera):
        camera.noise = {"read": lambda x: 0.02 * x * np.random.rand(*x.shape)}
        slm.set_phase(None)
        img = camera.get_image()
        assert np.count_nonzero(img) > 0.5 * img.size
        camera.noise = None

    def test_bad_noise_key_raises(self, slm, camera):
        camera.noise = {"bogus": lambda x: x}
        with pytest.raises(Exception):
            camera.get_image()
        camera.noise = None

    def test_build_affine(self, slm, camera):
        M, b = camera.build_affine(f_eff=5e3, units="norm", theta=0.1)
        assert M.shape == (2, 2) and b.shape == (2, 1)
        # Determinant scales as f_eff^2 in ij units.
        f_ij = 5e3 * slm.wav_um / np.mean(camera.pitch_um)
        assert np.isclose(np.abs(np.linalg.det(M)), f_ij**2, rtol=1e-3)


class TestAutoexposure:
    def test_autoexposure_converges(self, slm, camera):
        slm.set_phase(None)
        camera.set_exposure(50)  # badly overexposed
        camera.autoexposure(verbose=False)
        img = camera.get_image()
        assert 0.3 * camera.bitresolution < img.max() < 0.7 * camera.bitresolution


class TestAutofocus:
    def test_autofocus_metric(self):
        sharp = np.zeros((32, 32))
        sharp[16, 16] = 1
        blurry = np.ones((32, 32)) / 1024
        assert Camera._autofocus_metric(sharp) > Camera._autofocus_metric(blurry)


@pytest.mark.hardware
class TestSelfTest:
    def test_selftest(self, camera):
        assert camera.test()
