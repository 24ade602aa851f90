"""Tests for the SLM abstraction (mirrors reference tests/hardware/test_slms.py)."""

import numpy as np
import pytest

from slmsuite_tpu.hardware.slms.simulated import SimulatedSLM


class TestConstruction:
    def test_shape_convention(self, slm):
        # resolution (width, height) -> shape (height, width)
        assert slm.shape == (512, 512)

    def test_grid_centered(self, slm):
        assert np.isclose(np.mean(slm.grid[0]), 0, atol=1e-9)
        assert np.isclose(np.mean(slm.grid[1]), 0, atol=1e-9)

    def test_pitch_normalized(self, slm):
        assert np.allclose(slm.pitch, slm.pitch_um / slm.wav_um)

    def test_bitresolution(self, slm):
        assert slm.bitresolution == 2**slm.bitdepth

    def test_phase_scaling(self):
        s = SimulatedSLM((64, 64), wav_um=0.78, wav_design_um=1.064)
        assert np.isclose(s.phase_scaling, 0.78 / 1.064)


class TestSetPhase:
    def test_none_zeroes(self, slm):
        slm.set_phase(np.ones(slm.shape))
        slm.set_phase(None)
        assert np.all(slm.phase == 0)

    def test_phase_roundtrip(self, slm):
        phase = np.random.uniform(0, 2 * np.pi, slm.shape)
        slm.set_phase(phase, phase_correct=False)
        # display quantization: display ~ (-phase mod 2pi) scaled
        recon = np.mod(-slm.display.astype(float) * 2 * np.pi / slm.bitresolution, 2 * np.pi)
        diff = np.mod(recon - phase + np.pi, 2 * np.pi) - np.pi
        # rint + the -1 continuity shift give up to 1.5 LSB of deviation.
        assert np.abs(diff).max() < 1.6 * 2 * np.pi / slm.bitresolution

    def test_larger_cropped(self, slm):
        big = np.zeros((600, 700))
        slm.set_phase(big, phase_correct=False)
        assert slm.phase.shape == slm.shape

    def test_integer_fast_path(self, slm):
        raw = np.full(slm.shape, 17, dtype=slm.display.dtype)
        slm.set_phase(raw)
        assert np.all(slm.display == 17)

    def test_integer_wrong_type_raises(self, slm):
        with pytest.raises(TypeError):
            slm.set_phase(np.zeros(slm.shape, dtype=np.int32))

    def test_integer_out_of_range_raises(self):
        s = SimulatedSLM((64, 64), bitdepth=10)  # uint16 display
        with pytest.raises(TypeError):
            s.set_phase(np.full(s.shape, 2000, dtype=s.display.dtype))

    def test_phase_correct(self, slm):
        correction = np.random.uniform(0, 1, slm.shape)
        slm.source["phase"] = correction
        slm.set_phase(np.zeros(slm.shape), phase_correct=True)
        # slm.phase is quantized in place by the write (reference behavior).
        diff = np.mod(slm.phase - correction + np.pi, 2 * np.pi) - np.pi
        assert np.abs(diff).max() < 1.1 * np.pi / slm.bitresolution

    def test_hologram_input(self, slm):
        from slmsuite_tpu.holography.algorithms import Hologram

        holo = Hologram((64, 64), slm_shape=(64, 64))
        s = SimulatedSLM((64, 64))
        s.set_phase(holo, phase_correct=False)
        diff = np.mod(s.phase - holo.get_phase() + np.pi, 2 * np.pi) - np.pi
        assert np.abs(diff).max() < 1.1 * np.pi / s.bitresolution

    def test_unsupported_execute_block(self, slm):
        with pytest.raises(ValueError):
            slm.set_phase(None, execute=False)
        with pytest.raises(ValueError):
            slm.set_phase(None, block=False)


class TestPhase2Gray:
    def test_zero_phase_max_display(self, slm):
        slm.set_phase(np.zeros(slm.shape), phase_correct=False)
        # phase=0 -> display=max (sign-flip convention).
        assert np.all(slm.display == slm.bitresolution - 1)

    def test_wrapping(self, slm):
        # Phase of 2pi wraps to same display as 0.
        slm.set_phase(np.zeros(slm.shape), phase_correct=False)
        d0 = slm.display.copy()
        slm.set_phase(np.full(slm.shape, 2 * np.pi), phase_correct=False)
        assert np.all(np.abs(d0.astype(int) - slm.display.astype(int)) <= 1)

    def test_phase_scaling_below_one(self):
        s = SimulatedSLM((64, 64), wav_um=0.78, wav_design_um=1.0)
        s.set_phase(np.full(s.shape, np.pi), phase_correct=False)
        assert s.display.max() < s.bitresolution


class TestSource:
    def test_set_source_analytic(self, slm):
        source = slm.set_source_analytic("gaussian2d")
        assert "amplitude" in source and "phase" in source
        assert source["amplitude"].shape == slm.shape

    def test_fit_source_amplitude_guess(self):
        s = SimulatedSLM((64, 48))
        s.fit_source_amplitude()
        assert "amplitude_radius" in s.source

    def test_fit_source_amplitude_measured(self, slm):
        slm.set_source_analytic("gaussian2d")
        slm.fit_source_amplitude()
        # Radius should be close to the w set by set_source_analytic default.
        expected = np.min([np.amax(slm.grid[0]), np.amax(slm.grid[1])]) / 2
        assert np.isclose(slm.source["amplitude_radius"], expected, rtol=0.15)

    def test_zernike_scaling(self, slm):
        slm.set_source_analytic("gaussian2d")
        scaling = slm.get_source_zernike_scaling()
        assert scaling > 0

    def test_spot_radius(self, slm):
        assert slm.get_spot_radius_kxy() > 0


class TestPersistence:
    def test_save_load_phase(self, slm, tmp_path):
        phase = np.random.uniform(0, 2 * np.pi, slm.shape)
        slm.set_phase(phase, phase_correct=False)
        path = slm.save_phase(str(tmp_path))
        saved = slm.phase.copy()
        slm.set_phase(None)
        loaded = slm.load_phase(path)
        assert np.allclose(loaded, saved)

    def test_pickle(self, slm):
        p = slm.pickle()
        assert p["__meta__"]["bitdepth"] == slm.bitdepth


class TestTriggers:
    def test_not_implemented(self, slm):
        with pytest.raises(NotImplementedError):
            slm.set_input_trigger(True)
        with pytest.raises(NotImplementedError):
            slm.set_output_trigger(True)


@pytest.mark.hardware
class TestSelfTest:
    def test_selftest(self, slm):
        assert slm.test()


class TestSLMParityMethods:
    def test_write_alias(self, slm):
        import warnings

        phase = np.random.uniform(0, 2 * np.pi, slm.shape)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            slm.write(phase)
        assert any("alias" in str(w.message) for w in caught)

    def test_plot(self, slm):
        ax = slm.plot(title="test")
        assert ax is not None

    def test_info_base(self, slm):
        assert type(slm).info(verbose=False) == [] or True  # Subclass may override.

    def test_load_vendor_phase_correction(self, slm, tmp_path):
        import cv2

        path = str(tmp_path / "corr.png")
        cv2.imwrite(path, np.random.randint(0, 255, tuple(slm.shape), dtype=np.uint8))
        corr = slm.load_vendor_phase_correction(path)
        assert corr.shape == tuple(slm.shape)
        assert np.all(corr >= 0) and np.all(corr <= 2 * np.pi / slm.phase_scaling + 0.1)
        assert "phase" in slm.source


class TestSimulatedRemoteWrite:
    def test_set_phase_hw_stores_display(self):
        """A direct ``_set_phase_hw`` write (the remote-server dispatch
        path, which bypasses the local set_phase pipeline) must update
        the simulated display — the SimulatedCamera renders from it.
        Regression: a pure no-op left remotely driven simulated rigs
        rendering a stale frame."""
        from slmsuite_tpu.hardware.slms.simulated import SimulatedSLM

        slm = SimulatedSLM((32, 32), pitch_um=(8, 8), wav_um=0.78)
        ramp = np.tile(
            np.arange(32, dtype=slm.display.dtype), (32, 1)
        ) * (slm.bitresolution // 32)
        slm._set_phase_hw(ramp.copy())
        np.testing.assert_array_equal(np.asarray(slm.display), ramp)
