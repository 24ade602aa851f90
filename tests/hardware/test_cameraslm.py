"""
Integration tests for FourierSLM calibration on the simulated rig
(mirrors reference tests/hardware/test_cameraslm.py).
"""

import warnings

import numpy as np
import pytest

from slmsuite_tpu.hardware.cameraslms import CameraSLM, FourierSLM, NearfieldSLM
from tests.conftest import RIG_B, RIG_M


class TestConstruction:
    def test_basic(self, fourierslm):
        assert fourierslm.cam is not None and fourierslm.slm is not None
        assert fourierslm.calibrations == {}

    def test_rejects_non_camera(self, slm):
        with pytest.raises(ValueError, match="Camera"):
            CameraSLM("not_a_camera", slm)

    def test_rejects_non_slm(self, camera):
        with pytest.raises(ValueError, match="SLM"):
            CameraSLM(camera, "not_an_slm")

    def test_nearfield_stub(self, camera, slm):
        with pytest.raises(NotImplementedError):
            NearfieldSLM(camera, slm)


class TestFourierCalibration:
    def test_recovers_truth(self, fourierslm_calibrated):
        cal = fourierslm_calibrated.calibrations["fourier"]
        assert np.allclose(cal["M"], RIG_M, rtol=0.05, atol=80)
        assert np.allclose(cal["b"], RIG_B, atol=2)

    def test_analytic(self, fourierslm):
        M = np.array([[1.5e3, 10], [-5, 1.6e3]])
        b = np.array([[10.0], [20.0]])
        fourierslm.fourier_calibrate_analytic(M, b)
        cal = fourierslm.calibrations["fourier"]
        assert np.allclose(cal["M"], M)
        assert np.allclose(np.ravel(cal["b"]), [10, 20])

    def test_nonpositive_pitch_raises(self, fourierslm):
        with pytest.raises(ValueError):
            fourierslm.fourier_calibrate(array_pitch=-1, array_shape=5)

    def test_metadata(self, fourierslm_calibrated):
        cal = fourierslm_calibrated.calibrations["fourier"]
        assert "__version__" in cal


class TestTransforms:
    def test_roundtrip(self, fourierslm_calibrated):
        kxy = np.array([[0.003, -0.002], [0.001, 0.0025]])
        back = fourierslm_calibrated.ijcam_to_kxyslm(
            fourierslm_calibrated.kxyslm_to_ijcam(kxy)
        )
        assert np.allclose(back, kxy, atol=1e-10)

    def test_3d_roundtrip(self, fourierslm_calibrated):
        kxyz = np.array([[0.003], [0.001], [0.05]])
        back = fourierslm_calibrated.ijcam_to_kxyslm(
            fourierslm_calibrated.kxyslm_to_ijcam(kxyz)
        )
        assert np.allclose(back, kxyz, rtol=1e-6)

    def test_requires_calibration(self, fourierslm):
        with pytest.raises(RuntimeError):
            fourierslm.kxyslm_to_ijcam((0, 0))

    def test_effective_focal_length(self, fourierslm_calibrated):
        f_ij = fourierslm_calibrated.get_effective_focal_length("ij")
        assert np.isclose(f_ij, np.sqrt(np.abs(np.linalg.det(RIG_M))), rtol=0.05)

    def test_spot_size(self, fourierslm_calibrated):
        size = fourierslm_calibrated.get_farfield_spot_size(basis="ij")
        assert np.all(np.asarray(size) > 0)


class TestClosedLoop:
    def test_targeted_spot_lands(self, fourierslm_calibrated):
        """Request a camera-pixel target through the calibration; check it lands."""
        from slmsuite_tpu.holography.algorithms import SpotHologram

        fs = fourierslm_calibrated
        target_ij = np.array([[330.0], [210.0]])
        holo = SpotHologram(
            SpotHologram.get_padded_shape(fs), target_ij, basis="ij", cameraslm=fs
        )
        holo.optimize("WGS-Leonardo", maxiter=15, verbose=False)
        fs.slm.set_phase(holo.get_phase(), phase_correct=False)
        img = fs.cam.get_image()
        peak = np.unravel_index(np.argmax(img), img.shape)
        assert abs(peak[1] - 330) <= 3
        assert abs(peak[0] - 210) <= 3


class TestSimulateClone:
    def test_simulate(self, fourierslm_calibrated):
        sim = fourierslm_calibrated.simulate()
        assert isinstance(sim, FourierSLM)
        assert "fourier" in sim.calibrations
        # Clone's camera reproduces the rig geometry.
        sim.slm.set_phase(None)
        img = sim.cam.get_image()
        peak = np.unravel_index(np.argmax(img), img.shape)
        b = np.ravel(fourierslm_calibrated.calibrations["fourier"]["b"])
        assert abs(peak[1] - b[0]) <= 3 and abs(peak[0] - b[1]) <= 3

    def test_simulate_requires_calibration(self, fourierslm):
        with pytest.raises(ValueError):
            fourierslm.simulate()


class TestCalibrationIO:
    def test_save_load_roundtrip(self, fourierslm_calibrated, tmp_path):
        fs = fourierslm_calibrated
        path = fs.save_calibration("fourier", str(tmp_path))
        M = fs.calibrations["fourier"]["M"].copy()
        fs.calibrations = {}
        fs.load_calibration("fourier", path)
        assert np.allclose(fs.calibrations["fourier"]["M"], M)

    def test_save_unknown_raises(self, fourierslm):
        with pytest.raises(ValueError):
            fourierslm.save_calibration("bogus")

    def test_rig_save_load(self, fourierslm_calibrated, tmp_path):
        fs = fourierslm_calibrated
        path = fs.save(str(tmp_path))
        loaded = FourierSLM.load(path)
        assert loaded.slm.shape == fs.slm.shape
        assert loaded.cam.shape == fs.cam.shape


@pytest.mark.slow
class TestSettleCalibration:
    def test_settle(self, fourierslm_calibrated):
        fs = fourierslm_calibrated
        cal = fs.settle_calibrate(times=5, settle_time_s=0)
        assert "data" in cal


def test_calibration_points_exclusion_guard(fourierslm_calibrated):
    """Coarse pitch + default exclusion can eliminate every candidate;
    the error must say so instead of crashing deep in the engine."""
    fs = fourierslm_calibrated
    coarse = float(np.sqrt(np.prod(fs.cam.shape) / 4))
    with pytest.raises(ValueError, match="exclusion"):
        fs.wavefront_calibration_points(coarse)
    # An explicit smaller exclusion yields points at the same pitch.
    points = fs.wavefront_calibration_points(coarse, field_exclusion=60)
    assert points.shape[0] == 2 and points.shape[1] > 0


def test_compressed_rejects_zero_spots(fourierslm_calibrated):
    from slmsuite_tpu.holography.algorithms import CompressedSpotHologram

    with pytest.raises(ValueError, match="at least one spot"):
        CompressedSpotHologram(
            np.zeros((2, 0)), basis="kxy", cameraslm=fourierslm_calibrated
        )


class TestSuperpixelProcessing:
    """Numeric tests of the superpixel wavefront-processing core on
    synthetic raw data with a known ground truth (no camera loop)."""

    def _raw(self, fs, kx_val, ky_val, offset_val, superpixel_size=64,
             holes=()):
        """Raw v0.0.1-schema data for a globally-affine wavefront: every
        superpixel's fringe fit reports gradient (kx_val, ky_val) and
        constant offset, which the processor should expand into the blaze
        2pi (kx X + ky Y) + offset over the SLM."""
        H, W = fs.slm.shape
        NY, NX = H // superpixel_size, W // superpixel_size
        ref = (NY // 2, NX // 2)

        r2 = np.ones((NY, NX))
        for hole in holes:
            r2[hole] = 0.2
        r2[ref] = np.nan  # The reference has no fit (forced trusted).

        yy, xx = np.meshgrid(
            np.arange(NY) - ref[0], np.arange(NX) - ref[1], indexing="ij"
        )
        power = 100.0 * np.exp(-(xx**2 + yy**2) / 8.0)
        power[ref] = np.inf  # Contaminated (always-on) reference reading.

        return {
            "__version__": "0.0.1",
            "NX": NX, "NY": NY, "nxref": ref[1], "nyref": ref[0],
            "superpixel_size": superpixel_size,
            "power": power,
            "normalization": np.full((NY, NX), 120.0),
            "background": np.zeros((NY, NX)),
            "phase": np.full((NY, NX), offset_val),
            "kx": np.full((NY, NX), kx_val),
            "ky": np.full((NY, NX), ky_val),
            "r2_fit": r2,
            "previous_phase_correction": False,
        }

    def _expected_blaze(self, fs, kx_val, ky_val):
        x_grid, y_grid = fs.slm.grid
        return 2 * np.pi * (kx_val * x_grid + ky_val * y_grid)

    @staticmethod
    def _wrapped_spread(delta):
        """Max circular deviation of ``delta`` from its circular mean."""
        mean = np.angle(np.mean(np.exp(1j * delta)))
        return np.abs(np.angle(np.exp(1j * (delta - mean)))).max()

    def test_affine_wavefront_reconstructed(self, fourierslm):
        fs = fourierslm
        x_grid = fs.slm.grid[0]
        kx_val = 0.2 / (x_grid.max() * 2 * np.pi)  # No wraps over the SLM.
        ky_val = -0.5 * kx_val
        fs.calibrations["wavefront_superpixel"] = self._raw(
            fs, kx_val, ky_val, offset_val=1.0
        )
        out = fs.wavefront_calibration_superpixel_process(
            smooth=0, remove_blaze=False, remove_background=False,
            apply=False,
        )
        delta = out["phase"] - self._expected_blaze(fs, kx_val, ky_val)
        assert self._wrapped_spread(delta) < 1e-6

    def test_untrusted_holes_inferred(self, fourierslm):
        """Below-threshold superpixels get the neighbors' affine model."""
        fs = fourierslm
        x_grid = fs.slm.grid[0]
        kx_val = 0.15 / (x_grid.max() * 2 * np.pi)
        ky_val = 0.7 * kx_val
        # A 2x2 untrusted block away from the reference + a lone corner.
        holes = [(1, 1), (1, 2), (2, 1), (2, 2), (7, 7)]
        fs.calibrations["wavefront_superpixel"] = self._raw(
            fs, kx_val, ky_val, offset_val=0.3, holes=holes
        )
        out = fs.wavefront_calibration_superpixel_process(
            smooth=0, remove_blaze=False, remove_background=False,
            apply=False,
        )
        delta = out["phase"] - self._expected_blaze(fs, kx_val, ky_val)
        # The affine field is recovered exactly, holes included.
        assert self._wrapped_spread(delta) < 1e-6

    def test_amplitude_map(self, fourierslm):
        fs = fourierslm
        fs.calibrations["wavefront_superpixel"] = self._raw(
            fs, 1e-4, 1e-4, offset_val=0.0
        )
        out = fs.wavefront_calibration_superpixel_process(
            smooth=0, remove_background=False, apply=False
        )
        amp = out["amplitude"]
        assert amp.shape == fs.slm.shape
        assert np.isclose(amp.max(), 1.0)
        # Peak near the center (the superpixel Gaussian's center).
        peak = np.unravel_index(np.argmax(amp), amp.shape)
        center = (fs.slm.shape[0] // 2, fs.slm.shape[1] // 2)
        assert abs(peak[0] - center[0]) < 64 and abs(peak[1] - center[1]) < 64
        # r2 map upsampled to SLM resolution.
        assert out["r2"].shape == fs.slm.shape

    def test_apply_writes_source(self, fourierslm):
        fs = fourierslm
        fs.calibrations["wavefront_superpixel"] = self._raw(
            fs, 1e-4, 0.0, offset_val=0.0
        )
        fs.wavefront_calibration_superpixel_process(smooth=2, apply=True)
        assert "phase" in fs.slm.source and "amplitude" in fs.slm.source
        assert fs.slm.source["phase"].shape == fs.slm.shape


class TestWavefrontSmokeFast:
    """Default-CI smoke of the full superpixel wavefront loop (tiny rig):
    sweep + process + verified Strehl improvement. The full-size variant
    lives in the slow examples."""

    def test_superpixel_sweep_corrects_aberration(self):
        from slmsuite_tpu.hardware.cameras.simulated import SimulatedCamera
        from slmsuite_tpu.hardware.slms.simulated import SimulatedSLM
        from slmsuite_tpu.holography.toolbox import phase as tphase

        slm = SimulatedSLM(resolution=(256, 256), pitch_um=(8, 8), wav_um=0.78)
        slm.set_source_analytic(
            "gaussian2d", sim=True, x0=0, y0=0, a=1, c=0,
            wx=0.35 * 256 * slm.pitch[0], wy=0.35 * 256 * slm.pitch[1],
        )
        cam = SimulatedCamera(
            slm, resolution=(256, 256), pitch_um=(5.5, 5.5),
            M=np.array([[4.0e3, 100.0], [-100.0, 4.0e3]]),
            b=np.array([[128.0], [128.0]]),
        )
        cam.set_exposure(1.0)
        fs = FourierSLM(cam, slm)
        fs.fourier_calibrate(array_shape=5, array_pitch=8, verbose=False)

        aberration = tphase.zernike_sum(
            fs.slm, (4, 3), (1.5, -1.0)
        ).astype(np.float32)
        fs.slm.source["phase_sim"] = aberration

        fs.wavefront_calibrate(
            method="superpixel",
            calibration_points=np.array([[160.0], [110.0]]),
            superpixel_size=32,
            phase_steps=8,
            plot=-1,
        )
        fs.wavefront_calibration_superpixel_process(
            apply=True, smooth=2, plot=False
        )

        correction = fs.slm.source.get("phase")
        assert correction is not None and np.isfinite(correction).all()

        def spot_peak():
            fs.slm.set_phase(None, settle=False)
            return float(fs.cam.get_image().astype(float).max())

        while spot_peak() >= 0.9 * fs.cam.bitresolution:
            fs.cam.set_exposure(fs.cam.get_exposure() / 2)
        after = spot_peak()
        fs.slm.source.pop("phase")
        before = spot_peak()
        fs.slm.source["phase"] = correction
        # The corrected spot concentrates more power at the peak.
        assert after > 1.1 * before


class TestWavefrontDiagnosticPlots:
    """The ``plot=1/2`` levels of both wavefront calibrations render
    real diagnostics (ref ``cameraslms.py:2934-3090, 3984-4094,
    1948-1973, 2041-2063``); these smoke them under Agg and count the
    produced figures."""

    @staticmethod
    def _rig():
        from slmsuite_tpu.hardware.cameras.simulated import SimulatedCamera
        from slmsuite_tpu.hardware.slms.simulated import SimulatedSLM

        slm = SimulatedSLM(resolution=(256, 256), pitch_um=(8, 8), wav_um=0.78)
        slm.set_source_analytic(
            "gaussian2d", sim=True, x0=0, y0=0, a=1, c=0,
            wx=0.35 * 256 * slm.pitch[0], wy=0.35 * 256 * slm.pitch[1],
        )
        cam = SimulatedCamera(
            slm, resolution=(256, 256), pitch_um=(5.5, 5.5),
            M=np.array([[4.0e3, 100.0], [-100.0, 4.0e3]]),
            b=np.array([[128.0], [128.0]]),
        )
        cam.set_exposure(1.0)
        fs = FourierSLM(cam, slm)
        fs.fourier_calibrate(array_shape=5, array_pitch=8, verbose=False)
        return fs

    @pytest.mark.slow
    def test_superpixel_live_diagnostics(self, tmp_path):
        """plot=2 renders the labeled SLM/camera/zoom triptych per
        measurement (test_index measures exactly one column)."""
        import matplotlib.pyplot as plt

        fs = self._rig()
        plt.close("all")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            fs.wavefront_calibrate(
                method="superpixel",
                calibration_points=np.array([[160.0], [110.0]]),
                superpixel_size=64, phase_steps=1, plot=2, test_index=0,
            )
        figs = [plt.figure(n) for n in plt.get_fignums()]
        assert len(figs) >= 2  # Test-point + interference triptychs.
        for i, fig in enumerate(figs):
            fig.savefig(tmp_path / f"superpixel_diag_{i}.png")
        assert any(len(fig.axes) >= 3 for fig in figs)
        plt.close("all")

    @pytest.mark.slow
    def test_superpixel_plot_raw(self, tmp_path):
        import matplotlib.pyplot as plt

        fs = self._rig()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            fs.wavefront_calibrate(
                method="superpixel",
                calibration_points=np.array([[160.0], [110.0]]),
                superpixel_size=64, phase_steps=1, plot=-1,
            )
        plt.close("all")
        fs._wavefront_calibration_superpixel_plot_raw(index=0)
        fs._wavefront_calibration_superpixel_plot_raw(
            index=0, phase_detail=False, r2_threshold=0.5
        )
        fs._wavefront_calibration_superpixel_plot_raw(index=None)
        figs = [plt.figure(n) for n in plt.get_fignums()]
        assert len(figs) >= 3
        for i, fig in enumerate(figs):
            fig.savefig(tmp_path / f"superpixel_raw_{i}.png")
        plt.close("all")

    def test_zernike_status_and_raw_plots(self, tmp_path):
        import matplotlib.pyplot as plt

        fs = self._rig()
        plt.close("all")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            # perturbation=0 takes the no-perturbation status branch.
            fs.wavefront_calibrate_zernike(
                calibration_points=np.array([[130.0, 160], [110.0, 140]]),
                zernike_indices=5, perturbation=0, plot=2,
            )
        assert len(plt.get_fignums()) >= 2  # Status frame + tile zoom.
        plt.close("all")

        # Raw-data scatter from a stored zernike calibration.
        fs.calibrations["wavefront_zernike"] = {
            "corrected_spots": np.array([[0.1, -0.2], [0.3, 0.0], [0.05, 0.1]]),
            "calibration_points_ij": np.array([[130.0, 160], [110.0, 140]]),
            "zernike_indices": np.array([1, 2, 4]),
        }
        fs._wavefront_calibrate_zernike_plot_raw(index=2)
        figs = [plt.figure(n) for n in plt.get_fignums()]
        assert len(figs) >= 1
        figs[0].savefig(tmp_path / "zernike_raw.png")
        plt.close("all")


class TestSuperpixelR001Migration:
    """A pre-0.1 (r001-format, no __version__) wavefront h5 file loads
    and processes — the versioned-migration branch of
    wavefront_calibration_superpixel_process (ref dispatch
    ``cameraslms.py:3608-3621``)."""

    def test_r001_file_roundtrip(self, tmp_path):
        from slmsuite_tpu.misc.files import load_h5, save_h5

        fs = TestWavefrontDiagnosticPlots._rig()
        NY = NX = 4
        sp = 64
        rng = np.random.default_rng(5)
        r001 = {
            "NX": NX, "NY": NY, "nxref": 2, "nyref": 2,
            "superpixel_size": sp,
            "interference_point": np.array([160.0, 110.0]),
            "interference_size": np.array([8.0, 8.0]),
            "power": rng.uniform(500, 1000, (NY, NX)),
            "normalization": np.full((NY, NX), 1.1e3),
            "background": np.zeros((NY, NX)),
            "phase": rng.uniform(0, 2 * np.pi, (NY, NX)),
            "kx": rng.uniform(-1e-4, 1e-4, (NY, NX)),
            "ky": rng.uniform(-1e-4, 1e-4, (NY, NX)),
            "amp_fit": np.ones((NY, NX)),
            "contrast_fit": np.ones((NY, NX)),
            "r2_fit": np.full((NY, NX), 0.97),
        }
        path = str(tmp_path / "wavefront_r001.h5")
        save_h5(path, r001)

        loaded = load_h5(path)
        assert "__version__" not in loaded
        fs.calibrations["wavefront"] = loaded
        out = fs.wavefront_calibration_superpixel_process(
            smooth=2, apply=True, plot=False
        )
        # The version key was backfilled by the migration dispatch.
        assert fs.calibrations["wavefront"]["__version__"] == "0.0.1"
        assert out["phase"].shape == tuple(fs.slm.shape)
        assert np.isfinite(out["phase"]).all()
        assert np.isfinite(out["amplitude"]).all()
        assert "phase" in fs.slm.source


class TestSuperpixelSchedule:
    """The conflict-free measurement schedule (unit level: the helper
    the calibration uses)."""

    def _schedule(self, supershape, margin, n_refs=2, phase_steps=4):
        from slmsuite_tpu.hardware.cameraslms import _build_superpixel_schedule

        exclude = np.zeros(supershape, dtype=bool)
        if margin:
            exclude[:, :margin] = exclude[:, -margin:] = True
            exclude[:margin, :] = exclude[-margin:, :] = True
        index_image = np.arange(np.prod(supershape)).reshape(supershape)
        active = index_image[~exclude].ravel()
        # Central references (mirrors the calibration's default choice).
        center = np.array(supershape) // 2
        refs = np.array([
            index_image[center[0], center[1]],
            index_image[center[0], center[1] + 1],
        ][:n_refs])
        sched = _build_superpixel_schedule(supershape, exclude, refs, phase_steps)
        return sched, active, refs

    @pytest.mark.parametrize("margin", [0, 2])
    def test_covers_every_active_superpixel(self, margin):
        """Every active superpixel except a row's own reference is
        scheduled exactly once per row — with exclusion margins the
        upstream global-index rotation skipped one interior superpixel
        per point (never measured, silently BFS-invented downstream)."""
        sched, active, refs = self._schedule((8, 8), margin)
        for i in range(sched.shape[0]):
            row = sched[i][sched[i] >= 0]
            assert len(np.unique(row)) == len(row)  # no repeats
            expected = set(active.tolist()) - {int(refs[i])}
            assert set(row.tolist()) == expected

    @pytest.mark.parametrize("margin", [0, 2])
    def test_conflicts_evicted(self, margin):
        """Whenever point i's reference superpixel is measured as a
        target (by another row), row i itself is idle in that column —
        its interference reference would be overwritten."""
        sched, _active, refs = self._schedule((8, 8), margin)
        for i, r in enumerate(refs):
            cols = np.where(np.any(sched == r, axis=0))[0]
            assert np.all(sched[i, cols] == -1)
            # A row never targets its own reference.
            assert not np.any(sched[i] == r)

    def test_no_exclusion_matches_upstream_rotation(self):
        """With nothing excluded the schedule is bit-identical to the
        reference's global-index rotation (the differential pins rely
        on this)."""
        sched, active, refs = self._schedule((6, 6), 0, phase_steps=None)
        n = len(active)
        base = np.mod(
            np.arange(n - 1)[None, :] + 1 + refs[:, None], n
        )
        np.testing.assert_array_equal(sched[:, : n - 1], active[base])


class TestCalibrationAffineConsistency:
    def test_simulate_matches_calibration_with_array_center(
        self, fourierslm_calibrated
    ):
        """simulate() folds the calibration's array-center offset 'a'
        into the simulated camera's affine (ij = M kxy + b convention),
        so the cloned physics agrees with the cloned calibration."""
        fs = fourierslm_calibrated
        a = np.array([[0.004], [-0.003]])
        fs.calibrations["fourier"]["a"] = a
        fs_sim = fs.simulate()
        M = np.array(fs.calibrations["fourier"]["M"], float)
        b = np.array(fs.calibrations["fourier"]["b"], float).reshape(2, 1)
        np.testing.assert_allclose(
            np.asarray(fs_sim.cam.b, float).reshape(2, 1), b - M @ a, atol=1e-9
        )
        # And the cloned calibration still predicts through (M, a, b).
        kxy = np.array([[0.01], [0.005]])
        np.testing.assert_allclose(
            fs_sim.kxyslm_to_ijcam(kxy), M @ (kxy - a) + b, atol=1e-9
        )

    def test_rig_load_restores_calibration_and_wavelength(
        self, fourierslm_calibrated, tmp_path
    ):
        """save() -> load() round-trips into a USABLE rig: the Fourier
        calibration and the SLM wavelength survive (beyond the
        reference, whose load() drops both)."""
        fs = fourierslm_calibrated
        path = fs.save(str(tmp_path))
        loaded = FourierSLM.load(path)
        assert loaded.slm.wav_um == fs.slm.wav_um
        np.testing.assert_allclose(
            loaded.calibrations["fourier"]["M"],
            fs.calibrations["fourier"]["M"], rtol=1e-6,
        )
        kxy = np.array([[0.01], [0.005]])
        np.testing.assert_allclose(
            loaded.kxyslm_to_ijcam(kxy), fs.kxyslm_to_ijcam(kxy), atol=1e-6
        )


def test_fourier_calibrate_anisotropic_pitch():
    """The simulated camera's k-to-knm sampling uses the X pitch for the
    column coordinate (it previously reused the Y pitch, scaling every
    simulated x position by pitch_y/pitch_x on anisotropic-pixel SLMs):
    Fourier calibration on a pitch_um=(8, 12) rig recovers the camera's
    own affine."""
    from slmsuite_tpu.hardware.slms.simulated import SimulatedSLM
    from slmsuite_tpu.hardware.cameras.simulated import SimulatedCamera

    slm = SimulatedSLM(resolution=(256, 256), pitch_um=(8, 12), wav_um=0.78)
    slm.set_source_analytic(
        "gaussian2d", sim=True, x0=0, y0=0, a=1, c=0,
        wx=0.35 * 256 * slm.pitch[0], wy=0.35 * 256 * slm.pitch[1],
    )
    M_true = np.array([[3.0e3, 0.0], [0.0, 4.5e3]])
    cam = SimulatedCamera(
        slm, resolution=(256, 256), pitch_um=(5.5, 5.5),
        M=M_true, b=np.array([[128.0], [128.0]]),
    )
    cam.set_exposure(1.0)
    fs = FourierSLM(cam, slm)
    fs.fourier_calibrate(array_shape=5, array_pitch=8, verbose=False)
    M_fit = np.array(fs.calibrations["fourier"]["M"], float)
    np.testing.assert_allclose(M_fit, M_true, rtol=0.05, atol=40)
