"""
Extended analysis coverage mirroring the reference's behavior matrix
(ref ``tests/holography/test_analysis.py``): moment conventions,
variance/ellipticity/area identities, normalization, orientation
transforms, positions/std helpers, and 8-bit conversion.
"""

import numpy as np
import pytest

from slmsuite_tpu.holography import analysis


def _disk(shape=(100, 100), center=(50, 50), rx=10, ry=None):
    ry = rx if ry is None else ry
    Y, X = np.ogrid[: shape[0], : shape[1]]
    img = np.zeros(shape)
    img[((X - center[0]) / rx) ** 2 + ((Y - center[1]) / ry) ** 2 <= 1] = 1.0
    return img[np.newaxis]


class TestImageMoment:
    def test_zeroth_unnormalized_is_total(self):
        image = np.full((1, 50, 50), 0.5)
        m = analysis.image_moment(image, moment=(0, 0), normalize=False)
        assert m[0] == pytest.approx(50 * 50 * 0.5)

    def test_zeroth_normalized_is_one(self):
        image = np.full((1, 50, 50), 0.5)
        assert analysis.image_moment(image, moment=(0, 0))[0] == pytest.approx(1)

    def test_first_moments_centered_square(self):
        image = np.zeros((1, 100, 100))
        image[0, 45:55, 45:55] = 1
        mx = analysis.image_moment(image, moment=(1, 0))
        my = analysis.image_moment(image, moment=(0, 1))
        assert mx.shape == my.shape == (1,)
        # Centered object: first moments vanish in the centered default grid.
        assert mx[0] == pytest.approx(0, abs=1)
        assert my[0] == pytest.approx(0, abs=1)

    def test_grid_as_meshes_and_vectors(self):
        image = np.zeros((1, 40, 40))
        image[0, 15:25, 15:25] = 1
        xs = np.arange(40, dtype=float)
        X, Y = np.meshgrid(xs, xs)
        m2d = analysis.image_moment(image, moment=(1, 0), grid=(X, Y))
        m1d = analysis.image_moment(image, moment=(1, 0), grid=(xs, xs))
        assert m2d.shape == m1d.shape == (1,)
        np.testing.assert_allclose(m2d, m1d)

    def test_nansum_ignores_nans(self):
        image = np.full((1, 30, 30), 1.0)
        image[0, 0, 0] = np.nan
        m = analysis.image_moment(image, moment=(0, 0), normalize=False, nansum=True)
        assert m[0] == pytest.approx(30 * 30 - 1)


class TestImageVariances:
    def test_circular_spot_isotropic(self):
        v = analysis.image_variances(_disk(rx=10))
        assert v.shape == (3, 1)
        assert v[0, 0] == pytest.approx(v[1, 0], rel=0.1)
        assert abs(v[2, 0]) < v[0, 0] * 0.1

    def test_elliptical_spot_anisotropic(self):
        v = analysis.image_variances(_disk(rx=20, ry=10))
        assert abs(v[0, 0] - v[1, 0]) > 0.1 * v[1, 0]

    def test_exclude_shear(self):
        # Without shear the result is just the (2, N) diagonal moments.
        v = analysis.image_variances(_disk(rx=12), exclude_shear=True)
        assert v.shape == (2, 1)
        full = analysis.image_variances(_disk(rx=12))
        np.testing.assert_allclose(v, full[:2])


class TestEllipticityAreasAngle:
    def test_circular_zero_ellipticity(self):
        v = np.array([[100.0], [100.0], [0.0]])
        assert analysis.image_ellipticity(v)[0] == pytest.approx(0.0, abs=0.01)

    def test_elongated_nonzero(self):
        v = np.array([[200.0], [100.0], [0.0]])
        assert analysis.image_ellipticity(v)[0] > 0.1

    def test_areas(self):
        assert analysis.image_areas(
            np.array([[200.0], [100.0], [0.0]])
        )[0] == pytest.approx(20000)
        assert analysis.image_areas(
            np.array([[100.0], [100.0], [0.0]])
        )[0] == pytest.approx(10000)

    def test_angles(self):
        # Axis-aligned elongated ellipse: major axis along x -> angle 0
        # (mod pi).
        a = analysis.image_ellipticity_angle(
            np.array([[200.0], [100.0], [0.0]])
        )[0]
        assert min(abs(a % np.pi), np.pi - abs(a % np.pi)) < 0.01
        assert analysis.image_ellipticity_angle(
            np.array([[100.0], [100.0], [0.0]])
        )[0] == pytest.approx(0, abs=0.01)
        # Sheared: atan2(eig_plus - m02, m11) in the reference's own
        # x/y convention — value verified bit-identical to the
        # reference implementation.
        sheared = analysis.image_ellipticity_angle(
            np.array([[200.0], [100.0], [50.0]])
        )[0]
        assert sheared == pytest.approx(1.1780972450961724, abs=1e-9)

    def test_multiple_spots_vectorized(self):
        v = np.array(
            [[100.0, 200.0, 150.0], [100.0, 100.0, 75.0], [0.0, 0.0, 25.0]]
        )
        for fn in (analysis.image_ellipticity, analysis.image_areas,
                   analysis.image_ellipticity_angle):
            out = fn(v)
            assert len(out) == 3 and np.all(np.isfinite(out))


class TestPositionsStdNormalization:
    def test_positions_track_offset(self):
        img = np.zeros((1, 64, 64))
        img[0, 40:44, 20:24] = 1.0
        x, y = analysis.image_positions(img)
        # Centered grid: x ~ 22-32, y ~ 42-32.
        assert x[0] == pytest.approx(21.5 - 31.5, abs=0.6)
        assert y[0] == pytest.approx(41.5 - 31.5, abs=0.6)

    def test_std_matches_uniform_square(self):
        img = np.zeros((1, 64, 64))
        img[0, 20:40, 20:40] = 1.0
        sx, sy = analysis.image_std(img)
        expected = np.sqrt((20**2 - 1) / 12.0)
        assert sx[0] == pytest.approx(expected, rel=0.05)
        assert sy[0] == pytest.approx(expected, rel=0.05)

    def test_normalization_total_power(self):
        img = np.full((2, 10, 10), 2.0)
        norms = analysis.image_normalization(img)
        assert norms.shape == (2,)
        assert norms[0] == pytest.approx(200.0)


class TestOrientationAnd8Bit:
    def test_orientation_rotations_compose(self):
        img = np.arange(12).reshape(3, 4)
        f90 = analysis.get_orientation_transformation(rot="90")
        f270 = analysis.get_orientation_transformation(rot="270")
        # 90 + 270 degrees compose to the identity.
        np.testing.assert_array_equal(f270(f90(img)), img)
        f0 = analysis.get_orientation_transformation()
        np.testing.assert_array_equal(f0(img), img)

    def test_orientation_flips(self):
        img = np.arange(12).reshape(3, 4)
        fl = analysis.get_orientation_transformation(fliplr=True)
        fu = analysis.get_orientation_transformation(flipud=True)
        np.testing.assert_array_equal(fl(img), np.fliplr(img))
        np.testing.assert_array_equal(fu(img), np.flipud(img))

    def test_make_8bit_range(self):
        img = np.linspace(-3.0, 7.0, 100).reshape(10, 10)
        out = analysis._make_8bit(img)
        assert out.dtype == np.uint8
        assert out.min() == 0 and out.max() == 255

    def test_make_8bit_constant_image(self):
        # Constant image: min is subtracted and the zero peak guarded,
        # so the result is exactly zero everywhere.
        out = analysis._make_8bit(np.full((8, 8), 3.3))
        assert out.dtype == np.uint8
        assert np.all(out == 0)


class TestSinc2dJacobian:
    def test_jacobian_matches_finite_differences(self):
        """_sinc2d_centered_jacobian is the true gradient of
        _sinc2d_centered (the reference's jacobian at fitfunctions.py:509
        omits the np.sinc pi-normalization in its cos terms — ours fixes
        that; both are unused by image_fit)."""
        from slmsuite_tpu.holography.analysis.fitfunctions import (
            _sinc2d_centered,
            _sinc2d_centered_jacobian,
        )

        rng = np.random.default_rng(0)
        xy = [rng.uniform(-5, 5, 40), rng.uniform(-5, 5, 40)]
        params = dict(R=3.2, a=1.4, b=0.7, c=0.2, d=0.05, kx=0.8, ky=-0.5)
        jac = _sinc2d_centered_jacobian(xy, **params)
        assert jac.shape == (40, 7)
        eps = 1e-6
        for i, key in enumerate(params):
            hi = dict(params); hi[key] += eps
            lo = dict(params); lo[key] -= eps
            fd = (_sinc2d_centered(xy, **hi) - _sinc2d_centered(xy, **lo)) / (2 * eps)
            np.testing.assert_allclose(jac[:, i], fd, atol=1e-8)


class TestPlotSourceR2Contour:
    def test_r2_panel_and_contour(self):
        """plot_source renders the r2 panel with the threshold contour
        when a processed wavefront calibration populated the source
        (ref slms/slm.py:1240-1330)."""
        import matplotlib.pyplot as plt

        from slmsuite_tpu.hardware.slms.simulated import SimulatedSLM

        slm = SimulatedSLM((64, 64), pitch_um=(8, 8), wav_um=0.78)
        rng = np.random.default_rng(1)
        r2 = np.clip(rng.uniform(0.5, 1.0, (64, 64)), 0, 1)
        slm.source.update({
            "amplitude": np.ones((64, 64)),
            "phase": rng.uniform(0, 2 * np.pi, (64, 64)),
            "r2": r2,
            "r2_threshold": 0.9,
        })
        axs = slm.plot_source()
        try:
            assert len(axs) == 3
            assert axs[2].get_title() == "Cal Fitting $R^2$"
            # The contour drew line artists on the r2 panel.
            assert len(axs[2].collections) > 0
        finally:
            plt.close("all")

    def test_no_r2_two_panels(self):
        import matplotlib.pyplot as plt

        from slmsuite_tpu.hardware.slms.simulated import SimulatedSLM

        slm = SimulatedSLM((32, 32), pitch_um=(8, 8), wav_um=0.78)
        slm.source.update({
            "amplitude": np.ones((32, 32)),
            "phase": np.zeros((32, 32)),
        })
        axs = slm.plot_source()
        try:
            assert len(axs) == 2
        finally:
            plt.close("all")
