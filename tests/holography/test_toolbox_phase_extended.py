"""
Extended toolbox.phase coverage mirroring the reference's behavior
matrix (ref ``tests/holography/test_toolbox_phase.py``): aperture
scaling modes, argument parsing helpers, polynomial term/pathing/out
variants, zernike_sum options, and structured-light properties.
"""

import numpy as np
import pytest

from slmsuite_tpu.holography.toolbox import phase


@pytest.fixture()
def norm_grid():
    """Square normalized grid spanning [-1, 1]."""
    x = np.linspace(-1, 1, 64)
    return np.meshgrid(x, x)


@pytest.fixture()
def grid():
    x = np.linspace(-0.5, 0.5, 48)
    y = np.linspace(-0.25, 0.25, 32)
    return np.meshgrid(x, y)


class TestZernikeAperture:
    def test_circular_isotropic(self, norm_grid):
        xs, ys = phase.zernike_aperture(norm_grid, aperture="circular")
        assert xs == pytest.approx(ys)
        assert xs * np.nanmax(norm_grid[0]) == pytest.approx(1, rel=1e-6)

    def test_elliptical_anisotropic(self):
        x = np.linspace(-200, 200, 32)
        y = np.linspace(-500, 500, 32)
        xs, ys = phase.zernike_aperture(np.meshgrid(x, y), aperture="elliptical")
        assert xs == pytest.approx(1 / 200, rel=1e-6)
        assert ys == pytest.approx(1 / 500, rel=1e-6)

    def test_cropped_circumscribes(self, norm_grid):
        xs, ys = phase.zernike_aperture(norm_grid, aperture="cropped")
        assert xs == pytest.approx(ys)
        m = np.nanmax(norm_grid[0])
        assert xs == pytest.approx(1 / np.sqrt(2 * m * m), rel=1e-6)

    def test_scalar_and_tuple(self, norm_grid):
        assert phase.zernike_aperture(norm_grid, 0.005) == (
            pytest.approx(0.005), pytest.approx(0.005))
        xs, ys = phase.zernike_aperture(norm_grid, (0.01, 0.02))
        assert (xs, ys) == (pytest.approx(0.01), pytest.approx(0.02))

    def test_invalid_string_raises(self, norm_grid):
        with pytest.raises(ValueError):
            phase.zernike_aperture(norm_grid, aperture="invalid")

    def test_none_defaults_to_cropped(self, norm_grid):
        assert phase.zernike_aperture(norm_grid, None) == pytest.approx(
            phase.zernike_aperture(norm_grid, "cropped")
        )

    def test_slm_like_scaling(self, norm_grid):
        class FakeSLM:
            x_grid, y_grid = norm_grid

            def get_source_zernike_scaling(self):
                return (0.01, 0.02)

        assert phase.zernike_aperture(FakeSLM(), None) == (0.01, 0.02)

    def test_cameraslm_like_delegates(self, norm_grid):
        class FakeSLM:
            x_grid, y_grid = norm_grid

            def get_source_zernike_scaling(self):
                return (0.03, 0.04)

        class FakeCameraSLM:
            x_grid, y_grid = norm_grid
            slm = FakeSLM()
            cam = True

        assert phase.zernike_aperture(FakeCameraSLM(), None) == (0.03, 0.04)

    def test_bad_type_raises(self, norm_grid):
        with pytest.raises(ValueError, match="not recognized"):
            phase.zernike_aperture(norm_grid, aperture=object())


class TestArgumentParsing:
    def test_focal_scalar_to_pair(self):
        f = phase._parse_focal_length(3.0)
        np.testing.assert_allclose(np.asarray(f, float), [3.0, 3.0])

    def test_focal_zero_raises(self):
        with pytest.raises(ValueError, match="zero"):
            phase._parse_focal_length((1.0, 0.0))

    def test_focal_wrong_size_raises(self):
        with pytest.raises(ValueError):
            phase._parse_focal_length((1.0, 2.0, 3.0))

    def test_parse_out_allocates(self, grid):
        out = phase._parse_out(grid[0], None, stack=3)
        assert out.shape == (3,) + grid[0].shape
        assert out.dtype == grid[0].dtype
        assert np.all(out == 0)

    def test_parse_out_validates_size(self, grid):
        with pytest.raises(ValueError, match="size"):
            phase._parse_out(grid[0], np.zeros(7, grid[0].dtype))

    def test_parse_out_validates_dtype(self, grid):
        bad = np.zeros((1,) + grid[0].shape, np.float16)
        with pytest.raises(ValueError, match="type"):
            phase._parse_out(grid[0], bad)

    def test_parse_out_reshapes(self, grid):
        flat = np.ones(grid[0].size, grid[0].dtype)
        out = phase._parse_out(grid[0], flat, stack=1)
        assert out.shape == (1,) + grid[0].shape


class TestSourceRadius:
    def test_explicit_passthrough(self, grid):
        assert phase._determine_source_radius(grid, w=0.123) == 0.123

    def test_default_quarter_extent(self, grid):
        w = phase._determine_source_radius(grid)
        expected = min(np.amax(grid[0]), np.amax(grid[1])) / 4
        assert w == pytest.approx(expected)

    def test_slm_source_radius_used(self, grid):
        class FakeSLM:
            x_grid, y_grid = grid

            def get_source_radius(self):
                return 0.321

        assert phase._determine_source_radius(FakeSLM()) == 0.321


class TestLensExtended:
    def test_anisotropic_values(self, grid):
        f = (2.0, 4.0)
        p = phase.lens(grid, f)
        expected = (np.pi / 2.0) * grid[0] ** 2 + (np.pi / 4.0) * grid[1] ** 2
        np.testing.assert_allclose(p, expected, atol=1e-7)

    def test_one_axis_infinite_is_cylindrical(self, grid):
        p = phase.lens(grid, (2.0, np.inf))
        # No y dependence: every row is identical.
        assert np.allclose(p[0, :], p[-1, :])
        expected = (np.pi / 2.0) * grid[0] ** 2
        np.testing.assert_allclose(p, expected, atol=1e-7)


class TestPolynomialExtended:
    def test_explicit_terms(self, grid):
        # w * x^2 y  via explicit (a, b) powers.
        # Returns (N, H, W) like the reference; squeeze the unit stack.
        p = np.squeeze(np.asarray(phase.polynomial(grid, [2.0], terms=[(2, 1)])))
        np.testing.assert_allclose(p, 2.0 * grid[0] ** 2 * grid[1], atol=1e-6)

    def test_vortex_special_term(self, grid):
        p = np.squeeze(np.asarray(
            phase.polynomial(grid, [1.0], terms=[(-1, 0)], pathing=False)
        ))
        # The vortex waveplate is an azimuthal angle: winding number 1
        # around the center.
        H, W = p.shape
        ring = [p[H // 4, W // 2], p[H // 2, 3 * W // 4],
                p[3 * H // 4, W // 2], p[H // 2, W // 4]]
        diffs = np.angle(np.exp(1j * np.diff(ring + ring[:1])))
        assert abs(abs(diffs.sum()) - 2 * np.pi) < 1e-3

    def test_stacked_weights(self, grid):
        weights = np.array([[1.0, 0.0], [0.0, 2.0]])  # (D, N): two stacks.
        p = np.asarray(phase.polynomial(grid, weights, terms=[(1, 0), (0, 1)]))
        assert p.shape == (2,) + grid[0].shape
        np.testing.assert_allclose(p[0], grid[0], atol=1e-6)
        np.testing.assert_allclose(p[1], 2.0 * grid[1], atol=1e-6)

    def test_out_buffer_reused(self, grid):
        out = np.zeros((1,) + grid[0].shape, grid[0].dtype)
        p = phase.polynomial(grid, [1.0], terms=[(1, 1)], out=out)
        assert np.shares_memory(np.asarray(p), out)

    def test_pathing_false_matches_default(self, grid):
        w = [0.3, -0.2, 0.7, 0.1]
        a = np.asarray(phase.polynomial(grid, w))
        b = np.asarray(phase.polynomial(grid, w, pathing=False))
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestZernikeSumExtended:
    def test_aperture_changes_scale(self, norm_grid):
        a = np.asarray(phase.zernike_sum(norm_grid, [3], [1.0], aperture=1.0))
        b = np.asarray(phase.zernike_sum(norm_grid, [3], [1.0], aperture=0.5))
        # Defocus with half the aperture scale maps coordinates to half
        # the unit disk: 4x smaller quadratic term up to the piston.
        am = a - a[32, 32]
        bm = b - b[32, 32]
        mask = np.hypot(*norm_grid) < 0.45
        np.testing.assert_allclose(bm[mask], am[mask] / 4, atol=1e-5)

    def test_stacked_coefficients(self, norm_grid):
        w = np.array([[1.0, 0.0], [0.0, 1.0]])  # (D, N)
        p = np.asarray(phase.zernike_sum(norm_grid, [2, 1], w, use_mask=False))
        assert p.shape == (2,) + norm_grid[0].shape
        single0 = np.asarray(phase.zernike(norm_grid, 2, use_mask=False))
        np.testing.assert_allclose(p[0], single0, atol=1e-5)

    def test_derivative_of_tilt_is_constant(self, norm_grid):
        d = np.asarray(
            phase.zernike_sum(
                norm_grid, [2], [1.0], derivative=(1, 0), use_mask=False
            )
        )
        assert np.allclose(d, d.flat[0], atol=1e-5)


class TestStructuredLightExtended:
    def test_lg_winding_sign(self, grid):
        p_pos = np.asarray(phase.laguerre_gaussian(grid, l=2, p=0))
        p_neg = np.asarray(phase.laguerre_gaussian(grid, l=-2, p=0))
        # Opposite azimuthal charge: phases negate (mod 2 pi).
        wrap = np.angle(np.exp(1j * (p_pos + p_neg)))
        assert np.abs(wrap).max() < 1e-3

    def test_lg_radial_rings(self, grid):
        p0 = np.asarray(phase.laguerre_gaussian(grid, l=0, p=0))
        p1 = np.asarray(phase.laguerre_gaussian(grid, l=0, p=1))
        # p=1 adds a pi ring: the two phase maps differ by exactly pi on
        # an annulus and 0 elsewhere.
        diff = np.angle(np.exp(1j * (p1 - p0)))
        vals = set(np.unique(np.round(np.abs(diff), 3)))
        assert vals.issubset({0.0, round(np.pi, 3)})
        # The pi ring must actually be present (a p-ignoring regression
        # would make the maps identical).
        assert round(np.pi, 3) in vals

    def test_hg_separable_sign_structure(self, grid):
        p = np.asarray(phase.hermite_gaussian(grid, n=1, m=0))
        # HG10: one sign flip across x -> phase steps of pi along x.
        diff = np.angle(np.exp(1j * (p[:, 1:] - p[:, :-1])))
        vals = set(np.unique(np.round(np.abs(diff), 3)))
        assert vals.issubset({0.0, round(np.pi, 3)})
        assert round(np.pi, 3) in vals  # The sign flip must exist.
