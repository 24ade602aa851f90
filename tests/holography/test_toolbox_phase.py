"""Unit tests for slmsuite_tpu.holography.toolbox.phase (mirrors reference test_toolbox_phase.py)."""

import numpy as np
import pytest

from slmsuite_tpu.holography.toolbox import phase as tphase


@pytest.fixture()
def grid():
    x = np.linspace(-1, 1, 64)[None, :] * np.ones((48, 1))
    y = np.linspace(-0.75, 0.75, 48)[:, None] * np.ones((1, 64))
    return (x, y)


class TestGratings:
    def test_blaze_zero(self, grid):
        assert np.allclose(tphase.blaze(grid, (0, 0)), 0)

    def test_blaze_linear(self, grid):
        out = tphase.blaze(grid, (0.5, 0))
        assert np.allclose(out, 2 * np.pi * 0.5 * grid[0])

    def test_blaze_focus_term(self, grid):
        out = tphase.blaze(grid, (0, 0, 2.0))
        assert np.allclose(out, 2 * np.pi * (np.square(grid[0]) + np.square(grid[1])))

    def test_sinusoid_range(self, grid):
        out = tphase.sinusoid(grid, (0.3, 0.1), a=np.pi, b=0)
        assert out.min() >= 0 and out.max() <= np.pi

    def test_binary_values(self, grid):
        out = tphase.binary(grid, (0.25, 0), a=np.pi, b=0)
        assert set(np.unique(out)).issubset({0.0, np.pi})

    def test_binary_duty_cycle(self, grid):
        out = tphase.binary(grid, (8, 0), duty_cycle=0.25)
        frac = np.mean(out == np.pi)
        assert abs(frac - 0.25) < 0.05

    def test_binary_pixel_period(self, grid):
        out = tphase.binary(grid, (8, 0))
        # Period-8 grating along x.
        assert np.allclose(out[:, 0], out[:, 8])

    def test_bahtinov_and_quadrants(self, grid):
        assert tphase.bahtinov(grid).shape == grid[0].shape
        assert tphase.quadrants(grid).shape == grid[0].shape


class TestLenses:
    def test_lens_isotropic(self, grid):
        out = tphase.lens(grid, 50.0)
        expected = (np.pi / 50) * (np.square(grid[0]) + np.square(grid[1]))
        assert np.allclose(out, expected)

    def test_lens_infinite(self, grid):
        assert np.allclose(tphase.lens(grid, np.inf), 0)

    def test_lens_zero_raises(self, grid):
        with pytest.raises(ValueError):
            tphase.lens(grid, 0)

    def test_axicon(self, grid):
        out = tphase.axicon(grid, 50.0, w=0.3)
        assert np.all(out >= 0)


class TestZernikeIndexing:
    def test_order_number(self):
        assert tphase.zernike_order_number(0) == 1
        assert tphase.zernike_order_number(2) == 6
        assert tphase.zernike_order_number(6) == 28

    def test_ansi_radial_roundtrip(self):
        indices = np.arange(28)
        radial = tphase.zernike_convert_index(indices, "ansi", "radial")
        back = tphase.zernike_convert_index(radial, "radial", "ansi")
        assert np.array_equal(np.squeeze(back), indices)

    def test_known_noll(self):
        # Matches reference behavior (slmsuite phase.py:770-773).
        noll = tphase.zernike_convert_index(np.arange(6), "ansi", "noll")
        assert np.array_equal(np.squeeze(noll), [1, 2, 3, 6, 4, 5])

    def test_invalid(self):
        with pytest.raises(ValueError):
            tphase.zernike_convert_index([[1, 2]], "radial", "ansi")  # n+l odd
        with pytest.raises(ValueError):
            tphase.zernike_convert_index(0, "ansi", "bogus")


class TestCantor:
    def test_pairing_roundtrip(self):
        xy = np.array([[0, 0], [1, 0], [0, 1], [3, 2], [5, 7]])
        z = tphase._cantor_pairing(xy)
        back = tphase._inverse_cantor_pairing(z)
        assert np.array_equal(back, xy)

    def test_pairing_unique(self):
        xy = np.array([[a, b] for a in range(8) for b in range(8)])
        z = tphase._cantor_pairing(xy)
        assert len(np.unique(z)) == len(z)

    def test_negative_special(self):
        back = tphase._inverse_cantor_pairing(np.array([-3]))
        assert np.array_equal(back, [[-3, 0]])


class TestZernikeCoefficients:
    def test_piston(self):
        assert tphase._zernike_coefficients(0) == {(0, 0): 1}

    def test_tilts(self):
        assert tphase._zernike_coefficients(1) == {(0, 1): 1}
        assert tphase._zernike_coefficients(2) == {(1, 0): 1}

    def test_defocus(self):
        # Z4 = 2x^2 + 2y^2 - 1
        assert tphase._zernike_coefficients(4) == {(0, 0): -1, (2, 0): 2, (0, 2): 2}

    def test_string(self):
        assert tphase.zernike_get_string(2) == "1x"
        s = tphase.zernike_get_string(4)
        assert "2x^2" in s and "2y^2" in s and "1" in s


class TestZernikeSum:
    def test_tilt_is_linear(self, grid):
        out = tphase.zernike(grid, 2, weight=1, aperture=(1, 1), use_mask=False)
        assert np.allclose(out, grid[0])

    def test_defocus(self, grid):
        out = tphase.zernike(grid, 4, weight=1, aperture=(1, 1), use_mask=False)
        expected = 2 * np.square(grid[0]) + 2 * np.square(grid[1]) - 1
        assert np.allclose(out, expected)

    def test_mask(self, grid):
        out = tphase.zernike(grid, 4, aperture="circular")
        rr = np.square(grid[0] / np.nanmax(np.abs(grid[1]))) + np.square(
            grid[1] / np.nanmax(np.abs(grid[1]))
        )
        assert np.all(out[rr > 1.01] == 0)

    def test_mask_return(self, grid):
        mask = tphase.zernike_sum(grid, (4,), (1.0,), use_mask="return")
        assert mask.dtype == bool and mask.shape == grid[0].shape

    def test_stack(self, grid):
        W = np.array([[1.0, 0.5], [0.0, 1.0]])
        out = tphase.zernike_sum(grid, (2, 1), W, aperture=(1, 1), use_mask=False)
        assert out.shape == (2,) + grid[0].shape
        assert np.allclose(out[0], grid[0])
        assert np.allclose(out[1], 0.5 * grid[0] + grid[1])

    def test_derivative(self, grid):
        # d/dx of Z4 (2x^2+2y^2-1) = 4x.
        out = tphase.zernike(grid, 4, aperture=(1, 1), use_mask=False, derivative=(1, 0))
        assert np.allclose(out, 4 * grid[0])

    def test_orthogonality(self):
        # Zernike polynomials should be orthogonal over the unit disk.
        n = 127
        x = np.linspace(-1, 1, n)[None, :] * np.ones((n, 1))
        y = np.linspace(-1, 1, n)[:, None] * np.ones((1, n))
        mask = x**2 + y**2 <= 1
        for i, j in [(1, 2), (3, 4), (4, 5), (2, 7)]:
            zi = tphase.zernike((x, y), i, aperture=(1, 1))
            zj = tphase.zernike((x, y), j, aperture=(1, 1))
            overlap = np.sum(zi[mask] * zj[mask]) / np.sum(mask)
            assert abs(overlap) < 0.01, (i, j, overlap)


class TestPolynomial:
    def test_simple(self, grid):
        # 3 + 2x + y^2 : cantor terms (0,0)=0, (1,0)=1, (0,2)=5
        out = tphase.polynomial(grid, weights=[3.0, 2.0, 1.0], terms=np.array([[0, 0], [1, 0], [0, 2]]))
        expected = 3 + 2 * grid[0] + np.square(grid[1])
        assert np.allclose(np.squeeze(out), expected)

    def test_term_pathing_is_permutation(self):
        terms = np.array([[0, 0], [1, 0], [2, 0], [0, 1], [1, 1], [0, 2]])
        path = tphase._term_pathing(terms)
        assert sorted(path) == list(range(len(terms)))

    def test_pathing_matches_direct(self, grid):
        terms = np.array([[0, 0], [1, 0], [2, 0], [3, 1], [1, 1], [0, 2], [2, 2]])
        w = np.arange(1.0, 8.0)
        auto = tphase.polynomial(grid, w, terms)
        direct = tphase.polynomial(grid, w, terms, pathing=False)
        assert np.allclose(auto, direct)


class TestBasisMap:
    def test_shapes(self):
        c_md, i_md, pxy_m = tphase._zernike_populate_basis_map(np.array([1, 2, 4]))
        M, D = c_md.shape
        assert D == 3
        assert i_md.shape == (M, D)
        assert pxy_m.shape == (2, M)

    def test_reconstruction(self, grid):
        # Summing c_md monomials should reproduce each zernike term.
        indices = np.array([1, 2, 4, 3, 5])
        c_md, i_md, pxy_m = tphase._zernike_populate_basis_map(indices)
        x, y = grid
        M = c_md.shape[0]
        mono = np.stack([x ** pxy_m[0, m] * y ** pxy_m[1, m] for m in range(M)])
        for d, index in enumerate(indices):
            rebuilt = np.tensordot(c_md[:, d], mono, axes=1)
            expected = tphase.zernike(grid, index, aperture=(1, 1), use_mask=False)
            assert np.allclose(rebuilt, expected, atol=1e-6), index


class TestStructuredLight:
    def test_laguerre_gaussian_vortex(self, grid):
        out = tphase.laguerre_gaussian(grid, l=2, p=0)
        assert np.allclose(out, 2 * np.arctan2(grid[0], grid[1]))

    def test_laguerre_gaussian_radial(self, grid):
        out = tphase.laguerre_gaussian(grid, l=0, p=2, w=0.5)
        assert set(np.unique(out)).issubset({0.0, np.pi})

    def test_hermite_gaussian(self, grid):
        out = tphase.hermite_gaussian(grid, 1, 1, w=0.5)
        assert set(np.unique(out)).issubset({0.0, np.pi})

    def test_not_implemented(self, grid):
        with pytest.raises(NotImplementedError):
            tphase.ince_gaussian(grid, 2, 1)
        with pytest.raises(NotImplementedError):
            tphase.matheui_gaussian(grid, 1, 1)
        with pytest.raises(NotImplementedError):
            tphase.airy(grid)
