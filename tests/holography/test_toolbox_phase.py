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

    # The reference leaves ince_gaussian/matheui_gaussian/airy as
    # NotImplemented stubs (ref phase.py:1938-2030); these test the
    # real implementations added beyond the reference.

    def test_ince_coefficients_trig_limit(self):
        # eps -> 0: the Ince equation reduces to Theta'' + a Theta = 0,
        # so C_p^m -> cos(m eta) exactly (one Fourier coefficient).
        ks, A = tphase._ince_coefficients(6, 4, 1, 1e-10)
        idx = list(ks).index(4)
        assert abs(A[idx] - 1 / np.sqrt(np.pi)) < 1e-6
        assert np.all(np.abs(np.delete(A, idx)) < 1e-6)
        ks, B = tphase._ince_coefficients(5, 3, -1, 1e-10)
        idx = list(ks).index(3)
        assert abs(B[idx] - 1 / np.sqrt(np.pi)) < 1e-6

    @pytest.mark.parametrize("p,m,parity", [(4, 2, 1), (5, 3, 1),
                                            (4, 2, -1), (5, 3, -1),
                                            (6, 0, 1), (7, 7, -1)])
    def test_ince_polynomial_solves_ince_equation(self, p, m, parity):
        # Residual check against the Ince ODE itself:
        #   Theta'' + eps sin(2 eta) Theta' + (a - p eps cos(2 eta)) Theta = 0
        # with `a` recovered by L2 projection (it is the eigenvalue).
        eps = 2.0
        ks, coeffs = tphase._ince_coefficients(p, m, parity, eps)
        eta = np.linspace(0, 2 * np.pi, 720, endpoint=False)
        trig, dtrig = (np.cos, lambda k, e: -k * np.sin(k * e)) \
            if parity == 1 else (np.sin, lambda k, e: k * np.cos(k * e))
        theta = sum(c * trig(k * eta) for c, k in zip(coeffs, ks))
        dtheta = sum(c * dtrig(k, eta) for c, k in zip(coeffs, ks))
        ddtheta = sum(-c * k * k * trig(k * eta) for c, k in zip(coeffs, ks))
        lhs = ddtheta + eps * np.sin(2 * eta) * dtheta \
            - p * eps * np.cos(2 * eta) * theta
        a = -np.dot(lhs, theta) / np.dot(theta, theta)
        residual = lhs + a * theta
        assert np.max(np.abs(residual)) < 1e-9 * max(1.0, np.max(np.abs(theta)))

    def test_ince_gaussian_binary(self, grid):
        for parity in (1, -1):
            out = tphase.ince_gaussian(grid, 4, 2, parity=parity, w=0.5)
            assert set(np.unique(out)).issubset({0.0, np.pi})
            assert out.shape == grid[0].shape

    @pytest.mark.parametrize("p,m", [(4, 2), (3, 1), (5, 3), (4, 4)])
    def test_ince_gaussian_helical_vortex_charge(self, p, m):
        # A helical IG mode carries m unit vortices along the
        # interfocal segment (doi:10.1364/OL.29.000144): the phase winds
        # by 2 pi m around a circle enclosing the foci (f0 ~ 0.354 for
        # w = 0.5, ellipticity 1).
        t = np.linspace(0, 2 * np.pi, 2000, endpoint=False)
        r = 0.45
        pts = (r * np.cos(t)[None, :], r * np.sin(t)[None, :])
        ph = tphase.ince_gaussian(pts, p, m, parity=0, w=0.5)[0]
        winding = np.sum(np.angle(np.exp(1j * np.diff(
            np.concatenate([ph, ph[:1]])
        )))) / (2 * np.pi)
        assert abs(abs(winding) - m) < 1e-6

    def test_ince_gaussian_invalid(self, grid):
        with pytest.raises(ValueError):
            tphase.ince_gaussian(grid, 4, 5)          # m > p
        with pytest.raises(ValueError):
            tphase.ince_gaussian(grid, 4, 0, parity=-1)  # odd needs m >= 1
        with pytest.raises(ValueError):
            tphase.ince_gaussian(grid, 4, 1)          # p - m odd
        with pytest.raises(ValueError):
            tphase.ince_gaussian(grid, 4, 0, parity=0)   # helical m = 0

    def test_matheui_gaussian_binary_and_symmetry(self, grid):
        out = tphase.matheui_gaussian(grid, 2, 4.0, w=0.5)
        assert set(np.unique(out)).issubset({0.0, np.pi})
        # ce_r is even in eta and arccosh maps y -> -y to eta -> -eta,
        # so the even Mathieu-Gauss mask is symmetric about the x-axis.
        assert np.allclose(out, out[::-1, :])

    def test_matheui_gaussian_invalid(self, grid):
        with pytest.raises(ValueError):
            tphase.matheui_gaussian(grid, 1, 0.0)

    def test_airy_cubic(self, grid):
        w = 0.5
        out = tphase.airy(grid, f=(2.0, np.inf), w=w)
        expected = np.power(np.pi * w / 2.0 * grid[0], 3) / 3
        assert np.allclose(out, expected)
        assert np.allclose(tphase.airy(grid), 0)

    def test_airy_farfield_peak(self):
        # The farfield of the cubic mask is Ai(k/s): its main intensity
        # lobe peaks near k = -1.0188 s (first max of Ai at -1.0188).
        n, s = 4096, 8.0
        x = np.linspace(-0.5, 0.5, n, endpoint=False)
        phase_1d = np.power(2 * np.pi * s * x, 3) / 3
        # Gaussian source apodization (the finite-energy Airy beam of
        # the Siviloglou paper): a hard aperture's edge ripple would
        # otherwise beat the main lobe.
        apod = np.exp(-np.square(x / 0.18))
        far = np.fft.fftshift(np.fft.fft(apod * np.exp(1j * phase_1d)))
        k = np.fft.fftshift(np.fft.fftfreq(n))  # cycles/sample
        k_peak = (k * n)[np.argmax(np.abs(far))]  # x spans 1 => k in units
        # exp(i t^3/3) e^{-2 pi i x k} = exp(i(t^3/3 + nu t)), nu = -k/s:
        # the Ai(nu) peak at nu = -1.0188 lands at k = +1.0188 s under
        # numpy's forward-FFT sign convention.
        assert abs(k_peak / s - 1.0188) < 0.15
