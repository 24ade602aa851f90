"""Unit tests for slmsuite_tpu.holography.analysis (mirrors reference test_analysis.py)."""

import warnings

import numpy as np
import pytest

from slmsuite_tpu.holography import analysis
from slmsuite_tpu.holography.analysis import fitfunctions as ff


@pytest.fixture()
def spot_image(rng):
    """A 120x160 image with three gaussian spots."""
    x, y = np.meshgrid(np.arange(160.0), np.arange(120.0))
    img = np.zeros((120, 160))
    spots = np.array([[40.0, 80.0, 120.0], [30.0, 60.0, 90.0]])
    for sx, sy in spots.T:
        img += ff.gaussian2d((x, y), sx, sy, 10.0, 0.0, 2.0, 2.0)
    return img, spots


class TestTake:
    def test_shapes(self, spot_image):
        img, spots = spot_image
        regions = analysis.take(img, spots, 9)
        assert regions.shape == (3, 9, 9)

    def test_integrate(self, spot_image):
        img, spots = spot_image
        sums = analysis.take(img, spots, 15, integrate=True)
        assert sums.shape == (3,)
        # Each gaussian integrates to ~2*pi*a*wx*wy.
        assert np.allclose(sums, 2 * np.pi * 10 * 4, rtol=0.05)

    def test_centered_peak(self, spot_image):
        img, spots = spot_image
        regions = analysis.take(img, spots, 9, centered=True)
        for region in regions:
            peak = np.unravel_index(np.argmax(region), region.shape)
            assert peak == (4, 4)

    def test_clip(self, spot_image):
        img, _ = spot_image
        region = analysis.take(img, np.array([[1], [1]]), 9, clip=True)
        assert np.any(np.isnan(region))
        with pytest.raises(IndexError):
            analysis.take(img, np.array([[500], [500]]), 3, clip=False)

    def test_stack(self, spot_image):
        img, spots = spot_image
        stack = np.stack([img, 2 * img, 3 * img])
        sums = analysis.take(stack, spots[:, :1], 15, integrate=True)
        assert sums.shape == (3,)
        assert np.allclose(sums / sums[0], [1, 2, 3])

    def test_return_mask(self, spot_image):
        img, spots = spot_image
        mask = analysis.take(img, spots, 9, return_mask=True)
        assert mask.dtype == bool and mask.sum() == 3 * 81

    def test_take_tile(self):
        images = np.arange(4 * 3 * 5).reshape(4, 3, 5).astype(float)
        tiled = analysis.take_tile(images)
        assert tiled.shape == (6, 10)
        assert np.allclose(tiled[:3, :5], images[0])
        assert np.allclose(tiled[3:, 5:], images[3])


class TestMoments:
    def test_centroid(self, spot_image):
        img, spots = spot_image
        regions = analysis.take(img, spots, 15)
        pos = analysis.image_positions(regions)
        # Spots centered in their regions -> positions ~0.
        assert np.allclose(pos, 0, atol=0.01)

    def test_variance_matches_width(self, spot_image):
        img, spots = spot_image
        regions = analysis.take(img, spots, 21)
        var = analysis.image_variances(regions)
        assert np.allclose(var[0], 4.0, rtol=0.05)  # wx^2
        assert np.allclose(var[1], 4.0, rtol=0.05)
        assert np.allclose(var[2], 0.0, atol=0.1)

    def test_normalize(self, spot_image):
        img, spots = spot_image
        regions = analysis.take(img, spots, 15)
        normalized = analysis.image_normalize(regions)
        assert np.allclose(np.sum(normalized, axis=(1, 2)), 1)

    def test_normalize_zero_image(self):
        assert np.allclose(analysis.image_normalize(np.zeros((5, 5))), 0)

    def test_ellipticity(self):
        x, y = np.meshgrid(np.arange(41.0) - 20, np.arange(41.0) - 20)
        circular = ff.gaussian2d((x, y), 0, 0, 1, 0, 3.0, 3.0)
        elliptic = ff.gaussian2d((x, y), 0, 0, 1, 0, 2.0, 6.0)
        var = analysis.image_variances(np.stack([circular, elliptic]))
        ellip = analysis.image_ellipticity(var)
        assert ellip[0] < 0.01
        assert ellip[1] > 0.5

    def test_strehl(self):
        img = np.zeros((10, 10))
        img[5, 5] = 1
        assert analysis.image_relative_strehl(img)[0] == 1.0

    def test_remove_field(self):
        img = np.full((20, 20), 10.0)
        img[10, 10] = 100.0
        out = analysis.image_remove_field(img, deviations=1)
        assert out[0, 0] == 0
        assert out[10, 10] > 0


class TestImageFit:
    def test_gaussian_fit(self, rng):
        x, y = np.meshgrid(np.arange(31.0) - 15, np.arange(31.0) - 15)
        truth = (2.0, -3.0, 5.0, 0.1, 3.0, 4.0)
        img = ff.gaussian2d((x, y), *truth) + 0.01 * rng.standard_normal(x.shape)
        res = analysis.image_fit(img)
        assert res.shape == (1, 2 * 7 + 1)
        assert res[0, 0] > 0.99  # r-squared
        assert np.allclose(res[0, 1:5], truth[:4], atol=0.2)

    def test_zernike_fit(self):
        from slmsuite_tpu.holography.toolbox.phase import zernike_sum

        n = 63
        x = np.linspace(-1, 1, n)[None, :] * np.ones((n, 1))
        y = np.linspace(-1, 1, n)[:, None] * np.ones((1, n))
        truth = np.zeros(15)
        truth[4] = 0.8
        truth[7] = -0.3
        img = zernike_sum((x, y), np.arange(15), truth, aperture=(1, 1))
        fit = analysis.image_zernike_fit(
            img, (x, y), order=4, leastsquares=False, aperture=(1, 1)
        )
        assert np.allclose(fit[[3, 6], 0], [0.8, -0.3], atol=0.05)


class TestVortices:
    def test_single_vortex(self):
        x, y = np.meshgrid(np.arange(64.0) - 32, np.arange(64.0) - 32)
        phase = np.mod(np.arctan2(y, x), 2 * np.pi)
        coords, weights = analysis.image_vortices_coordinates(phase)
        assert len(weights) == 1
        assert abs(coords[0][0] - 32) <= 1 and abs(coords[1][0] - 32) <= 1

    def test_remove_vortices(self):
        x, y = np.meshgrid(np.arange(64.0) - 32, np.arange(64.0) - 32)
        phase = np.arctan2(y, x)
        cleaned = analysis.image_remove_vortices(
            phase.copy(), mask=np.ones_like(phase, dtype=bool)
        )
        _, weights = analysis.image_vortices_coordinates(np.mod(cleaned, 2 * np.pi))
        assert len(weights) == 0

    def test_remove_blaze(self):
        x, y = np.meshgrid(np.arange(64.0), np.arange(64.0))
        phase = np.mod(0.3 * x + 0.1 * y, 2 * np.pi)
        cleaned = analysis.image_remove_blaze(phase)
        # Residual gradient should be near zero.
        dx = np.mod(np.gradient(cleaned, axis=1) + np.pi / 2, np.pi) - np.pi / 2
        assert abs(np.nanmean(dx)) < 0.02


class TestFitAffine:
    def test_exact(self, rng):
        M = np.array([[1.5, 0.2], [-0.1, 0.8]])
        b = np.array([[5.0], [-2.0]])
        x = rng.random((2, 30)) * 20
        y = M @ x + b
        fit = analysis.fit_affine(x, y)
        assert np.allclose(fit["M"], M, atol=1e-4)
        assert np.allclose(fit["b"], b, atol=1e-3)

    def test_nan_tolerant(self, rng):
        M = np.eye(2)
        b = np.zeros((2, 1))
        x = rng.random((2, 30)) * 20
        y = (M @ x + b).copy()
        y[:, 3] = np.nan
        fit = analysis.fit_affine(x, y)
        assert np.allclose(fit["M"], M, atol=1e-3)


class TestBlobDetect:
    def test_single_blob(self):
        img = np.zeros((64, 64))
        x, y = np.meshgrid(np.arange(64.0), np.arange(64.0))
        img += ff.gaussian2d((x, y), 40, 20, 250, 0, 3, 3)
        blobs, _ = analysis.blob_detect(img)
        assert len(blobs) >= 1
        pt = blobs[0].pt
        assert abs(pt[0] - 40) < 2 and abs(pt[1] - 20) < 2

    def test_array_detect(self, rng):
        M_true = np.array([[22.0, 3.0], [-3.0, 24.0]])
        b_true = np.array([[330.0], [260.0]])
        size = (10, 10)
        xg, yg = np.meshgrid(
            np.arange(-(size[0] - 1) / 2, (size[0] + 1) / 2),
            np.arange(-(size[1] - 1) / 2, (size[1] + 1) / 2),
        )
        centers = np.vstack((xg.ravel(), yg.ravel()))
        pos = M_true @ centers + b_true
        x, y = np.meshgrid(np.arange(640.0), np.arange(512.0))
        img = np.zeros((512, 640))
        for px, py in pos.T[:-2]:  # last two spots missing (parity convention)
            img += ff.gaussian2d((x, y), px, py, 100.0, 0, 1.5, 1.5)
        img = np.clip(img + 2 * rng.standard_normal(img.shape), 0, None)

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            fit = analysis.blob_array_detect(img, size)
        assert np.allclose(fit["M"], M_true, atol=0.5)
        assert np.allclose(fit["b"], b_true, atol=1.5)

    def test_all_zeros_raises(self):
        with pytest.raises(RuntimeError):
            analysis.blob_array_detect(np.zeros((256, 256)), (5, 5))


class TestOrientationTransformation:
    def test_identity(self):
        img = np.arange(6).reshape(2, 3)
        f = analysis.get_orientation_transformation()
        assert np.array_equal(f(img), img)

    def test_rot_flip(self):
        img = np.arange(6).reshape(2, 3)
        f = analysis.get_orientation_transformation(rot="90", fliplr=True)
        assert np.array_equal(f(img), np.fliplr(np.rot90(img)))


class TestFitfunctions:
    def test_shapes_and_values(self):
        assert ff.linear(2.0, 3.0, 1.0) == 7.0
        assert ff.parabola(3.0, 2.0, 1.0, 0.5) == 8.5
        assert np.isclose(ff.gaussian(0.0, 0.0, 2.0, 1.0, 1.0), 3.0)
        assert np.isclose(ff.lorentzian(0.0, 0.0, 2.0, 1.0, 1.0), 3.0)
        assert np.isclose(ff.hyperbola(0.0, 1.0, 0.0, 1.0), 1.0)

    def test_tophat(self):
        x, y = np.meshgrid(np.arange(21.0) - 10, np.arange(21.0) - 10)
        th = ff.tophat2d((x, y), 0, 0, 5.0, 2.0, 1.0)
        assert th[10, 10] == 3.0 and th[0, 0] == 1.0

    def test_sinc2d_peak(self):
        assert np.isclose(ff.sinc2d((0.0, 0.0), 0, 0, 5.0, a=2.0), 2.0)

    def test_exponential_jump(self):
        x = np.linspace(0, 10, 100)
        yy = ff.exponential_jump(x, 2.0, 1.0, 1.0, 0.5)
        assert np.allclose(yy[x < 2], 0.5)
        assert yy[-1] > 1.4
