"""Unit tests for slmsuite_tpu.holography.toolbox (mirrors reference test_toolbox.py)."""

import numpy as np
import pytest

from slmsuite_tpu.holography import toolbox
from slmsuite_tpu.holography.toolbox import phase as tphase


@pytest.fixture()
def grid():
    x = np.linspace(-1, 1, 64)[None, :] * np.ones((48, 1))
    y = np.linspace(-0.75, 0.75, 48)[:, None] * np.ones((1, 64))
    return (x, y)


class TestFormatVectors:
    def test_tuple(self):
        out = toolbox.format_2vectors((1, 2))
        assert out.shape == (2, 1)
        assert np.array_equal(out, [[1], [2]])

    def test_row_vector(self):
        out = toolbox.format_2vectors(np.array([[1, 2]]))
        assert out.shape == (2, 1)

    def test_array(self):
        out = toolbox.format_2vectors(np.zeros((2, 7)))
        assert out.shape == (2, 7)

    def test_crop(self):
        out = toolbox.format_2vectors(np.zeros((3, 7)))
        assert out.shape == (2, 7)

    def test_pass_3d(self):
        out = toolbox.format_vectors(np.zeros((3, 7)), 2, "pass")
        assert out.shape == (3, 7)

    def test_error(self):
        with pytest.raises(ValueError):
            toolbox.format_vectors(np.zeros((3, 7)), 2, "error")
        with pytest.raises(ValueError):
            toolbox.format_vectors(np.zeros((2, 3, 4)), 2)


class TestConvertVector:
    def test_identity(self):
        v = np.array([[0.01], [0.02]])
        assert np.allclose(toolbox.convert_vector(v, "norm", "kxy"), v)

    def test_angle_units(self):
        v = np.array([[0.01], [0.02]])
        mrad = toolbox.convert_vector(v, "norm", "mrad")
        assert np.allclose(mrad, v * 1e3)
        deg = toolbox.convert_vector(v, "norm", "deg")
        assert np.allclose(deg, v * 180 / np.pi)
        # Round trips.
        assert np.allclose(toolbox.convert_vector(mrad, "mrad", "norm"), v)
        assert np.allclose(toolbox.convert_vector(deg, "deg", "norm"), v)

    def test_device_units_need_hardware(self):
        v = (0.01, 0.02)
        with pytest.warns(UserWarning):
            out = toolbox.convert_vector(v, "norm", "knm")
        assert np.all(np.isnan(out))

    def test_invalid_unit(self):
        with pytest.raises(ValueError):
            toolbox.convert_vector((0, 0), "norm", "bogus")

    def test_3d_focal_power_passthrough(self):
        v = np.array([[0.01], [0.02], [0.5]])
        out = toolbox.convert_vector(v, "norm", "mrad")
        assert out.shape == (3, 1)
        assert np.isclose(out[2, 0], 0.5)  # z unchanged between non-special units


class TestWindows:
    def test_window_slice_rect(self):
        sl = toolbox.window_slice([3, 5, 2, 4])
        assert sl == (slice(2, 6), slice(3, 8))

    def test_window_slice_centered(self):
        sl = toolbox.window_slice([10, 6, 8, 6], centered=True)
        assert sl == (slice(6, 12), slice(8, 14))

    def test_window_slice_clip(self):
        sl = toolbox.window_slice([18, 10, 18, 10], shape=(20, 20))
        assert sl == (slice(18, 19), slice(18, 19))

    def test_window_slice_circular(self):
        ys, xs = toolbox.window_slice([6, 5, 6, 5], shape=(20, 20), circular=True)
        # All points within the inscribed ellipse.
        assert len(ys) == len(xs) > 0
        assert ys.max() < 11 and xs.max() < 11

    def test_window_slice_index_arrays(self):
        ys, xs = toolbox.window_slice((np.array([1, 2]), np.array([3, 4])))
        assert np.array_equal(ys, [1, 2]) and np.array_equal(xs, [3, 4])

    def test_window_extent(self):
        mask = np.zeros((20, 30), dtype=bool)
        mask[5:10, 7:15] = True
        x, w, y, h = toolbox.window_extent(mask)
        assert (x, w, y, h) == (7, 8, 5, 5)

    def test_voronoi_windows(self):
        windows = toolbox.voronoi_windows(
            (30, 30), np.array([[10.0, 20.0], [10.0, 20.0]])
        )
        assert len(windows) == 2
        total = np.zeros((30, 30), dtype=int)
        for win in windows:
            assert win.shape == (30, 30)
            total += win.astype(int)
        assert total.max() <= 1  # disjoint


class TestImprint:
    def test_replace_and_add(self, grid):
        canvas = np.zeros((48, 64))
        toolbox.imprint(canvas, [8, 16, 8, 16], tphase.blaze, grid=grid, vector=(0.1, 0))
        window = canvas[8:24, 8:32]
        assert np.any(window)
        assert not np.any(canvas[:8, :])
        before = window.copy()
        toolbox.imprint(
            canvas, [8, 16, 8, 16], tphase.blaze, grid=grid,
            imprint_operation="add", vector=(0.1, 0),
        )
        assert np.allclose(canvas[8:24, 8:32], 2 * before)

    def test_constant(self):
        canvas = np.zeros((10, 10))
        toolbox.imprint(canvas, [0, 5, 0, 5], 2.5)
        assert np.allclose(canvas[0:5, 0:5], 2.5)

    def test_bad_operation(self, grid):
        with pytest.raises(ValueError):
            toolbox.imprint(np.zeros((48, 64)), [0, 5, 0, 5], 1.0, imprint_operation="bogus")


class TestFit3pt:
    def test_affine_dict(self):
        result = toolbox.fit_3pt((1.0, 1.0), (2.0, 2.0), (1.0, 2.0), N=None)
        assert np.allclose(result["M"], [[1, 0], [1, 1]])
        assert np.allclose(result["b"], [[1], [1]])

    def test_grid(self):
        result = toolbox.fit_3pt((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), N=(3, 3))
        assert result.shape == (2, 9)
        assert np.allclose(result[:, 0], [0, 0])
        assert np.allclose(result[:, -1], [2, 2])

    def test_basis_vectors(self):
        a = toolbox.fit_3pt((1.0, 1.0), (2.0, 1.0), (1.0, 2.0), N=(2, 2))
        b = toolbox.fit_3pt((1.0, 1.0), (1.0, 0.0), (0.0, 1.0), N=(2, 2), x1=None, x2=None)
        assert np.allclose(a, b)

    def test_colinear(self):
        with pytest.raises(ValueError):
            toolbox.fit_3pt((0.0, 0.0), (1.0, 1.0), (2.0, 2.0), x1=(1, 1), x2=(2, 2))


class TestSmallestDistance:
    def test_simple(self):
        v = np.array([[0, 3, 10], [0, 0, 0]])
        assert toolbox.smallest_distance(v, "euclidean") == 3

    def test_single_point(self):
        assert toolbox.smallest_distance(np.array([[1], [1]])) == np.inf

    def test_large_matches_brute(self, rng):
        v = rng.uniform(0, 1000, (2, 600))
        fast = toolbox.smallest_distance(v, "euclidean")
        brute = np.inf
        from scipy.spatial.distance import pdist

        brute = pdist(v.T).min()
        assert np.isclose(fast, brute)


class TestLloyds:
    def test_lloyds_algorithm_moves_to_uniform(self):
        vectors = np.array([[5.0, 6.0, 25.0], [5.0, 6.0, 25.0]])
        result = toolbox.lloyds_algorithm((30, 30), vectors, iterations=5)
        assert result.shape == (2, 3)
        assert toolbox.smallest_distance(result, "euclidean") > toolbox.smallest_distance(
            vectors, "euclidean"
        )

    def test_lloyds_points(self):
        result = toolbox.lloyds_points((40, 40), 5, iterations=3)
        assert result.shape == (2, 5)


class TestAssignVectors:
    def test_assign(self):
        options = np.array([[0, 10], [0, 0]])
        vectors = np.array([[1, 9, 2], [0, 1, 0]])
        idx = toolbox.assign_vectors(vectors, options)
        assert np.array_equal(idx, [0, 1, 0])


class TestShapePad:
    def test_format_shape(self):
        assert toolbox.format_shape((4, 5)) == (4, 5)
        with pytest.raises(ValueError):
            toolbox.format_shape((4, -1))
        with pytest.raises(ValueError):
            toolbox.format_shape((4.5, 2))

    def test_pad_unpad_roundtrip(self, rng):
        m = rng.random((10, 13))
        padded = toolbox.pad(m, (16, 17))
        assert padded.shape == (16, 17)
        assert np.allclose(toolbox.unpad(padded, (10, 13)), m)

    def test_pad_too_small(self):
        with pytest.raises(ValueError):
            toolbox.pad(np.zeros((10, 10)), (5, 20))

    def test_unpad_indices(self):
        args = toolbox.unpad((16, 16), (10, 12))
        assert args == (3, 13, 2, 14)


class TestTransformGrid:
    def test_shift(self, grid):
        tx, ty = toolbox.transform_grid(grid, shift=(0.1, -0.2))
        assert np.allclose(tx, grid[0] + 0.1)
        assert np.allclose(ty, grid[1] - 0.2)

    def test_rotation_roundtrip(self, grid):
        fwd = toolbox.transform_grid(grid, transform=0.3)
        back = toolbox.transform_grid(fwd, transform=0.3, direction="rev")
        assert np.allclose(back[0], grid[0], atol=1e-12)
        assert np.allclose(back[1], grid[1], atol=1e-12)

    def test_center(self, grid):
        tx, ty = toolbox.transform_grid((grid[0] + 5, grid[1] + 3), shift=True)
        assert abs(np.mean(tx)) < 1e-9 and abs(np.mean(ty)) < 1e-9
