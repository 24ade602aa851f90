"""
Extended toolbox coverage mirroring the reference's behavior matrix
(ref ``tests/holography/test_toolbox.py``): fit_3pt affine semantics,
smallest_distance metrics/edge cases, pad/unpad identities, and
format_shape handling.
"""

import numpy as np
import pytest

from slmsuite_tpu.holography import toolbox


class TestFit3pt:
    def test_identity_affine_dict(self):
        d = toolbox.fit_3pt((0, 0), (1, 0), (0, 1), N=None)
        np.testing.assert_allclose(d["M"], np.eye(2), atol=1e-12)
        np.testing.assert_allclose(np.ravel(d["b"]), [0, 0], atol=1e-12)

    def test_translation(self):
        d = toolbox.fit_3pt((10, 20), (11, 20), (10, 21), N=None)
        np.testing.assert_allclose(d["M"], np.eye(2), atol=1e-12)
        np.testing.assert_allclose(np.ravel(d["b"]), [10, 20], atol=1e-12)

    def test_scaling(self):
        d = toolbox.fit_3pt((0, 0), (2, 0), (0, 2), N=None)
        np.testing.assert_allclose(d["M"], 2 * np.eye(2), atol=1e-12)

    def test_rotation_90(self):
        d = toolbox.fit_3pt((0, 0), (0, 1), (-1, 0), N=None)
        np.testing.assert_allclose(
            d["M"], np.array([[0.0, -1.0], [1.0, 0.0]]), atol=1e-12
        )

    def test_scalar_n_makes_square_grid(self):
        result = toolbox.fit_3pt((0, 0), (1, 0), (0, 1), N=4)
        assert np.asarray(result).shape == (2, 16)

    def test_custom_source_points(self):
        d = toolbox.fit_3pt(
            (0, 0), (4, 0), (0, 6), N=None, x0=(0, 0), x1=(2, 0), x2=(0, 3)
        )
        np.testing.assert_allclose(d["M"], 2 * np.eye(2), atol=1e-12)

    def test_ndarray_n_evaluates_points(self):
        pts = np.array([[0, 1, 2], [0, 0, 0]])
        result = np.asarray(toolbox.fit_3pt((5, 10), (6, 10), (5, 11), N=pts))
        assert result.shape == (2, 3)
        np.testing.assert_allclose(result[:, 0], [5, 10], atol=1e-12)
        np.testing.assert_allclose(result[:, 1], [6, 10], atol=1e-12)

    def test_roundtrip_three_points(self):
        d = toolbox.fit_3pt((3, 7), (5, 8), (4, 10), N=None)
        M, b = np.asarray(d["M"]), np.asarray(d["b"]).reshape(2, 1)
        np.testing.assert_allclose(M @ [[0], [0]] + b, [[3], [7]], atol=1e-12)
        np.testing.assert_allclose(M @ [[1], [0]] + b, [[5], [8]], atol=1e-12)
        np.testing.assert_allclose(M @ [[0], [1]] + b, [[4], [10]], atol=1e-12)


class TestSmallestDistance:
    def test_single_and_empty_are_inf(self):
        assert toolbox.smallest_distance(np.array([[5.0], [3.0]])) == np.inf
        assert toolbox.smallest_distance(np.empty((2, 0))) == np.inf

    def test_chebyshev_two_points(self):
        vecs = np.array([[0.0, 3.0], [0.0, 4.0]])
        assert toolbox.smallest_distance(vecs) == pytest.approx(4.0)

    def test_minimum_among_many(self):
        vecs = np.array([[0.0, 10, 11, 50], [0.0, 10, 11, 50]])
        assert toolbox.smallest_distance(vecs) == pytest.approx(1.0)

    def test_duplicates_give_zero(self):
        vecs = np.array([[1.0, 2, 1], [3.0, 4, 3]])
        assert toolbox.smallest_distance(vecs) == pytest.approx(0.0)

    def test_negative_coordinates(self):
        vecs = np.array([[-5.0, -3.0], [10.0, 10.0]])
        assert toolbox.smallest_distance(vecs) == pytest.approx(2.0)

    def test_metrics_disagree_consistently(self):
        vecs = np.array([[0.0, 3.0], [0.0, 4.0]])
        assert toolbox.smallest_distance(vecs, "chebyshev") == pytest.approx(4.0)
        assert toolbox.smallest_distance(vecs, "euclidean") == pytest.approx(5.0)


class TestPadUnpad:
    def test_pad_centers(self):
        m = np.ones((4, 6))
        p = toolbox.pad(m, (8, 10))
        assert p.shape == (8, 10)
        assert p.sum() == pytest.approx(m.sum())
        np.testing.assert_array_equal(p[2:6, 2:8], m)

    def test_unpad_inverts_pad(self):
        m = np.arange(24, dtype=float).reshape(4, 6)
        p = toolbox.pad(m, (9, 11))
        np.testing.assert_array_equal(toolbox.unpad(p, (4, 6)), m)

    def test_unpad_shape_args(self):
        y0, y1, x0, x1 = toolbox.unpad((16, 16), (8, 8))
        assert (y1 - y0, x1 - x0) == (8, 8)
        assert y0 == 4 and x0 == 4

    def test_pad_too_small_raises(self):
        with pytest.raises(ValueError):
            toolbox.pad(np.ones((8, 8)), (4, 4))

    def test_unpad_too_large_raises(self):
        with pytest.raises(ValueError):
            toolbox.unpad(np.ones((4, 4)), (8, 8))


class TestFormatShape:
    def test_pair_forms(self):
        for inp in ((10, 20), [10, 20], np.array([10, 20])):
            assert toolbox.format_shape(inp) == (10, 20)

    def test_any_dimension(self):
        assert toolbox.format_shape((2, 3, 4), expected_dimension=None) == (2, 3, 4)

    def test_wrong_dimension_raises(self):
        with pytest.raises(ValueError, match="dimensions"):
            toolbox.format_shape((1, 2, 3), expected_dimension=2)

    def test_nonpositive_raises(self):
        for bad in ((0, 5), (5, -1)):
            with pytest.raises(ValueError, match="positive integer"):
                toolbox.format_shape(bad)

    def test_float_raises(self):
        with pytest.raises(ValueError, match="positive integer"):
            toolbox.format_shape((1.5, 2.5))
