"""
Extended file-helper coverage mirroring the reference's behavior matrix
(ref ``tests/holography/test_files.py``): _gray2rgb input forms,
colormaps, normalization, NaN transparency, borders, and save_image
round trips.
"""

import os

import numpy as np
import pytest

from slmsuite_tpu.misc.files import _gray2rgb, save_image


class TestGray2Rgb:
    def test_2d_reshaped_to_stack(self):
        out = _gray2rgb(np.full((10, 10), 100, np.uint8))
        assert out.ndim >= 3 and out.shape[0] == 1

    def test_rgb_rgba_passthrough(self):
        for ch in (3, 4):
            img = np.full((2, 10, 10, ch), 100, np.uint8)
            np.testing.assert_array_equal(_gray2rgb(img), img)

    def test_bad_rank_raises(self):
        with pytest.raises(RuntimeError):
            _gray2rgb(np.ones((2, 3, 10, 10, 1), np.uint8))

    def test_grayscale_mode(self):
        out = _gray2rgb(np.full((1, 10, 10), 128, np.uint8), cmap=False)
        assert out.dtype == np.uint8

    @pytest.mark.parametrize("cmap", [True, "default", "viridis"])
    def test_colormapped_rgba(self, cmap):
        img = np.array([[[0, 50], [100, 200]]], np.uint8)
        out = _gray2rgb(img, cmap=cmap)
        assert out.shape[-1] == 4 and out.dtype == np.uint8

    def test_grayscale_string(self):
        img = np.array([[[0, 50], [100, 200]]], np.uint8)
        assert _gray2rgb(img, cmap="grayscale").dtype == np.uint8

    def test_float_normalize_modes(self):
        rng = np.random.default_rng(0)
        img = rng.random((1, 10, 10))
        assert _gray2rgb(img, cmap="viridis", normalize=True).dtype == np.uint8
        assert _gray2rgb(img * 0.5, cmap="viridis", normalize=False).dtype == np.uint8

    def test_nan_is_transparent(self):
        img = np.full((1, 10, 10), 0.5)
        img[0, 3, 3] = np.nan
        out = _gray2rgb(img, cmap="viridis")
        assert out[0, 3, 3, 3] == 0

    def test_border_scalar_and_list(self):
        img = np.full((1, 10, 10), 100, np.uint8)
        out = _gray2rgb(img, cmap="viridis", border=255)
        assert out[0, 0, 0, 0] == 255
        assert out[0, -1, 0, 0] == 255
        out2 = _gray2rgb(img, cmap="viridis", border=[255, 128])
        assert out2[0, 0, 0, 0] == 255 and out2[0, 0, 0, 1] == 128

    def test_listed_colormap_object(self):
        import matplotlib.pyplot as plt

        cm = plt.get_cmap("viridis", 64)
        img = np.array([[[0, 10], [20, 63]]], np.uint8)
        assert _gray2rgb(img, cmap=cm, lut=64).shape[-1] == 4


class TestSaveImage:
    def test_png_round_trip(self, tmp_path):
        import matplotlib.image as mpimg

        img = (np.arange(64).reshape(8, 8) * 4).astype(np.uint8)
        path = os.path.join(str(tmp_path), "img.png")
        save_image(path, img)
        assert os.path.exists(path)
        back = mpimg.imread(path)
        assert back.shape[0] == 8 and back.shape[1] == 8

    def test_colormapped_save(self, tmp_path):
        img = (np.arange(64).reshape(8, 8) * 4).astype(np.uint8)
        path = os.path.join(str(tmp_path), "img_cmap.png")
        save_image(path, img, cmap="viridis")
        assert os.path.getsize(path) > 0
