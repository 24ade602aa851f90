"""
Headless tests of the Jupyter camera viewer: the pure frame-rendering
pipeline (:func:`parse_frame`) and the widget shell's state logic
(ipywidgets construct fine outside a notebook; ``display`` is a no-op).
"""

import numpy as np
import pytest

from slmsuite_tpu.hardware.cameras._viewer import _CameraViewer, parse_frame

PNG_MAGIC = b"\x89PNG"


def _gradient(shape=(32, 48), peak=1000):
    img = np.linspace(0, peak, shape[0] * shape[1]).reshape(shape)
    return img


class TestParseFrame:
    def test_basic_png(self):
        png, rgb = parse_frame(_gradient(), {"range": (0, 1000)})
        assert png.startswith(PNG_MAGIC)
        assert rgb.shape == (32, 48, 3)
        # Gray colormap: dark at the low end, bright at the high end.
        assert rgb[0, 0, 0] < 10 and rgb[-1, -1, 0] > 245

    def test_range_clip(self):
        _, rgb = parse_frame(_gradient(), {"range": (500, 1000)})
        # Everything below 500 clips to black.
        assert np.all(rgb[0, :, :] == 0)

    def test_log_scaling(self):
        _, linear = parse_frame(_gradient(), {"range": (0, 1000)})
        _, logged = parse_frame(_gradient(), {"range": (0, 1000), "log": True})
        # Log brightens the midtones relative to linear.
        mid = (16, 24)
        assert logged[mid][0] > linear[mid][0]

    def test_scale_up_down(self):
        _, up = parse_frame(_gradient(), {"range": (0, 1000), "scale": 2.0})
        assert up.shape == (64, 96, 3)
        _, down = parse_frame(_gradient(), {"range": (0, 1000), "scale": 0.5})
        assert down.shape == (16, 24, 3)

    def test_center_crosshair(self):
        state = {"range": (0, 1000), "center_crosshair": True}
        _, rgb = parse_frame(_gradient(), state)
        _, plain = parse_frame(_gradient(), {"range": (0, 1000)})
        assert not np.array_equal(rgb[:, 24, :], plain[:, 24, :])

    def test_centroid_crosshair(self):
        img = np.zeros((32, 32))
        img[8, 20] = 1000.0  # Bright spot away from center.
        state = {"range": (0, 1000), "centroid_crosshair": True}
        _, rgb = parse_frame(img, state)
        # A full inverted column passes through the spot's x position.
        column_sums = rgb[..., 0].sum(axis=0)
        assert np.argmax(column_sums) == 20

    def test_colormap(self):
        _, rgb = parse_frame(_gradient(), {"range": (0, 1000), "cmap": "turbo"})
        # Turbo is chromatic: channels differ.
        assert not np.array_equal(rgb[..., 0], rgb[..., 2])


class TestViewerShell:
    @pytest.fixture()
    def viewer(self, camera):
        pytest.importorskip("ipywidgets")
        viewer = _CameraViewer(camera, widgets=True)
        yield viewer
        viewer.close()

    def test_init_renders_first_frame(self, viewer):
        assert viewer.prev_img is not None
        assert bytes(viewer.image.value).startswith(PNG_MAGIC)

    def test_autorange(self, viewer):
        viewer.autorange()
        lo, hi = viewer.state["range"]
        assert lo == int(viewer.prev_img.min())
        assert hi == int(viewer.prev_img.max())
        assert viewer.widgets["range"].value == (lo, hi)

    def test_update_pulls_widget_state(self, viewer):
        viewer.widgets["log"].value = True
        # The observer fires update(); state follows the widget.
        assert viewer.state["log"] is True

    def test_on_click_scales_coordinate(self, viewer):
        viewer.state["scale"] = 2.0
        pixel = viewer.on_click({"x": 10, "y": 6})
        np.testing.assert_array_equal(pixel, [5, 3])

    def test_render_via_get_image(self, viewer, camera):
        before = bytes(viewer.image.value)
        camera.viewer = viewer  # Wire like Camera.live() does.
        camera.get_image()
        assert viewer.prev_img is not None
        assert bytes(viewer.image.value) != b""
        camera.viewer = None

    def test_close_stops_live(self, viewer):
        viewer.state["live"] = True
        viewer.close()
        assert viewer.state["live"] is False
        assert viewer.task is None
