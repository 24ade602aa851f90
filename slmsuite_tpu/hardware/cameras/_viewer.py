"""
Jupyter live camera viewer.

An :mod:`ipywidgets`-based monitor that renders every frame flowing
through :meth:`.Camera.get_image`; toggling its *Live* button starts an
:mod:`asyncio` polling loop on the notebook's event loop, so monitoring
interleaves with (and is preempted by) user cell execution.

Parity: reference ``slmsuite/hardware/cameras/camera.py:1461``
(``_CameraViewer``), used by ``Camera.live()``.
"""

import asyncio
import io

import numpy as np

_DEFAULT_CMAPS = ["gray", "turbo", "viridis", "magma", "inferno"]


class _CameraViewer:
    """Widget bundle monitoring one :class:`.Camera`."""

    def __init__(
        self,
        cam,
        widgets=True,
        backend="ipython",
        cmap="turbo",
        cmap_options=None,
        scale=1.0,
        poll_s=0.05,
    ):
        import ipywidgets as ipw
        from IPython.display import display

        self.cam = cam
        self.scale = float(scale)
        self.poll_s = float(poll_s)
        self._live_task = None
        self._closed = False

        self.image_widget = ipw.Image(format="png")

        controls = []
        self.range_slider = ipw.FloatRangeSlider(
            value=(0.0, 1.0), min=0.0, max=1.0, step=0.005,
            description="Color", readout_format=".2f",
            continuous_update=True,
        )
        self.cmap_dropdown = ipw.Dropdown(
            options=list(cmap_options or _DEFAULT_CMAPS),
            value=cmap, description="Colormap",
        )
        self.scale_slider = ipw.FloatSlider(
            value=self.scale, min=0.1, max=4.0, step=0.1, description="Zoom",
        )
        self.live_toggle = ipw.ToggleButton(value=False, description="Live")
        self.close_button = ipw.Button(description="Close")

        self.scale_slider.observe(self._on_scale, names="value")
        self.live_toggle.observe(self._on_live, names="value")
        self.close_button.on_click(lambda _: self.cam.live(activate=False))

        if widgets:
            controls = [ipw.HBox([
                self.live_toggle, self.close_button,
                self.range_slider, self.cmap_dropdown, self.scale_slider,
            ])]
        self.box = ipw.VBox(controls + [self.image_widget])
        display(self.box)

        self._last = None

    # Widget callbacks.

    def _on_scale(self, change):
        self.scale = float(change["new"])
        if self._last is not None:
            self.render(self._last)

    def _on_live(self, change):
        if change["new"]:
            self._start_live()
        else:
            self._stop_live()

    def _start_live(self):
        if self._live_task is not None:
            return

        async def loop():
            while not self._closed and self.live_toggle.value:
                try:
                    # get_image() calls back into render().
                    self.cam.get_image()
                except Exception:
                    self.live_toggle.value = False
                    raise
                await asyncio.sleep(self.poll_s)

        self._live_task = asyncio.ensure_future(loop())

    def _stop_live(self):
        if self._live_task is not None:
            self._live_task.cancel()
            self._live_task = None

    # Rendering.

    def render(self, img):
        """Display ``img`` with the current color scale and colormap."""
        if self._closed:
            return
        import matplotlib

        self._last = img
        img = np.asarray(img, dtype=float) / self.cam.bitresolution
        vmin, vmax = self.range_slider.value
        if vmax <= vmin:
            vmax = vmin + 1e-6
        normalized = np.clip((img - vmin) / (vmax - vmin), 0, 1)

        colormap = matplotlib.colormaps[self.cmap_dropdown.value]
        rgba = (colormap(normalized) * 255).astype(np.uint8)

        self.image_widget.value = self._encode_png(rgba[..., :3])
        height, width = img.shape
        self.image_widget.layout.width = f"{int(width * self.scale)}px"
        self.image_widget.layout.height = f"{int(height * self.scale)}px"

    @staticmethod
    def _encode_png(rgb):
        try:
            import cv2

            ok, encoded = cv2.imencode(".png", rgb[..., ::-1])  # RGB -> BGR.
            if ok:
                return encoded.tobytes()
        except ImportError:
            pass
        from PIL import Image as PILImage

        buffer = io.BytesIO()
        PILImage.fromarray(rgb).save(buffer, format="png")
        return buffer.getvalue()

    def close(self):
        """Stop the live loop and remove the widgets."""
        self._closed = True
        self._stop_live()
        self.box.close()
