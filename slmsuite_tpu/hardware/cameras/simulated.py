r"""
Simulated camera: images the far-field of a (Simulated)SLM.

Parity: reference ``slmsuite/hardware/cameras/simulated.py:8-404``.

The image-formation pipeline runs on the jitted propagation engine: the
SLM's *quantized* displayed phase (simulating bitdepth) plus the
simulated source phase are propagated with the same shift-free FFT used
by the holography algorithms; camera pixels sample the far-field power
through an affine-mapped nearest-neighbor gather. Exposure scaling,
noise injection, and quantization happen host-side.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from slmsuite_tpu.hardware.cameras.camera import Camera
from slmsuite_tpu.holography import toolbox
from slmsuite_tpu.holography.algorithms import Hologram
from slmsuite_tpu.misc.math import REAL_TYPES


class SimulatedCamera(Camera):
    """
    Simulated camera imaging a simulated SLM's far-field.

    Attributes
    ----------
    grid : (numpy.ndarray, numpy.ndarray)
        Camera pixel grid (``"ij"`` or affine-transformed kxy).
    shape_padded : (int, int)
        FFT canvas size needed to resolve camera pixels.
    noise : dict OR None
        Noise model: ``{'dark': fn, 'read': fn}`` returning noise amplitude
        for a given normalized input (dark scales with exposure; read does
        not).
    """

    def __init__(self, slm, resolution=None, M=None, b=None, noise=None, pitch_um=None, gain=1, **kwargs):
        """
        Initialize a simulated camera viewing ``slm``. ``M``/``b`` (or
        ``f_eff`` and friends via :meth:`set_affine`) place the camera in
        the SLM's k-space; with neither, pixels map one-to-one onto the
        SLM's computational far-field.
        """
        self._slm = slm
        self._interpolate = False

        if resolution is None:
            resolution = slm.shape[::-1]
        elif any(r != s for r, s in zip(resolution, slm.shape[::-1])):
            self._interpolate = True

        super().__init__(resolution, pitch_um=pitch_um, **kwargs)

        self.gain = gain
        self.noise = noise

        self.grid = np.meshgrid(np.arange(resolution[0]), np.arange(resolution[1]))
        self.set_affine(M, b)

    def close(self):
        pass

    def set_affine(self, M=None, b=None, **kwargs):
        """
        Place the camera in the SLM's k-space via the affine ``(M, b)``
        (or :meth:`build_affine` kwargs, requiring ``f_eff``); rebuilds the
        interpolation grid and the internal propagation hologram.
        """
        if M is None or b is None:
            f_eff = kwargs.pop("f_eff", None)
            if f_eff is not None:
                M, b = self.build_affine(f_eff, **kwargs)

        self._interpolate = not (M is None or b is None)
        self.grid = np.meshgrid(np.arange(self.shape[1]), np.arange(self.shape[0]))
        self.shape_padded = self._slm.shape

        if self._interpolate:
            self.M = M
            self.b = b

            # Camera ij grid -> kxy.
            self.grid = toolbox.transform_grid(self, M, b, direction="rev")

            # Padding requirement: resolve the finest camera pixel spacing in k.
            dkxy = np.sqrt(
                np.square(self.grid[0][:2, :2] - self.grid[0][0, 0])
                + np.square(self.grid[1][:2, :2] - self.grid[1][0, 0])
            )
            dkxy_min = dkxy.ravel()[1:].min()
            self.shape_padded = Hologram.get_padded_shape(self._slm, precision=dkxy_min)

            # kxy -> knm pixel coordinates of the padded canvas (row, col):
            # kn = H * pitch_y * ky + H/2, km = W * pitch_x * kx + W/2
            # (convert_vector's knm convention) — the column coordinate
            # takes the X pitch, which differs from pitch[1] on
            # anisotropic-pixel SLMs.
            self.knm_cam = np.array(
                [
                    self.shape_padded[0] * self._slm.pitch[1] * self.grid[1]
                    + self.shape_padded[0] / 2,
                    self.shape_padded[1] * self._slm.pitch[0] * self.grid[0]
                    + self.shape_padded[1] / 2,
                ]
            )

            if (
                np.amax(np.abs(self.knm_cam[0] - self.shape_padded[0] / 2))
                > self.shape_padded[1] / 2
                or np.amax(np.abs(self.knm_cam[1] - self.shape_padded[1] / 2))
                > self.shape_padded[0] / 2
            ):
                warnings.warn(
                    "Camera extends beyond the accessible SLM k-space;"
                    " some pixels may not be targetable."
                )

        phase = -self._slm.display.astype(float) * (2 * np.pi / self._slm.bitresolution)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", category=Warning)
            self._hologram = Hologram(
                self.shape_padded,
                amp=self._slm.source["amplitude_sim"],
                phase=phase - phase.min() + self._slm.source["phase_sim"],
                slm_shape=tuple(self._slm.shape),
            )

    def build_affine(self, f_eff, units="norm", theta=0, shear_angle=0, offset=None):
        """
        Build ``(M, b)`` from physical parameters: effective focal length
        ``f_eff`` (in ``units``), camera rotation ``theta``, ``shear_angle``,
        and center ``offset`` (defaults to the camera center).
        """
        if offset is None:
            offset = np.flip(self.shape) / 2
        return SimulatedCamera._build_affine(
            f_eff,
            units=units,
            theta=theta,
            shear_angle=shear_angle,
            offset=offset,
            cam_pitch_um=self.pitch_um,
            wav_um=self._slm.wav_um,
        )

    @staticmethod
    def _build_affine(f_eff, units="ij", theta=0, shear_angle=0, offset=(0, 0), cam_pitch_um=None, wav_um=None):
        """Shared affine builder (also used by FourierSLM's analytic calibration)."""
        if isinstance(f_eff, REAL_TYPES):
            f_eff = [f_eff, f_eff]
        if isinstance(cam_pitch_um, REAL_TYPES):
            cam_pitch_um = [cam_pitch_um, cam_pitch_um]
        elif cam_pitch_um is not None:
            cam_pitch_um = np.ravel(cam_pitch_um)
        if isinstance(shear_angle, REAL_TYPES):
            shear_angle = [shear_angle, shear_angle]
        if offset is None:
            offset = (0, 0)

        f_eff = np.squeeze(f_eff).astype(float)
        shear_angle = np.squeeze(shear_angle)

        if units == "ij":
            pass
        elif units == "norm":
            if wav_um is None:
                raise ValueError("wav_um is required for unit 'norm'")
            if cam_pitch_um is None or cam_pitch_um[0] is None:
                raise ValueError("cam_pitch_um is required for unit 'norm'")
            f_eff = f_eff * (wav_um / np.squeeze(cam_pitch_um))
        elif units in toolbox.LENGTH_FACTORS:
            if cam_pitch_um is None or cam_pitch_um[0] is None:
                raise ValueError(f"cam_pitch_um is required for unit '{units}'")
            f_eff = f_eff * (toolbox.LENGTH_FACTORS[units] / np.squeeze(cam_pitch_um))
        else:
            raise ValueError(f"Unit '{units}' not recognized as a length.")

        mag = np.array([[f_eff[0], 0], [0, f_eff[1]]])
        shear = np.array([[1, np.tan(shear_angle[0])], [np.tan(shear_angle[1]), 1]])
        rot = np.array(
            [[np.cos(-theta), np.sin(-theta)], [-np.sin(-theta), np.cos(-theta)]]
        )
        return mag @ shear @ rot, toolbox.format_2vectors(offset)

    # ------------------------------------------------------------------
    # Hardware interface (virtual).
    # ------------------------------------------------------------------

    def flush(self, timeout_s=1):
        """No buffer to flush in simulation."""

    def _get_exposure_hw(self):
        return self.exposure_s

    def _set_exposure_hw(self, exposure_s):
        self.exposure_s = exposure_s

    def _sample_maps(self):
        """Device gather maps ``(flat, valid)`` for interpolated camera
        sampling: nearest-neighbor rounding identical to scipy's order-0
        spline (``floor(x + 0.5)``) into the padded far-field plane."""
        coords = np.floor(np.asarray(self.knm_cam, np.float64) + 0.5)
        Hp, Wp = self.shape_padded
        valid = (
            (coords[0] >= 0) & (coords[0] <= Hp - 1)
            & (coords[1] >= 0) & (coords[1] <= Wp - 1)
        )
        flat = (
            np.clip(coords[0], 0, Hp - 1).astype(np.int32) * Wp
            + np.clip(coords[1], 0, Wp - 1).astype(np.int32)
        )
        return jnp.asarray(flat), jnp.asarray(valid.astype(np.float32))

    def _device_sampler(self):
        """
        Jitted device-side camera sampling: |amp_ff|^2 gathered at the
        camera pixel coordinates (nearest-neighbor, matching
        ``scipy.ndimage.map_coordinates(order=0, mode='constant')``),
        scaled by exposure*gain. Cached per ``knm_cam`` identity.
        """
        cached = getattr(self, "_sampler_cache", None)
        # Key by IDENTITY with the host array held in the cache — an
        # id()-only key could alias a recalibrated knm_cam allocated at
        # a reused address and silently serve stale gather indices.
        key = self.knm_cam if self._interpolate else None
        if cached is not None and cached[0] is key:
            return cached[1]

        if self._interpolate:
            flat_dev, valid_dev = self._sample_maps()

            @jax.jit
            def sample(amp_ff, scale):
                pwr = jnp.square(amp_ff).ravel()
                return jnp.take(pwr, flat_dev) * valid_dev * scale
        else:
            cam_shape = tuple(self.shape)

            @jax.jit
            def sample(amp_ff, scale):
                # amp_ff.shape is static at trace time.
                y0, y1, x0, x1 = toolbox.unpad(amp_ff.shape, cam_shape)
                return jnp.square(amp_ff[y0:y1, x0:x1]) * scale

        self._sampler_cache = (key, sample)
        return sample

    def _get_dtype(self, get_image_function=None):
        """The virtual camera's dtype follows directly from bitdepth:
        at construction time the affine/hologram are not built yet
        (``set_affine`` runs after the ABC constructor), so the ABC's
        trial capture would burn its whole retry budget and emit a
        spurious capture-failure warning on every construction."""
        if get_image_function is None and not hasattr(self, "_hologram"):
            def get_image_function():
                raise RuntimeError("Simulated camera is not propagating yet.")
        return super()._get_dtype(get_image_function)

    def _get_image_hw(self, timeout_s=None):
        """
        Form an image: propagate the SLM's quantized display (+ simulated
        source) with the jitted engine, sample |far-field|^2 at camera
        pixels, apply exposure/gain/noise/saturation.
        """
        if not hasattr(self, "_hologram"):
            raise RuntimeError(
                "Cannot display SimulatedCamera before affine transformation is defined."
            )

        # Quantized displayed phase (simulates bitdepth). The *raw* source
        # amplitude sets the brightness convention (ref simulated.py:366):
        # uniform unit amplitude fully concentrated -> saturation at
        # exposure ~1/area; tests use set_exposure to stay in range.
        self._hologram.amp = np.asarray(
            self._slm.source["amplitude_sim"], dtype=self._hologram.dtype
        )
        phase = -self._slm.display.astype(self._hologram.dtype) * (
            2 * np.pi / self._slm.bitresolution
        )
        self._hologram.reset_phase(
            phase - phase.min() + self._slm.source["phase_sim"].astype(self._hologram.dtype)
        )

        self._hologram._populate_results()
        # Sample |farfield|^2 at the camera pixels ON DEVICE and download
        # only the camera-sized frame — the padded farfield plane is
        # several times larger and dominates the transfer cost otherwise.
        img = np.asarray(
            self._device_sampler()(
                self._hologram._amp_ff_device(),
                jnp.float32(self.exposure_s * self.gain),
            )
        )

        if self.noise is not None:
            for key in self.noise:
                if key == "dark":
                    img = img + self.noise["dark"](
                        np.ones_like(img) * self.bitresolution
                    ) / self.exposure_s
                elif key == "read":
                    img = img + self.noise["read"](np.ones_like(img) * self.bitresolution)
                else:
                    raise RuntimeError(f"Unknown noise source {key} specified!")

        img = np.minimum(img, self.bitresolution - 1)
        return img.astype(self.dtype)
