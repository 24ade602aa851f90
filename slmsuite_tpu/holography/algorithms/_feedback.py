r"""
Camera-in-the-loop holography: :class:`FeedbackHologram`.

Parity: reference ``slmsuite/holography/algorithms/_feedback.py`` (ctor
:31-138, ijcam_to_knmslm :141-233, measure :236-276, update_target
:279-328, weights/stats :360-411).

Device work (propagation, weight updates) runs jitted; hardware I/O and
the ij->knm affine resampling remain host-side, since the experimental
loop is paced by SLM settle time and camera exposure anyway.
"""

import numpy as np
from scipy.ndimage import affine_transform as sp_affine_transform
from scipy.ndimage import gaussian_filter as sp_gaussian_filter

import jax.numpy as jnp

from slmsuite_tpu.holography import toolbox
from slmsuite_tpu.holography.algorithms._hologram import Hologram
from slmsuite_tpu.ops.weights import update_weights_generic


class FeedbackHologram(Hologram):
    """
    Hologram with experimental feedback through a
    :class:`~slmsuite_tpu.hardware.cameraslms.FourierSLM`.

    Attributes
    ----------
    cameraslm : FourierSLM OR None
        Hardware access for feedback.
    target_ij : numpy.ndarray OR None
        Target amplitude in the camera basis.
    img_ij, img_knm : numpy.ndarray OR None
        Cached amplitude feedback images in camera/computational bases.
    """

    def __init__(
        self,
        shape,
        target_ij=None,
        cameraslm=None,
        null_region=None,
        null_region_radius_frac=None,
        **kwargs,
    ):
        """
        Initialize a feedback hologram of computational ``shape`` targeting
        the camera-basis image ``target_ij`` (transformed through the
        Fourier calibration). See reference ``_feedback.py:31-138``.
        """
        self.cameraslm = cameraslm
        amp = None
        slm_shape = None
        if cameraslm is not None:
            if hasattr(cameraslm, "slm") and hasattr(cameraslm, "cam"):
                slm = cameraslm.slm
            elif hasattr(cameraslm, "shape") and hasattr(cameraslm, "grid"):
                slm = cameraslm
                self.cameraslm = cameraslm = None
            else:
                raise ValueError("Expected a CameraSLM or SLM for cameraslm.")
            amp = slm._get_source_amplitude()
            slm_shape = tuple(slm.shape)
        else:
            amp = kwargs.pop("amp", None)

        kwargs.setdefault("slm_shape", slm_shape)
        super().__init__(target=shape, amp=amp, **kwargs)

        self.img_ij = None
        self.img_knm = None
        self.target_ij = None if target_ij is None else np.asarray(target_ij, self.dtype)

        if self.cameraslm is not None and "fourier" in self.cameraslm.calibrations:
            # Camera corners in knm space (for plotting).
            cam_shape = self.cameraslm.cam.shape
            corners = np.array(
                [
                    [0, 0],
                    [0, cam_shape[0] - 1],
                    [cam_shape[1] - 1, cam_shape[0] - 1],
                    [cam_shape[1] - 1, 0],
                    [0, 0],
                ]
            ).T
            points_kxy = self.cameraslm.ijcam_to_kxyslm(toolbox.format_2vectors(corners))
            self._cam_points = toolbox.convert_vector(
                points_kxy, "kxy", "knm", hardware=self.cameraslm.slm, shape=self.shape
            )

            if target_ij is not None:
                self.update_target(
                    target_ij, null_region, null_region_radius_frac, reset_weights=True
                )
        else:
            self._cam_points = None

    def _engine_feedback(self):
        """Experimental (image) feedback measures hardware between
        iterations: weights update host-side around stepwise engine
        invocations."""
        feedback = self.flags.get("feedback", "computational")
        if feedback == "computational":
            return feedback
        return "external"

    # ------------------------------------------------------------------
    # Basis transformation.
    # ------------------------------------------------------------------

    def ijcam_to_knmslm(self, img, out=None, blur_ij=None, order=3):
        """
        Transform a camera-basis image into computational knm space via the
        composite affine (knm -> kxy scaling, then the Fourier-calibration
        kxy -> ij transform, inverted). Ref ``_feedback.py:141-233``.
        """
        if self.cameraslm is None:
            raise RuntimeError("ijcam_to_knmslm requires a cameraslm.")
        if "fourier" not in self.cameraslm.calibrations:
            raise RuntimeError("ijcam_to_knmslm requires a Fourier calibration.")

        # knm -> kxy is a diagonal scaling about the knm center.
        conversion = toolbox.convert_vector(
            (1, 1), "knm", "kxy", hardware=self.cameraslm.slm, shape=self.shape
        ) - toolbox.convert_vector(
            (0, 0), "knm", "kxy", hardware=self.cameraslm.slm, shape=self.shape
        )
        M1 = np.diag(np.squeeze(conversion))
        b1 = M1 @ (-toolbox.format_2vectors(np.flip(np.squeeze(self.shape)) / 2))

        M2 = np.array(self.cameraslm.calibrations["fourier"]["M"], copy=True)
        b2 = np.array(self.cameraslm.calibrations["fourier"]["b"], copy=True)
        if "a" in self.cameraslm.calibrations["fourier"]:
            b2 = b2 - M2 @ self.cameraslm.calibrations["fourier"]["a"]

        # Composite (knm -> ij), in (row, col) order for scipy.
        M = np.flip(np.flip(M2 @ M1, axis=0), axis=1)
        b = np.flip(np.squeeze(M2 @ b1 + b2))

        if blur_ij is None:
            blur_ij = self.flags.get("blur_ij", 0)

        img = np.asarray(img, dtype=float)
        if blur_ij > 0:
            img = sp_gaussian_filter(img, (blur_ij, blur_ij), truncate=2)
        img = np.abs(img)

        target = sp_affine_transform(
            input=img,
            matrix=M,
            offset=b,
            output_shape=self.shape,
            order=order,
            mode="constant",
            cval=np.nan,
        )
        target = np.abs(target)
        norm = Hologram._norm(target)
        if norm == 0:
            raise ValueError(
                "No power in hologram. Maybe target_ij is out of range of knm space?"
            )
        target = (target / norm).astype(self.dtype)

        if out is not None:
            np.copyto(out, target)
            return out
        return target

    # ------------------------------------------------------------------
    # Measurement.
    # ------------------------------------------------------------------

    def measure(self, basis="ij"):
        """
        Ensure a feedback image is cached: write the hologram phase to the
        SLM, settle, grab a camera image, and store its amplitude (sqrt) in
        :attr:`img_ij` (and transformed :attr:`img_knm` for ``basis="knm"``).
        """
        if self.img_ij is None and basis in ("ij", "knm"):
            self.cameraslm.slm.set_phase(
                self.get_phase(include_propagation=True), settle=True
            )
            self.cameraslm.cam.flush()
            self.img_ij = np.asarray(self.cameraslm.cam.get_image(), dtype=self.dtype)

            if basis == "knm":
                self.img_knm = np.sqrt(self.ijcam_to_knmslm(self.img_ij, out=self.img_knm))
            else:
                self.img_knm = None

            self.img_ij = np.sqrt(self.img_ij)
        elif basis == "knm":
            if self.img_knm is None:
                self.img_knm = np.sqrt(
                    self.ijcam_to_knmslm(np.square(self.img_ij), out=self.img_knm)
                )
        elif basis != "ij":
            raise ValueError(f"Unrecognized basis '{basis}'. Options: 'ij', 'knm'.")

    def _midloop_cleaning(self):
        self.img_ij = None
        self.img_knm = None

    # ------------------------------------------------------------------
    # Target update.
    # ------------------------------------------------------------------

    def update_target(self, new_target_ij, null_region=None, null_region_radius_frac=None, reset_weights=False):
        """
        Set a new camera-basis target; transforms into knm space and applies
        null-region handling (nan outside the camera FoV unless nulled).
        Ref ``_feedback.py:279-328``.
        """
        self.target_ij = np.asarray(new_target_ij, self.dtype)
        self.target = self.ijcam_to_knmslm(new_target_ij, order=0)

        undefined = np.isnan(self.target)

        if null_region_radius_frac is None:
            null_region_radius_frac = 1

        if null_region_radius_frac < 1:
            if null_region is None:
                null_region = np.zeros(self.shape, dtype=bool)
            xg, yg = np.meshgrid(
                np.linspace(-1, 1, null_region.shape[1]),
                np.linspace(-1, 1, null_region.shape[0]),
            )
            null_region[np.square(xg) + np.square(yg) > null_region_radius_frac**2] = True

        if null_region_radius_frac >= 1:
            self.target[undefined] = 0
        else:
            self.target[np.logical_and(undefined, null_region)] = 0

        if reset_weights:
            self.reset_weights()

    def refine_offset(self, img, basis="kxy"):
        """
        **(NotImplemented)** Hone image position against the target.
        Parity: reference ``_feedback.py:330-357`` (also NotImplemented;
        implemented for spot holograms in :class:`_AbstractSpotHologram`).
        """
        raise NotImplementedError()

    # ------------------------------------------------------------------
    # Weighting and stats.
    # ------------------------------------------------------------------

    def _update_weights(self):
        feedback = self.flags["feedback"]

        if feedback == "computational":
            super()._update_weights()
        elif feedback == "experimental":
            self.measure("knm")
            self.weights = np.asarray(
                update_weights_generic(
                    jnp.asarray(np.nan_to_num(self.weights)),
                    jnp.asarray(self.img_knm),
                    jnp.asarray(self.target),
                    self.flags["method"],
                    self.flags.get("feedback_exponent", 0.8),
                    self.flags.get("feedback_factor", 0.1),
                )
            )

    def _populate_stats(self, stats, stat_groups):
        super()._populate_stats(stats, stat_groups)
        if "experimental_knm" in stat_groups:
            self.measure("knm")
            stats["experimental_knm"] = self._calculate_stats(
                self.img_knm,
                np.asarray(self.target),
                efficiency_compensation=True,
                raw=bool(self.flags.get("raw_stats")),
            )
        if "experimental_ij" in stat_groups or "experimental" in stat_groups:
            self.measure("ij")
            stats["experimental_ij"] = self._calculate_stats(
                self.img_ij,
                self.target_ij,
                efficiency_compensation=True,
                raw=bool(self.flags.get("raw_stats")),
            )
