r"""
Optical focus arrays: :class:`SpotHologram` (DFT grid based) and
:class:`CompressedSpotHologram` (grid-free Zernike basis).

Parity: reference ``slmsuite/holography/algorithms/_spots.py``
(_AbstractSpotHologram :8-172, CompressedSpotHologram :174-1089,
SpotHologram :1090-1697).

TPU-native notes: spot-integrated feedback inside the computational loop
runs as a precomputed gather inside the scanned engine
(:meth:`ops.engine.spot_gather_indices`); the compressed near/farfield
transforms are MXU matmul pipelines (:mod:`slmsuite_tpu.ops.zernike`)
replacing the reference's CUDA kernels (``cuda.cu:95-288``).
"""

import warnings

import numpy as np

import jax.numpy as jnp

from slmsuite_tpu.holography import analysis, toolbox
from slmsuite_tpu.holography.algorithms._feedback import FeedbackHologram
from slmsuite_tpu.holography.algorithms._hologram import Hologram
from slmsuite_tpu.misc.math import INTEGER_TYPES, REAL_TYPES
from slmsuite_tpu.ops import engine as _engine
from slmsuite_tpu.ops.weights import update_weights_generic


class _AbstractSpotHologram(FeedbackHologram):
    """
    Shared spot logic: :meth:`refine_offset` and experimental/external spot
    statistics (ref ``_spots.py:8-172``).
    """

    def remove_vortices(self):
        """Spot holograms do not need to consider vortices."""

    def refine_offset(self, img=None, basis="kxy", force_affine=True, plot=False):
        """
        Hone spot positions toward their targets: centroid the measured
        spots, optionally fit an affine correction, and shift either the
        k-space targets (``basis="kxy"``/``"knm"``) or the camera
        integration positions (``basis="ij"``).

        Returns the per-spot shift vectors in the ``"ij"`` basis.
        """
        if self.spot_integration_width_ij is None:
            raise ValueError(
                "hologram.spot_integration_width_ij must be set to use refine_offset()."
            )

        if img is None:
            self.measure(basis="ij")
            img = self.img_ij

        regions = analysis.take(
            img, self.spot_ij, self.spot_integration_width_ij, centered=True, integrate=False
        )
        regions = analysis.image_remove_field(regions, deviations=None, out=regions)
        shift_vectors = analysis.image_positions(regions)

        if force_affine:
            affine = analysis.fit_affine(
                self.spot_ij[[0, 1]], self.spot_ij[[0, 1]] + shift_vectors
            )
            shift_vectors = (
                affine["M"] @ self.spot_ij[[0, 1]] + affine["b"]
            ) - self.spot_ij[[0, 1]]

        if plot:
            import matplotlib.pyplot as plt

            plt.imshow(img)
            sv = self.spot_ij[[0, 1]] + shift_vectors
            plt.scatter(sv[0, :], sv[1, :], s=200, fc="none", ec="r")
            plt.title("Refine Offset")
            plt.show()

        if basis is not None:
            if basis in ("kxy", "knm"):
                self.spot_kxy = self.spot_kxy.astype(float)
                self.spot_kxy[[0, 1]] = self.spot_kxy[[0, 1]] - (
                    self.cameraslm.ijcam_to_kxyslm(shift_vectors)
                    - self.cameraslm.ijcam_to_kxyslm((0, 0))
                )

                if hasattr(self, "spot_knm") and self.spot_knm is not None:
                    self.spot_knm = toolbox.convert_vector(
                        self.spot_kxy,
                        "kxy",
                        "knm",
                        hardware=self.cameraslm.slm,
                        shape=self.shape,
                    )
                    self.set_target(reset_weights=True)

                if hasattr(self, "spot_zernike"):
                    spot_zernike_xy = toolbox.convert_vector(
                        self.spot_kxy,
                        "kxy",
                        "zernike",
                        hardware=self.cameraslm.slm,
                        shape=self.shape,
                    )
                    self.spot_zernike[self.zernike_basis_cartesian, :] = spot_zernike_xy
            elif basis == "ij":
                self.spot_ij = self.spot_ij + shift_vectors
            else:
                raise ValueError(f"Unrecognized basis '{basis}'.")

        return shift_vectors

    def _populate_stats(self, stats, stat_groups):
        super()._populate_stats(stats, stat_groups)

        if "experimental_spot" in stat_groups:
            self.measure(basis="ij")
            pwr_img = np.square(self.img_ij)
            pwr_feedback = analysis.take(
                pwr_img,
                self.spot_ij,
                self.spot_integration_width_ij,
                centered=True,
                integrate=True,
            )
            stats["experimental_spot"] = self._calculate_stats(
                np.sqrt(pwr_feedback),
                self.spot_amp,
                efficiency_compensation=False,
                total=np.sum(pwr_img),
                raw=bool(self.flags.get("raw_stats")),
            )

        if "external_spot" in stat_groups:
            pwr_feedback = np.square(np.asarray(self.external_spot_amp, dtype=self.dtype))
            stats["external_spot"] = self._calculate_stats(
                np.sqrt(pwr_feedback),
                self.spot_amp,
                efficiency_compensation=False,
                total=np.sum(pwr_feedback),
                raw=bool(self.flags.get("raw_stats")),
            )


class SpotHologram(_AbstractSpotHologram):
    """
    DFT-based optical focus arrays: N spots tracked in the ``"knm"``
    (computational), ``"kxy"`` (normalized k-space), and ``"ij"`` (camera)
    bases, with per-spot amplitude targets, MRAF null regions, and
    spot-integrated feedback.

    Parity: reference ``_spots.py:1090-1697``.
    """

    def __init__(
        self,
        shape,
        spot_vectors,
        basis="kxy",
        spot_amp=None,
        cameraslm=None,
        null_vectors=None,
        null_radius=None,
        null_region=None,
        null_region_radius_frac=None,
        **kwargs,
    ):
        """
        Initialize a spot hologram from ``(2, N)`` spot vectors in the given
        ``basis`` (``"kxy"`` default; ``"knm"`` computational pixels;
        ``"ij"`` camera pixels, requiring a Fourier-calibrated
        ``cameraslm``). ``null_*`` parameters configure MRAF zero regions.
        Ref ``_spots.py:1090-1373``.
        """
        vectors = toolbox.format_2vectors(spot_vectors)
        N = vectors.shape[1]

        if spot_amp is not None:
            self.spot_amp = np.ravel(spot_amp)
            if len(self.spot_amp) != N:
                raise ValueError("spot_amp must have the same length as the spots.")
        else:
            self.spot_amp = np.full(N, 1.0 / np.sqrt(N))

        self.external_spot_amp = np.copy(self.spot_amp)

        if null_vectors is not None:
            null_vectors = toolbox.format_2vectors(null_vectors)
        self.null_knm = None
        self.null_radius_knm = None
        self.null_region_knm = None

        # Interpret vectors according to the basis.
        if basis is None or basis == "knm":
            self.spot_knm = vectors
            if cameraslm is not None:
                self.spot_kxy = toolbox.convert_vector(
                    self.spot_knm, "knm", "kxy", hardware=cameraslm, shape=shape
                )
                if "fourier" in getattr(cameraslm, "calibrations", {}):
                    self.spot_ij = cameraslm.kxyslm_to_ijcam(self.spot_kxy)
                else:
                    self.spot_ij = None
            else:
                self.spot_kxy = None
                self.spot_ij = None

            self.null_knm = null_vectors
            self.null_radius_knm = null_radius
            self.null_region_knm = null_region
        elif basis == "kxy":
            if cameraslm is None:
                raise ValueError("A cameraslm (or SLM) is needed to interpret kxy.")
            self.spot_kxy = vectors
            if "fourier" in getattr(cameraslm, "calibrations", {}):
                self.spot_ij = cameraslm.kxyslm_to_ijcam(vectors)
            else:
                self.spot_ij = None
            self.spot_knm = toolbox.convert_vector(
                vectors, "kxy", "knm", hardware=cameraslm, shape=shape
            )
        elif basis == "ij":
            if cameraslm is None or "fourier" not in cameraslm.calibrations:
                raise ValueError("A Fourier-calibrated cameraslm is needed for ij.")
            self.spot_ij = vectors
            self.spot_kxy = cameraslm.ijcam_to_kxyslm(vectors)
            self.spot_knm = toolbox.convert_vector(
                vectors, "ij", "knm", hardware=cameraslm, shape=shape
            )
        else:
            raise ValueError(f"Unrecognized basis for spots '{basis}'.")

        # Null conversions for ij/kxy bases.
        if basis in ("ij", "kxy"):
            if null_vectors is not None:
                self.null_knm = toolbox.convert_vector(
                    null_vectors, basis, "knm", hardware=cameraslm, shape=shape
                )
                if null_radius is not None:
                    self.null_radius_knm = toolbox.convert_radius(
                        null_radius, basis, "knm", hardware=cameraslm, shape=shape
                    )
            self.null_region_knm = None  # (possibly via ij transform below)

        # Point spread functions and integration widths.
        if cameraslm is not None and hasattr(cameraslm, "slm"):
            psf_kxy = np.mean(cameraslm.slm.get_spot_radius_kxy())
            psf_knm = toolbox.convert_radius(psf_kxy, "kxy", "knm", cameraslm.slm, shape)
            psf_ij = toolbox.convert_radius(psf_kxy, "kxy", "ij", cameraslm, shape)
        else:
            psf_knm = 0
            psf_ij = np.nan

        psf_knm = 0 if np.isnan(psf_knm) else psf_knm
        psf_ij = 0 if np.isnan(psf_ij) else psf_ij

        # Integration width: ~10x the psf, clipped to [3, spot spacing/1.5], odd.
        N_psf, min_psf = 10, 3
        dist_knm = np.max([toolbox.smallest_distance(self.spot_knm) / 1.5, min_psf])
        width = np.clip(N_psf * psf_knm, min_psf, dist_knm)
        self.spot_integration_width_knm = int(2 * np.floor(width / 2) + 1)

        if self.spot_ij is not None:
            dist_ij = np.max([toolbox.smallest_distance(self.spot_ij) / 1.5, min_psf])
            width = np.clip(N_psf * psf_ij, min_psf, dist_ij)
            self.spot_integration_width_ij = int(2 * np.floor(width / 2) + 1)
        else:
            self.spot_integration_width_ij = None

        # Bounds checks.
        if (
            np.any(self.spot_knm[0] < 0)
            or np.any(self.spot_knm[1] < 0)
            or np.any(self.spot_knm[0] >= shape[1])
            or np.any(self.spot_knm[1] >= shape[0])
        ):
            raise ValueError(
                f"Spots outside SLM computational space bounds!\n"
                f"Spots:\n{self.spot_knm}\nBounds: {shape}"
            )

        if self.spot_ij is not None:
            cam_shape = cameraslm.cam.shape
            half = self.spot_integration_width_ij / 2
            if (
                np.any(self.spot_ij[0] < half)
                or np.any(self.spot_ij[1] < half)
                or np.any(self.spot_ij[0] >= cam_shape[1] - half)
                or np.any(self.spot_ij[1] >= cam_shape[0] - half)
            ):
                raise ValueError(
                    f"Spots outside camera bounds!\nSpots:\n{self.spot_ij}\n"
                    f"Bounds: {cam_shape}"
                )

        if self.null_knm is not None:
            if self.null_radius_knm is None:
                all_spots = np.hstack((self.null_knm, self.spot_knm))
                self.null_radius_knm = toolbox.smallest_distance(all_spots) / 4
            self.null_radius_knm = int(np.ceil(self.null_radius_knm))

        super().__init__(shape, target_ij=None, cameraslm=cameraslm, **kwargs)

        if basis == "ij" and null_region is not None:
            self.null_region_knm = (
                self.ijcam_to_knmslm(null_region, order=0) != 0
            )

        if null_region_radius_frac is not None:
            if self.null_region_knm is None:
                self.null_region_knm = np.zeros(self.shape, dtype=bool)
            xg, yg = np.meshgrid(
                np.linspace(-1, 1, self.null_region_knm.shape[1]),
                np.linspace(-1, 1, self.null_region_knm.shape[0]),
            )
            self.null_region_knm[
                np.square(xg) + np.square(yg) > null_region_radius_frac**2
            ] = True

        self.set_target(reset_weights=True)

    def __len__(self):
        """Number of spots."""
        return self.spot_knm.shape[1]

    # ------------------------------------------------------------------
    # Target construction (ref :1387-1546).
    # ------------------------------------------------------------------

    @staticmethod
    def make_rectangular_array(
        shape,
        array_shape,
        array_pitch,
        array_center=None,
        basis="knm",
        orientation_check=False,
        **kwargs,
    ):
        """
        Build a rectangular spot array of ``array_shape`` spots at
        ``array_pitch`` spacing about ``array_center`` (defaults to the
        zeroth order in the chosen basis). ``orientation_check`` removes the
        last two spots for the Fourier-calibration parity check.
        """
        if isinstance(array_shape, REAL_TYPES):
            array_shape = (int(array_shape), int(array_shape))
        if isinstance(array_pitch, REAL_TYPES):
            array_pitch = (array_pitch, array_pitch)

        if array_center is None:
            if basis == "knm":
                array_center = (shape[1] / 2.0, shape[0] / 2.0)
            elif basis == "kxy":
                array_center = (0, 0)
            elif basis == "ij":
                cameraslm = kwargs.get("cameraslm")
                if cameraslm is None or "fourier" not in cameraslm.calibrations:
                    raise ValueError("A Fourier-calibrated cameraslm is needed for ij.")
                array_center = toolbox.convert_vector(
                    (0, 0), "kxy", "ij", hardware=cameraslm
                )

        x_edge = (np.arange(array_shape[0]) - (array_shape[0] - 1) / 2.0) * array_pitch[0] + array_center[0]
        y_edge = (np.arange(array_shape[1]) - (array_shape[1] - 1) / 2.0) * array_pitch[1] + array_center[1]

        x_grid, y_grid = np.meshgrid(x_edge, y_edge)
        x_list, y_list = x_grid.ravel(), y_grid.ravel()

        if orientation_check and len(x_list) > 2:
            x_list = x_list[:-2]
            y_list = y_list[:-2]

        return SpotHologram(
            shape, np.vstack((x_list, y_list)), basis=basis, spot_amp=None, **kwargs
        )

    def _set_target_spots(self, reset_weights=False):
        """Scatter spot amplitudes (+null regions) into the target plane."""
        self.spot_knm_rounded = np.rint(self.spot_knm).astype(int)

        if self.cameraslm is not None:
            self.spot_kxy_rounded = toolbox.convert_vector(
                self.spot_knm_rounded,
                "knm",
                "kxy",
                hardware=self.cameraslm.slm,
                shape=self.shape,
            )
            if "fourier" in self.cameraslm.calibrations:
                self.spot_ij_rounded = self.cameraslm.kxyslm_to_ijcam(self.spot_kxy_rounded)
            else:
                self.spot_ij_rounded = None
        else:
            self.spot_kxy_rounded = None
            self.spot_ij_rounded = None

        if self.target is None:
            self.target = np.zeros(self.shape, dtype=self.dtype)

        # MRAF (nan background) engages only with explicit null *vectors*
        # (ref `_spots.py:1522-1530`: a bare null_region leaves zero fill).
        if self.null_knm is None:
            self.target.fill(0)
        else:
            # Amplitude-free (nan) background, with explicit zero regions.
            self.target.fill(np.nan)
            if self.null_region_knm is not None:
                self.target[self.null_region_knm] = 0
            if self.null_knm is not None:
                all_spots = np.hstack((self.null_knm, self.spot_knm))
                w = int(2 * self.null_radius_knm + 1)
                for ii in range(all_spots.shape[1]):
                    toolbox.imprint(
                        self.target,
                        (np.rint(all_spots[0, ii]), w, np.rint(all_spots[1, ii]), w),
                        0,
                        centered=True,
                        circular=True,
                    )

        self.target[self.spot_knm_rounded[1, :], self.spot_knm_rounded[0, :]] = self.spot_amp
        self.target /= Hologram._norm(self.target)

        if reset_weights:
            self.reset_weights()

    def set_target(self, new_target=None, reset_weights=False, plot=False):
        """Update the target from the current :attr:`spot_knm` positions."""
        del new_target  # Target is derived from spot positions.
        self._set_target_spots(reset_weights=reset_weights)

    # ------------------------------------------------------------------
    # Engine integration: spot feedback inside the scan.
    # ------------------------------------------------------------------

    @property
    def _spot_count(self):
        return int(self.spot_knm.shape[1])

    @property
    def _spot_window(self):
        return int(self.spot_integration_width_knm)

    @property
    def _spot_single_px(self):
        return tuple(self.shape) == tuple(self.slm_shape)

    def _engine_feedback(self):
        feedback = self.flags.get("feedback", "computational")
        if feedback in ("computational", "computational_spot"):
            return feedback
        return "external_spot"  # host-updated weights

    def _extend_consts(self, consts, config):
        super()._extend_consts(consts, config)
        needs_spots = (
            config.feedback == "computational_spot"
            or "computational_spot" in config.stat_groups
        )
        if needs_spots:
            # Gather maps: stats use the raw (floored) spot positions like
            # analysis.take; weight updates use the rounded spot pixels.
            flat_idx, _ = _engine.spot_gather_indices(
                np.floor(self.spot_knm).astype(int),
                self.spot_integration_width_knm,
                self.shape,
            )
            weight_flat_idx, center_idx = _engine.spot_gather_indices(
                self.spot_knm_rounded, self.spot_integration_width_knm, self.shape
            )
            consts["spot_flat_idx"] = jnp.asarray(flat_idx)
            consts["spot_weight_flat_idx"] = jnp.asarray(weight_flat_idx)
            consts["spot_center_idx"] = jnp.asarray(center_idx)
            consts["spot_amp"] = jnp.asarray(self.spot_amp, dtype=jnp.float32)

    # ------------------------------------------------------------------
    # Host-side weighting (stepwise/experimental paths; ref :1573-1624).
    # ------------------------------------------------------------------

    def _update_weights(self):
        feedback = self.flags["feedback"]

        if feedback == "experimental":
            warnings.warn(
                "SpotHologram feedback 'experimental' is interpreted as 'experimental_spot'"
            )
            feedback = self.flags["feedback"] = "experimental_spot"

        if feedback == "computational":
            super()._update_weights()
            return

        if feedback == "computational_spot":
            amp_feedback = np.sqrt(
                analysis.take(
                    np.square(self.amp_ff),
                    self.spot_knm_rounded,
                    self.spot_integration_width_knm,
                    centered=True,
                    integrate=True,
                )
            )
        elif feedback == "experimental_spot":
            self.measure(basis="ij")
            amp_feedback = np.sqrt(
                analysis.take(
                    np.square(np.asarray(self.img_ij, dtype=self.dtype)),
                    self.spot_ij,
                    self.spot_integration_width_ij,
                    centered=True,
                    integrate=True,
                )
            )
        elif feedback == "external_spot":
            amp_feedback = self.external_spot_amp
        else:
            raise ValueError(f"Feedback '{feedback}' not recognized.")

        rows = self.spot_knm_rounded[1, :]
        cols = self.spot_knm_rounded[0, :]
        self.weights[rows, cols] = np.asarray(
            update_weights_generic(
                jnp.asarray(self.weights[rows, cols], dtype=jnp.float32),
                jnp.asarray(np.asarray(amp_feedback, dtype=np.float32)),
                jnp.asarray(self.spot_amp, dtype=jnp.float32),
                self.flags["method"],
                self.flags.get("feedback_exponent", 0.8),
                self.flags.get("feedback_factor", 0.1),
            )
        )

    def _populate_stats(self, stats, stat_groups):
        super()._populate_stats(stats, stat_groups)

        if "computational_spot" in stat_groups:
            if tuple(self.shape) == tuple(self.slm_shape):
                feedback = self.amp_ff[
                    self.spot_knm_rounded[1, :], self.spot_knm_rounded[0, :]
                ]
                total = np.sum(np.square(self.amp_ff))
            else:
                pwr_ff = np.square(self.amp_ff)
                pwr_feedback = analysis.take(
                    pwr_ff,
                    self.spot_knm,
                    self.spot_integration_width_knm,
                    centered=True,
                    integrate=True,
                )
                feedback = np.sqrt(pwr_feedback)
                total = np.sum(pwr_ff)

            stats["computational_spot"] = self._calculate_stats(
                feedback,
                self.spot_amp,
                efficiency_compensation=False,
                total=total,
                raw=bool(self.flags.get("raw_stats")),
            )


class CompressedSpotHologram(_AbstractSpotHologram):
    """
    Grid-free spot holography in a Zernike basis (under construction in
    this module; see :mod:`slmsuite_tpu.ops.zernike` for the transform
    kernels). Parity target: reference ``_spots.py:174-1089``.
    """

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "CompressedSpotHologram lands with ops.zernike; use SpotHologram."
        )
