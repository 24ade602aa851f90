r"""
Camera + SLM pairing and the system calibration suite.

Parity: reference ``slmsuite/hardware/cameraslms.py`` (CameraSLM :32-156,
FourierSLM simulate/load :239-337, calibration I/O :341-461, settle
:468-625, pixel :626-898, Fourier :931-1221, kxy<->ij :1222-1381,
derived optics :1383-1487, wavefront calibrations :1488-3983).
"""

import copy
import os
import time
import warnings

import numpy as np
from scipy import optimize
from tqdm.auto import tqdm

from slmsuite_tpu import __version__
from slmsuite_tpu.hardware import _Picklable
from slmsuite_tpu.hardware.cameras.simulated import SimulatedCamera
from slmsuite_tpu.hardware.slms.simulated import SimulatedSLM
from slmsuite_tpu.holography import analysis, toolbox
from slmsuite_tpu.holography.algorithms import SpotHologram
from slmsuite_tpu.holography.toolbox import format_2vectors, format_vectors
from slmsuite_tpu.holography.toolbox.phase import binary, blaze, zernike_sum
from slmsuite_tpu.misc.files import generate_path, latest_path, load_h5, save_h5
from slmsuite_tpu.misc.math import REAL_TYPES


class CameraSLM(_Picklable):
    """
    Base class pairing a :class:`Camera` and an :class:`SLM` for closed-loop
    feedback, with magnification ``mag`` between camera and experiment
    planes.
    """

    _pickle = ["name", "cam", "slm", "mag"]
    _pickle_data = []

    def __init__(self, cam, slm, mag=1):
        if not hasattr(cam, "get_image"):
            raise ValueError(f"Expected Camera to be passed as cam. Found {type(cam)}")
        self.cam = cam
        if not hasattr(slm, "set_phase"):
            raise ValueError(f"Expected SLM to be passed as slm. Found {type(slm)}")
        self.slm = slm

        self.name = self.cam.name + "-" + self.slm.name
        self.mag = float(mag)
        self.calibrations = {}

    def close(self):
        """Close both pieces of hardware."""
        try:
            self.cam.close()
        finally:
            self.slm.close()

    def plot(self, phase=None, image=None, title="", **kwargs):
        """Plot the current SLM phase and camera image side by side."""
        import matplotlib.pyplot as plt

        if image is None and phase is not None and np.shape(phase) == self.slm.shape:
            self.slm.set_phase(phase, **kwargs)
        if phase is None:
            phase = self.slm.phase
        if image is None:
            image = self.cam.get_image()

        fig, axs = plt.subplots(1, 2, figsize=(14, 6))
        axs[0].imshow(np.mod(phase, 2 * np.pi), cmap="twilight", vmin=0, vmax=2 * np.pi)
        axs[0].set_title("SLM Phase")
        axs[1].imshow(image)
        axs[1].set_title("Camera Image")
        fig.suptitle(title)
        plt.show()
        return axs


class NearfieldSLM(CameraSLM):
    """
    **(NotImplemented)** SLM imaged (not Fourier-transformed) onto a camera.
    Parity: reference ``cameraslms.py:158-173`` (also a stub).
    """

    def __init__(self, cam, slm, mag=None):
        super().__init__(cam, slm, 1 if mag is None else mag)
        raise NotImplementedError()


class FourierSLM(CameraSLM):
    r"""
    SLM and camera separated by a Fourier transform, with the full
    calibration suite: ``"fourier"`` (affine kxy<->ij), ``"wavefront_*"``
    (aberration + source amplitude), ``"pixel"`` (crosstalk/Vpi raw data),
    and ``"settle"`` (temporal response).
    """

    _pickle = ["name", "cam", "slm", "mag"]
    _pickle_data = ["calibrations"]

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # Calibration point window size relative to the spot radius.
        self._wavefront_calibration_window_multiplier = 4

    # ------------------------------------------------------------------
    # Simulation cloning (ref :239-337).
    # ------------------------------------------------------------------

    def simulate(self):
        """
        Clone this (Fourier-calibrated) rig into simulated hardware with the
        same calibration.
        """
        if "fourier" not in self.calibrations:
            raise ValueError("Cannot simulate() a FourierSLM without a Fourier calibration.")

        slm_sim = SimulatedSLM(
            self.slm.shape[::-1],
            source=self.slm.source,
            bitdepth=self.slm.bitdepth,
            name=self.slm.name + "_sim",
            wav_um=self.slm.wav_um,
            wav_design_um=self.slm.wav_design_um,
            pitch_um=self.slm.pitch_um,
        )
        cam_sim = SimulatedCamera(
            slm_sim,
            resolution=self.cam.shape[::-1],
            M=copy.copy(self.calibrations["fourier"]["M"]),
            b=copy.copy(self.calibrations["fourier"]["b"]),
            bitdepth=self.cam.bitdepth,
            averaging=self.cam.averaging,
            hdr=self.cam.hdr,
            pitch_um=self.cam.pitch_um,
            name=self.cam.name + "_sim",
        )
        cam_sim.transform = copy.copy(self.cam.transform)

        fs_sim = FourierSLM(cam_sim, slm_sim)
        fs_sim.calibrations = copy.deepcopy(self.calibrations)
        fs_sim._wavefront_calibration_window_multiplier = (
            self._wavefront_calibration_window_multiplier
        )
        return fs_sim

    @staticmethod
    def load(file_path):
        """Reconstruct a simulated rig from a pickled FourierSLM h5 file."""
        data = load_h5(file_path)
        if "__meta__" not in data:
            raise ValueError(f"Cannot interpret file {file_path} without field '__meta__'.")
        meta = data["__meta__"]
        for field in ("cam", "slm"):
            if field not in meta:
                raise ValueError(
                    f"Cannot interpret file {file_path} without metadata field '{field}'."
                )

        slm = SimulatedSLM(
            resolution=np.flip(meta["slm"]["shape"]),
            pitch_um=meta["slm"]["pitch_um"],
        )
        cam = SimulatedCamera(
            slm=slm,
            resolution=np.flip(meta["cam"]["shape"]),
            bitdepth=meta["cam"]["bitdepth"],
            pitch_um=meta["cam"]["pitch_um"],
            name=meta["cam"]["name"],
        )
        fs = FourierSLM(cam, slm, mag=meta["mag"])
        fs.name = meta["name"]
        return fs

    # ------------------------------------------------------------------
    # Calibration bookkeeping (ref :341-461).
    # ------------------------------------------------------------------

    def name_calibration(self, calibration_type):
        """``"{name}-{type}-calibration"``."""
        return f"{self.name}-{calibration_type}-calibration"

    def save_calibration(self, calibration_type, path=".", name=None):
        """Save one calibration dict to ``path/name_#####.h5``; returns the path."""
        if calibration_type not in self.calibrations:
            raise ValueError(
                f"Could not find calibration '{calibration_type}'. Options: "
                + str(list(self.calibrations.keys()))
            )
        if name is None:
            name = self.name_calibration(calibration_type)
        file_path = generate_path(path, name, extension="h5")
        save_h5(file_path, self.calibrations[calibration_type])
        return file_path

    def load_calibration(self, calibration_type, file_path=None):
        """Load a calibration (defaults to the latest autosaved); returns the path."""
        if file_path is None:
            path = os.path.abspath(".")
            if len(calibration_type) > 4 and calibration_type.endswith(".h5"):
                file_path = calibration_type
                split = file_path.split("-")
                if len(split) > 3 and "calibration_" in split[-1]:
                    calibration_type = split[-2]
                else:
                    raise ValueError(f"Could not parse calibration type from '{file_path}'.")
            else:
                name = self.name_calibration(calibration_type)
                file_path = latest_path(path, name, extension="h5")
            if file_path is None:
                raise FileNotFoundError(
                    f"Unable to find a calibration file like\n{os.path.join(path, name)}"
                )

        self.calibrations[calibration_type] = cal = load_h5(file_path)
        cal_ver = cal.get("__version__", "an unknown version")
        if cal_ver != __version__:
            warnings.warn(
                f"You are using slmsuite-tpu {__version__}, but the calibration "
                f"in '{file_path}' was created in {cal_ver}."
            )
        return file_path

    def write_calibration(self, calibration_type, path, name):
        """Backwards-compatible alias for :meth:`save_calibration`."""
        warnings.warn("write_calibration is deprecated; use save_calibration.")
        self.save_calibration(calibration_type, path, name)

    def read_calibration(self, calibration_type, file_path=None):
        """Backwards-compatible alias for :meth:`load_calibration`."""
        warnings.warn("read_calibration is deprecated; use load_calibration.")
        self.load_calibration(calibration_type, file_path)

    def _get_calibration_metadata(self):
        return self.pickle(attributes=False, metadata=True)

    # ------------------------------------------------------------------
    # Settle calibration (ref :468-625).
    # ------------------------------------------------------------------

    def settle_calibrate(self, vector=(0.005, 0.005), size=None, times=None, settle_time_s=1):
        r"""
        Measure the SLM's temporal response: toggle a blaze on/off and
        integrate the 1st-order spot at increasing delays after the write.
        """
        point = self.kxyslm_to_ijcam(vector)
        pattern = blaze(grid=self.slm, vector=vector)

        if size is None:
            size = 16 * toolbox.convert_radius(
                self.slm.get_spot_radius_kxy(), to_units="ij", hardware=self
            )
        size = int(size)

        if times is None:
            times = 21
        if np.isscalar(times):
            times = np.linspace(0, 1, int(times), endpoint=True)
        times = np.ravel(times)

        if settle_time_s is None:
            settle_time_s = self.slm.settle_time_s
        settle_time_s = float(settle_time_s)

        results = []
        for t in tqdm(times):
            self.cam.flush()
            self.slm.set_phase(None, settle=False, phase_correct=False)
            time.sleep(settle_time_s)
            self.slm.set_phase(pattern, settle=False, phase_correct=False)
            time.sleep(t)
            image = self.cam.get_image()
            results.append(
                analysis.take(image, point, size, centered=True, integrate=True)
            )

        self.calibrations["settle"] = {"times": times, "data": np.array(results)}
        self.calibrations["settle"].update(self._get_calibration_metadata())
        self.settle_calibration_process(plot=False)
        return self.calibrations["settle"]

    def settle_calibration_process(self, plot=True):
        r"""
        Fit a step + exponential to the settle data; suggested settle time is
        communication time + 4x the 1/e relaxation time.
        """
        times = np.asarray(self.calibrations["settle"]["times"])
        results = np.squeeze(np.asarray(self.calibrations["settle"]["data"]))

        def exponential_jump(x, x0, a, b, c):
            return (c - a * np.exp(-(x - x0) / b)) * np.heaviside(x - x0, 0)

        guess = (np.max(times) / 2, np.max(results), np.max(times), np.max(results))
        params, _ = optimize.curve_fit(
            exponential_jump, times, results, p0=guess, maxfev=10000
        )
        x0, a, b, c = params

        processed = {
            "settle_time": x0 + 4 * b,
            "relax_time": b,
            "communication_time": x0,
        }
        self.calibrations["settle"].update(processed)

        if plot:
            import matplotlib.pyplot as plt

            x_interp = np.linspace(times.min(), times.max(), 100)
            plt.plot(times, results, "k.", label="data")
            plt.plot(x_interp, exponential_jump(x_interp, *params), "r--", label="fit")
            plt.xlabel("Time [sec]")
            plt.ylabel("Signal [a.u.]")
            plt.title(
                f"Communication: {1e3 * processed['communication_time']:.0f} ms; "
                f"1/e relax: {1e3 * processed['relax_time']:.0f} ms; "
                f"suggested settle: {1e3 * processed['settle_time']:.0f} ms"
            )
            plt.legend()
            plt.show()

        return processed

    # ------------------------------------------------------------------
    # Pixel calibration (ref :626-898).
    # ------------------------------------------------------------------

    def pixel_calibrate(self, levels=2, periods=2, orders=3, window=None, field_period=10):
        r"""
        Measure pixel crosstalk / phase response via binary gratings:
        sweep {direction, period, level a, level b} writing raw integer
        gratings (bypassing phase2gray), integrating every diffraction
        order into a ``(2, P, N, N, M)`` array. **(Experimental; the
        fitting step is future work, as in the reference.)**
        """
        # Parse levels.
        if np.isscalar(levels):
            if levels < 1:
                levels = 1
            levels = 2 ** (np.ceil(np.log2(levels)))
            if levels > self.slm.bitresolution:
                warnings.warn("Requested more levels than available. Rounding down.")
                levels = self.slm.bitresolution
            levels = np.arange(levels) * (self.slm.bitresolution / levels)
        levels = np.mod(levels, self.slm.bitresolution).astype(self.slm.display.dtype)
        N = len(levels)

        if np.isscalar(periods):
            raise NotImplementedError("Pass an explicit list of even periods.")
        periods = 2 * (np.array(periods).astype(int) // 2)
        P = len(periods)
        if len(np.unique(periods)) != len(periods):
            raise RuntimeError(f"Repeated periods in {periods}")
        if np.any(periods <= 0):
            raise ValueError("period should not be negative.")

        if np.isscalar(orders):
            orders = np.arange(-int(orders), int(orders) + 1)
        orders = np.asarray(orders).astype(int)
        M = len(orders)
        if 1 not in orders:
            raise ValueError("1st order must be included.")

        data = np.zeros((2, P, N, N, M))

        # Grating vectors along x then y.
        vectors_freq = np.zeros((2, 2 * P))
        vectors_freq[0, :P] = vectors_freq[1, P:] = np.reciprocal(periods.astype(float))
        vectors_kxy = toolbox.convert_vector(vectors_freq, "freq", "norm", hardware=self)

        field_freq = np.zeros((2, 2))
        field_freq[0, 0] = field_freq[1, 1] = 1 / float(field_period)
        field_kxy = toolbox.convert_vector(field_freq, "freq", "norm", hardware=self)
        field_hi, field_lo = np.array(
            [self.slm.bitresolution / 2, 0]
        ).astype(self.slm.display.dtype)
        field_ij = toolbox.convert_vector(field_freq, "freq", "ij", hardware=self)

        vectors_ij = self.kxyslm_to_ijcam(vectors_kxy)
        center = self.kxyslm_to_ijcam((0, 0))
        dorder = vectors_ij - center
        dfield = field_ij - center
        order_ij = [center + orders * dorder[:, [i]] for i in range(2 * P)]

        integration_size = int(
            np.ceil(np.min([np.min(np.max(dorder, axis=1)), np.min(np.max(dfield, axis=1))]))
        )

        progress = tqdm(range(2 * P * N * N))
        for i in (0, 1):
            prange = np.arange(P) + i * P
            for j in range(P):
                for k in range(N):
                    for l in range(N):
                        if window is None:
                            phase = binary(
                                self.slm,
                                vector=vectors_kxy[:, prange[j]],
                                a=levels[k],
                                b=levels[l],
                            )
                        else:
                            phase = binary(
                                grid=self.slm,
                                vector=field_kxy[:, i],
                                a=field_hi,
                                b=field_lo,
                            )
                            toolbox.imprint(
                                phase,
                                window=window,
                                function=binary,
                                grid=self.slm,
                                vector=vectors_kxy[:, prange[j]],
                                a=levels[k],
                                b=levels[l],
                            )

                        # Raw integer write bypasses phase2gray.
                        self.slm.set_phase(
                            phase.astype(self.slm.display.dtype),
                            phase_correct=False,
                            settle=True,
                        )
                        data[i, j, k, l, :] = analysis.take(
                            images=self.cam.get_image(),
                            vectors=order_ij[prange[j]],
                            size=integration_size,
                            integrate=True,
                        ).astype(float)
                        progress.update()
        progress.close()

        self.calibrations["pixel"] = {
            "levels": levels,
            "periods": periods,
            "orders": orders,
            "data": data,
        }
        self.calibrations["pixel"].update(self._get_calibration_metadata())
        return self.calibrations["pixel"]

    def pixel_calibration_process(self, plot=True):
        """Debug plots of the raw pixel-calibration data (fitting is future work)."""
        cal = self.calibrations["pixel"]
        if plot:
            import matplotlib.pyplot as plt

            data = np.asarray(cal["data"])
            order_index = int(np.where(np.asarray(cal["orders"]) == 1)[0][0])
            fig, axs = plt.subplots(
                2, len(cal["periods"]), figsize=(4 * len(cal["periods"]), 8)
            )
            axs = np.atleast_2d(axs)
            for i in (0, 1):
                for j in range(len(cal["periods"])):
                    axs[i, j].imshow(data[i, j, :, :, order_index])
                    axs[i, j].set_title(
                        f"{'x' if i == 0 else 'y'} period {cal['periods'][j]}"
                    )
            plt.show()
        return cal

    # ------------------------------------------------------------------
    # Fourier calibration (ref :931-1221).
    # ------------------------------------------------------------------

    def fourier_calibrate(
        self,
        array_shape=10,
        array_pitch=10,
        array_center=None,
        plot=False,
        autofocus=False,
        autoexposure=False,
        **kwargs,
    ):
        """
        Calibrate the kxy -> ij affine transform: project a WGS spot grid
        (``"knm"`` units, with the two-missing-spot orientation check),
        detect it with :meth:`analysis.blob_array_detect`, and scale the
        array-index affine into k-space.
        """
        if isinstance(array_shape, REAL_TYPES):
            array_shape = [int(array_shape), int(array_shape)]
        if isinstance(array_pitch, REAL_TYPES):
            array_pitch = [array_pitch, array_pitch]
        if np.any(np.array(array_pitch) <= 0):
            raise ValueError("array_pitch must be positive.")

        try:
            hologram = self.fourier_grid_project(
                array_shape=array_shape,
                array_pitch=array_pitch,
                array_center=array_center,
                **kwargs,
            )
        except Exception as e:
            warnings.warn(
                "fourier_calibrate failed during array holography. Try reducing "
                "array_pitch/array_shape or checking SLM parameters."
            )
            raise e

        # True projected center (rounding compensation; skip the first two
        # points to balance the parity-check omission of the last two).
        array_center = np.mean(hologram.spot_kxy_rounded[:, 2:], axis=1)

        if plot > 1:
            hologram.plot_farfield()
            hologram.plot_nearfield()

        self.cam.flush()

        if autofocus or isinstance(autofocus, dict):
            if autoexposure or isinstance(autoexposure, dict):
                self.cam.autoexposure(**(autoexposure if isinstance(autoexposure, dict) else {}))
            self.cam.autofocus(plot=plot, **(autofocus if isinstance(autofocus, dict) else {}))

        if autoexposure or isinstance(autoexposure, dict):
            self.cam.autoexposure(**(autoexposure if isinstance(autoexposure, dict) else {}))

        img = self.cam.get_image()

        try:
            orientation = analysis.blob_array_detect(img, array_shape, plot=plot)
        except Exception as e:
            warnings.warn("fourier_calibrate failed during array detection and fitting.")
            raise e

        a = format_2vectors(array_center)
        M = np.array(orientation["M"])
        b = format_2vectors(orientation["b"])

        # Scale the array-index affine into kxy.
        scaling = (
            self.slm.pitch * np.flip(np.squeeze(hologram.shape)) / np.squeeze(array_pitch)
        )
        M = np.array(
            [
                [M[0, 0] * scaling[0], M[0, 1] * scaling[1]],
                [M[1, 0] * scaling[0], M[1, 1] * scaling[1]],
            ]
        )

        self.calibrations["fourier"] = {"M": M, "b": b, "a": a}
        self.calibrations["fourier"].update(self._get_calibration_metadata())
        return self.calibrations["fourier"]

    def fourier_grid_project(self, array_shape=10, array_pitch=10, array_center=None, **kwargs):
        """
        Optimize and project the calibration spot grid; returns the
        :class:`SpotHologram`.
        """
        if not np.all(np.isclose(array_pitch, np.rint(array_pitch))):
            warnings.warn("array_pitch is non-integer")

        shape = SpotHologram.get_padded_shape(self, padding_order=1, square_padding=True)
        hologram = SpotHologram.make_rectangular_array(
            shape,
            array_shape=array_shape,
            array_pitch=array_pitch,
            array_center=(
                None
                if array_center is None
                else format_2vectors(array_center)
                + format_2vectors((shape[1] / 2.0, shape[0] / 2.0))
            ),
            basis="knm",
            orientation_check=True,
            cameraslm=self,
        )

        kwargs.setdefault("maxiter", 10)
        for key in kwargs:
            if key not in [
                "method", "maxiter", "verbose", "callback", "feedback",
                "stat_groups", "name", "fixed_phase", "raw_stats", "blur_ij",
            ]:
                warnings.warn(f"Unexpected argument '{key}' passed to fourier_grid_project().")

        hologram.optimize(**kwargs)
        self.slm.set_phase(hologram.get_phase(), settle=True)
        return hologram

    def fourier_calibrate_analytic(self, M, b):
        """Set the Fourier calibration directly from a known affine."""
        M = np.squeeze(M)
        if np.any(np.array(M.shape) != (2, 2)):
            raise ValueError("Expected a 2x2 matrix for M.")
        self.calibrations["fourier"] = {
            "M": M,
            "b": format_2vectors(b),
            "a": format_2vectors([0, 0]),
        }
        self.calibrations["fourier"].update(self._get_calibration_metadata())

        if hasattr(self.cam, "set_affine") and not hasattr(self.cam, "M"):
            self.cam.set_affine(M, format_2vectors(b))
        return self.calibrations["fourier"]

    def fourier_calibration_build(self, f_eff, units="norm", theta=0, shear_angle=0, offset=None):
        """Build an analytic ``(M, b)`` from physical train parameters."""
        if offset is None:
            offset = np.flip(self.cam.shape) / 2
        return SimulatedCamera._build_affine(
            f_eff,
            units=units,
            theta=theta,
            shear_angle=shear_angle,
            offset=offset,
            cam_pitch_um=self.cam.pitch_um,
            wav_um=self.slm.wav_um,
        )

    # ------------------------------------------------------------------
    # kxy <-> ij transforms (ref :1222-1381).
    # ------------------------------------------------------------------

    def _kxyslm_to_ijcam_depth(self, kxy_depth):
        """Focal power -> camera-plane depth (pixels)."""
        f_eff = np.mean(self.get_effective_focal_length("norm"))
        cam_pitch_um = np.nan if self.cam.pitch_um is None else np.mean(self.cam.pitch_um)
        return kxy_depth * (self.slm.wav_um * f_eff * f_eff / cam_pitch_um)

    def _ijcam_to_kxyslm_depth(self, ij_depth):
        """Camera-plane depth (pixels) -> focal power."""
        f_eff = np.mean(self.get_effective_focal_length("norm"))
        cam_pitch_um = np.nan if self.cam.pitch_um is None else np.mean(self.cam.pitch_um)
        return ij_depth * (cam_pitch_um / (self.slm.wav_um * f_eff * f_eff))

    def kxyslm_to_ijcam(self, kxy):
        r"""
        kxy -> camera pixels: :math:`\vec{y} = M(\vec{x} - \vec{a}) + \vec{b}`
        (3D depth handled via the effective-focal-length relation).
        """
        if "fourier" not in self.calibrations:
            raise RuntimeError("Fourier calibration must exist to be used.")
        self._check_fourier_calibration_stale()

        kxy = format_vectors(kxy, handle_dimension="pass")
        ij = (
            self.calibrations["fourier"]["M"]
            @ (kxy[:2, :] - self.calibrations["fourier"]["a"])
            + self.calibrations["fourier"]["b"]
        )
        if kxy.shape[0] == 3:
            return np.vstack((ij, self._kxyslm_to_ijcam_depth(kxy[[2], :])))
        return ij

    def ijcam_to_kxyslm(self, ij):
        r"""
        Camera pixels -> kxy:
        :math:`\vec{x} = M^{-1}(\vec{y} - \vec{b}) + \vec{a}`.
        """
        if "fourier" not in self.calibrations:
            raise RuntimeError("Fourier calibration must exist to be used.")
        self._check_fourier_calibration_stale()

        ij = format_vectors(ij, handle_dimension="pass")
        kxy = (
            np.linalg.inv(self.calibrations["fourier"]["M"])
            @ (ij[:2, :] - self.calibrations["fourier"]["b"])
            + self.calibrations["fourier"]["a"]
        )
        if ij.shape[0] == 3:
            return np.vstack((kxy, self._ijcam_to_kxyslm_depth(ij[[2], :])))
        return kxy

    def _check_fourier_calibration_stale(self):
        """Warn if the wavefront calibration is newer than the Fourier one."""
        try:
            cals = self.calibrations
            if "wavefront_superpixel" in cals and "fourier" in cals:
                if (
                    cals["wavefront_superpixel"]["__timestamp__"]
                    > cals["fourier"]["__timestamp__"]
                ):
                    warnings.warn(
                        "The wavefront calibration is newer than the Fourier "
                        "calibration. The Fourier calibration may be stale."
                    )
        except Exception:
            pass

    # ------------------------------------------------------------------
    # Derived optics (ref :1383-1487).
    # ------------------------------------------------------------------

    def get_farfield_spot_size(self, slm_size=None, basis="kxy"):
        """
        Diffraction-limited farfield spot size for a blazed SLM patch of
        ``slm_size`` (defaults to the measured source extent).
        """
        if slm_size is None:
            psf_kxy = self.slm.get_spot_radius_kxy()
            slm_size = (1 / psf_kxy, 1 / psf_kxy)
        elif isinstance(slm_size, REAL_TYPES):
            slm_size = (slm_size, slm_size)

        if basis == "kxy":
            return (1 / slm_size[0], 1 / slm_size[1])
        if basis == "ij":
            M = self.calibrations["fourier"]["M"]
            size_kxy = np.linalg.inv(M / np.sqrt(np.abs(np.linalg.det(M)))) @ np.array(
                (1 / slm_size[0], 1 / slm_size[1])
            )
            return np.abs(self.kxyslm_to_ijcam([0, 0]) - self.kxyslm_to_ijcam(size_kxy))
        raise ValueError(f'Unrecognized basis "{basis}".')

    def get_effective_focal_length(self, units="norm"):
        """
        Scalar effective focal length from the Fourier calibration:
        ``sqrt(|det M|)``, converted to ``units`` ("ij", "norm", or metric).
        """
        if "fourier" not in self.calibrations:
            raise RuntimeError("Fourier calibration must exist to be used.")

        f_eff = np.sqrt(np.abs(np.linalg.det(self.calibrations["fourier"]["M"])))

        if units != "ij" and self.cam.pitch_um is None:
            warnings.warn(f"cam.pitch_um must be set to use units '{units}'")
            return np.nan

        if units == "ij":
            pass
        elif units == "norm":
            f_eff = f_eff * np.array(self.cam.pitch_um) / self.slm.wav_um
        elif units in toolbox.LENGTH_FACTORS:
            f_eff = f_eff * np.array(self.cam.pitch_um) / toolbox.LENGTH_FACTORS[units]
        else:
            raise ValueError(f"Unit '{units}' not recognized as a length.")
        return f_eff

    # ------------------------------------------------------------------
    # Wavefront calibration (ref :1488-3983).
    # ------------------------------------------------------------------

    def wavefront_calibrate(self, *args, method=None, **kwargs):
        """
        Dispatch to :meth:`wavefront_calibrate_superpixel` (default) or
        :meth:`wavefront_calibrate_zernike`.
        """
        if method is None:
            method = "superpixel"
        if method == "superpixel":
            for deprecated in ("interference_point", "calibration_point"):
                if deprecated in kwargs:
                    warnings.warn(f"'{deprecated}' is deprecated; use 'calibration_points'.")
                    kwargs["calibration_points"] = kwargs.pop(deprecated)
            return self.wavefront_calibrate_superpixel(*args, **kwargs)
        if method == "zernike":
            return self.wavefront_calibrate_zernike(*args, **kwargs)
        raise ValueError(f"Wavefront calibration method '{method}' not recognized.")
