r"""
DFT-based phase retrieval: the :class:`Hologram` class.

TPU-native redesign of the reference's ``Hologram``
(``slmsuite/holography/algorithms/_hologram.py``): the NumPy/CuPy backend
switch, in-place ``out=`` arithmetic, and torch interop are replaced by

- a pure scanned step function (:mod:`slmsuite_tpu.ops.engine`) jitted
  with donated buffers for the fully-computational fast path,
- jitted forward/backward halves for host-in-the-loop (camera feedback,
  callbacks) optimization,
- ``jax.grad`` + optax for conjugate-gradient optimization (replacing
  the torch autograd path, ``_hologram.py:1664-1740``).

The nearfield phase is carried in the *folded* (checkerboard) basis so the
GS loop runs shift-free (see :mod:`slmsuite_tpu.ops.propagation`); all
user-facing accessors unfold transparently.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
from tqdm.auto import tqdm

from slmsuite_tpu.holography import analysis
from slmsuite_tpu.holography.algorithms._header import (
    ALGORITHM_DEFAULTS,
    FEEDBACK_OPTIONS,
)
from slmsuite_tpu.holography.algorithms._stats import _HologramStats
from slmsuite_tpu.holography.toolbox import phase as tphase
from slmsuite_tpu.misc.math import REAL_TYPES
from slmsuite_tpu.ops import engine as _engine
from slmsuite_tpu.ops import propagation as _prop
from slmsuite_tpu.ops.weights import update_weights_generic


import functools as _functools


class ComplexMSELoss:
    """Mean-squared error between the *normalized amplitude* of a complex
    farfield and a real target, for :meth:`Hologram.optimize` CG mode
    (``loss=ComplexMSELoss()``). jax-native equivalent of the reference's
    torch loss (``_hologram.py:6-14``): the farfield amplitude is
    unit-power-normalized before comparison, so the loss is insensitive
    to overall gain.
    """

    def __init__(self, reduction="mean"):
        if reduction not in ("mean", "sum"):
            raise ValueError(f"Unsupported reduction '{reduction}'.")
        self.reduction = reduction

    def __call__(self, farfield, target):
        amp = jnp.abs(farfield)
        amp = amp / jnp.sqrt(jnp.sum(jnp.square(amp)))
        sq = jnp.square(amp - jnp.nan_to_num(target))
        return jnp.mean(sq) if self.reduction == "mean" else jnp.sum(sq)


class MaxUniformLoss:
    """Maximize total farfield power while penalizing amplitude spread:
    ``-sum(|F|^2) + 10 * std(|F|)`` (reference ``_hologram.py:16-23``).
    The target is ignored; use with CG mode for uniformity-driven
    optimization."""

    def __call__(self, farfield, target):
        amp = jnp.abs(farfield)
        # torch.std defaults to the Bessel-corrected (ddof=1) estimator.
        return -jnp.sum(jnp.square(amp)) + 10.0 * jnp.std(amp, ddof=1)


@_functools.lru_cache(maxsize=32)
def _stepwise_backward(config):
    """
    Cached jitted constraint+backward for the host-in-the-loop path:
    ``(farfield, weights, phase_ff, consts) -> psi``.
    """

    def backward(farfield, weights, phase_ff, consts):
        kernel = consts.get("kernel") if config.has_kernel else None
        constrained = weights * jnp.exp(1j * phase_ff)
        if config.mraf:
            constrained = jnp.where(consts["signal_mask"], constrained, farfield)
            if config.mraf_factor:
                constrained = jnp.where(
                    consts["noise_mask"],
                    consts["mraf_factor"] * constrained,
                    constrained,
                )
            constrained = jnp.where(consts["zero_mask"], 0.0, constrained)
        new_nearfield = _prop.farfield_to_nearfield(constrained)
        return _prop.extract_folded_phase(
            new_nearfield, tuple(config.slm_shape), kernel
        )

    return jax.jit(backward)


class Hologram(_HologramStats):
    r"""
    Core DFT phase retrieval.

    Attributes
    ----------
    slm_shape : (int, int)
        Shape of the nearfield device (numpy ``(h, w)``).
    shape : (int, int)
        Shape of the computational farfield (padded; powers of 2 advised).
    phase : numpy.ndarray
        Nearfield phase (radians), shape :attr:`slm_shape`.
    amp : float OR numpy.ndarray
        Nearfield amplitude (normalized).
    target, weights : numpy.ndarray
        Farfield target amplitude (nan marks MRAF noise regions) and the
        current optimization weights, shape :attr:`shape`.
    amp_ff, phase_ff : numpy.ndarray OR None
        Current farfield amplitude/phase.
    flags : dict
        Persistent optimization flags (see :meth:`optimize`).
    stats : dict
        Per-iteration statistics in the reference schema.
    """

    def __init__(
        self,
        target,
        amp=None,
        phase=None,
        slm_shape=None,
        dtype=np.float32,
        propagation_kernel=None,
        **kwargs,
    ):
        """
        Initialize the hologram. Parity: reference ``_hologram.py:196-439``.

        Parameters
        ----------
        target : array_like OR (int, int) OR None
            Target farfield **amplitude** (or a shape for an empty target).
        amp : array_like OR None
            Nearfield amplitude (normalized internally); uniform if ``None``.
        phase : array_like OR None
            Initial nearfield phase (random if ``None``).
        slm_shape : (int, int) OR SLM OR FourierSLM OR None
            Nearfield shape (or hardware to infer it, along with ``amp``).
        dtype : type
            float32 (default) or float64.
        propagation_kernel : array_like OR None
            Nearfield phase kernel baked into propagation (multiplane /
            aberration-space holograms).
        **kwargs :
            Initial :attr:`flags`.
        """
        # Infer slm_shape from hardware-like objects.
        amp_from_slm = None
        if slm_shape is not None and hasattr(slm_shape, "slm"):
            slm_shape = slm_shape.slm
        if slm_shape is not None and hasattr(slm_shape, "shape") and hasattr(slm_shape, "grid"):
            slm_obj = slm_shape
            slm_shape = tuple(slm_obj.shape)
            source_amp = slm_obj.source.get("amplitude", None) if hasattr(slm_obj, "source") else None
            if amp is None and source_amp is not None:
                amp_from_slm = np.asarray(source_amp)
        elif slm_shape is not None:
            slm_shape = tuple(int(v) for v in np.ravel(slm_shape))

        if amp is None and amp_from_slm is not None:
            amp = amp_from_slm

        # Resolve shapes.
        candidates = []
        if amp is not None and not np.isscalar(amp):
            candidates.append(tuple(np.shape(amp)))
        if phase is not None:
            candidates.append(tuple(np.shape(phase)))
        if slm_shape is not None:
            candidates.append(tuple(slm_shape))
        if candidates:
            if len(set(candidates)) > 1:
                raise ValueError(
                    f"Inconsistent shapes among amp/phase/slm_shape: {candidates}"
                )
            self.slm_shape = candidates[0]
        else:
            self.slm_shape = None

        # Parse target into the computational shape.
        if target is None:
            if self.slm_shape is None:
                raise ValueError("SLM shape must be provided when target is None.")
            self.shape = tuple(self.slm_shape)
            target_array = None
            self._has_target = False
        elif np.ndim(target) <= 1 and len(target) == 2:
            self.shape = tuple(int(v) for v in target)
            target_array = None
            self._has_target = True
        elif np.ndim(target) == 2:
            self.shape = tuple(np.shape(target))
            target_array = target
            self._has_target = True
        else:
            raise ValueError(f"Unexpected target {np.shape(target)}.")

        if self._has_target and not hasattr(self, "holograms"):
            from slmsuite_tpu.ops.fft import _matmul_shape

            # Balanced-splittable shapes (1536, 1920, 3072, ...) ride
            # the four-step matmul fast path; only genuinely unbalanced
            # sizes drop to the slower XLA FFT and deserve a warning.
            if not _matmul_shape(tuple(self.shape)):
                warnings.warn(
                    f"Hologram target shape {self.shape} has no balanced "
                    "FFT factorization (slower XLA-FFT path); consider "
                    "using .get_padded_shape() for faster FFTs."
                )

        if self.slm_shape is None:
            self.slm_shape = self.shape

        # Data types.
        if np.dtype(dtype).itemsize == 4:
            self.dtype = np.float32
            self.dtype_complex = np.complex64
        elif np.dtype(dtype).itemsize == 8:
            self.dtype = np.float64
            self.dtype_complex = np.complex128
        else:
            raise ValueError(f"Data type {dtype} not supported.")

        # Nearfield amplitude (normalized).
        if amp is None:
            self.amp = 1 / np.sqrt(np.prod(self.slm_shape))
        else:
            amp = np.asarray(amp, dtype=self.dtype)
            self.amp = amp / Hologram._norm(amp)

        # Propagation kernel.
        if propagation_kernel is None or isinstance(propagation_kernel, REAL_TYPES):
            self.propagation_kernel = None
        else:
            self.propagation_kernel = np.asarray(propagation_kernel, dtype=self.dtype)
            if self.propagation_kernel.shape != tuple(self.slm_shape):
                raise ValueError("propagation_kernel must match slm_shape.")

        self.flags = dict(kwargs)

        # Target, phase, and the rest of the state.
        self.target = None
        self._set_target(target_array, reset_weights=False)

        self._psi = None  # folded nearfield phase
        self.reset_phase(phase)
        self.reset(reset_phase=False, reset_flags=False)

    # ------------------------------------------------------------------
    # Phase fold bookkeeping — dual-store device/host arrays.
    #
    # The stepwise (host-in-the-loop) path runs one jitted call per
    # half-iteration with host code between them; over a tunneled device
    # a full-plane download costs more than the compute, so the three
    # per-iteration planes (``_psi``, ``amp_ff``, ``_phase_ff_folded``)
    # each keep a device-resident copy and materialize the host numpy
    # view lazily on first read. Writes accept either kind. A device
    # copy is trusted only while the host view has never been
    # materialized (so it cannot have been mutated behind our back).
    # ------------------------------------------------------------------

    _psi_host = None
    _psi_dev = None
    _amp_ff_host = None
    _amp_ff_dev = None
    _pff_host = None
    _pff_dev = None
    _weights_host = None
    _weights_dev = None

    @staticmethod
    def _is_device(value):
        return isinstance(value, jax.Array)

    @property
    def weights(self):
        """Optimization weights (host view; see dual-store note)."""
        if self._weights_host is None and self._weights_dev is not None:
            self._weights_host = np.asarray(self._weights_dev)
        return self._weights_host

    @weights.setter
    def weights(self, value):
        if value is None:
            self._weights_host = self._weights_dev = None
        elif self._is_device(value):
            self._weights_host = None
            self._weights_dev = value
        else:
            self._weights_host = np.asarray(value)
            self._weights_dev = None

    def _weights_device(self):
        """Weights as a device float32 array (no upload when resident),
        nan-guarded on BOTH paths like the reference's ``cp.nan_to_num``
        on reset — nan target entries seed nan weights, and a device-side
        nan fed into the multiplicative WGS update poisons every weight.
        The device-path guard also returns a FRESH buffer, so donating
        callers never consume the stored ``_weights_dev``."""
        if self._weights_dev is not None and self._weights_host is None:
            return jnp.nan_to_num(
                jnp.asarray(self._weights_dev, dtype=jnp.float32)
            )
        return jnp.asarray(
            np.nan_to_num(np.asarray(self.weights, dtype=np.float32))
        )

    @staticmethod
    def _host_fingerprint(host):
        """Cheap content fingerprint of a host array: shape + the exact
        bytes of <= 1024 strided samples. Catches in-place mutation
        (``holo.target[...] = new`` — a standard feedback-loop workflow
        in the reference) that an identity check alone would miss; a
        mutation confined to non-sampled positions of a > 1024-element
        array can still slip through, so prefer reassigning attributes
        over partial in-place writes."""
        if not isinstance(host, np.ndarray):
            return None  # device arrays are immutable; identity suffices
        flat = host.reshape(-1)
        step = max(1, flat.size // 1024)
        return (host.shape, flat[::step].tobytes())

    def _dev_const(self, key, host, make):
        """Device copy of a (possibly large) host constant, reused
        across calls while the host array is unchanged (identity +
        strided content fingerprint) — re-uploading the target/masks/
        amplitude planes dominates the per-call cost of ``optimize()``
        over a remote-attached device otherwise."""
        if not hasattr(self, "_dev_cache"):
            self._dev_cache = {}
        fp = self._host_fingerprint(host)
        cached = self._dev_cache.get(key)
        if cached is not None and cached[0] is host and cached[1] == fp:
            return cached[2]
        dev = make(host)
        # Hold the host reference so the identity check stays valid.
        self._dev_cache[key] = (host, fp, dev)
        return dev

    @property
    def _psi(self):
        """Folded nearfield phase (host view; see dual-store note)."""
        if self._psi_host is None and self._psi_dev is not None:
            self._psi_host = np.asarray(self._psi_dev, dtype=self.dtype)
        return self._psi_host

    @_psi.setter
    def _psi(self, value):
        if value is None:
            self._psi_host = self._psi_dev = None
        elif self._is_device(value):
            self._psi_host = None
            self._psi_dev = value
        else:
            self._psi_host = np.asarray(value, dtype=self.dtype)
            self._psi_dev = None

    def _psi_device(self, for_donation=False):
        """Folded psi as a device float32 array (no copy when resident).

        ``for_donation=True``: the caller hands the result to a
        ``donate_argnums`` call — return a private on-device copy of a
        resident buffer (an HBM-to-HBM copy, microseconds) so a run
        that raises mid-way (interrupt, checkify error, OOM) cannot
        leave ``self._psi_dev`` pointing at a deleted buffer."""
        if self._psi_dev is not None and self._psi_host is None:
            return self._psi_dev.copy() if for_donation else self._psi_dev
        return jnp.asarray(self._psi, dtype=jnp.float32)

    @property
    def amp_ff(self):
        """Farfield amplitude (host view; see dual-store note)."""
        if self._amp_ff_host is None and self._amp_ff_dev is not None:
            self._amp_ff_host = np.asarray(self._amp_ff_dev)
        return self._amp_ff_host

    @amp_ff.setter
    def amp_ff(self, value):
        if value is None:
            self._amp_ff_host = self._amp_ff_dev = None
        elif self._is_device(value):
            self._amp_ff_host = None
            self._amp_ff_dev = value
        else:
            self._amp_ff_host = np.asarray(value)
            self._amp_ff_dev = None

    def _amp_ff_device(self):
        if self._amp_ff_dev is not None and self._amp_ff_host is None:
            return self._amp_ff_dev
        return jnp.asarray(self.amp_ff, dtype=jnp.float32)

    @property
    def _phase_ff_folded(self):
        """Folded farfield phase (host view; see dual-store note)."""
        if self._pff_host is None and self._pff_dev is not None:
            self._pff_host = np.asarray(self._pff_dev)
        return self._pff_host

    @_phase_ff_folded.setter
    def _phase_ff_folded(self, value):
        if value is None:
            self._pff_host = self._pff_dev = None
        elif self._is_device(value):
            self._pff_host = None
            self._pff_dev = value
        else:
            self._pff_host = np.asarray(value)
            self._pff_dev = None

    def _phase_ff_folded_device(self, for_donation=False):
        """``for_donation``: see :meth:`_psi_device`."""
        if self._pff_dev is not None and self._pff_host is None:
            return self._pff_dev.copy() if for_donation else self._pff_dev
        return jnp.asarray(self._phase_ff_folded, dtype=jnp.float32)

    def _has_phase_ff(self):
        """True when a stored farfield phase exists (without forcing the
        device copy to materialize on host)."""
        return self._pff_dev is not None or self._pff_host is not None

    def _has_amp_ff(self):
        """True when a farfield amplitude exists (no host materialization)."""
        return self._amp_ff_dev is not None or self._amp_ff_host is not None

    @property
    def phase(self):
        """Nearfield phase in the user (unfolded) convention."""
        if self._psi is None:
            return None
        return _prop.unfold_phase(self._psi, self.shape)

    @phase.setter
    def phase(self, value):
        if value is None:
            self._psi = None
        else:
            self._psi = _prop.fold_phase(
                np.asarray(value, dtype=self.dtype), self.shape
            )

    def _unfold_ff_phase(self, theta_folded):
        """Folded-layout farfield phase -> true centered farfield phase."""
        H, W = self.shape
        iy, ix = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        offset = np.pi * ((iy + ix) % 2)
        if _prop.farfield_sign(self.shape) < 0:
            offset = offset + np.pi
        return np.mod(theta_folded + offset + np.pi, 2 * np.pi) - np.pi

    # ------------------------------------------------------------------
    # Reset / target management (ref :442-614, :760-787).
    # ------------------------------------------------------------------

    def reset(self, reset_phase=True, reset_flags=False):
        """Reset the hologram to an initial state (ref ``:442-500``)."""
        if self._psi is None or reset_phase:
            self.reset_phase()
        self.reset_weights()

        self.iter = 0
        self.stats = {"method": [], "flags": {}, "stats": {}}
        if reset_flags:
            self.flags = {"method": ""}

        self.amp_ff = None
        self._phase_ff_folded = None
        self._farfield_folded = None
        self._final_fixed_phase = False

    def reset_phase(self, custom_phase=None, random_phase=None, quadratic_phase=None):
        r"""
        Reset :attr:`phase` to ``custom_phase``, or to (scaled) random phase
        plus an optional analytic quadratic precondition (ref ``:536-601``).
        """
        if custom_phase is not None:
            custom_phase = np.asarray(custom_phase, dtype=self.dtype)
            if tuple(custom_phase.shape) != tuple(self.slm_shape):
                raise ValueError(
                    f"Reset phase of shape {custom_phase.shape} is not slm_shape {self.slm_shape}"
                )
            self.phase = custom_phase
            return

        if quadratic_phase is None:
            quadratic_phase = self.flags.get("quadratic_phase", False)
        if random_phase is None:
            random_phase = self.flags.get("random_phase", 1)

        phase = np.zeros(self.slm_shape, dtype=self.dtype)
        if quadratic_phase:
            phase += self._get_quadratic_initial_phase(quadratic_phase)
        if random_phase:
            phase += random_phase * np.random.uniform(
                -np.pi, np.pi, self.slm_shape
            ).astype(self.dtype)
        self.phase = phase

    def reset_weights(self):
        """Reset weights to the target (MRAF noise regions zeroed)."""
        if self.target is not None:
            self.weights = np.nan_to_num(self.target.copy(), nan=0)
        else:
            self.weights = None

    def _set_target(self, new_target, reset_weights=False):
        if new_target is None:
            self.target = np.zeros(self.shape, dtype=self.dtype)
        else:
            new_target = np.abs(np.asarray(new_target, dtype=self.dtype))
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                self.target = new_target / Hologram._norm(new_target)
        if reset_weights:
            self.reset_weights()

    def set_target(self, new_target, reset_weights=False):
        """Change the target (cleans and normalizes). Ref ``:772-787``."""
        self._set_target(new_target=new_target, reset_weights=reset_weights)

    def set_weights(self, new_weights):
        """Set the weights to a new array of the target's shape."""
        new_weights = np.asarray(new_weights, dtype=self.dtype)
        if new_weights.shape != self.target.shape:
            raise ValueError(
                f"New weights {new_weights.shape} do not match target {self.target.shape}"
            )
        self.weights = new_weights

    def get_weights(self):
        """Current weights (numpy)."""
        return np.asarray(self.weights)

    # ------------------------------------------------------------------
    # Accessors (ref :787-931).
    # ------------------------------------------------------------------

    def get_phase(self, include_propagation=False):
        r"""
        Current nearfield phase shifted to :math:`[0, 2\pi)`-friendly form
        (+pi), or with the propagation kernel included. Ref ``:787-813``.
        """
        if include_propagation and self.propagation_kernel is not None:
            return self.phase + self.propagation_kernel
        return self.phase + np.pi

    def get_amp(self):
        """Nearfield amplitude (scalar or numpy array)."""
        return self.amp

    def get_amp_ff(self):
        """Current farfield amplitude (numpy or None)."""
        return None if self.amp_ff is None else np.asarray(self.amp_ff)

    @property
    def phase_ff(self):
        """Current farfield phase (true centered convention) or None."""
        if self._phase_ff_folded is None:
            return None
        return self._unfold_ff_phase(np.asarray(self._phase_ff_folded))

    @phase_ff.setter
    def phase_ff(self, value):
        if value is None:
            self._phase_ff_folded = None
        else:
            # Invert the unfold (same checkerboard both ways).
            self._phase_ff_folded = self._unfold_ff_phase(np.asarray(value))

    @property
    def farfield(self):
        """Current complex farfield (true centered convention) or None."""
        if self._farfield_folded is None:
            return None
        if isinstance(self._farfield_folded, np.ndarray):
            return _prop.unfold_farfield(self._farfield_folded)
        return _prop.to_numpy_complex(
            _prop.unfold_farfield_device(self._farfield_folded)
        )

    def get_farfield(self, shape=None, propagation_kernel=None, affine=None, get=True):
        r"""
        Compute the complex farfield from the current phase/amp, optionally
        at a different ``shape`` or through an ``affine`` transform.
        Ref ``:853-931``.
        """
        if shape is None:
            shape = self.shape
        shape = tuple(int(v) for v in shape)

        if propagation_kernel is None:
            propagation_kernel = self.propagation_kernel
        if isinstance(propagation_kernel, REAL_TYPES) and propagation_kernel == 0:
            propagation_kernel = None

        psi = _prop.fold_phase(self.phase, shape)
        kernel = (
            None
            if propagation_kernel is None
            else jnp.asarray(propagation_kernel, dtype=jnp.float32)
        )
        amp = self.amp if np.isscalar(self.amp) else jnp.asarray(self.amp)
        farfield = _prop.to_numpy_complex(
            _prop.compute_farfield(
                jnp.asarray(psi), amp, shape, tuple(self.slm_shape), kernel
            )
        )

        if shape == tuple(self.shape):
            self.amp_ff = np.abs(farfield)

        if affine is not None:
            from scipy.ndimage import affine_transform

            farfield = affine_transform(
                input=farfield,
                matrix=affine["M"],
                offset=np.ravel(affine["b"]),
                output_shape=shape,
                order=3,
                mode="constant",
                cval=0,
            )
        return farfield

    def _populate_results(self):
        """Populate farfield/amp_ff/phase_ff from the current phase/amp."""
        psi = self._psi_device()
        amp = (
            jnp.float32(self.amp)
            if np.isscalar(self.amp)
            else jnp.asarray(self.amp, dtype=jnp.float32)
        )
        kernel = (
            None
            if self.propagation_kernel is None
            else jnp.asarray(self.propagation_kernel, dtype=jnp.float32)
        )
        folded, amp_ff, theta = _prop.forward_fields(psi, amp, tuple(self.shape), kernel)
        self._farfield_folded = folded  # device array; complex stays on device
        self.amp_ff = amp_ff  # device; host view materializes lazily
        self._phase_ff_folded = theta

    # ------------------------------------------------------------------
    # Padded shape helper (ref :616-738).
    # ------------------------------------------------------------------

    @staticmethod
    def get_padded_shape(
        slm_shape,
        padding_order=1,
        square_padding=True,
        precision=np.inf,
        precision_basis="kxy",
    ):
        """
        Computational-shape helper: pad ``slm_shape`` to the
        ``padding_order``-th larger power of 2 (squared by default), or to
        achieve a target k-space ``precision``. Ref ``:616-725``.
        """
        cameraslm = None
        if hasattr(slm_shape, "slm") and hasattr(slm_shape, "cam"):
            cameraslm = slm_shape
            slm_shape = cameraslm.slm.shape
        elif hasattr(slm_shape, "shape") and hasattr(slm_shape, "grid"):
            slm_obj = slm_shape
            slm_shape = slm_obj.shape
            if precision_basis == "ij" and np.isfinite(precision):
                raise ValueError("Pass a CameraSLM for 'ij' precision_basis.")
            cameraslm = type("_Fake", (), {"slm": slm_obj})()

        slm_shape = tuple(int(v) for v in slm_shape)

        if np.isfinite(precision) and cameraslm is not None:
            if precision <= 0:
                raise ValueError("precision must be positive.")
            dpixel = np.amin(cameraslm.slm.pitch)
            fs = 1 / dpixel
            if precision_basis == "ij":
                slm_range = np.amax(cameraslm.kxyslm_to_ijcam([fs, fs]))
                pixels = slm_range / precision
            else:
                pixels = fs / precision
            pixels = int(2 ** int(np.ceil(np.log2(pixels))))
            precision_shape = (pixels, pixels)
        elif np.isfinite(precision):
            raise ValueError("Pass a CameraSLM/SLM for precision calculations.")
        else:
            precision_shape = slm_shape

        if padding_order > 0:
            padding_shape = np.power(
                2, np.ceil(np.log2(slm_shape)) + padding_order - 1
            ).astype(int)
        else:
            padding_shape = slm_shape

        shape = tuple(np.amax(np.vstack((precision_shape, padding_shape)), axis=0))
        if square_padding:
            largest = int(np.amax(shape))
            shape = (largest, largest)
        return shape

    #: Live f32 ``(N, N)`` planes of one scanned WGS iteration on TPU —
    #: the HBM working set the memory-constrained-shape model charges.
    #: Fused carry-mode step: carry field pair (2) + weights (1) + Kim
    #: phasor pair (2) + target & masks (2) + out-of-place kernel
    #: outputs before donation recycles them (5) + four-step stage
    #: workspace (2) = 14. Natural path adds the materialized complex
    #: farfield, amp_ff/theta, and constrained planes ( + 8).
    _STEP_LIVE_PLANES = {"fused": 14, "natural": 22}

    #: Multiplicative slack for XLA fragmentation/donation timing; the
    #: compiled peak can transiently exceed the analytic live set.
    _HBM_SLACK = 1.25

    def _calculate_memory_constrained_shape(
        self, device=0, dtype=None, budget=None, path="fused"
    ):
        """
        Largest square computational side :math:`N` whose scanned WGS
        step fits in the per-chip HBM budget — the TPU analog of the
        reference's cupy-mempool heuristic (ref ``_hologram.py:727-738``,
        which divides the pool among 8 flat arrays). Here the live set
        is modeled from the engine's actual buffers
        (:attr:`_STEP_LIVE_PLANES` planes of ``dtype``, times
        :attr:`_HBM_SLACK` for allocator fragmentation).

        Parameters
        ----------
        device : int
            Device index for :meth:`get_mempool_limit`.
        dtype : type OR None
            Plane dtype; defaults to :attr:`dtype` (f32).
        budget : int OR None
            HBM budget in bytes. Defaults to the live device's reported
            ``bytes_limit``; pass explicitly to plan for other hardware
            (e.g. ``16e9`` for a v5e chip) or when no device is attached.
        path : str
            ``"fused"`` (scrambled carry-mode Pallas step, the default at
            power-of-two shapes) or ``"natural"`` (einsum path).

        Returns
        -------
        float
            Maximum square side length.
        """
        if dtype is None:
            dtype = self.dtype
        return Hologram._memory_constrained_side(
            budget, device=device, dtype=dtype, path=path
        )

    @staticmethod
    def _memory_constrained_side(budget, device=0, dtype=np.float32,
                                 path="fused"):
        """Core of :meth:`_calculate_memory_constrained_shape` (shared
        with the instance-free :meth:`suggest_memory_strategy`)."""
        if budget is None:
            budget = Hologram.get_mempool_limit(device=device)
        if budget is None or budget <= 0:
            raise RuntimeError(
                "No device HBM budget available; pass budget= explicitly "
                "(e.g. 16e9 for a v5e chip)."
            )
        planes = Hologram._STEP_LIVE_PLANES[path]
        bytes_per_value = np.dtype(dtype).itemsize
        values_per_plane = budget / (
            planes * bytes_per_value * Hologram._HBM_SLACK
        )
        return float(np.sqrt(values_per_plane))

    @staticmethod
    def suggest_memory_strategy(shape, budget=None, device=0,
                                dtype=np.float32, spots=False):
        """
        Sizing advice for a computational ``shape`` against a per-chip
        HBM ``budget``: whether the single-chip scanned engine fits, the
        largest side that would, and — above the budget — which scaling
        path to take (the row-sharded pencil-FFT plane engine
        :mod:`slmsuite_tpu.parallel.plane` for image holograms; the
        grid-free :class:`CompressedSpotHologram` transform, which never
        materializes the padded plane at all, for spot workloads).

        Returns
        -------
        dict
            ``{"shape", "max_side", "fits", "recommendation", "budget"}``.
        """
        max_side = Hologram._memory_constrained_side(
            budget, device=device, dtype=dtype
        )
        side = int(np.max(shape) if not np.isscalar(shape) else shape)
        fits = side <= max_side
        if fits:
            recommendation = "single-chip"
        elif spots:
            recommendation = "compressed"
        else:
            recommendation = "shard-plane"
        return {
            "shape": (side, side),
            "max_side": max_side,
            "fits": fits,
            "recommendation": recommendation,
            "budget": budget,
        }

    # ------------------------------------------------------------------
    # Initialization helpers (ref :501-536).
    # ------------------------------------------------------------------

    def _get_target_moments_knm_norm(self):
        """First/second moments of the target in normalized knm space."""
        target = np.nan_to_num(np.asarray(self.target))
        center_knm = analysis.image_positions(target, nansum=True)
        std_knm = np.sqrt(
            analysis.image_variances(target, centers=center_knm, nansum=True)[:2, 0]
        )
        shape = np.flip(self.shape).astype(float)
        return np.squeeze(center_knm) / shape, np.squeeze(std_knm) / shape

    def _get_quadratic_initial_phase(self, scaling=1):
        """Analytic blaze+lens guess that overlaps the target (ref :501-530)."""
        amp = self.amp
        if np.isscalar(amp):
            amp = np.ones(self.slm_shape)
        std_amp = np.sqrt(analysis.image_variances(np.asarray(amp))[:2, 0])
        slm_shape = np.flip(self.slm_shape).astype(float)
        std_amp = std_amp / slm_shape

        center_knm_norm, std_knm_norm = self._get_target_moments_knm_norm()

        grid = analysis._generate_grid(self.slm_shape[1], self.slm_shape[0], centered=True)
        grid = [
            grid[0].astype(self.dtype) / self.slm_shape[1],
            grid[1].astype(self.dtype) / self.slm_shape[0],
        ]
        # Degenerate (collinear/single-spot) targets have zero extent along
        # an axis; the focal power is zero there (flat phase), not inf.
        with np.errstate(divide="ignore"):
            focal = np.reciprocal(scaling * slm_shape * std_knm_norm / std_amp)
        return (
            tphase.blaze(grid, slm_shape * center_knm_norm)
            + tphase.lens(grid, focal)
        ).astype(self.dtype)

    # ------------------------------------------------------------------
    # Optimization (ref :1076-1424).
    # ------------------------------------------------------------------

    def optimize(
        self,
        method="GS",
        maxiter=20,
        verbose=True,
        callback=None,
        feedback=None,
        stat_groups=[],
        **kwargs,
    ):
        r"""
        Iterative phase retrieval: ``"GS"``, weighted variants
        (``"WGS-Leonardo"``, ``"WGS-Kim"``, ``"WGS-Nogrette"``, ``"WGS-Wu"``,
        ``"WGS-tanh"``), or gradient optimization ``"CG"``.

        MRAF noise regions are marked by nan in :attr:`target`; the
        ``"mraf_factor"`` flag attenuates them.

        Parameters follow the reference exactly (``_hologram.py:1076-1368``):
        ``method``, ``maxiter``, ``verbose``, ``callback`` (return True to
        stop), ``feedback`` and ``stat_groups`` (see
        :data:`~slmsuite_tpu.holography.algorithms.FEEDBACK_OPTIONS`), and
        method-specific ``**kwargs`` persisted into :attr:`flags`
        (``feedback_exponent``, ``feedback_factor``,
        ``fix_phase_iteration``, ``fix_phase_efficiency``, ``mraf_factor``,
        ...).

        Beyond the reference, ``mesh=jax.sharding.Mesh(...)`` runs the
        optimization sharded over a device mesh where the hologram class
        supports it (:class:`MultiplaneHologram` — planes data-parallel;
        :class:`CompressedSpotHologram` — pixels sharded). The mesh
        persists for subsequent ``optimize`` calls until ``mesh=None`` is
        passed explicitly.
        """
        name = kwargs.pop("name", None)
        if "mesh" in kwargs:
            mesh = kwargs.pop("mesh")
            if mesh is not None and not self._supports_mesh:
                raise ValueError(
                    f"{type(self).__name__} does not support mesh-sharded "
                    "optimization; use MultiplaneHologram (data-parallel "
                    "planes) or CompressedSpotHologram (sharded pixels)."
                )
            self._mesh = mesh
        self._update_flags(method, verbose, feedback, stat_groups, **kwargs)

        if "GS" in method:
            self.optimize_gs(maxiter, callback, verbose=verbose, name=name)
        elif "CG" in method:
            iterations = range(maxiter)
            if verbose and maxiter > 1:
                iterations = tqdm(iterations, desc=name)
            self.optimize_cg(iterations, callback)
        else:
            raise ValueError(f"Unsupported optimization method '{method}'")

    def _update_flags(self, method, verbose, feedback, stat_groups, **kwargs):
        """Merge method defaults + kwargs into :attr:`flags` (ref :1370-1424)."""
        if method not in ALGORITHM_DEFAULTS:
            raise ValueError(
                f"Unrecognized method '{method}'. Valid: {list(ALGORITHM_DEFAULTS)}"
            )
        self.flags["method"] = method

        for flag, value in ALGORITHM_DEFAULTS[method].items():
            self.flags.setdefault(flag, value)
        self.flags.setdefault("fixed_phase", False)

        for flag in kwargs:
            self.flags[flag] = kwargs[flag]

        for group in stat_groups:
            if group not in FEEDBACK_OPTIONS:
                raise ValueError(
                    f"Statistics group '{group}' invalid. Valid: {FEEDBACK_OPTIONS}"
                )
        self.flags["stat_groups"] = list(stat_groups)

        if feedback is not None:
            if feedback not in FEEDBACK_OPTIONS:
                raise ValueError(
                    f"Feedback '{feedback}' invalid. Valid: {FEEDBACK_OPTIONS}"
                )
            self.flags["feedback"] = feedback

        if verbose > 1:
            import pprint

            print(f"Optimizing with '{method}' using flags:")
            pprint.pprint(
                {k: v for k, v in self.flags.items() if k in ALGORITHM_DEFAULTS[method]}
            )

    # --- Engine plumbing. ---

    def _engine_feedback(self):
        """The device feedback mode for the engine ('computational' here)."""
        feedback = self.flags.get("feedback", "computational")
        if feedback not in ("computational",):
            raise ValueError(
                f"Feedback '{feedback}' requires a FeedbackHologram/SpotHologram subclass."
            )
        return feedback

    def _device_stat_groups(self):
        """Stat groups the engine can compute on device."""
        return tuple(
            g
            for g in self.flags.get("stat_groups", [])
            if g in ("computational", "computational_spot")
        )

    def _mraf_enabled(self):
        return bool(np.any(np.isnan(self.target))) if self.target is not None else False

    def _build_config(self):
        mraf = self._mraf_enabled()
        config = _engine.GSConfig(
            method=self.flags["method"],
            shape=tuple(self.shape),
            slm_shape=tuple(self.slm_shape),
            feedback=self._engine_feedback(),
            stat_groups=self._device_stat_groups(),
            mraf=mraf,
            mraf_factor=mraf and self.flags.get("mraf_factor") is not None,
            zero_factor=mraf and bool(self.flags.get("zero_factor", 0)),
            has_kernel=self.propagation_kernel is not None,
            kim_efficiency_trigger=(
                "Kim" in self.flags["method"]
                and self.flags.get("fix_phase_efficiency") is not None
            ),
            spot_count=getattr(self, "_spot_count", 0),
            spot_window=getattr(self, "_spot_window", 0),
            spot_single_px=getattr(self, "_spot_single_px", False),
        )
        return self._amend_config(config)

    def _amend_config(self, config):
        """Hook for subclasses to refine the engine config (e.g. the
        simulated-rig closed-loop statics)."""
        return config

    def _build_consts(self, config):
        # Full-plane constants ride the device cache (:meth:`_dev_const`):
        # re-uploading target/masks/amplitude every optimize() call is
        # pure per-call latency on a remote-attached TPU.
        target_dev, stat_mask = self._dev_const(
            "target", self.target,
            lambda t: (
                jnp.asarray(np.asarray(t, dtype=np.float32)),
                jnp.asarray(
                    (np.asarray(t, dtype=np.float32) != 0)
                    & ~np.isnan(np.asarray(t, dtype=np.float32))
                ),
            ),
        )
        consts = {
            "amp": (
                jnp.float32(self.amp)
                if np.isscalar(self.amp)
                else self._dev_const(
                    "amp", self.amp,
                    lambda a: jnp.asarray(a, dtype=jnp.float32),
                )
            ),
            "target": target_dev,
            "stat_mask": stat_mask,
            "feedback_exponent": jnp.float32(self.flags.get("feedback_exponent", 0.8)),
            "feedback_factor": jnp.float32(self.flags.get("feedback_factor", 0.1)),
            "fix_phase_iteration": jnp.int32(self.flags.get("fix_phase_iteration", 10)),
            "fix_phase_efficiency": jnp.float32(
                self.flags.get("fix_phase_efficiency") or np.nan
            ),
        }
        if config.has_kernel:
            consts["kernel"] = self._dev_const(
                "kernel", self.propagation_kernel,
                lambda k: jnp.asarray(k, dtype=jnp.float32),
            )
        if config.mraf:

            def make_masks(t):
                t32 = np.asarray(t, dtype=np.float32)
                noise = np.isnan(t32)
                zero = (~noise) & (t32 == 0)
                return (
                    jnp.asarray(~(noise | zero)),
                    jnp.asarray(noise),
                    jnp.asarray(zero),
                )

            (
                consts["signal_mask"], consts["noise_mask"],
                consts["zero_mask"],
            ) = self._dev_const("mraf_masks", self.target, make_masks)
            consts["mraf_factor"] = jnp.float32(self.flags.get("mraf_factor") or 1.0)
            consts["zero_factor"] = jnp.float32(self.flags.get("zero_factor", 0.0))
        self._extend_consts(consts, config)
        return consts

    def _extend_consts(self, consts, config):
        """Hook for subclasses (spot gather maps etc.)."""

    def _build_state(self, config):
        # The engine donates the state pytree; resident buffers are
        # handed over as private copies (see _psi_device docstring).
        return _engine.GSState(
            psi=self._psi_device(for_donation=True),
            weights=self._weights_device(),
            phase_ff=(
                self._phase_ff_folded_device(for_donation=True)
                if (self._pff_dev is not None or self._pff_host is not None)
                else jnp.zeros(config.shape, dtype=jnp.float32)
            ),
            zero_weights=(
                jnp.asarray(getattr(self, "zero_weights"), dtype=jnp.float32)
                if config.zero_factor and hasattr(self, "zero_weights")
                else (
                    jnp.zeros((2,) + tuple(config.shape), dtype=jnp.float32)
                    if config.zero_factor
                    else jnp.zeros((2, 0, 0), dtype=jnp.float32)
                )
            ),
            fixed_phase=jnp.asarray(bool(self.flags.get("fixed_phase", False))),
            unfixed_streak=jnp.zeros((), dtype=jnp.int32),
            iteration=jnp.asarray(self.iter, dtype=jnp.int32),
        )

    def _sync_from_state(self, state):
        """Write device scan state back into the host-facing attributes
        (planes stay on device; host views materialize lazily). ONE
        device fetch for the scalars — per-plane fetches are pure
        latency on a remote TPU and dominate short ``optimize()``
        calls, the same epilogue economy as the compressed engine's
        ``_finalize_scan_fused``."""
        self._psi = state.psi
        self.weights = state.weights
        self._phase_ff_folded = state.phase_ff
        if state.zero_weights.size:
            self.zero_weights = np.asarray(state.zero_weights)
        scalars = np.asarray(jnp.stack([
            state.fixed_phase.astype(jnp.float32),
            state.iteration.astype(jnp.float32),
        ]))
        self._final_fixed_phase = bool(scalars[0])
        self.iter = int(scalars[1])

    def optimize_gs(self, maxiter, callback, verbose=True, name=None):
        """
        GS/WGS loop. Fully-computational runs use the scanned engine in
        chunks (device-resident, stats accumulated on device); callback or
        host-feedback runs fall back to a per-iteration jitted step.
        """
        if isinstance(maxiter, range):
            maxiter = len(maxiter)

        host_groups = self._stats_pending_groups()
        feedback = self.flags.get("feedback", "computational")
        # The engine feedback mode decides the loop shape: device modes
        # (computational*, the simulated closed loop) run the scanned
        # engine; external/experimental modes need host measurements
        # between iterations.
        engine_feedback = self._engine_feedback()
        host_loop = (
            callback is not None
            or bool(host_groups)
            or engine_feedback in ("external", "external_spot")
        )
        if (
            self.flags.get("fix_phase_efficiency") is not None
            and "Kim" in self.flags["method"]
            and not self._device_stat_groups()
            and not host_loop
        ):
            raise ValueError("Must track statistics to fix phase based on efficiency!")

        config = self._build_config()
        consts = self._build_consts(config)
        state = self._build_state(config)
        start_iter = self.iter

        if host_loop and self._mesh is not None:
            warnings.warn(
                "mesh-sharded optimization requires the fully-computational "
                "path (no callback/experimental feedback); running on a "
                "single device."
            )

        if not host_loop:
            mesh = self._mesh
            if mesh is not None:
                from slmsuite_tpu.parallel.plane import plane_shardable

                n_devices = int(np.prod(list(mesh.shape.values())))
                if not plane_shardable(config, n_devices):
                    warnings.warn(
                        "mesh-sharded plane optimization requires farfield "
                        "shape == SLM shape, computational (non-spot) "
                        "feedback, and dimensions divisible by the mesh; "
                        "running on a single device."
                    )
                    mesh = None

            if mesh is not None:
                # Row-sharded plane: the farfield splits over the mesh
                # (pencil FFT + psum'd reductions; parallel/plane.py).
                from slmsuite_tpu.parallel.plane import run_sharded_plane_gs

                axis = mesh.axis_names[0]
                chunk = (
                    maxiter if not verbose
                    else max(1, int(np.ceil(maxiter / 10)))
                )
                progress = (
                    tqdm(total=maxiter, desc=name)
                    if verbose and maxiter > 1 else None
                )
                all_stats = []
                remaining = maxiter
                while remaining > 0:
                    n = min(chunk, remaining)
                    state, stats = run_sharded_plane_gs(
                        config, state, consts, mesh, n, axis
                    )
                    all_stats.append(np.asarray(stats))
                    remaining -= n
                    if progress is not None:
                        progress.update(n)
                if progress is not None:
                    progress.close()
            else:
                # Fast path: chunked scans (progress updates between
                # chunks); the engine promotes to the scrambled layout
                # once across all chunks.
                chunk = (
                    maxiter if not verbose
                    else max(1, int(np.ceil(maxiter / 10)))
                )
                progress = (
                    tqdm(total=maxiter, desc=name)
                    if verbose and maxiter > 1 else None
                )
                coarse, n_refine = self._parse_precision_schedule(maxiter)
                state, all_stats = _engine.run_gs_chunked(
                    config, state, consts, maxiter, chunk=chunk,
                    on_chunk=(progress.update if progress is not None else None),
                    n_refine=n_refine, coarse=coarse,
                )
                if progress is not None:
                    progress.close()

            self._sync_from_state(state)
            if self._device_stat_groups():
                self._record_scan_stats(np.concatenate(all_stats), start_iter)
        else:
            iterations = range(maxiter)
            if verbose and maxiter > 1:
                iterations = tqdm(iterations, desc=name)
            for _ in iterations:
                self._stepwise_iteration(config, consts, callback)
                if self._break_requested:
                    break

        self._populate_results()

    def _parse_precision_schedule(self, maxiter):
        """
        Parse the ``fft_precision_schedule`` optimize flag into
        ``(coarse, n_refine)`` for :func:`ops.engine.run_gs_chunked`.

        Accepted values: ``None``/``0`` (off — every iteration at the
        engine's full precision); an int ``n`` (the final ``n``
        iterations run at full precision, the rest at ``"DEFAULT"`` —
        one bf16 MXU pass per stage dot, ~1.6x faster on v5e); or a
        ``(coarse, n_refine)`` pair naming the coarse Pallas-FFT
        precision explicitly. WGS is a fixed-point iteration, so coarse
        early transforms perturb the trajectory but not the fixed point
        the refine iterations re-converge to (quality gate:
        ``bench.attest_schedule_quality``); on CPU the schedule is a
        no-op. See ``docs/source/tpu.rst`` ("Precision trade-offs").
        """
        schedule = self.flags.get("fft_precision_schedule")
        if not schedule:
            return "DEFAULT", None
        if isinstance(schedule, (int, np.integer)):
            coarse, n_refine = "DEFAULT", int(schedule)
        else:
            try:
                coarse, n_refine = schedule
                n_refine = int(n_refine)
            except (TypeError, ValueError):
                raise ValueError(
                    "fft_precision_schedule must be an int (refine "
                    "iterations) or a (coarse, n_refine) pair; got "
                    f"{schedule!r}"
                ) from None
        if n_refine < 0 or n_refine > int(maxiter):
            warnings.warn(
                f"fft_precision_schedule refine count {n_refine} clipped "
                f"to [0, {maxiter}]."
            )
            n_refine = min(max(n_refine, 0), int(maxiter))
        return coarse, n_refine

    _break_requested = False

    #: Mesh-sharded optimization support: the base class row-shards the
    #: full farfield plane over the mesh (giant-k-space holography; see
    #: :mod:`slmsuite_tpu.parallel.plane`); subclasses override with
    #: their own sharded engines.
    _supports_mesh = True
    #: Active jax.sharding.Mesh (set via ``optimize(mesh=...)``).
    _mesh = None

    def _stepwise_iteration(self, config, consts, callback):
        """
        One host-paced GS iteration: jitted forward, host feedback/stats/
        callback, jitted weights+constraint+backward.
        """
        self._break_requested = False

        # Forward (jitted; complex farfield stays on device).
        psi = self._psi_device()
        kernel = consts.get("kernel") if config.has_kernel else None
        farfield, amp_ff, theta = _prop.forward_fields(
            psi, consts["amp"], config.shape, kernel
        )
        self._farfield_folded = farfield
        self.amp_ff = amp_ff  # device; host view materializes on demand
        self._midloop_cleaning()

        # Callback + stats (host).
        if callback is not None and callback(self):
            self._break_requested = True
            return
        self._update_stats(self.flags["stat_groups"])

        # Weights (possibly measuring hardware) — subclass hook.
        was_not_fixed = not self.flags.get("fixed_phase", False)
        if "WGS" in self.flags["method"] and self.iter > 0:
            self._update_weights()
            self._kim_decision_host()
        # Save the phase while unfixed, including the fixing transition
        # (ref `_hologram.py:1585-1605`).
        if was_not_fixed or not self._has_phase_ff():
            self._phase_ff_folded = theta

        # Constraint + backward on device (single jitted call).
        weights = jnp.asarray(np.nan_to_num(np.asarray(self.weights, dtype=np.float32)))
        backward = _stepwise_backward(config)
        self._psi = backward(
            farfield,
            weights,
            self._phase_ff_folded_device(),
            consts,
        )
        self.iter += 1

    def _midloop_cleaning(self):
        """Invalidate cached per-iteration data (subclass hook)."""

    def _kim_decision_host(self):
        """Host-side Kim phase-fixing decision (stepwise path). Ref :1556-1583."""
        if "Kim" not in self.flags["method"]:
            self.flags["fixed_phase"] = False
            return

        was_not_fixed = not self.flags.get("fixed_phase", False)

        if self.flags.get("fix_phase_efficiency") is not None:
            stats = self.stats["stats"]
            if len(stats) == 0:
                raise ValueError("Must track statistics to fix phase based on efficiency!")
            group = list(stats.keys())[-1]
            eff = stats[group]["efficiency"][self.iter]
            if eff > self.flags["fix_phase_efficiency"]:
                self.flags["fixed_phase"] = True

        if was_not_fixed and self.iter >= self.flags.get("fix_phase_iteration", 10) - 1:
            previous = self.stats["flags"].get("fixed_phase", [])
            n = self.flags.get("fix_phase_iteration", 10)
            if len(previous) >= n and all(
                not bool(previous[-1 - i]) for i in range(n)
            ):
                self.flags["fixed_phase"] = True

    def _update_weights(self):
        """Computational weight update (subclasses add feedback modes)."""
        if self.flags["feedback"] == "computational":
            self.weights = np.asarray(
                update_weights_generic(
                    jnp.asarray(np.nan_to_num(self.weights)),
                    jnp.asarray(self.amp_ff),
                    jnp.asarray(self.target),
                    self.flags["method"],
                    self.flags.get("feedback_exponent", 0.8),
                    self.flags.get("feedback_factor", 0.1),
                )
            )

    # ------------------------------------------------------------------
    # Conjugate gradient via jax.grad + optax (ref :1664-1740).
    # ------------------------------------------------------------------

    def optimize_cg(self, iterations, callback):
        """
        Gradient-based phase retrieval with ``jax.grad`` and an optax
        optimizer (named by the ``"optimizer"`` flag; ``"optimizer_kwargs"``
        passed through, ``lr`` accepted as an alias of ``learning_rate``).

        The ``"loss"`` flag may be a callable ``loss(farfield, target) ->
        scalar`` in jax terms; the default is the complex MSE of the
        normalized farfield amplitude against the target.
        """
        import optax

        loss = self.flags.get("loss")
        if loss is None:
            def loss(farfield, target):
                amp_ff = jnp.abs(farfield)
                amp_ff = amp_ff / jnp.sqrt(jnp.sum(jnp.square(amp_ff)))
                return jnp.mean(jnp.square(amp_ff - jnp.nan_to_num(target)))

        optimizer_name = str(self.flags.get("optimizer", "adam")).lower()
        kwargs = dict(self.flags.get("optimizer_kwargs", {"learning_rate": 0.1}))
        if "lr" in kwargs:
            kwargs["learning_rate"] = kwargs.pop("lr")
        optimizer = getattr(optax, optimizer_name)(**kwargs)

        shape = tuple(self.shape)
        slm_shape = tuple(self.slm_shape)
        amp = (
            jnp.float32(self.amp)
            if np.isscalar(self.amp)
            else jnp.asarray(self.amp, dtype=jnp.float32)
        )
        target = jnp.asarray(self.target, dtype=jnp.float32)
        kernel = (
            None
            if self.propagation_kernel is None
            else jnp.asarray(self.propagation_kernel, dtype=jnp.float32)
        )

        def loss_from_psi(psi):
            nearfield = _prop.build_folded_nearfield(psi, amp, shape, kernel)
            farfield = _prop.unfold_farfield(_prop.nearfield_to_farfield(nearfield))
            return loss(farfield, target)

        @jax.jit
        def cg_step(psi, opt_state):
            value, grads = jax.value_and_grad(loss_from_psi)(psi)
            updates, opt_state = optimizer.update(grads, opt_state, psi)
            return optax.apply_updates(psi, updates), opt_state, value

        psi = self._psi_device()
        opt_state = optimizer.init(psi)

        for _ in iterations:
            psi, opt_state, value = cg_step(psi, opt_state)
            self.flags["loss_result"] = float(value)
            if hasattr(iterations, "set_description"):
                iterations.set_description(f"loss={float(value):.3e}")
            if callback is not None:
                self._psi = psi
                if callback(self):
                    break
            if self.flags["stat_groups"]:
                self._psi = psi
                self._populate_results()
                self._update_stats(self.flags["stat_groups"])
            self.iter += 1

        self._psi = psi
        self._populate_results()

    # ------------------------------------------------------------------
    # Misc (ref :1979-2011).
    # ------------------------------------------------------------------

    def _remove_vortices(self):
        """Remove farfield phase vortices where the target is positive."""
        if self.phase_ff is not None:
            cleaned = analysis.image_remove_vortices(
                self.phase_ff.copy(), np.nan_to_num(self.target) > 0
            )
            self.phase_ff = cleaned

    @staticmethod
    def set_mempool_limit(device=0, size=None, fraction=None):
        """
        GPU-memory-pool parity shim (ref ``_hologram.py:1925-1953``):
        the reference trims cupy's pool; on TPU, XLA owns HBM allocation
        (tune via ``XLA_PYTHON_CLIENT_MEM_FRACTION``), so this is a no-op.
        """
        warnings.warn(
            "set_mempool_limit is a cupy concept; on TPU/XLA set "
            "XLA_PYTHON_CLIENT_MEM_FRACTION before process start instead."
        )

    @staticmethod
    def get_mempool_limit(device=0):
        """
        GPU-memory-pool parity shim (ref ``_hologram.py:1955-1977``);
        returns the live device's memory stats when the backend reports
        them, else -1.
        """
        try:
            stats = jax.devices()[device].memory_stats()
            return int(stats.get("bytes_limit", -1))
        except Exception:
            return -1

    @staticmethod
    def _norm(matrix):
        r"""Root of sum of squares :math:`\sqrt{\iint |E|^2}`."""
        matrix = np.asarray(matrix)
        if np.iscomplexobj(matrix):
            return np.sqrt(np.nansum(np.square(np.abs(matrix))))
        return np.sqrt(np.nansum(np.square(matrix)))
