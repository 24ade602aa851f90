"""
Simulated SLM for hardware-free testing and simulation.

Parity: reference ``slmsuite/hardware/slms/simulated.py:8-69``.
"""

import numpy as np

from slmsuite_tpu.hardware.slms.slm import SLM


class SimulatedSLM(SLM):
    """
    A virtual SLM: the write is a no-op, while the ``"amplitude_sim"`` /
    ``"phase_sim"`` source keys define the ground-truth illumination used by
    :class:`~slmsuite_tpu.hardware.cameras.simulated.SimulatedCamera` to
    compute the far-field of the *quantized* displayed phase.
    """

    def __init__(self, resolution, pitch_um=(8, 8), source=None, **kwargs):
        """
        Initialize a simulated SLM with optional ground-truth ``source``
        (defaults to uniform amplitude, flat phase).
        """
        super().__init__(resolution, pitch_um=pitch_um, settle_time_s=0, **kwargs)

        # Resolve the simulation ground truth: explicit sim keys win; a
        # measured-only source dict derives them (sim phase is the
        # NEGATIVE of the measured correction); no source means uniform
        # illumination with a flat wavefront.
        self.source.update(source or {})
        if "amplitude_sim" not in self.source:
            truth = (
                {
                    "amplitude_sim": self.source["amplitude"],
                    "phase_sim": -self.source["phase"],
                }
                if source
                else {
                    "amplitude_sim": np.ones_like(self.grid[0]),
                    "phase_sim": np.zeros_like(self.grid[0]),
                }
            )
            self.source.update(truth)

        self.set_phase(None)

    def close(self):
        pass

    def _set_phase_hw(self, display):
        """No hardware — but STORE the written data so the simulation
        input (:attr:`display`) reflects writes that bypass the local
        ``set_phase`` pipeline. Locally this is a self-copy no-op; when
        this SLM is served by :class:`~slmsuite_tpu.hardware.remote.Server`,
        the client runs the phase pipeline on ITS side and ships only the
        integer display here — without this store, a remotely driven
        simulated rig would render a stale frame. (The reference's
        simulated SLM drops remote writes the same way — its remote
        layer targets real hardware; keeping the sim usable over the
        wire is deliberate added behavior.) :attr:`phase` is kept
        coherent with the stored display via the same inverse mapping
        the integer ``set_phase`` fast path uses."""
        display = np.asarray(display)
        if display is self.display:
            return  # Local pipeline already wrote both display and phase.
        if display.shape != self.display.shape:
            raise ValueError(
                f"Display write of shape {display.shape} does not match "
                f"the SLM shape {self.display.shape}."
            )
        # Range-check like set_phase's integer fast path: silently
        # narrowing >= bitresolution values via astype would render
        # wrapped garbage for a buggy remote client without any error.
        if not np.issubdtype(display.dtype, np.integer):
            raise TypeError(
                f"Expected integer display data; got {display.dtype}."
            )
        if display.size and (
            np.any(display >= self.bitresolution) or np.any(display < 0)
        ):
            raise TypeError(
                f"Display data exceeds the SLM bitdepth "
                f"(bitresolution={self.bitresolution}): range "
                f"[{display.min()}, {display.max()}]."
            )
        np.copyto(self.display, display.astype(self.display.dtype))
        self.phase = 2 * np.pi - self.display * (
            2 * np.pi / self.phase_scaling / self.bitresolution
        )
        return
