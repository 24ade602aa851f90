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

        if source is None:
            self.source["amplitude_sim"] = np.ones_like(self.grid[0])
            self.source["phase_sim"] = np.zeros_like(self.grid[0])
        else:
            self.source.update(source)
            if "amplitude_sim" not in source:
                self.source["amplitude_sim"] = self.source["amplitude"]
                self.source["phase_sim"] = -self.source["phase"]

        self.set_phase(None)

    def close(self):
        pass

    def _set_phase_hw(self, display):
        """No hardware: the quantized :attr:`display` is the simulation input."""
        return
