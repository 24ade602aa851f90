"""
Wavefront calibration: measure and correct SLM aberrations.

Injects a known Zernike aberration into the simulated SLM, measures it
with the superpixel interference method (Cizmar-style,
doi:10.1038/nphoton.2010.85), processes the raw data into a phase
correction, and verifies the corrected spot.
(Reference example: ``wavefront_calibration`` notebook.)
"""

import matplotlib.pyplot as plt
import numpy as np

from _rig import make_rig, save_figure

from slmsuite_tpu.holography.toolbox import phase as tphase


def main():
    fs = make_rig()
    fs.fourier_calibrate(array_shape=5, array_pitch=16, verbose=False)

    # --- 1. Inject a hidden aberration into the simulated SLM. ------------
    aberration = tphase.zernike_sum(fs.slm, (4, 3, 5), (1.5, -1.0, 0.8)).astype(np.float32)
    fs.slm.source["phase_sim"] = aberration  # Ground truth (unknown to us).
    print("Injected astigmatism+defocus aberration "
          f"(peak-to-peak {np.ptp(aberration):.1f} rad)")

    def spot_peak():
        fs.slm.set_phase(None, settle=False)
        return float(fs.cam.get_image().max())

    # --- 2. Superpixel wavefront calibration. -----------------------------
    print("Measuring (superpixel interference sweep)...")
    fs.wavefront_calibrate(
        method="superpixel",
        calibration_points=np.array([[330.0], [220.0]]),
        superpixel_size=64,
        phase_steps=8,
        plot=-1,
    )
    fs.wavefront_calibration_superpixel_process(apply=True, smooth=2, plot=False)

    # --- 3. Verify: corrected spot should be much brighter/sharper. -------
    # Compare at an exposure where the *corrected* spot doesn't clip.
    while spot_peak() >= 0.9 * fs.cam.bitresolution:
        fs.cam.set_exposure(fs.cam.get_exposure() / 2)
    after = spot_peak()

    correction = fs.slm.source.pop("phase")  # Temporarily remove.
    before = spot_peak()
    fs.slm.source["phase"] = correction      # Restore.

    print(f"  spot peak before correction: {before:.0f}")
    print(f"  spot peak after  correction: {after:.0f}  "
          f"({after / max(before, 1):.1f}x Strehl gain)")

    measured = fs.slm.source.get("phase", np.zeros_like(aberration))
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].imshow(np.mod(aberration, 2 * np.pi), cmap="twilight")
    axes[0].set_title("Injected aberration")
    axes[1].imshow(np.mod(measured, 2 * np.pi), cmap="twilight")
    axes[1].set_title("Measured correction")
    for ax in axes:
        ax.set_axis_off()
    save_figure("wavefront_calibration.png")


if __name__ == "__main__":
    main()
