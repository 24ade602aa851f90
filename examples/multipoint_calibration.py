"""
Multipoint Zernike wavefront calibration.

The Zernike method optimizes spot quality directly: a compressed spot
hologram targets several calibration points across the field at once;
for each Zernike term, an amplitude sweep measures a spot-quality metric
(default: spot area), a parabola fit finds each spot's optimum, and the
fitted corrections subtract into the per-spot coefficients — yielding a
field-dependent aberration model.
(Reference example: ``multipoint_calibration`` notebook.)
"""

import numpy as np

from _rig import make_rig

from slmsuite_tpu.holography.toolbox import phase as tphase


def main():
    fs = make_rig()
    fs.fourier_calibrate(array_shape=5, array_pitch=16, verbose=False)

    # Inject an aberration for the calibration to find.
    aberration = tphase.zernike_sum(fs.slm, (4, 3), (1.0, -0.6)).astype(np.float32)
    fs.slm.source["phase_sim"] = aberration
    print(f"Injected aberration, peak-to-peak {np.ptp(aberration):.1f} rad")

    # Zernike sweep calibration at 9 auto-laid-out field points over the
    # first 5 non-piston Zernike terms (tilt x/y excluded internally).
    calibration = fs.wavefront_calibrate(
        method="zernike",
        calibration_points=9,
        zernike_indices=5,
        perturbation=np.linspace(-1.5, 1.5, 7),
        optimize_weights=2,
        plot=-1,
    )

    corrected = np.asarray(calibration["corrected_spots"])
    print(f"Per-point corrected Zernike vectors: {corrected.shape} (terms x points)")
    # Terms 0-1 are spot positions (tilt); the aberration model proper
    # starts at focus/astigmatism. The injected terms dominate while the
    # uninjected term stays near zero.
    print("Mean correction per aberration term (rad):")
    for index, value in enumerate(np.mean(corrected, axis=-1)[2:], start=2):
        print(f"  term {index}: {value:+.3f}")

    # The calibration is stored and re-usable as the seed of the next run.
    assert "wavefront_zernike" in fs.calibrations


if __name__ == "__main__":
    main()
