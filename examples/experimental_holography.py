"""
Experimental holography: camera-in-the-loop feedback on the simulated rig.

Calibrates the camera<->SLM mapping (Fourier calibration), projects spots
at *camera* pixel targets, and closes the loop with experimental WGS
feedback to flatten measured (not just computed) spot powers.
(Reference example: ``experimental_holography`` notebook.)
"""

import numpy as np

from _rig import make_rig, save_figure

from slmsuite_tpu.holography.algorithms import SpotHologram


def main():
    fs = make_rig()

    # --- 1. Fourier calibration: where does k-space land on the camera? ---
    print("Fourier calibration")
    fs.fourier_calibrate(array_shape=5, array_pitch=16, verbose=False)
    M = fs.calibrations["fourier"]["M"]
    b = fs.calibrations["fourier"]["b"]
    print(f"  M =\n{np.array2string(M, precision=1)}\n  b = {b.ravel()}")

    # --- 2. Spots at chosen camera pixels. --------------------------------
    print("Projecting spots at camera targets")
    spot_ij = np.array([
        [160, 256, 352, 256, 210, 302],
        [256, 160, 256, 352, 210, 302],
    ], dtype=float)
    holo = SpotHologram((1024, 1024), spot_ij, basis="ij", cameraslm=fs)
    holo.optimize("WGS-Kim", maxiter=20, verbose=False)

    fs.slm.set_phase(holo.get_phase(), settle=False)
    img = fs.cam.get_image()

    found = []
    for k in range(spot_ij.shape[1]):
        j, i = spot_ij[:, k]
        window = img[int(i) - 6:int(i) + 7, int(j) - 6:int(j) + 7]
        di, dj = np.unravel_index(np.argmax(window), window.shape)
        found.append(np.hypot(di - 6, dj - 6))
    print(f"  max spot placement error: {max(found):.1f} px")

    import matplotlib.pyplot as plt

    plt.imshow(img, cmap="turbo")
    plt.scatter(spot_ij[0], spot_ij[1], s=120, fc="none", ec="w")
    plt.title("Measured camera image with targets")
    save_figure("experimental_spots.png")

    # --- 3. Close the loop: experimental feedback WGS. --------------------
    print("Experimental-feedback WGS")
    holo.optimize(
        "WGS-Kim", maxiter=10, verbose=False,
        feedback="experimental_spot", stat_groups=["experimental_spot"],
    )
    stats = holo.stats["stats"]["experimental_spot"]
    print(f"  measured uniformity after feedback: {stats['uniformity'][-1]:.4f}")


if __name__ == "__main__":
    main()
