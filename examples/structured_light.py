"""
Structured light: analytic phase patterns from the toolbox.

Laguerre-Gaussian vortices, Hermite-Gaussian modes, blazes/lenses/axicons,
and composing patterns into sub-windows with ``imprint``.
(Reference example: ``structured_light`` notebook.)
"""

import matplotlib.pyplot as plt
import numpy as np

from _rig import make_slm, save_figure

from slmsuite_tpu.holography import toolbox
from slmsuite_tpu.holography.toolbox import phase


def main():
    slm = make_slm()

    patterns = {
        "blaze": phase.blaze(slm, (0.01, 0.005)),
        "lens (f=200k)": phase.lens(slm, 2e5),
        "axicon (f=200k)": phase.axicon(slm, (2e5, 2e5)),
        "LG (l=3, p=0)": phase.laguerre_gaussian(slm, l=3, p=0),
        "HG (n=2, m=1)": phase.hermite_gaussian(slm, n=2, m=1),
        "zernike sum": phase.zernike_sum(slm, (3, 5, 10), (0.5, -0.8, 0.3)),
        # Implemented beyond the reference (stubs upstream):
        "IG helical (p=4, m=2)": phase.ince_gaussian(slm, 4, 2, parity=0),
        "Mathieu (r=2, q=4)": phase.matheui_gaussian(slm, 2, 4.0),
        "Airy cubic": phase.airy(slm, f=(2e5, 2e5), w=200),
    }

    fig, axes = plt.subplots(3, 3, figsize=(12, 12))
    for ax, (name, pattern) in zip(axes.ravel(), patterns.items()):
        # Fixed limits: "twilight" is cyclic, so 0 and 2pi share a color
        # only when the normalization spans the full wrap.
        ax.imshow(np.mod(pattern, 2 * np.pi), cmap="twilight",
                  vmin=0, vmax=2 * np.pi, interpolation="nearest")
        ax.set_title(name)
        ax.set_axis_off()
    save_figure("structured_light_patterns.png")

    # --- Compose with imprint: an LG vortex inside a blaze canvas. --------
    canvas = phase.blaze(slm, (0.02, 0))
    toolbox.imprint(
        canvas,
        window=(128, 256, 128, 256),  # (x, width, y, height)
        function=phase.laguerre_gaussian,
        grid=slm,
        l=1, p=0,
    )
    plt.imshow(np.mod(canvas, 2 * np.pi), cmap="twilight",
               vmin=0, vmax=2 * np.pi, interpolation="nearest")
    plt.title("LG vortex imprinted on a blaze")
    save_figure("structured_light_imprint.png")

    # Display on the (simulated) SLM.
    slm.set_phase(canvas, settle=False)
    print(f"  displayed pattern, SLM reports phase range "
          f"[{slm.phase.min():.2f}, {slm.phase.max():.2f}] rad")


if __name__ == "__main__":
    main()
