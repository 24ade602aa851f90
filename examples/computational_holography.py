"""
Computational holography: phase retrieval without hardware.

Covers the core :class:`Hologram` / :class:`SpotHologram` workflow —
GS and weighted-GS optimization, spot arrays, MRAF image targets, and
the per-iteration stats system. (Reference example:
``computational_holography`` notebook.)
"""

import numpy as np

from _rig import save_figure

from slmsuite_tpu.holography.algorithms import Hologram, SpotHologram


def main():
    shape = (512, 512)

    # --- 1. A 10x10 optical focus array with WGS-Kim. ---------------------
    print("SpotHologram: 10x10 grid, WGS-Kim")
    holo = SpotHologram.make_rectangular_array(
        shape, array_shape=(10, 10), array_pitch=(20, 20), basis="knm"
    )
    holo.optimize(
        "WGS-Kim", maxiter=30, verbose=False,
        stat_groups=["computational", "computational_spot"],
    )
    stats = holo.stats["stats"]["computational_spot"]
    print(f"  efficiency {stats['efficiency'][-1]:.3f}  "
          f"uniformity {stats['uniformity'][-1]:.4f}")

    holo.plot_farfield(title="10x10 WGS-Kim")
    save_figure("computational_spot_array.png")
    holo.plot_stats()
    save_figure("computational_stats.png")

    # --- 2. An image target with MRAF (amplitude freedom). ----------------
    print("Hologram: ring image target, WGS-Leonardo + MRAF")
    yy, xx = np.meshgrid(*(np.arange(s) - s / 2 for s in shape), indexing="ij")
    radius = np.sqrt(xx**2 + yy**2)
    target = np.where(np.abs(radius - 60) < 6, 1.0, 0.0).astype(np.float32)
    # nan marks the MRAF noise region (don't-care pixels).
    target[radius > 120] = np.nan

    holo_img = Hologram(target, slm_shape=(256, 256))
    holo_img.optimize(
        "WGS-Leonardo", maxiter=30, verbose=False, mraf_factor=0.5,
        stat_groups=["computational"],
    )
    eff = holo_img.stats["stats"]["computational"]["efficiency"][-1]
    print(f"  signal-region efficiency {eff:.3f}")
    holo_img.plot_farfield(title="Ring target (MRAF)")
    save_figure("computational_mraf_ring.png")

    # --- 3. Phase goes to an SLM. -----------------------------------------
    phase = holo.get_phase()  # (H, W) radians, ready for SLM.set_phase().
    print(f"  phase pattern: {phase.shape}, range "
          f"[{phase.min():.2f}, {phase.max():.2f}] rad")


if __name__ == "__main__":
    main()
