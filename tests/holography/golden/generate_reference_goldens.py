"""
Generate golden per-iteration traces from the *reference* ``slmsuite``.

Run with the reference package on the path (numpy backend)::

    MPLBACKEND=Agg PYTHONPATH=/root/reference python \
        tests/holography/golden/generate_reference_goldens.py

Writes one ``ref_<name>.npz`` per config in :mod:`configs` containing the
per-iteration ``{efficiency, uniformity, pkpk_err, std_err}`` arrays and
the final nearfield phase. These files are committed so that
``tests/holography/test_reference_parity.py`` runs in CI *without* the
reference mounted — they are the "numerical parity within FFT round-off"
evidence demanded by the project north star (BASELINE.md).
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import configs  # noqa: E402

try:
    import slmsuite  # noqa: F401
    from slmsuite.holography.algorithms import Hologram, SpotHologram
except ImportError as err:
    raise SystemExit(
        "The reference slmsuite package must be importable "
        "(PYTHONPATH=/root/reference). Error: %s" % err
    )


def main():
    import slmsuite

    print(f"reference slmsuite {slmsuite.__version__} ({slmsuite.__file__})")
    for name in configs.CONFIGS:
        stats, phase = configs.run_config(name, Hologram, SpotHologram)
        out = os.path.join(HERE, f"ref_{name}.npz")
        np.savez_compressed(out, phase=phase, **stats)
        print(
            f"{name}: eff[-1]={stats['efficiency'][-1]:.6f} "
            f"unif[-1]={stats['uniformity'][-1]:.6f} -> {out}"
        )


if __name__ == "__main__":
    main()
