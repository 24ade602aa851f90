"""
Golden-trace parity against the *reference* slmsuite implementation.

The committed ``golden/ref_<name>.npz`` files hold per-iteration
``{efficiency, uniformity, pkpk_err, std_err}`` traces and the final
nearfield phase produced by the reference package (numpy backend, see
``golden/generate_reference_goldens.py``) for fixed seeds across GS, all
five WGS weight rules, both Kim phase-fixing triggers, MRAF (± zero
factor), a padded hologram, and spot-integrated feedback.

This is the project's north-star quality clause (BASELINE.md: "numerical
parity within FFT round-off across all WGS feedback variants") — measured
A/B divergence after 12 iterations is ~4e-7 on stats and ~2e-5 rad on
phase, so the tolerances below are round-off-scale with margin, far below
algorithmic differences.

Parity: reference ``tests/holography/test_algorithms.py:51-119``
(target/seed conventions).
"""

import importlib.util
import os

import numpy as np
import pytest

from slmsuite_tpu.holography.algorithms import Hologram, SpotHologram

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

_spec = importlib.util.spec_from_file_location(
    "golden_configs", os.path.join(GOLDEN_DIR, "configs.py")
)
configs = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(configs)

#: Aggregate per-iteration stats: round-off (~4e-7 measured) with margin.
STATS_ATOL = 1e-4
#: Final nearfield phase, after removing the global offset (~2e-5 measured).
PHASE_ATOL = 5e-3


def _golden(name):
    path = os.path.join(GOLDEN_DIR, f"ref_{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {path} not committed")
    return np.load(path)


@pytest.mark.parametrize("name", sorted(configs.CONFIGS))
def test_reference_parity(name):
    golden = _golden(name)
    stats, phase = configs.run_config(name, Hologram, SpotHologram)

    for key in configs.STAT_KEYS:
        ref = np.asarray(golden[key])
        got = np.asarray(stats[key])
        assert got.shape == ref.shape, (
            f"{name}/{key}: {got.shape} != golden {ref.shape}"
        )
        # std_err scales ~1/sqrt(pixels); compare absolutely like the rest.
        np.testing.assert_allclose(
            got, ref, atol=STATS_ATOL, rtol=1e-3,
            err_msg=f"{name}/{key} diverged from the reference trace",
        )

    # Final-phase parity, modulo the global phase offset (physically
    # meaningless) and 2*pi wrapping.
    dp = phase - np.asarray(golden["phase"])
    dp = np.mod(dp - dp.flat[0] + np.pi, 2 * np.pi) - np.pi
    assert np.max(np.abs(dp)) < PHASE_ATOL, (
        f"{name}: final phase diverged by {np.max(np.abs(dp)):.2e} rad"
    )


def test_kim_efficiency_trigger_differs_from_iteration_trigger():
    """The two Kim goldens must differ — proves both triggers were hit."""
    a = _golden("wgs_kim_iter")
    b = _golden("wgs_kim_eff")
    assert not np.allclose(a["uniformity"], b["uniformity"])
