"""
Real-TPU kernel parity (opt-in: ``SLMSUITE_TPU_TEST_PLATFORM=tpu``).

The default suite forces the CPU platform, so the Mosaic-compiled
kernels are exercised there only in interpreter mode; these tests run
the REAL kernels against their jnp twins on the chip. Run with::

    SLMSUITE_TPU_TEST_PLATFORM=tpu pytest tests/test_tpu_kernels.py
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SLMSUITE_TPU_TEST_PLATFORM", "cpu") != "tpu",
    reason="real-TPU kernel tests are opt-in (SLMSUITE_TPU_TEST_PLATFORM=tpu)",
)


@pytest.fixture(scope="module")
def tpu():
    import jax

    if jax.default_backend() in ("cpu",):
        pytest.skip("no TPU backend available")
    return jax


@pytest.mark.parametrize("N", [512, 384, 1536])
def test_fft_roundtrip_on_chip(tpu, N):
    """Pow2 and non-pow2 (384 = 24x16, 1536 = 48x32) splits both Mosaic-
    compile and round-trip on the chip."""
    import jax.numpy as jnp

    from slmsuite_tpu.ops import pallas_fft as pf

    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))
    fr, fi = pf.fft2_scrambled_pallas(xr, xi)
    br, bi = pf.ifft2_scrambled_pallas(fr, fi)
    assert float(jnp.abs(br - xr).max()) < 1e-4
    assert float(jnp.abs(bi - xi).max()) < 1e-4


def test_fused_step_matches_twin_on_chip(tpu):
    import jax.numpy as jnp

    from slmsuite_tpu.ops import fft as F
    from slmsuite_tpu.ops import pallas_fft as pf

    N = 512
    rng = np.random.default_rng(1)
    psi = jnp.asarray(rng.uniform(-np.pi, np.pi, (N, N)).astype(np.float32))
    target = np.zeros((N, N), np.float32)
    target[rng.integers(0, N, 32), rng.integers(0, N, 32)] = 1.0
    target /= np.sqrt((target**2).sum())
    w = jnp.asarray(target.copy())
    t = jnp.asarray(target)
    mask = jnp.asarray((target != 0).astype(np.float32))
    pff = psi * 0.5
    scalars = {
        "inv_prev_norm": jnp.float32(1.0),
        "apply_update": jnp.float32(1.0),
        "use_theta": jnp.float32(1.0),
        "feedback_exponent": jnp.float32(0.8),
        "feedback_factor": jnp.float32(0.1),
        "inv_fnorm": jnp.float32(1.0),
        "inv_tsum": jnp.float32(1.0 / (target**2).sum()),
        "inv_fsum": jnp.float32(1.0),
    }
    args = (psi, jnp.float32(1.0 / N), w, pff, t, mask, scalars)
    got = pf.wgs_fused_step_pallas(*args, rule="kim", kim=True, stats_on=True)
    ref = F._wgs_fused_forward_jnp(*args, rule="kim", kim=True, stats_on=True)
    nr, ni = F.ifft2_scrambled_pair(ref[0], ref[1])
    psi_ref = np.arctan2(np.asarray(ni), np.asarray(nr))

    # Phase compared with wrap on significant pixels.
    mag = np.hypot(np.asarray(nr), np.asarray(ni))
    sig = mag > mag.max() * 1e-3
    diff = np.angle(np.exp(1j * (np.asarray(got[0]) - psi_ref)))
    assert np.abs(diff[sig]).max() < 5e-4
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(ref[2]), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got[3]), np.asarray(ref[4]), atol=1e-3, rtol=1e-3
    )


def test_carry_step_matches_twin_on_chip(tpu):
    """The two-kernel carry-mode WGS step (the engine's hot loop) on the
    real chip matches the jnp twin through entry and exit."""
    import jax.numpy as jnp

    from slmsuite_tpu.ops import fft as F
    from slmsuite_tpu.ops import pallas_fft as pf

    N = 512
    rng = np.random.default_rng(3)
    psi = jnp.asarray(rng.uniform(-2 * np.pi, 2 * np.pi, (N, N)).astype(np.float32))
    target = np.zeros((N, N), np.float32)
    target[rng.integers(0, N, 32), rng.integers(0, N, 32)] = 1.0
    target /= np.sqrt((target**2).sum())
    t = jnp.asarray(target)
    mask = jnp.asarray((target != 0).astype(np.float32))
    pff = psi * 0.25
    scalars = {
        "inv_prev_norm": jnp.float32(1.0),
        "apply_update": jnp.float32(1.0),
        "use_theta": jnp.float32(1.0),
        "feedback_exponent": jnp.float32(0.8),
        "feedback_factor": jnp.float32(0.1),
        "inv_fnorm": jnp.float32(1.0),
        "inv_tsum": jnp.float32(1.0 / (target**2).sum()),
        "inv_fsum": jnp.float32(1.0),
    }
    amp = jnp.float32(1.0 / N)
    pff_pair = (jnp.cos(pff), jnp.sin(pff))
    args = (amp, jnp.asarray(target.copy()), pff_pair, t, mask, scalars)

    rg, ig = pf.wgs_carry_entry_pallas(psi, amp)
    got = pf.wgs_carry_step_pallas(rg, ig, *args, rule="kim", kim=True, stats_on=True)
    got_psi = np.asarray(pf.wgs_carry_exit_pallas(got[0], got[1]))

    tg, tgi = F._wgs_carry_entry_jnp(psi, amp)
    ref = F._wgs_carry_step_jnp(tg, tgi, *args, rule="kim", kim=True, stats_on=True)
    ref_psi = np.asarray(F._wgs_carry_exit_jnp(ref[0], ref[1]))

    scale = float(np.abs(np.asarray(ref[0])).max())
    assert np.abs(np.asarray(got[0]) - np.asarray(ref[0])).max() < 5e-4 * scale
    np.testing.assert_allclose(
        np.asarray(got[2]), np.asarray(ref[2]), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got[4]), np.asarray(ref[4]), atol=1e-3, rtol=1e-3
    )
    diff = np.angle(np.exp(1j * (got_psi - ref_psi)))
    assert np.percentile(np.abs(diff), 99) < 5e-3


def test_mraf_carry_step_matches_twin_on_chip(tpu):
    """The MRAF carry-mode step (complex-farfield mix + fused
    zero_factor) matches the jnp twin on the chip."""
    import jax.numpy as jnp

    from slmsuite_tpu.ops import fft as F
    from slmsuite_tpu.ops import pallas_fft as pf

    N = 512
    rng = np.random.default_rng(5)
    psi = jnp.asarray(rng.uniform(-np.pi, np.pi, (N, N)).astype(np.float32))
    target = np.zeros((N, N), np.float32)
    target[rng.integers(64, N - 64, 24), rng.integers(64, N - 64, 24)] = 1.0
    target /= np.sqrt((target**2).sum())
    mcode = np.where(target > 0, 1.0, 0.0).astype(np.float32)
    mcode[:32] = mcode[-32:] = 2.0
    mask = jnp.asarray((target != 0).astype(np.float32))
    zw = jnp.asarray(rng.normal(0, 1e-3, (2, N, N)).astype(np.float32))
    scalars = {
        "inv_prev_norm": jnp.float32(1.0),
        "apply_update": jnp.float32(1.0),
        "use_theta": jnp.float32(1.0),
        "feedback_exponent": jnp.float32(0.8),
        "feedback_factor": jnp.float32(0.1),
        "inv_fnorm": jnp.float32(1.0),
        "inv_tsum": jnp.float32(1.0 / (target**2).sum()),
        "inv_fsum": jnp.float32(1.0),
        "mraf_factor": jnp.float32(0.5),
        "zero_factor": jnp.float32(0.25),
    }
    amp = jnp.float32(1.0 / N)
    gr, gi = F._wgs_carry_entry_jnp(psi, amp)
    args = (
        gr, gi, amp, jnp.asarray(target.copy()),
        (jnp.cos(psi * 0.25), jnp.sin(psi * 0.25)),
        jnp.asarray(target), mask, jnp.asarray(mcode), zw, scalars,
    )
    got = pf.mraf_carry_step_pallas(*args, rule="kim", kim=True, stats_on=True, zero=True)
    ref = F._mraf_carry_step_jnp(*args, rule="kim", kim=True, stats_on=True, zero=True)
    scale = float(np.abs(np.asarray(ref[0])).max())
    assert np.abs(np.asarray(got[0]) - np.asarray(ref[0])).max() < 5e-4 * scale
    np.testing.assert_allclose(
        np.asarray(got[2]), np.asarray(ref[2]), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got[4]), np.asarray(ref[4]), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got[5]), np.asarray(ref[5]), atol=1e-3, rtol=1e-3
    )


def test_compressed_fused_iteration_on_chip(tpu):
    """The fused compressed round trip matches the jnp twin on the chip."""
    import jax.numpy as jnp

    from slmsuite_tpu.ops import compressed as C
    from slmsuite_tpu.ops import pallas_compressed as PC

    rng = np.random.default_rng(6)
    D, P, N = 4, 96 * 96, 40
    basis = jnp.asarray(rng.normal(size=(D, P)).astype(np.float32) * 2)
    coeffs = jnp.asarray((rng.normal(size=(D, N)) * 4).astype(np.float32))
    ffr = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    ffi = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))

    def unit(a, b):
        n = np.sqrt(float(jnp.sum(a * a + b * b)))
        return np.asarray(a) / n, np.asarray(b) / n

    got = unit(*PC.fused_iteration(ffr, ffi, coeffs, basis, jnp.float32(1.0), N))
    ref = unit(*C._fused_iteration_jnp(ffr, ffi, coeffs, basis, jnp.float32(1.0), N))
    np.testing.assert_allclose(got[0], ref[0], atol=2e-4)
    np.testing.assert_allclose(got[1], ref[1], atol=2e-4)


def test_compressed_kernels_match_twins_on_chip(tpu):
    import jax.numpy as jnp

    from slmsuite_tpu.ops import compressed as C
    from slmsuite_tpu.ops import pallas_compressed as PC

    rng = np.random.default_rng(2)
    D, P, N = 4, 64 * 64, 32
    basis = jnp.asarray(rng.normal(size=(D, P)).astype(np.float32))
    coeffs = jnp.asarray((rng.normal(size=(D, N)) * 3).astype(np.float32))
    ffr = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    ffi = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    nfr = jnp.asarray(rng.normal(size=(P,)).astype(np.float32))
    nfi = jnp.asarray(rng.normal(size=(P,)).astype(np.float32))

    ar, ai = PC.farfield_to_nearfield(ffr, ffi, coeffs, basis, N)
    br, bi = C.farfield_to_nearfield(ffr, ffi, coeffs, basis, N)
    scale = float(jnp.abs(br).max())
    assert float(jnp.abs(ar - br).max()) < 3e-5 * max(1.0, scale)

    cr, ci = PC.nearfield_to_farfield(nfr, nfi, coeffs, basis, N)
    dr, di = C.nearfield_to_farfield(nfr, nfi, coeffs, basis, N)
    assert float(jnp.abs(cr - dr).max()) < 3e-4
    assert float(jnp.abs(ci - di).max()) < 3e-4
