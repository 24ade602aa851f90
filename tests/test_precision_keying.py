"""
The Pallas-FFT contraction precision must be honored per COMPILED RUN,
not per process: the kernel bodies read the ``_DOT_PRECISION`` module
global at trace time, and a plain nested ``@jax.jit`` caches its jaxpr
by argument avals only — so without precision-keyed trace caches the
first-seen precision would be silently baked in and reused by every
later outer trace (making ``config.kernel_precision`` and the
scheduled engine's HIGHEST refine trace-order-dependent).

Reference analog: the reference exposes a single device-wide precision
(cupy f32); the per-run precision knob is TPU-native, so these are
original-contract tests.
"""

import numpy as np
import pytest

from slmsuite_tpu.ops import pallas_fft as PF


@pytest.fixture(autouse=True)
def _restore_precision():
    prior = PF._DOT_PRECISION
    yield
    PF._DOT_PRECISION = prior


def test_precision_keyed_jit_traces_once_per_precision():
    """One trace per (avals, precision); the global read at trace time
    is the precision the caller selected."""
    import jax.numpy as jnp

    traced = []

    @PF._precision_keyed_jit()
    def f(x):
        traced.append(PF._DOT_PRECISION)
        return x + 1

    x = jnp.zeros((4,), jnp.float32)
    PF.set_kernel_precision("HIGHEST")
    f(x)
    f(x)  # cache hit: no retrace
    PF.set_kernel_precision("DEFAULT")
    f(x)  # NEW trace under the new precision
    f(x)
    PF.set_kernel_precision("HIGHEST")
    f(x)  # back to the first jit object: no retrace
    assert traced == ["HIGHEST", "DEFAULT"]


def test_entry_points_retrace_on_precision_change(monkeypatch):
    """The real FFT entry points pick up a precision change on the next
    call (interpret mode on CPU): _dot3 sees the live global at each
    trace, in call order — not the first-seen global twice."""
    seen = []
    orig = PF._dot3

    def spy(*args, **kwargs):
        seen.append(PF._DOT_PRECISION)
        return orig(*args, **kwargs)

    monkeypatch.setattr(PF, "_dot3", spy)
    monkeypatch.setattr(PF, "_INTERPRET", True)

    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    xr = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))
    xi = jnp.zeros_like(xr)

    PF.set_kernel_precision("DEFAULT")
    r1 = PF._fft_rows(xr, xi, False)
    assert seen and set(seen) == {"DEFAULT"}

    seen.clear()
    PF.set_kernel_precision("HIGHEST")
    r2 = PF._fft_rows(xr, xi, False)
    assert seen and set(seen) == {"HIGHEST"}

    # Same math on CPU f32 regardless of the MXU precision flag.
    np.testing.assert_allclose(
        np.asarray(r1[0]), np.asarray(r2[0]), rtol=1e-5, atol=1e-5
    )


def test_engine_pin_restores_global_and_batch_path_pins():
    """run_gs_batch honors config.kernel_precision (it previously
    ignored it: the compiled batch run was never wrapped with the
    precision pin)."""
    import dataclasses

    import jax.tree_util as jtu
    import jax.numpy as jnp

    from slmsuite_tpu.models import spot_array_wgs
    from slmsuite_tpu.ops.engine import run_gs_batch

    m = spot_array_wgs(N=64, n_side=2, spacing_div=8)
    config = dataclasses.replace(m.config, kernel_precision="DEFAULT")
    states = jtu.tree_map(
        lambda *xs: jnp.stack(xs), m.init_state(), m.init_state()
    )
    consts = jtu.tree_map(lambda x: jnp.stack([x, x]), m.consts)

    prior = PF._DOT_PRECISION
    recorded = []
    orig_set = PF.set_kernel_precision

    def spy_set(p):
        recorded.append(p)
        return orig_set(p)

    PF.set_kernel_precision = spy_set
    try:
        run_gs_batch(config, states, consts, 2)
    finally:
        PF.set_kernel_precision = orig_set
    assert "DEFAULT" in recorded  # the pin engaged
    assert PF._DOT_PRECISION == prior  # and restored the global
