r"""
Pallas four-step FFT: one HBM round-trip per axis.

The XLA matmul FFT (:mod:`slmsuite_tpu.ops.fft`) is HBM-bound: at
HIGHEST precision every DFT-matrix einsum re-reads the 2048^2 data from
HBM per bf16 pass — cost analysis shows ~1.16 GB accessed per fft2,
~17x the 66 MB a single read+write costs. These kernels keep a block of
rows (or columns) resident in VMEM through BOTH four-step stages and the
twiddle, so the data crosses HBM exactly once per axis per direction;
the HIGHEST-precision passes run against VMEM at on-chip bandwidth.

Mosaic constraints shape the code: the lane (last) dimension is never
split by a reshape, so blocks are transposed in VMEM to put the batch
index on lanes, the ``n = n1*n2`` split happens on the sublane axis, and
DFT contractions run as ``dot_general`` into 3D with the lane dimension
carried as a free batch.

Layout: the forward kernels emit the four-step's natural ``(k1, k2)``
("scrambled") order and the inverse kernels consume it — no transposes
in HBM (see ``scramble_permutation`` in :mod:`slmsuite_tpu.ops.fft`).
Combined with the scrambled GS loop (``ops.engine.set_scrambled_mode``),
a WGS iteration touches HBM several times less than the XLA path.

Replaces what the reference delegates to cuFFT (via cupy); the custom
kernel is justified because XLA's TPU FFT and the einsum formulation
both waste HBM bandwidth that Pallas keeps on-chip.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slmsuite_tpu.ops.fft import _plan

#: Rows/columns processed per grid step (VMEM-limited).
BLOCK = 128


@functools.lru_cache(maxsize=32)
def _plan_f32(n, inverse):
    """Four-step plan matrices as float32: each DFT factor is packed as
    the real BLOCK-COMPLEX matrix ``[[re, -im], [im, re]]`` so a stage's
    whole complex contraction runs as ONE real dot on stacked [re; im]
    data. On the MXU a dot with dims <= 128 costs one full (padded)
    pass regardless of size, so one (2n, 2n) block dot is ~3x cheaper
    than the three Karatsuba dots (and exactly as accurate as the plain
    four-dot complex arithmetic)."""
    n1, n2, w1, tw, w2 = _plan(n, inverse)

    def block(w):
        re = np.ascontiguousarray(w.real, np.float32)
        im = np.ascontiguousarray(w.imag, np.float32)
        top = np.concatenate([re, -im], axis=1)
        bot = np.concatenate([im, re], axis=1)
        return np.ascontiguousarray(np.concatenate([top, bot], axis=0))

    return (
        n1, n2,
        block(w1),
        np.ascontiguousarray(tw.real, np.float32),
        np.ascontiguousarray(tw.imag, np.float32),
        block(w2),
    )


#: MXU precision of the kernel DFT contractions:
#:
#: - ``"HIGHEST"`` (default): 6 bf16 passes, full f32 accuracy
#:   (~2e-7 relative per fft2) — the parity-verified mode.
#: - ``"BF16X3"``: 3 bf16 passes via a manual hi/lo split (Mosaic does
#:   not lower ``Precision.HIGH``); ~2e-5 relative per fft2 from the
#:   dropped lo*lo term — converged WGS quality is typically unchanged,
#:   a speed knob for throughput-bound workloads.
#: - ``"DEFAULT"``: single bf16 pass, ~3e-3 relative; visibly degrades
#:   converged uniformity, only for quality-tolerant preview loops.
#:
#: Overridable via SLMSUITE_TPU_FFT_KERNEL_PRECISION at import.
_DOT_PRECISION = "HIGHEST"


def set_kernel_precision(precision):
    """Set the Pallas-FFT contraction precision
    ("HIGHEST" | "BF16X3" | "DEFAULT").

    Takes effect on the next call: the jitted entry points key their
    trace caches on the live precision (:func:`_precision_keyed_jit`),
    so switching re-traces rather than silently reusing kernels baked
    at the old precision.
    """
    global _DOT_PRECISION
    if precision not in ("HIGHEST", "BF16X3", "DEFAULT"):
        raise ValueError(f"Unknown precision '{precision}'.")
    _DOT_PRECISION = precision


def _precision_keyed_jit(**jit_kwargs):
    """``jax.jit`` whose trace cache is KEYED on the live
    ``_DOT_PRECISION``.

    The kernel bodies read the module global at trace time; a plain
    nested ``@jax.jit`` caches its jaxpr by argument avals ONLY, so the
    first-seen precision would be baked in and silently reused by every
    later outer trace — making the per-run precision pin
    (:func:`slmsuite_tpu.ops.engine._with_kernel_precision`)
    trace-order-dependent on the non-fused engine paths. One jit object
    (hence one trace cache) per precision fixes that; the invariant that
    the global equals the key at first trace holds because the wrapper
    always passes the LIVE global.
    """
    def wrap(fn):
        @functools.lru_cache(maxsize=8)
        def _for_precision(precision):
            # jax's jit cache is keyed on the FUNCTION OBJECT (jitting
            # the same fn twice shares one trace cache), so each
            # precision needs its own closure. functools.wraps lets
            # jax's signature inspection resolve static_argnames
            # through __wrapped__.
            @functools.wraps(fn)
            def keyed(*args, **kwargs):
                return fn(*args, **kwargs)

            keyed.__name__ = f"{fn.__name__}[{precision}]"
            return jax.jit(keyed, **jit_kwargs)

        @functools.wraps(fn)
        def call(*args, **kwargs):
            return _for_precision(_DOT_PRECISION)(*args, **kwargs)

        return call

    return wrap


# Validate the env override HERE so a typo fails at import with the
# clear ValueError above, not as an AttributeError deep in the first
# FFT trace.
set_kernel_precision(
    __import__("os").environ.get("SLMSUITE_TPU_FFT_KERNEL_PRECISION", "HIGHEST")
)


def _split_bf16(a):
    """Split f32 into (hi, lo) bf16 parts with hi built by mantissa
    truncation THROUGH BITS — a plain f32->bf16->f32 round trip gets
    algebraically folded to the identity by XLA, which would silently
    zero the correction terms."""
    hi_f = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(a, jnp.uint32) & jnp.uint32(0xFFFF0000),
        jnp.float32,
    )
    return hi_f.astype(jnp.bfloat16), (a - hi_f).astype(jnp.bfloat16)


def _dot3(w, x, dims=(((1,), (0,)), ((), ()))):
    """(m, a) contract (a, b, lanes) -> (m, b, lanes); lanes ride free."""
    if _DOT_PRECISION == "BF16X3":
        wh, wl = _split_bf16(w)
        xh, xl = _split_bf16(x)

        def d(a, b):
            return jax.lax.dot_general(
                a, b, dims,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        return d(wh, xh) + d(wh, xl) + d(wl, xh)
    return jax.lax.dot_general(
        w, x, dims,
        preferred_element_type=jnp.float32,
        precision=getattr(jax.lax.Precision, _DOT_PRECISION),
    )


#: Contract the lhs's last axis with the MIDDLE axis of a 3D rhs:
#: (m, a) x (b, a, lanes) -> (m, b, lanes). The DFT factor matrices are
#: symmetric, so stage contractions can run in either orientation — this
#: one keeps the data stationary (no VMEM relayout before the dot).
_MID_DIMS = (((1,), (1,)), ((), ()))


def _fft_core(xr, xi, w1b, twr, twi, w2b, n1, n2, inverse):
    """
    Four-step FFT of an ``(n, L)`` pair along axis 0 (L lanes ride free).

    Forward: natural axis-0 order in -> scrambled ``(k1, k2)`` out.
    Inverse: scrambled in -> natural out (conjugate plan, mirrored
    contraction order — relayout-free via middle-axis contractions; the
    DFT factors are symmetric, so orientation is free).

    Each stage is ONE real block-complex dot (``w1b``/``w2b`` pack
    ``[[re, -im], [im, re]]``) over [re; im]-stacked data: on the MXU a
    dot costs one padded pass regardless of dims <= 128, so this is ~3x
    fewer passes than per-component dots.
    """
    L = xr.shape[1]
    xr = xr.reshape(n1, n2, L)
    xi = xi.reshape(n1, n2, L)

    if not inverse:
        # Stage 1: contract n1 -> k1 on [re; im] stacked along axis 0.
        x = jnp.concatenate([xr, xi], axis=0)           # (2n1, n2, L)
        a = _dot3(w1b, x)                               # (2k1, n2, L)
        ar, ai = a[:n1], a[n1:]
        # Stage 2: twiddle (k1, n2).
        tr = twr[:, :, None]
        ti = twi[:, :, None]
        ar, ai = ar * tr - ai * ti, ar * ti + ai * tr
        # Stage 3: contract the MIDDLE axis (n2 -> k2) directly.
        a2 = jnp.concatenate([ar, ai], axis=1)          # (k1, 2n2, L)
        b = _dot3(w2b, a2, _MID_DIMS)                   # (2k2, k1, L)
        br = b[:n2].transpose(1, 0, 2)                  # (k1, k2, L)
        bi = b[n2:].transpose(1, 0, 2)
    else:
        # Input (k1, k2, L): contract k2 (middle axis) with conj W2
        # first, then k1 (middle axis again) — fully relayout-free.
        x2 = jnp.concatenate([xr, xi], axis=1)          # (k1, 2k2, L)
        a = _dot3(w2b, x2, _MID_DIMS)                   # (2m2, k1, L)
        ar, ai = a[:n2], a[n2:]
        # Conjugate twiddle, indexed (k1, m2) -> broadcast as (m2, k1).
        tr = twr.T[:, :, None]
        ti = twi.T[:, :, None]
        ar, ai = ar * tr - ai * ti, ar * ti + ai * tr
        a2 = jnp.concatenate([ar, ai], axis=1)          # (m2, 2k1, L)
        b = _dot3(w1b, a2, _MID_DIMS)                   # (2m1, m2, L)
        br, bi = b[:n1], b[n1:]

    return br.reshape(n1 * n2, L), bi.reshape(n1 * n2, L)


def _rows_kernel(xr_ref, xi_ref, w1b_ref, twr_ref, twi_ref, w2b_ref, outr_ref, outi_ref,
                 *, n1, n2, inverse):
    """FFT along the LAST axis of a (BLOCK, n) block: transpose in VMEM
    so the transform axis is sublane-major, then run the core."""
    xr = xr_ref[...].T                                  # (n, R)
    xi = xi_ref[...].T
    br, bi = _fft_core(
        xr, xi, w1b_ref[...], twr_ref[...],
        twi_ref[...], w2b_ref[...],
        n1, n2, inverse,
    )
    outr_ref[...] = br.T
    outi_ref[...] = bi.T


def _sincos(x):
    """
    Elementwise (sin, cos) for ``x`` in [-pi, pi] — the only range the
    fused loop produces (folded phase, atan2 outputs). Mosaic's generic
    sin/cos lower with full range reduction (~40 cycles/element,
    measured 0.16 ms per 2048^2 plane); this quadrant fold + minimax
    polynomial pair costs ~1e-7 abs error (the f32 noise floor) at a
    fraction of that.
    """
    ax = jnp.abs(x)
    fold = ax > jnp.float32(np.pi / 2)
    y = jnp.where(fold, jnp.float32(np.pi) - ax, ax)
    y = jnp.where(x < 0, -y, y)
    z = y * y
    s = y * (
        jnp.float32(9.999999765127e-01)
        + z * (jnp.float32(-1.666664759280e-01)
        + z * (jnp.float32(8.332899211157e-03)
        + z * (jnp.float32(-1.980086458602e-04)
        + z * jnp.float32(2.590428569071e-06))))
    )
    c = (
        jnp.float32(9.999999997799e-01)
        + z * (jnp.float32(-4.999999935693e-01)
        + z * (jnp.float32(4.166663620793e-02)
        + z * (jnp.float32(-1.388836082953e-03)
        + z * (jnp.float32(2.476013483820e-05)
        + z * jnp.float32(-2.605106415131e-07)))))
    )
    return s, jnp.where(fold, -c, c)


def _sincos_reduced(x):
    """
    Elementwise (sin, cos) for unbounded ``x``: round-to-nearest period
    reduction with a two-term 2*pi split (the residual stays accurate to
    ~|k| * 1e-7 rad — below the f32 ulp of the input itself for the
    multi-radian phases this serves), then the bounded minimax pair.
    """
    two_pi_hi = jnp.float32(6.28125)
    two_pi_lo = jnp.float32(1.9353071795864769e-3)
    two_pi = jnp.float32(2.0 * np.pi)
    pi = jnp.float32(np.pi)
    k = jnp.round(x * jnp.float32(1.0 / (2.0 * np.pi)))
    y = (x - k * two_pi_hi) - k * two_pi_lo
    # The f32 multiply inside round() can pick k off by one near period
    # boundaries, leaving |y| up to |x|*eps beyond pi — FOLD it back
    # (clipping here would cost ~1e-3 at 1e4 rad).
    y = jnp.where(y > pi, y - two_pi, y)
    y = jnp.where(y < -pi, y + two_pi, y)
    return _sincos(y)


def _atan2(y, x):
    """
    Elementwise atan2 built from supported Mosaic ops (no atan/atan2
    lowering exists): octant reduction + Cephes-style single-precision
    arctan polynomial with the (t-1)/(t+1) fold at tan(pi/8) — accuracy
    ~1e-7 rad, far below the FFT's own f32 noise floor.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.where(swap, ay, ax)
    t = num / jnp.maximum(den, jnp.float32(1e-37))

    hi = t > jnp.float32(0.41421356)
    u = jnp.where(hi, (t - 1.0) / (t + 1.0), t)
    z = u * u
    p = (
        (jnp.float32(8.05374449538e-2) * z - jnp.float32(1.38776856032e-1)) * z
        + jnp.float32(1.99777106478e-1)
    ) * z - jnp.float32(3.33329491539e-1)
    r = u + u * z * p
    r = jnp.where(hi, r + jnp.float32(0.78539816), r)

    r = jnp.where(swap, jnp.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0, jnp.float32(np.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def _cols_kernel(xr_ref, xi_ref, w1b_ref, twr_ref, twi_ref, w2b_ref, outr_ref, outi_ref,
                 *, n1, n2, inverse, polar_out=False, scale=1.0):
    """FFT along the FIRST axis of an (n, BLOCK) block: already
    sublane-major, no transposes at all. With ``polar_out`` the epilogue
    emits (amplitude, phase) instead of (re, im) — fusing the GS loop's
    abs/arctan2 into the FFT so the complex farfield never hits HBM."""
    br, bi = _fft_core(
        xr_ref[...], xi_ref[...], w1b_ref[...], twr_ref[...],
        twi_ref[...], w2b_ref[...], n1, n2, inverse,
    )
    if polar_out:
        br = br * scale
        bi = bi * scale
        outr_ref[...] = jnp.sqrt(br * br + bi * bi)
        outi_ref[...] = _atan2(bi, br)
    else:
        outr_ref[...] = br
        outi_ref[...] = bi


def _call(kernel, grid, data_spec, mats, xr, xi, n1, n2, inverse, **kw):
    H, W = xr.shape
    const_specs = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in mats]
    out = pl.pallas_call(
        functools.partial(kernel, n1=n1, n2=n2, inverse=inverse, **kw),
        grid=grid,
        in_specs=[data_spec, data_spec] + const_specs,
        out_specs=[data_spec, data_spec],
        out_shape=[
            jax.ShapeDtypeStruct((H, W), jnp.float32),
            jax.ShapeDtypeStruct((H, W), jnp.float32),
        ],
        # The 16 MB scoped-VMEM default is conservative; the block's
        # working set (in/out pairs + stage intermediates) peaks ~18 MB.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(xr, xi, *[jnp.asarray(m) for m in mats])
    return out[0], out[1]


@_precision_keyed_jit(static_argnames=("inverse",))
def _fft_rows(xr, xi, inverse):
    H, W = xr.shape
    n1, n2, *mats = _plan_f32(W, inverse)
    block = min(BLOCK, H)
    return _call(
        _rows_kernel, (H // block,),
        pl.BlockSpec((block, W), lambda i: (i, 0)),
        mats, xr, xi, n1, n2, inverse,
    )


@_precision_keyed_jit(static_argnames=("inverse",))
def _fft_cols(xr, xi, inverse):
    H, W = xr.shape
    n1, n2, *mats = _plan_f32(H, inverse)
    block = min(BLOCK, W)
    return _call(
        _cols_kernel, (W // block,),
        pl.BlockSpec((H, block), lambda i: (0, i)),
        mats, xr, xi, n1, n2, inverse,
    )


def fft2_scrambled_pallas(xr, xi):
    """Forward ortho 2D FFT, natural in -> scrambled (k1,k2) rows/cols out."""
    H, W = xr.shape[-2:]
    xr, xi = _fft_rows(xr, xi, False)
    xr, xi = _fft_cols(xr, xi, False)
    scale = 1.0 / np.sqrt(H * W)
    return xr * scale, xi * scale


@_precision_keyed_jit()
def fft2_scrambled_polar_pallas(xr, xi):
    """
    Forward ortho 2D FFT returning ``(amplitude, phase)`` in the
    scrambled layout; the polar conversion happens in the final kernel's
    epilogue, so the complex farfield never materializes in HBM.
    """
    H, W = xr.shape[-2:]
    xr, xi = _fft_rows(xr, xi, False)
    n1, n2, *mats = _plan_f32(H, False)
    block = min(BLOCK, W)
    return _call(
        _cols_kernel, (W // block,),
        pl.BlockSpec((H, block), lambda i: (0, i)),
        mats, xr, xi, n1, n2, False,
        polar_out=True, scale=1.0 / np.sqrt(H * W),
    )


def ifft2_scrambled_pallas(xr, xi):
    """Inverse ortho 2D FFT consuming the scrambled layout, natural out."""
    H, W = xr.shape[-2:]
    xr, xi = _fft_rows(xr, xi, True)
    xr, xi = _fft_cols(xr, xi, True)
    scale = 1.0 / np.sqrt(H * W)
    return xr * scale, xi * scale


# --------------------------------------------------------------------------
# GS-loop end fusions: phase in, phase out.
#
# When the computational farfield equals the SLM shape with no
# propagation kernel (the common spot-holography case), the nearfield is
# exactly amp * exp(i psi): the forward rows kernel can synthesize it in
# its prologue (the complex nearfield never hits HBM), and the inverse
# cols kernel can emit the new psi = atan2(im, re) directly (the complex
# back-propagated nearfield never hits HBM either).
#
# Going further, the WGS weight update + Kim phase select + amplitude
# constraint + per-iteration statistics all fuse into the forward cols
# kernel's epilogue (see `_cols_wgs_kernel`): the kernel emits the
# *constrained* farfield (re, im) directly, so |F| and arg(F) never hit
# HBM either. Two global couplings are broken to make the update
# one-pass:
#
# - Deferred-by-one weight normalization: every rule's correction factor
#   is independent of the weight scale and the extracted psi is
#   scale-invariant, so dividing by the PREVIOUS iteration's norm (an
#   accumulated scalar carried in the scan state) preserves the exact
#   trajectory; weights are renormalized once at the end of the run.
# - Parseval feedback norm: sum(|F|^2) over the full plane equals
#   sum(amp^2) exactly for the ortho transform, so the feedback
#   normalization (Wu/tanh) and the stats' feedback power are
#   precomputed constants instead of a prior reduction pass.
#
# Per-iteration statistics reduce to one-pass partials under the same
# substitution; the kernel accumulates them into two (8, 128) VMEM
# accumulator tiles revisited across the sequential grid.
# --------------------------------------------------------------------------


def _rows_phase_kernel(psi_ref, w1b_ref, twr_ref, twi_ref, w2b_ref,
                       outr_ref, outi_ref, *, n1, n2):
    """Forward rows FFT whose input is synthesized as e^{i psi}
    (scalar amplitudes fold into the output scale by linearity).

    psi is UNBOUNDED here: iteration-0 enters with the folded initial
    phase (random init reaches 2*pi; quadratic/blaze/lens warm starts
    span many radians), so the full-range reduction is mandatory —
    the bounded ``_sincos`` diverges like |y|^9 outside ~3*pi/2."""
    psi = psi_ref[...].T                                # (n, R)
    xi, xr = _sincos_reduced(psi)
    br, bi = _fft_core(
        xr, xi, w1b_ref[...], twr_ref[...],
        twi_ref[...], w2b_ref[...],
        n1, n2, False,
    )
    outr_ref[...] = br.T
    outi_ref[...] = bi.T


def _rows_phase_amp_kernel(psi_ref, amp_ref, w1b_ref, twr_ref, twi_ref,
                           w2b_ref, outr_ref, outi_ref, *, n1, n2):
    """Like :meth:`_rows_phase_kernel` with a per-pixel amplitude array
    (same unbounded-psi contract: full range reduction)."""
    psi = psi_ref[...].T
    amp = amp_ref[...].T
    xi, xr = _sincos_reduced(psi)
    xr = amp * xr
    xi = amp * xi
    br, bi = _fft_core(
        xr, xi, w1b_ref[...], twr_ref[...],
        twi_ref[...], w2b_ref[...],
        n1, n2, False,
    )
    outr_ref[...] = br.T
    outi_ref[...] = bi.T


def _cols_phase_kernel(xr_ref, xi_ref, w1b_ref, twr_ref, twi_ref, w2b_ref, out_ref,
                       *, n1, n2):
    """Inverse cols FFT emitting only the phase of the result."""
    br, bi = _fft_core(
        xr_ref[...], xi_ref[...], w1b_ref[...], twr_ref[...],
        twi_ref[...], w2b_ref[...], n1, n2, True,
    )
    out_ref[...] = _atan2(bi, br)


@_precision_keyed_jit()
def fft2_scrambled_polar_from_phase(psi, amp):
    """
    Forward ortho 2D FFT of ``amp * exp(i psi)`` returning scrambled
    ``(amplitude, phase)``; neither the complex nearfield nor the complex
    farfield ever materializes. ``amp`` may be a scalar or an (H, W) array.
    """
    H, W = psi.shape
    n1, n2, *mats = _plan_f32(W, False)
    block = min(BLOCK, H)
    data_spec = pl.BlockSpec((block, W), lambda i: (i, 0))
    const_specs = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in mats]
    out_shape = [
        jax.ShapeDtypeStruct((H, W), jnp.float32),
        jax.ShapeDtypeStruct((H, W), jnp.float32),
    ]
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    scalar_amp = jnp.ndim(amp) == 0
    if scalar_amp:
        xr, xi = pl.pallas_call(
            functools.partial(_rows_phase_kernel, n1=n1, n2=n2),
            grid=(H // block,),
            in_specs=[data_spec] + const_specs,
            out_specs=[data_spec, data_spec],
            out_shape=out_shape,
            compiler_params=params,
            interpret=_INTERPRET,
        )(psi, *[jnp.asarray(m) for m in mats])
    else:
        xr, xi = pl.pallas_call(
            functools.partial(_rows_phase_amp_kernel, n1=n1, n2=n2),
            grid=(H // block,),
            in_specs=[data_spec, data_spec] + const_specs,
            out_specs=[data_spec, data_spec],
            out_shape=out_shape,
            compiler_params=params,
            interpret=_INTERPRET,
        )(psi, amp, *[jnp.asarray(m) for m in mats])

    # Columns pass with fused polar epilogue.
    n1c, n2c, *cmats = _plan_f32(H, False)
    blockc = min(BLOCK, W)
    data_specc = pl.BlockSpec((H, blockc), lambda i: (0, i))
    cconst = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in cmats]
    amp_ff, theta = pl.pallas_call(
        functools.partial(
            _cols_kernel, n1=n1c, n2=n2c, inverse=False,
            polar_out=True, scale=1.0 / np.sqrt(H * W),
        ),
        grid=(W // blockc,),
        in_specs=[data_specc, data_specc] + cconst,
        out_specs=[data_specc, data_specc],
        out_shape=out_shape,
        compiler_params=params,
        interpret=_INTERPRET,
    )(xr, xi, *[jnp.asarray(m) for m in cmats])
    if scalar_amp:
        # Linearity: the scalar amplitude scales |F| only (fuses into
        # the next consumer of amp_ff under jit).
        amp_ff = amp_ff * amp
    return amp_ff, theta


#: Test hook: run the fused-WGS pallas_call in interpreter mode (CPU).
_INTERPRET = False

#: Fill value standing in for -inf in max accumulators (avoids inf-inf).
_NEG_FILL = -3.0e38

#: Scalar lane layout of the fused kernel's (1, 128) scalars operand.
_SC_POST_SCALE = 0      # ortho scale (x scalar amp when amp is scalar)
_SC_INV_PREV_NORM = 1   # 1 / previous iteration's weight norm
_SC_APPLY_UPDATE = 2    # 0/1: WGS update active (iteration > 0)
_SC_USE_THETA = 3       # 0/1: Kim — use current farfield phase
_SC_EXPONENT = 4        # feedback_exponent
_SC_FACTOR = 5          # feedback_factor
_SC_INV_FNORM = 6       # 1 / sqrt(Parseval feedback power)
_SC_INV_TSUM = 7        # 1 / sum(target^2)
_SC_INV_FSUM = 8        # 1 / Parseval feedback power
_SC_MRAF_K = 9          # MRAF noise-region retention factor
_SC_INV_WNORM = 10      # 1 / ||w * c|| (exact, MRAF semi-fused step)
_SC_ZERO_FACTOR = 11    # MRAF evolving zero-region weight step size


def _weight_correction(f, t, scal_ref, rule):
    """Elementwise WGS weight-correction factor ``c`` (never depends on
    the weight scale); guards mirror ``update_weights_generic``."""
    p = scal_ref[0, _SC_EXPONENT]
    if rule in ("leonardo", "kim"):
        # (f/t)^(-p) via exp/log. The division is pre-guarded (same
        # result as dividing then masking, but interpret-mode checkify
        # runs would flag the transient x/0).
        on = t != 0
        c = f / jnp.where(on, t, 1.0)
        c = jnp.where(jnp.isfinite(c) & on & (c > 0), c, 1.0)
        c = jnp.exp(-p * jnp.log(c))
    elif rule == "wu":
        term = t - p * f * scal_ref[0, _SC_INV_FNORM]
        c = jnp.exp(p * term)
    elif rule == "tanh":
        term = t - p * f * scal_ref[0, _SC_INV_FNORM]
        c = 1.0 + scal_ref[0, _SC_FACTOR] * jnp.tanh(p * term)
    else:
        raise ValueError(f"Unfusable rule '{rule}'.")
    return jnp.where(jnp.isinf(c), 1.0, c)


def _parse_wgs_refs(refs, kim, stats_on, phasor=False):
    """Split a WGS kernel's variadic refs
    ``[mask], [pff...] | re, im, wout, [pffout...], accs, accm`` into a
    dict. ``phasor=True`` (carry-mode kernels) stores the farfield phase
    as a unit phasor PAIR ``(pffr, pffi)`` instead of an angle plane —
    the kernels then run without a single transcendental (the atan2 +
    sincos round trip is replaced by one rsqrt normalization)."""
    idx = 0
    out = {}
    out["mask"] = refs[idx] if stats_on else None
    idx += 1 if stats_on else 0
    n_pff = (2 if phasor else 1) if kim else 0
    out["pff"] = refs[idx:idx + n_pff] if kim else None
    idx += n_pff
    out["re"], out["im"], out["wout"] = refs[idx:idx + 3]
    idx += 3
    out["pffout"] = refs[idx:idx + n_pff] if kim else None
    idx += n_pff
    out["accs"], out["accm"] = refs[idx:idx + 2]
    return out


def _wgs_epilogue(br, bi, w_ref, t_ref, scal_ref, r, *,
                  rule, kim, stats_on, phasor=False):
    """
    Fused WGS epilogue on a transformed (H, block) column tile:

    1. f = post_scale * |F|, farfield direction e^{i theta}
    2. weight correction (rule in leonardo/kim/wu/tanh), deferred norm
    3. Kim phase select (use_theta ? theta : stored phase)
    4. constrained farfield re/im = w_new * (cos, sin)(phase)
    5. accumulate stats partials + the new weights' norm^2

    ``r`` is the parsed ref dict from :meth:`_parse_wgs_refs`; stores
    everything except the constrained re/im, which it returns.

    ``phasor=True`` (carry mode): the stored phase is a unit-phasor
    pair, so e^{i theta} = F * rsqrt(|F|^2) — no transcendental at all.
    Otherwise the stored phase is an angle plane (atan2 + sincos).
    """
    mask_ref = r["mask"]
    pff_ref = r["pff"]
    wout_ref = r["wout"]
    pffout_ref = r["pffout"]
    accs_ref = r["accs"]
    accm_ref = r["accm"]

    post = scal_ref[0, _SC_POST_SCALE]
    inv_prev = scal_ref[0, _SC_INV_PREV_NORM]
    apply_u = scal_ref[0, _SC_APPLY_UPDATE]

    f2 = br * br + bi * bi
    f = jnp.sqrt(f2) * post
    t = t_ref[...]
    w = w_ref[...]

    c = _weight_correction(f, t, scal_ref, rule)

    uw = w * c
    uw = jnp.where(jnp.isnan(uw), jnp.float32(1e-4), uw)
    wout = jnp.where(apply_u > 0, uw * inv_prev, w)
    wout_ref[...] = wout

    if phasor:
        # Pre-guarded rsqrt (interpret-mode checkify would flag the
        # transient 0 * inf in the untaken where-branch).
        invb = jax.lax.rsqrt(jnp.where(f2 > 0, f2, 1.0))
        # Zero field -> the atan2(0, 0) = 0 convention (unit real).
        er = jnp.where(f2 > 0, br * invb, 1.0)
        ei = jnp.where(f2 > 0, bi * invb, 0.0)
        if kim:
            use_theta = scal_ref[0, _SC_USE_THETA] > 0
            cos_p = jnp.where(use_theta, er, pff_ref[0][...])
            sin_p = jnp.where(use_theta, ei, pff_ref[1][...])
            pffout_ref[0][...] = cos_p
            pffout_ref[1][...] = sin_p
        else:
            cos_p, sin_p = er, ei
    else:
        theta = _atan2(bi, br)
        if kim:
            phase = jnp.where(
                scal_ref[0, _SC_USE_THETA] > 0, theta, pff_ref[0][...]
            )
            pffout_ref[0][...] = phase
        else:
            phase = theta
        sin_p, cos_p = _sincos(phase)
    re = wout * cos_p
    im = wout * sin_p

    # --- Accumulators (revisited (8, 128) tiles; grid is sequential). ---
    norm_p = jnp.sum(wout * wout)
    sums_tile, maxs_tile = _acc_tiles(
        f, t, mask_ref[...] if stats_on else None, scal_ref, norm_p
    )
    _acc_update(accs_ref, accm_ref, sums_tile, maxs_tile)
    return re, im


def _acc_tiles(f, t, mask, scal_ref, norm_p):
    """Per-tile stats partials packed into (8, 128) accumulator tiles:
    sums rows = [overlap, err_sum, err_sq_sum, norm_sq], maxs rows =
    [err_max, u_max, -err_min, -u_min]. ``mask=None`` skips stats."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def at(j, value, fill=0.0):
        return jnp.where((rows == j) & (cols == 0), value, jnp.float32(fill))

    if mask is not None:
        inv_tsum = scal_ref[0, _SC_INV_TSUM]
        inv_fsum = scal_ref[0, _SC_INV_FSUM]
        fsq = f * f
        tsq = t * t
        overlap_p = jnp.sum(t * f)
        err = (tsq * inv_tsum - fsq * inv_fsum) * mask
        err_sum_p = jnp.sum(err)
        err_sq_p = jnp.sum(err * err)
        u = fsq / jnp.where(mask > 0, tsq, 1.0)
        neg = jnp.float32(_NEG_FILL)
        on = mask > 0
        err_full = tsq * inv_tsum - fsq * inv_fsum
        err_max_p = jnp.max(jnp.where(on, err_full, neg))
        neg_err_min_p = jnp.max(jnp.where(on, -err_full, neg))
        u_max_p = jnp.max(jnp.where(on, u, neg))
        neg_u_min_p = jnp.max(jnp.where(on, -u, neg))
        sums_tile = (
            at(0, overlap_p) + at(1, err_sum_p) + at(2, err_sq_p) + at(3, norm_p)
        )
        maxs_tile = jnp.maximum(
            jnp.maximum(at(0, err_max_p, _NEG_FILL), at(1, u_max_p, _NEG_FILL)),
            jnp.maximum(
                at(2, neg_err_min_p, _NEG_FILL), at(3, neg_u_min_p, _NEG_FILL)
            ),
        )
    else:
        sums_tile = at(3, norm_p)
        maxs_tile = jnp.full((8, 128), jnp.float32(_NEG_FILL))
    return sums_tile, maxs_tile


def _acc_update(accs_ref, accm_ref, sums_tile, maxs_tile):
    """Zero-init on the first grid step, then accumulate (sequential grid)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        accs_ref[...] = jnp.zeros((8, 128), jnp.float32)
        accm_ref[...] = jnp.full((8, 128), jnp.float32(_NEG_FILL))

    accs_ref[...] += sums_tile
    accm_ref[...] = jnp.maximum(accm_ref[...], maxs_tile)


def _cols_wgs_kernel(xr_ref, xi_ref, w1b_ref, twr_ref, twi_ref, w2b_ref,
                     w_ref, t_ref, scal_ref, *refs,
                     n1, n2, rule, kim, stats_on):
    """Forward cols FFT + fused WGS epilogue on an (H, block) column tile.

    Variadic refs: ``[mask], [pff] | re, im, wout, [pffout], accs, accm``.
    """
    br, bi = _fft_core(
        xr_ref[...], xi_ref[...], w1b_ref[...], twr_ref[...],
        twi_ref[...], w2b_ref[...], n1, n2, False,
    )
    r = _parse_wgs_refs(refs, kim, stats_on)
    re, im = _wgs_epilogue(
        br, bi, w_ref, t_ref, scal_ref, r,
        rule=rule, kim=kim, stats_on=stats_on,
    )
    r["re"][...] = re
    r["im"][...] = im


def _cols_wgs_roundtrip_kernel(xr_ref, xi_ref,
                               w1b_ref, twr_ref, twi_ref, w2b_ref,
                               v1b_ref, vtr_ref, vti_ref, v2b_ref,
                               w_ref, t_ref, scal_ref, *refs,
                               n1, n2, rule, kim, stats_on, phasor=False):
    """
    Full column-axis round trip of one WGS iteration on an (H, block)
    column tile: forward cols FFT + fused WGS epilogue + INVERSE cols
    FFT of the constrained farfield — exploiting that the two axis
    passes of a separable 2D transform commute, so the inverse can
    consume the column-blocked constrained field directly and the
    constrained (re, im) never crosses HBM at all. The ``v*`` refs hold
    the conjugate (inverse) plan matrices.

    Variadic refs: ``[mask], [pff...] | re, im, wout, [pffout...],
    accs, accm`` where (re, im) receive the half-inverted (column-axis
    natural, row-axis still scrambled) field. In phasor mode (the carry
    step) the Kim phase store is a unit-phasor pair and the kernel runs
    without transcendentals.
    """
    br, bi = _fft_core(
        xr_ref[...], xi_ref[...], w1b_ref[...], twr_ref[...],
        twi_ref[...], w2b_ref[...], n1, n2, False,
    )
    r = _parse_wgs_refs(refs, kim, stats_on, phasor=phasor)
    re, im = _wgs_epilogue(
        br, bi, w_ref, t_ref, scal_ref, r,
        rule=rule, kim=kim, stats_on=stats_on, phasor=phasor,
    )
    cr, ci = _fft_core(
        re, im, v1b_ref[...], vtr_ref[...],
        vti_ref[...], v2b_ref[...],
        n1, n2, True,
    )
    r["re"][...] = cr
    r["im"][...] = ci


def _rows_normfwd_kernel(xr_ref, xi_ref,
                         i1b_ref, itr_ref, iti_ref, i2b_ref,
                         f1b_ref, ftr_ref, fti_ref, f2b_ref,
                         outr_ref, outi_ref, *, n1, n2):
    """Rows round trip with amplitude replacement, on a (block, W) row
    tile: inverse row-axis FFT of the half-inverted constrained field
    -> complex nearfield Z -> replace |Z| by the source amplitude
    (``Z/|Z|``: ONE rsqrt instead of the atan2 + sincos pair of the
    separate extract/synthesize kernels; a scalar amplitude folds into
    the cols kernel's post scale by linearity) -> forward row-axis FFT.
    The nearfield phase never materializes in HBM inside the loop —
    the carry between iterations is the rows-transformed field pair.
    The ``i*``/``f*`` refs hold the inverse/forward plan matrices."""
    xr = xr_ref[...].T
    xi = xi_ref[...].T
    zr, zi = _fft_core(
        xr, xi, i1b_ref[...], itr_ref[...], iti_ref[...], i2b_ref[...],
        n1, n2, True,
    )
    mag2 = zr * zr + zi * zi
    inv = jax.lax.rsqrt(jnp.where(mag2 > 0, mag2, 1.0))  # checkify-safe
    # Zero field -> unit real direction, matching atan2(0, 0) = 0 in the
    # phase formulation.
    ur = jnp.where(mag2 > 0, zr * inv, 1.0)
    ui = jnp.where(mag2 > 0, zi * inv, 0.0)
    gr, gi = _fft_core(
        ur, ui, f1b_ref[...], ftr_ref[...], fti_ref[...], f2b_ref[...],
        n1, n2, False,
    )
    outr_ref[...] = gr.T
    outi_ref[...] = gi.T


def _rows_normfwd_amp_kernel(xr_ref, xi_ref, amp_ref,
                             i1b_ref, itr_ref, iti_ref, i2b_ref,
                             f1b_ref, ftr_ref, fti_ref, f2b_ref,
                             outr_ref, outi_ref, *, n1, n2):
    """Like :meth:`_rows_normfwd_kernel` with a per-pixel amplitude."""
    xr = xr_ref[...].T
    xi = xi_ref[...].T
    amp = amp_ref[...].T
    zr, zi = _fft_core(
        xr, xi, i1b_ref[...], itr_ref[...], iti_ref[...], i2b_ref[...],
        n1, n2, True,
    )
    mag2 = zr * zr + zi * zi
    inv = amp * jax.lax.rsqrt(jnp.where(mag2 > 0, mag2, 1.0))  # checkify-safe
    ur = jnp.where(mag2 > 0, zr * inv, amp)
    ui = jnp.where(mag2 > 0, zi * inv, 0.0)
    gr, gi = _fft_core(
        ur, ui, f1b_ref[...], ftr_ref[...], fti_ref[...], f2b_ref[...],
        n1, n2, False,
    )
    outr_ref[...] = gr.T
    outi_ref[...] = gi.T


def _rows_phase_extract_kernel(xr_ref, xi_ref, w1b_ref, twr_ref, twi_ref, w2b_ref, out_ref, *, n1, n2):
    """Inverse ROW-axis FFT of a (block, W) row tile, emitting only the
    result's phase (the GS psi update): transpose in VMEM, inverse core,
    atan2, transpose back."""
    xr = xr_ref[...].T
    xi = xi_ref[...].T
    br, bi = _fft_core(
        xr, xi, w1b_ref[...], twr_ref[...],
        twi_ref[...], w2b_ref[...],
        n1, n2, True,
    )
    out_ref[...] = _atan2(bi, br).T


def wgs_fused_forward_pallas(psi, amp, weights, phase_ff, target, mask,
                             scalars, *, rule, kim, stats_on):
    """
    Fused forward half of a WGS iteration in the scrambled layout:
    FFT of ``amp * exp(i psi)`` + stats partials + weight update + Kim
    select + amplitude constraint. Neither |F|, arg(F), nor the complex
    nearfield/farfield ever materializes in HBM.

    Parameters mirror :meth:`slmsuite_tpu.ops.fft.wgs_fused_forward`
    (the jnp twin defines the semantics). Returns
    ``(re, im, weights_out, phase_ff_out | None, sums (4,), maxs (4,))``
    where sums = [overlap, err_sum, err_sq_sum, norm_sq] and
    maxs = [err_max, u_max, -err_min, -u_min].
    """
    H, W = psi.shape
    scalar_amp = jnp.ndim(amp) == 0

    # Rows pass: synthesize the nearfield from phase (+ amplitude).
    n1, n2, *mats = _plan_f32(W, False)
    block = min(BLOCK, H)
    data_spec = pl.BlockSpec((block, W), lambda i: (i, 0))
    const_specs = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in mats]
    out_shape2 = [
        jax.ShapeDtypeStruct((H, W), jnp.float32),
        jax.ShapeDtypeStruct((H, W), jnp.float32),
    ]
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    if scalar_amp:
        xr, xi = pl.pallas_call(
            functools.partial(_rows_phase_kernel, n1=n1, n2=n2),
            grid=(H // block,),
            in_specs=[data_spec] + const_specs,
            out_specs=[data_spec, data_spec],
            out_shape=out_shape2,
            compiler_params=params,
            interpret=_INTERPRET,
        )(psi, *[jnp.asarray(m) for m in mats])
        post = jnp.float32(1.0 / np.sqrt(H * W)) * amp
    else:
        xr, xi = pl.pallas_call(
            functools.partial(_rows_phase_amp_kernel, n1=n1, n2=n2),
            grid=(H // block,),
            in_specs=[data_spec, data_spec] + const_specs,
            out_specs=[data_spec, data_spec],
            out_shape=out_shape2,
            compiler_params=params,
            interpret=_INTERPRET,
        )(psi, amp, *[jnp.asarray(m) for m in mats])
        post = jnp.float32(1.0 / np.sqrt(H * W))

    # Scalars operand (1, 128).
    vec = jnp.zeros((128,), jnp.float32)
    vec = vec.at[_SC_POST_SCALE].set(post)
    vec = vec.at[_SC_INV_PREV_NORM].set(scalars["inv_prev_norm"])
    vec = vec.at[_SC_APPLY_UPDATE].set(scalars["apply_update"])
    vec = vec.at[_SC_USE_THETA].set(scalars.get("use_theta", jnp.float32(1.0)))
    vec = vec.at[_SC_EXPONENT].set(scalars["feedback_exponent"])
    vec = vec.at[_SC_FACTOR].set(scalars["feedback_factor"])
    vec = vec.at[_SC_INV_FNORM].set(scalars["inv_fnorm"])
    vec = vec.at[_SC_INV_TSUM].set(scalars["inv_tsum"])
    vec = vec.at[_SC_INV_FSUM].set(scalars["inv_fsum"])
    vec = vec.reshape(1, 128)

    # Cols pass with the fused WGS epilogue.
    n1c, n2c, *cmats = _plan_f32(H, False)
    blockc = min(BLOCK, W)
    col_spec = pl.BlockSpec((H, blockc), lambda i: (0, i))
    cconst = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in cmats]
    scal_spec = pl.BlockSpec((1, 128), lambda i: (0, 0))
    acc_spec = pl.BlockSpec((8, 128), lambda i: (0, 0))
    plane = jax.ShapeDtypeStruct((H, W), jnp.float32)
    acc = jax.ShapeDtypeStruct((8, 128), jnp.float32)

    in_specs = [col_spec, col_spec] + cconst + [col_spec, col_spec, scal_spec]
    operands = [xr, xi] + [jnp.asarray(m) for m in cmats] + [weights, target, vec]
    if stats_on:
        in_specs.append(col_spec)
        operands.append(mask)
    if kim:
        in_specs.append(col_spec)
        operands.append(phase_ff)

    out_specs = [col_spec, col_spec, col_spec]
    out_shape = [plane, plane, plane]
    if kim:
        out_specs.append(col_spec)
        out_shape.append(plane)
    out_specs += [acc_spec, acc_spec]
    out_shape += [acc, acc]

    outs = pl.pallas_call(
        functools.partial(
            _cols_wgs_kernel, n1=n1c, n2=n2c,
            rule=rule, kim=kim, stats_on=stats_on,
        ),
        grid=(W // blockc,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=params,
        interpret=_INTERPRET,
    )(*operands)

    re, im, wout = outs[0], outs[1], outs[2]
    pff_out = outs[3] if kim else None
    accs, accm = outs[-2], outs[-1]
    return re, im, wout, pff_out, accs[:4, 0], accm[:4, 0]


def wgs_fused_step_pallas(psi, amp, weights, phase_ff, target, mask,
                          scalars, *, rule, kim, stats_on):
    """
    One COMPLETE WGS iteration in three kernels (scrambled layout),
    psi in -> psi out:

    1. rows kernel: synthesize ``amp * exp(i psi)``, forward row-axis FFT
    2. cols round-trip kernel: forward col-axis FFT + fused WGS epilogue
       (stats partials, weight update, Kim select, amplitude constraint)
       + INVERSE col-axis FFT — the axis passes of the separable 2D
       transform commute, so the constrained farfield never crosses HBM
    3. rows kernel: inverse row-axis FFT + phase extraction (atan2)

    vs the forward-half + ``ifft2_scrambled_phase`` composition this
    saves one kernel launch and a full (re, im) HBM round trip per
    iteration (20 -> 16 plane crossings).

    Returns ``(psi_out, weights_out, phase_ff_out | None, sums, maxs)``.
    """
    H, W = psi.shape
    scalar_amp = jnp.ndim(amp) == 0

    # --- K1: rows pass, nearfield synthesized from phase. ---
    n1, n2, *mats = _plan_f32(W, False)
    block = min(BLOCK, H)
    row_spec = pl.BlockSpec((block, W), lambda i: (i, 0))
    const_specs = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in mats]
    plane = jax.ShapeDtypeStruct((H, W), jnp.float32)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    if scalar_amp:
        xr, xi = pl.pallas_call(
            functools.partial(_rows_phase_kernel, n1=n1, n2=n2),
            grid=(H // block,),
            in_specs=[row_spec] + const_specs,
            out_specs=[row_spec, row_spec],
            out_shape=[plane, plane],
            compiler_params=params,
            interpret=_INTERPRET,
        )(psi, *[jnp.asarray(m) for m in mats])
        post = jnp.float32(1.0 / np.sqrt(H * W)) * amp
    else:
        xr, xi = pl.pallas_call(
            functools.partial(_rows_phase_amp_kernel, n1=n1, n2=n2),
            grid=(H // block,),
            in_specs=[row_spec, row_spec] + const_specs,
            out_specs=[row_spec, row_spec],
            out_shape=[plane, plane],
            compiler_params=params,
            interpret=_INTERPRET,
        )(psi, amp, *[jnp.asarray(m) for m in mats])
        post = jnp.float32(1.0 / np.sqrt(H * W))

    vec = jnp.zeros((128,), jnp.float32)
    vec = vec.at[_SC_POST_SCALE].set(post)
    vec = vec.at[_SC_INV_PREV_NORM].set(scalars["inv_prev_norm"])
    vec = vec.at[_SC_APPLY_UPDATE].set(scalars["apply_update"])
    vec = vec.at[_SC_USE_THETA].set(scalars.get("use_theta", jnp.float32(1.0)))
    vec = vec.at[_SC_EXPONENT].set(scalars["feedback_exponent"])
    vec = vec.at[_SC_FACTOR].set(scalars["feedback_factor"])
    vec = vec.at[_SC_INV_FNORM].set(scalars["inv_fnorm"])
    vec = vec.at[_SC_INV_TSUM].set(scalars["inv_tsum"])
    vec = vec.at[_SC_INV_FSUM].set(scalars["inv_fsum"])
    vec = vec.reshape(1, 128)

    # --- K2: cols round trip (fwd FFT + WGS + inv FFT). ---
    n1c, n2c, *fmats = _plan_f32(H, False)
    _, _, *imats = _plan_f32(H, True)
    blockc = min(BLOCK, W)
    col_spec = pl.BlockSpec((H, blockc), lambda i: (0, i))
    cconst = [
        pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in fmats + imats
    ]
    scal_spec = pl.BlockSpec((1, 128), lambda i: (0, 0))
    acc_spec = pl.BlockSpec((8, 128), lambda i: (0, 0))
    acc = jax.ShapeDtypeStruct((8, 128), jnp.float32)

    in_specs = [col_spec, col_spec] + cconst + [col_spec, col_spec, scal_spec]
    operands = (
        [xr, xi]
        + [jnp.asarray(m) for m in fmats + imats]
        + [weights, target, vec]
    )
    if stats_on:
        in_specs.append(col_spec)
        operands.append(mask)
    if kim:
        in_specs.append(col_spec)
        operands.append(phase_ff)

    out_specs = [col_spec, col_spec, col_spec]
    out_shape = [plane, plane, plane]
    if kim:
        out_specs.append(col_spec)
        out_shape.append(plane)
    out_specs += [acc_spec, acc_spec]
    out_shape += [acc, acc]

    outs = pl.pallas_call(
        functools.partial(
            _cols_wgs_roundtrip_kernel, n1=n1c, n2=n2c,
            rule=rule, kim=kim, stats_on=stats_on,
        ),
        grid=(W // blockc,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=params,
        interpret=_INTERPRET,
    )(*operands)

    hr, hi, wout = outs[0], outs[1], outs[2]
    pff_out = outs[3] if kim else None
    accs, accm = outs[-2], outs[-1]

    # --- K3: inverse rows pass + phase extraction. ---
    n1r, n2r, *rmats = _plan_f32(W, True)
    rconst = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in rmats]
    psi_out = pl.pallas_call(
        functools.partial(_rows_phase_extract_kernel, n1=n1r, n2=n2r),
        grid=(H // block,),
        in_specs=[row_spec, row_spec] + rconst,
        out_specs=row_spec,
        out_shape=plane,
        compiler_params=params,
        interpret=_INTERPRET,
    )(hr, hi, *[jnp.asarray(m) for m in rmats])

    return psi_out, wout, pff_out, accs[:4, 0], accm[:4, 0]


# --------------------------------------------------------------------------
# Carry-mode WGS step (two kernels per iteration).
#
# The three-kernel step still extracts psi (atan2) in K3 and re-
# synthesizes e^{i psi} (sincos) in the next iteration's K1 — but the
# loop never needs psi itself, only the re-normalized nearfield
# amp * Z/|Z|. Carrying the ROWS-TRANSFORMED field pair (gr, gi) across
# iterations instead of psi merges K3+K1 into one rows round-trip kernel
# with a single rsqrt (inverse rows FFT -> normalize -> forward rows
# FFT), saving one kernel launch and two HBM plane crossings per
# iteration (16 -> 14 tiles) and deleting ~55 VPU transcendental
# ops/element. psi exists only at the boundaries:
#
#   entry  psi -> (gr, gi)      rows kernel, sincos_reduced (unbounded psi)
#   iter   (gr, gi) -> K_B cols round trip + WGS epilogue -> (hr, hi)
#                   -> K_A rows round trip + normalize     -> (gr', gi')
#   exit   (gr, gi) -> psi      inverse rows + atan2
# --------------------------------------------------------------------------


def _wgs_scal_vec(scalars, post, extra=()):
    """Pack the fused-WGS dynamic scalars into the (1, 128) operand."""
    vec = jnp.zeros((128,), jnp.float32)
    vec = vec.at[_SC_POST_SCALE].set(post)
    vec = vec.at[_SC_INV_PREV_NORM].set(scalars["inv_prev_norm"])
    vec = vec.at[_SC_APPLY_UPDATE].set(scalars["apply_update"])
    vec = vec.at[_SC_USE_THETA].set(scalars.get("use_theta", jnp.float32(1.0)))
    vec = vec.at[_SC_EXPONENT].set(scalars["feedback_exponent"])
    vec = vec.at[_SC_FACTOR].set(scalars["feedback_factor"])
    vec = vec.at[_SC_INV_FNORM].set(scalars["inv_fnorm"])
    vec = vec.at[_SC_INV_TSUM].set(scalars["inv_tsum"])
    vec = vec.at[_SC_INV_FSUM].set(scalars["inv_fsum"])
    for j, v in extra:
        vec = vec.at[j].set(v)
    return vec.reshape(1, 128)


def wgs_carry_entry_pallas(psi, amp):
    """psi (natural, unbounded) -> rows-scrambled field carry (gr, gi)
    of ``e^{i psi}`` (scalar amp; folds into the cols post scale) or
    ``amp * e^{i psi}`` (array amp). One rows kernel."""
    H, W = psi.shape
    n1, n2, *mats = _plan_f32(W, False)
    block = min(BLOCK, H)
    row_spec = pl.BlockSpec((block, W), lambda i: (i, 0))
    const_specs = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in mats]
    plane = jax.ShapeDtypeStruct((H, W), jnp.float32)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    if jnp.ndim(amp) == 0:
        return pl.pallas_call(
            functools.partial(_rows_phase_kernel, n1=n1, n2=n2),
            grid=(H // block,),
            in_specs=[row_spec] + const_specs,
            out_specs=[row_spec, row_spec],
            out_shape=[plane, plane],
            compiler_params=params,
            interpret=_INTERPRET,
        )(psi, *[jnp.asarray(m) for m in mats])
    return pl.pallas_call(
        functools.partial(_rows_phase_amp_kernel, n1=n1, n2=n2),
        grid=(H // block,),
        in_specs=[row_spec, row_spec] + const_specs,
        out_specs=[row_spec, row_spec],
        out_shape=[plane, plane],
        compiler_params=params,
        interpret=_INTERPRET,
    )(psi, amp, *[jnp.asarray(m) for m in mats])


def wgs_carry_exit_pallas(gr, gi):
    """Rows-scrambled field carry -> psi (inverse rows + atan2): the
    phase of the nearfield the carry encodes (normalization drops out
    of atan2)."""
    H, W = gr.shape
    n1, n2, *mats = _plan_f32(W, True)
    block = min(BLOCK, H)
    row_spec = pl.BlockSpec((block, W), lambda i: (i, 0))
    rconst = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in mats]
    return pl.pallas_call(
        functools.partial(_rows_phase_extract_kernel, n1=n1, n2=n2),
        grid=(H // block,),
        in_specs=[row_spec, row_spec] + rconst,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(gr, gi, *[jnp.asarray(m) for m in mats])


def wgs_carry_step_pallas(gr, gi, amp, weights, phase_ff, target, mask,
                          scalars, *, rule, kim, stats_on):
    """
    One COMPLETE WGS iteration on the rows-transformed carry, in TWO
    kernels: the cols round-trip kernel (forward cols FFT + fused WGS
    epilogue + inverse cols FFT) and the rows round-trip kernel (inverse
    rows FFT + amplitude replacement + forward rows FFT).

    ``phase_ff`` is the Kim phase store as a unit-phasor PAIR
    ``(pffr, pffi)`` (``kim=True``) or None — the angle plane never
    exists inside the loop, so the step runs without atan2/sincos (the
    engine converts at the scan boundaries).

    Returns ``(gr_out, gi_out, weights_out, phase_ff_out | None, sums,
    maxs)`` with the :meth:`wgs_fused_forward_pallas` stats conventions;
    ``phase_ff_out`` is the updated phasor pair.
    """
    H, W = gr.shape
    scalar_amp = jnp.ndim(amp) == 0
    post = jnp.float32(1.0 / np.sqrt(H * W)) * (amp if scalar_amp else 1.0)

    plane = jax.ShapeDtypeStruct((H, W), jnp.float32)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    # --- K_B: cols round trip (fwd FFT + WGS epilogue + inv FFT). ---
    n1c, n2c, *fmats = _plan_f32(H, False)
    _, _, *imats = _plan_f32(H, True)
    blockc = min(BLOCK, W)
    col_spec = pl.BlockSpec((H, blockc), lambda i: (0, i))
    cconst = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in fmats + imats]
    scal_spec = pl.BlockSpec((1, 128), lambda i: (0, 0))
    acc_spec = pl.BlockSpec((8, 128), lambda i: (0, 0))
    acc = jax.ShapeDtypeStruct((8, 128), jnp.float32)

    in_specs = [col_spec, col_spec] + cconst + [col_spec, col_spec, scal_spec]
    operands = (
        [gr, gi]
        + [jnp.asarray(m) for m in fmats + imats]
        + [weights, target, _wgs_scal_vec(scalars, post)]
    )
    if stats_on:
        in_specs.append(col_spec)
        operands.append(mask)
    if kim:
        in_specs += [col_spec, col_spec]
        operands += [phase_ff[0], phase_ff[1]]

    out_specs = [col_spec, col_spec, col_spec]
    out_shape = [plane, plane, plane]
    if kim:
        out_specs += [col_spec, col_spec]
        out_shape += [plane, plane]
    out_specs += [acc_spec, acc_spec]
    out_shape += [acc, acc]

    outs = pl.pallas_call(
        functools.partial(
            _cols_wgs_roundtrip_kernel, n1=n1c, n2=n2c,
            rule=rule, kim=kim, stats_on=stats_on, phasor=True,
        ),
        grid=(W // blockc,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=params,
        interpret=_INTERPRET,
    )(*operands)

    hr, hi, wout = outs[0], outs[1], outs[2]
    pff_out = (outs[3], outs[4]) if kim else None
    accs, accm = outs[-2], outs[-1]

    # --- K_A: rows round trip + amplitude replacement. ---
    n1r, n2r, *rimats = _plan_f32(W, True)
    _, _, *rfmats = _plan_f32(W, False)
    block = min(BLOCK, H)
    row_spec = pl.BlockSpec((block, W), lambda i: (i, 0))
    rconst = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in rimats + rfmats]
    rmat_ops = [jnp.asarray(m) for m in rimats + rfmats]
    if scalar_amp:
        gr2, gi2 = pl.pallas_call(
            functools.partial(_rows_normfwd_kernel, n1=n1r, n2=n2r),
            grid=(H // block,),
            in_specs=[row_spec, row_spec] + rconst,
            out_specs=[row_spec, row_spec],
            out_shape=[plane, plane],
            compiler_params=params,
            interpret=_INTERPRET,
        )(hr, hi, *rmat_ops)
    else:
        gr2, gi2 = pl.pallas_call(
            functools.partial(_rows_normfwd_amp_kernel, n1=n1r, n2=n2r),
            grid=(H // block,),
            in_specs=[row_spec, row_spec, row_spec] + rconst,
            out_specs=[row_spec, row_spec],
            out_shape=[plane, plane],
            compiler_params=params,
            interpret=_INTERPRET,
        )(hr, hi, amp, *rmat_ops)

    return gr2, gi2, wout, pff_out, accs[:4, 0], accm[:4, 0]


# --------------------------------------------------------------------------
# MRAF semi-fused step (four kernels + one exact scalar sync).
#
# MRAF (mixed-region amplitude freedom) mixes the *normalized* updated
# weights in the signal region with the free-evolving farfield in the
# noise region — the signal:noise relative scale requires the EXACT
# current weight norm, so the one-kernel round trip of the plain WGS step
# (which defers normalization by a whole iteration) cannot apply. Instead:
#
#   K1  rows forward (synthesize amp * e^{i psi})
#   K2f cols forward + polar + unnormalized weight update uw = w*c +
#       stats partials + sum(uw^2) accumulator
#   (XLA: inv_norm = rsqrt(sum(uw^2)) — one scalar op)
#   K2b constraint mix (signal: uw*inv_norm * e^{i phi}; noise:
#       k * f * e^{i theta}; zero: 0) + INVERSE cols pass
#   K3  rows inverse + phase extraction
#
# The complex farfield still never exists in HBM; only f, theta, uw (and
# the half-transformed field) cross between kernels. The weight state is
# carried UNNORMALIZED with its norm as a scalar (same convention as the
# fused WGS step) and renormalized once on exit.
# --------------------------------------------------------------------------


def _cols_mraf_fwd_kernel(xr_ref, xi_ref, w1b_ref, twr_ref, twi_ref,
                          w2b_ref, w_ref, t_ref, scal_ref, *refs,
                          n1, n2, rule, stats_on):
    """Forward cols FFT + polar + unnormalized WGS weight update.

    Variadic refs: ``[mask] | f, theta, uw, accs, accm``.
    """
    br, bi = _fft_core(
        xr_ref[...], xi_ref[...], w1b_ref[...], twr_ref[...],
        twi_ref[...], w2b_ref[...], n1, n2, False,
    )
    idx = 0
    mask_ref = refs[idx] if stats_on else None
    idx += 1 if stats_on else 0
    f_ref, th_ref, uw_ref, accs_ref, accm_ref = refs[idx:idx + 5]

    post = scal_ref[0, _SC_POST_SCALE]
    apply_u = scal_ref[0, _SC_APPLY_UPDATE]
    inv_prev = scal_ref[0, _SC_INV_PREV_NORM]

    f = jnp.sqrt(br * br + bi * bi) * post
    theta = _atan2(bi, br)
    t = t_ref[...]
    w = w_ref[...]

    c = _weight_correction(f, t, scal_ref, rule)
    uw = w * c
    uw = jnp.where(jnp.isnan(uw), jnp.float32(1e-4), uw)
    # Scale by the PREVIOUS norm to keep the carry bounded across long
    # scans; the mix below renormalizes EXACTLY via _SC_INV_WNORM.
    uw = jnp.where(apply_u > 0, uw * inv_prev, w)

    f_ref[...] = f
    th_ref[...] = theta
    uw_ref[...] = uw

    norm_p = jnp.sum(uw * uw)
    sums_tile, maxs_tile = _acc_tiles(
        f, t, mask_ref[...] if stats_on else None, scal_ref, norm_p
    )
    _acc_update(accs_ref, accm_ref, sums_tile, maxs_tile)


def _cols_mraf_inv_kernel(f_ref, th_ref, uw_ref, mc_ref,
                          v1b_ref, vtr_ref, vti_ref, v2b_ref,
                          scal_ref, *refs, n1, n2, kim):
    """MRAF constraint mix + INVERSE cols FFT on an (H, block) tile.

    Variadic refs: ``[pff] | hr, hi, [pffout]``. ``mc`` codes the
    farfield regions: 1 = signal, 2 = noise, 0 = zero.
    """
    idx = 0
    pff_ref = refs[idx] if kim else None
    idx += 1 if kim else 0
    hr_ref, hi_ref = refs[idx:idx + 2]
    idx += 2
    pffout_ref = refs[idx] if kim else None

    f = f_ref[...]
    theta = th_ref[...]
    uw = uw_ref[...]
    mc = mc_ref[...]

    inv_norm = scal_ref[0, _SC_INV_WNORM]
    k = scal_ref[0, _SC_MRAF_K]

    if kim:
        phase = jnp.where(scal_ref[0, _SC_USE_THETA] > 0, theta, pff_ref[...])
        pffout_ref[...] = phase
    else:
        phase = theta
    sin_p, cos_p = _sincos(phase)

    wn = uw * inv_norm
    if kim:
        sin_t, cos_t = _sincos(theta)
    else:
        sin_t, cos_t = sin_p, cos_p

    sig = mc == 1.0
    noi = mc == 2.0
    re = jnp.where(sig, wn * cos_p, jnp.where(noi, k * f * cos_t, 0.0))
    im = jnp.where(sig, wn * sin_p, jnp.where(noi, k * f * sin_t, 0.0))

    cr, ci = _fft_core(
        re, im, v1b_ref[...], vtr_ref[...],
        vti_ref[...], v2b_ref[...],
        n1, n2, True,
    )
    hr_ref[...] = cr
    hi_ref[...] = ci


def mraf_fused_step_pallas(psi, amp, weights, phase_ff, target, mask,
                           mcode, scalars, *, rule, kim, stats_on):
    """
    One complete MRAF WGS iteration (scrambled layout), psi in -> psi out.

    ``weights`` is the UNNORMALIZED carry (its norm rides in
    ``scalars["inv_prev_norm"]``'s place conventionally — but MRAF needs
    the exact CURRENT norm, which this step computes internally between
    the forward and inverse column passes).

    Returns ``(psi_out, uw, phase_ff_out | None, sums, maxs)`` where
    ``uw`` is the new unnormalized weight plane and ``sums[3]`` its
    squared norm (stats partials follow the fused WGS conventions, with
    the stats' weight norm row being sum(uw^2)).
    """
    H, W = psi.shape
    scalar_amp = jnp.ndim(amp) == 0

    # --- K1: rows pass, nearfield synthesized from phase. ---
    n1, n2, *mats = _plan_f32(W, False)
    block = min(BLOCK, H)
    row_spec = pl.BlockSpec((block, W), lambda i: (i, 0))
    const_specs = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in mats]
    plane = jax.ShapeDtypeStruct((H, W), jnp.float32)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    if scalar_amp:
        xr, xi = pl.pallas_call(
            functools.partial(_rows_phase_kernel, n1=n1, n2=n2),
            grid=(H // block,),
            in_specs=[row_spec] + const_specs,
            out_specs=[row_spec, row_spec],
            out_shape=[plane, plane],
            compiler_params=params,
            interpret=_INTERPRET,
        )(psi, *[jnp.asarray(m) for m in mats])
        post = jnp.float32(1.0 / np.sqrt(H * W)) * amp
    else:
        xr, xi = pl.pallas_call(
            functools.partial(_rows_phase_amp_kernel, n1=n1, n2=n2),
            grid=(H // block,),
            in_specs=[row_spec, row_spec] + const_specs,
            out_specs=[row_spec, row_spec],
            out_shape=[plane, plane],
            compiler_params=params,
            interpret=_INTERPRET,
        )(psi, amp, *[jnp.asarray(m) for m in mats])
        post = jnp.float32(1.0 / np.sqrt(H * W))

    def scal_vec(extra=()):
        vec = jnp.zeros((128,), jnp.float32)
        vec = vec.at[_SC_POST_SCALE].set(post)
        vec = vec.at[_SC_INV_PREV_NORM].set(scalars["inv_prev_norm"])
        vec = vec.at[_SC_APPLY_UPDATE].set(scalars["apply_update"])
        vec = vec.at[_SC_USE_THETA].set(
            scalars.get("use_theta", jnp.float32(1.0))
        )
        vec = vec.at[_SC_EXPONENT].set(scalars["feedback_exponent"])
        vec = vec.at[_SC_FACTOR].set(scalars["feedback_factor"])
        vec = vec.at[_SC_INV_FNORM].set(scalars["inv_fnorm"])
        vec = vec.at[_SC_INV_TSUM].set(scalars["inv_tsum"])
        vec = vec.at[_SC_INV_FSUM].set(scalars["inv_fsum"])
        vec = vec.at[_SC_MRAF_K].set(scalars["mraf_factor"])
        for j, v in extra:
            vec = vec.at[j].set(v)
        return vec.reshape(1, 128)

    # --- K2f: cols forward + polar + unnormalized weight update. ---
    n1c, n2c, *fmats = _plan_f32(H, False)
    blockc = min(BLOCK, W)
    col_spec = pl.BlockSpec((H, blockc), lambda i: (0, i))
    fconst = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in fmats]
    scal_spec = pl.BlockSpec((1, 128), lambda i: (0, 0))
    acc_spec = pl.BlockSpec((8, 128), lambda i: (0, 0))
    acc = jax.ShapeDtypeStruct((8, 128), jnp.float32)

    in_specs = [col_spec, col_spec] + fconst + [col_spec, col_spec, scal_spec]
    operands = (
        [xr, xi] + [jnp.asarray(m) for m in fmats]
        + [weights, target, scal_vec()]
    )
    if stats_on:
        in_specs.append(col_spec)
        operands.append(mask)

    outs = pl.pallas_call(
        functools.partial(
            _cols_mraf_fwd_kernel, n1=n1c, n2=n2c, rule=rule,
            stats_on=stats_on,
        ),
        grid=(W // blockc,),
        in_specs=in_specs,
        out_specs=[col_spec, col_spec, col_spec, acc_spec, acc_spec],
        out_shape=[plane, plane, plane, acc, acc],
        compiler_params=params,
        interpret=_INTERPRET,
    )(*operands)
    f, theta, uw, accs, accm = outs

    # --- Exact norm sync (the one reduction MRAF fundamentally needs). ---
    inv_norm = jax.lax.rsqrt(accs[3, 0])

    # --- K2b: constraint mix + inverse cols pass. ---
    _, _, *imats = _plan_f32(H, True)
    iconst = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in imats]
    in_specs = (
        [col_spec, col_spec, col_spec, col_spec] + iconst + [scal_spec]
    )
    operands = (
        [f, theta, uw, mcode] + [jnp.asarray(m) for m in imats]
        + [scal_vec(extra=((_SC_INV_WNORM, inv_norm),))]
    )
    if kim:
        in_specs.append(col_spec)
        operands.append(phase_ff)
    out_specs = [col_spec, col_spec]
    out_shape = [plane, plane]
    if kim:
        out_specs.append(col_spec)
        out_shape.append(plane)

    outs = pl.pallas_call(
        functools.partial(_cols_mraf_inv_kernel, n1=n1c, n2=n2c, kim=kim),
        grid=(W // blockc,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=params,
        interpret=_INTERPRET,
    )(*operands)
    hr, hi = outs[0], outs[1]
    pff_out = outs[2] if kim else None

    # --- K3: inverse rows pass + phase extraction. ---
    n1r, n2r, *rmats = _plan_f32(W, True)
    rconst = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in rmats]
    psi_out = pl.pallas_call(
        functools.partial(_rows_phase_extract_kernel, n1=n1r, n2=n2r),
        grid=(H // block,),
        in_specs=[row_spec, row_spec] + rconst,
        out_specs=row_spec,
        out_shape=plane,
        compiler_params=params,
        interpret=_INTERPRET,
    )(hr, hi, *[jnp.asarray(m) for m in rmats])

    return psi_out, uw, pff_out, accs[:4, 0], accm[:4, 0]


# --------------------------------------------------------------------------
# MRAF carry-mode step (three kernels + one exact scalar sync).
#
# Carry-mode analog of the semi-fused MRAF step: the loop carries the
# rows-transformed pair, and the kernels exchange the SCALED COMPLEX
# farfield (fr, fi) = post * (br, bi) instead of (|F|, arg F) — the
# noise branch of the mix is then just k * (fr, fi) and the signal
# branch's e^{i theta} is (fr, fi)/|F| (one rsqrt): for non-Kim rules
# the whole mix runs without a single transcendental. Evolving
# zero-region weights (zero_factor) fold into the mix kernel as an
# elementwise complex update of a carried (2, H, W) plane.
# --------------------------------------------------------------------------


def _cols_mraf_fwd2_kernel(xr_ref, xi_ref, w1b_ref, twr_ref, twi_ref,
                           w2b_ref, w_ref, t_ref, scal_ref, *refs,
                           n1, n2, rule, stats_on):
    """Forward cols FFT + unnormalized WGS weight update, emitting the
    scaled complex farfield.

    Variadic refs: ``[mask] | fr, fi, uw, accs, accm``.
    """
    br, bi = _fft_core(
        xr_ref[...], xi_ref[...], w1b_ref[...], twr_ref[...],
        twi_ref[...], w2b_ref[...], n1, n2, False,
    )
    idx = 0
    mask_ref = refs[idx] if stats_on else None
    idx += 1 if stats_on else 0
    fr_ref, fi_ref, uw_ref, accs_ref, accm_ref = refs[idx:idx + 5]

    post = scal_ref[0, _SC_POST_SCALE]
    apply_u = scal_ref[0, _SC_APPLY_UPDATE]
    inv_prev = scal_ref[0, _SC_INV_PREV_NORM]

    fr = br * post
    fi = bi * post
    f = jnp.sqrt(fr * fr + fi * fi)
    t = t_ref[...]
    w = w_ref[...]

    c = _weight_correction(f, t, scal_ref, rule)
    uw = w * c
    uw = jnp.where(jnp.isnan(uw), jnp.float32(1e-4), uw)
    # Scale by the PREVIOUS norm to keep the carry bounded across long
    # scans; the mix below renormalizes EXACTLY via _SC_INV_WNORM.
    uw = jnp.where(apply_u > 0, uw * inv_prev, w)

    fr_ref[...] = fr
    fi_ref[...] = fi
    uw_ref[...] = uw

    norm_p = jnp.sum(uw * uw)
    sums_tile, maxs_tile = _acc_tiles(
        f, t, mask_ref[...] if stats_on else None, scal_ref, norm_p
    )
    _acc_update(accs_ref, accm_ref, sums_tile, maxs_tile)


def _cols_mraf_mix_inv_kernel(fr_ref, fi_ref, uw_ref, mc_ref,
                              v1b_ref, vtr_ref, vti_ref, v2b_ref,
                              scal_ref, *refs, n1, n2, kim, zero):
    """MRAF constraint mix on the scaled complex farfield + INVERSE cols
    FFT on an (H, block) tile.

    Variadic refs: ``[pffr, pffi], [zwr, zwi] | hr, hi,
    [pffr', pffi'], [zwr', zwi']``. The Kim phase store is a
    unit-phasor pair (no transcendentals in the kernel). ``mc`` codes
    the farfield regions: 1 = signal, 2 = noise, 0 = zero.
    """
    idx = 0
    pffr_ref = pffi_ref = None
    if kim:
        pffr_ref, pffi_ref = refs[idx:idx + 2]
        idx += 2
    zwr_ref = zwi_ref = None
    if zero:
        zwr_ref, zwi_ref = refs[idx:idx + 2]
        idx += 2
    hr_ref, hi_ref = refs[idx:idx + 2]
    idx += 2
    pffr_out = pffi_out = None
    if kim:
        pffr_out, pffi_out = refs[idx:idx + 2]
        idx += 2
    zwr_out = zwi_out = None
    if zero:
        zwr_out, zwi_out = refs[idx:idx + 2]

    fr = fr_ref[...]
    fi = fi_ref[...]
    uw = uw_ref[...]
    mc = mc_ref[...]

    inv_norm = scal_ref[0, _SC_INV_WNORM]
    k = scal_ref[0, _SC_MRAF_K]

    f2 = fr * fr + fi * fi
    invf = jax.lax.rsqrt(jnp.where(f2 > 0, f2, 1.0))  # checkify-safe
    # e^{i theta} as the unit farfield direction; zero field -> the
    # atan2(0, 0) = 0 convention (unit real).
    er = jnp.where(f2 > 0, fr * invf, 1.0)
    ei = jnp.where(f2 > 0, fi * invf, 0.0)

    if kim:
        use_theta = scal_ref[0, _SC_USE_THETA] > 0
        cphi = jnp.where(use_theta, er, pffr_ref[...])
        sphi = jnp.where(use_theta, ei, pffi_ref[...])
        pffr_out[...] = cphi
        pffi_out[...] = sphi
    else:
        cphi, sphi = er, ei

    wn = uw * inv_norm
    sig = mc == 1.0
    noi = mc == 2.0
    re = jnp.where(sig, wn * cphi, jnp.where(noi, k * fr, 0.0))
    im = jnp.where(sig, wn * sphi, jnp.where(noi, k * fi, 0.0))

    if zero:
        # Evolving zero-region weights: zw' = zw - zf * |fz| * fz with
        # fz the free farfield inside the zero region; the region's
        # output IS the updated weight (engine parity).
        zf = scal_ref[0, _SC_ZERO_FACTOR]
        zmask = mc == 0.0
        fmag = jnp.sqrt(f2)
        zwr = zwr_ref[...]
        zwi = zwi_ref[...]
        zwr2 = jnp.where(zmask, zwr - zf * fmag * fr, zwr)
        zwi2 = jnp.where(zmask, zwi - zf * fmag * fi, zwi)
        zwr_out[...] = zwr2
        zwi_out[...] = zwi2
        re = jnp.where(zmask, zwr2, re)
        im = jnp.where(zmask, zwi2, im)

    cr, ci = _fft_core(
        re, im, v1b_ref[...], vtr_ref[...],
        vti_ref[...], v2b_ref[...],
        n1, n2, True,
    )
    hr_ref[...] = cr
    hi_ref[...] = ci


def mraf_carry_step_pallas(gr, gi, amp, weights, phase_ff, target, mask,
                           mcode, zw, scalars, *, rule, kim, stats_on,
                           zero):
    """
    One complete MRAF WGS iteration on the rows-transformed carry:
    cols forward + weight update, one exact norm sync (rsqrt in XLA),
    constraint mix + cols inverse, rows round trip with amplitude
    replacement. ``zw`` is the (2, H, W) evolving zero-region weight
    pair (``zero=True``) or None.

    Returns ``(gr', gi', uw, phase_ff_out | None, zw_out | None, sums,
    maxs)`` with the semi-fused MRAF step's conventions (``uw``
    unnormalized; its norm is ``sqrt(sums[3])``).
    """
    H, W = gr.shape
    scalar_amp = jnp.ndim(amp) == 0
    post = jnp.float32(1.0 / np.sqrt(H * W)) * (amp if scalar_amp else 1.0)

    plane = jax.ShapeDtypeStruct((H, W), jnp.float32)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def scal(extra=()):
        return _wgs_scal_vec(
            scalars, post,
            extra=((_SC_MRAF_K, scalars["mraf_factor"]),
                   (_SC_ZERO_FACTOR, scalars.get("zero_factor", 0.0)))
            + tuple(extra),
        )

    # --- K1: cols forward + unnormalized weight update. ---
    n1c, n2c, *fmats = _plan_f32(H, False)
    blockc = min(BLOCK, W)
    col_spec = pl.BlockSpec((H, blockc), lambda i: (0, i))
    fconst = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in fmats]
    scal_spec = pl.BlockSpec((1, 128), lambda i: (0, 0))
    acc_spec = pl.BlockSpec((8, 128), lambda i: (0, 0))
    acc = jax.ShapeDtypeStruct((8, 128), jnp.float32)

    in_specs = [col_spec, col_spec] + fconst + [col_spec, col_spec, scal_spec]
    operands = (
        [gr, gi] + [jnp.asarray(m) for m in fmats]
        + [weights, target, scal()]
    )
    if stats_on:
        in_specs.append(col_spec)
        operands.append(mask)

    fr, fi, uw, accs, accm = pl.pallas_call(
        functools.partial(
            _cols_mraf_fwd2_kernel, n1=n1c, n2=n2c, rule=rule,
            stats_on=stats_on,
        ),
        grid=(W // blockc,),
        in_specs=in_specs,
        out_specs=[col_spec, col_spec, col_spec, acc_spec, acc_spec],
        out_shape=[plane, plane, plane, acc, acc],
        compiler_params=params,
        interpret=_INTERPRET,
    )(*operands)

    # --- Exact norm sync (the one reduction MRAF fundamentally needs). ---
    inv_norm = jax.lax.rsqrt(accs[3, 0])

    # --- K2: constraint mix + inverse cols pass. ---
    _, _, *imats = _plan_f32(H, True)
    iconst = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in imats]
    in_specs = (
        [col_spec, col_spec, col_spec, col_spec] + iconst + [scal_spec]
    )
    operands = (
        [fr, fi, uw, mcode] + [jnp.asarray(m) for m in imats]
        + [scal(extra=((_SC_INV_WNORM, inv_norm),))]
    )
    if kim:
        in_specs += [col_spec, col_spec]
        operands += [phase_ff[0], phase_ff[1]]
    if zero:
        in_specs += [col_spec, col_spec]
        operands += [zw[0], zw[1]]
    out_specs = [col_spec, col_spec]
    out_shape = [plane, plane]
    if kim:
        out_specs += [col_spec, col_spec]
        out_shape += [plane, plane]
    if zero:
        out_specs += [col_spec, col_spec]
        out_shape += [plane, plane]

    outs = pl.pallas_call(
        functools.partial(
            _cols_mraf_mix_inv_kernel, n1=n1c, n2=n2c, kim=kim, zero=zero,
        ),
        grid=(W // blockc,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=params,
        interpret=_INTERPRET,
    )(*operands)
    hr, hi = outs[0], outs[1]
    idx = 2
    pff_out = (outs[idx], outs[idx + 1]) if kim else None
    idx += 2 if kim else 0
    zw_out = jnp.stack([outs[idx], outs[idx + 1]]) if zero else None

    # --- K3: rows round trip + amplitude replacement (shared kernel). ---
    n1r, n2r, *rimats = _plan_f32(W, True)
    _, _, *rfmats = _plan_f32(W, False)
    block = min(BLOCK, H)
    row_spec = pl.BlockSpec((block, W), lambda i: (i, 0))
    rconst = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in rimats + rfmats]
    rmat_ops = [jnp.asarray(m) for m in rimats + rfmats]
    if scalar_amp:
        gr2, gi2 = pl.pallas_call(
            functools.partial(_rows_normfwd_kernel, n1=n1r, n2=n2r),
            grid=(H // block,),
            in_specs=[row_spec, row_spec] + rconst,
            out_specs=[row_spec, row_spec],
            out_shape=[plane, plane],
            compiler_params=params,
            interpret=_INTERPRET,
        )(hr, hi, *rmat_ops)
    else:
        gr2, gi2 = pl.pallas_call(
            functools.partial(_rows_normfwd_amp_kernel, n1=n1r, n2=n2r),
            grid=(H // block,),
            in_specs=[row_spec, row_spec, row_spec] + rconst,
            out_specs=[row_spec, row_spec],
            out_shape=[plane, plane],
            compiler_params=params,
            interpret=_INTERPRET,
        )(hr, hi, amp, *rmat_ops)

    return gr2, gi2, uw, pff_out, zw_out, accs[:4, 0], accm[:4, 0]


def _cols_wexp_inv_kernel(w_ref, pff_ref, v1b_ref, vtr_ref, vti_ref,
                          v2b_ref, hr_ref, hi_ref, *, n1, n2):
    """Synthesize the constrained farfield ``w * e^{i phase}`` in VMEM
    and run the INVERSE cols pass — the complex farfield never exists
    in HBM. Used by every non-fused full-fuse-geometry step (spot
    feedback, Nogrette, GS, Kim's efficiency trigger)."""
    w = w_ref[...]
    sin_p, cos_p = _sincos(pff_ref[...])
    cr, ci = _fft_core(
        w * cos_p, w * sin_p, v1b_ref[...], vtr_ref[...], vti_ref[...],
        v2b_ref[...], n1, n2, True,
    )
    hr_ref[...] = cr
    hi_ref[...] = ci


@_precision_keyed_jit()
def wexp_ifft2_scrambled_phase(weights, phase):
    """
    psi = arg(ifft2_scrambled(weights * e^{i phase})) in two kernels:
    constraint synthesis + inverse cols, then inverse rows + phase
    extraction — neither the complex farfield nor the complex nearfield
    ever exists in HBM.
    """
    H, W = weights.shape
    n1c, n2c, *imats = _plan_f32(H, True)
    blockc = min(BLOCK, W)
    col_spec = pl.BlockSpec((H, blockc), lambda i: (0, i))
    iconst = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in imats]
    plane = jax.ShapeDtypeStruct((H, W), jnp.float32)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    hr, hi = pl.pallas_call(
        functools.partial(_cols_wexp_inv_kernel, n1=n1c, n2=n2c),
        grid=(W // blockc,),
        in_specs=[col_spec, col_spec] + iconst,
        out_specs=[col_spec, col_spec],
        out_shape=[plane, plane],
        compiler_params=params,
        interpret=_INTERPRET,
    )(weights, phase, *[jnp.asarray(m) for m in imats])

    n1r, n2r, *rmats = _plan_f32(W, True)
    block = min(BLOCK, H)
    row_spec = pl.BlockSpec((block, W), lambda i: (i, 0))
    rconst = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in rmats]
    return pl.pallas_call(
        functools.partial(_rows_phase_extract_kernel, n1=n1r, n2=n2r),
        grid=(H // block,),
        in_specs=[row_spec, row_spec] + rconst,
        out_specs=row_spec,
        out_shape=plane,
        compiler_params=params,
        interpret=_INTERPRET,
    )(hr, hi, *[jnp.asarray(m) for m in rmats])


@_precision_keyed_jit()
def wexp_ifft2_scrambled(weights, phase):
    """
    Complex ``ifft2_scrambled(weights * e^{i phase})`` (ortho),
    scrambled in -> natural out: the constraint synthesis fuses into the
    inverse cols kernel, so the constrained complex farfield never
    exists in HBM (the multiplane backward's per-plane contribution).
    ``phase`` must be bounded (atan2 output) — :func:`_sincos` contract.
    """
    H, W = weights.shape
    n1c, n2c, *imats = _plan_f32(H, True)
    blockc = min(BLOCK, W)
    col_spec = pl.BlockSpec((H, blockc), lambda i: (0, i))
    iconst = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in imats]
    plane = jax.ShapeDtypeStruct((H, W), jnp.float32)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    hr, hi = pl.pallas_call(
        functools.partial(_cols_wexp_inv_kernel, n1=n1c, n2=n2c),
        grid=(W // blockc,),
        in_specs=[col_spec, col_spec] + iconst,
        out_specs=[col_spec, col_spec],
        out_shape=[plane, plane],
        compiler_params=params,
        interpret=_INTERPRET,
    )(weights, phase, *[jnp.asarray(m) for m in imats])
    gr, gi = _fft_rows(hr, hi, True)
    scale = 1.0 / np.sqrt(H * W)
    return gr * scale, gi * scale


@_precision_keyed_jit()
def ifft2_scrambled_phase(xr, xi):
    """
    Inverse ortho 2D FFT consuming the scrambled layout and returning
    only the phase of the natural-order result (the GS psi update);
    the complex nearfield never materializes.
    """
    H, W = xr.shape
    xr, xi = _fft_rows(xr, xi, True)
    n1, n2, *mats = _plan_f32(H, True)
    block = min(BLOCK, W)
    data_spec = pl.BlockSpec((H, block), lambda i: (0, i))
    const_specs = [pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in mats]
    return pl.pallas_call(
        functools.partial(_cols_phase_kernel, n1=n1, n2=n2),
        grid=(W // block,),
        in_specs=[data_spec, data_spec] + const_specs,
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(xr, xi, *[jnp.asarray(m) for m in mats])
