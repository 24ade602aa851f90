r"""
Fused Pallas TPU kernels for the compressed Zernike spot transforms.

The jnp path (:mod:`slmsuite_tpu.ops.compressed`) round-trips each
``(spots x pixel-tile)`` phase block through HBM; these kernels keep the
phase/cos/sin tiles entirely in VMEM — per pass the HBM traffic is just
the basis stack, the nearfield, and the ``(N,)`` farfield, which is
bandwidth-optimal. This is the TPU equivalent of the reference's
``cuda.cu`` ``compressed_*`` kernels (``cuda.cu:95-288``).

Everything runs on the VPU: the phase synthesis contracts only D ~ 3-6
Zernike terms (an MXU dot would pad that K to 128 and waste >95% of
every pass) and the spot/pixel reductions are matvecs (M or N of 1-2 —
equally pass-wasteful), so broadcast FMAs + axis reductions are the
fast formulation; the per-element sin/cos dominates, putting the
kernels at the VPU roofline for their ~50 ops/element.

Grid layout: ``(spot_tiles, pixel_tiles)`` with pixels innermost; the
farfield reduction accumulates its VMEM output block across pixel steps.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slmsuite_tpu.ops.pallas_fft import _sincos_reduced

#: Test hook: run the pallas_calls in interpreter mode (CPU).
_INTERPRET = False

#: Flattened pixels per tile (lane-aligned).
PIXEL_TILE = 1024
#: Spots per tile.
SPOT_TILE = 256


def _ceil_to(x, m):
    return -(-x // m) * m


def _tile_phases(coeffs_ref, basis_ref):
    """(S, T) phase tile as VPU broadcast-MACs over the D basis terms.

    The contraction depth D is tiny (3-6 Zernike terms): as an MXU dot it
    wastes >95% of every pass (K padded to 128), and the reduction
    matvecs that follow waste rows/lanes the same way — these kernels
    run entirely on the VPU, where the arithmetic is exactly the
    D*S*T FMAs it looks like. f32 native, so no HIGHEST emulation.
    """
    D = coeffs_ref.shape[0]
    phases = coeffs_ref[0, :][:, None] * basis_ref[0, :][None, :]
    for d in range(1, D):
        phases += coeffs_ref[d, :][:, None] * basis_ref[d, :][None, :]
    return phases


def _f2n_kernel(coeffs_ref, ffr_ref, ffi_ref, basis_ref, scale_ref, outr_ref, outi_ref):
    """One (spot-tile, pixel-tile) step of the farfield->nearfield expansion."""
    phases = _tile_phases(coeffs_ref, basis_ref)
    # Mosaic's range-reduced sin/cos cost ~40 cycles/element; the minimax
    # pair with a two-term period reduction is ~6x cheaper at the same
    # (f32-ulp-limited) accuracy for these multi-radian phases.
    sin, cos = _sincos_reduced(phases)

    ffr = ffr_ref[:, :]  # (S, 1): per-spot scalars on sublanes.
    ffi = ffi_ref[:, :]

    # Spot reduction along sublanes (axis 0): nf_p = sum_s ff_s e^{i phi}.
    re = jnp.sum(ffr * cos - ffi * sin, axis=0)
    im = jnp.sum(ffr * sin + ffi * cos, axis=0)

    # Grid is (pixel_tiles, spot_tiles) with spots innermost: the output
    # pixel block stays resident in VMEM across the spot reduction.
    scale = scale_ref[0]
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        outr_ref[0, :] = re * scale
        outi_ref[0, :] = im * scale

    @pl.when(s != 0)
    def _():
        outr_ref[0, :] += re * scale
        outi_ref[0, :] += im * scale


def _n2f_kernel(coeffs_ref, nfr_ref, nfi_ref, basis_ref, scale_ref, outr_ref, outi_ref):
    """One (spot-tile, pixel-tile) step of the nearfield->farfield reduction."""
    phases = _tile_phases(coeffs_ref, basis_ref)
    sin, cos = _sincos_reduced(phases)

    nfr = nfr_ref[:, :]  # (1, T): per-pixel values on lanes.
    nfi = nfi_ref[:, :]

    # conj(kernel) . nf: pixel reduction along lanes (axis 1).
    re = jnp.sum(cos * nfr + sin * nfi, axis=1)[:, None]
    im = jnp.sum(cos * nfi - sin * nfr, axis=1)[:, None]

    scale = scale_ref[0]
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        outr_ref[:, :] = re * scale
        outi_ref[:, :] = im * scale

    @pl.when(p != 0)
    def _():
        outr_ref[:, :] += re * scale
        outi_ref[:, :] += im * scale


def _pad_axis(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("n_spots",))
def farfield_to_nearfield(ff_re, ff_im, coeffs, basis, n_spots):
    """Pallas twin of :meth:`ops.compressed.farfield_to_nearfield`."""
    D, P = basis.shape
    N = n_spots
    P_pad = _ceil_to(P, PIXEL_TILE)
    N_pad = _ceil_to(N, SPOT_TILE)
    sg, pg = N_pad // SPOT_TILE, P_pad // PIXEL_TILE

    basis_p = _pad_axis(basis, P_pad, 1)
    coeffs_p = _pad_axis(coeffs, N_pad, 1)
    ffr = _pad_axis(ff_re, N_pad, 0).reshape(N_pad, 1)
    ffi = _pad_axis(ff_im, N_pad, 0).reshape(N_pad, 1)
    scale = jnp.full((1,), 1.0 / np.sqrt(P), jnp.float32)

    outr, outi = _f2n_call(coeffs_p, ffr, ffi, basis_p, scale, D, sg, pg, P_pad)
    return outr.reshape(-1)[:P], outi.reshape(-1)[:P]


def _f2n_call(coeffs_p, ffr, ffi, basis_p, scale, D, sg, pg, P_pad):
    return pl.pallas_call(
        _f2n_kernel,
        grid=(pg, sg),  # Spot (reduction) axis innermost.
        in_specs=[
            pl.BlockSpec((D, SPOT_TILE), lambda p, s: (0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((SPOT_TILE, 1), lambda p, s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SPOT_TILE, 1), lambda p, s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, PIXEL_TILE), lambda p, s: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda p, s: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, PIXEL_TILE), lambda p, s: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIXEL_TILE), lambda p, s: (0, p), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, P_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, P_pad), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(coeffs_p, ffr, ffi, basis_p, scale)


def _amp_replace(re, im, amp, valid, scalar_amp):
    """Amplitude replacement (``amp * nf/|nf|``) shared by ALL fused
    round-trip twins — the two Pallas kernels here and the jnp scan
    twins in :mod:`ops.compressed` — so the numeric conventions live in
    exactly one place:

    - zero field -> unit real (the ``atan2(0, 0) = 0`` convention);
    - ``valid`` masks padded pixels to zero (their synthesized field is
      a nonzero spot sum the replacement would rescale into garbage);
    - pre-guarded ``rsqrt`` (checkify-safe: ``rsqrt(0) = inf`` would
      place a transient ``0 * inf`` NaN in the untaken where-branch and
      trip the interpret+checkify sanitizer job).

    Returns the ``(ur, ui)`` replaced nearfield pair.
    """
    mag2 = re * re + im * im
    safe = jax.lax.rsqrt(jnp.where(mag2 > 0, mag2, 1.0))
    if scalar_amp:
        inv = valid * safe
        return (
            jnp.where(mag2 > 0, re * inv, valid),
            jnp.where(mag2 > 0, im * inv, 0.0),
        )
    inv = valid * amp * safe
    return (
        jnp.where(mag2 > 0, re * inv, valid * amp),
        jnp.where(mag2 > 0, im * inv, 0.0),
    )


def _fused_iter_kernel(coeffs_ref, ffr_ref, ffi_ref, basis_ref, amp_ref,
                       outr_ref, outi_ref, *, scalar_amp, n_pixels, tile):
    """One pixel-tile step of the FUSED compressed iteration:
    farfield->nearfield expansion, amplitude replacement
    (``amp * nf/|nf|`` — no atan2/sincos), and the conjugate reduction
    back to the farfield — all on ONE evaluation of the (S, T) phase
    tile and its sin/cos (the loop's dominant cost; the unfused pair
    evaluates it twice per iteration). Scales drop out: the expansion's
    1/sqrt(P) cancels in the normalization and the reduction's in the
    caller's unit-norm epilogue."""
    phases = _tile_phases(coeffs_ref, basis_ref)
    sin, cos = _sincos_reduced(phases)

    ffr = ffr_ref[:, :]  # (S, 1)
    ffi = ffi_ref[:, :]

    # Expansion: nf_p = sum_s ff_s e^{i phi} (sublane reduction).
    re = jnp.sum(ffr * cos - ffi * sin, axis=0)
    im = jnp.sum(ffr * sin + ffi * cos, axis=0)

    p = pl.program_id(0)
    idx = p * tile + jax.lax.broadcasted_iota(jnp.int32, re.shape, 0)
    valid = (idx < n_pixels).astype(jnp.float32)
    ur, ui = _amp_replace(
        re, im, None if scalar_amp else amp_ref[0, :], valid, scalar_amp
    )

    # Conjugate reduction with the SAME cos/sin (lane reduction).
    fr = jnp.sum(cos * ur[None, :] + sin * ui[None, :], axis=1)[:, None]
    fi = jnp.sum(cos * ui[None, :] - sin * ur[None, :], axis=1)[:, None]

    @pl.when(p == 0)
    def _():
        outr_ref[:, :] = fr
        outi_ref[:, :] = fi

    @pl.when(p != 0)
    def _():
        outr_ref[:, :] += fr
        outi_ref[:, :] += fi


def _fused_iter_cached_kernel(kc_ref, ks_ref, ffr_ref, ffi_ref, amp_ref,
                              outr_ref, outi_ref, *, scalar_amp, n_pixels,
                              tile):
    """Cached-kernel twin of :func:`_fused_iter_kernel`: the (S, T)
    cos/sin pair is STREAMED from the HBM-resident cache
    (:func:`ops.compressed.build_kernel_cache`) instead of recomputed —
    Mosaic double-buffers the grid blocks, so each iteration costs one
    read of the cache at full HBM bandwidth (the ``lax.scan`` fallback
    pays an extra per-slice copy)."""
    cos = kc_ref[0, :, :]  # (S, T)
    sin = ks_ref[0, :, :]

    ffr = ffr_ref[:, :]  # (S, 1)
    ffi = ffi_ref[:, :]

    re = jnp.sum(ffr * cos - ffi * sin, axis=0)
    im = jnp.sum(ffr * sin + ffi * cos, axis=0)

    p = pl.program_id(0)
    idx = p * tile + jax.lax.broadcasted_iota(jnp.int32, re.shape, 0)
    valid = (idx < n_pixels).astype(jnp.float32)
    ur, ui = _amp_replace(
        re, im, None if scalar_amp else amp_ref[0, :], valid, scalar_amp
    )

    fr = jnp.sum(cos * ur[None, :] + sin * ui[None, :], axis=1)[:, None]
    fi = jnp.sum(cos * ui[None, :] - sin * ur[None, :], axis=1)[:, None]

    @pl.when(p == 0)
    def _():
        outr_ref[:, :] = fr
        outi_ref[:, :] = fi

    @pl.when(p != 0)
    def _():
        outr_ref[:, :] += fr
        outi_ref[:, :] += fi


def fused_iter_cached_ok(n_spots, cache_tile):
    """Whether the cached fused-iteration kernel fits VMEM: the cos/sin
    blocks (double-buffered) plus the work tile must stay within the
    raised scoped-vmem limit."""
    n_pad = _ceil_to(max(n_spots, 1), 8)
    block = 2 * n_pad * cache_tile * 4  # kc + ks, one grid step
    return 2 * block + 4 * n_pad * cache_tile * 4 <= 80 * 1024 * 1024


def fused_iteration_cached(ff_re, ff_im, kc, ks, amp, n_spots, n_pixels):
    """
    Cached-kernel fused round trip: ``kc``/``ks`` are the
    ``(n_tiles, N, T)`` cos/sin stacks from
    :func:`ops.compressed.build_kernel_cache`. Returns the UNNORMALIZED
    next-farfield pair. The spot axis of the cache must already be
    8-aligned (guaranteed when N is a multiple of 8; callers fall back
    to the jnp scan otherwise).
    """
    n_tiles, N_c, tile = kc.shape
    P_pad = n_tiles * tile

    scalar_amp = jnp.ndim(amp) == 0
    ffr = _pad_axis(ff_re, N_c, 0).reshape(N_c, 1)
    ffi = _pad_axis(ff_im, N_c, 0).reshape(N_c, 1)
    if scalar_amp:
        amp_p = jnp.zeros((1, tile), jnp.float32)
    else:
        amp_p = _pad_axis(amp, P_pad, 0).reshape(1, P_pad)

    outr, outi = pl.pallas_call(
        functools.partial(
            _fused_iter_cached_kernel,
            scalar_amp=scalar_amp, n_pixels=n_pixels, tile=tile,
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, N_c, tile), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_c, tile), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_c, 1), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_c, 1), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tile),
                (lambda p: (0, 0)) if scalar_amp else (lambda p: (0, p)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((N_c, 1), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_c, 1), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_c, 1), jnp.float32),
            jax.ShapeDtypeStruct((N_c, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_INTERPRET,
    )(kc, ks, ffr, ffi, amp_p)
    return outr.reshape(-1)[:n_spots], outi.reshape(-1)[:n_spots]


def fused_iter_tile(n_spots_padded):
    """Pixel-tile length for the fused iteration: the whole (S, T)
    cos/sin pair must stay in VMEM (~8 MB budget), so T shrinks as the
    spot count grows; None when the spot count is too large to fuse."""
    t = (1 << 20) // max(n_spots_padded, 1) // 128 * 128
    return min(t, 4096) if t >= 128 else None


def fused_iteration(ff_re, ff_im, coeffs, basis, amp, n_spots):
    """
    One compressed transform round trip ``ff' -> nf -> amp*nf/|nf| ->
    ff_next`` fused over a single phase evaluation. ``amp`` is a scalar
    or a flattened ``(P,)`` source amplitude. Returns the UNNORMALIZED
    next-farfield pair (the caller's epilogue normalizes).
    """
    D, P = basis.shape
    N = n_spots
    N_pad = _ceil_to(N, 8)
    tile = fused_iter_tile(N_pad)
    if tile is None:
        raise ValueError(
            f"spot count {N} too large for the fused iteration kernel"
        )
    P_pad = _ceil_to(P, tile)
    pg = P_pad // tile

    scalar_amp = jnp.ndim(amp) == 0
    basis_p = _pad_axis(basis, P_pad, 1)
    coeffs_p = _pad_axis(coeffs, N_pad, 1)
    ffr = _pad_axis(ff_re, N_pad, 0).reshape(N_pad, 1)
    ffi = _pad_axis(ff_im, N_pad, 0).reshape(N_pad, 1)
    if scalar_amp:
        # Dummy operand (scalar folds out in the normalization).
        amp_p = jnp.zeros((1, tile), jnp.float32)
    else:
        amp_p = _pad_axis(amp, P_pad, 0).reshape(1, P_pad)

    outr, outi = pl.pallas_call(
        functools.partial(
            _fused_iter_kernel, scalar_amp=scalar_amp, n_pixels=P, tile=tile
        ),
        grid=(pg,),
        in_specs=[
            pl.BlockSpec((D, N_pad), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_pad, 1), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_pad, 1), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tile), lambda p: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tile),
                (lambda p: (0, 0)) if scalar_amp else (lambda p: (0, p)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((N_pad, 1), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_pad, 1), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((N_pad, 1), jnp.float32),
        ],
        # The (S, T) phase tile + its sin/cos pair alone run ~12 MB at
        # the default tile; the 16 MB default scoped-vmem limit OOMs on
        # the chip (this v5 slice allows far more — see pallas_fft).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_INTERPRET,
    )(coeffs_p, ffr, ffi, basis_p, amp_p)
    return outr.reshape(-1)[:N], outi.reshape(-1)[:N]


@functools.partial(jax.jit, static_argnames=("n_spots",))
def nearfield_to_farfield(nf_re, nf_im, coeffs, basis, n_spots):
    """Pallas twin of :meth:`ops.compressed.nearfield_to_farfield`."""
    D, P = basis.shape
    N = n_spots
    P_pad = _ceil_to(P, PIXEL_TILE)
    N_pad = _ceil_to(N, SPOT_TILE)
    sg, pg = N_pad // SPOT_TILE, P_pad // PIXEL_TILE

    basis_p = _pad_axis(basis, P_pad, 1)
    coeffs_p = _pad_axis(coeffs, N_pad, 1)
    nfr = _pad_axis(nf_re, P_pad, 0).reshape(1, P_pad)
    nfi = _pad_axis(nf_im, P_pad, 0).reshape(1, P_pad)
    scale = jnp.full((1,), 1.0 / np.sqrt(P), jnp.float32)

    outr, outi = pl.pallas_call(
        _n2f_kernel,
        grid=(sg, pg),
        in_specs=[
            pl.BlockSpec((D, SPOT_TILE), lambda s, p: (0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIXEL_TILE), lambda s, p: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIXEL_TILE), lambda s, p: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, PIXEL_TILE), lambda s, p: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda s, p: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((SPOT_TILE, 1), lambda s, p: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SPOT_TILE, 1), lambda s, p: (s, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((N_pad, 1), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(coeffs_p, nfr, nfi, basis_p, scale)

    ff_re = outr.reshape(-1)[:N]
    ff_im = outi.reshape(-1)[:N]
    norm = jnp.sqrt(jnp.sum(jnp.square(ff_re) + jnp.square(ff_im)))
    return ff_re / norm, ff_im / norm
