r"""
Fused Pallas TPU kernels for the compressed Zernike spot transforms.

The jnp path (:mod:`slmsuite_tpu.ops.compressed`) round-trips each
``(spots x pixel-tile)`` phase block through HBM; these kernels keep the
phase/cos/sin tiles entirely in VMEM — per pass the HBM traffic is just
the basis stack, the nearfield, and the ``(N,)`` farfield, which is
bandwidth-optimal. This is the TPU equivalent of the reference's
``cuda.cu`` ``compressed_*`` kernels (``cuda.cu:95-288``); where the CUDA
kernel rebuilds Zernike polynomials per pixel from monomial maps, the
MXU makes the (D x tile) basis contraction cheap enough to use the
precomputed basis stack directly.

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

#: Flattened pixels per tile (lane-aligned).
PIXEL_TILE = 1024
#: Spots per tile.
SPOT_TILE = 256


def _ceil_to(x, m):
    return -(-x // m) * m


def _f2n_kernel(coeffs_ref, ffr_ref, ffi_ref, basis_ref, scale_ref, outr_ref, outi_ref):
    """One (spot-tile, pixel-tile) step of the farfield->nearfield expansion."""
    # (S, D) @ (D, T) -> (S, T) phases, entirely in VMEM.
    phases = jnp.dot(
        coeffs_ref[:, :].T, basis_ref[:, :], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    # Mosaic's range-reduced sin/cos cost ~40 cycles/element; the minimax
    # pair with a two-term period reduction is ~6x cheaper at the same
    # (f32-ulp-limited) accuracy for these multi-radian phases.
    sin, cos = _sincos_reduced(phases)

    ffr = ffr_ref[:, :]  # (1, S)
    ffi = ffi_ref[:, :]

    # All dots HIGHEST: phases are many radians so the basis matmul needs
    # full f32, and Mosaic only lowers DEFAULT/HIGHEST — the reduction
    # matvecs are a small fraction of the FLOPs, so HIGHEST costs little.
    re = jnp.dot(ffr, cos, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) - jnp.dot(
        ffi, sin, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    im = jnp.dot(ffr, sin, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) + jnp.dot(
        ffi, cos, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )

    # Grid is (pixel_tiles, spot_tiles) with spots innermost: the output
    # pixel block stays resident in VMEM across the spot reduction.
    scale = scale_ref[0]
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        outr_ref[:, :] = re * scale
        outi_ref[:, :] = im * scale

    @pl.when(s != 0)
    def _():
        outr_ref[:, :] += re * scale
        outi_ref[:, :] += im * scale


def _n2f_kernel(coeffs_ref, nfr_ref, nfi_ref, basis_ref, scale_ref, outr_ref, outi_ref):
    """One (spot-tile, pixel-tile) step of the nearfield->farfield reduction."""
    phases = jnp.dot(
        coeffs_ref[:, :].T, basis_ref[:, :], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    sin, cos = _sincos_reduced(phases)

    nfr = nfr_ref[:, :]  # (1, T)
    nfi = nfi_ref[:, :]

    # conj(kernel) . nf accumulated over pixels: (S, T) @ (T, 1).
    re = jnp.dot(cos, nfr.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) + jnp.dot(
        sin, nfi.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    im = jnp.dot(cos, nfi.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) - jnp.dot(
        sin, nfr.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )

    scale = scale_ref[0]
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        outr_ref[:, :] = re.T * scale
        outi_ref[:, :] = im.T * scale

    @pl.when(p != 0)
    def _():
        outr_ref[:, :] += re.T * scale
        outi_ref[:, :] += im.T * scale


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
    ffr = _pad_axis(ff_re, N_pad, 0).reshape(1, N_pad)
    ffi = _pad_axis(ff_im, N_pad, 0).reshape(1, N_pad)
    scale = jnp.full((1,), 1.0 / np.sqrt(P), jnp.float32)

    outr, outi = _f2n_call(coeffs_p, ffr, ffi, basis_p, scale, D, sg, pg, P_pad)
    return outr.reshape(-1)[:P], outi.reshape(-1)[:P]


def _f2n_call(coeffs_p, ffr, ffi, basis_p, scale, D, sg, pg, P_pad):
    return pl.pallas_call(
        _f2n_kernel,
        grid=(pg, sg),  # Spot (reduction) axis innermost.
        in_specs=[
            pl.BlockSpec((D, SPOT_TILE), lambda p, s: (0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SPOT_TILE), lambda p, s: (0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SPOT_TILE), lambda p, s: (0, s), memory_space=pltpu.VMEM),
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
    )(coeffs_p, ffr, ffi, basis_p, scale)


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
            pl.BlockSpec((1, SPOT_TILE), lambda s, p: (0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SPOT_TILE), lambda s, p: (0, s), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, N_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, N_pad), jnp.float32),
        ],
    )(coeffs_p, nfr, nfi, basis_p, scale)

    ff_re = outr.reshape(-1)[:N]
    ff_im = outi.reshape(-1)[:N]
    norm = jnp.sqrt(jnp.sum(jnp.square(ff_re) + jnp.square(ff_im)))
    return ff_re / norm, ff_im / norm
