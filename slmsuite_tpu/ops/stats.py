r"""
Device-side per-iteration statistics.

The reference warns that stats collection can slow a GPU loop "by an order
of magnitude" (``_hologram.py:1286-1293``) because each metric triggers a
device->host sync. Here the metrics are computed *inside* the jitted scan
as a fixed-size vector stacked over iterations, and fetched once per
optimize call.

Metrics (parity: ``_stats.py:7-116``): efficiency, uniformity, pkpk_err,
std_err — computed over the nonzero/non-nan region of the target.
"""

import jax.numpy as jnp
import numpy as np

#: Order of the metrics in the stats vector.
STAT_KEYS = ("efficiency", "uniformity", "pkpk_err", "std_err")


def calculate_stats(
    feedback_amp,
    target_amp,
    mask=None,
    efficiency_compensation=True,
    total=None,
):
    """
    Jit-friendly stats: returns a length-4 vector ``[efficiency,
    uniformity, pkpk_err, std_err]``.

    Parameters
    ----------
    feedback_amp : jnp.ndarray
        Computed or measured amplitudes.
    target_amp : jnp.ndarray
        Target amplitudes (nan allowed; excluded via ``mask``).
    mask : jnp.ndarray OR None
        Boolean mask of valid comparison pixels (``target != 0 & ~isnan``).
        Computed internally if ``None`` (pass precomputed inside scans).
    efficiency_compensation : bool
        Scale feedback power by the overlap efficiency (used for images,
        not spot arrays).
    total : scalar OR None
        Total measured power (for experimental feedback where power exists
        outside integration regions); replaces the overlap-integral
        efficiency when provided.
    """
    feedback_amp = jnp.asarray(feedback_amp)
    target_amp = jnp.asarray(target_amp)

    if mask is None:
        mask = jnp.logical_and(target_amp != 0, jnp.logical_not(jnp.isnan(target_amp)))

    feedback_pwr = jnp.square(feedback_amp)
    target_pwr = jnp.square(target_amp)

    if total is not None:
        efficiency = jnp.nansum(feedback_pwr) / total

    feedback_pwr_sum = jnp.sum(feedback_pwr)
    feedback_pwr = feedback_pwr / feedback_pwr_sum
    feedback_amp_n = feedback_amp / jnp.sqrt(feedback_pwr_sum)

    target_pwr_sum = jnp.nansum(target_pwr)
    target_pwr = target_pwr / target_pwr_sum
    target_amp_n = target_amp / jnp.sqrt(target_pwr_sum)

    if total is None:
        efficiency = jnp.square(jnp.nansum(target_amp_n * feedback_amp_n))
        if efficiency_compensation:
            feedback_pwr = feedback_pwr / efficiency

    # Masked ratio / error statistics.
    ratio = jnp.where(mask, feedback_pwr / jnp.where(mask, target_pwr, 1.0), jnp.nan)
    err = jnp.where(mask, target_pwr - feedback_pwr, jnp.nan)
    count = jnp.sum(mask)

    rmin = jnp.nanmin(ratio)
    rmax = jnp.nanmax(ratio)
    uniformity = 1 - (rmax - rmin) / (rmax + rmin)

    err_mean = jnp.nansum(err) / count
    err_var = jnp.nansum(jnp.square(jnp.where(mask, err - err_mean, 0.0))) / count

    pkpk_err = count * (jnp.nanmax(err) - jnp.nanmin(err))
    std_err = count * jnp.sqrt(err_var)

    return jnp.stack(
        [efficiency, uniformity, pkpk_err, std_err]
    ).astype(jnp.float32)


def calculate_stats_numpy(
    feedback_amp, target_amp, efficiency_compensation=True, total=None, raw=False
):
    """
    Host (numpy) twin of :meth:`calculate_stats`, returning the reference's
    dict form (used for experimental feedback stats computed off-device).
    """
    feedback_amp = np.asarray(feedback_amp, dtype=float)
    target_amp = np.asarray(target_amp, dtype=float)

    feedback_pwr = np.square(feedback_amp)
    target_pwr = np.square(target_amp)

    if total is not None:
        efficiency = float(np.nansum(feedback_pwr) / total)

    feedback_pwr_sum = np.sum(feedback_pwr)
    feedback_pwr = feedback_pwr / feedback_pwr_sum
    feedback_amp = feedback_amp / np.sqrt(feedback_pwr_sum)

    target_pwr_sum = np.nansum(target_pwr)
    target_pwr = target_pwr / target_pwr_sum
    target_amp = target_amp / np.sqrt(target_pwr_sum)

    if total is None:
        efficiency = float(np.square(np.nansum(target_amp * feedback_amp)))
        if efficiency_compensation:
            feedback_pwr = feedback_pwr / efficiency

    mask = np.logical_and(target_pwr != 0, ~np.isnan(target_pwr))
    ratio = feedback_pwr[mask] / target_pwr[mask]
    err = target_pwr[mask] - feedback_pwr[mask]

    rmin, rmax = float(np.amin(ratio)), float(np.amax(ratio))

    stats = {
        "efficiency": efficiency,
        "uniformity": 1 - (rmax - rmin) / (rmax + rmin),
        "pkpk_err": err.size * float(np.amax(err) - np.amin(err)),
        "std_err": err.size * float(np.std(err)),
    }

    if raw:
        ratio_full = np.full_like(target_pwr, np.nan)
        ratio_full[mask] = ratio
        stats["raw_pwr"] = np.square(feedback_amp)
        stats["raw_pwr_ratio"] = ratio_full

    return stats
