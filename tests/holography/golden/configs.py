"""
Shared golden-parity configurations.

Deterministic target / initial-phase construction used both by
``generate_reference_goldens.py`` (which runs the *reference*
``slmsuite`` package from ``/root/reference`` to produce the committed
``.npz`` goldens) and by ``tests/holography/test_reference_parity.py``
(which runs this repo against those goldens). Only numpy is used here so
the module imports under either package.

Conventions follow the reference test suite
(reference ``tests/holography/test_algorithms.py:51-119``): 64x64 targets,
``np.random.default_rng`` seeding (stream-stable across numpy versions),
explicit ``reset_phase(custom_phase=...)`` so no library RNG is involved.
"""

import numpy as np

SEED = 42
SHAPE = (64, 64)

#: Stats recorded per iteration for every config.
STAT_KEYS = ("efficiency", "uniformity", "pkpk_err", "std_err")

#: name -> config dict.
#:   kind:   "holo" (Hologram, 64x64 target == slm_shape),
#:           "holo_padded" (128x128 target, 64x64 slm_shape),
#:           "spots" (SpotHologram.make_rectangular_array 5x5 grid).
#:   flags:  explicit optimize() kwargs, pinned on both sides so default
#:           drift can never silently change the goldens.
#:   mraf:   "noise" marks a NaN noise block; "zero" additionally relies
#:           on the zero region (requires zero_factor in flags).
CONFIGS = {
    "gs": dict(kind="holo", method="GS", maxiter=20, flags={}),
    "wgs_leonardo": dict(
        kind="holo", method="WGS-Leonardo", maxiter=20,
        flags={"feedback_exponent": 0.8},
    ),
    "wgs_kim_iter": dict(
        kind="holo", method="WGS-Kim", maxiter=20,
        flags={"fix_phase_iteration": 5, "feedback_exponent": 0.8},
    ),
    "wgs_kim_eff": dict(
        kind="holo", method="WGS-Kim", maxiter=20,
        flags={
            "fix_phase_efficiency": 0.5,
            "fix_phase_iteration": 1,
            "feedback_exponent": 0.8,
        },
    ),
    "wgs_nogrette": dict(
        kind="holo", method="WGS-Nogrette", maxiter=20,
        flags={"feedback_factor": 0.1},
    ),
    "wgs_wu": dict(
        kind="holo", method="WGS-Wu", maxiter=20,
        flags={"feedback_exponent": 0.5},
    ),
    "wgs_tanh": dict(
        kind="holo", method="WGS-tanh", maxiter=20,
        flags={"feedback_factor": 0.2, "feedback_exponent": 0.5},
    ),
    "gs_mraf": dict(
        kind="holo", method="GS", maxiter=20,
        flags={"mraf_factor": 0.5}, mraf="noise",
    ),
    "wgs_leonardo_mraf_zero": dict(
        kind="holo", method="WGS-Leonardo", maxiter=20,
        flags={
            "mraf_factor": 0.4,
            "zero_factor": 0.1,
            "feedback_exponent": 0.8,
        },
        mraf="zero",
    ),
    "gs_padded": dict(kind="holo_padded", method="GS", maxiter=10, flags={}),
    "spots_kim": dict(
        kind="spots", method="WGS-Kim", maxiter=15,
        flags={"fix_phase_iteration": 5, "feedback_exponent": 0.8},
        feedback="computational_spot",
    ),
}


def build_inputs(name):
    """Return ``(target_or_None, slm_shape, phi0, cfg)`` for config ``name``.

    ``target_or_None`` is ``None`` for the ``"spots"`` kind, where each
    package builds its own :class:`SpotHologram` via
    ``make_rectangular_array`` with :func:`spots_kwargs`.
    """
    cfg = CONFIGS[name]
    rng = np.random.default_rng(SEED)

    if cfg["kind"] == "spots":
        phi0 = rng.uniform(-np.pi, np.pi, SHAPE).astype(np.float32)
        return None, SHAPE, phi0, cfg

    shape = (128, 128) if cfg["kind"] == "holo_padded" else SHAPE
    target = np.zeros(shape, np.float32)
    for _ in range(10):
        target[rng.integers(0, shape[0]), rng.integers(0, shape[1])] = 1.0

    if cfg.get("mraf"):
        # NaN noise block surrounding the signal window; with
        # mraf="zero", the remaining zeros form the zero region
        # (exercised by zero_factor).
        noise = np.ones(shape, bool)
        noise[16:48, 12:52] = False
        target[noise] = np.nan
        # Guarantee at least a few signal spots inside the window.
        target[20, 20] = target[30, 40] = target[44, 24] = 1.0

    phi0 = rng.uniform(-np.pi, np.pi, SHAPE).astype(np.float32)
    return target, SHAPE, phi0, cfg


def spots_kwargs():
    """Arguments for ``SpotHologram.make_rectangular_array`` (both packages)."""
    return dict(
        shape=SHAPE, array_shape=(5, 5), array_pitch=(8, 8), basis="knm"
    )


def run_config(name, hologram_cls, spot_hologram_cls):
    """Build + optimize config ``name`` with the given classes.

    Returns ``(stats_dict, final_phase)`` where ``stats_dict`` maps
    :data:`STAT_KEYS` to per-iteration float64 arrays.
    """
    target, slm_shape, phi0, cfg = build_inputs(name)

    if cfg["kind"] == "spots":
        holo = spot_hologram_cls.make_rectangular_array(**spots_kwargs())
    elif cfg["kind"] == "holo_padded":
        holo = hologram_cls(target=target, slm_shape=slm_shape)
    else:
        holo = hologram_cls(target=target)

    holo.reset_phase(custom_phase=phi0)

    group = cfg.get("feedback", "computational")
    kwargs = dict(cfg["flags"])
    if "feedback" in cfg:
        kwargs["feedback"] = cfg["feedback"]
    holo.optimize(
        method=cfg["method"],
        maxiter=cfg["maxiter"],
        verbose=False,
        stat_groups=[group],
        **kwargs,
    )

    stats = holo.stats["stats"][group]
    out = {k: np.asarray(stats[k], np.float64) for k in STAT_KEYS}
    return out, np.asarray(holo.get_phase(), np.float64)
