"""
Multi-chip flagship models over the mesh engines.

Each builder returns ``(run, describe)`` where ``run(mesh, n)`` executes
``n`` iterations over the given :class:`jax.sharding.Mesh` and returns
device results. Used by ``__graft_entry__.dryrun_multichip`` (the driver
validates the shardings compile + execute on a virtual CPU mesh) and
available to users sizing real slices.
"""

import numpy as np


def multiplane_batched(n_planes, N=64, method="WGS-Kim", seed=0,
                       mraf=False):
    """B-plane batched multiplane WGS: planes data-parallel over a
    ``data`` mesh axis, nearfields psum'd into the shared phase. With
    ``mraf`` each plane carries a NaN noise region (amplitude freedom)
    — the masks stay plane-local, so the mesh path needs no extra
    collective."""
    import jax.numpy as jnp

    from slmsuite_tpu.ops.propagation import fold_phase
    from slmsuite_tpu.parallel import run_batched_gs
    from slmsuite_tpu.parallel.multiplane import (
        BatchedGSConfig,
        make_multiplane_consts,
    )

    rng = np.random.default_rng(seed)
    shape = (N, N)
    targets = np.zeros((n_planes, N, N), np.float32)
    for b in range(n_planes):
        targets[b, 16 + (2 * b) % 32, 20 + (3 * b) % 24] = 1.0
        targets[b] /= np.sqrt((targets[b] ** 2).sum())
        if mraf:
            noise = np.ones(shape, bool)
            noise[12:52, 8 + b % 4:56] = False
            targets[b, noise] = np.nan
    kernels = np.stack(
        [np.full(shape, 0.05 * b, np.float32) for b in range(n_planes)]
    )

    config = BatchedGSConfig(
        method=method, shape=shape, slm_shape=shape, n_planes=n_planes,
        mraf=mraf, mraf_factor=mraf,
    )
    consts = make_multiplane_consts(
        targets, kernels,
        np.full(n_planes, 1 / np.sqrt(n_planes), np.float32), 1.0 / N,
        mraf_factor=0.5 if mraf else None,
    )
    psi0 = jnp.asarray(
        fold_phase(
            rng.uniform(-np.pi, np.pi, shape).astype(np.float32), shape
        )
    )
    weights0 = jnp.asarray(np.nan_to_num(targets))

    def run(mesh, n_iterations, axis_name="data"):
        return run_batched_gs(
            config, psi0, weights0, consts, n_iterations,
            mesh=mesh, axis_name=axis_name,
        )

    return run


def compressed_spots_3d(n_pixels=64 * 64, n_spots=16, method="WGS-Kim",
                        seed=0):
    """Pixel-sharded grid-free Zernike spot model: each chip owns a
    pixel slab; one (n_spots,) psum per transform direction per
    iteration."""
    import jax.numpy as jnp

    from slmsuite_tpu.ops.compressed import (
        CompressedGSConfig,
        CompressedGSState,
    )
    from slmsuite_tpu.parallel.compressed import (
        run_sharded_compressed_gs,
        shard_compressed_consts,
    )

    rng = np.random.default_rng(seed)
    basis = rng.normal(size=(3, n_pixels)).astype(np.float32)
    coeffs = rng.normal(size=(3, n_spots)).astype(np.float32) * 5
    target = np.full(n_spots, 1 / np.sqrt(n_spots), np.float32)

    config = CompressedGSConfig(
        method=method, n_pixels=n_pixels, n_spots=n_spots,
        stat_groups=("computational_spot",),
        kim_efficiency_trigger=False, use_pallas=False,
    )
    consts = {
        "amp": jnp.float32(1 / np.sqrt(n_pixels)),
        "coeffs": jnp.asarray(coeffs),
        "basis": jnp.asarray(basis),
        "target": jnp.asarray(target),
        "stat_mask": jnp.asarray(target != 0),
        "feedback_exponent": jnp.float32(0.8),
        "feedback_factor": jnp.float32(0.1),
        "fix_phase_iteration": jnp.int32(5),
        "fix_phase_efficiency": jnp.float32(np.nan),
    }
    state = CompressedGSState(
        psi=jnp.asarray(
            rng.uniform(-np.pi, np.pi, n_pixels).astype(np.float32)
        ),
        weights=jnp.asarray(target.copy()),
        phase_ff=jnp.zeros(n_spots, jnp.float32),
        fixed_phase=jnp.asarray(False),
        unfixed_streak=jnp.zeros((), jnp.int32),
        iteration=jnp.zeros((), jnp.int32),
    )

    def run(mesh, n_iterations, axis_name="pixels"):
        sharded = shard_compressed_consts(consts, mesh, axis_name)
        return run_sharded_compressed_gs(
            config, state, sharded, mesh, n_iterations, axis_name
        )

    return run


def sharded_plane_wgs(N, method="WGS-Kim", seed=0):
    """Row-sharded giant-farfield WGS: pencil FFT over a ``rows`` mesh
    axis, psum'd norms and stats."""
    from slmsuite_tpu.ops.engine import GSConfig, init_gs_state
    from slmsuite_tpu.ops.propagation import fold_phase
    from slmsuite_tpu.parallel.plane import run_sharded_plane_gs

    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    target = np.zeros((N, N), np.float32)
    target[N // 2, N // 4] = target[N // 4, N // 2] = 1.0
    target /= np.sqrt((target**2).sum())
    config = GSConfig(
        method=method, shape=(N, N), slm_shape=(N, N),
        stat_groups=("computational",),
    )
    consts = {
        "amp": jnp.float32(1.0 / N),
        "target": jnp.asarray(target),
        "stat_mask": jnp.asarray(target != 0),
        "feedback_exponent": jnp.float32(0.8),
        "feedback_factor": jnp.float32(0.1),
        "fix_phase_iteration": jnp.int32(5),
        "fix_phase_efficiency": jnp.float32(np.nan),
    }
    state = init_gs_state(
        config,
        fold_phase(
            rng.uniform(-np.pi, np.pi, (N, N)).astype(np.float32), (N, N)
        ),
        target.copy(),
    )

    def run(mesh, n_iterations, axis_name="rows"):
        return run_sharded_plane_gs(
            config, state, consts, mesh, n_iterations, axis_name
        )

    return run
