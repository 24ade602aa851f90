#!/usr/bin/env python
"""
Benchmarks for the BASELINE.json configs.

Default (no args): the headline metric — WGS-Kim iterations/sec on a
2048x2048 SLM with a 32x32 spot array (config 2; north star = 1000
iter/s on a full v5p chip). Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Other configs (``python bench.py --config N [size] [iters]``):
  1  GS, 1024^2, 10x10 SpotHologram grid, 50 iters
  2  WGS-Kim, 2048^2, 32x32 spots (default; ``python bench.py [N] [iters]``)
  3  MRAF image hologram (ring target, nan noise region)
  4  Camera-in-the-loop: experimental-feedback WGS on the simulated rig
  5  Zernike 3D compressed spot array (grid-free transform)

Methodology notes for this environment:
- Device work is a single jitted `lax.scan` of dependent iterations, so
  a caching runtime cannot skip it; timing brackets a full value fetch
  (block_until_ready is unreliable over the axon tunnel).
- The tunneled dev slice's throughput varies widely between sessions
  (measured 4-730 GB/s copy bandwidth on different days); compare
  numbers only within a session — the dimensionless roofline fields
  (config 2) are the session-independent evidence.
"""

import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache: the tunneled dev slice spends
    most of a bench run compiling (~10 programs x 20-40 s each); the
    cache survives across runs AND rounds, so only the first run after
    a code change pays it. Harmless no-op if the backend can't
    serialize executables."""
    try:
        import jax

        cache_dir = os.environ.get(
            "SLMSUITE_TPU_COMPILE_CACHE",
            os.path.expanduser("~/.cache/slmsuite_tpu_xla"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass


def _git_commit():
    """Short hash of the benched tree (+ dirty marker) for artifact
    provenance; best-effort (the artifact is still valid without git)."""
    import subprocess

    try:
        here = os.path.dirname(os.path.abspath(__file__))
        rev = subprocess.run(
            ["git", "-C", here, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        dirty = subprocess.run(
            ["git", "-C", here, "status", "--porcelain"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        return (rev + ("-dirty" if dirty else "")) if rev else None
    except Exception:  # noqa: BLE001 - provenance is best-effort
        return None


def _result(metric, value, unit, baseline, **extra):
    result = {
        "metric": metric,
        "value": round(value, 2),
        "unit": unit,
        "vs_baseline": round(value / baseline, 4),
    }
    result.update(extra)
    return result


def _emit(metric, value, unit, baseline, **extra):
    result = _result(metric, value, unit, baseline, **extra)
    print(json.dumps(result))
    return result


def bench_engine(model, iters, runner=None, n_repeats=3):
    """Time the scanned engine on a flagship model
    (:mod:`slmsuite_tpu.models`); returns ``(iter/s, stats, provenance)``
    where ``provenance`` carries the per-repeat evidence the artifact
    embeds (median/spread across ``n_repeats`` marginal estimates) —
    the analog of pytest-benchmark's per-run metadata autosave
    (``/root/reference/tests/conftest.py:520-522``)."""
    from slmsuite_tpu.ops.engine import run_gs

    run = run_gs if runner is None else runner
    config, consts = model.config, model.consts

    def once(n, k=1):
        state = model.init_state()
        # Force the initial-state H2D uploads BEFORE the timed window:
        # over a tunneled device they jitter by far more than the loop
        # itself and would corrupt the difference estimate below.
        for leaf in (state.psi, state.weights, state.phase_ff):
            np.asarray(leaf[0, :2])
        t0 = time.time()
        # Chain k calls with device-resident state hand-off: total
        # signal is k*n iterations from ONE compiled program, with
        # per-call dispatch appearing k times on BOTH sides of the
        # marginal difference (so it still cancels). The single fetch
        # at the end synchronizes the whole chain.
        stats = None
        for _ in range(k):
            state, stats = run(config, state, consts, n)
        stats = np.asarray(stats)
        return time.time() - t0, stats

    # Marginal (steady-state) rate: difference of a long and a short run
    # cancels the fixed per-call overhead (dispatch, stats fetch) that
    # would otherwise be misattributed to the iterations themselves.
    # Each repeat pairs one short and one long run into ITS OWN marginal
    # estimate so the artifact can report the median AND the spread —
    # round 4's 840<->908<->936 headline scatter was undiagnosable
    # without per-run evidence.
    small = max(1, iters // 5)
    once(small)  # Warmup: compile both lengths + run.
    once(iters)
    # Science stats ALWAYS come from the standard single window (fresh
    # init, the reference's iteration count) — the timing chains below
    # keep optimizing past it and their stats are discarded.
    t_warm, stats = once(iters)
    # Size the chain so the long side holds ~0.7 s of on-device signal:
    # a fixed window at small shapes (e.g. 50 GS iterations at 1024^2 =
    # ~30 ms) sits below the tunnel's dispatch noise — exactly how
    # round 4's artifact recorded c1 swinging 552<->1563 iter/s between
    # sessions on a bit-identical program.
    k = int(np.clip(round(0.7 / max(t_warm, 1e-4)), 1, 64))
    rates = []
    for _ in range(n_repeats):
        t_small = once(small, k)[0]
        t_large, _chained = once(iters, k)
        wall = k * iters / t_large
        if t_large > t_small:
            marginal = k * (iters - small) / (t_large - t_small)
        else:
            marginal = wall  # Jitter swamped the difference; be honest.
        # A marginal estimate far above the wall rate is jitter.
        rates.append(min(marginal, 2.0 * wall))
    rates.sort()
    median = rates[len(rates) // 2]
    provenance = {
        "n_repeats": n_repeats,
        "timing_window_iters": k * iters,
        "iter_s_median": round(median, 2),
        "iter_s_spread": round(
            (rates[-1] - rates[0]) / max(median, 1e-9), 3
        ),
    }
    return median, stats, provenance


def _per_iter_seconds(make_run, n_small, n_large, repeats=7):
    """
    Median per-iteration wall time of a chained scan, from the
    *difference* between a long and a short run — cancelling the fixed
    dispatch/transfer overhead that dominates short runs on a tunneled
    device. Each timed call gets a fresh "salt" scalar so a
    result-caching runtime cannot serve a repeat dispatch from cache.

    Returns ``(median_seconds, noise)`` where ``noise`` is the relative
    interquartile spread of the repeats — on a shared/preempted dev slice
    this routinely exceeds 1, flagging the estimate as unreliable.
    """
    run_small = make_run(n_small)
    run_large = make_run(n_large)
    salt = iter(range(1, 10_000))
    np.asarray(run_small(next(salt)))  # Compile both.
    np.asarray(run_large(next(salt)))

    def timed(run):
        t0 = time.perf_counter()
        np.asarray(run(next(salt)))
        return time.perf_counter() - t0

    diffs = sorted(
        (timed(run_large) - timed(run_small)) / (n_large - n_small)
        for _ in range(repeats)
    )
    median = diffs[len(diffs) // 2]
    quart = max(1, len(diffs) // 4)
    # Interquartile spread: drop ``quart`` samples from EACH end (the
    # previous indexing degenerated to the full min-to-max range, so a
    # single outlier repeat flagged healthy sessions as untrusted).
    spread = diffs[-quart - 1] - diffs[quart] if len(diffs) > 2 else 0.0
    noise = abs(spread) / max(abs(median), 1e-12)
    return max(median, 1e-9), round(noise, 2)


def measure_copy_pass_seconds(N=2048):
    """Per-plane wall time of an HBM copy pass (read + write one (N, N)
    f32 plane): the unit of the bandwidth roofline.

    The scanned working set is sized well past VMEM (~128 MB on v5) so
    the carry cannot stay chip-resident — a single-plane probe measures
    VMEM residency (>4 TB/s apparent), not HBM.
    """
    import jax
    import jax.numpy as jnp

    planes = max(2, int(np.ceil(192e6 / (N * N * 4))))
    x = jnp.ones((planes, N, N), jnp.float32)

    def make_run(iters):
        @jax.jit
        def run(x, salt):
            def body(c, _):
                return c * jnp.float32(1.0000001) + salt, None

            # Fetch only a dependent sliver (full-array D2H over the
            # tunnel would dominate the timing).
            return jax.lax.scan(body, x, None, length=iters)[0][0, 0, :2]

        return lambda k: run(x, jnp.float32(k * 1e-12))

    per_iter, noise = _per_iter_seconds(make_run, 10, 90, repeats=9)
    return per_iter / planes, noise


def measure_matmul_seconds(N=2048):
    """Per-iteration wall time of an (N, N) @ (N, N) f32 HIGHEST-precision
    matmul — the same dot flavor the four-step FFT uses (MXU roofline)."""
    import jax
    import jax.numpy as jnp

    a = jnp.asarray(
        np.random.default_rng(1).normal(size=(N, N)).astype(np.float32) / N
    )
    c = jnp.ones((N, N), jnp.float32)

    def make_run(iters):
        @jax.jit
        def run(c, salt):
            def body(x, _):
                return (
                    jax.lax.dot(
                        a, x + salt,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    ),
                    None,
                )

            return jax.lax.scan(body, c, None, length=iters)[0][0, :2]

        return lambda k: run(c, jnp.float32(k * 1e-12))

    return _per_iter_seconds(make_run, 20, 180, repeats=9)


def step_model(N, fused, stats_on=True):
    """
    Analytic per-iteration HBM bytes and MXU passes of the scrambled
    WGS-Kim loop at ``N x N`` (Pallas four-step path).

    Bytes: one (N, N) f32 plane crossing HBM = one "tile". Fully fused
    (two-kernel carry-mode step; the loop carries the rows-transformed
    field pair, never psi, and the Kim phase store as a unit-phasor
    PAIR so no transcendental runs inside the loop): cols round trip
    (carry re/im + weights/target/mask + phasor pair in, half-inverted
    re/im + weights' + phasor pair out = 12) + rows round trip with
    amplitude replacement (re/im in, carry re/im out = 4) = 16 tiles.
    Unfused scrambled adds the XLA elementwise pass (amp_ff/theta
    written+read, weights/phase_ff round-trip, constrained re/im
    written) plus the separate inverse-cols round trip ~= 13 more tiles.

    MXU cost is PASS-count, not FLOPs: a systolic-array pass runs a
    (<=128)^3 MAC block in the same time whatever its actual dims, so
    each four-step stage — one block-complex (2n, 2n) dot over the
    plane — charges ceil(2n/128)^2 * (other_factor * N / 128) passes.
    Four axis passes per iteration (rows fwd, cols fwd + inv in the
    round-trip kernel, rows inv).
    """
    from slmsuite_tpu.ops.fft import _split

    tile = N * N * 4
    n1, n2 = _split(N)

    def stage_passes(n_stage, other):
        m = -(-2 * n_stage // 128)  # ceil(2n/128): M- and K-tile count.
        return m * m * max(1, other * N // 128)

    axis_passes = stage_passes(n1, n2) + stage_passes(n2, n1)
    mxu_passes = 4 * axis_passes
    tiles = 16 if fused else 29
    if not stats_on:
        tiles -= 1  # No mask read.
    return tiles * tile, mxu_passes


def attest_kernel_parity(N=2048, iters=3, model=None):
    """
    On-chip fused-vs-natural attestation at the headline shape: run a few
    WGS-Kim iterations through the fused carry-mode Pallas engine AND the
    natural (einsum, unscrambled) engine on the same device, and require
    agreement within FFT round-off. Returns True, or raises — the bench
    refuses to emit a headline number from unverified kernels. Model:
    ``tests/test_tpu_kernels.py`` / ``tests/holography/test_algorithms.py``
    (TestScrambledEngine parity suite).

    Pass ``model`` (an :class:`slmsuite_tpu.models.EngineModel`) to attest
    a different workload's kernels — config 3 uses this for the MRAF
    carry-mode step.
    """
    import jax

    if jax.default_backend() in ("cpu",):
        return False

    from slmsuite_tpu.models import spot_array_wgs
    from slmsuite_tpu.ops import engine as E
    from slmsuite_tpu.ops.engine import run_gs

    if model is None:
        model = spot_array_wgs(N=N, n_side=32, spacing_div=70)
    out = {}
    # Restore whatever mode the caller had active (not a hardcoded
    # "auto"): an explicit set_scrambled_mode override in the calling
    # process must survive the attestation.
    prior_mode = E._SCRAMBLED_MODE
    for mode in ("fused", "natural"):
        E.set_scrambled_mode("auto" if mode == "fused" else False)
        try:
            state, stats = run_gs(
                model.config, model.init_state(), model.consts, iters
            )
            out[mode] = (
                np.asarray(state.psi),
                np.asarray(state.weights),
                np.asarray(stats[:, 0, :2]),
            )
        finally:
            E.set_scrambled_mode(prior_mode)

    psi_f, w_f, st_f = out["fused"]
    psi_n, w_n, st_n = out["natural"]
    # Phase parity where well-conditioned (psi is atan2 of a field that
    # can be near zero); weights and stats everywhere.
    diff = np.angle(np.exp(1j * (psi_f - psi_n)))
    p99 = float(np.percentile(np.abs(diff), 99))
    w_err = float(np.abs(w_f / max(w_f.max(), 1e-12) - w_n / max(w_n.max(), 1e-12)).max())
    st_err = float(np.abs(st_f - st_n).max())
    if not (p99 < 5e-3 and w_err < 1e-3 and st_err < 1e-3):
        raise AssertionError(
            f"on-chip kernel parity FAILED: psi p99={p99:.2e} "
            f"w={w_err:.2e} stats={st_err:.2e}"
        )
    return True


def attest_schedule_quality(N=2048, iters=40, n_refine=10, model=None):
    """
    On-chip quality gate for the precision-scheduled engine
    (:func:`slmsuite_tpu.ops.engine.run_gs_scheduled`): run the headline
    model to convergence through the all-HIGHEST engine AND the
    coarse-then-refine schedule and require the schedule to reach the
    same final quality (efficiency within 5e-3, uniformity within 1e-3).
    WGS is a fixed-point iteration, so coarse-precision transform error
    early on perturbs the trajectory but not the fixed point — this gate
    is the measured proof for the headline shape. Returns the quality
    dict, or raises (the bench refuses a scheduled headline otherwise).
    """
    import jax

    if jax.default_backend() in ("cpu",):
        return {"skipped": "cpu backend"}

    from slmsuite_tpu.models import spot_array_wgs
    from slmsuite_tpu.ops.engine import run_gs, run_gs_scheduled

    if model is None:
        model = spot_array_wgs(N=N, n_side=32, spacing_div=70)
    _, st_plain = run_gs(model.config, model.init_state(), model.consts, iters)
    _, st_sched = run_gs_scheduled(
        model.config, model.init_state(), model.consts, iters,
        n_refine=n_refine,
    )
    st_plain, st_sched = np.asarray(st_plain), np.asarray(st_sched)
    eff_p, unif_p = float(st_plain[-1, 0, 0]), float(st_plain[-1, 0, 1])
    eff_s, unif_s = float(st_sched[-1, 0, 0]), float(st_sched[-1, 0, 1])
    quality = {
        "iters": iters, "n_refine": n_refine,
        "highest_final_efficiency": round(eff_p, 5),
        "highest_final_uniformity": round(unif_p, 5),
        "scheduled_final_efficiency": round(eff_s, 5),
        "scheduled_final_uniformity": round(unif_s, 5),
    }
    if not (abs(eff_s - eff_p) < 5e-3 and unif_s > unif_p - 1e-3):
        raise AssertionError(f"schedule quality gate FAILED: {quality}")
    return quality


def attest_compressed_parity(iters=3, n_spots=64, res=512):
    """
    On-chip attestation of the compressed (grid-free) Zernike transform
    pair: run a few WGS-Kim iterations from the same initial phase
    through the fused Pallas kernels (``cuda=True``) and the jnp
    chunked-matmul twin (``cuda=False``) and require matching spot
    amplitudes/weights. Guards the VPU ``_sincos_reduced`` phase
    synthesis the Pallas path uses. Returns True, or raises.
    """
    import jax

    if jax.default_backend() in ("cpu",):
        return False

    from slmsuite_tpu.hardware.slms.simulated import SimulatedSLM
    from slmsuite_tpu.holography.algorithms import CompressedSpotHologram

    slm = SimulatedSLM(resolution=(res, res), pitch_um=(8, 8), wav_um=0.78)
    rng = np.random.default_rng(11)
    side = int(np.sqrt(n_spots))
    kx, ky = np.meshgrid(
        np.linspace(-6e-3, 6e-3, side), np.linspace(-6e-3, 6e-3, side)
    )
    spots = np.vstack([
        kx.ravel(), ky.ravel(), rng.uniform(-2e-6, 2e-6, kx.size)
    ])
    phase0 = rng.uniform(-np.pi, np.pi, (res, res)).astype(np.float32)
    # Three engine variants share one trajectory: the Pallas-streamed
    # cached kernel (the production path), the jnp cached scan, and the
    # recompute path (cache disabled) that re-synthesizes the sincos
    # every iteration through the fused Pallas kernel.
    variants = (
        ("pallas_cached", True, "4096"),
        ("jnp_cached", False, "4096"),
        ("recompute", True, "0"),
    )
    prev_cache = os.environ.get("SLMSUITE_TPU_COMPRESSED_CACHE_MB")
    out = {}
    try:
        for name, cuda, cache_mb in variants:
            os.environ["SLMSUITE_TPU_COMPRESSED_CACHE_MB"] = cache_mb
            holo = CompressedSpotHologram(
                spots, basis="kxy", cameraslm=slm, cuda=cuda
            )
            holo.reset_phase(phase0)
            holo.optimize("WGS-Kim", maxiter=iters, verbose=False)
            amp_ff = np.asarray(holo.amp_ff)
            weights = np.asarray(holo.weights)
            out[name] = (amp_ff / max(amp_ff.max(), 1e-12),
                         weights / max(weights.max(), 1e-12))
    finally:
        if prev_cache is None:
            os.environ.pop("SLMSUITE_TPU_COMPRESSED_CACHE_MB", None)
        else:
            os.environ["SLMSUITE_TPU_COMPRESSED_CACHE_MB"] = prev_cache
    ref = out["pallas_cached"]
    for name in ("jnp_cached", "recompute"):
        a_err = float(np.abs(out[name][0] - ref[0]).max())
        w_err = float(np.abs(out[name][1] - ref[1]).max())
        if not (a_err < 2e-3 and w_err < 2e-3):
            raise AssertionError(
                f"compressed kernel parity FAILED vs {name}: "
                f"amp={a_err:.2e} w={w_err:.2e}"
            )
    return True


def _marginal_rate(once, small, iters, repeats=3):
    """Marginal (long-minus-short) iteration rate of a host-driven loop,
    clamped at 2x the observed wall rate. Returns ``(rate, wall_rate)``
    so callers can emit BOTH — the marginal estimator cancels fixed
    per-call overhead (state build/sync over the tunnel) but can read up
    to double the end-to-end rate, so the wall rate must ride along in
    the JSON for honest comparison against the baseline targets."""
    def pair_rate(t_s, t_l):
        wall = iters / t_l
        if t_l > t_s:
            return min((iters - small) / (t_l - t_s), 2.0 * wall)
        return wall

    t_smalls, t_larges = [], []
    for _ in range(repeats):
        t_smalls.append(once(small))
        t_larges.append(once(iters))
    t_small = sorted(t_smalls)[len(t_smalls) // 2]
    t_large = sorted(t_larges)[len(t_larges) // 2]
    wall_rate = iters / t_large
    rate = pair_rate(t_small, t_large)
    # Per-repeat single-pair rates, for spread fields that describe the
    # SAME samples as the median (no extra timed windows).
    singles = sorted(pair_rate(s, l) for s, l in zip(t_smalls, t_larges))
    return rate, wall_rate, singles


def iters_to_nonuniformity(stats, threshold=0.01):
    """First 1-based iteration whose spot nonuniformity (1 - uniformity)
    drops below ``threshold``; -1 if never reached in the run. The second
    half of the driver metric (BASELINE.json)."""
    nonu = 1.0 - np.asarray(stats)[:, 0, 1]
    hit = np.nonzero(nonu < threshold)[0]
    return int(hit[0]) + 1 if hit.size else -1


def attest_nonpow2(N=1536, iters=3):
    """
    On-chip validation of the generalized (non-power-of-two) four-step
    fast path: run a few WGS-Kim iterations at a composite non-pow2
    shape through the fused scrambled engine AND the natural engine and
    require parity — the Mosaic lowering of the unbalanced stage splits
    (e.g. 1536 = 48 x 32) is exactly what never exercises on CPU.
    Returns a dict of per-size pass booleans; raises on numeric
    mismatch (a lowering failure surfaces as the raised XLA error).
    """
    import jax

    if jax.default_backend() in ("cpu",):
        return {"skipped": "cpu backend"}
    from slmsuite_tpu.models import spot_array_wgs
    from slmsuite_tpu.ops.fft import _split, _split_ok

    out = {}
    for n in (384, N):
        if not _split_ok(n):
            out[str(n)] = "no balanced factorization"
            continue
        model = spot_array_wgs(N=n, n_side=8, spacing_div=24)
        attest_kernel_parity(n, iters=iters, model=model)
        out[str(n)] = True
        out[f"split_{n}"] = "x".join(str(v) for v in _split(n))
    return out


def bench_batch_scaling(sizes=(1, 2, 4, 8), N=1024, base_iters=2048):
    """
    Single-chip batch-scaling curve of the batched multiplane engine:
    whole-batch iterations/sec at ``n_planes`` in ``sizes`` on ONE
    device. Near-flat per-plane cost (rate_B ~ rate_1 / B) is the
    measurable half of the multi-chip story this environment allows —
    B planes data-parallel over a mesh would then recover rate_1 per
    plane, paying only the psum of the (slm_shape) nearfield sum.

    The marginal window scales as ``1/b`` so every batch size times
    ~0.7 s of on-device signal: a fixed 40-iteration window at b=1
    holds ~15 ms of work — below the tunnel's dispatch noise — which
    is exactly how round 4's artifact recorded the impossible
    b1 < b2 (and a >8x "efficiency" on that noise-floor base).
    """
    from slmsuite_tpu.models.parallel_models import multiplane_batched

    out = {}
    for b in sizes:
        run = multiplane_batched(b, N=N)
        iters = max(64, base_iters // b)
        small = max(8, iters // 8)

        def once(n):
            t0 = time.time()
            res = run(None, n)
            # Touch a dependent sliver of every output leaf. The slice
            # must happen ON DEVICE (leaf.ravel()[:2]) — np.asarray on
            # the whole leaf would drag megabytes of psi/weights planes
            # through the tunnel per call and swamp the iteration cost
            # (this exact bug made round-3 batch numbers fetch-bound).
            for leaf in jax_tree_leaves(res):
                np.asarray(leaf.ravel()[:2])
            return time.time() - t0

        once(small)
        once(iters)
        # Repeats with per-side medians + a spread field derived from
        # the same per-repeat samples: a single marginal estimate on the
        # shared dev slice is only trustworthy with repeat evidence.
        rate, _wall, singles = _marginal_rate(once, small, iters, repeats=3)
        out[f"b{b}"] = round(rate, 1)
        out[f"b{b}_window"] = iters
        out[f"b{b}_spread"] = round(
            (singles[-1] - singles[0]) / max(rate, 1e-9), 2
        )
    base = out.get("b1", 0.0)
    if base:
        # Per-plane efficiency vs perfect scaling: rate_B * B / rate_1.
        # Slightly >1 is real at this shape: one 1024^2 plane underfills
        # the chip, so added planes ride partly in the pipeline bubbles.
        out[f"batch_efficiency_b{sizes[-1]}"] = round(
            out[f"b{sizes[-1]}"] * sizes[-1] / base, 3
        )
    return out


def jax_tree_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def config_2(argv, embed=None):
    """Headline: WGS-Kim 2048^2, 32x32 spots, with roofline evidence.

    ``embed``: extra fields folded into the emitted JSON object — the
    driver records only the LAST line of the bench output, so the
    default run passes compact summaries of configs 1/3/4/5 (plus
    batch-scaling and non-pow2 attestation evidence) through here.
    """
    import jax

    N = int(argv[0]) if argv else 2048
    # 60 iterations: enough for the marginal (long-minus-short)
    # estimator while staying inside driver timeouts when the tunneled
    # slice hits a slow window (its throughput varies >30x).
    iters = int(argv[1]) if len(argv) > 1 else 60
    from slmsuite_tpu.models import spot_array_wgs

    model = spot_array_wgs(N=N, n_side=32, spacing_div=70)
    rate, stats, provenance = bench_engine(model, iters)

    on_tpu = jax.default_backend() not in ("cpu",)
    extra = {"iters_to_1pct_nonuniformity": iters_to_nonuniformity(stats)}
    schedule_fraction = 1.0  # Fraction of iterations at HIGHEST.
    if on_tpu:
        # Precision-scheduled engine (coarse DEFAULT iterations, final
        # quarter refined at HIGHEST): report it as the headline when it
        # measures faster AND the on-chip quality gate proves the final
        # efficiency/uniformity match the all-HIGHEST run. The plain
        # rate always rides along as iter_s_highest.
        from slmsuite_tpu.ops.engine import run_gs_scheduled

        extra["iter_s_highest"] = round(rate, 2)
        try:
            quality = attest_schedule_quality(N, model=model)

            def scheduled(config, state, consts, n):
                return run_gs_scheduled(
                    config, state, consts, n, n_refine=max(1, n // 4)
                )

            rate_s, stats_s, prov_s = bench_engine(
                model, iters, runner=scheduled
            )
            extra["iter_s_scheduled"] = round(rate_s, 2)
            extra["schedule_quality"] = quality
            if rate_s > rate:
                rate, stats, provenance = rate_s, stats_s, prov_s
                n_refine = max(1, iters // 4)
                schedule_fraction = n_refine / iters
                extra["engine"] = (
                    f"scheduled ({iters - n_refine} DEFAULT + "
                    f"{n_refine} HIGHEST iterations)"
                )
            else:
                extra["engine"] = "highest"
        except AssertionError as exc:
            extra["schedule_quality"] = {"error": str(exc)[:200]}
            extra["engine"] = "highest"
    extra.update(provenance)
    commit = _git_commit()
    if commit:
        extra["git_commit"] = commit
    if on_tpu:
        # Refuse to report a headline from unverified kernels: attest
        # fused-vs-natural parity on the chip first (raises on mismatch).
        extra["kernel_parity"] = attest_kernel_parity(N)
        from slmsuite_tpu.ops import engine as E
        import dataclasses

        fused = E._fused_active(
            dataclasses.replace(
                E.GSConfig(
                    method="WGS-Kim", shape=(N, N), slm_shape=(N, N),
                    stat_groups=("computational",),
                ),
                scrambled=True,
            )
        )
        step_bytes, step_passes = step_model(N, fused)
        t_copy, copy_noise = measure_copy_pass_seconds(N)
        t_mm, mm_noise = measure_matmul_seconds(N)
        t_step = 1.0 / rate
        tile = N * N * 4
        # The tunneled dev slice's absolute throughput varies >30x
        # between sessions, so the defensible evidence is the
        # *dimensionless* step cost in same-session roofline units:
        # bytes vs a measured HBM copy pass, and MXU passes vs a
        # measured dense HIGHEST matmul (ceil(N/128)^3 passes).
        model_tiles = step_bytes / tile
        mm_passes = (-(-N // 128)) ** 3
        # The measured matmul unit is HIGHEST (6 bf16 MXU passes per
        # 128^3 MAC block); the engine's stage dots cost fewer passes
        # at reduced kernel precision, so scale the model accordingly.
        from slmsuite_tpu.ops import pallas_fft as PF

        precision = PF._DOT_PRECISION
        precision_factor = {"HIGHEST": 1.0, "BF16X3": 0.5, "DEFAULT": 1 / 6}[
            precision
        ]
        if schedule_fraction < 1.0:
            # Scheduled headline: blend the per-iteration MXU cost over
            # the coarse (DEFAULT) and refine (HIGHEST) phases.
            precision_factor = (
                schedule_fraction * precision_factor
                + (1.0 - schedule_fraction) / 6
            )
            precision = f"scheduled (DEFAULT -> {precision})"
        model_matmuls = step_passes / mm_passes * precision_factor
        bw_time = (model_tiles / 2) * t_copy
        mxu_time = model_matmuls * t_mm
        extra.update({
            "fused_step": fused,
            "fft_precision": precision,
            "bytes_per_step_mb": round(step_bytes / 1e6, 1),
            "mxu_passes_per_step": step_passes,
            "est_copy_bw_gbs": round(2 * tile / t_copy / 1e9, 1),
            "est_matmul_tflops": round(2 * N**3 / t_mm / 1e12, 2),
            # Relative interquartile spread of the roofline timing
            # repeats; >0.5 means the shared dev slice was too noisy for
            # the est_*/utilization fields to be trusted this session.
            "roofline_noise": max(copy_noise, mm_noise),
            "step_cost_copy_passes": round(t_step / t_copy, 1),
            "model_tiles": round(model_tiles, 1),
            "step_cost_matmuls": round(t_step / t_mm, 1),
            "model_matmuls": round(model_matmuls, 2),
            # Fractions of the same-session measured units; the larger
            # is the binding constraint, and their max is the combined
            # (DMA/MXU overlapped) roofline utilization of the step.
            "bandwidth_utilization": round(bw_time / t_step, 3),
            "mxu_utilization": round(mxu_time / t_step, 3),
            "roofline_utilization": round(max(bw_time, mxu_time) / t_step, 3),
        })
        # The BASELINE north star (>= 1000 iter/s) is scoped for a v5p
        # chip; the tunneled dev slice is a v5e. Project the measured
        # step onto v5p peaks (459/197 bf16 TFLOPs = 2.33x MXU,
        # 2765/819 GB/s = 3.38x HBM): every component of the step (MXU
        # passes, HBM tiles, VPU epilogue) speeds up by AT LEAST the
        # MXU ratio, so scaling the whole measured step by 2.33x is the
        # conservative projection.
        MXU_RATIO_V5P = 459 / 197
        extra["projected_v5p_iter_s"] = round(rate * MXU_RATIO_V5P, 1)
        extra["projection_model"] = (
            "measured v5e step scaled by the v5p/v5e peak-MXU ratio "
            f"{MXU_RATIO_V5P:.2f} (conservative: the HBM ratio is 3.38)"
        )

    if embed:
        extra.update(embed)
    return _emit(
        f"WGS-Kim iterations/sec at {N}x{N} (32x32 spots, device stats on)",
        rate, "iter/s", 1000.0,
        final_efficiency=round(float(stats[-1, 0, 0]), 4),
        final_uniformity=round(float(stats[-1, 0, 1]), 4),
        device=str(jax.devices()[0]),
        **extra,
    )


def config_1(argv):
    """GS, 1024^2, 10x10 grid, 50 iters."""
    N = int(argv[0]) if argv else 1024
    iters = int(argv[1]) if len(argv) > 1 else 50
    from slmsuite_tpu.models import spot_array_wgs

    rate, stats, prov = bench_engine(
        spot_array_wgs(N=N, n_side=10, spacing_div=24, method="GS"), iters
    )
    return _emit(
        f"GS iterations/sec at {N}x{N} (10x10 spots)",
        rate, "iter/s", 1000.0,
        final_efficiency=round(float(stats[-1, 0, 0]), 4),
        final_uniformity=round(float(stats[-1, 0, 1]), 4),
        iters_to_1pct_nonuniformity=iters_to_nonuniformity(stats),
        **prov,
    )


def config_3(argv):
    """MRAF ring-image hologram with nan noise region."""
    import jax

    N = int(argv[0]) if argv else 2048
    iters = int(argv[1]) if len(argv) > 1 else 100

    from slmsuite_tpu.models import image_mraf

    model = image_mraf(N=N, mraf_factor=0.5)
    extra = {}
    if jax.default_backend() not in ("cpu",):
        # Attest the MRAF carry-mode kernels (semi-fused step with the
        # exact weight-norm sync) against the natural engine on-chip,
        # like the headline's gate — on the SAME model instance the
        # bench then times.
        extra["kernel_parity"] = attest_kernel_parity(N, model=model)
    rate, stats, prov = bench_engine(model, iters)
    return _emit(
        f"MRAF WGS-Leonardo iterations/sec at {N}x{N} (ring target)",
        rate, "iter/s", 1000.0,
        final_efficiency=round(float(stats[-1, 0, 0]), 4),
        **extra,
        **prov,
    )


def config_4(argv):
    """Camera-in-the-loop WGS on the simulated rig. The qualifying
    simulated rig runs DEVICE-RESIDENT: the whole measurement (display
    quantization, far-field, camera sampling, spot windows) and the
    weight update execute inside the scanned engine
    (feedback mode "experimental_spot_sim"); no host hop per iteration."""
    iters = int(argv[0]) if argv else 10

    from slmsuite_tpu.hardware.cameras.simulated import SimulatedCamera
    from slmsuite_tpu.hardware.cameraslms import FourierSLM
    from slmsuite_tpu.hardware.slms.simulated import SimulatedSLM
    from slmsuite_tpu.holography.algorithms import SpotHologram

    slm = SimulatedSLM(resolution=(512, 512), pitch_um=(8, 8), wav_um=0.78)
    slm.set_source_analytic(
        "gaussian2d", sim=True, x0=0, y0=0, a=1, c=0,
        wx=0.35 * 512 * slm.pitch[0], wy=0.35 * 512 * slm.pitch[1],
    )
    cam = SimulatedCamera(
        slm, resolution=(512, 512), pitch_um=(5.5, 5.5),
        M=np.array([[8.0e3, 200.0], [-200.0, 8.0e3]]),
        b=np.array([[256.0], [256.0]]),
    )
    cam.set_exposure(1.0)
    fs = FourierSLM(cam, slm)
    fs.fourier_calibrate(array_shape=5, array_pitch=16, verbose=False)

    spot_ij = np.array(
        [[160.0, 256, 352, 256], [256.0, 160, 256, 352]]
    )
    holo = SpotHologram((1024, 1024), spot_ij, basis="ij", cameraslm=fs)
    holo.optimize("WGS-Kim", maxiter=5, verbose=False)  # Warm computational.
    # Warm the stepwise experimental path too (jitted forward/backward and
    # the camera sampler compile on first use).
    holo.optimize(
        "WGS-Kim", maxiter=2, verbose=False,
        feedback="experimental_spot", stat_groups=["experimental_spot"],
    )

    # Marginal (long-minus-short) rate: cancels the per-optimize fixed
    # cost (state build/sync round trips over the tunnel), isolating
    # the per-iteration closed-loop cost that the metric names.
    small = max(1, iters // 4)

    def once(n):
        t0 = time.time()
        holo.optimize(
            "WGS-Kim", maxiter=n, verbose=False,
            feedback="experimental_spot", stat_groups=["experimental_spot"],
        )
        return time.time() - t0

    rate, wall_rate, singles = _marginal_rate(once, small, iters)
    unif = holo.stats["stats"]["experimental_spot"]["uniformity"][-1]
    # Baseline 10 iter/s: the closed-loop target set by the round-2
    # review ("config-4 >= 10 iter/s"), originally scoped for a
    # host-paced loop; the device-resident scan is bounded by the two
    # FFT pairs per iteration instead (BASELINE.md names no reference
    # number for this config).
    return _emit(
        "closed-loop WGS marginal iterations/sec "
        "(simulated camera feedback, 1024^2)",
        rate, "iter/s", 10.0,
        estimator="marginal (long-minus-short), clamped <= 2x wall",
        wall_iter_s=round(wall_rate, 2),
        iter_s_spread=round((singles[-1] - singles[0]) / max(rate, 1e-9), 3),
        measured_uniformity=round(float(unif), 4),
    )


def config_5(argv):
    """Zernike 3D compressed spot array."""
    import jax

    n_spots = int(argv[0]) if argv else 256
    iters = int(argv[1]) if len(argv) > 1 else 30

    from slmsuite_tpu.hardware.slms.simulated import SimulatedSLM
    from slmsuite_tpu.holography.algorithms import CompressedSpotHologram

    extra = {}
    if jax.default_backend() not in ("cpu",):
        extra["kernel_parity"] = attest_compressed_parity()

    slm = SimulatedSLM(resolution=(1024, 1024), pitch_um=(8, 8), wav_um=0.78)
    rng = np.random.default_rng(0)
    side = int(np.sqrt(n_spots))
    kx, ky = np.meshgrid(
        np.linspace(-8e-3, 8e-3, side), np.linspace(-8e-3, 8e-3, side)
    )
    focus = rng.uniform(-2e-6, 2e-6, kx.size)
    spots = np.vstack([kx.ravel(), ky.ravel(), focus])

    holo = CompressedSpotHologram(spots, basis="kxy", cameraslm=slm)
    # Marginal (long-minus-short) rate, like the headline: each
    # optimize() call pays a fixed host<->device round trip (psi
    # upload, amp_ff materialization) that the tunneled dev slice
    # inflates by two orders of magnitude over production hardware;
    # differencing isolates the per-iteration cost. Warm both lengths
    # (the scanned engine compiles per scan length).
    small = max(1, iters // 5)

    def once(n):
        t0 = time.time()
        holo.optimize("WGS-Kim", maxiter=n, verbose=False)
        return time.time() - t0

    once(small)
    once(iters)
    rate, wall_rate, singles = _marginal_rate(once, small, iters)
    cv = float(np.std(holo.amp_ff) / np.mean(holo.amp_ff))
    # Baseline 100 iter/s: the compressed-transform target set by the
    # round-2 review ("config-5 >= 100 iter/s") — the VPU-bound
    # sincos cost of the grid-free Zernike transform pair at 1024^2 x
    # 256 spots (BASELINE.md names no reference number for this config).
    return _emit(
        f"compressed 3D-spot WGS marginal iterations/sec "
        f"({kx.size} spots, 1024^2 SLM)",
        rate, "iter/s", 100.0,
        estimator="marginal (long-minus-short), clamped <= 2x wall",
        wall_iter_s=round(wall_rate, 2),
        iter_s_spread=round((singles[-1] - singles[0]) / max(rate, 1e-9), 3),
        amp_cv=float(f"{cv:.3g}"),
        **extra,
    )


def _device_reachable(timeout_s=240):
    """Probe jax device discovery in a SUBPROCESS with a timeout: over
    the tunneled dev slice, ``jax.devices()`` can hang indefinitely when
    the tunnel is down — better to record an explicit error line than
    time the whole driver out. Returns None when healthy, else the
    failure description."""
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return None  # CPU runs cannot hang on the tunnel.
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return f"device discovery hung > {timeout_s}s (tunnel down?)"
    if probe.returncode != 0:
        return f"device discovery failed: {probe.stderr.strip()[-200:]}"
    return None


#: Fields worth carrying from a full config result into the compact
#: per-config summary embedded in the headline line.
_COMPACT_KEYS = (
    "unit", "vs_baseline", "kernel_parity", "estimator", "wall_iter_s",
    "final_efficiency", "final_uniformity", "measured_uniformity",
    "amp_cv", "iters_to_1pct_nonuniformity",
    # Repeat evidence: without the spread, a per-config rate from the
    # shared dev slice is a single sample (r5 measured c1 at 1744 and
    # 5523 in two sessions of the same code — only the spread says
    # which to trust).
    "iter_s_spread", "timing_window_iters",
)


def _compact(result):
    """Compact summary of a config result dict for headline embedding."""
    out = {"iter_s": result.get("value")}
    for key in _COMPACT_KEYS:
        if key in result:
            out[key] = result[key]
    return out


def main():
    argv = sys.argv[1:]
    _enable_compile_cache()
    failure = _device_reachable()
    if failure is not None:
        print(json.dumps({
            "metric": "WGS-Kim iterations/sec at 2048x2048 (32x32 spots, device stats on)",
            "error": failure,
        }))
        sys.exit(1)
    configs = {1: config_1, 2: config_2, 3: config_3, 4: config_4, 5: config_5}
    if argv and argv[0] == "--config":
        try:
            config = configs[int(argv[1])]
        except (KeyError, ValueError, IndexError):
            sys.exit(f"Usage: bench.py [--config {{1..5}}] [size] [iters] "
                     f"(got {argv[1:2]})")
        config(argv[2:])
        return

    headline_only = bool(argv and argv[0] == "--headline")
    if headline_only:
        argv = argv[1:]

    # The HEADLINE runs (and prints) FIRST: the driver records only the
    # LAST line of the bench output, and on a flaky tunnel a hang in the
    # extras must not cost the headline — the plain line printed here is
    # the tail until the richer combined line below supersedes it.
    headline = config_2(argv)
    if headline_only:
        return

    # Extras: compact summaries of configs 1/3/4/5, the non-pow2 on-chip
    # attestation, and the batch-scaling curve, EMBEDDED in a re-emitted
    # headline line (the standalone per-config lines are for interactive
    # reading only). Each extra is exception-guarded AND runs under a
    # SIGALRM watchdog so an in-config device stall cannot hang the
    # process past the budget.
    import signal

    deadline = time.time() + float(
        os.environ.get("SLMSUITE_TPU_BENCH_BUDGET_S", 900)
    )

    def with_watchdog(fn, *args):
        remaining = deadline - time.time()
        if remaining <= 1:
            raise TimeoutError("bench budget exhausted")
        if hasattr(signal, "SIGALRM"):
            def on_alarm(signum, frame):
                raise TimeoutError("bench budget exhausted (watchdog)")

            prev = signal.signal(signal.SIGALRM, on_alarm)
            signal.alarm(int(remaining) + 1)
            try:
                return fn(*args)
            finally:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, prev)
        return fn(*args)

    summaries = {}
    for n, args in ((1, ["1024", "30"]), (3, ["2048", "40"]),
                    (4, ["8"]), (5, ["256", "20"])):
        try:
            summaries[f"c{n}"] = _compact(with_watchdog(configs[n], args))
        except Exception as exc:  # noqa: BLE001 - report, keep headline
            summaries[f"c{n}"] = {
                "error": f"{type(exc).__name__}: {exc}"[:200]
            }
            print(json.dumps(
                {"metric": f"config_{n}", "error": f"{type(exc).__name__}: {exc}"}
            ))
    embed = {"configs": summaries}
    for key, fn in (
        ("nonpow2_parity", attest_nonpow2),
        ("batch_scaling_iter_s", bench_batch_scaling),
    ):
        try:
            embed[key] = with_watchdog(fn)
        except Exception as exc:  # noqa: BLE001 - report, keep headline
            embed[key] = {"error": f"{type(exc).__name__}: {exc}"[:200]}

    # Final (tail) line: the headline metrics with all evidence embedded.
    final = dict(headline)
    final.update(embed)
    print(json.dumps(final))


if __name__ == "__main__":
    main()
