#!/usr/bin/env python
"""
Headline benchmark: WGS-Kim iterations/sec on a 2048x2048 SLM with a
32x32 spot array (BASELINE.json config 2; north star = 1000 iter/s on a
full v5p chip).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology notes for this environment:
- The work is a single jitted `lax.scan` of dependent iterations, so a
  caching runtime cannot skip it; timing brackets a full value fetch
  (block_until_ready is unreliable over the axon tunnel).
- The available dev slice is severely bandwidth-limited (~4-23 GB/s
  measured vs 819 GB/s for a full v5e); the loop is at that roofline.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from slmsuite_tpu.ops.engine import GSConfig, init_gs_state, run_gs
    from slmsuite_tpu.ops.propagation import fold_phase

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    shape = (N, N)
    # 32x32 spot grid.
    target = np.zeros(shape, dtype=np.float32)
    idx = ((np.arange(32) - 15.5) * (N // 70) + N / 2).astype(int)
    xs, ys = np.meshgrid(idx, idx)
    target[ys.ravel(), xs.ravel()] = 1.0
    target /= np.sqrt((target**2).sum())

    rng = np.random.default_rng(0)
    phase0 = rng.uniform(-np.pi, np.pi, shape).astype(np.float32)

    config = GSConfig(
        method="WGS-Kim", shape=shape, slm_shape=shape, stat_groups=("computational",)
    )
    consts = {
        "amp": jnp.float32(1.0 / N),
        "target": jnp.asarray(target),
        "stat_mask": jnp.asarray(target != 0),
        "feedback_exponent": jnp.float32(0.8),
        "feedback_factor": jnp.float32(0.1),
        "fix_phase_iteration": jnp.int32(10),
        "fix_phase_efficiency": jnp.float32(np.nan),
    }

    # Warmup (compile + run).
    state = init_gs_state(config, fold_phase(phase0, shape), target.copy())
    state, stats = run_gs(config, state, consts, iters)
    np.asarray(stats)

    # Timed run (fresh state; fetch forces completion).
    state = init_gs_state(config, fold_phase(phase0, shape), target.copy())
    t0 = time.time()
    state, stats = run_gs(config, state, consts, iters)
    stats = np.asarray(stats)
    dt = time.time() - t0

    value = iters / dt
    result = {
        "metric": f"WGS-Kim iterations/sec at {N}x{N} (32x32 spots, device stats on)",
        "value": round(value, 2),
        "unit": "iter/s",
        "vs_baseline": round(value / 1000.0, 4),
        "final_efficiency": round(float(stats[-1, 0, 0]), 4),
        "final_uniformity": round(float(stats[-1, 0, 1]), 4),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
