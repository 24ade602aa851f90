"""
Flagship end-to-end model configurations.

The reference ships no "model zoo" — its flagship workloads are implied
by the test/benchmark matrix (ref ``tests/holography/test_algorithms.py:121-145``:
1024² spot-array GS/WGS runs). Here those workloads are first-class
builders that assemble an engine config, its constants, and an initial
state in one call, shared by ``bench.py``, ``__graft_entry__`` and the
examples — so the benchmarked configuration IS the shipped one.

- :func:`spot_array_wgs` — N², n×n spot-array WGS (the headline
  benchmark; north-star config).
- :func:`image_mraf` — MRAF image hologram (ring target with a noise
  region), the arbitrary-image flagship.
- :func:`multiplane_batched` — B-plane batched multiplane WGS for a
  ``data``-axis mesh (multi-chip flagship).
- :func:`compressed_spots_3d` — grid-free Zernike 3D spot model (the
  compressed-transform flagship).
- :func:`sharded_plane_wgs` — row-sharded giant-farfield WGS for a
  ``rows``-axis mesh.

Each builder returns an :class:`EngineModel` whose ``run(n)`` executes
``n`` iterations on device and whose ``step`` is a pure jittable
function — the unit the driver compile-checks.
"""

from slmsuite_tpu.models.engine_models import (
    EngineModel,
    image_mraf,
    spot_array_target,
    spot_array_wgs,
)
from slmsuite_tpu.models.parallel_models import (
    compressed_spots_3d,
    multiplane_batched,
    sharded_plane_wgs,
)

__all__ = [
    "EngineModel",
    "spot_array_target",
    "spot_array_wgs",
    "image_mraf",
    "multiplane_batched",
    "compressed_spots_3d",
    "sharded_plane_wgs",
]
