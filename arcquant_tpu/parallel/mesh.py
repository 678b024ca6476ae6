"""Device mesh construction.

The reference's only multi-device story is greedy layer→GPU placement
with host-driven device moves (parallel_utils.py:89-163, disabled).
Here parallelism is the standard JAX story: a Mesh whose axes carry
semantic names, NamedSharding for placement, collectives over ICI
inserted by XLA / called explicitly in shard_map (SURVEY.md §2.3).

Axes:
  dp — data/batch parallel (independent sequences)
  tp — tensor parallel (shard weight N or K dims; psum on row-parallel)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh

tp_axis = "tp"
dp_axis = "dp"


def make_mesh(dp: int = 1, tp: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, tp) mesh. tp defaults to all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None:
        tp = n // dp
    assert dp * tp == n, (dp, tp, n)
    arr = mesh_utils.create_device_mesh((dp, tp), devices=devices)
    return Mesh(arr, (dp_axis, tp_axis))


def multihost_init(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize the JAX multi-controller runtime (DCN across hosts,
    ICI within a slice). No-op when already initialized or single
    process. Mirrors the standard jax.distributed story — the
    reference has no distributed backend at all (SURVEY.md §2.3)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        pass  # already initialized / single-process run
