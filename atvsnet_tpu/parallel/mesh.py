"""Device mesh construction and sharding policy.

Parallelism axes for this workload (SURVEY.md §2.3 — the reference has none, only
num_gpus scaffolding at example.py:39-42):

  'data'  — scenes / reference images (pure DP; batch axis).
  'view'  — the N-1 independent view-pair computations of stages 1 and 3. They only
            synchronize inside attention aggregation, whose cross-view terms are one
            all-reduce over this axis (the shared-weight sum, reference network.py:326,
            and the softmax normalizer over views).

Collectives ride ICI via XLA's SPMD partitioner: the pipeline annotates the pair-stacked
intermediates with `with_sharding_constraint` and XLA inserts the psums.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def parse_mesh_spec(spec: str) -> tuple[int, int]:
    """'data=2,view=4' -> (2, 4); missing axes default to 1."""
    axes = {"data": 1, "view": 1}
    for part in spec.split(","):
        if not part:
            continue
        name, _, val = part.partition("=")
        name = name.strip()
        if name not in axes:
            raise ValueError(f"unknown mesh axis {name!r} (want data/view)")
        axes[name] = int(val)
    return axes["data"], axes["view"]


def make_mesh(
    n_data: int = 1,
    n_view: int = 1,
    n_depth: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'view'[, 'depth']) mesh. The 'depth' axis (SURVEY §2.3 item iii)
    shards the D=max_d plane axis of the cost volumes — an HBM-capacity alternative
    to remat for full-resolution training (parallel/pipeline.py); 2-axis meshes are
    returned when n_depth == 1 so existing 2-axis PartitionSpecs keep working."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_view * n_depth
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    if n_depth == 1:
        arr = np.asarray(devices[:need]).reshape(n_data, n_view)
        return Mesh(arr, axis_names=("data", "view"))
    arr = np.asarray(devices[:need]).reshape(n_data, n_view, n_depth)
    return Mesh(arr, axis_names=("data", "view", "depth"))


def auto_mesh_shape(n_devices: int, num_pairs: int) -> tuple[int, int]:
    """(n_data, n_view): largest divisor of num_pairs that divides n_devices goes to
    'view'; the rest becomes data parallelism."""
    n_view = 1
    for cand in range(min(n_devices, num_pairs), 0, -1):
        if num_pairs % cand == 0 and n_devices % cand == 0:
            n_view = cand
            break
    return n_devices // n_view, n_view


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-leading arrays: shard dim 0 over 'data'."""
    return NamedSharding(mesh, P("data"))


def pair_sharding(mesh: Mesh) -> NamedSharding:
    """Pair-stacked arrays (P, B, ...): pair axis over 'view', batch over 'data'."""
    return NamedSharding(mesh, P("view", "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
