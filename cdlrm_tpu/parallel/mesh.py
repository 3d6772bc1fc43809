"""Mesh and sharding helpers for the 1-D data-parallel axis.

The reference's parallelism is pure DP: one process per GPU, NCCL collectives
(/root/reference/main_no_ddp.py:341-343,234-321). Here DP is a single
controller with a 1-D ``jax.sharding.Mesh`` over the 'dp' axis; collectives
are ``psum``/``pmax`` inside ``shard_map`` (SURVEY.md §2 native-equivalents
table). Divergent-by-design per-replica state (the embedding caches) carries
an explicit leading device axis sharded over 'dp' (DESIGN.md D4).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def make_dp_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            if num_devices > len(devices):
                raise ValueError(
                    f"requested {num_devices} devices, only {len(devices)} available"
                )
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DP_AXIS,))


def batch_sharding(mesh: Mesh, axis: int, ndim: int) -> NamedSharding:
    """Shard dimension ``axis`` of an ndim-array over the dp axis."""
    spec = [None] * ndim
    spec[axis] = DP_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
