"""Device mesh construction.

TPU-native replacement for the reference's process-per-GPU NCCL topology
(`/root/reference/g_nerf/train.py:36-47`): a single `jax.sharding.Mesh`
whose axes carry the parallelism strategy —

  'data'  — batch/data parallelism (the reference's only strategy)
  'rays'  — ray/sample-axis model parallelism for the renderer, the analog
            of sequence parallelism (SURVEY.md section 5.7)

Within a slice the axes ride ICI; across slices the leading axis maps to
DCN. On multi-host, call `jax.distributed.initialize()` before building the
mesh (one JAX process per host — the analog of `torch.distributed`'s
init_process_group, without the hand-rolled rendezvous file).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
RAY_AXIS = "rays"


def make_mesh(
    data: Optional[int] = None,
    rays: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'rays') mesh over the available devices.

    data=None uses all remaining devices on the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % rays == 0, f"{n} devices not divisible by rays={rays}"
        data = n // rays
    assert data * rays == n, f"mesh {data}x{rays} != {n} devices"
    grid = np.asarray(devices).reshape(data, rays)
    return Mesh(grid, (DATA_AXIS, RAY_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for fully-replicated pytrees (params): the TPU-native
    equivalent of the reference's rank-0 parameter broadcast
    (`training_loop.py:234-238`)."""
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def ray_sharded(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard batch over 'data' and the ray axis over 'rays'."""
    assert ndim >= 2
    return NamedSharding(mesh, P(DATA_AXIS, RAY_AXIS, *([None] * (ndim - 2))))
