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


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Flag-gated multi-host runtime init (SURVEY.md section 2.3/5.8).

    The TPU-native replacement for the reference's
    `torch.distributed.init_process_group(nccl, file://...)` rendezvous
    (`/root/reference/g_nerf/train.py:40-47`): one JAX process per host,
    `jax.distributed.initialize` wires the coordinator, and all later
    collectives ride ICI/DCN through XLA.

    Enabled when `coordinator_address` is given or GNERF_DISTRIBUTED=1 /
    JAX_COORDINATOR_ADDRESS is set in the environment (on TPU pods the
    arguments are auto-detected from the metadata server, so flag-only
    activation is the common case). Returns True iff multi-host mode was
    initialized; single-process behavior is unchanged when disabled."""
    import os

    enabled = (
        coordinator_address is not None
        or os.environ.get("GNERF_DISTRIBUTED", "") == "1"
        or bool(os.environ.get("JAX_COORDINATOR_ADDRESS"))
    )
    if not enabled:
        return False
    kwargs = {}
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True


def process_info() -> tuple[int, int]:
    """(process_index, process_count) — the rank/num_replicas pair that
    gates I/O and shards the data sampler (reference `training_loop.py:152`
    rank-0 prints and `misc.InfiniteSampler(rank, num_replicas)`)."""
    return jax.process_index(), jax.process_count()


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
