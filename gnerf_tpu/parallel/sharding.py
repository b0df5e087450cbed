"""Sharding helpers: put pytrees on the mesh, build sharded step functions.

The framework's SPMD recipe (scaling-book style): pick a mesh, annotate
input/output shardings, let XLA insert the collectives. These helpers keep
that recipe one-liner-ish at the call sites (train step, batched video
render, sigma-grid sweep).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, RAY_AXIS, replicated


def put_replicated(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree fully replicated on every device of the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def put_sharded(tree: Any, mesh: Mesh, spec: P) -> Any:
    sh = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def put_global_batch(value: Any, sharding: NamedSharding, world: int) -> jax.Array:
    """Place one host's batch array under a (possibly multi-host) sharding.

    Single-host: plain device_put. Multi-host: each host's data iterator
    yields its batch//world shard; assemble the global array from the
    process-local pieces via make_array_from_process_local_data — plain
    device_put of host-local data to shardings spanning non-addressable
    devices is not portable across JAX versions. (The analog of the
    reference's per-rank batch split, `train.py:273`.)"""
    import numpy as np

    if world == 1:
        return jax.device_put(jnp.asarray(value), sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(value))


def sharded_jit(
    fn: Callable,
    mesh: Mesh,
    in_specs: Any,
    out_specs: Any = None,
    **jit_kwargs,
) -> Callable:
    """jit with NamedSharding-annotated inputs/outputs over `mesh`.

    in_specs / out_specs are pytrees of PartitionSpec (or None = replicated),
    matching the function's args / outputs.
    """

    def to_sharding(spec):
        if spec is None:
            spec = P()
        return NamedSharding(mesh, spec)

    in_sh = jax.tree_util.tree_map(
        to_sharding, in_specs, is_leaf=lambda x: x is None or isinstance(x, P)
    )
    out_sh = None
    if out_specs is not None:
        out_sh = jax.tree_util.tree_map(
            to_sharding, out_specs, is_leaf=lambda x: x is None or isinstance(x, P)
        )
    return jax.jit(fn, in_shardings=in_sh, out_shardings=out_sh, **jit_kwargs)


def batch_spec(ndim: int = 1) -> P:
    return P(DATA_AXIS, *([None] * (ndim - 1)))


def ray_spec(ndim: int = 2) -> P:
    return P(DATA_AXIS, RAY_AXIS, *([None] * (ndim - 2)))
