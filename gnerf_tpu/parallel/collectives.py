"""Collectives and distributed invariants.

Replaces the reference's hand-rolled flat-buffer gradient all-reduce
(`/root/reference/g_nerf/training/training_loop.py:388-396,427-437`) and
`check_ddp_consistency` (`torch_utils/misc.py:202-213`) with XLA-native
equivalents: gradients are `psum`ed inside the sharded train step (XLA
fuses and schedules the collectives over ICI; no manual buffer flattening
needed), and replica consistency is an allgather-and-compare debug check.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def pmean_grads(grads: Any, axis_name: str) -> Any:
    """Cross-replica gradient mean with NaN/Inf scrubbing — the semantics of
    the reference's all_reduce + nan_to_num (`training_loop.py:391-395`)."""
    def scrub(g):
        g = jax.lax.pmean(g, axis_name)
        return jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5)

    return jax.tree_util.tree_map(scrub, grads)


def psum_moments(value: jax.Array, axis_name: str) -> jax.Array:
    """All-reduce a [n, sum, sum_sq] moment triple (training-stats sync,
    reference `torch_utils/training_stats.py` _sync)."""
    return jax.lax.psum(value, axis_name)


def check_replica_consistency(params: Any, mesh) -> bool:
    """Debug check: assert all devices hold identical replicated params.

    TPU-native analog of `misc.check_ddp_consistency`. Returns True when
    consistent; raises AssertionError naming the first divergent leaf.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    for i, leaf in enumerate(leaves):
        if not isinstance(leaf, jax.Array):
            continue
        shards = [jax.device_get(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            if not (s == shards[0]).all():
                name = jax.tree_util.tree_unflatten(
                    treedef, [j == i for j in range(len(leaves))]
                )
                raise AssertionError(f"replica divergence at leaf index {i}: {name}")
    return True
