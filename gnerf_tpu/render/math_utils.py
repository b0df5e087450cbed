"""Ray geometry math: normalization, ray-AABB intersection, batched linspace.

JAX re-derivation of the reference helpers
(`/root/reference/g_nerf/training/volumetric_rendering/math_utils.py`),
written branchless so everything traces under jit: the reference's
boolean-mask fix-ups become `jnp.where` selects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_vecs(vectors: jax.Array, eps: float = 0.0) -> jax.Array:
    return vectors / (jnp.linalg.norm(vectors, axis=-1, keepdims=True) + eps)


def get_ray_limits_box(
    rays_o: jax.Array, rays_d: jax.Array, box_side_length: float
) -> tuple[jax.Array, jax.Array]:
    """Slab-method intersection of rays with the centered cube of side
    `box_side_length`. Returns (t_min, t_max) with trailing dim 1; invalid
    (missing) rays get (-1, -2), matching the reference convention
    (`math_utils.py:46-98`).
    """
    lead_shape = rays_o.shape[:-1]
    o = rays_o.reshape(-1, 3)
    d = rays_d.reshape(-1, 3)
    half = box_side_length / 2

    invdir = 1.0 / d
    # For each axis: entry at the near slab, exit at the far slab.
    t_lo = (-half - o) * invdir
    t_hi = (half - o) * invdir
    t_near = jnp.minimum(t_lo, t_hi)
    t_far = jnp.maximum(t_lo, t_hi)

    # Match the reference's incremental valid-tracking: a ray is invalid as
    # soon as the running [tmin, tmax] interval and the next axis slab are
    # disjoint (checked BEFORE folding that axis in).
    tmin = t_near[:, 0]
    tmax = t_far[:, 0]
    is_valid = jnp.ones(tmin.shape, dtype=bool)
    for axis in (1, 2):
        is_valid &= ~((tmin > t_far[:, axis]) | (t_near[:, axis] > tmax))
        tmin = jnp.maximum(tmin, t_near[:, axis])
        tmax = jnp.minimum(tmax, t_far[:, axis])

    tmin = jnp.where(is_valid, tmin, -1.0)
    tmax = jnp.where(is_valid, tmax, -2.0)
    return tmin.reshape(*lead_shape, 1), tmax.reshape(*lead_shape, 1)


def linspace_batched(start: jax.Array, stop: jax.Array, num: int) -> jax.Array:
    """[num, *start.shape] evenly spaced values from start to stop inclusive."""
    steps = jnp.arange(num, dtype=jnp.float32) / (num - 1)
    steps = steps.reshape((num,) + (1,) * start.ndim)
    return start[None] + steps * (stop - start)[None]
