"""Cross-section density visualization.

Equivalent of reference `training/crosssection_utils.py:13-24`: sample a
planar slice of sigma through `sample_mixed` for debugging the learned
geometry."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_cross_section(g, params_g, ws: jax.Array, resolution: int = 256,
                         w_extent: float = 0.3, axis: str = "z",
                         offset: float = 0.0) -> jax.Array:
    """[N, resolution, resolution] sigma slice at `axis`=offset."""
    lin = jnp.linspace(-w_extent, w_extent, resolution)
    u, v = jnp.meshgrid(lin, lin, indexing="ij")
    flat_u, flat_v = u.reshape(-1), v.reshape(-1)
    off = jnp.full_like(flat_u, offset)
    cols = {"x": (off, flat_u, flat_v),
            "y": (flat_u, off, flat_v),
            "z": (flat_u, flat_v, off)}[axis]
    coords = jnp.stack(cols, axis=-1)[None]
    coords = jnp.broadcast_to(coords, (ws.shape[0],) + coords.shape[1:])
    dirs = jnp.zeros_like(coords)
    sigma = g.sample_mixed(params_g, coords, dirs, ws)["sigma"]
    return sigma.reshape(ws.shape[0], resolution, resolution)
