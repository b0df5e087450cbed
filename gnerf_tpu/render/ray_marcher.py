"""Midpoint alpha-compositing ray marcher (MipNeRF-style, no cone tracing).

JAX equivalent of the reference MipRayMarcher2
(`/root/reference/g_nerf/training/volumetric_rendering/ray_marcher.py:25-57`):
segment midpoints, `softplus(sigma - 1)` density activation (the -1 bias
improves initialization), alpha compositing via shifted cumprod, optional
white background, output scaled to (-1, 1). The whole thing is elementwise +
a cumprod along the (static) sample axis — XLA fuses it into one pass.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp


def march_rays(
    colors: jax.Array,
    densities: jax.Array,
    depths: jax.Array,
    options: Mapping[str, Any],
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Composite per-sample colors/densities along each ray.

    Args:
      colors:    [N, R, S, C] per-sample features.
      densities: [N, R, S, 1] raw densities.
      depths:    [N, R, S, 1] sample depths (sorted ascending).
      options:   rendering options; uses clamp_mode ('softplus' only) and
                 white_back.

    Returns:
      (composite_rgb [N,R,C], composite_depth [N,R,1], weights [N,R,S-1,1]).
    """
    assert options.get("clamp_mode", "softplus") == "softplus", (
        "march_rays only supports clamp_mode='softplus'"
    )
    # Compositing (exp/cumprod of near-1 transmittances) is precision
    # sensitive: always march in fp32 even when the feature pipeline runs
    # bf16 — the tensors here are tiny (rays x samples).
    colors = colors.astype(jnp.float32)
    densities = densities.astype(jnp.float32)
    depths = depths.astype(jnp.float32)
    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    colors_mid = (colors[:, :, :-1] + colors[:, :, 1:]) / 2
    densities_mid = (densities[:, :, :-1] + densities[:, :, 1:]) / 2
    depths_mid = (depths[:, :, :-1] + depths[:, :, 1:]) / 2

    densities_mid = jax.nn.softplus(densities_mid - 1.0)

    density_delta = densities_mid * deltas
    alpha = 1.0 - jnp.exp(-density_delta)

    alpha_shifted = jnp.concatenate(
        [jnp.ones_like(alpha[:, :, :1]), 1.0 - alpha + 1e-10], axis=-2
    )
    weights = alpha * jnp.cumprod(alpha_shifted, axis=-2)[:, :, :-1]

    composite_rgb = jnp.sum(weights * colors_mid, axis=-2)
    weight_total = jnp.sum(weights, axis=2)
    composite_depth = jnp.sum(weights * depths_mid, axis=-2) / weight_total

    # Clip depth to the global depth range (NaN -> +inf first), as reference.
    composite_depth = jnp.nan_to_num(composite_depth, nan=jnp.inf)
    composite_depth = jnp.clip(composite_depth, jnp.min(depths), jnp.max(depths))

    if options.get("white_back", False):
        composite_rgb = composite_rgb + 1.0 - weight_total

    composite_rgb = composite_rgb * 2.0 - 1.0  # scale to (-1, 1)
    return composite_rgb, composite_depth, weights
