"""Pinhole-camera ray generation (OpenCV convention).

JAX equivalent of the reference RaySampler
(`/root/reference/g_nerf/training/volumetric_rendering/ray_sampler.py`):
pixel-center UVs lifted through the (normalized) intrinsics, transformed by
cam2world; returns world-space origins and unit directions. Pure function —
vmap/jit friendly, no module state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_rays(
    cam2world: jax.Array, intrinsics: jax.Array, resolution: int
) -> tuple[jax.Array, jax.Array]:
    """Args:
      cam2world:  [N, 4, 4] camera-to-world matrices (OpenCV axes).
      intrinsics: [N, 3, 3] intrinsics normalized by image size.
      resolution: image side length in pixels.

    Returns:
      ray_origins: [N, res*res, 3]; ray_dirs: [N, res*res, 3] (unit norm).
      Pixel order is row-major: m = row * res + col.
    """
    N = cam2world.shape[0]
    M = resolution * resolution
    cam_pos = cam2world[:, :3, 3]
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]

    # Pixel centers: x = (col + .5)/res indexes width, y = (row + .5)/res height.
    centers = (jnp.arange(resolution, dtype=jnp.float32) + 0.5) / resolution
    yy, xx = jnp.meshgrid(centers, centers, indexing="ij")
    x_cam = jnp.broadcast_to(xx.reshape(1, M), (N, M))
    y_cam = jnp.broadcast_to(yy.reshape(1, M), (N, M))
    z_cam = jnp.ones((N, M), dtype=jnp.float32)

    x_lift = (x_cam - cx + cy * sk / fy - sk * y_cam / fy) / fx * z_cam
    y_lift = (y_cam - cy) / fy * z_cam

    cam_rel = jnp.stack([x_lift, y_lift, z_cam, jnp.ones_like(z_cam)], axis=-1)
    world = jnp.einsum(
        "nij,nmj->nmi", cam2world, cam_rel, precision=jax.lax.Precision.HIGHEST
    )[..., :3]

    ray_dirs = world - cam_pos[:, None, :]
    ray_dirs = ray_dirs / jnp.linalg.norm(ray_dirs, axis=2, keepdims=True)
    ray_origins = jnp.broadcast_to(cam_pos[:, None, :], ray_dirs.shape)
    return ray_origins, ray_dirs
