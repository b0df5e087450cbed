"""Camera pose samplers and intrinsics helpers.

JAX equivalent of the reference `camera_utils.py`
(`/root/reference/g_nerf/camera_utils.py`): look-at orbit poses (y-up,
OpenCV cam axes), the SRN z-up variant for ShapeNet, Gaussian/uniform pose
samplers, cam2world construction, and FOV->intrinsics. Randomness is
explicit via `jax.random` keys; passing `rng=None` gives the deterministic
mean pose (stddev ignored), which is what inference orbits use.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..render.math_utils import normalize_vecs


def create_cam2world_matrix(forward_vector: jax.Array, origin: jax.Array) -> jax.Array:
    """cam2world from viewing direction + position; y-up, no roll.

    forward_vector/origin: [B, 3]. Returns [B, 4, 4].
    """
    forward_vector = normalize_vecs(forward_vector)
    up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), forward_vector.shape)
    right = -normalize_vecs(jnp.cross(up, forward_vector))
    up2 = normalize_vecs(jnp.cross(forward_vector, right))

    rot = jnp.stack([right, up2, forward_vector], axis=-1)  # [B, 3, 3]
    B = origin.shape[0]
    m = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    m = m.at[:, :3, :3].set(rot)
    m = m.at[:, :3, 3].set(origin)
    return m


def create_cam2world_matrix_srn(forward_vector: jax.Array, origin: jax.Array) -> jax.Array:
    """SRN (ShapeNet) variant: z-up world."""
    forward_vector = normalize_vecs(forward_vector)
    up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), forward_vector.shape)
    right = -normalize_vecs(jnp.cross(up, forward_vector))
    up2 = normalize_vecs(jnp.cross(forward_vector, right))
    rot = jnp.stack([right, up2, forward_vector], axis=-1)
    B = origin.shape[0]
    m = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    m = m.at[:, :3, :3].set(rot)
    m = m.at[:, :3, 3].set(origin)
    return m


def _orbit_origin(theta: jax.Array, phi: jax.Array, radius: float) -> jax.Array:
    """Camera position on the y-up orbit sphere (reference angle convention)."""
    x = radius * jnp.sin(phi) * jnp.cos(math.pi - theta)
    z = radius * jnp.sin(phi) * jnp.sin(math.pi - theta)
    y = radius * jnp.cos(phi)
    return jnp.stack([x, y, z], axis=-1)


def lookat_sample(
    horizontal_mean: float,
    vertical_mean: float,
    horizontal_stddev: float = 0.0,
    vertical_stddev: float = 0.0,
    radius: float = 1.0,
    batch_size: int = 1,
    rng: Optional[jax.Array] = None,
    lookat_position: Optional[jax.Array] = None,
) -> jax.Array:
    """LookAtPoseSampler.sample: orbit pose looking at the origin.

    theta = azimuth, phi = polar angle used directly (no arccos warp), as in
    reference `camera_utils.py:89-106`.
    """
    if rng is not None and (horizontal_stddev or vertical_stddev):
        kh, kv = jax.random.split(rng)
        h = jax.random.normal(kh, (batch_size, 1)) * horizontal_stddev + horizontal_mean
        v = jax.random.normal(kv, (batch_size, 1)) * vertical_stddev + vertical_mean
    else:
        h = jnp.full((batch_size, 1), horizontal_mean)
        v = jnp.full((batch_size, 1), vertical_mean)
    origins = _orbit_origin(h[:, 0], v[:, 0], radius)
    if lookat_position is None:
        forward = normalize_vecs(-origins)
    else:
        forward = normalize_vecs(lookat_position[None] - origins)
    return create_cam2world_matrix(forward, origins)


def lookat_sample_origin(
    horizontal_mean, vertical_mean, lookat_position,
    horizontal_stddev=0.0, vertical_stddev=0.0, radius=1.0, batch_size=1,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """LookAtPoseSampler.sample_origin: Gaussian angles through the arccos
    warp, looking at `lookat_position` (reference `camera_utils.py:69-86`)."""
    if rng is not None and (horizontal_stddev or vertical_stddev):
        kh, kv = jax.random.split(rng)
        h = jax.random.normal(kh, (batch_size, 1)) * horizontal_stddev + horizontal_mean
        v = jax.random.normal(kv, (batch_size, 1)) * vertical_stddev + vertical_mean
    else:
        h = jnp.full((batch_size, 1), horizontal_mean)
        v = jnp.full((batch_size, 1), vertical_mean)
    v = jnp.clip(v, 1e-5, math.pi - 1e-5)
    phi = jnp.arccos(1 - 2 * (v / math.pi))
    origins = _orbit_origin(h[:, 0], phi[:, 0], radius)
    forward = normalize_vecs(jnp.asarray(lookat_position)[None] - origins)
    return create_cam2world_matrix(forward, origins)


def gaussian_pose_sample(
    horizontal_mean, vertical_mean,
    horizontal_stddev=0.0, vertical_stddev=0.0, radius=1.0, batch_size=1,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """GaussianCameraPoseSampler.sample (reference `camera_utils.py:38-55`)."""
    if rng is not None and (horizontal_stddev or vertical_stddev):
        kh, kv = jax.random.split(rng)
        h = jax.random.normal(kh, (batch_size, 1)) * horizontal_stddev + horizontal_mean
        v = jax.random.normal(kv, (batch_size, 1)) * vertical_stddev + vertical_mean
    else:
        h = jnp.full((batch_size, 1), horizontal_mean)
        v = jnp.full((batch_size, 1), vertical_mean)
    v = jnp.clip(v, 1e-5, math.pi - 1e-5)
    phi = jnp.arccos(1 - 2 * (v / math.pi))
    origins = _orbit_origin(h[:, 0], phi[:, 0], radius)
    forward = normalize_vecs(-origins)
    return create_cam2world_matrix(forward, origins)


def uniform_pose_sample(
    horizontal_mean, vertical_mean,
    horizontal_stddev=0.0, vertical_stddev=0.0, radius=1.0, batch_size=1,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """UniformCameraPoseSampler.sample (reference `camera_utils.py:136-153`)."""
    if rng is not None and (horizontal_stddev or vertical_stddev):
        kh, kv = jax.random.split(rng)
        h = (jax.random.uniform(kh, (batch_size, 1)) * 2 - 1) * horizontal_stddev + horizontal_mean
        v = (jax.random.uniform(kv, (batch_size, 1)) * 2 - 1) * vertical_stddev + vertical_mean
    else:
        h = jnp.full((batch_size, 1), horizontal_mean)
        v = jnp.full((batch_size, 1), vertical_mean)
    v = jnp.clip(v, 1e-5, math.pi - 1e-5)
    phi = jnp.arccos(1 - 2 * (v / math.pi))
    origins = _orbit_origin(h[:, 0], phi[:, 0], radius)
    forward = normalize_vecs(-origins)
    return create_cam2world_matrix(forward, origins)


def lookat_sample_srn(
    horizontal_mean, vertical_mean,
    horizontal_stddev=0.0, vertical_stddev=0.0, radius=1.0, batch_size=1,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """LookAtPoseSampler.sample_srn: z-up orbit for ShapeNet
    (reference `camera_utils.py:109-123`)."""
    if rng is not None and (horizontal_stddev or vertical_stddev):
        kh, kv = jax.random.split(rng)
        h = (jax.random.uniform(kh, (batch_size, 1)) * 2 - 1) * horizontal_stddev + horizontal_mean
        v = (jax.random.uniform(kv, (batch_size, 1)) * 2 - 1) * vertical_stddev + vertical_mean
    else:
        h = jnp.full((batch_size, 1), horizontal_mean)
        v = jnp.full((batch_size, 1), vertical_mean)
    theta, phi = h[:, 0], v[:, 0]
    x = radius * jnp.sin(phi) * jnp.sin(theta)
    y = radius * jnp.sin(phi) * jnp.cos(theta)
    z = radius * jnp.cos(phi)
    origins = jnp.stack([x, y, z], axis=-1)
    forward = normalize_vecs(-origins)
    return create_cam2world_matrix_srn(forward, origins)


def fov_to_intrinsics(fov_degrees: float) -> jax.Array:
    """Normalized 3x3 intrinsics from field of view in degrees."""
    focal = 1.0 / (math.tan(fov_degrees * 3.14159 / 360) * 1.414)
    return jnp.array([[focal, 0.0, 0.5], [0.0, focal, 0.5], [0.0, 0.0, 1.0]])


FFHQ_INTRINSICS = jnp.array([[4.2647, 0.0, 0.5], [0.0, 4.2647, 0.5], [0.0, 0.0, 1.0]])
SHAPENET_INTRINSICS = jnp.array(
    [[1.025390625, 0.0, 0.5], [0.0, 1.025390625, 0.5], [0.0, 0.0, 1.0]]
)


def pose_to_label(cam2world: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """Pack (cam2world [B,4,4], intrinsics [3,3] or [B,3,3]) into the 25-dim
    conditioning label layout used across the framework."""
    B = cam2world.shape[0]
    if intrinsics.ndim == 2:
        intrinsics = jnp.broadcast_to(intrinsics[None], (B, 3, 3))
    return jnp.concatenate(
        [cam2world.reshape(B, 16), intrinsics.reshape(B, 9)], axis=1
    )
