"""Stratified + importance (inverse-CDF) depth sampling.

JAX re-derivation of the reference hierarchical sampling
(`/root/reference/g_nerf/training/volumetric_rendering/renderer.py:169-253`):
stratified coarse depths (uniform or disparity space), weight smoothing via
max-pool(2,1,pad1) + avg-pool(2,1), and NeRF inverse-CDF `sample_pdf` with a
batched searchsorted. All shapes static; randomness comes from explicit
`jax.random` keys (deterministic mode for parity tests).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.precision import dot_precision
from .math_utils import linspace_batched


def sample_stratified(
    rng: Optional[jax.Array],
    ray_origins: jax.Array,
    ray_start,
    ray_end,
    depth_resolution: int,
    disparity_space_sampling: bool = False,
) -> jax.Array:
    """Approximately uniformly spaced depths with stratified jitter.

    ray_start/ray_end are scalars, or [N, R, 1] arrays (the auto ray-box
    path). rng=None disables the jitter (deterministic midpoint-free grid).
    Returns [N, R, depth_resolution, 1].
    """
    N, R, _ = ray_origins.shape
    S = depth_resolution
    if disparity_space_sampling:
        depths = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, S).reshape(1, 1, S, 1), (N, R, S, 1)
        )
        delta = 1.0 / (S - 1)
        if rng is not None:
            depths = depths + jax.random.uniform(rng, (N, R, S, 1)) * delta
        depths = 1.0 / (1.0 / ray_start * (1.0 - depths) + 1.0 / ray_end * depths)
        return depths

    if isinstance(ray_start, jax.Array) and ray_start.ndim > 0:
        # Per-ray bounds from ray-box intersection: [N, R, 1] each.
        depths = linspace_batched(ray_start, ray_end, S)  # [S, N, R, 1]
        depths = jnp.transpose(depths, (1, 2, 0, 3))  # [N, R, S, 1]
        delta = (ray_end - ray_start) / (S - 1)  # [N, R, 1]
        if rng is not None:
            depths = depths + jax.random.uniform(rng, depths.shape) * delta[..., None]
        return depths

    depths = jnp.broadcast_to(
        jnp.linspace(float(ray_start), float(ray_end), S).reshape(1, 1, S, 1),
        (N, R, S, 1),
    )
    delta = (float(ray_end) - float(ray_start)) / (S - 1)
    if rng is not None:
        depths = depths + jax.random.uniform(rng, (N, R, S, 1)) * delta
    return depths


def smooth_weights(weights: jax.Array) -> jax.Array:
    """max-pool(k=2, s=1, pad=1) then avg-pool(k=2, s=1) along the last axis.

    weights: [..., L]. Returns [..., L] (same length), matching the torch
    pooling pipeline in reference `renderer.py:205-207`.
    """
    lo = weights[..., :1]
    hi = weights[..., -1:]
    mid = jnp.maximum(weights[..., :-1], weights[..., 1:])
    m = jnp.concatenate([lo, mid, hi], axis=-1)  # length L+1
    return (m[..., :-1] + m[..., 1:]) / 2.0


def sample_pdf(
    rng: Optional[jax.Array],
    bins: jax.Array,
    weights: jax.Array,
    n_importance: int,
    det: bool = False,
    eps: float = 1e-5,
) -> jax.Array:
    """Draw `n_importance` depth samples per ray from the piecewise-constant
    PDF defined by `weights` over `bins`.

    bins: [Nr, B+?] bin edges (only the first n_weights+1 entries are used),
    weights: [Nr, n_weights]. Returns [Nr, n_importance].
    """
    n_rays, n_w = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # [Nr, n_w+1]

    if det or rng is None:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, n_importance), (n_rays, n_importance)
        )
    else:
        u = jax.random.uniform(rng, (n_rays, n_importance))

    # searchsorted(side='right') as a vectorized comparison count — the
    # sample axis is tiny (~48), so this is pure VPU work and ~5x faster on
    # TPU than a vmapped searchsorted.
    inds = jnp.sum(
        u[:, :, None] >= cdf[:, None, :], axis=-1, dtype=jnp.int32
    )
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, n_w)

    # Fetch cdf/bin endpoints with one-hot contractions (beats per-element
    # gathers at this width); cdf and bins fold into one einsum each.
    k = n_w + 1
    vals = jnp.stack([cdf, bins[:, :k]], axis=-1)  # [Nr, k, 2]
    oh_below = jax.nn.one_hot(below, k, dtype=vals.dtype)
    oh_above = jax.nn.one_hot(above, k, dtype=vals.dtype)
    # Full fp32 precision: XLA's DEFAULT fp32 dot is bf16-class on TPU,
    # which would quantize the gathered depth/cdf VALUES (not just weights)
    # to 1/64 steps — one-hot contractions carry exact data.
    lo = jnp.einsum("nik,nkv->niv", oh_below, vals,
                    precision=dot_precision(vals.dtype))
    hi = jnp.einsum("nik,nkv->niv", oh_above, vals,
                    precision=dot_precision(vals.dtype))
    cdf_lo, bins_lo = lo[..., 0], lo[..., 1]
    cdf_hi, bins_hi = hi[..., 0], hi[..., 1]

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_lo + (u - cdf_lo) / denom * (bins_hi - bins_lo)


def sample_importance(
    rng: Optional[jax.Array],
    z_vals: jax.Array,
    weights: jax.Array,
    n_importance: int,
    det: bool = False,
) -> jax.Array:
    """Hierarchical importance depths from coarse-pass weights.

    z_vals: [N, R, S, 1] coarse depths; weights: [N, R, S-1, 1] from the
    marcher. Returns [N, R, n_importance, 1]. Gradients are stopped, as in
    the reference (torch.no_grad)."""
    N, R, S, _ = z_vals.shape
    z_flat = z_vals.reshape(N * R, S)
    w = weights.reshape(N * R, -1)

    w = smooth_weights(w) + 0.01

    z_mid = (z_flat[:, :-1] + z_flat[:, 1:]) / 2.0
    out = sample_pdf(rng, z_mid, w[:, 1:-1], n_importance, det=det)
    out = jax.lax.stop_gradient(out)
    return out.reshape(N, R, n_importance, 1)
