"""Bilinear image resize with optional anti-aliasing, torch-parity.

Replaces `torch.nn.functional.interpolate(mode='bilinear',
align_corners=False, antialias=...)` as used by the superresolution stack
(reference `/root/reference/g_nerf/training/superresolution.py:296-300`) and
the dual discriminator's `filtered_resizing`
(`dual_discriminator.py:86-102`).

TPU design: because shapes are static under jit, the separable resampling
weights are precomputed as dense [out, in] matrices with numpy at trace
time; the resize is then two matmuls that run on the MXU — no gather at
all, and XLA fuses the pair. Border handling replicates torch: source
indices are clamped to the image, and (for antialias) weights are
renormalized over the clamped support.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .precision import dot_precision


@functools.lru_cache(maxsize=None)
def _resize_weights(in_size: int, out_size: int, antialias: bool) -> np.ndarray:
    """[out_size, in_size] row-stochastic bilinear resampling matrix."""
    scale = in_size / out_size
    # Triangle filter; stretched by `scale` when antialiasing a downscale.
    filter_scale = scale if (antialias and scale > 1.0) else 1.0
    support = filter_scale  # half-width of the triangle kernel

    out = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale - 0.5
        lo = int(np.ceil(center - support))
        hi = int(np.floor(center + support))
        js = np.arange(lo, hi + 1)
        w = np.maximum(0.0, 1.0 - np.abs(js - center) / filter_scale)
        # Torch border policy: taps outside the image are DROPPED and the
        # remaining weights renormalized (for the 2-tap non-antialias kernel
        # this coincides with index clamping).
        valid = (js >= 0) & (js < in_size)
        js, w = js[valid], w[valid]
        np.add.at(out[i], js, w)
        s = out[i].sum()
        if s > 0:
            out[i] /= s
    return out.astype(np.float32)


def interpolate_bilinear(
    x: jax.Array, out_h: int, out_w: int, antialias: bool = False
) -> jax.Array:
    """Resize [N, C, H, W] -> [N, C, out_h, out_w], torch-bilinear semantics."""
    N, C, H, W = x.shape
    if H == out_h and W == out_w:
        return x
    mh = jnp.asarray(_resize_weights(H, out_h, antialias), dtype=x.dtype)
    mw = jnp.asarray(_resize_weights(W, out_w, antialias), dtype=x.dtype)
    prec = dot_precision(x.dtype)
    # Rows then columns; both contractions hit the MXU.
    x = jnp.einsum("oh,nchw->ncow", mh, x, precision=prec)
    x = jnp.einsum("pw,ncow->ncop", mw, x, precision=prec)
    return x
