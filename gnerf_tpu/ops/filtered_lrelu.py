"""Filtered leaky ReLU (StyleGAN3 alias-free op).

TPU-native equivalent of the 1.7k-LoC reference CUDA op
(`/root/reference/g_nerf/torch_utils/ops/filtered_lrelu.{cpp,cu,py}`):
bias -> zero-insert upsample -> FIR fu -> gain -> leaky ReLU -> clamp ->
FIR fd -> downsample. Expressed as a composition of `upfirdn2d` (native XLA
convs) and `bias_act` (fused elementwise); XLA fuses the elementwise middle
into the surrounding convolutions, and the reference's packed-sign-tensor
backward trick is unnecessary because JAX re-derives the gradient through
the same fused graph. Semantics match the reference composition
(`filtered_lrelu.py:122-157`).

Only consumer in the model zoo is the StyleGAN3 synthesis layer
(reference `networks_stylegan3.py:357`).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .bias_act import bias_act
from .upfirdn2d import _parse_padding, upfirdn2d


def filtered_lrelu(
    x: jax.Array,
    fu: Optional[jax.Array] = None,
    fd: Optional[jax.Array] = None,
    b: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    gain: float = float(np.sqrt(2)),
    slope: float = 0.2,
    clamp: Optional[float] = None,
    flip_filter: bool = False,
) -> jax.Array:
    assert x.ndim == 4
    px0, px1, py0, py1 = _parse_padding(padding)
    x = bias_act(x, b)
    x = upfirdn2d(x, fu, up=up, padding=(px0, px1, py0, py1), gain=up ** 2, flip_filter=flip_filter)
    x = bias_act(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter)
    return x
