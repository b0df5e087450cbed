"""2D convolution fused with FIR up/downsampling.

TPU-native equivalent of the reference routing layer
(`/root/reference/g_nerf/torch_utils/ops/conv2d_resample.py:95-143`), used by
every SynthesisLayer / Conv2dLayer. The reference dispatches across five
cuDNN fast paths (1x1+down, 1x1+up, strided-down, transpose-strided-up,
plain); on TPU those are cuDNN-shaped workarounds, not wins — XLA's
`conv_general_dilated` natively expresses zero-insert upsampling
(`lhs_dilation`) and strided downsampling, so we keep only the three
mathematically distinct cases:

  up > 1:   upfirdn(up, f, gain=up^2) -> conv -> [optional FIR down]
  down > 1: FIR pad/filter -> strided conv
  else:     conv with symmetric padding (or explicit pad via upfirdn)

Since FIR filtering and the weight conv are both LTI, the orders used here
are equivalent to the reference's (its own fallback path,
`conv2d_resample.py:138-143`, uses exactly this order). Padding bookkeeping
(w.r.t. the upsampled image) matches the reference exactly and is tested
against a stock-torch oracle.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .precision import dot_precision
from .upfirdn2d import _parse_padding, _get_filter_size, upfirdn2d


def _conv2d(
    x: jax.Array,
    w: jax.Array,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
    flip_weight: bool = True,
) -> jax.Array:
    """Grouped NCHW conv. flip_weight=True -> correlation (torch conv2d)."""
    if not flip_weight and (w.shape[2] > 1 or w.shape[3] > 1):
        w = jnp.flip(w, axis=(2, 3))
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        precision=dot_precision(x.dtype),
    )


def conv2d_resample(
    x: jax.Array,
    w: jax.Array,
    f: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    groups: int = 1,
    flip_weight: bool = True,
    flip_filter: bool = False,
) -> jax.Array:
    r"""Convolve [N,C,H,W] by [O,I//groups,kh,kw] with optional resampling.

    `padding` is specified w.r.t. the upsampled image, exactly as in the
    reference op. `f` must be a `setup_filter`-prepared FIR filter.
    """
    assert x.ndim == 4 and w.ndim == 4
    out_channels, in_channels_per_group, kh, kw = w.shape
    fw, fh = _get_filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    # Account for the implicit padding of the FIR resampling stages.
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    if up > 1:
        x = upfirdn2d(
            x, (f if f is not None else None), up=up,
            padding=(px0, px1, py0, py1), gain=up ** 2, flip_filter=flip_filter,
        )
        x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
        if down > 1:
            x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
        return x

    if down > 1:
        if kw == 1 and kh == 1:
            # 1x1 conv commutes with the FIR downsample: downsample first so
            # the conv runs on down^2x fewer pixels.
            x = upfirdn2d(x, f, down=down, padding=(px0, px1, py0, py1), flip_filter=flip_filter)
            return _conv2d(x, w, groups=groups, flip_weight=flip_weight)
        x = upfirdn2d(x, f, padding=(px0, px1, py0, py1), flip_filter=flip_filter)
        return _conv2d(x, w, stride=down, groups=groups, flip_weight=flip_weight)

    # Plain conv.
    if px0 == px1 and py0 == py1 and px0 >= 0 and py0 >= 0 and px0 == py0:
        return _conv2d(x, w, padding=px0, groups=groups, flip_weight=flip_weight)
    x = upfirdn2d(x, None, padding=(px0, px1, py0, py1))
    return _conv2d(x, w, groups=groups, flip_weight=flip_weight)
