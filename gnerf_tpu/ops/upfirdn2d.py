"""Up-FIR-down 2D resampling as native XLA convolutions.

TPU-native replacement for the reference CUDA op
(`/root/reference/g_nerf/torch_utils/ops/upfirdn2d.{cpp,cu,py}`): pad ->
zero-insert upsample -> FIR filter -> downsample, the resampling primitive
under every StyleGAN2 up/downsample.

Instead of a hand-written tiled kernel, the whole pipeline maps onto a single
`lax.conv_general_dilated` call: zero-insert upsampling is `lhs_dilation`,
downsampling is `window_strides`, and pad/crop is the (possibly negative)
convolution padding — XLA lowers all of it onto the MXU/VPU and fuses with
neighbouring elementwise work. Semantics (incl. padding conventions of the
derived helpers `filter2d`/`upsample2d`/`downsample2d`, cf. reference
`upfirdn2d.py:279-389`) are preserved exactly and unit-tested against a
stock-PyTorch oracle in `tests/test_ops.py`.

The backward pass is the same op with swapped up/down factors and a flipped
filter, expressed via `jax.custom_vjp` (reference `upfirdn2d.py:252-271`
does the same through torch.autograd) — although plain JAX autodiff through
the conv would also be correct, the custom VJP keeps the gradient an
identically-shaped upfirdn2d call that XLA can fuse the same way.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .precision import dot_precision

Filter = Optional[jax.Array]


def _parse_scaling(scaling) -> tuple[int, int]:
    if isinstance(scaling, (int, np.integer)):
        scaling = [int(scaling), int(scaling)]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding) -> tuple[int, int, int, int]:
    if isinstance(padding, (int, np.integer)):
        padding = [int(padding), int(padding)]
    padding = list(padding)
    if len(padding) == 2:
        padx, pady = padding
        padding = [padx, padx, pady, pady]
    padx0, padx1, pady0, pady1 = padding
    return int(padx0), int(padx1), int(pady0), int(pady1)


def _get_filter_size(f: Filter) -> tuple[int, int]:
    if f is None:
        return 1, 1
    assert f.ndim in (1, 2)
    fw = int(f.shape[-1])
    fh = int(f.shape[0])
    return fw, fh


def setup_filter(
    f,
    normalize: bool = True,
    flip_filter: bool = False,
    gain: float = 1,
    separable: Optional[bool] = None,
) -> jax.Array:
    """Prepare a FIR filter for `upfirdn2d` (float32, normalized to unit DC).

    Accepts a list / ndarray of shape [taps] (separable), [h, w], [] or None.
    """
    if f is None:
        f = 1
    f = jnp.asarray(f, dtype=jnp.float32)
    assert f.ndim in (0, 1, 2)
    if f.ndim == 0:
        f = f[jnp.newaxis]
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = jnp.outer(f, f)
    assert f.ndim == (1 if separable else 2)
    if normalize:
        f = f / jnp.sum(f)
    if flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return f


def _fir_conv(
    x: jax.Array,
    f2d: jax.Array,
    up: tuple[int, int],
    down: tuple[int, int],
    pad: tuple[int, int, int, int],
    flip_filter: bool,
) -> jax.Array:
    """Depthwise conv implementing zero-upsample -> pad/crop -> FIR -> downsample.

    x: [N, C, H, W]; f2d: [fh, fw] float32.
    """
    upx, upy = up
    downx, downy = down
    padx0, padx1, pady0, pady1 = pad
    num_channels = x.shape[1]
    fh, fw = f2d.shape

    # The reference zero-inserts AFTER every sample (H*up total length);
    # lhs_dilation inserts BETWEEN samples (H*up - (up-1)), so the trailing
    # zeros fold into the right/bottom padding.
    pad_cfg = (
        (pady0, pady1 + upy - 1),
        (padx0, padx1 + upx - 1),
    )
    if not flip_filter:
        f2d = jnp.flip(f2d, axis=(0, 1))
    kernel = jnp.broadcast_to(
        f2d.astype(x.dtype)[None, None], (num_channels, 1, fh, fw)
    )
    # Upsampled-and-padded extent must cover the filter (same guard as the
    # reference implementation asserts).
    in_h, in_w = x.shape[2], x.shape[3]
    assert in_w * upx + padx0 + padx1 >= fw and in_h * upy + pady0 + pady1 >= fh
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(downy, downx),
        padding=pad_cfg,
        lhs_dilation=(upy, upx),
        rhs_dilation=(1, 1),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=num_channels,
        precision=dot_precision(x.dtype),
    )


def _upfirdn2d_impl(x, f, up, down, padding, flip_filter, gain):
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    if f is None:
        f = jnp.ones([1, 1], dtype=jnp.float32)
    assert f.ndim in (1, 2)

    if f.ndim == 2:
        # gain**(ndim/2) == gain for 2D filters.
        f2d = f * gain if gain != 1 else f
        return _fir_conv(
            x, f2d, (upx, upy), (downx, downy), (padx0, padx1, pady0, pady1), flip_filter
        )
    # Separable: horizontal pass then vertical pass, sqrt(gain) each.
    g = float(np.sqrt(gain))
    fx = (f * g)[None, :]  # [1, fw]
    fy = (f * g)[:, None]  # [fh, 1]
    x = _fir_conv(x, fx, (upx, 1), (downx, 1), (padx0, padx1, 0, 0), flip_filter)
    x = _fir_conv(x, fy, (1, upy), (1, downy), (0, 0, pady0, pady1), flip_filter)
    return x


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6)
)
def _upfirdn2d_vjp(x, f, up, down, padding, flip_filter, gain):
    return _upfirdn2d_impl(x, f, up, down, padding, flip_filter, gain)


def _upfirdn2d_fwd(x, f, up, down, padding, flip_filter, gain):
    y = _upfirdn2d_impl(x, f, up, down, padding, flip_filter, gain)
    return y, (f, x.shape, y.shape)


def _upfirdn2d_bwd(up, down, padding, flip_filter, gain, res, dy):
    f, x_shape, y_shape = res
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    _, _, ih, iw = x_shape
    _, _, oh, ow = y_shape
    fw, fh = _get_filter_size(f)
    # Gradient = upfirdn2d with swapped up/down, flipped filter, mirrored pad
    # (same derivation as reference upfirdn2d.py:252-271).
    p = (
        fw - padx0 - 1,
        iw * upx - ow * downx + padx0 - upx + 1,
        fh - pady0 - 1,
        ih * upy - oh * downy + pady0 - upy + 1,
    )
    dx = _upfirdn2d_impl(
        dy, f, up=down, down=up, padding=p, flip_filter=(not flip_filter), gain=gain
    )
    return (dx, None)


_upfirdn2d_vjp.defvjp(_upfirdn2d_fwd, _upfirdn2d_bwd)


def upfirdn2d(
    x: jax.Array,
    f: Filter,
    up: Union[int, Sequence[int]] = 1,
    down: Union[int, Sequence[int]] = 1,
    padding: Union[int, Sequence[int]] = 0,
    flip_filter: bool = False,
    gain: float = 1,
) -> jax.Array:
    r"""Pad, upsample, filter and downsample a batch of 2D images.

    Performs the following sequence (matching the reference CUDA op):
      1. Zero-insert upsample by `up`.
      2. Pad with zeros (`padding` = [x0, x1, y0, y1] w.r.t. the upsampled
         image; negative values crop).
      3. Convolve with the FIR filter `f` (correlation if `flip_filter`),
         scaled by `gain`.
      4. Downsample by keeping every `down`-th sample.

    Args:
      x: [batch, channels, height, width].
      f: float32 FIR filter of shape [fh, fw], [taps] (separable) or None.
    """
    assert x.ndim == 4
    return _upfirdn2d_vjp(x, f, up, down, padding, flip_filter, gain)


def filter2d(x, f, padding=0, flip_filter=False, gain=1):
    """FIR-filter images; output is padded to match the input shape."""
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = (
        padx0 + fw // 2,
        padx1 + (fw - 1) // 2,
        pady0 + fh // 2,
        pady1 + (fh - 1) // 2,
    )
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1):
    """Upsample images by `up` with FIR smoothing (output shape = input * up)."""
    upx, upy = _parse_scaling(up)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = (
        padx0 + (fw + upx - 1) // 2,
        padx1 + (fw - upx) // 2,
        pady0 + (fh + upy - 1) // 2,
        pady1 + (fh - upy) // 2,
    )
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1):
    """Downsample images by `down` with FIR anti-aliasing."""
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = (
        padx0 + (fw - downx + 1) // 2,
        padx1 + (fw - downx) // 2,
        pady0 + (fh - downy + 1) // 2,
        pady1 + (fh - downy) // 2,
    )
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)
