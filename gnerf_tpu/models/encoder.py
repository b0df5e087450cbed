"""ResNeXt50-32x4d identity encoder (network E).

Capability equivalent of the reference encoder
(`/root/reference/g_nerf/training/networks_stylegan2.py:806-838`): a
torchvision-style ResNeXt50 (Bottleneck [3,4,6,3], groups=32,
width_per_group=4) followed by a 2x2 adaptive average pool and a dense
projection 8192 -> z_dim. Input is a [-1, 1] RGB image (the reference feeds
raw normalized pixels, no ImageNet whitening — `gen_videos.py:119,131`).

TPU-native design: functional params/state trees; BatchNorm carries running
statistics in a separate `state` tree, and in training mode moments are
cross-replica averaged with `lax.pmean` over the data axis — the JAX
equivalent of the reference's SyncBatchNorm
(`networks_stylegan2.py:812-815`). Grouped 3x3 convs lower to a single XLA
conv with feature_group_count (MXU-friendly).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.precision import dot_precision

Params = dict
State = dict


def _conv(x, w, stride=1, padding=0, groups=1):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        precision=dot_precision(x.dtype),
    )


def _kaiming_conv(rng, out_c, in_c, k):
    fan_in = in_c * k * k
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(rng, (out_c, in_c, k, k)) * std


def _bn_init(c):
    return (
        {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))},
    )


def _bn_apply(
    p: Params,
    s: State,
    x: jax.Array,
    train: bool,
    axis_name: Optional[str] = None,
    momentum: float = 0.1,
    eps: float = 1e-5,
):
    """BatchNorm2d. Returns (y, new_state). In training mode, batch moments
    are optionally pmean'ed over `axis_name` (SyncBatchNorm equivalent).

    Moments are always computed in fp32 (E[x^2]-E[x]^2 cancels
    catastrophically in bf16), but the normalization is applied strictly in
    x's dtype: fp32 stats/affine params must NOT promote a bf16 activation
    chain — before r3 the fp32 `scale` param silently upcast everything
    after the first BN, so the "bf16" encoder ran fp32 convs at HIGHEST
    precision (the same bug class as r2's fp32-planes ToRGB find)."""
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 2, 3))
        mean_sq = jnp.mean(jnp.square(xf), axis=(0, 2, 3))
        if axis_name is not None:
            mean = lax.pmean(mean, axis_name)
            mean_sq = lax.pmean(mean_sq, axis_name)
        var = mean_sq - jnp.square(mean)
        n = x.shape[0] * x.shape[2] * x.shape[3]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * s["mean"] + momentum * lax.stop_gradient(mean),
            "var": (1 - momentum) * s["var"] + momentum * lax.stop_gradient(unbiased),
        }
    else:
        mean, var = s["mean"], s["var"]
        new_state = s
    inv = lax.rsqrt(var + eps) * p["scale"]
    y = (x - mean.astype(x.dtype)[None, :, None, None]) \
        * inv.astype(x.dtype)[None, :, None, None] \
        + p["bias"].astype(x.dtype)[None, :, None, None]
    return y, new_state


@dataclasses.dataclass(frozen=True)
class ResNeXt50Encoder:
    """Identity encoder E: image -> z latent."""

    out_dim: int = 512
    groups: int = 32
    width_per_group: int = 4
    layers: tuple = (3, 4, 6, 3)
    # Run the grouped 3x3 convs as ONE dense conv with a block-diagonal
    # kernel. feature_group_count=32 gives each group only 4..32 channels —
    # far below the MXU's 128x128 tile, so the systolic array runs at
    # 3-25% lane utilization. The dense formulation does `groups`x the
    # FLOPs but at full MXU occupancy; mathematically identical (off-block
    # weights are exactly zero, and gradients flow back through the
    # constant-eye einsum onto the grouped parameter only). Measured on the
    # v5e before flipping the default (see BASELINE.md encoder row).
    groups_as_dense: bool = True

    # Bottleneck output channels per stage.
    _planes = (64, 128, 256, 512)

    def _width(self, planes: int) -> int:
        return int(planes * (self.width_per_group / 64.0)) * self.groups

    # -- init ---------------------------------------------------------------

    def _block_init(self, rng, in_c, planes, stride):
        width = self._width(planes)
        out_c = planes * 4
        k = jax.random.split(rng, 4)
        p: Params = {}
        s: State = {}
        p["conv1"] = _kaiming_conv(k[0], width, in_c, 1)
        p["bn1"], s["bn1"] = _bn_init(width)
        p["conv2"] = _kaiming_conv(k[1], width, width // self.groups, 3)
        p["bn2"], s["bn2"] = _bn_init(width)
        p["conv3"] = _kaiming_conv(k[2], out_c, width, 1)
        p["bn3"], s["bn3"] = _bn_init(out_c)
        if stride != 1 or in_c != out_c:
            p["downsample_conv"] = _kaiming_conv(k[3], out_c, in_c, 1)
            p["downsample_bn"], s["downsample_bn"] = _bn_init(out_c)
        return p, s

    def init(self, rng: jax.Array) -> tuple[Params, State]:
        keys = jax.random.split(rng, 7)
        p: Params = {}
        s: State = {}
        p["conv1"] = _kaiming_conv(keys[0], 64, 3, 7)
        p["bn1"], s["bn1"] = _bn_init(64)
        in_c = 64
        for stage, (planes, blocks) in enumerate(zip(self._planes, self.layers)):
            stride = 1 if stage == 0 else 2
            bkeys = jax.random.split(keys[1 + stage], blocks)
            for b in range(blocks):
                bp, bs = self._block_init(
                    bkeys[b], in_c, planes, stride if b == 0 else 1
                )
                p[f"layer{stage + 1}_{b}"] = bp
                s[f"layer{stage + 1}_{b}"] = bs
                in_c = planes * 4
        fan_in = 2048 * 4
        bound = 1.0 / math.sqrt(fan_in)
        kw, kb = jax.random.split(keys[5])
        p["fc"] = {
            "weight": jax.random.uniform(kw, (self.out_dim, fan_in), minval=-bound, maxval=bound),
            "bias": jax.random.uniform(kb, (self.out_dim,), minval=-bound, maxval=bound),
        }
        return p, s

    # -- apply --------------------------------------------------------------

    def _grouped_conv2(self, x, w, stride):
        """The bottleneck's grouped 3x3 conv, either natively grouped or as a
        block-diagonal dense kernel (see `groups_as_dense`)."""
        g = self.groups
        if not self.groups_as_dense or g == 1:
            return _conv(x, w, stride=stride, padding=1, groups=g)
        width, ig, kh, kw = w.shape
        og = width // g
        w5 = w.reshape(g, og, ig, kh, kw)
        # dense[g*og+o, k*ig+i] = w[g*og+o, i] iff k == g (block diagonal).
        dense = jnp.einsum(
            "goihw,gk->gokihw", w5, jnp.eye(g, dtype=w.dtype)
        ).reshape(width, width, kh, kw)
        return _conv(x, dense, stride=stride, padding=1)

    def _block_apply(self, p, s, x, planes, stride, train, axis_name):
        ns: State = {}
        identity = x
        out = _conv(x, p["conv1"])
        out, ns["bn1"] = _bn_apply(p["bn1"], s["bn1"], out, train, axis_name)
        out = jax.nn.relu(out)
        out = self._grouped_conv2(out, p["conv2"], stride)
        out, ns["bn2"] = _bn_apply(p["bn2"], s["bn2"], out, train, axis_name)
        out = jax.nn.relu(out)
        out = _conv(out, p["conv3"])
        out, ns["bn3"] = _bn_apply(p["bn3"], s["bn3"], out, train, axis_name)
        if "downsample_conv" in p:
            identity = _conv(x, p["downsample_conv"], stride=stride)
            identity, ns["downsample_bn"] = _bn_apply(
                p["downsample_bn"], s["downsample_bn"], identity, train, axis_name
            )
        return jax.nn.relu(out + identity), ns

    def apply(
        self,
        params: Params,
        state: State,
        images: jax.Array,  # [N, 3, H, W] in [-1, 1]
        train: bool = False,
        axis_name: Optional[str] = None,
        stages: Optional[int] = None,
    ) -> tuple[jax.Array, State]:
        """Returns (z [N, out_dim], new_state).

        `stages` (0..4) early-exits with the [N, C, H', W'] feature map
        after the stem (+ that many residual stages) instead of the latent
        — a feature tap for per-stage cost attribution
        (tools/profile_train.py) and perceptual-feature consumers."""
        new_state: State = {}
        x = _conv(images, params["conv1"], stride=2, padding=3)
        x, new_state["bn1"] = _bn_apply(params["bn1"], state["bn1"], x, train, axis_name)
        x = jax.nn.relu(x)
        # 3x3 max pool, stride 2, pad 1.
        x = lax.reduce_window(
            x, -jnp.inf, lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
            ((0, 0), (0, 0), (1, 1), (1, 1)),
        )
        if stages == 0:
            return x, new_state
        for stage, (planes, blocks) in enumerate(zip(self._planes, self.layers)):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                key = f"layer{stage + 1}_{b}"
                x, new_state[key] = self._block_apply(
                    params[key], state[key], x, planes,
                    stride if b == 0 else 1, train, axis_name,
                )
            if stages is not None and stages == stage + 1:
                return x, new_state
        # Adaptive average pool to 2x2 (torch AdaptiveAvgPool2d semantics:
        # region i spans [floor(i*S/2), ceil((i+1)*S/2)) — works for any S).
        N, C, H, W = x.shape

        def pool_axis(t, size, axis):
            parts = []
            for i in range(2):
                s = (i * size) // 2
                e = -(-((i + 1) * size) // 2)
                idx = [slice(None)] * t.ndim
                idx[axis] = slice(s, e)
                parts.append(t[tuple(idx)].mean(axis=axis, keepdims=True))
            return jnp.concatenate(parts, axis=axis)

        x = pool_axis(pool_axis(x, H, 2), W, 3)
        x = x.reshape(N, C * 4)
        z = (
            jnp.matmul(x, params["fc"]["weight"].T.astype(x.dtype),
                       precision=dot_precision(x.dtype))
            + params["fc"]["bias"].astype(x.dtype)
        )
        return z, new_state
