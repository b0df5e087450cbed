"""InceptionV3 feature extractor (torchvision layout) for canonical FID.

The reference *intends* an FID suite but ships none — `train.py:31` imports
a `metrics` package missing from its repo (documented defect, SURVEY.md
section 2). This fills that hole for real: a native JAX InceptionV3 whose
param tree mirrors the torchvision `inception_v3` state_dict 1:1, so
pretrained weights ingest offline via `tools/convert_inception.py` and the
2048-dim pooled features feed `metrics.frechet_feature_distance` for
run-comparable FID numbers.

Implemented from the published architecture (Szegedy et al., "Rethinking
the Inception Architecture", CVPR 2016) with torchvision's module names
(Conv2d_1a_3x3 ... Mixed_7c, BN eps=1e-3) — names must match for state
-dict parity, nothing else is shared.

Input convention of `features()`: [-1, 1] NCHW images (the framework-wide
image range); internally resized to 299, mapped to [0, 1], and
ImageNet-normalized (the torchvision eval transform).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.interpolate import interpolate_bilinear
from ..ops.precision import dot_precision

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)
_BN_EPS = 1e-3


def _conv_bn(p: Mapping, x: jax.Array, stride=(1, 1), padding=((0, 0), (0, 0))
             ) -> jax.Array:
    """BasicConv2d: conv (no bias) + BN (eps 1e-3) + relu."""
    w = p["conv"]["weight"].astype(x.dtype)
    x = lax.conv_general_dilated(
        x, w, stride, padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=dot_precision(x.dtype),
    )
    bn = p["bn"]
    scale = bn["weight"] / jnp.sqrt(bn["running_var"] + _BN_EPS)
    bias = bn["bias"] - bn["running_mean"] * scale
    x = x * scale[None, :, None, None].astype(x.dtype) \
        + bias[None, :, None, None].astype(x.dtype)
    return jax.nn.relu(x)


def _avg_pool3(x: jax.Array) -> jax.Array:
    """3x3 stride-1 avg pool, pad 1, count_include_pad=True (torch default)."""
    s = lax.reduce_window(x, 0.0, lax.add, (1, 1, 3, 3), (1, 1, 1, 1),
                          ((0, 0), (0, 0), (1, 1), (1, 1)))
    return s / 9.0


def _max_pool3s2(x: jax.Array) -> jax.Array:
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 3, 3),
                             (1, 1, 2, 2), "VALID")


def _inception_a(p: Mapping, x: jax.Array) -> jax.Array:
    b1 = _conv_bn(p["branch1x1"], x)
    b5 = _conv_bn(p["branch5x5_1"], x)
    b5 = _conv_bn(p["branch5x5_2"], b5, padding=((2, 2), (2, 2)))
    b3 = _conv_bn(p["branch3x3dbl_1"], x)
    b3 = _conv_bn(p["branch3x3dbl_2"], b3, padding=((1, 1), (1, 1)))
    b3 = _conv_bn(p["branch3x3dbl_3"], b3, padding=((1, 1), (1, 1)))
    bp = _conv_bn(p["branch_pool"], _avg_pool3(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _inception_b(p: Mapping, x: jax.Array) -> jax.Array:
    b3 = _conv_bn(p["branch3x3"], x, stride=(2, 2))
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=((1, 1), (1, 1)))
    bd = _conv_bn(p["branch3x3dbl_3"], bd, stride=(2, 2))
    return jnp.concatenate([b3, bd, _max_pool3s2(x)], axis=1)


def _inception_c(p: Mapping, x: jax.Array) -> jax.Array:
    b1 = _conv_bn(p["branch1x1"], x)
    b7 = _conv_bn(p["branch7x7_1"], x)
    b7 = _conv_bn(p["branch7x7_2"], b7, padding=((0, 0), (3, 3)))
    b7 = _conv_bn(p["branch7x7_3"], b7, padding=((3, 3), (0, 0)))
    bd = _conv_bn(p["branch7x7dbl_1"], x)
    bd = _conv_bn(p["branch7x7dbl_2"], bd, padding=((3, 3), (0, 0)))
    bd = _conv_bn(p["branch7x7dbl_3"], bd, padding=((0, 0), (3, 3)))
    bd = _conv_bn(p["branch7x7dbl_4"], bd, padding=((3, 3), (0, 0)))
    bd = _conv_bn(p["branch7x7dbl_5"], bd, padding=((0, 0), (3, 3)))
    bp = _conv_bn(p["branch_pool"], _avg_pool3(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _inception_d(p: Mapping, x: jax.Array) -> jax.Array:
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = _conv_bn(p["branch3x3_2"], b3, stride=(2, 2))
    b7 = _conv_bn(p["branch7x7x3_1"], x)
    b7 = _conv_bn(p["branch7x7x3_2"], b7, padding=((0, 0), (3, 3)))
    b7 = _conv_bn(p["branch7x7x3_3"], b7, padding=((3, 3), (0, 0)))
    b7 = _conv_bn(p["branch7x7x3_4"], b7, stride=(2, 2))
    return jnp.concatenate([b3, b7, _max_pool3s2(x)], axis=1)


def _inception_e(p: Mapping, x: jax.Array) -> jax.Array:
    b1 = _conv_bn(p["branch1x1"], x)
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _conv_bn(p["branch3x3_2a"], b3, padding=((0, 0), (1, 1))),
        _conv_bn(p["branch3x3_2b"], b3, padding=((1, 1), (0, 0))),
    ], axis=1)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=((1, 1), (1, 1)))
    bd = jnp.concatenate([
        _conv_bn(p["branch3x3dbl_3a"], bd, padding=((0, 0), (1, 1))),
        _conv_bn(p["branch3x3dbl_3b"], bd, padding=((1, 1), (0, 0))),
    ], axis=1)
    bp = _conv_bn(p["branch_pool"], _avg_pool3(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


# (name, out_channels-producing config) — used by init() for random trees
# and by the converter for validation. 5x5/7x7 channel plans follow the
# paper's Table 1 / torchvision's constructor arguments.
FEATURE_DIM = 2048


@dataclasses.dataclass(frozen=True)
class InceptionV3Features:
    """Pool-3 (2048-dim) InceptionV3 features for FID."""

    resize_to: int = 299

    def features(self, params: Mapping, images: jax.Array) -> jax.Array:
        """[-1,1] NCHW -> [N, 2048] pooled features."""
        x = images.astype(jnp.float32)
        if x.shape[-1] != self.resize_to or x.shape[-2] != self.resize_to:
            x = interpolate_bilinear(x, self.resize_to, self.resize_to,
                                     antialias=False)
        x = (x + 1.0) * 0.5  # -> [0, 1]
        mean = jnp.asarray(_IMAGENET_MEAN)[None, :, None, None]
        std = jnp.asarray(_IMAGENET_STD)[None, :, None, None]
        x = (x - mean) / std

        x = _conv_bn(params["Conv2d_1a_3x3"], x, stride=(2, 2))
        x = _conv_bn(params["Conv2d_2a_3x3"], x)
        x = _conv_bn(params["Conv2d_2b_3x3"], x, padding=((1, 1), (1, 1)))
        x = _max_pool3s2(x)
        x = _conv_bn(params["Conv2d_3b_1x1"], x)
        x = _conv_bn(params["Conv2d_4a_3x3"], x)
        x = _max_pool3s2(x)
        x = _inception_a(params["Mixed_5b"], x)
        x = _inception_a(params["Mixed_5c"], x)
        x = _inception_a(params["Mixed_5d"], x)
        x = _inception_b(params["Mixed_6a"], x)
        x = _inception_c(params["Mixed_6b"], x)
        x = _inception_c(params["Mixed_6c"], x)
        x = _inception_c(params["Mixed_6d"], x)
        x = _inception_c(params["Mixed_6e"], x)
        x = _inception_d(params["Mixed_7a"], x)
        x = _inception_e(params["Mixed_7b"], x)
        x = _inception_e(params["Mixed_7c"], x)
        return x.mean(axis=(2, 3))  # adaptive avg pool -> (N, 2048)

    def init(self, rng: jax.Array) -> dict:
        """Random-init tree with the exact torchvision shapes (testing /
        shape template for the converter)."""
        shapes = inception_conv_shapes()
        keys = jax.random.split(rng, len(shapes))
        params: dict = {}
        for key, (path, (co, ci, kh, kw)) in zip(keys, shapes.items()):
            node = params
            for part in path.split(".")[:-1]:
                node = node.setdefault(part, {})
            leaf = path.split(".")[-1]
            fan_in = ci * kh * kw
            node[leaf] = {
                "conv": {"weight": jax.random.normal(key, (co, ci, kh, kw))
                         * float(np.sqrt(2.0 / fan_in))},
                "bn": {"weight": jnp.ones((co,)), "bias": jnp.zeros((co,)),
                       "running_mean": jnp.zeros((co,)),
                       "running_var": jnp.ones((co,))},
            }
        return params


def _cb(d, name, co, ci, kh, kw):
    d[name] = (co, ci, kh, kw)


def inception_conv_shapes() -> dict:
    """Every BasicConv2d in torchvision inception_v3 (aux head excluded):
    path -> (out, in, kh, kw)."""
    s: dict = {}
    _cb(s, "Conv2d_1a_3x3", 32, 3, 3, 3)
    _cb(s, "Conv2d_2a_3x3", 32, 32, 3, 3)
    _cb(s, "Conv2d_2b_3x3", 64, 32, 3, 3)
    _cb(s, "Conv2d_3b_1x1", 80, 64, 1, 1)
    _cb(s, "Conv2d_4a_3x3", 192, 80, 3, 3)
    # Mixed_5b/5c/5d: InceptionA(in, pool_features)
    for name, cin, pf in (("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64),
                          ("Mixed_5d", 288, 64)):
        _cb(s, f"{name}.branch1x1", 64, cin, 1, 1)
        _cb(s, f"{name}.branch5x5_1", 48, cin, 1, 1)
        _cb(s, f"{name}.branch5x5_2", 64, 48, 5, 5)
        _cb(s, f"{name}.branch3x3dbl_1", 64, cin, 1, 1)
        _cb(s, f"{name}.branch3x3dbl_2", 96, 64, 3, 3)
        _cb(s, f"{name}.branch3x3dbl_3", 96, 96, 3, 3)
        _cb(s, f"{name}.branch_pool", pf, cin, 1, 1)
    # Mixed_6a: InceptionB(288)
    _cb(s, "Mixed_6a.branch3x3", 384, 288, 3, 3)
    _cb(s, "Mixed_6a.branch3x3dbl_1", 64, 288, 1, 1)
    _cb(s, "Mixed_6a.branch3x3dbl_2", 96, 64, 3, 3)
    _cb(s, "Mixed_6a.branch3x3dbl_3", 96, 96, 3, 3)
    # Mixed_6b..6e: InceptionC(768, c7)
    for name, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160),
                     ("Mixed_6e", 192)):
        _cb(s, f"{name}.branch1x1", 192, 768, 1, 1)
        _cb(s, f"{name}.branch7x7_1", c7, 768, 1, 1)
        _cb(s, f"{name}.branch7x7_2", c7, c7, 1, 7)
        _cb(s, f"{name}.branch7x7_3", 192, c7, 7, 1)
        _cb(s, f"{name}.branch7x7dbl_1", c7, 768, 1, 1)
        _cb(s, f"{name}.branch7x7dbl_2", c7, c7, 7, 1)
        _cb(s, f"{name}.branch7x7dbl_3", c7, c7, 1, 7)
        _cb(s, f"{name}.branch7x7dbl_4", c7, c7, 7, 1)
        _cb(s, f"{name}.branch7x7dbl_5", 192, c7, 1, 7)
        _cb(s, f"{name}.branch_pool", 192, 768, 1, 1)
    # Mixed_7a: InceptionD(768)
    _cb(s, "Mixed_7a.branch3x3_1", 192, 768, 1, 1)
    _cb(s, "Mixed_7a.branch3x3_2", 320, 192, 3, 3)
    _cb(s, "Mixed_7a.branch7x7x3_1", 192, 768, 1, 1)
    _cb(s, "Mixed_7a.branch7x7x3_2", 192, 192, 1, 7)
    _cb(s, "Mixed_7a.branch7x7x3_3", 192, 192, 7, 1)
    _cb(s, "Mixed_7a.branch7x7x3_4", 192, 192, 3, 3)
    # Mixed_7b/7c: InceptionE(1280 / 2048)
    for name, cin in (("Mixed_7b", 1280), ("Mixed_7c", 2048)):
        _cb(s, f"{name}.branch1x1", 320, cin, 1, 1)
        _cb(s, f"{name}.branch3x3_1", 384, cin, 1, 1)
        _cb(s, f"{name}.branch3x3_2a", 384, 384, 1, 3)
        _cb(s, f"{name}.branch3x3_2b", 384, 384, 3, 1)
        _cb(s, f"{name}.branch3x3dbl_1", 448, cin, 1, 1)
        _cb(s, f"{name}.branch3x3dbl_2", 384, 448, 3, 3)
        _cb(s, f"{name}.branch3x3dbl_3a", 384, 384, 1, 3)
        _cb(s, f"{name}.branch3x3dbl_3b", 384, 384, 3, 1)
        _cb(s, f"{name}.branch_pool", 192, cin, 1, 1)
    return s


def convert_torch_inception(state: Mapping[str, np.ndarray]) -> dict:
    """torchvision `inception_v3` state_dict (numpy values) -> param tree.

    Keys look like `Mixed_5b.branch1x1.conv.weight` /
    `...bn.{weight,bias,running_mean,running_var}`; the aux head
    (`AuxLogits.*`) and `fc.*` are dropped (FID needs pool-3 only)."""
    expected = inception_conv_shapes()
    params: dict = {}
    for path, shape in expected.items():
        node = params
        for part in path.split(".")[:-1]:
            node = node.setdefault(part, {})
        leaf = path.split(".")[-1]
        w = np.asarray(state[f"{path}.conv.weight"], dtype=np.float32)
        if w.shape != shape:
            raise ValueError(f"{path}.conv.weight has {w.shape}, want {shape}")
        node[leaf] = {
            "conv": {"weight": jnp.asarray(w)},
            "bn": {
                "weight": jnp.asarray(state[f"{path}.bn.weight"], jnp.float32),
                "bias": jnp.asarray(state[f"{path}.bn.bias"], jnp.float32),
                "running_mean": jnp.asarray(
                    state[f"{path}.bn.running_mean"], jnp.float32),
                "running_var": jnp.asarray(
                    state[f"{path}.bn.running_var"], jnp.float32),
            },
        }
    return params


def load_inception(path: str) -> tuple[InceptionV3Features, dict]:
    """Load a tools/convert_inception.py npz -> (net, params)."""
    from ..utils import checkpoint as ckpt_lib

    trees, _ = ckpt_lib.load_checkpoint(path)
    return InceptionV3Features(), trees["inception"]
