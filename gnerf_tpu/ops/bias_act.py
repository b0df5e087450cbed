"""Fused bias + activation + gain + clamp.

TPU-native replacement for the reference CUDA op
(`/root/reference/g_nerf/torch_utils/ops/bias_act.{cpp,cu,py}`). On TPU this
needs no hand-written kernel at all: the bias broadcast, activation, gain and
clamp are plain elementwise jnp ops that XLA fuses into the producing matmul/
conv, and arbitrary-order gradients come from JAX autodiff (the reference
needed a dedicated second autograd Function for 2nd-order grads,
`bias_act.py:177-205`).

The activation registry mirrors the reference table (`bias_act.py:23-33`):
name -> (fn, default alpha, default gain). `def_gain=sqrt(2)` for
relu/lrelu/swish preserves signal variance in equalized-LR networks; the
clamp (+-256 in fp16 blocks) matches `networks_stylegan2.py:379`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class ActivationSpec(NamedTuple):
    func: callable
    def_alpha: float
    def_gain: float


activation_funcs: dict[str, ActivationSpec] = {
    "linear": ActivationSpec(lambda x, alpha: x, 0.0, 1.0),
    "relu": ActivationSpec(lambda x, alpha: jax.nn.relu(x), 0.0, float(np.sqrt(2))),
    "lrelu": ActivationSpec(
        lambda x, alpha: jax.nn.leaky_relu(x, negative_slope=alpha),
        0.2,
        float(np.sqrt(2)),
    ),
    "tanh": ActivationSpec(lambda x, alpha: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": ActivationSpec(lambda x, alpha: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": ActivationSpec(lambda x, alpha: jax.nn.elu(x), 0.0, 1.0),
    "selu": ActivationSpec(lambda x, alpha: jax.nn.selu(x), 0.0, 1.0),
    "softplus": ActivationSpec(lambda x, alpha: jax.nn.softplus(x), 0.0, 1.0),
    "swish": ActivationSpec(lambda x, alpha: jax.nn.sigmoid(x) * x, 0.0, float(np.sqrt(2))),
}


def bias_act(
    x: jax.Array,
    b: Optional[jax.Array] = None,
    dim: int = 1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jax.Array:
    """Add bias along `dim`, apply activation `act`, scale by `gain`, clamp.

    All steps are optional and fully fused by XLA. Defaults for `alpha` /
    `gain` come from the activation registry.
    """
    assert clamp is None or clamp >= 0
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)

    if b is not None:
        assert b.ndim == 1
        assert 0 <= dim < x.ndim
        assert b.shape[0] == x.shape[dim]
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.astype(x.dtype).reshape(shape)

    x = spec.func(x, alpha)
    if gain != 1:
        x = x * gain
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return x
