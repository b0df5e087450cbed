"""Fused multiply-add.

The reference needed a custom autograd Function with hand-written unbroadcast
backward (`/root/reference/g_nerf/torch_utils/ops/fma.py:51-60`) to fuse
`a*b+c` under torch. XLA fuses the expression automatically and JAX autodiff
handles broadcasting, so this is a plain function kept only for API parity.
"""

import jax


def fma(a: jax.Array, b: jax.Array, c: jax.Array) -> jax.Array:
    return a * b + c
