"""Matmul/conv precision policy.

XLA's DEFAULT dot precision performs reduced-precision multiplies even for
float32 operands (bf16-class error ~1e-3 — measured on both the CPU and TPU
backends of this JAX build). The framework's policy:

  * float32 operands  -> Precision.HIGHEST (true fp32 math; parity with the
    PyTorch reference requires it)
  * bfloat16 operands -> Precision.DEFAULT (native bf16 multiplies with
    fp32 MXU accumulation — the TPU fast path; HIGHEST would silently
    upcast and triple the pass count)

So speed is controlled by the *dtype* you run a network in, never by
silently degraded fp32.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def dot_precision(dtype) -> lax.Precision:
    return lax.Precision.HIGHEST if dtype == jnp.float32 else lax.Precision.DEFAULT
