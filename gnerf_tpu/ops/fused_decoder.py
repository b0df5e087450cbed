"""Pallas-fused tri-plane point decoder.

The OSG decoder (reference `triplane.py:113-136`) is a tiny MLP evaluated at
~10^6 points per frame: mean over 3 plane features -> FC(32->64) ->
softplus -> FC(64->33) -> sigmoid-clamped rgb + raw sigma. Under plain XLA
each dot materializes its operands to HBM (the 64-wide hidden alone is
~200MB per pass at fp32); this kernel keeps the whole chain in VMEM:

  * the 3-plane mean folds into the first matmul (concat-features times a
    replicated W1/3), so the kernel runs two MXU matmuls + VPU activations
    per point block with zero intermediate HBM traffic;
  * weights arrive pre-scaled with the equalized-LR gains so the kernel
    math is exactly the FullyConnectedLayer semantics.

Used automatically on TPU for the renderer hot path; the pure-XLA decoder
remains as fallback (and as the parity oracle in tests, where the kernel
runs in interpreter mode)."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 4096


def _kernel(f0_ref, f1_ref, f2_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    acc = jnp.dot(f0_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    acc += jnp.dot(f1_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    acc += jnp.dot(f2_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = jax.nn.softplus(acc / 3.0 + b1_ref[:])
    o = jnp.dot(h.astype(w2_ref.dtype), w2_ref[:],
                preferred_element_type=jnp.float32) + b2_ref[:]
    sigma = o[:, :1]
    rgb = jax.nn.sigmoid(o[:, 1:]) * (1 + 2 * 0.001) - 0.001
    out_ref[:] = jnp.concatenate([sigma, rgb], axis=1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_osg_decode(
    feats: jax.Array,       # [N, 3, M, C] sampled plane features
    w1e: jax.Array,         # [C, H] effective first-layer weight (gain applied)
    b1e: jax.Array,         # [H]
    w2e: jax.Array,         # [H, 1 + out_dim]
    b2e: jax.Array,         # [1 + out_dim]
    interpret: bool = False,
) -> jax.Array:
    """Returns [N, M, 1 + out_dim] = [sigma | rgb] (fp32)."""
    N, P, M, C = feats.shape
    assert P == 3
    H = w1e.shape[1]
    D = w2e.shape[1]

    flat = feats.reshape(N * 3 * M, C)
    m_pad = -M % _BLK
    if m_pad:
        # Pad the point axis per plane so blocks stay static.
        feats_p = jnp.pad(feats, ((0, 0), (0, 0), (0, m_pad), (0, 0)))
        flat = feats_p.reshape(N * 3 * (M + m_pad), C)
    mp = M + m_pad
    n_blocks = mp // _BLK

    b1r = jnp.broadcast_to(b1e[None, :], (1, H))
    b2r = jnp.broadcast_to(b2e[None, :], (1, D))

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((N * mp, D), jnp.float32),
        grid=(N, n_blocks),
        in_specs=[
            # Plane p of batch n lives at rows ((n*3 + p) * mp ... ).
            pl.BlockSpec((_BLK, C), lambda n, i: (n * 3 * (mp // _BLK) + i, 0)),
            pl.BlockSpec((_BLK, C), lambda n, i: ((n * 3 + 1) * (mp // _BLK) + i, 0)),
            pl.BlockSpec((_BLK, C), lambda n, i: ((n * 3 + 2) * (mp // _BLK) + i, 0)),
            pl.BlockSpec((C, H), lambda n, i: (0, 0)),
            pl.BlockSpec((1, H), lambda n, i: (0, 0)),
            pl.BlockSpec((H, D), lambda n, i: (0, 0)),
            pl.BlockSpec((1, D), lambda n, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_BLK, D), lambda n, i: (n * (mp // _BLK) + i, 0)),
        interpret=interpret,
    )(flat, flat, flat, w1e, b1r, w2e, b2r)

    out = out.reshape(N, mp, D)
    return out[:, :M]
