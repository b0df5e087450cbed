"""Fused Pallas decoder must match the plain-XLA OSG decoder exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnerf_tpu.models import OSGDecoder


@pytest.mark.parametrize("m", [4096, 5000])  # aligned and ragged point counts
def test_fused_decoder_matches_reference(m):
    dec = OSGDecoder(n_features=32, decoder_output_dim=32, decoder_lr_mul=1.0)
    p = dec.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 3, m, 32))

    want = dec.apply(p, feats, use_fused=False)
    got = dec._apply_fused(p, feats, interpret=True)
    np.testing.assert_allclose(np.asarray(got[..., 0:1]),
                               np.asarray(want["sigma"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[..., 1:]),
                               np.asarray(want["rgb"]), rtol=1e-4, atol=1e-5)


def test_fused_decoder_lr_mul():
    dec = OSGDecoder(n_features=8, decoder_output_dim=8, decoder_lr_mul=0.5)
    p = dec.init(jax.random.PRNGKey(2))
    feats = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 4096, 8))
    want = dec.apply(p, feats, use_fused=False)
    got = dec._apply_fused(p, feats, interpret=True)
    np.testing.assert_allclose(np.asarray(got[..., 1:]), np.asarray(want["rgb"]),
                               rtol=1e-4, atol=1e-5)
