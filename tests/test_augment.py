"""Tests for the ADA augmentation pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnerf_tpu.training.augment import AugmentPipe, _filter_bank


def _img(n=2, c=3, h=32, w=32, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.rand(n, c, h, w).astype(np.float32) * 2 - 1)


def test_noop_pipe_is_identity():
    pipe = AugmentPipe()  # all multipliers 0
    x = _img()
    y = pipe(jax.random.PRNGKey(0), x, p=1.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))


def test_identity_geometric_roundtrip():
    # Geometric path executes but the sampled transform is identity
    # (p=0 gates everything off): the wavelet up/warp/down roundtrip must be
    # near-identity away from borders.
    pipe = AugmentPipe(rotate=1.0)
    x = _img(h=32, w=32)
    y = pipe(jax.random.PRNGKey(0), x, p=0.0)
    xa, ya = np.asarray(x)[..., 4:-4, 4:-4], np.asarray(y)[..., 4:-4, 4:-4]
    np.testing.assert_allclose(ya, xa, atol=2e-2)


def test_xflip_deterministic():
    pipe = AugmentPipe(xflip=1.0)
    # Delta image: the warp must map pixel (5, 3) exactly to (5, W-1-3).
    x = np.zeros((1, 1, 16, 16), np.float32)
    x[0, 0, 5, 3] = 1.0
    # debug_percentile=0.9 -> i = floor(0.9*2) = 1 -> flip on.
    y = np.asarray(pipe(jax.random.PRNGKey(0), jnp.asarray(x), p=1.0,
                        debug_percentile=0.9))
    assert np.unravel_index(np.abs(y[0, 0]).argmax(), (16, 16)) == (5, 12)
    assert y[0, 0, 5, 12] > 0.9  # wavelet resampling keeps most of the energy


def test_rotate90_deterministic():
    pipe = AugmentPipe(rotate90=1.0)
    x = np.zeros((1, 1, 16, 16), np.float32)
    x[0, 0, 5, 3] = 1.0
    # dp=0.3 -> i = 1 -> one 90-degree (counter-clockwise) rotation.
    y = np.asarray(pipe(jax.random.PRNGKey(0), jnp.asarray(x), p=1.0,
                        debug_percentile=0.3))
    want = np.unravel_index(np.rot90(x[0, 0], k=1).argmax(), (16, 16))
    assert np.unravel_index(np.abs(y[0, 0]).argmax(), (16, 16)) == want
    assert np.abs(y[0, 0]).max() > 0.9


def test_brightness_and_contrast_oracle():
    from scipy.special import erfinv

    dp = 0.8
    pipe = AugmentPipe(brightness=1.0)
    x = _img()
    y = pipe(jax.random.PRNGKey(0), x, p=1.0, debug_percentile=dp)
    b = erfinv(dp * 2 - 1) * 0.2
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) + b, rtol=1e-4, atol=1e-5)

    pipe = AugmentPipe(contrast=1.0)
    y = pipe(jax.random.PRNGKey(0), x, p=1.0, debug_percentile=dp)
    c = 2 ** (erfinv(dp * 2 - 1) * 0.5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * c, rtol=1e-4, atol=1e-5)


def test_lumaflip_is_householder():
    x = _img()
    pipe = AugmentPipe(lumaflip=1.0)
    y = pipe(jax.random.PRNGKey(0), x, p=1.0, debug_percentile=0.9)  # i=1
    v = np.ones(3) / np.sqrt(3)
    M = np.eye(3) - 2 * np.outer(v, v)
    want = np.einsum("ij,njhw->nihw", M, np.asarray(x))
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)
    # Applying twice restores.
    y2 = pipe(jax.random.PRNGKey(0),
              pipe(jax.random.PRNGKey(1), x, 1.0, 0.9), 1.0, 0.9)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(x), rtol=1e-4, atol=1e-5)


def test_hue_preserves_luma():
    x = _img()
    pipe = AugmentPipe(hue=1.0)
    y = pipe(jax.random.PRNGKey(0), x, p=1.0, debug_percentile=0.77)
    luma_x = np.asarray(x).sum(axis=1)
    luma_y = np.asarray(y).sum(axis=1)
    np.testing.assert_allclose(luma_y, luma_x, rtol=1e-3, atol=1e-4)


def test_cutout_zeroes_rectangle():
    pipe = AugmentPipe(cutout=1.0, cutout_size=0.5)
    x = jnp.ones((1, 3, 32, 32))
    y = np.asarray(pipe(jax.random.PRNGKey(0), x, p=1.0, debug_percentile=0.5))
    # Center cutout of half the image: interior zeroed, borders kept.
    assert y[0, 0, 16, 16] == 0.0
    assert y[0, 0, 2, 2] == 1.0
    frac_zero = (y == 0).mean()
    assert 0.2 < frac_zero < 0.3  # ~25%


def test_noise_changes_image():
    pipe = AugmentPipe(noise=1.0, noise_std=0.5)
    x = _img()
    y = pipe(jax.random.PRNGKey(3), x, p=1.0, debug_percentile=0.9)
    assert not np.allclose(np.asarray(y), np.asarray(x))


def test_imgfilter_runs_and_identity_at_p0():
    pipe = AugmentPipe(imgfilter=1.0)
    x = _img()
    y = pipe(jax.random.PRNGKey(0), x, p=0.0)
    # Gain vector is all-ones at p=0, but normalization still filters with
    # the (identity-sum) bank; result stays close to input.
    assert np.isfinite(np.asarray(y)).all()
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=5e-2)
    y1 = pipe(jax.random.PRNGKey(0), x, p=1.0)
    assert np.isfinite(np.asarray(y1)).all()


def test_filter_bank_properties():
    fb = _filter_bank()
    assert fb.shape[0] == 4
    # Band 0 is a (delayed) low-pass: sums to ~1; higher bands sum to ~0.
    np.testing.assert_allclose(fb[0].sum(), 1.0, atol=1e-6)
    for i in (1, 2, 3):
        np.testing.assert_allclose(fb[i].sum(), 0.0, atol=1e-6)


def test_full_pipe_ada_defaults_smoke():
    # The standard 'bgc' ADA config.
    pipe = AugmentPipe(xflip=1, rotate90=1, xint=1, scale=1, rotate=1,
                       aniso=1, xfrac=1, brightness=1, contrast=1,
                       lumaflip=1, hue=1, saturation=1)
    x = _img(n=4, h=32, w=32)
    y = jax.jit(lambda k, im: pipe(k, im, p=0.5))(jax.random.PRNGKey(7), x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    assert not np.allclose(np.asarray(y), np.asarray(x))
    # 1-channel (depth) path.
    pipe1 = AugmentPipe(brightness=1, contrast=1)
    d = _img(n=2, c=1)
    yd = pipe1(jax.random.PRNGKey(8), d, p=1.0)
    assert yd.shape == d.shape


def test_geometric_warp_cell_pack_matches_default():
    """The single-gather (cell_pack) warp path produces the same augmented
    images as the default lane-packed path — the EG3D ADA step's perf
    layout must not change augmentation semantics."""
    import dataclasses
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.randn(2, 6, 32, 32).astype(np.float32))
    pipe = AugmentPipe(xflip=1, rotate90=1, xint=1, scale=1, rotate=1,
                       aniso=1, xfrac=1, pad_fraction=0.55)
    pipe_cp = dataclasses.replace(pipe, warp_cell_pack=True)
    key = jax.random.PRNGKey(7)
    out = pipe(key, imgs, p=0.8)
    out_cp = pipe_cp(key, imgs, p=0.8)
    np.testing.assert_allclose(np.asarray(out_cp), np.asarray(out),
                               rtol=1e-5, atol=1e-5)
