"""Evaluation metrics: PSNR / SSIM / LPIPS / Frechet feature distance.

The reference imports a `metrics.metric_main` FID suite that does not exist
in its repo (`train.py:31` — broken). This module provides a working
equivalent: reconstruction metrics (PSNR, SSIM, LPIPS) for the paired-view
evaluation the trainer actually needs (validation SSIM drives
best-checkpoint selection, reference `training_loop.py:474-529`), plus a
generic Frechet distance over any feature extractor (the VGG16-LPIPS
embedding by default; plug in converted InceptionV3 weights for canonical
FID)."""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .losses import VGG16LPIPS, lpips_distance, ssim


def psnr(a: jax.Array, b: jax.Array, data_range: float = 2.0) -> jax.Array:
    """Per-sample PSNR of [-1, 1] images [N, C, H, W]."""
    mse = jnp.mean(jnp.square(a - b), axis=(1, 2, 3))
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def reconstruction_metrics(vgg: VGG16LPIPS, params_vgg, real: jax.Array,
                           fake: jax.Array) -> dict:
    """PSNR/SSIM/LPIPS means over a batch of [-1,1] images."""
    return {
        "psnr": psnr(real, fake).mean(),
        "ssim": ssim(real * 0.5 + 0.5, fake * 0.5 + 0.5, data_range=1.0),
        "lpips": lpips_distance(vgg, params_vgg, real, fake).mean(),
    }


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Frechet distance between two Gaussians (host-side numpy/scipy)."""
    import scipy.linalg

    mu1, mu2 = np.asarray(mu1), np.asarray(mu2)
    sigma1, sigma2 = np.asarray(sigma1), np.asarray(sigma2)
    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def feature_statistics(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of [N, D] feature matrix."""
    features = np.asarray(features, dtype=np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_feature_distance(
    feature_fn: Callable[[jax.Array], jax.Array],
    real_batches: Iterable[np.ndarray],
    fake_batches: Iterable[np.ndarray],
    max_items: Optional[int] = None,
) -> float:
    """FID-style metric: Frechet distance between feature distributions of
    real and generated image streams ([-1,1] NCHW batches)."""

    def collect(batches):
        feats = []
        n = 0
        for b in batches:
            f = np.asarray(feature_fn(jnp.asarray(b)))
            feats.append(f)
            n += f.shape[0]
            if max_items is not None and n >= max_items:
                break
        return np.concatenate(feats)[: max_items or None]

    mu_r, sig_r = feature_statistics(collect(real_batches))
    mu_f, sig_f = feature_statistics(collect(fake_batches))
    return frechet_distance(mu_r, sig_r, mu_f, sig_f)


def make_inception_feature_fn(params_inception, batch_dtype=jnp.float32,
                              resize_to: int = 299):
    """Canonical-FID feature extractor: pool-3 (2048-dim) InceptionV3
    features from pretrained weights ingested by tools/convert_inception.py
    (`inception.load_inception`). Use with `frechet_feature_distance` for
    numbers comparable across runs and to published FID protocol (which
    resizes to 299; smaller values only for smoke tests)."""
    from .inception import InceptionV3Features

    net = InceptionV3Features(resize_to=resize_to)

    @jax.jit
    def feature_fn(images):
        return net.features(params_inception, images.astype(batch_dtype))

    return feature_fn


def make_vgg_feature_fn(vgg: VGG16LPIPS, params_vgg):
    """Default feature extractor for frechet_feature_distance: spatially
    POOLED per-layer VGG features (64+128+256+512+512 = 1472 dims) — keeps
    the covariance tractable, like canonical FID's 2048-dim pooled
    Inception features (a spatially-flattened LPIPS embedding would need a
    ~100k x 100k covariance)."""

    @jax.jit
    def feature_fn(images):
        x = images
        if x.shape[-1] != vgg.resize_to:
            from ..ops.interpolate import interpolate_bilinear

            x = interpolate_bilinear(x, vgg.resize_to, vgg.resize_to,
                                     antialias=True)
        feats = vgg.features(params_vgg, x)
        return jnp.concatenate([f.mean(axis=(2, 3)) for f in feats], axis=1)

    return feature_fn
