"""StyleGAN2-ADA augmentation pipeline (jit-safe JAX).

Capability equivalent of the reference
`/root/reference/g_nerf/training/augment.py` (the full "Training GANs with
Limited Data" pipeline): pixel blitting (x-flip, 90-degree rotations,
integer translation), general geometric transforms (iso/aniso scale,
rotation, fractional translation) executed as one wavelet-filtered affine
resampling, color transforms as homogeneous 4x4 matrices, per-band
image-space filtering, additive noise and cutout. Every augmentation is
gated per-sample by probability `p * multiplier`.

TPU/jit design difference: the reference computes a data-dependent reflect
padding from the transformed image corners (dynamic shapes). Under jit all
shapes are static, so we pad by a conservative static margin
(`pad_fraction` of the image + filter support) — mathematically identical
for any transform whose corners stay inside the margin, and the margin
covers the pipeline's default parameter ranges.

Randomness via explicit `jax.random` keys; `debug_percentile` reproduces
the reference's deterministic debugging mode.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from ..ops.grid_sample import grid_sample_2d
from ..ops.precision import dot_precision
from ..ops.upfirdn2d import downsample2d, setup_filter, upsample2d
from jax import lax

# Wavelet low-pass filters (public coefficients; only the ones used).
WAVELETS = {
    "sym2": [-0.12940952255092145, 0.22414386804185735, 0.836516303737469,
             0.48296291314469025],
    "sym6": [0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
             -0.048311742585633, 0.4910559419267466, 0.787641141030194,
             0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
             0.04472490177066578, 0.0017677118642428036, -0.007800708325034148],
}


def _translate2d(tx, ty):
    z = jnp.zeros_like(tx)
    o = jnp.ones_like(tx)
    return jnp.stack([
        jnp.stack([o, z, tx], -1),
        jnp.stack([z, o, ty], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def _scale2d(sx, sy):
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    return jnp.stack([
        jnp.stack([sx, z, z], -1),
        jnp.stack([z, sy, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def _rotate2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def _translate3d(tx, ty, tz):
    z = jnp.zeros_like(tx)
    o = jnp.ones_like(tx)
    return jnp.stack([
        jnp.stack([o, z, z, tx], -1),
        jnp.stack([z, o, z, ty], -1),
        jnp.stack([z, z, o, tz], -1),
        jnp.stack([z, z, z, o], -1),
    ], -2)


def _scale3d(sx, sy, sz):
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    return jnp.stack([
        jnp.stack([sx, z, z, z], -1),
        jnp.stack([z, sy, z, z], -1),
        jnp.stack([z, z, sz, z], -1),
        jnp.stack([z, z, z, o], -1),
    ], -2)


def _rotate3d_axis(v: np.ndarray, theta):
    vx, vy, vz = float(v[0]), float(v[1]), float(v[2])
    s, c = jnp.sin(theta), jnp.cos(theta)
    cc = 1 - c
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack([
        jnp.stack([vx * vx * cc + c, vx * vy * cc - vz * s, vx * vz * cc + vy * s, z], -1),
        jnp.stack([vy * vx * cc + vz * s, vy * vy * cc + c, vy * vz * cc - vx * s, z], -1),
        jnp.stack([vz * vx * cc - vy * s, vz * vy * cc + vx * s, vz * vz * cc + c, z], -1),
        jnp.stack([z, z, z, o], -1),
    ], -2)


def _filter_bank() -> np.ndarray:
    """4-band wavelet filter bank (reference `augment.py:177-187`)."""
    hz_lo = np.asarray(WAVELETS["sym2"])
    hz_hi = hz_lo * ((-1) ** np.arange(hz_lo.size))
    hz_lo2 = np.convolve(hz_lo, hz_lo[::-1]) / 2
    hz_hi2 = np.convolve(hz_hi, hz_hi[::-1]) / 2
    fbank = np.eye(4, 1)
    for i in range(1, fbank.shape[0]):
        fbank = np.dstack([fbank, np.zeros_like(fbank)]).reshape(fbank.shape[0], -1)[:, :-1]
        fbank = scipy.signal.convolve(fbank, [hz_lo2])
        fbank[i, (fbank.shape[1] - hz_hi2.size) // 2:(fbank.shape[1] + hz_hi2.size) // 2] += hz_hi2
    return fbank.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class AugmentPipe:
    # Pixel blitting.
    xflip: float = 0.0
    rotate90: float = 0.0
    xint: float = 0.0
    xint_max: float = 0.125
    # General geometric.
    scale: float = 0.0
    rotate: float = 0.0
    aniso: float = 0.0
    xfrac: float = 0.0
    scale_std: float = 0.2
    rotate_max: float = 1.0
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    # Color.
    brightness: float = 0.0
    contrast: float = 0.0
    lumaflip: float = 0.0
    hue: float = 0.0
    saturation: float = 0.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    # Image-space filtering.
    imgfilter: float = 0.0
    imgfilter_bands: Sequence[float] = (1, 1, 1, 1)
    imgfilter_std: float = 1.0
    # Corruptions.
    noise: float = 0.0
    cutout: float = 0.0
    noise_std: float = 0.1
    cutout_size: float = 0.5
    # Static geometric padding margin (fraction of image size); covers the
    # default parameter ranges.
    pad_fraction: float = 0.6
    # Single-gather warp sampling (grid_sample_2d cell_pack): 4x fewer
    # gather rows / scatter rows for ~4.2x warp-operand HBM — the ADA warp
    # is gather-bound at flagship scale (BASELINE.md r4 EG3D table).
    warp_cell_pack: bool = False

    @property
    def _has_geom(self):
        return any(x > 0 for x in (self.xflip, self.rotate90, self.xint,
                                   self.scale, self.rotate, self.aniso, self.xfrac))

    @property
    def _has_color(self):
        return any(x > 0 for x in (self.brightness, self.contrast, self.lumaflip,
                                   self.hue, self.saturation))

    def __call__(self, rng: jax.Array, images: jax.Array, p: float = 1.0,
                 debug_percentile: Optional[float] = None) -> jax.Array:
        """Augment a batch [N, C, H, W]; `p` is the ADA strength."""
        N, C, H, W = images.shape
        keys = iter(jax.random.split(rng, 32))

        def gate(k, value, fallback, prob, extra_dims=0):
            u = jax.random.uniform(k, (N,) + (1,) * extra_dims)
            return jnp.where(u < prob * p, value, fallback)

        dp = debug_percentile

        # ----- Geometric (inverse transform G_inv: out-pixel -> in-pixel) ---
        G_inv = jnp.broadcast_to(jnp.eye(3), (N, 3, 3))
        if self.xflip > 0:
            i = jnp.floor(jax.random.uniform(next(keys), (N,)) * 2)
            i = gate(next(keys), i, jnp.zeros_like(i), self.xflip)
            if dp is not None:
                i = jnp.full_like(i, np.floor(dp * 2))
            G_inv = G_inv @ _scale2d(1 / (1 - 2 * i), jnp.ones_like(i))
        if self.rotate90 > 0:
            i = jnp.floor(jax.random.uniform(next(keys), (N,)) * 4)
            i = gate(next(keys), i, jnp.zeros_like(i), self.rotate90)
            if dp is not None:
                i = jnp.full_like(i, np.floor(dp * 4))
            G_inv = G_inv @ _rotate2d(-(-np.pi / 2 * i))
        if self.xint > 0:
            t = (jax.random.uniform(next(keys), (N, 2)) * 2 - 1) * self.xint_max
            t = gate(next(keys), t, jnp.zeros_like(t), self.xint, extra_dims=1)
            if dp is not None:
                t = jnp.full_like(t, (dp * 2 - 1) * self.xint_max)
            G_inv = G_inv @ _translate2d(-jnp.round(t[:, 0] * W), -jnp.round(t[:, 1] * H))
        if self.scale > 0:
            s = jnp.exp2(jax.random.normal(next(keys), (N,)) * self.scale_std)
            s = gate(next(keys), s, jnp.ones_like(s), self.scale)
            if dp is not None:
                from scipy.special import erfinv
                s = jnp.full_like(s, 2 ** (erfinv(dp * 2 - 1) * self.scale_std))
            G_inv = G_inv @ _scale2d(1 / s, 1 / s)
        # jnp (not math/max): p may be a TRACED scalar — the ADA controller
        # varies it step-to-step without recompiling.
        p_rot = 1 - jnp.sqrt(jnp.maximum(1 - self.rotate * p, 0.0))
        if self.rotate > 0:
            theta = (jax.random.uniform(next(keys), (N,)) * 2 - 1) * np.pi * self.rotate_max
            u = jax.random.uniform(next(keys), (N,))
            theta = jnp.where(u < p_rot, theta, 0.0)
            if dp is not None:
                theta = jnp.full_like(theta, (dp * 2 - 1) * np.pi * self.rotate_max)
            G_inv = G_inv @ _rotate2d(theta)
        if self.aniso > 0:
            s = jnp.exp2(jax.random.normal(next(keys), (N,)) * self.aniso_std)
            s = gate(next(keys), s, jnp.ones_like(s), self.aniso)
            if dp is not None:
                from scipy.special import erfinv
                s = jnp.full_like(s, 2 ** (erfinv(dp * 2 - 1) * self.aniso_std))
            G_inv = G_inv @ _scale2d(1 / s, s)
        if self.rotate > 0:
            theta = (jax.random.uniform(next(keys), (N,)) * 2 - 1) * np.pi * self.rotate_max
            u = jax.random.uniform(next(keys), (N,))
            theta = jnp.where(u < p_rot, theta, 0.0)
            if dp is not None:
                theta = jnp.zeros_like(theta)
            G_inv = G_inv @ _rotate2d(theta)
        if self.xfrac > 0:
            t = jax.random.normal(next(keys), (N, 2)) * self.xfrac_std
            t = gate(next(keys), t, jnp.zeros_like(t), self.xfrac, extra_dims=1)
            if dp is not None:
                from scipy.special import erfinv
                t = jnp.full_like(t, erfinv(dp * 2 - 1) * self.xfrac_std)
            G_inv = G_inv @ _translate2d(-t[:, 0] * W, -t[:, 1] * H)

        if self._has_geom:
            images = self._execute_geometric(images, G_inv)

        # ----- Color (C: color_in -> color_out, homogeneous 4x4) -----------
        Cmat = jnp.broadcast_to(jnp.eye(4), (N, 4, 4))
        v = np.asarray([1, 1, 1, 0]) / np.sqrt(3)
        if self.brightness > 0:
            b = jax.random.normal(next(keys), (N,)) * self.brightness_std
            b = gate(next(keys), b, jnp.zeros_like(b), self.brightness)
            if dp is not None:
                from scipy.special import erfinv
                b = jnp.full_like(b, erfinv(dp * 2 - 1) * self.brightness_std)
            Cmat = _translate3d(b, b, b) @ Cmat
        if self.contrast > 0:
            c = jnp.exp2(jax.random.normal(next(keys), (N,)) * self.contrast_std)
            c = gate(next(keys), c, jnp.ones_like(c), self.contrast)
            if dp is not None:
                from scipy.special import erfinv
                c = jnp.full_like(c, 2 ** (erfinv(dp * 2 - 1) * self.contrast_std))
            Cmat = _scale3d(c, c, c) @ Cmat
        if self.lumaflip > 0:
            i = jnp.floor(jax.random.uniform(next(keys), (N,)) * 2)
            i = gate(next(keys), i, jnp.zeros_like(i), self.lumaflip)
            if dp is not None:
                i = jnp.full_like(i, np.floor(dp * 2))
            vv = jnp.asarray(np.outer(v, v))
            Cmat = (jnp.eye(4) - 2 * vv * i[:, None, None]) @ Cmat
        if self.hue > 0 and C > 1:
            theta = (jax.random.uniform(next(keys), (N,)) * 2 - 1) * np.pi * self.hue_max
            theta = gate(next(keys), theta, jnp.zeros_like(theta), self.hue)
            if dp is not None:
                theta = jnp.full_like(theta, (dp * 2 - 1) * np.pi * self.hue_max)
            Cmat = _rotate3d_axis(v, theta) @ Cmat
        if self.saturation > 0 and C > 1:
            s = jnp.exp2(jax.random.normal(next(keys), (N,)) * self.saturation_std)
            s = gate(next(keys), s, jnp.ones_like(s), self.saturation)
            if dp is not None:
                from scipy.special import erfinv
                s = jnp.full_like(s, 2 ** (erfinv(dp * 2 - 1) * self.saturation_std))
            vv = jnp.asarray(np.outer(v, v))
            Cmat = (vv + (jnp.eye(4) - vv) * s[:, None, None]) @ Cmat

        if self._has_color:
            images = self._execute_color(images, Cmat)

        # ----- Image-space filtering ---------------------------------------
        if self.imgfilter > 0:
            images = self._execute_imgfilter(next(keys), images, p, dp)

        # ----- Corruptions --------------------------------------------------
        if self.noise > 0:
            sigma = jnp.abs(jax.random.normal(next(keys), (N, 1, 1, 1))) * self.noise_std
            sigma = gate(next(keys), sigma, jnp.zeros_like(sigma), self.noise, extra_dims=3)
            if dp is not None:
                from scipy.special import erfinv
                sigma = jnp.full_like(sigma, erfinv(dp) * self.noise_std)
            images = images + jax.random.normal(next(keys), images.shape) * sigma
        if self.cutout > 0:
            size = jnp.full((N, 2, 1, 1, 1), self.cutout_size)
            size = gate(next(keys), size, jnp.zeros_like(size), self.cutout, extra_dims=4)
            center = jax.random.uniform(next(keys), (N, 2, 1, 1, 1))
            if dp is not None:
                size = jnp.full_like(size, self.cutout_size)
                center = jnp.full_like(center, dp)
            coord_x = jnp.arange(W).reshape(1, 1, 1, -1)
            coord_y = jnp.arange(H).reshape(1, 1, -1, 1)
            mask_x = jnp.abs((coord_x + 0.5) / W - center[:, 0]) >= size[:, 0] / 2
            mask_y = jnp.abs((coord_y + 0.5) / H - center[:, 1]) >= size[:, 1] / 2
            images = images * jnp.logical_or(mask_x, mask_y).astype(images.dtype)
        return images

    # ------------------------------------------------------------------

    def _execute_geometric(self, images: jax.Array, G_inv: jax.Array) -> jax.Array:
        """Wavelet-filtered affine resampling (reference `augment.py:275-312`)
        with a STATIC pad margin instead of the data-dependent one."""
        N, C, H, W = images.shape
        hz = setup_filter(WAVELETS["sym6"])
        hz_pad = (hz.shape[0] if hz.ndim == 1 else hz.shape[0]) // 4
        m = int(np.ceil(self.pad_fraction * max(H, W))) + hz_pad * 2
        mx0 = mx1 = my0 = my1 = m

        images = jnp.pad(images, ((0, 0), (0, 0), (my0, my1), (mx0, mx1)),
                         mode="reflect")
        # Symmetric pad -> no origin shift term.
        # Upsample by 2 (with the same coordinate bookkeeping as reference).
        images = upsample2d(images, hz, up=2)
        S2 = _scale2d(jnp.full((N,), 2.0), jnp.full((N,), 2.0))
        S2i = _scale2d(jnp.full((N,), 0.5), jnp.full((N,), 0.5))
        T = _translate2d(jnp.full((N,), -0.5), jnp.full((N,), -0.5))
        Ti = _translate2d(jnp.full((N,), 0.5), jnp.full((N,), 0.5))
        G = S2 @ G_inv @ S2i
        G = T @ G @ Ti

        # Normalized-coordinate version of affine_grid(align_corners=False).
        in_h, in_w = images.shape[2], images.shape[3]
        out_h, out_w = (H + hz_pad * 2) * 2, (W + hz_pad * 2) * 2
        Sout = _scale2d(jnp.full((N,), 2.0 / in_w), jnp.full((N,), 2.0 / in_h))
        Souti = _scale2d(jnp.full((N,), out_w / 2.0), jnp.full((N,), out_h / 2.0))
        G = Sout @ G @ Souti

        ys = (jnp.arange(out_h) + 0.5) / out_h * 2 - 1
        xs = (jnp.arange(out_w) + 0.5) / out_w * 2 - 1
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1).reshape(-1, 3)
        src = jnp.einsum("nij,mj->nmi", G, grid,
                         precision=dot_precision(jnp.float32))[..., :2]
        images = grid_sample_2d(
            images, src, cell_pack=self.warp_cell_pack)  # [N, out_h*out_w, C]
        images = images.reshape(N, out_h, out_w, C).transpose(0, 3, 1, 2)

        # Downsample and crop back to the original size.
        images = downsample2d(images, hz, down=2, padding=-hz_pad * 2,
                              flip_filter=True)
        # Remove the static margin (center crop back to the input size).
        y0 = (images.shape[2] - H) // 2
        x0 = (images.shape[3] - W) // 2
        return images[:, :, y0 : y0 + H, x0 : x0 + W]

    def _execute_color(self, images: jax.Array, Cmat: jax.Array) -> jax.Array:
        N, C, H, W = images.shape
        flat = images.reshape(N, C, H * W)
        if C == 3:
            flat = jnp.einsum("nij,njm->nim", Cmat[:, :3, :3], flat) + Cmat[:, :3, 3:]
        elif C == 1:
            Cm = Cmat[:, :3, :].mean(axis=1, keepdims=True)
            flat = flat * Cm[:, :, :3].sum(axis=2, keepdims=True) + Cm[:, :, 3:]
        elif C == 6:
            a = jnp.einsum("nij,njm->nim", Cmat[:, :3, :3], flat[:, :3]) + Cmat[:, :3, 3:]
            b = jnp.einsum("nij,njm->nim", Cmat[:, :3, :3], flat[:, 3:]) + Cmat[:, :3, 3:]
            flat = jnp.concatenate([a, b], axis=1)
        else:
            raise ValueError("images must have 1, 3 or 6 channels")
        return flat.reshape(N, C, H, W)

    def _execute_imgfilter(self, rng, images, p, dp):
        N, C, H, W = images.shape
        fbank = jnp.asarray(_filter_bank())
        num_bands = fbank.shape[0]
        assert len(self.imgfilter_bands) == num_bands
        expected_power = jnp.asarray(np.array([10, 1, 1, 1]) / 13)

        keys = jax.random.split(rng, num_bands * 2)
        g = jnp.ones((N, num_bands))
        for i, band_strength in enumerate(self.imgfilter_bands):
            t_i = jnp.exp2(jax.random.normal(keys[2 * i], (N,)) * self.imgfilter_std)
            u = jax.random.uniform(keys[2 * i + 1], (N,))
            t_i = jnp.where(u < self.imgfilter * p * band_strength, t_i, 1.0)
            if dp is not None:
                from scipy.special import erfinv
                t_i = (jnp.full_like(t_i, 2 ** (erfinv(dp * 2 - 1) * self.imgfilter_std))
                       if band_strength > 0 else jnp.ones_like(t_i))
            t = jnp.ones((N, num_bands)).at[:, i].set(t_i)
            t = t / jnp.sqrt(jnp.sum(expected_power * jnp.square(t), axis=-1,
                                     keepdims=True))
            g = g * t

        hz_prime = g @ fbank  # [N, taps]
        taps = hz_prime.shape[-1]
        pad = fbank.shape[1] // 2
        x = images.reshape(1, N * C, H, W)
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
        w_rows = jnp.repeat(hz_prime[:, None, :], C, axis=1).reshape(N * C, 1, 1, taps)
        x = lax.conv_general_dilated(
            x, w_rows.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=N * C, precision=dot_precision(x.dtype),
        )
        w_cols = w_rows.reshape(N * C, 1, taps, 1)
        x = lax.conv_general_dilated(
            x, w_cols.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=N * C, precision=dot_precision(x.dtype),
        )
        return x.reshape(N, C, H, W)
