"""Training losses: L1, SSIM, VGG16-LPIPS, adversarial depth GAN + R1.

Native JAX implementations of the loss stack the reference training loop
wires up (`/root/reference/g_nerf/training/training_loop.py:340-425`):

  * SSIM matching pytorch_msssim semantics (11x11 gaussian window,
    sigma 1.5, valid padding, K1=0.01/K2=0.03, per-sample average) — the
    reference depends on the external pytorch_msssim package.
  * LPIPS via a VGG16 feature net (NVIDIA lpips variant: per-layer
    unit-normalized features x learned linear weights; squared-difference
    sum == LPIPS distance). The reference downloads a TorchScript
    `vgg16.pt`; here the architecture is native and the weights are loaded
    from a converted checkpoint when available (random features otherwise —
    still a usable perceptual objective, flagged at load).
  * Non-saturating softplus GAN losses and the R1 gradient penalty through
    nested `jax.grad` (replacing torch autograd.grad(create_graph=True)).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.interpolate import interpolate_bilinear
from ..ops.precision import dot_precision

# ---------------------------------------------------------------------------
# SSIM (pytorch_msssim parity)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return g.astype(np.float32)


def ssim(
    x: jax.Array,
    y: jax.Array,
    data_range: float = 1.0,
    size_average: bool = True,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Structural similarity of [N, C, H, W] images.

    size_average=False returns per-sample values [N] (the reference uses
    this to apply per-item `factor` masking). The window shrinks (to an odd
    size) for images smaller than win_size, so tiny smoke-test shapes stay
    finite."""
    smaller = min(x.shape[2], x.shape[3])
    if smaller < win_size:
        win_size = smaller if smaller % 2 == 1 else smaller - 1
    win = jnp.asarray(_gaussian_window(win_size, win_sigma))
    C = x.shape[1]

    def blur(img):
        # Separable gaussian filter, valid padding, per channel.
        kh = jnp.broadcast_to(win[None, None, :, None], (C, 1, win_size, 1))
        kw = jnp.broadcast_to(win[None, None, None, :], (C, 1, 1, win_size))
        img = lax.conv_general_dilated(
            img, kh.astype(img.dtype), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
            precision=dot_precision(img.dtype),
        )
        return lax.conv_general_dilated(
            img, kw.astype(img.dtype), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
            precision=dot_precision(img.dtype),
        )

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = blur(x)
    mu_y = blur(y)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = blur(x * x) - mu_xx
    sigma_y = blur(y * y) - mu_yy
    sigma_xy = blur(x * y) - mu_xy

    cs = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    per_sample = ssim_map.mean(axis=(1, 2, 3))
    return per_sample.mean() if size_average else per_sample


# ---------------------------------------------------------------------------
# VGG16 LPIPS


_VGG_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
            512, 512, 512)
# Conv indices (0-based over the 13 convs) whose post-relu outputs feed
# LPIPS: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3.
_LPIPS_LAYERS = (1, 3, 6, 9, 12)


@dataclasses.dataclass(frozen=True)
class VGG16LPIPS:
    """VGG16 feature extractor producing LPIPS embedding vectors.

    apply(params, images) takes [N, 3, H, W] in [0, 255] (the reference's
    convention, `training_loop.py:345`), resizes to `resize_to` (as
    resize_images=True does), and returns [N, D] vectors whose squared
    euclidean distance is the LPIPS distance.

    Pretrained weights are ingested offline from NVIDIA's TorchScript
    `vgg16.pt` (the file the reference downloads,
    `training_loop.py:177-179`) by `tools/convert_vgg16_lpips.py`, which
    also calibrates `resize_to`/`antialias` against the live torchscript
    and stores them in the npz — construct the net via `load_lpips()` to
    pick those up. A params dict may carry an optional "preprocess" entry
    {shift, scale} (the LPIPS ScalingLayer) applied to the [-1, 1] input."""

    resize_to: int = 256
    antialias: bool = True

    def init(self, rng: jax.Array) -> dict:
        keys = jax.random.split(rng, len(_VGG_CFG) + len(_LPIPS_LAYERS))
        p: dict = {}
        in_c = 3
        conv_i = 0
        for v in _VGG_CFG:
            if v == "M":
                continue
            fan_in = in_c * 9
            p[f"conv{conv_i}"] = {
                "weight": jax.random.normal(keys[conv_i], (v, in_c, 3, 3))
                * math.sqrt(2.0 / fan_in),
                "bias": jnp.zeros((v,)),
            }
            in_c = v
            conv_i += 1
        # LPIPS linear weights (per-channel, non-negative in the original).
        dims = (64, 128, 256, 512, 512)
        for i, d in enumerate(dims):
            p[f"lin{i}"] = jnp.ones((d,)) / d
        return p

    def features(self, params: dict, x: jax.Array) -> list[jax.Array]:
        feats = []
        conv_i = 0
        for v in _VGG_CFG:
            if v == "M":
                x = lax.reduce_window(
                    x, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
                )
                continue
            w = params[f"conv{conv_i}"]["weight"]
            b = params[f"conv{conv_i}"]["bias"]
            # b cast: an fp32 bias must not promote a bf16 feature chain
            # (it would silently run every following conv fp32/HIGHEST).
            x = lax.conv_general_dilated(
                x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                precision=dot_precision(x.dtype),
            ) + b.astype(x.dtype)[None, :, None, None]
            x = jax.nn.relu(x)
            if conv_i in _LPIPS_LAYERS:
                feats.append(x)
            conv_i += 1
        return feats

    def apply(self, params: dict, images: jax.Array) -> jax.Array:
        x = images
        if x.shape[-1] != self.resize_to:
            x = interpolate_bilinear(x, self.resize_to, self.resize_to,
                                     antialias=self.antialias)
        # [0, 255] -> [-1, 1], then the optional LPIPS ScalingLayer
        # whitening ((x - shift) / scale) when the converted checkpoint
        # carries one.
        x = x / 255.0 * 2.0 - 1.0
        pre = params.get("preprocess")
        if pre is not None:
            x = (x - pre["shift"].astype(x.dtype)[None, :, None, None]) \
                / pre["scale"].astype(x.dtype)[None, :, None, None]
        feats = self.features(params, x)
        out = []
        for i, f in enumerate(feats):
            # Unit-normalize along channels, weight, flatten with 1/sqrt(HW)
            # so that squared-diff-sum == sum_l mean_hw ||w*(df)||^2.
            # The channel square-sum accumulates in fp32 (bf16 loses ~1%);
            # the result is cast back so a bf16 chain stays bf16.
            norm = jnp.sqrt(jnp.sum(jnp.square(f.astype(jnp.float32)),
                                    axis=1, keepdims=True) + 1e-10)
            f = f / norm.astype(f.dtype)
            f = f * params[f"lin{i}"].astype(f.dtype)[None, :, None, None]
            n, c, h, w = f.shape
            out.append((f / math.sqrt(h * w)).reshape(n, -1))
        return jnp.concatenate(out, axis=1)


def lpips_embed(vgg: VGG16LPIPS, params: dict, images: jax.Array) -> jax.Array:
    """LPIPS embedding of [-1,1]-range images (squared euclidean distance
    of two embeddings == their LPIPS distance). Split out from
    lpips_distance so the TRAINING step can batch the no-grad target
    images into one fwd-only pass separate from the differentiated fake
    pass — concatenating constants with differentiated inputs into ONE
    conv batch forces the conv backward to run over the constant half too
    (XLA cannot DCE half a conv_transpose), which is why lpips_distance's
    fused form is only used on forward-only paths (eval/validation)."""
    return vgg.apply(params, (images + 1) * 255 * 0.5)


def lpips_training_distance(vgg: VGG16LPIPS, params: dict, target: jax.Array,
                            pred: jax.Array) -> jax.Array:
    """lpips_distance for the training pattern (grads through `pred` only):
    the target embedding runs as its own fwd-only pass under stop_gradient
    so no conv backward is ever built for the constant side. Identical
    values to lpips_distance; cheaper VJP."""
    emb_t = jax.lax.stop_gradient(lpips_embed(vgg, params, target))
    emb_p = lpips_embed(vgg, params, pred)
    return jnp.sum(jnp.square((emb_t - emb_p).astype(jnp.float32)), axis=1)


def lpips_distance(vgg: VGG16LPIPS, params: dict, a: jax.Array, b: jax.Array) -> jax.Array:
    """Per-sample LPIPS distance of [-1,1]-range images (converted to the
    0..255 convention internally). Forward-only callers: the ONE VGG pass
    over [a; b] (batch 2N) is identical math to two batch-N passes and
    keeps the early small-channel conv matmuls fuller on the MXU; for
    training (grads through b only) use lpips_training_distance / the
    lpips_embed split instead — see lpips_embed's docstring."""
    f = lpips_embed(vgg, params, jnp.concatenate([a, b], axis=0))
    fa, fb = jnp.split(f, 2, axis=0)
    # Final reduction over ~millions of embedding dims: accumulate fp32
    # even when the feature chain ran bf16.
    return jnp.sum(jnp.square((fa - fb).astype(jnp.float32)), axis=1)


def load_lpips(path: str) -> tuple[VGG16LPIPS, dict, dict]:
    """Load converted LPIPS weights (tools/convert_vgg16_lpips.py output).

    Returns (net, params, meta). The net is constructed with the
    resize/antialias settings the converter calibrated against the source
    torchscript; meta["pretrained"] is True for converted weights."""
    import json

    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    meta = json.loads(str(flat.pop("__meta__").tobytes().decode("utf-8")))
    params: dict = {}
    for k, v in flat.items():
        arr = jnp.asarray(v)
        if "/" in k:
            group, leaf = k.split("/", 1)
            params.setdefault(group, {})[leaf] = arr
        else:
            params[k] = arr
    net = VGG16LPIPS(resize_to=int(meta.get("resize_to", 256)),
                     antialias=bool(meta.get("antialias", True)))
    meta.setdefault("pretrained", True)
    return net, params, meta


def lpips_params_or_warn(rng: jax.Array, path: Optional[str] = None
                         ) -> tuple[VGG16LPIPS, dict, bool]:
    """The training-loop entry point: converted weights when `path` is
    given, otherwise RANDOM features with a loud warning (a random VGG is
    still a usable perceptual objective, but it is NOT the reference's)."""
    if path:
        net, params, meta = load_lpips(path)
        print(f"LPIPS: loaded pretrained VGG16 weights from {path} "
              f"(resize {net.resize_to}, antialias={net.antialias}, "
              f"calibration err {meta.get('calibration_err', 'n/a')})")
        return net, params, True
    print("WARNING: LPIPS is running on RANDOM VGG16 weights — the "
          "perceptual term will NOT match the reference objective. Convert "
          "NVIDIA's vgg16.pt with tools/convert_vgg16_lpips.py and pass "
          "--lpips-weights to fix this.")
    net = VGG16LPIPS()
    return net, net.init(rng), False


# ---------------------------------------------------------------------------
# GAN losses


def g_nonsaturating_loss(fake_logits: jax.Array) -> jax.Array:
    """softplus(-D(G(z))) — generator side."""
    return jax.nn.softplus(-fake_logits).mean()


def d_logistic_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    return (jax.nn.softplus(fake_logits) + jax.nn.softplus(-real_logits)).mean()


def r1_penalty(
    d_apply: Callable[[jax.Array], jax.Array], real_images: jax.Array
) -> jax.Array:
    """Per-sample R1 gradient penalty sum_i ||d D/d x_i||^2 via nested grad
    (the reference uses autograd.grad(create_graph=True),
    `training_loop.py:414-417`)."""

    def scalar_out(x):
        return d_apply(x).sum()

    grads = jax.grad(scalar_out)(real_images)
    return jnp.sum(jnp.square(grads), axis=(1, 2, 3))


def masked_mean(values: jax.Array, factor: jax.Array, eps: float = 1e-6) -> jax.Array:
    """sum(values * factor) / (sum(factor) + eps) — the reference's
    `factor`-weighted reconstruction normalization (`training_loop.py:360`)."""
    return jnp.sum(values * factor) / (jnp.sum(factor) + eps)
