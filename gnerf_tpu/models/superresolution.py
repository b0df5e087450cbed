"""Superresolution networks: neural-render features -> final RGB image.

Capability equivalent of the reference SR stack
(`/root/reference/g_nerf/training/superresolution.py`): StyleGAN2
SynthesisBlocks conditioned on the LAST w (repeated x3 per block), with a
torch-parity bilinear+antialias interpolation between stages. All variants
are provided:

  SuperresolutionHybrid8XDC  — FFHQ/AFHQ 512^2, the shipped-checkpoint one
                               (reference `superresolution.py:267-303`)
  SuperresolutionHybrid8X    — EG3D-style 512^2 (reference `:402-430`; the
                               reference file defines it twice — the later
                               definition wins — we keep only that one)
  SuperresolutionHybrid4X    — 256^2 (reference `:62-88`)
  SuperresolutionHybrid2X    — ShapeNet 128^2 (reference `:94-124`)
  SuperresolutionHybridDeepfp32 — legacy 256^2 (reference `:130-156`)
  SuperresolutionHybrid8five / 8seven — deeper 512^2 (reference `:306-399`)

All forwards return (image, image_raw); variants that don't synthesize a
64^2 raw branch return the input rgb as image_raw (API unification — the
reference returns inconsistent arities across variants).

The reference's SynthesisBlockNoUp is our SynthesisBlock with up=1.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..ops.interpolate import interpolate_bilinear
from .stylegan2 import Params, SynthesisBlock


def _block_ws(ws: jax.Array) -> jax.Array:
    """Last w broadcast to the 3 (conv0, conv1, torgb) slots of each block."""
    return jnp.repeat(ws[:, -1:, :], 3, axis=1)


@dataclasses.dataclass(frozen=True)
class _SRBase:
    channels: int
    img_resolution: int
    sr_num_fp16_res: int = 0
    sr_antialias: bool = True
    w_dim: int = 512
    use_noise: bool = True

    @property
    def _clamp(self) -> Optional[float]:
        return 256 if self.sr_num_fp16_res > 0 else None

    def _blk(self, in_ch, out_ch, res, is_last, up=2) -> SynthesisBlock:
        return SynthesisBlock(
            in_channels=in_ch, out_channels=out_ch, w_dim=self.w_dim,
            resolution=res, img_channels=3, is_last=is_last,
            conv_clamp=self._clamp, up=up, use_noise=self.use_noise,
        )

    def init(self, rng: jax.Array) -> Params:
        names = self.block_names()
        keys = jax.random.split(rng, len(names))
        return {n: self.block(n).init(k) for n, k in zip(names, keys)}

    # subclasses define block_names() and block(name)


@dataclasses.dataclass(frozen=True)
class SuperresolutionHybrid8XDC(_SRBase):
    """64^2 feature/rgb -> (512^2 image, 64^2 image_raw); 'DC' = dual
    conditioning via the raw branch. Reference `superresolution.py:267-303`."""

    input_resolution: int = 128

    def __post_init__(self):
        assert self.img_resolution == 512

    def block_names(self):
        return ("block64", "block0", "block1")

    def block(self, name: str) -> SynthesisBlock:
        c = self.channels
        return {
            "block64": self._blk(c, c, 64, is_last=True, up=1),
            "block0": self._blk(c, 256, 256, is_last=False),
            "block1": self._blk(256, 128, 512, is_last=True),
        }[name]

    def apply(self, params: Params, rgb, x, ws, noise_mode="random", rng=None,
              dtype: Any = jnp.float32):
        ws = _block_ws(ws)
        keys = jax.random.split(rng, 3) if rng is not None else (None,) * 3
        x_raw, image_raw = self.block("block64").apply(
            params["block64"], x, rgb, ws, noise_mode=noise_mode, rng=keys[0], dtype=dtype
        )
        if x.shape[-1] != self.input_resolution:
            x = interpolate_bilinear(
                x_raw, self.input_resolution, self.input_resolution,
                antialias=self.sr_antialias,
            )
            rgb = interpolate_bilinear(
                image_raw, self.input_resolution, self.input_resolution,
                antialias=self.sr_antialias,
            )
        else:
            # Reference parity: block64's in-place torgb accumulation aliases
            # rgb to image_raw (reference `superresolution.py:295`, mutation
            # at `networks_stylegan2.py:463`), and its no-interpolate branch
            # keeps the ORIGINAL x (not x_raw) — a shipped quirk we mirror.
            rgb = image_raw
        x, rgb = self.block("block0").apply(
            params["block0"], x, rgb, ws, noise_mode=noise_mode, rng=keys[1], dtype=dtype
        )
        x, rgb = self.block("block1").apply(
            params["block1"], x, rgb, ws, noise_mode=noise_mode, rng=keys[2], dtype=dtype
        )
        return rgb, image_raw


@dataclasses.dataclass(frozen=True)
class SuperresolutionHybrid8X(_SRBase):
    """128^2 -> 512^2, EG3D-style (reference `superresolution.py:402-430`)."""

    input_resolution: int = 128

    def __post_init__(self):
        assert self.img_resolution == 512

    def block_names(self):
        return ("block0", "block1")

    def block(self, name: str) -> SynthesisBlock:
        return {
            "block0": self._blk(self.channels, 128, 256, is_last=False),
            "block1": self._blk(128, 64, 512, is_last=True),
        }[name]

    def apply(self, params: Params, rgb, x, ws, noise_mode="random", rng=None,
              dtype: Any = jnp.float32):
        ws = _block_ws(ws)
        keys = jax.random.split(rng, 2) if rng is not None else (None,) * 2
        image_raw = rgb
        if x.shape[-1] != self.input_resolution:
            x = interpolate_bilinear(x, self.input_resolution, self.input_resolution,
                                     antialias=self.sr_antialias)
            rgb = interpolate_bilinear(rgb, self.input_resolution, self.input_resolution,
                                       antialias=self.sr_antialias)
        x, rgb = self.block("block0").apply(params["block0"], x, rgb, ws,
                                            noise_mode=noise_mode, rng=keys[0], dtype=dtype)
        x, rgb = self.block("block1").apply(params["block1"], x, rgb, ws,
                                            noise_mode=noise_mode, rng=keys[1], dtype=dtype)
        return rgb, image_raw


@dataclasses.dataclass(frozen=True)
class SuperresolutionHybrid4X(_SRBase):
    """-> 256^2 (reference `superresolution.py:62-88`)."""

    input_resolution: int = 128

    def __post_init__(self):
        assert self.img_resolution == 256

    def block_names(self):
        return ("block0", "block1")

    def block(self, name: str) -> SynthesisBlock:
        return {
            "block0": self._blk(self.channels, 128, 128, is_last=False, up=1),
            "block1": self._blk(128, 64, 256, is_last=True),
        }[name]

    def apply(self, params: Params, rgb, x, ws, noise_mode="random", rng=None,
              dtype: Any = jnp.float32):
        ws = _block_ws(ws)
        keys = jax.random.split(rng, 2) if rng is not None else (None,) * 2
        image_raw = rgb
        if x.shape[-1] < self.input_resolution:
            x = interpolate_bilinear(x, self.input_resolution, self.input_resolution,
                                     antialias=self.sr_antialias)
            rgb = interpolate_bilinear(rgb, self.input_resolution, self.input_resolution,
                                       antialias=self.sr_antialias)
        x, rgb = self.block("block0").apply(params["block0"], x, rgb, ws,
                                            noise_mode=noise_mode, rng=keys[0], dtype=dtype)
        x, rgb = self.block("block1").apply(params["block1"], x, rgb, ws,
                                            noise_mode=noise_mode, rng=keys[1], dtype=dtype)
        return rgb, image_raw


@dataclasses.dataclass(frozen=True)
class SuperresolutionHybrid2X(_SRBase):
    """ShapeNet: 64^2 -> (128^2, 64^2 raw) (reference `superresolution.py:94-124`)."""

    input_resolution: int = 64

    def __post_init__(self):
        assert self.img_resolution == 128

    def block_names(self):
        return ("block64", "block0", "block1")

    def block(self, name: str) -> SynthesisBlock:
        c = self.channels
        return {
            "block64": self._blk(c, c, 64, is_last=True, up=1),
            "block0": self._blk(c, 256, 128, is_last=False),
            "block1": self._blk(256, 128, 128, is_last=True, up=1),
        }[name]

    def apply(self, params: Params, rgb, x, ws, noise_mode="random", rng=None,
              dtype: Any = jnp.float32):
        ws = _block_ws(ws)
        keys = jax.random.split(rng, 3) if rng is not None else (None,) * 3
        x_raw, image_raw = self.block("block64").apply(
            params["block64"], x, rgb, ws, noise_mode=noise_mode, rng=keys[0], dtype=dtype
        )
        # block0's rgb input is image_raw, NOT the original rgb: the
        # reference's in-place `img.add_` aliases the two after block64
        # (reference `superresolution.py:121-122` with the mutation at
        # `networks_stylegan2.py:463`), so its block0 sees the accumulated
        # raw image. Verified against the reference by golden test.
        x, rgb = self.block("block0").apply(params["block0"], x_raw, image_raw, ws,
                                            noise_mode=noise_mode, rng=keys[1], dtype=dtype)
        x, rgb = self.block("block1").apply(params["block1"], x, rgb, ws,
                                            noise_mode=noise_mode, rng=keys[2], dtype=dtype)
        return rgb, image_raw


@dataclasses.dataclass(frozen=True)
class SuperresolutionHybridDeepfp32(_SRBase):
    """Legacy 256^2 variant (reference `superresolution.py:130-156`)."""

    input_resolution: int = 128

    def __post_init__(self):
        assert self.img_resolution == 256

    def block_names(self):
        return ("block0", "block1")

    def block(self, name: str) -> SynthesisBlock:
        return {
            "block0": self._blk(self.channels, 128, 128, is_last=False, up=1),
            "block1": self._blk(128, 64, 256, is_last=True),
        }[name]

    def apply(self, params: Params, rgb, x, ws, noise_mode="random", rng=None,
              dtype: Any = jnp.float32):
        ws = _block_ws(ws)
        keys = jax.random.split(rng, 2) if rng is not None else (None,) * 2
        image_raw = rgb
        if x.shape[-1] < self.input_resolution:
            x = interpolate_bilinear(x, self.input_resolution, self.input_resolution)
            rgb = interpolate_bilinear(rgb, self.input_resolution, self.input_resolution)
        x, rgb = self.block("block0").apply(params["block0"], x, rgb, ws,
                                            noise_mode=noise_mode, rng=keys[0], dtype=dtype)
        x, rgb = self.block("block1").apply(params["block1"], x, rgb, ws,
                                            noise_mode=noise_mode, rng=keys[1], dtype=dtype)
        return rgb, image_raw


@dataclasses.dataclass(frozen=True)
class SuperresolutionHybrid8five(_SRBase):
    """Deeper 512^2 variant (reference `superresolution.py:306-348`)."""

    input_resolution: int = 128

    def __post_init__(self):
        assert self.img_resolution == 512

    def block_names(self):
        return ("block64", "block0", "block1", "block2", "block3")

    def block(self, name: str) -> SynthesisBlock:
        c = self.channels
        return {
            "block64": self._blk(c, c, 64, is_last=True, up=1),
            "block0": self._blk(c, 512, 128, is_last=False, up=1),
            "block1": self._blk(512, 256, 128, is_last=False, up=1),
            "block2": self._blk(256, 128, 256, is_last=False),
            "block3": self._blk(128, 64, 512, is_last=True),
        }[name]

    def apply(self, params: Params, rgb, x, ws, noise_mode="random", rng=None,
              dtype: Any = jnp.float32):
        ws = _block_ws(ws)
        names = self.block_names()
        keys = jax.random.split(rng, len(names)) if rng is not None else (None,) * len(names)
        x_raw, image_raw = self.block("block64").apply(
            params["block64"], x, rgb, ws, noise_mode=noise_mode, rng=keys[0], dtype=dtype
        )
        if x.shape[-1] != self.input_resolution:
            x = interpolate_bilinear(x_raw, self.input_resolution, self.input_resolution,
                                     antialias=self.sr_antialias)
            rgb = interpolate_bilinear(image_raw, self.input_resolution, self.input_resolution,
                                       antialias=self.sr_antialias)
        else:
            rgb = image_raw  # reference aliasing: block0 sees image_raw
        for i, name in enumerate(names[1:], start=1):
            x, rgb = self.block(name).apply(params[name], x, rgb, ws,
                                            noise_mode=noise_mode, rng=keys[i], dtype=dtype)
        return rgb, image_raw


@dataclasses.dataclass(frozen=True)
class SuperresolutionHybrid8seven(_SRBase):
    """Deepest 512^2 variant (reference `superresolution.py:350-399`)."""

    input_resolution: int = 128

    def __post_init__(self):
        assert self.img_resolution == 512

    def block_names(self):
        return ("block64", "block0", "block1", "block2", "block3", "block4", "block5")

    def block(self, name: str) -> SynthesisBlock:
        c = self.channels
        return {
            "block64": self._blk(c, c, 64, is_last=True, up=1),
            "block0": self._blk(c, 512, 128, is_last=False, up=1),
            "block1": self._blk(512, 256, 128, is_last=False, up=1),
            "block2": self._blk(256, 256, 256, is_last=False),
            "block3": self._blk(256, 128, 256, is_last=False, up=1),
            "block4": self._blk(128, 128, 512, is_last=False),
            "block5": self._blk(128, 64, 512, is_last=True, up=1),
        }[name]

    def apply(self, params: Params, rgb, x, ws, noise_mode="random", rng=None,
              dtype: Any = jnp.float32):
        ws = _block_ws(ws)
        names = self.block_names()
        keys = jax.random.split(rng, len(names)) if rng is not None else (None,) * len(names)
        x_raw, image_raw = self.block("block64").apply(
            params["block64"], x, rgb, ws, noise_mode=noise_mode, rng=keys[0], dtype=dtype
        )
        if x.shape[-1] != self.input_resolution:
            x = interpolate_bilinear(x_raw, self.input_resolution, self.input_resolution,
                                     antialias=self.sr_antialias)
            rgb = interpolate_bilinear(image_raw, self.input_resolution, self.input_resolution,
                                       antialias=self.sr_antialias)
        else:
            rgb = image_raw  # reference aliasing: block0 sees image_raw
        for i, name in enumerate(names[1:], start=1):
            x, rgb = self.block(name).apply(params[name], x, rgb, ws,
                                            noise_mode=noise_mode, rng=keys[i], dtype=dtype)
        return rgb, image_raw


SR_REGISTRY = {
    "SuperresolutionHybrid8XDC": SuperresolutionHybrid8XDC,
    "SuperresolutionHybrid8X": SuperresolutionHybrid8X,
    "SuperresolutionHybrid4X": SuperresolutionHybrid4X,
    "SuperresolutionHybrid2X": SuperresolutionHybrid2X,
    "SuperresolutionHybridDeepfp32": SuperresolutionHybridDeepfp32,
    "SuperresolutionHybrid8five": SuperresolutionHybrid8five,
    "SuperresolutionHybrid8seven": SuperresolutionHybrid8seven,
}


def make_superresolution(name: str, **kwargs):
    """Resolve an SR module by (reference-compatible) class name."""
    short = name.split(".")[-1]
    return SR_REGISTRY[short](**kwargs)
