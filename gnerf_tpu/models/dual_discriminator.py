"""EG3D dual-discrimination discriminators.

Capability equivalent of the reference
`/root/reference/g_nerf/training/dual_discriminator.py`: the EG3D trick of
discriminating the final image CONCATENATED with the (upsampled) raw
neural-render image, so G cannot cheat the superresolution. G-NeRF's live
trainer uses the plain depth Discriminator instead (`train.py:303`), but
the full EG3D objective (loss.py spec) needs these.

Functional re-design on top of the stylegan2 building blocks; the
`raw_fade` schedule of DummyDualDiscriminator becomes an explicit argument
(module state doesn't exist in the functional world)."""

from __future__ import annotations

import dataclasses
from typing import Mapping, Optional, Union

import jax
import jax.numpy as jnp

from ..ops.interpolate import interpolate_bilinear
from ..ops.upfirdn2d import downsample2d, setup_filter, upsample2d
from .stylegan2 import Discriminator, Params


def filtered_resizing(
    image: jax.Array,
    size: int,
    f: Optional[jax.Array] = None,
    filter_mode: Union[str, float] = "antialiased",
) -> jax.Array:
    """Resize raw images to the final-image resolution
    (reference `dual_discriminator.py:86-102`)."""
    if filter_mode == "antialiased":
        return interpolate_bilinear(image, size, size, antialias=True)
    if filter_mode == "classic":
        x = upsample2d(image, f, up=2)
        x = interpolate_bilinear(x, size * 2 + 2, size * 2 + 2, antialias=False)
        return downsample2d(x, f, down=2, flip_filter=True, padding=-1)
    if filter_mode == "none":
        return interpolate_bilinear(image, size, size, antialias=False)
    assert isinstance(filter_mode, float) and 0 < filter_mode < 1
    filtered = interpolate_bilinear(image, size, size, antialias=True)
    aliased = interpolate_bilinear(image, size, size, antialias=False)
    return (1 - filter_mode) * aliased + filter_mode * filtered


@dataclasses.dataclass(frozen=True)
class SingleDiscriminator:
    """Plain StyleGAN2 D over the final image only
    (reference `dual_discriminator.py:21-82`)."""

    c_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = 256
    mbstd_group_size: Optional[int] = 4

    @property
    def _d(self) -> Discriminator:
        return Discriminator(
            c_dim=self.c_dim, img_resolution=self.img_resolution,
            img_channels=self.img_channels, channel_base=self.channel_base,
            channel_max=self.channel_max, conv_clamp=self.conv_clamp,
            mbstd_group_size=self.mbstd_group_size,
        )

    def init(self, rng: jax.Array) -> Params:
        return self._d.init(rng)

    def apply(self, params: Params, img: Mapping[str, jax.Array], c=None,
              dtype=jnp.float32) -> jax.Array:
        return self._d.apply(params, img["image"], c, dtype=dtype)


@dataclasses.dataclass(frozen=True)
class DualDiscriminator:
    """EG3D dual discrimination: concat(image, resized image_raw) -> 2x
    channels (reference `dual_discriminator.py:107-176`)."""

    c_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = 256
    mbstd_group_size: Optional[int] = 4
    disc_c_noise: float = 0.0
    filter_mode: Union[str, float] = "antialiased"

    @property
    def _d(self) -> Discriminator:
        return Discriminator(
            c_dim=self.c_dim, img_resolution=self.img_resolution,
            img_channels=self.img_channels * 2, channel_base=self.channel_base,
            channel_max=self.channel_max, conv_clamp=self.conv_clamp,
            mbstd_group_size=self.mbstd_group_size,
        )

    def init(self, rng: jax.Array) -> Params:
        return self._d.init(rng)

    def apply(self, params: Params, img: Mapping[str, jax.Array], c=None,
              rng: Optional[jax.Array] = None, dtype=jnp.float32) -> jax.Array:
        f = setup_filter([1, 3, 3, 1])
        image_raw = filtered_resizing(
            img["image_raw"], size=img["image"].shape[-1], f=f,
            filter_mode=self.filter_mode,
        )
        x = jnp.concatenate([img["image"], image_raw], axis=1)
        if self.c_dim > 0 and self.disc_c_noise > 0:
            assert rng is not None, "disc_c_noise needs an rng key"
            c = c + jax.random.normal(rng, c.shape) * c.std(axis=0) * self.disc_c_noise
        return self._d.apply(params, x, c, dtype=dtype)


@dataclasses.dataclass(frozen=True)
class DummyDualDiscriminator:
    """Dual D whose raw branch fades out over training
    (reference `dual_discriminator.py:181-249`). `raw_fade` is passed
    explicitly: fade = max(0, 1 - cur_nimg / 500000)."""

    c_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = 256
    mbstd_group_size: Optional[int] = 4

    @property
    def _d(self) -> Discriminator:
        return Discriminator(
            c_dim=self.c_dim, img_resolution=self.img_resolution,
            img_channels=self.img_channels * 2, channel_base=self.channel_base,
            channel_max=self.channel_max, conv_clamp=self.conv_clamp,
            mbstd_group_size=self.mbstd_group_size,
        )

    def init(self, rng: jax.Array) -> Params:
        return self._d.init(rng)

    def apply(self, params: Params, img: Mapping[str, jax.Array], c=None,
              raw_fade: float = 1.0, dtype=jnp.float32) -> jax.Array:
        f = setup_filter([1, 3, 3, 1])
        image_raw = filtered_resizing(
            img["image_raw"], size=img["image"].shape[-1], f=f
        ) * raw_fade
        x = jnp.concatenate([img["image"], image_raw], axis=1)
        return self._d.apply(params, x, c, dtype=dtype)
