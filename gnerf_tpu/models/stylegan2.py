"""StyleGAN2 networks, re-designed as pure-functional JAX modules.

Capability equivalent of the reference
`/root/reference/g_nerf/training/networks_stylegan2.py` (mapping network,
synthesis network with modulated convolutions, discriminator, minibatch-std)
— but NOT a port of its nn.Module graph: every module here is a frozen
config dataclass with `init(rng) -> params` (nested dict pytree) and
`apply(params, ...)`, so the whole generator jits into a single XLA program
and shards with pjit.

TPU-specific design choices:
  * Modulated conv uses the scale-activations formulation (modulate input,
    plain conv, demodulate output) — mathematically identical to the
    reference's grouped-conv "fused" path (`networks_stylegan2.py:88-98`)
    but keeps a single large conv per layer for the MXU instead of
    batch-many small groups.
  * fp16-block emulation is a `dtype` knob (bf16 on TPU); the reference's
    per-resolution fp16 + clamp(+-256) policy maps to conv_clamp, which is
    honored in any dtype.
  * Param-tree keys mirror the torch state_dict names (fc0, b4.conv1, ...)
    so checkpoint conversion is a mechanical rename.

Known reference defect NOT replicated: `Generator.forward` passing an
undefined `ws` into mapping (`networks_stylegan2.py:555`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bias_act import activation_funcs, bias_act
from ..ops.conv2d_resample import conv2d_resample
from ..ops.precision import dot_precision
from ..ops.upfirdn2d import downsample2d, setup_filter, upsample2d

Params = dict


def normalize_2nd_moment(x: jax.Array, axis: int = 1, eps: float = 1e-8) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


def modulated_conv2d(
    x: jax.Array,                    # [N, C_in, H, W]
    weight: jax.Array,               # [C_out, C_in, kh, kw]
    styles: jax.Array,               # [N, C_in]
    noise: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter: Optional[jax.Array] = None,
    demodulate: bool = True,
    flip_weight: bool = True,
) -> jax.Array:
    """Style-modulated convolution (scale-activations formulation).

    Equivalent to the reference non-fused path (`networks_stylegan2.py:77-86`),
    which is itself mathematically identical to the grouped fused path at
    inference: scale input channels by styles, convolve once, rescale output
    channels by the demodulation coefficients.
    """
    batch = x.shape[0]
    dcoefs = None
    if demodulate:
        w = weight[None] * styles[:, None, :, None, None]  # [N, O, I, kh, kw]
        dcoefs = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=(2, 3, 4)) + 1e-8)  # [N, O]

    x = x * styles.astype(x.dtype)[:, :, None, None]
    x = conv2d_resample(
        x, weight.astype(x.dtype), f=resample_filter, up=up, down=down,
        padding=padding, flip_weight=flip_weight,
    )
    if demodulate and noise is not None:
        x = x * dcoefs.astype(x.dtype)[:, :, None, None] + noise.astype(x.dtype)
    elif demodulate:
        x = x * dcoefs.astype(x.dtype)[:, :, None, None]
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x


# ---------------------------------------------------------------------------
# Layers


@dataclasses.dataclass(frozen=True)
class FullyConnectedLayer:
    """Equalized-LR dense layer (reference `networks_stylegan2.py:102-137`)."""

    in_features: int
    out_features: int
    bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0

    def init(self, rng: jax.Array) -> Params:
        p = {
            "weight": jax.random.normal(rng, (self.out_features, self.in_features))
            / self.lr_multiplier
        }
        if self.bias:
            p["bias"] = jnp.full((self.out_features,), float(self.bias_init))
        return p

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        weight_gain = self.lr_multiplier / math.sqrt(self.in_features)
        w = params["weight"].astype(x.dtype) * weight_gain
        x = jnp.matmul(x, w.T, precision=dot_precision(x.dtype))
        b = None
        if self.bias:
            b = params["bias"] * self.lr_multiplier
        return bias_act(x, b, act=self.activation)


@dataclasses.dataclass(frozen=True)
class Conv2dLayer:
    """Non-modulated conv with optional resampling
    (reference `networks_stylegan2.py:141-195`)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    def init(self, rng: jax.Array) -> Params:
        k = self.kernel_size
        p = {"weight": jax.random.normal(rng, (self.out_channels, self.in_channels, k, k))}
        if self.bias:
            p["bias"] = jnp.zeros((self.out_channels,))
        return p

    def apply(self, params: Params, x: jax.Array, gain: float = 1.0) -> jax.Array:
        weight_gain = 1 / math.sqrt(self.in_channels * self.kernel_size ** 2)
        w = params["weight"] * weight_gain
        f = setup_filter(list(self.resample_filter)) if (self.up > 1 or self.down > 1) else None
        flip_weight = self.up == 1
        x = conv2d_resample(
            x, w.astype(x.dtype), f=f, up=self.up, down=self.down,
            padding=self.kernel_size // 2, flip_weight=flip_weight,
        )
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        b = params.get("bias")
        return bias_act(x, b, act=self.activation, gain=act_gain, clamp=act_clamp)


@dataclasses.dataclass(frozen=True)
class MappingNetwork:
    """z (+ embedded c) -> broadcast w vector, with truncation support
    (reference `networks_stylegan2.py:199-275`). The w_avg EMA lives in the
    param tree (non-trainable leaf, updated by the train loop)."""

    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: Optional[int]
    num_layers: int = 8
    embed_features: Optional[int] = None
    layer_features: Optional[int] = None
    activation: str = "lrelu"
    lr_multiplier: float = 0.01
    w_avg_beta: Optional[float] = 0.998

    def _features(self):
        embed = self.embed_features if self.embed_features is not None else self.w_dim
        if self.c_dim == 0:
            embed = 0
        layer = self.layer_features if self.layer_features is not None else self.w_dim
        return [self.z_dim + embed] + [layer] * (self.num_layers - 1) + [self.w_dim], embed

    def _fcs(self):
        feats, _ = self._features()
        return [
            FullyConnectedLayer(
                feats[i], feats[i + 1], activation=self.activation,
                lr_multiplier=self.lr_multiplier,
            )
            for i in range(self.num_layers)
        ]

    def init(self, rng: jax.Array) -> Params:
        feats, embed = self._features()
        keys = jax.random.split(rng, self.num_layers + 1)
        p: Params = {}
        if self.c_dim > 0:
            p["embed"] = FullyConnectedLayer(self.c_dim, embed).init(keys[-1])
        for i, fc in enumerate(self._fcs()):
            p[f"fc{i}"] = fc.init(keys[i])
        if self.num_ws is not None and self.w_avg_beta is not None:
            p["w_avg"] = jnp.zeros((self.w_dim,))
        return p

    def apply(
        self,
        params: Params,
        z: Optional[jax.Array],
        c: Optional[jax.Array],
        truncation_psi: float = 1.0,
        truncation_cutoff: Optional[int] = None,
    ) -> jax.Array:
        x = None
        if self.z_dim > 0:
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if self.c_dim > 0:
            y = FullyConnectedLayer(self.c_dim, self._features()[1]).apply(
                params["embed"], c.astype(jnp.float32)
            )
            y = normalize_2nd_moment(y)
            x = jnp.concatenate([x, y], axis=1) if x is not None else y
        for i, fc in enumerate(self._fcs()):
            x = fc.apply(params[f"fc{i}"], x)
        if self.num_ws is not None:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)
        if truncation_psi != 1:
            w_avg = params["w_avg"]
            if self.num_ws is None or truncation_cutoff is None:
                x = w_avg + (x - w_avg) * truncation_psi
            else:
                head = w_avg + (x[:, :truncation_cutoff] - w_avg) * truncation_psi
                x = jnp.concatenate([head, x[:, truncation_cutoff:]], axis=1)
        return x

    def updated_w_avg(self, params: Params, ws: jax.Array) -> jax.Array:
        """New w_avg EMA leaf from a batch of final-layer w's (pre-broadcast)."""
        batch_mean = jax.lax.stop_gradient(ws.mean(axis=0))
        return batch_mean + (params["w_avg"] - batch_mean) * self.w_avg_beta


@dataclasses.dataclass(frozen=True)
class SynthesisLayer:
    """Modulated conv + per-pixel noise + biased activation
    (reference `networks_stylegan2.py:279-339`)."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    @property
    def affine(self):
        return FullyConnectedLayer(self.w_dim, self.in_channels, bias_init=1)

    def init(self, rng: jax.Array) -> Params:
        k_affine, k_weight, k_noise = jax.random.split(rng, 3)
        k = self.kernel_size
        p = {
            "affine": self.affine.init(k_affine),
            "weight": jax.random.normal(
                k_weight, (self.out_channels, self.in_channels, k, k)
            ),
            "bias": jnp.zeros((self.out_channels,)),
        }
        if self.use_noise:
            p["noise_const"] = jax.random.normal(
                k_noise, (self.resolution, self.resolution)
            )
            p["noise_strength"] = jnp.zeros(())
        return p

    def apply(
        self,
        params: Params,
        x: jax.Array,
        w: jax.Array,
        noise_mode: str = "random",
        gain: float = 1.0,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        assert noise_mode in ("random", "const", "none")
        styles = self.affine.apply(params["affine"], w)
        noise = None
        if self.use_noise and noise_mode == "random":
            assert rng is not None, "noise_mode='random' requires an rng key"
            noise = (
                jax.random.normal(rng, (x.shape[0], 1, self.resolution, self.resolution))
                * params["noise_strength"]
            )
        if self.use_noise and noise_mode == "const":
            noise = params["noise_const"] * params["noise_strength"]
        flip_weight = self.up == 1
        f = setup_filter(list(self.resample_filter)) if self.up > 1 else None
        x = modulated_conv2d(
            x, params["weight"], styles, noise=noise, up=self.up,
            padding=self.kernel_size // 2, resample_filter=f, flip_weight=flip_weight,
        )
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, params["bias"], act=self.activation, gain=act_gain, clamp=act_clamp)


@dataclasses.dataclass(frozen=True)
class ToRGBLayer:
    """1x1 modulated conv to image channels, no demodulation
    (reference `networks_stylegan2.py:343-364`)."""

    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = None

    @property
    def affine(self):
        return FullyConnectedLayer(self.w_dim, self.in_channels, bias_init=1)

    def init(self, rng: jax.Array) -> Params:
        k_affine, k_weight = jax.random.split(rng)
        k = self.kernel_size
        return {
            "affine": self.affine.init(k_affine),
            "weight": jax.random.normal(
                k_weight, (self.out_channels, self.in_channels, k, k)
            ),
            "bias": jnp.zeros((self.out_channels,)),
        }

    def apply(self, params: Params, x: jax.Array, w: jax.Array) -> jax.Array:
        weight_gain = 1 / math.sqrt(self.in_channels * self.kernel_size ** 2)
        styles = self.affine.apply(params["affine"], w) * weight_gain
        x = modulated_conv2d(x, params["weight"], styles, demodulate=False)
        return bias_act(x, params["bias"], clamp=self.conv_clamp)


@dataclasses.dataclass(frozen=True)
class SynthesisBlock:
    """One resolution stage: [conv0 up] + conv1 + skip-accumulated ToRGB
    (reference `networks_stylegan2.py:368-470`). `up=1` gives the no-upsample
    variant used by the superresolution stack."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    architecture: str = "skip"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = 256
    up: int = 2
    use_noise: bool = True

    def __post_init__(self):
        assert self.architecture in ("orig", "skip", "resnet")

    @property
    def num_conv(self) -> int:
        return 1 if self.in_channels == 0 else 2

    @property
    def num_torgb(self) -> int:
        return 1 if (self.is_last or self.architecture == "skip") else 0

    def _conv0(self):
        return SynthesisLayer(
            self.in_channels, self.out_channels, w_dim=self.w_dim,
            resolution=self.resolution, up=self.up,
            resample_filter=self.resample_filter, conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
        )

    def _conv1(self):
        return SynthesisLayer(
            self.out_channels, self.out_channels, w_dim=self.w_dim,
            resolution=self.resolution, conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
        )

    def _torgb(self):
        return ToRGBLayer(
            self.out_channels, self.img_channels, w_dim=self.w_dim,
            conv_clamp=self.conv_clamp,
        )

    def _skip(self):
        return Conv2dLayer(
            self.in_channels, self.out_channels, kernel_size=1, bias=False,
            up=2, resample_filter=self.resample_filter,
        )

    def init(self, rng: jax.Array) -> Params:
        keys = jax.random.split(rng, 5)
        p: Params = {}
        if self.in_channels == 0:
            p["const"] = jax.random.normal(
                keys[0], (self.out_channels, self.resolution, self.resolution)
            )
        else:
            p["conv0"] = self._conv0().init(keys[0])
        p["conv1"] = self._conv1().init(keys[1])
        if self.num_torgb:
            p["torgb"] = self._torgb().init(keys[2])
        if self.in_channels != 0 and self.architecture == "resnet":
            p["skip"] = self._skip().init(keys[3])
        return p

    def apply(
        self,
        params: Params,
        x: Optional[jax.Array],
        img: Optional[jax.Array],
        ws: jax.Array,  # [N, num_conv + num_torgb, w_dim]
        noise_mode: str = "random",
        rng: Optional[jax.Array] = None,
        dtype: Any = jnp.float32,
    ) -> tuple[jax.Array, Optional[jax.Array]]:
        w_idx = 0

        def next_w():
            nonlocal w_idx
            w = ws[:, w_idx]
            w_idx += 1
            return w

        keys = jax.random.split(rng, 2) if rng is not None else (None, None)

        if self.in_channels == 0:
            x = jnp.broadcast_to(
                params["const"].astype(dtype)[None],
                (ws.shape[0],) + params["const"].shape,
            )
        else:
            x = x.astype(dtype)

        if self.in_channels == 0:
            x = self._conv1().apply(params["conv1"], x, next_w(),
                                    noise_mode=noise_mode, rng=keys[0])
        elif self.architecture == "resnet":
            y = self._skip().apply(params["skip"], x, gain=math.sqrt(0.5))
            x = self._conv0().apply(params["conv0"], x, next_w(),
                                    noise_mode=noise_mode, rng=keys[0])
            x = self._conv1().apply(params["conv1"], x, next_w(),
                                    noise_mode=noise_mode, gain=math.sqrt(0.5), rng=keys[1])
            x = y + x
        else:
            x = self._conv0().apply(params["conv0"], x, next_w(),
                                    noise_mode=noise_mode, rng=keys[0])
            x = self._conv1().apply(params["conv1"], x, next_w(),
                                    noise_mode=noise_mode, rng=keys[1])

        if img is not None and self.up == 2:
            img = upsample2d(img, setup_filter(list(self.resample_filter)))
        if self.num_torgb:
            y = self._torgb().apply(params["torgb"], x, next_w())
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y
        return x, img


@dataclasses.dataclass(frozen=True)
class SynthesisNetwork:
    """Progressive 4x4 -> img_resolution stack of SynthesisBlocks
    (reference `networks_stylegan2.py:474-529`)."""

    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: Optional[float] = 256
    architecture: str = "skip"
    use_noise: bool = True

    @property
    def block_resolutions(self):
        log2 = int(math.log2(self.img_resolution))
        return [2 ** i for i in range(2, log2 + 1)]

    def _channels(self, res):
        return min(self.channel_base // res, self.channel_max)

    def _block(self, res) -> SynthesisBlock:
        return SynthesisBlock(
            in_channels=self._channels(res // 2) if res > 4 else 0,
            out_channels=self._channels(res),
            w_dim=self.w_dim,
            resolution=res,
            img_channels=self.img_channels,
            is_last=(res == self.img_resolution),
            conv_clamp=self.conv_clamp,
            architecture=self.architecture,
            use_noise=self.use_noise,
        )

    @property
    def num_ws(self) -> int:
        n = 0
        for res in self.block_resolutions:
            b = self._block(res)
            n += b.num_conv
            if b.is_last:
                n += b.num_torgb
        return n

    def init(self, rng: jax.Array) -> Params:
        keys = jax.random.split(rng, len(self.block_resolutions))
        return {
            f"b{res}": self._block(res).init(k)
            for res, k in zip(self.block_resolutions, keys)
        }

    def apply(
        self,
        params: Params,
        ws: jax.Array,  # [N, num_ws, w_dim]
        noise_mode: str = "random",
        rng: Optional[jax.Array] = None,
        dtype: Any = jnp.float32,
    ) -> jax.Array:
        ws = ws.astype(jnp.float32)
        x = img = None
        w_idx = 0
        keys = (
            jax.random.split(rng, len(self.block_resolutions))
            if rng is not None
            else [None] * len(self.block_resolutions)
        )
        for res, key in zip(self.block_resolutions, keys):
            block = self._block(res)
            cur_ws = ws[:, w_idx : w_idx + block.num_conv + block.num_torgb]
            x, img = block.apply(
                params[f"b{res}"], x, img, cur_ws,
                noise_mode=noise_mode, rng=key, dtype=dtype,
            )
            w_idx += block.num_conv
        return img


@dataclasses.dataclass(frozen=True)
class Generator:
    """Mapping + synthesis (reference `networks_stylegan2.py:533-557`)."""

    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int
    mapping_layers: int = 8
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = 256
    use_noise: bool = True
    # 'orig' is reachable only through TF-era pickles (per-lod ToRGB,
    # reference `legacy.py:163-167`); the modern lineage is all 'skip'.
    architecture: str = "skip"

    @property
    def synthesis(self) -> SynthesisNetwork:
        return SynthesisNetwork(
            w_dim=self.w_dim, img_resolution=self.img_resolution,
            img_channels=self.img_channels, channel_base=self.channel_base,
            channel_max=self.channel_max, conv_clamp=self.conv_clamp,
            use_noise=self.use_noise, architecture=self.architecture,
        )

    @property
    def num_ws(self) -> int:
        return self.synthesis.num_ws

    @property
    def mapping(self) -> MappingNetwork:
        return MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=self.num_ws, num_layers=self.mapping_layers,
        )

    def init(self, rng: jax.Array) -> Params:
        k_map, k_syn = jax.random.split(rng)
        return {
            "mapping": self.mapping.init(k_map),
            "synthesis": self.synthesis.init(k_syn),
        }

    def apply(
        self, params: Params, z, c, truncation_psi=1.0, truncation_cutoff=None,
        noise_mode="random", rng=None, dtype=jnp.float32,
    ) -> jax.Array:
        ws = self.mapping.apply(
            params["mapping"], z, c,
            truncation_psi=truncation_psi, truncation_cutoff=truncation_cutoff,
        )
        return self.synthesis.apply(
            params["synthesis"], ws, noise_mode=noise_mode, rng=rng, dtype=dtype
        )


# ---------------------------------------------------------------------------
# Discriminator


@dataclasses.dataclass(frozen=True)
class DiscriminatorBlock:
    """Downsampling resnet block (reference `networks_stylegan2.py:561-646`)."""

    in_channels: int
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    def _fromrgb(self):
        return Conv2dLayer(
            self.img_channels, self.tmp_channels, kernel_size=1,
            activation=self.activation, conv_clamp=self.conv_clamp,
        )

    def _conv0(self):
        return Conv2dLayer(
            self.tmp_channels, self.tmp_channels, kernel_size=3,
            activation=self.activation, conv_clamp=self.conv_clamp,
        )

    def _conv1(self):
        return Conv2dLayer(
            self.tmp_channels, self.out_channels, kernel_size=3,
            activation=self.activation, down=2,
            resample_filter=self.resample_filter, conv_clamp=self.conv_clamp,
        )

    def _skip(self):
        return Conv2dLayer(
            self.tmp_channels, self.out_channels, kernel_size=1, bias=False,
            down=2, resample_filter=self.resample_filter,
        )

    def init(self, rng: jax.Array) -> Params:
        keys = jax.random.split(rng, 4)
        p: Params = {}
        if self.in_channels == 0 or self.architecture == "skip":
            p["fromrgb"] = self._fromrgb().init(keys[0])
        p["conv0"] = self._conv0().init(keys[1])
        p["conv1"] = self._conv1().init(keys[2])
        if self.architecture == "resnet":
            p["skip"] = self._skip().init(keys[3])
        return p

    def apply(self, params: Params, x, img, dtype=jnp.float32):
        if x is not None:
            x = x.astype(dtype)
        if self.in_channels == 0 or self.architecture == "skip":
            img = img.astype(dtype)
            y = self._fromrgb().apply(params["fromrgb"], img)
            x = x + y if x is not None else y
            img = (
                downsample2d(img, setup_filter(list(self.resample_filter)))
                if self.architecture == "skip"
                else None
            )
        if self.architecture == "resnet":
            y = self._skip().apply(params["skip"], x, gain=math.sqrt(0.5))
            x = self._conv0().apply(params["conv0"], x)
            x = self._conv1().apply(params["conv1"], x, gain=math.sqrt(0.5))
            x = y + x
        else:
            x = self._conv0().apply(params["conv0"], x)
            x = self._conv1().apply(params["conv1"], x)
        return x, img


def minibatch_std(x: jax.Array, group_size: Optional[int], num_channels: int = 1) -> jax.Array:
    """Append cross-sample std-dev channels
    (reference MinibatchStdLayer, `networks_stylegan2.py:651-672`)."""
    N, C, H, W = x.shape
    G = min(group_size, N) if group_size is not None else N
    F_ = num_channels
    c = C // F_
    y = x.reshape(G, -1, F_, c, H, W)
    y = y - y.mean(axis=0)
    y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = y.mean(axis=(2, 3, 4))
    y = y.reshape(-1, F_, 1, 1)
    y = jnp.tile(y, (G, 1, H, W))
    return jnp.concatenate([x, y], axis=1)


@dataclasses.dataclass(frozen=True)
class DiscriminatorEpilogue:
    """4x4 head: mbstd + conv + fc + out (+ cmap projection)
    (reference `networks_stylegan2.py:680-736`)."""

    in_channels: int
    cmap_dim: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    mbstd_group_size: Optional[int] = 4
    mbstd_num_channels: int = 1
    activation: str = "lrelu"
    conv_clamp: Optional[float] = None

    def _conv(self):
        return Conv2dLayer(
            self.in_channels + self.mbstd_num_channels, self.in_channels,
            kernel_size=3, activation=self.activation, conv_clamp=self.conv_clamp,
        )

    def _fc(self):
        return FullyConnectedLayer(
            self.in_channels * self.resolution ** 2, self.in_channels,
            activation=self.activation,
        )

    def _out(self):
        return FullyConnectedLayer(
            self.in_channels, 1 if self.cmap_dim == 0 else self.cmap_dim
        )

    def _fromrgb(self):
        return Conv2dLayer(
            self.img_channels, self.in_channels, kernel_size=1,
            activation=self.activation,
        )

    def init(self, rng: jax.Array) -> Params:
        keys = jax.random.split(rng, 4)
        p: Params = {
            "conv": self._conv().init(keys[0]),
            "fc": self._fc().init(keys[1]),
            "out": self._out().init(keys[2]),
        }
        if self.architecture == "skip":
            p["fromrgb"] = self._fromrgb().init(keys[3])
        return p

    def apply(self, params: Params, x, img, cmap):
        x = x.astype(jnp.float32)
        if self.architecture == "skip":
            x = x + self._fromrgb().apply(params["fromrgb"], img.astype(jnp.float32))
        if self.mbstd_num_channels > 0:
            x = minibatch_std(x, self.mbstd_group_size, self.mbstd_num_channels)
        x = self._conv().apply(params["conv"], x)
        x = self._fc().apply(params["fc"], x.reshape(x.shape[0], -1))
        x = self._out().apply(params["out"], x)
        if self.cmap_dim > 0:
            x = jnp.sum(x * cmap, axis=1, keepdims=True) * (1 / math.sqrt(self.cmap_dim))
        return x


@dataclasses.dataclass(frozen=True)
class Discriminator:
    """StyleGAN2 discriminator (reference `networks_stylegan2.py:740-799`).
    G-NeRF instantiates it with img_channels=1 on 64x64 depth maps
    (reference `train.py:303`, `training_loop.py:183`)."""

    c_dim: int
    img_resolution: int
    img_channels: int
    architecture: str = "resnet"
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = 256
    cmap_dim: Optional[int] = None
    mbstd_group_size: Optional[int] = 4
    # Conditioning-mapping depth. The reference leaves MappingNetwork's
    # default (8, `networks_stylegan2.py:782` with mapping_kwargs={});
    # TF-era pickles used 0 layers (LabelEmbed only, `legacy.py:239`).
    mapping_layers: int = 8

    @property
    def block_resolutions(self):
        log2 = int(math.log2(self.img_resolution))
        return [2 ** i for i in range(log2, 2, -1)]

    def _channels(self, res):
        return min(self.channel_base // res, self.channel_max)

    def _cmap_dim(self):
        cmap = self.cmap_dim if self.cmap_dim is not None else self._channels(4)
        return 0 if self.c_dim == 0 else cmap

    def _block(self, res):
        return DiscriminatorBlock(
            in_channels=self._channels(res) if res < self.img_resolution else 0,
            tmp_channels=self._channels(res),
            out_channels=self._channels(res // 2),
            resolution=res,
            img_channels=self.img_channels,
            architecture=self.architecture,
            conv_clamp=self.conv_clamp,
        )

    def _epilogue(self):
        return DiscriminatorEpilogue(
            self._channels(4), cmap_dim=self._cmap_dim(), resolution=4,
            img_channels=self.img_channels, architecture=self.architecture,
            conv_clamp=self.conv_clamp, mbstd_group_size=self.mbstd_group_size,
        )

    def _mapping(self):
        return MappingNetwork(
            z_dim=0, c_dim=self.c_dim, w_dim=self._cmap_dim(), num_ws=None,
            w_avg_beta=None, num_layers=self.mapping_layers,
        )

    def init(self, rng: jax.Array) -> Params:
        keys = jax.random.split(rng, len(self.block_resolutions) + 2)
        p: Params = {
            f"b{res}": self._block(res).init(k)
            for res, k in zip(self.block_resolutions, keys)
        }
        if self.c_dim > 0:
            p["mapping"] = self._mapping().init(keys[-2])
        p["b4"] = self._epilogue().init(keys[-1])
        return p

    def apply(self, params: Params, img, c=None, dtype=jnp.float32):
        x = None
        for res in self.block_resolutions:
            x, img = self._block(res).apply(params[f"b{res}"], x, img, dtype=dtype)
        cmap = None
        if self.c_dim > 0:
            cmap = self._mapping().apply(params["mapping"], None, c)
        return self._epilogue().apply(params["b4"], x, img, cmap)
