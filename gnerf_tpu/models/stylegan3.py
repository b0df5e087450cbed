"""StyleGAN3 alias-free generator (functional JAX).

Capability equivalent of the reference
`/root/reference/g_nerf/training/networks_stylegan3.py`: Fourier-feature
SynthesisInput with a learned affine transform, alias-free SynthesisLayers
(Kaiser/jinc low-pass filter design + modulated conv + filtered leaky
ReLU), and the geometric cutoff/stopband layer schedule. Not used by the
shipped G-NeRF checkpoints (the SR stack uses StyleGAN2 blocks) but part of
the reference's model zoo, so provided for parity.

All filter design is static numpy/scipy at construction; the forward is
pure XLA (the giant reference CUDA filtered_lrelu collapses into the
upfirdn2d/bias_act composition in gnerf_tpu.ops)."""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bias_act import bias_act
from ..ops.conv2d_resample import _conv2d
from ..ops.filtered_lrelu import filtered_lrelu
from ..ops.precision import dot_precision
from .stylegan2 import FullyConnectedLayer, MappingNetwork, Params


def sg3_modulated_conv2d(
    x: jax.Array,
    w: jax.Array,
    s: jax.Array,
    demodulate: bool = True,
    padding: int = 0,
    input_gain: Optional[jax.Array] = None,
) -> jax.Array:
    """SG3-variant modulated conv (pre-normalized weights/styles; reference
    `networks_stylegan3.py:25-66`), in the scale-activations formulation."""
    out_channels, in_channels, kh, kw = w.shape
    if demodulate:
        w = w * jax.lax.rsqrt(jnp.mean(jnp.square(w), axis=(1, 2, 3), keepdims=True))
        s = s * jax.lax.rsqrt(jnp.mean(jnp.square(s)))
    dcoefs = None
    if demodulate:
        wmod = w[None] * s[:, None, :, None, None]
        dcoefs = jax.lax.rsqrt(jnp.sum(jnp.square(wmod), axis=(2, 3, 4)) + 1e-8)
    gain = s
    if input_gain is not None:
        gain = gain * jnp.broadcast_to(input_gain, s.shape)
    x = x * gain.astype(x.dtype)[:, :, None, None]
    x = _conv2d(x, w.astype(x.dtype), padding=padding)
    if dcoefs is not None:
        x = x * dcoefs.astype(x.dtype)[:, :, None, None]
    return x


def design_lowpass_filter(numtaps: int, cutoff: float, width: float, fs: float,
                          radial: bool = False) -> Optional[np.ndarray]:
    """Kaiser (separable) or jinc (radial) low-pass filter
    (reference `networks_stylegan3.py:365-386`)."""
    assert numtaps >= 1
    if numtaps == 1:
        return None
    import scipy.signal
    import scipy.special

    if not radial:
        return scipy.signal.firwin(numtaps=numtaps, cutoff=cutoff, width=width,
                                   fs=fs).astype(np.float32)
    x = (np.arange(numtaps) - (numtaps - 1) / 2) / fs
    r = np.hypot(*np.meshgrid(x, x))
    with np.errstate(divide="ignore", invalid="ignore"):
        f = scipy.special.j1(2 * cutoff * (np.pi * r)) / (np.pi * r)
    f[r == 0] = cutoff  # lim_{r->0} j1(2*pi*c*r)/(pi*r) = c (even taps never hit it)
    beta = scipy.signal.kaiser_beta(scipy.signal.kaiser_atten(numtaps, width / (fs / 2)))
    win = np.kaiser(numtaps, beta)
    f *= np.outer(win, win)
    f /= np.sum(f)
    return f.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class SynthesisInput:
    """Fourier-feature input with learned rotation/translation
    (reference `networks_stylegan3.py:171-252`)."""

    w_dim: int
    channels: int
    size: int
    sampling_rate: float
    bandwidth: float

    @property
    def affine(self):
        return FullyConnectedLayer(self.w_dim, 4, bias_init=0.0)

    def init(self, rng: jax.Array) -> Params:
        k_f, k_p, k_w, k_a = jax.random.split(rng, 4)
        freqs = jax.random.normal(k_f, (self.channels, 2))
        radii = jnp.sqrt(jnp.sum(jnp.square(freqs), axis=1, keepdims=True))
        freqs = freqs / (radii * jnp.exp(jnp.square(radii)) ** 0.25)
        freqs = freqs * self.bandwidth
        phases = jax.random.uniform(k_p, (self.channels,)) - 0.5
        affine = self.affine.init(k_a)
        # weight_init=0, bias_init=[1,0,0,0] per the reference.
        affine["weight"] = jnp.zeros_like(affine["weight"])
        affine["bias"] = jnp.array([1.0, 0.0, 0.0, 0.0])
        return {
            "weight": jax.random.normal(k_w, (self.channels, self.channels)),
            "affine": affine,
            "transform": jnp.eye(3),
            "freqs": freqs,
            "phases": phases,
        }

    def apply(self, params: Params, w: jax.Array) -> jax.Array:
        B = w.shape[0]
        t = self.affine.apply(params["affine"], w)  # (r_c, r_s, t_x, t_y)
        t = t / jnp.linalg.norm(t[:, :2], axis=1, keepdims=True)
        m_r = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        m_r = m_r.at[:, 0, 0].set(t[:, 0]).at[:, 0, 1].set(-t[:, 1])
        m_r = m_r.at[:, 1, 0].set(t[:, 1]).at[:, 1, 1].set(t[:, 0])
        m_t = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        m_t = m_t.at[:, 0, 2].set(-t[:, 2]).at[:, 1, 2].set(-t[:, 3])
        transforms = m_r @ m_t @ params["transform"][None]

        freqs0 = params["freqs"][None]
        phases = params["phases"][None] + jnp.einsum(
            "bcf,bfi->bci", freqs0, transforms[:, :2, 2:]
        )[..., 0]
        freqs = jnp.einsum("bcf,bfg->bcg", freqs0, transforms[:, :2, :2])

        amplitudes = jnp.clip(
            1 - (jnp.linalg.norm(freqs, axis=2) - self.bandwidth)
            / (self.sampling_rate / 2 - self.bandwidth),
            0, 1,
        )

        # Sampling grid (align_corners=False pixel centers, scaled extent).
        span_x = 0.5 * self.size / self.sampling_rate
        span_y = 0.5 * self.size / self.sampling_rate
        xs = (jnp.arange(self.size) + 0.5) / self.size * 2 - 1
        gx = xs * span_x
        gy = xs * span_y
        grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)  # [H,W,2]

        x = jnp.einsum("hwf,bcf->bhwc", grid, freqs) + phases[:, None, None, :]
        x = jnp.sin(x * (2 * math.pi))
        x = x * amplitudes[:, None, None, :]
        weight = params["weight"] / math.sqrt(self.channels)
        x = jnp.einsum("bhwc,dc->bhwd", x, weight,
                       precision=dot_precision(x.dtype))
        return jnp.transpose(x, (0, 3, 1, 2))


@dataclasses.dataclass(frozen=True)
class SynthesisLayer:
    """Alias-free layer: modconv -> filtered lrelu at an oversampled rate
    (reference `networks_stylegan3.py:255-363`)."""

    w_dim: int
    is_torgb: bool
    is_critically_sampled: bool
    in_channels: int
    out_channels: int
    in_size: int
    out_size: int
    in_sampling_rate: float
    out_sampling_rate: float
    in_cutoff: float
    out_cutoff: float
    in_half_width: float
    out_half_width: float
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    use_radial_filters: bool = False
    conv_clamp: Optional[float] = 256
    magnitude_ema_beta: float = 0.999

    @property
    def _kernel(self):
        return 1 if self.is_torgb else self.conv_kernel

    @property
    def tmp_sampling_rate(self):
        return max(self.in_sampling_rate, self.out_sampling_rate) * (
            1 if self.is_torgb else self.lrelu_upsampling
        )

    @property
    def up_factor(self):
        return int(round(self.tmp_sampling_rate / self.in_sampling_rate))

    @property
    def down_factor(self):
        return int(round(self.tmp_sampling_rate / self.out_sampling_rate))

    def _filters(self):
        up_taps = (self.filter_size * self.up_factor
                   if self.up_factor > 1 and not self.is_torgb else 1)
        down_taps = (self.filter_size * self.down_factor
                     if self.down_factor > 1 and not self.is_torgb else 1)
        fu = design_lowpass_filter(up_taps, self.in_cutoff,
                                   self.in_half_width * 2, self.tmp_sampling_rate)
        fd = design_lowpass_filter(
            down_taps, self.out_cutoff, self.out_half_width * 2,
            self.tmp_sampling_rate,
            radial=self.use_radial_filters and not self.is_critically_sampled,
        )
        return fu, fd, up_taps, down_taps

    def _padding(self, up_taps, down_taps):
        pad_total = (self.out_size - 1) * self.down_factor + 1
        pad_total -= (self.in_size + self._kernel - 1) * self.up_factor
        pad_total += up_taps + down_taps - 2
        pad_lo = (pad_total + self.up_factor) // 2
        pad_hi = pad_total - pad_lo
        return (int(pad_lo), int(pad_hi), int(pad_lo), int(pad_hi))

    @property
    def affine(self):
        return FullyConnectedLayer(self.w_dim, self.in_channels, bias_init=1)

    def init(self, rng: jax.Array) -> Params:
        k_a, k_w = jax.random.split(rng)
        return {
            "affine": self.affine.init(k_a),
            "weight": jax.random.normal(
                k_w, (self.out_channels, self.in_channels, self._kernel, self._kernel)
            ),
            "bias": jnp.zeros((self.out_channels,)),
            "magnitude_ema": jnp.ones(()),
        }

    def apply(self, params: Params, x: jax.Array, w: jax.Array,
              dtype=jnp.float32) -> jax.Array:
        input_gain = jax.lax.rsqrt(params["magnitude_ema"])
        styles = self.affine.apply(params["affine"], w)
        if self.is_torgb:
            styles = styles * (1 / math.sqrt(self.in_channels * self._kernel ** 2))
        x = sg3_modulated_conv2d(
            x.astype(dtype), params["weight"], styles,
            demodulate=not self.is_torgb, padding=self._kernel - 1,
            input_gain=input_gain,
        )
        fu, fd, up_taps, down_taps = self._filters()
        gain = 1.0 if self.is_torgb else math.sqrt(2)
        slope = 1.0 if self.is_torgb else 0.2
        x = filtered_lrelu(
            x,
            jnp.asarray(fu) if fu is not None else None,
            jnp.asarray(fd) if fd is not None else None,
            params["bias"].astype(x.dtype),
            up=self.up_factor, down=self.down_factor,
            padding=self._padding(up_taps, down_taps),
            gain=gain, slope=slope, clamp=self.conv_clamp,
        )
        return x

    def updated_magnitude_ema(self, params: Params, x: jax.Array) -> jax.Array:
        cur = jnp.mean(jnp.square(jax.lax.stop_gradient(x.astype(jnp.float32))))
        return cur + (params["magnitude_ema"] - cur) * self.magnitude_ema_beta


@dataclasses.dataclass(frozen=True)
class SynthesisNetwork:
    """Geometric cutoff schedule of alias-free layers
    (reference `networks_stylegan3.py:401-489`)."""

    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_layers: int = 14
    num_critical: int = 2
    first_cutoff: float = 2.0
    first_stopband: float = 2 ** 2.1
    last_stopband_rel: float = 2 ** 0.3
    margin_size: int = 10
    output_scale: float = 0.25

    @property
    def num_ws(self) -> int:
        return self.num_layers + 2

    def _schedule(self):
        last_cutoff = self.img_resolution / 2
        last_stopband = last_cutoff * self.last_stopband_rel
        exponents = np.minimum(
            np.arange(self.num_layers + 1) / (self.num_layers - self.num_critical), 1
        )
        cutoffs = self.first_cutoff * (last_cutoff / self.first_cutoff) ** exponents
        stopbands = self.first_stopband * (last_stopband / self.first_stopband) ** exponents
        sampling_rates = np.exp2(
            np.ceil(np.log2(np.minimum(stopbands * 2, self.img_resolution)))
        )
        half_widths = np.maximum(stopbands, sampling_rates / 2) - cutoffs
        sizes = sampling_rates + self.margin_size * 2
        sizes[-2:] = self.img_resolution
        channels = np.rint(np.minimum((self.channel_base / 2) / cutoffs, self.channel_max))
        channels[-1] = self.img_channels
        return cutoffs, sampling_rates, half_widths, sizes, channels

    def _input(self):
        cutoffs, sampling_rates, half_widths, sizes, channels = self._schedule()
        return SynthesisInput(
            w_dim=self.w_dim, channels=int(channels[0]), size=int(sizes[0]),
            sampling_rate=float(sampling_rates[0]), bandwidth=float(cutoffs[0]),
        )

    def _layer(self, idx: int) -> tuple[str, SynthesisLayer]:
        cutoffs, sampling_rates, half_widths, sizes, channels = self._schedule()
        prev = max(idx - 1, 0)
        layer = SynthesisLayer(
            w_dim=self.w_dim,
            is_torgb=(idx == self.num_layers),
            is_critically_sampled=(idx >= self.num_layers - self.num_critical),
            in_channels=int(channels[prev]), out_channels=int(channels[idx]),
            in_size=int(sizes[prev]), out_size=int(sizes[idx]),
            in_sampling_rate=float(sampling_rates[prev]),
            out_sampling_rate=float(sampling_rates[idx]),
            in_cutoff=float(cutoffs[prev]), out_cutoff=float(cutoffs[idx]),
            in_half_width=float(half_widths[prev]),
            out_half_width=float(half_widths[idx]),
        )
        return f"L{idx}_{layer.out_size}_{layer.out_channels}", layer

    def init(self, rng: jax.Array) -> Params:
        keys = jax.random.split(rng, self.num_layers + 2)
        p: Params = {"input": self._input().init(keys[0])}
        for idx in range(self.num_layers + 1):
            name, layer = self._layer(idx)
            p[name] = layer.init(keys[idx + 1])
        return p

    def apply(self, params: Params, ws: jax.Array, dtype=jnp.float32) -> jax.Array:
        ws = ws.astype(jnp.float32)
        x = self._input().apply(params["input"], ws[:, 0])
        for idx in range(self.num_layers + 1):
            name, layer = self._layer(idx)
            x = layer.apply(params[name], x, ws[:, idx + 1], dtype=dtype)
        if self.output_scale != 1:
            x = x * self.output_scale
        return x.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class Generator:
    """Alias-free generator (reference `networks_stylegan3.py:492-517`)."""

    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int
    mapping_layers: int = 2
    channel_base: int = 32768
    channel_max: int = 512
    num_layers: int = 14

    @property
    def synthesis(self) -> SynthesisNetwork:
        return SynthesisNetwork(
            w_dim=self.w_dim, img_resolution=self.img_resolution,
            img_channels=self.img_channels, channel_base=self.channel_base,
            channel_max=self.channel_max, num_layers=self.num_layers,
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
        k_m, k_s = jax.random.split(rng)
        return {"mapping": self.mapping.init(k_m), "synthesis": self.synthesis.init(k_s)}

    def apply(self, params: Params, z, c, truncation_psi=1.0,
              truncation_cutoff=None, dtype=jnp.float32) -> jax.Array:
        ws = self.mapping.apply(params["mapping"], z, c,
                                truncation_psi=truncation_psi,
                                truncation_cutoff=truncation_cutoff)
        return self.synthesis.apply(params["synthesis"], ws, dtype=dtype)
