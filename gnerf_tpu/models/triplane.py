"""TriPlaneGenerator: the flagship model (network G).

Capability equivalent of the reference
(`/root/reference/g_nerf/training/triplane.py`): StyleGAN2 backbone emitting
a 256x256x96 tri-plane, two-pass volumetric renderer, OSG decoder MLP, and a
superresolution module — glued as pure functions over one params pytree.

Functional design instead of module state: the reference's mutable
plane cache (`cache_backbone` / `_last_planes`, `triplane.py:66-71`) becomes
the explicit split `backbone_planes()` / `render_planes()` — inference
computes planes once per identity and reuses them across every frame of an
orbit (the dominant win for video generation), and all of it jits/vmaps.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp

from ..render.ray_sampler import sample_rays
from ..render.renderer import render_rays, run_model
from .stylegan2 import FullyConnectedLayer, Generator, MappingNetwork, Params
from .superresolution import make_superresolution


@dataclasses.dataclass(frozen=True)
class OSGDecoder:
    """2-layer point decoder: 32 plane features -> (sigma, 32 rgb features).

    Reference `triplane.py:113-136`: mean over the 3 planes, FC->softplus->FC,
    MipNeRF sigmoid clamping on rgb, raw sigma. View directions are accepted
    and ignored (parity with the reference)."""

    n_features: int = 32
    hidden_dim: int = 64
    decoder_output_dim: int = 32
    decoder_lr_mul: float = 1.0

    def _fc0(self):
        return FullyConnectedLayer(
            self.n_features, self.hidden_dim, lr_multiplier=self.decoder_lr_mul
        )

    def _fc1(self):
        return FullyConnectedLayer(
            self.hidden_dim, 1 + self.decoder_output_dim,
            lr_multiplier=self.decoder_lr_mul,
        )

    def init(self, rng: jax.Array) -> Params:
        k0, k1 = jax.random.split(rng)
        return {"fc0": self._fc0().init(k0), "fc1": self._fc1().init(k1)}

    def apply(self, params: Params, sampled_features: jax.Array,
              ray_directions: Optional[jax.Array] = None,
              use_fused: Optional[bool] = None) -> Mapping[str, jax.Array]:
        del ray_directions  # accepted for interface parity; unused
        if use_fused is None:
            # Measured on v5e: XLA's own fusion of this tiny MLP (3.4 ms /
            # 393k pts bf16) beats the Pallas kernel (4.4 ms — the 32-wide
            # features pad to 128 lanes in VMEM, wasting 4x the bandwidth),
            # so the fused path is opt-in. See ops/fused_decoder.py.
            use_fused = False
        if use_fused and sampled_features.shape[1] == 3:
            out = self._apply_fused(params, sampled_features)
            return {"rgb": out[..., 1:], "sigma": out[..., 0:1]}
        x = sampled_features.mean(axis=1)  # aggregate over the 3 planes
        N, M, C = x.shape
        x = x.reshape(N * M, C)
        x = self._fc0().apply(params["fc0"], x)
        x = jax.nn.softplus(x)
        x = self._fc1().apply(params["fc1"], x)
        x = x.reshape(N, M, -1)
        rgb = jax.nn.sigmoid(x[..., 1:]) * (1 + 2 * 0.001) - 0.001
        sigma = x[..., 0:1]
        return {"rgb": rgb, "sigma": sigma}

    def apply_rows(self, params: Params, rows: jax.Array,
                   out_shape: tuple) -> Mapping[str, jax.Array]:
        """Folded fast path: consume point-major weighted gather rows
        ([P, 12*C] from `render.renderer.sample_packed_rows` — 3 planes x 4
        bilinear corners x C channels, corner weights pre-applied).

        The first matmul against a 12x-tiled W1/3 computes
        bilinear-combine + 3-plane mean + FC0 in one MXU pass:
          sum_{p,c} (w_pc * x_pc) @ (W1/3) == mean_p(bilinear_p) @ W1.
        Mathematically identical to apply() (summation order aside);
        parity-tested in tests/test_packed_planes.py."""
        from ..ops.precision import dot_precision

        N, M = out_shape
        lr = self.decoder_lr_mul
        c = self.n_features
        h = self.hidden_dim
        w1e = (params["fc0"]["weight"] * (lr / math.sqrt(c))).T  # [C, H]
        b1e = params["fc0"]["bias"] * lr
        w2e = (params["fc1"]["weight"] * (lr / math.sqrt(h))).T  # [H, D]
        b2e = params["fc1"]["bias"] * lr
        w1t = jnp.tile(w1e / 3.0, (12, 1)).astype(rows.dtype)  # [12C, H]
        x = jnp.dot(rows, w1t, precision=dot_precision(rows.dtype),
                    preferred_element_type=jnp.float32) + b1e
        x = jax.nn.softplus(x)
        x = jnp.dot(x.astype(rows.dtype), w2e.astype(rows.dtype),
                    precision=dot_precision(rows.dtype),
                    preferred_element_type=jnp.float32) + b2e
        x = x.reshape(N, M, -1)
        rgb = jax.nn.sigmoid(x[..., 1:]) * (1 + 2 * 0.001) - 0.001
        sigma = x[..., 0:1]
        return {"rgb": rgb, "sigma": sigma}

    def _apply_fused(self, params: Params, feats: jax.Array,
                     interpret: bool = False) -> jax.Array:
        """Pallas path: whole MLP in VMEM (see ops/fused_decoder.py).
        Pre-applies the equalized-LR gains so the kernel math equals the
        FullyConnectedLayer semantics."""
        from ..ops.fused_decoder import fused_osg_decode

        lr = self.decoder_lr_mul
        c = self.n_features
        h = self.hidden_dim
        w1e = (params["fc0"]["weight"] * (lr / math.sqrt(c))).T.astype(feats.dtype)
        b1e = (params["fc0"]["bias"] * lr).astype(jnp.float32)
        w2e = (params["fc1"]["weight"] * (lr / math.sqrt(h))).T.astype(jnp.float32)
        b2e = (params["fc1"]["bias"] * lr).astype(jnp.float32)
        return fused_osg_decode(feats, w1e, b1e, w2e, b2e, interpret=interpret)


DEFAULT_RENDERING_KWARGS = dict(
    image_resolution=512,
    disparity_space_sampling=False,
    clamp_mode="softplus",
    superresolution_module="SuperresolutionHybrid8XDC",
    c_gen_conditioning_zero=True,
    c_scale=0.0,
    superresolution_noise_mode="none",
    density_reg=0.25,
    density_reg_p_dist=0.004,
    reg_type="l1",
    decoder_lr_mul=1.0,
    sr_antialias=True,
    depth_resolution=48,
    depth_resolution_importance=48,
    ray_start=2.25,
    ray_end=3.3,
    box_warp=1.0,
    avg_camera_radius=2.7,
    avg_camera_pivot=(0, 0, 0.2),
    white_back=False,
    density_noise=0,
)


@dataclasses.dataclass(frozen=True)
class TriPlaneGenerator:
    z_dim: int = 512
    c_dim: int = 25
    w_dim: int = 512
    img_resolution: int = 512
    img_channels: int = 3
    sr_num_fp16_res: int = 0
    mapping_layers: int = 2
    channel_base: int = 32768
    channel_max: int = 512
    plane_resolution: int = 256
    plane_channels: int = 32
    neural_rendering_resolution: int = 64
    rendering_kwargs: Any = dataclasses.field(
        default_factory=lambda: dict(DEFAULT_RENDERING_KWARGS)
    )
    use_noise: bool = True

    def __post_init__(self):
        if not isinstance(self.rendering_kwargs, dict):
            object.__setattr__(self, "rendering_kwargs", dict(self.rendering_kwargs))

    # -- submodules ---------------------------------------------------------

    @property
    def backbone(self) -> Generator:
        return Generator(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            img_resolution=self.plane_resolution,
            img_channels=self.plane_channels * 3,
            mapping_layers=self.mapping_layers,
            channel_base=self.channel_base, channel_max=self.channel_max,
            use_noise=self.use_noise,
        )

    @property
    def decoder(self) -> OSGDecoder:
        return OSGDecoder(
            n_features=self.plane_channels,
            decoder_output_dim=32,
            decoder_lr_mul=self.rendering_kwargs.get("decoder_lr_mul", 1.0),
        )

    @property
    def superresolution(self):
        extra = {}
        # Optional override of the SR module's fixed input resolution
        # (each variant resizes off-size inputs to it — reference
        # `superresolution.py:48,296`); used by reduced-scale configs so
        # the render-resolution fade keeps a constant output size.
        sr_in = self.rendering_kwargs.get("sr_input_resolution")
        if sr_in:
            extra["input_resolution"] = int(sr_in)
        return make_superresolution(
            self.rendering_kwargs["superresolution_module"],
            channels=32,
            img_resolution=self.img_resolution,
            sr_num_fp16_res=self.sr_num_fp16_res,
            sr_antialias=self.rendering_kwargs.get("sr_antialias", True),
            w_dim=self.w_dim,
            use_noise=self.use_noise,
            **extra,
        )

    @property
    def num_ws(self) -> int:
        return self.backbone.num_ws

    def init(self, rng: jax.Array) -> Params:
        kb, kd, ks = jax.random.split(rng, 3)
        return {
            "backbone": self.backbone.init(kb),
            "decoder": self.decoder.init(kd),
            "superresolution": self.superresolution.init(ks),
        }

    # -- forward pieces ------------------------------------------------------

    def mapping(self, params: Params, z, c, truncation_psi=1.0,
                truncation_cutoff=None) -> jax.Array:
        """z (+ conditioning pose) -> broadcast ws. Honors
        c_gen_conditioning_zero / c_scale (reference `triplane.py:48-51`)."""
        if self.rendering_kwargs.get("c_gen_conditioning_zero", True):
            c = jnp.zeros_like(c)
        c = c * self.rendering_kwargs.get("c_scale", 0.0)
        return self.backbone.mapping.apply(
            params["backbone"]["mapping"], z, c,
            truncation_psi=truncation_psi, truncation_cutoff=truncation_cutoff,
        )

    def backbone_planes(self, params: Params, ws: jax.Array,
                        noise_mode: str = "const", rng=None,
                        dtype=jnp.float32, pack: bool = False):
        """ws -> tri-plane features [N, 3, C, H, W] (or PackedPlanes when
        pack=True — the fast single-gather layout; pack once per identity
        and reuse across every frame of an orbit)."""
        planes = self.backbone.synthesis.apply(
            params["backbone"]["synthesis"], ws,
            noise_mode=noise_mode, rng=rng, dtype=dtype,
        )
        # The StyleGAN2 ToRGB skip accumulates in fp32 regardless of block
        # dtype (stylegan2.py:462, reference semantics), so without this
        # cast bf16 mode silently emitted fp32 planes — doubling plane
        # gather bytes and dragging the whole sampling chain to fp32
        # (found via an XLA HBM dump: f32[17.7M,128] gather temps).
        planes = planes.astype(dtype)
        N = planes.shape[0]
        planes = planes.reshape(
            N, 3, self.plane_channels, planes.shape[-2], planes.shape[-1]
        )
        if pack:
            from ..render.renderer import pack_planes

            return pack_planes(planes)
        return planes

    def render_planes(
        self,
        params: Params,
        planes: jax.Array,
        c: jax.Array,
        ws: jax.Array,
        neural_rendering_resolution: Optional[int] = None,
        noise_mode: str = "const",
        rng=None,
        only_depth: bool = False,
        dtype=jnp.float32,
        rendering_kwargs: Optional[Mapping[str, Any]] = None,
        superres: bool = True,
    ) -> Mapping[str, jax.Array]:
        """Volume-render cached planes under camera `c`, then superresolve."""
        opts = dict(self.rendering_kwargs)
        if rendering_kwargs:
            opts.update(rendering_kwargs)
        res = neural_rendering_resolution or self.neural_rendering_resolution
        cam2world = c[:, :16].reshape(-1, 4, 4)
        intrinsics = c[:, 16:25].reshape(-1, 3, 3)
        ray_origins, ray_dirs = sample_rays(cam2world, intrinsics, res)

        k_render, k_sr = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        decoder = self.decoder

        def decode(feats, dirs):
            return decoder.apply(params["decoder"], feats, dirs)

        # Folded gather->decoder path (renderer.run_model): measured LOSS on
        # v5e (59.4 vs 72.2 f/s — the 12x-tiled first matmul triples K tiles
        # and the pre-weighted rows materialize), so opt-in only via
        # rendering_kwargs decoder_rows_path=True. Kept because its fusion
        # structure may win on other chips / future XLA.
        if opts.get("decoder_rows_path", False):
            decode.rows_fn = lambda rows, shape: decoder.apply_rows(
                params["decoder"], rows, shape
            )

        feature_samples, depth_samples, _ = render_rays(
            planes, decode, ray_origins, ray_dirs, opts, rng=k_render
        )
        N = feature_samples.shape[0]
        H = W = res
        feature_image = feature_samples.transpose(0, 2, 1).reshape(N, -1, H, W)
        depth_image = depth_samples.transpose(0, 2, 1).reshape(N, 1, H, W)
        if only_depth:
            return {
                "image": depth_image,
                "image_raw": depth_image,
                "image_depth": depth_image,
            }
        if not superres:
            # Stage boundary for profiling / feature-level consumers: the
            # raw 32ch feature image + depth, no SR.
            return {"feature_image": feature_image,
                    "image_depth": depth_image}
        rgb_image = feature_image[:, :3]
        sr_noise = opts.get("superresolution_noise_mode", "none")
        sr_noise = "none" if sr_noise not in ("random", "const") else sr_noise
        sr_image, rgb_image = self.superresolution.apply(
            params["superresolution"], rgb_image, feature_image, ws,
            noise_mode=sr_noise, rng=k_sr, dtype=dtype,
        )
        return {"image": sr_image, "image_raw": rgb_image, "image_depth": depth_image}

    def synthesis(
        self, params: Params, ws, c, neural_rendering_resolution=None,
        noise_mode="const", rng=None, only_depth=False, dtype=jnp.float32,
        rendering_kwargs=None, pack: bool = True,
    ) -> Mapping[str, jax.Array]:
        """Full synthesis: backbone -> render -> SR
        (reference `triplane.py:53-89`).

        pack=True routes sampling through the quad-packed plane layout —
        equal results (parity-tested to 1e-5), faster forward, and a ~20x
        faster BACKWARD: the packed gather's VJP is ONE 128-lane row
        scatter-add + dense unpack transposes, vs four 32-lane corner
        scatters into raw planes (0.11 s vs 1.10 s per coarse pass at
        flagship training shapes on v5e)."""
        k_bb, k_rest = jax.random.split(rng) if rng is not None else (None, None)
        planes = self.backbone_planes(
            params, ws, noise_mode=noise_mode, rng=k_bb, dtype=dtype,
            pack=pack,
        )
        return self.render_planes(
            params, planes, c, ws,
            neural_rendering_resolution=neural_rendering_resolution,
            noise_mode=noise_mode, rng=k_rest, only_depth=only_depth,
            dtype=dtype, rendering_kwargs=rendering_kwargs,
        )

    def sample_mixed(self, params: Params, coordinates, directions, ws,
                     noise_mode="const", rng=None,
                     dtype=jnp.float32) -> Mapping[str, jax.Array]:
        """Evaluate sigma/rgb at arbitrary 3D points given ws — the shape
        extraction path (reference `triplane.py:98-102`)."""
        planes = self.backbone_planes(params, ws, noise_mode=noise_mode,
                                      dtype=dtype)
        decoder = self.decoder

        def decode(feats, dirs):
            return decoder.apply(params["decoder"], feats, dirs)

        return run_model(
            planes, decode, coordinates, directions, self.rendering_kwargs, rng
        )

    def sample(self, params: Params, coordinates, directions, z, c,
               truncation_psi=1.0, truncation_cutoff=None,
               noise_mode="const", rng=None) -> Mapping[str, jax.Array]:
        """Like sample_mixed but from z (reference `triplane.py:91-96`)."""
        ws = self.mapping(params, z, c, truncation_psi, truncation_cutoff)
        return self.sample_mixed(params, coordinates, directions, ws,
                                 noise_mode=noise_mode, rng=rng)

    def apply(self, params: Params, z, c, truncation_psi=1.0,
              truncation_cutoff=None, neural_rendering_resolution=None,
              noise_mode="const", rng=None, dtype=jnp.float32):
        """z + camera -> rendered frame dict (reference `triplane.py:104-108`)."""
        ws = self.mapping(params, z, c, truncation_psi, truncation_cutoff)
        return self.synthesis(
            params, ws, c,
            neural_rendering_resolution=neural_rendering_resolution,
            noise_mode=noise_mode, rng=rng, dtype=dtype,
        )
