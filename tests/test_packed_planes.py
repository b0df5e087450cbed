"""Packed tri-plane sampling must match the reference grid_sample path."""

import numpy as np

import jax
import jax.numpy as jnp

from gnerf_tpu.render import (
    pack_planes,
    render_rays,
    sample_from_planes,
    sample_packed_planes,
)


def test_packed_matches_unpacked():
    rng = np.random.RandomState(0)
    N, C, H, W, M = 2, 8, 16, 16, 400
    planes = jnp.asarray(rng.randn(N, 3, C, H, W), jnp.float32)
    # Include out-of-box and exactly-on-border points.
    pts = jnp.asarray(
        np.concatenate([
            rng.uniform(-0.55, 0.55, (N, M - 4, 3)),
            np.array([[[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5],
                       [0.0, 0.0, 0.0], [0.7, 0.0, 0.0]]] * N),
        ], axis=1), jnp.float32)
    want = sample_from_planes(planes, pts, box_warp=1.0)
    got = sample_packed_planes(pack_planes(planes), pts, box_warp=1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_combine_mxu_matches_lanes():
    """The MXU corner-combine (one-hot [4C,C] contraction) must equal the
    lane-slice combine exactly in fp32, and to bf16 rounding in bf16."""
    rng = np.random.RandomState(2)
    N, C, H, W, M = 1, 32, 16, 16, 300
    planes32 = jnp.asarray(rng.randn(N, 3, C, H, W), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.55, 0.55, (N, M, 3)), jnp.float32)

    a = sample_packed_planes(pack_planes(planes32), pts, box_warp=1.0,
                             combine="mxu")
    b = sample_packed_planes(pack_planes(planes32), pts, box_warp=1.0,
                             combine="lanes")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)

    # 'mxu_barrier' is 'mxu' plus an optimization_barrier on the gathered
    # rows — identical math, bitwise-equal result.
    ab = sample_packed_planes(pack_planes(planes32), pts, box_warp=1.0,
                              combine="mxu_barrier")
    np.testing.assert_array_equal(np.asarray(ab), np.asarray(a))

    packed16 = pack_planes(planes32.astype(jnp.bfloat16))
    a16 = sample_packed_planes(packed16, pts, box_warp=1.0, combine="mxu")
    b16 = sample_packed_planes(packed16, pts, box_warp=1.0, combine="lanes")
    assert a16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(a16, np.float32), np.asarray(b16, np.float32),
        rtol=0.0, atol=0.05)  # one bf16 ulp of the corner sums


def test_packed_render_matches_unpacked():
    from gnerf_tpu.render import sample_rays
    from gnerf_tpu.utils import camera

    rng = np.random.RandomState(1)
    planes = jnp.asarray(rng.randn(1, 3, 4, 16, 16), jnp.float32)
    c2w = camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7)
    o, d = sample_rays(c2w, camera.FFHQ_INTRINSICS[None], 8)
    opts = dict(depth_resolution=8, depth_resolution_importance=8,
                ray_start=2.25, ray_end=3.3, box_warp=1.0,
                clamp_mode="softplus", white_back=False,
                disparity_space_sampling=False, density_noise=0)

    def dec(feats, dirs):
        m = feats.mean(1)
        return {"rgb": jax.nn.sigmoid(m[..., :3]), "sigma": m.sum(-1, keepdims=True)}

    rgb1, d1, w1 = render_rays(planes, dec, o, d, opts)
    rgb2, d2, w2 = render_rays(pack_planes(planes), dec, o, d, opts)
    np.testing.assert_allclose(np.asarray(rgb2), np.asarray(rgb1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               rtol=1e-4, atol=1e-5)


def test_packed_broadcast_multi_frame():
    """One identity's packed planes shared across a frame batch must equal
    per-frame rendering (the multi-frame batching path)."""
    rng = np.random.RandomState(5)
    planes = jnp.asarray(rng.randn(1, 3, 8, 16, 16), jnp.float32)
    packed = pack_planes(planes)
    pts = jnp.asarray(rng.uniform(-0.45, 0.45, (3, 100, 3)), jnp.float32)
    got = sample_packed_planes(packed, pts, box_warp=1.0)  # coords batch 3
    for i in range(3):
        want = sample_packed_planes(packed, pts[i : i + 1], box_warp=1.0)
        np.testing.assert_allclose(np.asarray(got[i : i + 1]), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_triplane_generator_packed_path():
    from gnerf_tpu.models import TriPlaneGenerator
    from gnerf_tpu.utils import camera

    g = TriPlaneGenerator(
        z_dim=16, w_dim=16, img_resolution=128, plane_resolution=16,
        channel_base=256, channel_max=32, mapping_layers=2,
        neural_rendering_resolution=8,
        rendering_kwargs=dict(
            TriPlaneGenerator().rendering_kwargs,
            superresolution_module="SuperresolutionHybrid2X",
            depth_resolution=4, depth_resolution_importance=4,
        ),
    )
    p = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16))
    ws = g.mapping(p, z, jnp.zeros((1, 25)))
    c = camera.pose_to_label(
        camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7),
        camera.FFHQ_INTRINSICS,
    )
    raw = g.backbone_planes(p, ws, noise_mode="none")
    packed = g.backbone_planes(p, ws, noise_mode="none", pack=True)
    o1 = g.render_planes(p, raw, c, ws, noise_mode="none")
    o2 = g.render_planes(p, packed, c, ws, noise_mode="none")
    np.testing.assert_allclose(np.asarray(o2["image"]), np.asarray(o1["image"]),
                               rtol=1e-4, atol=1e-5)


def test_rows_path_matches_regular_decoder():
    """sample_packed_rows + OSGDecoder.apply_rows (bilinear+mean folded into
    the first matmul) must match sample_packed_planes + OSGDecoder.apply."""
    from gnerf_tpu.models.triplane import OSGDecoder
    from gnerf_tpu.render.renderer import sample_packed_rows

    rng = np.random.RandomState(3)
    N, C, H, W, M = 2, 32, 16, 16, 300
    planes = jnp.asarray(rng.randn(N, 3, C, H, W), jnp.float32)
    pts = jnp.asarray(
        np.concatenate([
            rng.uniform(-0.55, 0.55, (N, M - 2, 3)),
            np.array([[[-0.5, -0.5, -0.5], [0.7, 0.0, 0.0]]] * N),
        ], axis=1), jnp.float32)
    dec = OSGDecoder(n_features=C)
    params = dec.init(jax.random.PRNGKey(0))

    feats = sample_packed_planes(pack_planes(planes), pts, box_warp=1.0)
    want = dec.apply(params, feats)

    rows = sample_packed_rows(pack_planes(planes), pts, box_warp=1.0)
    got = dec.apply_rows(params, rows, (N, M))

    np.testing.assert_allclose(np.asarray(got["sigma"]),
                               np.asarray(want["sigma"]), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.asarray(want["rgb"]), rtol=2e-4, atol=2e-5)


def test_rows_path_shared_planes_across_frames():
    """packed.n == 1 with a frame batch N > 1 (the video workload)."""
    from gnerf_tpu.models.triplane import OSGDecoder
    from gnerf_tpu.render.renderer import sample_packed_rows

    rng = np.random.RandomState(4)
    C, H, W, M, F = 16, 16, 16, 64, 3
    planes = jnp.asarray(rng.randn(1, 3, C, H, W), jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (F, M, 3)), jnp.float32)
    dec = OSGDecoder(n_features=C)
    params = dec.init(jax.random.PRNGKey(1))

    feats = sample_packed_planes(pack_planes(planes), pts, box_warp=1.0)
    want = dec.apply(params, feats)
    rows = sample_packed_rows(pack_planes(planes), pts, box_warp=1.0)
    got = dec.apply_rows(params, rows, (F, M))
    np.testing.assert_allclose(np.asarray(got["sigma"]),
                               np.asarray(want["sigma"]), rtol=2e-4, atol=2e-5)
