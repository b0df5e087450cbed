"""Tests for the volumetric rendering core (L3).

Oracles: stock torch ops (pooling, grid_sample) where they exist; numpy
implementations written directly from the volume-rendering equation
otherwise; plus analytic scenes with known geometry.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gnerf_tpu import ops
from gnerf_tpu.render import (
    get_ray_limits_box,
    march_merged,
    march_rays,
    render_rays,
    sample_from_planes,
    sample_importance,
    sample_pdf,
    sample_rays,
    sample_stratified,
    smooth_weights,
    unify_samples,
)
from gnerf_tpu.utils import camera


OPTS = dict(
    depth_resolution=24,
    depth_resolution_importance=24,
    ray_start=2.25,
    ray_end=3.3,
    box_warp=1.0,
    clamp_mode="softplus",
    white_back=False,
    disparity_space_sampling=False,
    density_noise=0,
)


def test_ray_sampler_geometry():
    # Camera at (0, 0, -r) looking at origin along +z.
    c2w = camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7)
    # Orbit at theta=pi/2 -> origin (0, 0, +2.7) per the reference convention.
    assert np.allclose(np.asarray(c2w[0, :3, 3]), [0, 0, 2.7], atol=1e-5)
    intr = camera.FFHQ_INTRINSICS[None]
    res = 8
    o, d = sample_rays(c2w, intr, res)
    assert o.shape == (1, res * res, 3) and d.shape == (1, res * res, 3)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(d, axis=-1)), 1.0, rtol=1e-5)
    # All origins at camera center.
    np.testing.assert_allclose(
        np.asarray(o[0]),
        np.broadcast_to(np.asarray(c2w[0, :3, 3]), o[0].shape),
        atol=1e-6,
    )
    # The central rays should point roughly at the origin (-z here).
    center = np.asarray(d[0]).reshape(res, res, 3)[res // 2, res // 2]
    assert center[2] < -0.99
    # Pixel order: m = row*res + col; x (width) varies fastest.
    dd = np.asarray(d[0]).reshape(res, res, 3)
    assert abs(dd[0, 1, 0] - dd[0, 0, 0]) > abs(dd[0, 1, 1] - dd[0, 0, 1])


def test_ray_box_intersection():
    o = jnp.array([[[0.0, 0.0, -2.0], [0.0, 0.0, -2.0], [5.0, 5.0, -2.0]]])
    d = jnp.array([[[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]])
    tmin, tmax = get_ray_limits_box(o, d, box_side_length=1.0)
    tmin, tmax = np.asarray(tmin), np.asarray(tmax)
    # Ray 0 hits the box at z=-0.5 (t=1.5) and exits at z=0.5 (t=2.5).
    np.testing.assert_allclose(tmin[0, 0, 0], 1.5, atol=1e-5)
    np.testing.assert_allclose(tmax[0, 0, 0], 2.5, atol=1e-5)
    # Ray 1 points away (miss): (-1, -2). Ray 2 misses laterally: (-1, -2).
    assert tmin[0, 1, 0] == -1 and tmax[0, 1, 0] == -2
    assert tmin[0, 2, 0] == -1 and tmax[0, 2, 0] == -2


def test_march_rays_against_numpy_volume_rendering():
    rng = np.random.RandomState(0)
    N, R, S, C = 2, 5, 16, 4
    colors = rng.rand(N, R, S, C).astype(np.float32)
    dens = rng.randn(N, R, S, 1).astype(np.float32)
    depths = np.sort(rng.uniform(2.0, 3.0, (N, R, S, 1)).astype(np.float32), axis=2)

    rgb, depth, weights = march_rays(
        jnp.asarray(colors), jnp.asarray(dens), jnp.asarray(depths), OPTS
    )

    # Independent numpy implementation of midpoint alpha compositing.
    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    c_mid = (colors[:, :, :-1] + colors[:, :, 1:]) / 2
    d_mid = (dens[:, :, :-1] + dens[:, :, 1:]) / 2
    z_mid = (depths[:, :, :-1] + depths[:, :, 1:]) / 2
    sigma = np.log1p(np.exp(d_mid - 1))  # softplus
    alpha = 1 - np.exp(-sigma * deltas)
    trans = np.cumprod(
        np.concatenate([np.ones_like(alpha[:, :, :1]), 1 - alpha + 1e-10], axis=2),
        axis=2,
    )[:, :, :-1]
    w = alpha * trans
    want_rgb = (w * c_mid).sum(2) * 2 - 1
    want_depth = np.clip(
        (w * z_mid).sum(2) / w.sum(2), depths.min(), depths.max()
    )
    np.testing.assert_allclose(np.asarray(rgb), want_rgb, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), want_depth, rtol=1e-4, atol=1e-5)
    # fp32 softplus/exp precision differs slightly between XLA and numpy.
    np.testing.assert_allclose(np.asarray(weights), w, rtol=2e-2, atol=1e-5)


def test_march_rays_white_back():
    colors = jnp.zeros((1, 1, 4, 3))
    dens = jnp.full((1, 1, 4, 1), -100.0)  # ~zero density
    depths = jnp.linspace(2.0, 3.0, 4).reshape(1, 1, 4, 1)
    opts = dict(OPTS, white_back=True)
    rgb, _, _ = march_rays(colors, dens, depths, opts)
    np.testing.assert_allclose(np.asarray(rgb), 1.0, atol=1e-4)  # 2*1-1


def test_smooth_weights_matches_torch_pooling():
    rng = np.random.RandomState(1)
    w = rng.rand(7, 23).astype(np.float32)
    got = smooth_weights(jnp.asarray(w))
    t = torch.from_numpy(w).unsqueeze(1)
    t = F.max_pool1d(t, 2, 1, padding=1)
    t = F.avg_pool1d(t, 2, 1).squeeze(1)
    np.testing.assert_allclose(np.asarray(got), t.numpy(), rtol=1e-6)


def test_sample_pdf_deterministic_uniform_and_peaked():
    n_rays, n_w, n_imp = 4, 16, 64
    bins = np.tile(np.linspace(2.0, 3.0, n_w + 1, dtype=np.float32), (n_rays, 1))
    uniform = np.ones((n_rays, n_w), dtype=np.float32)
    s = np.asarray(sample_pdf(None, jnp.asarray(bins), jnp.asarray(uniform), n_imp, det=True))
    # Deterministic uniform draw spans the depth range nearly linearly.
    np.testing.assert_allclose(s[:, 0], 2.0, atol=1e-4)
    np.testing.assert_allclose(s[:, -1], 3.0, atol=1e-4)
    np.testing.assert_allclose(np.diff(s, axis=1), (3 - 2) / (n_imp - 1), atol=1e-3)

    peaked = np.full((n_rays, n_w), 1e-8, dtype=np.float32)
    peaked[:, 7] = 1.0
    s = np.asarray(sample_pdf(None, jnp.asarray(bins), jnp.asarray(peaked), n_imp, det=True))
    inside = (s >= bins[0, 7] - 1e-3) & (s <= bins[0, 8] + 1e-3)
    assert inside.mean() > 0.95


def test_sample_stratified_bounds_and_jitter():
    o = jnp.zeros((2, 3, 3))
    d = sample_stratified(None, o, 2.25, 3.3, 12)
    assert d.shape == (2, 3, 12, 1)
    np.testing.assert_allclose(np.asarray(d[..., 0, 0]), 2.25, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d[..., -1, 0]), 3.3, atol=1e-6)
    dj = sample_stratified(jax.random.PRNGKey(0), o, 2.25, 3.3, 12)
    delta = (3.3 - 2.25) / 11
    assert np.all(np.asarray(dj) >= 2.25 - 1e-6)
    assert np.all(np.asarray(dj) <= 3.3 + delta + 1e-6)
    assert not np.allclose(np.asarray(dj), np.asarray(d))
    # Array-bounds path (auto ray-box).
    rs = jnp.full((2, 3, 1), 1.5)
    re = jnp.full((2, 3, 1), 2.5)
    da = sample_stratified(None, o, rs, re, 8)
    np.testing.assert_allclose(np.asarray(da[..., 0, 0]), 1.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(da[..., -1, 0]), 2.5, atol=1e-6)


def test_sample_importance_concentrates_on_surface():
    # Weights peaked at sample index 20 -> fine depths cluster near it.
    N, R, S = 1, 4, 32
    z = jnp.broadcast_to(jnp.linspace(2.0, 3.0, S).reshape(1, 1, S, 1), (N, R, S, 1))
    w = np.full((N, R, S - 1, 1), 1e-6, dtype=np.float32)
    w[:, :, 19:21] = 1.0
    fine = sample_importance(jax.random.PRNGKey(0), z, jnp.asarray(w), 16)
    fine = np.asarray(fine)
    z_peak = float(z[0, 0, 20, 0])
    assert fine.shape == (N, R, 16, 1)
    assert np.abs(fine - z_peak).mean() < 0.15


def test_unify_samples_sorts_by_depth():
    rng = np.random.RandomState(2)
    d1 = np.sort(rng.rand(1, 2, 5, 1), axis=2).astype(np.float32)
    d2 = np.sort(rng.rand(1, 2, 4, 1), axis=2).astype(np.float32)
    c1, c2 = rng.rand(1, 2, 5, 3).astype(np.float32), rng.rand(1, 2, 4, 3).astype(np.float32)
    s1, s2 = rng.rand(1, 2, 5, 1).astype(np.float32), rng.rand(1, 2, 4, 1).astype(np.float32)
    ad, ac, asig = unify_samples(*(jnp.asarray(a) for a in (d1, c1, s1, d2, c2, s2)))
    ad, ac, asig = np.asarray(ad), np.asarray(ac), np.asarray(asig)
    assert np.all(np.diff(ad[..., 0], axis=-1) >= 0)
    # Color rows must travel with their depths.
    cat_d = np.concatenate([d1, d2], axis=2)[..., 0]
    cat_c = np.concatenate([c1, c2], axis=2)
    for n in range(1):
        for r in range(2):
            order = np.argsort(cat_d[n, r], kind="stable")
            np.testing.assert_allclose(ac[n, r], cat_c[n, r][order], rtol=1e-6)


def test_sample_from_planes_matches_torch_grid_sample():
    rng = np.random.RandomState(3)
    N, C, H, W, M = 2, 8, 16, 16, 50
    planes = rng.randn(N, 3, C, H, W).astype(np.float32)
    pts = rng.uniform(-0.45, 0.45, (N, M, 3)).astype(np.float32)
    box_warp = 1.0
    got = np.asarray(sample_from_planes(jnp.asarray(planes), jnp.asarray(pts), box_warp))

    # Oracle: project with the (x,y),(x,z),(z,x) basis and use stock torch
    # grid_sample.
    scaled = pts * (2 / box_warp)
    uvs = np.stack(
        [scaled[..., [0, 1]], scaled[..., [0, 2]], scaled[..., [2, 0]]], axis=1
    )  # [N, 3, M, 2]
    t_feat = torch.from_numpy(planes.reshape(N * 3, C, H, W))
    t_uv = torch.from_numpy(uvs.reshape(N * 3, 1, M, 2))
    want = F.grid_sample(t_feat, t_uv, mode="bilinear", padding_mode="zeros",
                         align_corners=False)
    want = want[:, :, 0].permute(0, 2, 1).reshape(N, 3, M, C).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _gaussian_ball_decoder(feats, dirs):
    """Analytic decoder ignoring plane features: density spike at the plane
    feature magnitude is irrelevant; color is constant."""
    del dirs
    n, p, m, c = feats.shape
    rgb = jnp.ones((n, m, 3)) * 0.8
    sigma = feats.mean(axis=1).sum(axis=-1, keepdims=True)
    return {"rgb": rgb, "sigma": sigma}


def test_render_rays_end_to_end_depth():
    """A solid ball of density at the box center must render depth ~= the
    distance from the camera to the ball surface."""
    res = 8
    c2w = camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7)
    o, d = sample_rays(c2w, camera.FFHQ_INTRINSICS[None], res)

    # Tri-planes that decode to a centered density ball of radius ~0.3:
    # plane features = radial bump; decoder sums them.
    H = W = 32
    ys, xs = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W), indexing="ij")
    bump = 60.0 * np.exp(-((xs ** 2 + ys ** 2) / (2 * 0.35 ** 2))).astype(np.float32)
    planes = np.broadcast_to(bump, (1, 3, 1, H, W)).copy()

    rgb, depth, wsum = render_rays(
        jnp.asarray(planes), _gaussian_ball_decoder, o, d, OPTS,
        rng=jax.random.PRNGKey(0),
    )
    assert rgb.shape == (1, res * res, 3)
    depth = np.asarray(depth).reshape(res, res)
    wsum = np.asarray(wsum).reshape(res, res)
    center_depth = depth[res // 2, res // 2]
    # Camera at radius 2.7, ball surface ~0.3 from origin.
    assert 2.2 < center_depth < 2.7
    # Central rays should be opaque.
    assert wsum[res // 2, res // 2] > 0.9
    # Coarse-only path also runs.
    opts0 = dict(OPTS, depth_resolution_importance=0)
    rgb0, _, _ = render_rays(jnp.asarray(planes), _gaussian_ball_decoder, o, d, opts0)
    assert np.isfinite(np.asarray(rgb0)).all()


def test_render_rays_auto_bounds():
    res = 4
    c2w = camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7)
    o, d = sample_rays(c2w, camera.FFHQ_INTRINSICS[None], res)
    opts = dict(OPTS, ray_start="auto", ray_end="auto")
    planes = jnp.zeros((1, 3, 1, 8, 8))
    rgb, depth, wsum = render_rays(planes, _gaussian_ball_decoder, o, d, opts)
    assert np.isfinite(np.asarray(rgb)).all()
    assert np.isfinite(np.asarray(depth)).all()


def test_render_rays_jits_and_grads():
    res = 4
    c2w = camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7)
    o, d = sample_rays(c2w, camera.FFHQ_INTRINSICS[None], res)
    planes = jnp.asarray(np.random.RandomState(4).randn(1, 3, 2, 8, 8), jnp.float32)

    def dec(feats, dirs):
        return {
            "rgb": jnp.tanh(feats.mean(1)[..., :1]).repeat(3, -1) * 0.5 + 0.5,
            "sigma": feats.mean(1).sum(-1, keepdims=True),
        }

    def loss(p):
        rgb, _, _ = render_rays(p, dec, o, d, OPTS, rng=jax.random.PRNGKey(1))
        return jnp.sum(rgb ** 2)

    g = jax.jit(jax.grad(loss))(planes)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_unify_samples_sort_method_matches_onehot():
    """The variadic-sort merge must be exactly equivalent to the one-hot
    permute path (same ordering, bit-exact payload transport)."""
    rng = np.random.RandomState(7)
    args = []
    for s in (6, 5):
        args += [np.sort(rng.rand(2, 3, s, 1), axis=2).astype(np.float32),
                 rng.rand(2, 3, s, 4).astype(np.float32),
                 rng.rand(2, 3, s, 1).astype(np.float32)]
    j = [jnp.asarray(a) for a in args]
    want = unify_samples(*j, method="onehot")
    got = unify_samples(*j, method="sort")
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_unify_samples_hybrid_method_matches_onehot():
    """hybrid (scalar lanes via lax.sort + bf16-exact one-hot colors) must
    transport every payload bit-exactly, fp32 colors included."""
    rng = np.random.RandomState(11)
    args = []
    for s in (6, 5):
        args += [np.sort(rng.rand(2, 3, s, 1), axis=2).astype(np.float32),
                 rng.rand(2, 3, s, 4).astype(np.float32),
                 rng.rand(2, 3, s, 1).astype(np.float32)]
    j = [jnp.asarray(a) for a in args]
    want = unify_samples(*j, method="onehot")
    got = unify_samples(*j, method="hybrid")
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))

    # bf16 colors (the production dtype) transport exactly too.
    jb = list(j)
    jb[1] = jb[1].astype(jnp.bfloat16)
    jb[4] = jb[4].astype(jnp.bfloat16)
    want = unify_samples(*jb, method="onehot")
    got = unify_samples(*jb, method="hybrid")
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_march_merged_matches_unify_plus_march():
    """'weights' merge (scalar sorts + unsorted-color weighted sum) must
    reproduce unify_samples('hybrid') + march_rays: same math, only the
    fp32 color summation is re-associated."""
    rng = np.random.RandomState(13)
    opts = {"clamp_mode": "softplus", "white_back": False}
    args = []
    for s in (6, 5):
        args += [np.sort(rng.rand(2, 3, s, 1), axis=2).astype(np.float32),
                 rng.rand(2, 3, s, 4).astype(np.float32),
                 rng.rand(2, 3, s, 1).astype(np.float32)]
    j = [jnp.asarray(a) for a in args]

    d, c, dens = unify_samples(*j, method="hybrid")
    want_rgb, want_depth, want_w = march_rays(c, dens, d, opts)
    got_rgb, got_depth, got_w = march_merged(*j, opts)
    np.testing.assert_allclose(np.asarray(got_rgb), np.asarray(want_rgb),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_depth), np.asarray(want_depth),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w),
                               rtol=1e-5, atol=1e-6)

    # white_back + bf16 colors (production dtype).
    opts_wb = {"clamp_mode": "softplus", "white_back": True}
    jb = list(j)
    jb[1] = jb[1].astype(jnp.bfloat16)
    jb[4] = jb[4].astype(jnp.bfloat16)
    d, c, dens = unify_samples(*jb, method="hybrid")
    want_rgb, want_depth, _ = march_rays(c, dens, d, opts_wb)
    got_rgb, got_depth, _ = march_merged(*jb, opts_wb)
    np.testing.assert_allclose(np.asarray(got_rgb), np.asarray(want_rgb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_depth), np.asarray(want_depth),
                               rtol=1e-4, atol=1e-5)


def test_march_merged_count_matches_sort_exactly():
    """method='count' (cmp-count stable ranks + permutation einsums) must
    be BIT-IDENTICAL to method='sort': one_hot(rank) fp32-HIGHEST transport
    is exact, and the stable rank (ties broken by original index) matches
    lax.sort's stable order — exercised with deliberate duplicate depths
    across the coarse/fine boundary."""
    rng = np.random.RandomState(23)
    opts = {"clamp_mode": "softplus", "white_back": False}
    args = []
    for s in (7, 6):
        args += [np.sort(rng.rand(2, 3, s, 1), axis=2).astype(np.float32),
                 rng.rand(2, 3, s, 4).astype(np.float32),
                 rng.rand(2, 3, s, 1).astype(np.float32)]
    # Force ties: copy two coarse depths into the fine set.
    args[3][:, :, 0, 0] = args[0][:, :, 2, 0]
    args[3][:, :, 3, 0] = args[0][:, :, 5, 0]
    args[3].sort(axis=2)
    j = [jnp.asarray(a) for a in args]

    want = march_merged(*j, opts, method="sort")
    got = march_merged(*j, opts, method="count")
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_weights_merge_gradients_match_hybrid():
    """Backward through march_merged('weights') — two chained lax.sorts and
    the unsorted color weighted-sum — must produce the SAME gradients as
    the hybrid unify+march composition (underwrites using the sort-free
    merge inside differentiated training programs)."""
    from gnerf_tpu.render.ray_marcher import march_rays as _march
    from gnerf_tpu.render.renderer import march_merged, unify_samples

    k = jax.random.PRNGKey(0)
    N, R, S, C = 2, 8, 6, 5
    ks = jax.random.split(k, 6)
    d1 = jnp.sort(jax.random.uniform(ks[0], (N, R, S, 1)), axis=-2)
    d2 = jnp.sort(jax.random.uniform(ks[1], (N, R, S, 1)), axis=-2)
    c1 = jax.random.normal(ks[2], (N, R, S, C))
    c2 = jax.random.normal(ks[3], (N, R, S, C))
    s1 = jax.random.normal(ks[4], (N, R, S, 1))
    s2 = jax.random.normal(ks[5], (N, R, S, 1))
    opts = {"clamp_mode": "softplus", "white_back": False}

    def f_w(c1, c2, s1, s2):
        rgb, dep, _ = march_merged(d1, c1, s1, d2, c2, s2, opts)
        return jnp.sum(rgb ** 2) + jnp.sum(dep)

    def f_h(c1, c2, s1, s2):
        dd, cc, ss = unify_samples(d1, c1, s1, d2, c2, s2, method="hybrid")
        rgb, dep, _ = _march(cc, ss, dd, opts)
        return jnp.sum(rgb ** 2) + jnp.sum(dep)

    gw = jax.grad(f_w, argnums=(0, 1, 2, 3))(c1, c2, s1, s2)
    gh = jax.grad(f_h, argnums=(0, 1, 2, 3))(c1, c2, s1, s2)
    for a, b in zip(gw, gh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_render_rays_weights_merge_matches_hybrid():
    """End-to-end render_rays with sample_merge='weights' must match the
    default hybrid merge path at fp32 tolerance."""
    from gnerf_tpu.utils import camera

    rng = np.random.RandomState(17)
    planes = jnp.asarray(rng.randn(1, 3, 4, 16, 16), jnp.float32)
    c2w = camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7)
    o, d = sample_rays(c2w, camera.FFHQ_INTRINSICS[None], 8)
    base = dict(depth_resolution=8, depth_resolution_importance=8,
                ray_start=2.25, ray_end=3.3, box_warp=1.0,
                clamp_mode="softplus", white_back=False,
                disparity_space_sampling=False, density_noise=0)

    def dec(feats, dirs):
        m = feats.mean(1)
        return {"rgb": jax.nn.sigmoid(m[..., :3]),
                "sigma": m.sum(-1, keepdims=True)}

    rgb1, d1, w1 = render_rays(planes, dec, o, d, dict(base, sample_merge="hybrid"))
    for merge in ("weights", "ranks"):
        rgb2, d2, w2 = render_rays(
            planes, dec, o, d, dict(base, sample_merge=merge))
        np.testing.assert_allclose(np.asarray(rgb2), np.asarray(rgb1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w1),
                                   rtol=1e-5, atol=1e-6)
