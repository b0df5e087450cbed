"""Tests for the distributed substrate on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gnerf_tpu.parallel import (
    DATA_AXIS,
    batch_spec,
    check_replica_consistency,
    make_mesh,
    pmean_grads,
    put_replicated,
    ray_spec,
    sharded_jit,
)


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices (virtual CPU mesh)"
)


def test_make_mesh_shapes():
    mesh = make_mesh(data=8)
    assert mesh.shape == {"data": 8, "rays": 1}
    mesh2 = make_mesh(data=4, rays=2)
    assert mesh2.shape == {"data": 4, "rays": 2}
    mesh3 = make_mesh(rays=2)
    assert mesh3.shape == {"data": 4, "rays": 2}


def test_sharded_jit_matches_single_device():
    mesh = make_mesh(data=8)
    rng = np.random.RandomState(0)
    x = rng.randn(16, 32).astype(np.float32)
    w = rng.randn(32, 8).astype(np.float32)

    def fn(x, w):
        return jnp.tanh(x @ w).sum(axis=1)

    f = sharded_jit(fn, mesh, in_specs=(batch_spec(2), None))
    got = np.asarray(f(jnp.asarray(x), jnp.asarray(w)))
    want = np.asarray(jax.jit(fn)(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_data_parallel_grads_match_single_device():
    """Sharded-batch grad of a replicated-param loss == single-device grad —
    the pjit formulation of the reference's manual all_reduce."""
    mesh = make_mesh(data=8)
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(16, 4).astype(np.float32))
    x = jnp.asarray(rng.randn(32, 16).astype(np.float32))

    def loss(w, x):
        return jnp.mean(jnp.square(x @ w))

    grad_fn = jax.grad(loss)
    want = np.asarray(jax.jit(grad_fn)(w, x))

    repl = NamedSharding(mesh, P())
    xs = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS, None)))
    ws = jax.device_put(w, repl)
    got = np.asarray(
        jax.jit(grad_fn, in_shardings=(repl, NamedSharding(mesh, P(DATA_AXIS, None))),
                out_shardings=repl)(ws, xs)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_pmean_grads_inside_shard_map():
    mesh = make_mesh(data=8)
    x = jnp.arange(8.0)

    def body(x):
        g = {"w": x * 2}
        g = pmean_grads(g, DATA_AXIS)
        return g["w"]

    out = jax.shard_map(
        body, mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(DATA_AXIS)
    )(x)
    # pmean of (0..7)*2 = 7.0 everywhere.
    np.testing.assert_allclose(np.asarray(out), 7.0)


def test_pmean_grads_scrubs_nans():
    mesh = make_mesh(data=8)
    x = jnp.asarray([np.nan] + [1.0] * 7)

    def body(x):
        return pmean_grads({"g": x}, DATA_AXIS)["g"]

    out = jax.shard_map(
        body, mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(DATA_AXIS)
    )(x)
    assert np.isfinite(np.asarray(out)).all()


def test_replica_consistency_check():
    mesh = make_mesh(data=8)
    params = put_replicated({"w": jnp.ones((4, 4))}, mesh)
    assert check_replica_consistency(params, mesh)


def test_ray_sharded_render_matches_replicated():
    """Sharding the ray axis over the mesh must not change results — the
    renderer's sequence-parallel analog (SURVEY.md section 5.7)."""
    from gnerf_tpu.render import render_rays, sample_rays
    from gnerf_tpu.utils import camera

    mesh = make_mesh(data=1, rays=8, devices=jax.devices()[:8])
    opts = dict(
        depth_resolution=8, depth_resolution_importance=8,
        ray_start=2.25, ray_end=3.3, box_warp=1.0, clamp_mode="softplus",
        white_back=False, disparity_space_sampling=False, density_noise=0,
    )
    c2w = camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7)
    o, d = sample_rays(c2w, camera.FFHQ_INTRINSICS[None], 8)  # 64 rays
    planes = jnp.asarray(
        np.random.RandomState(3).randn(1, 3, 4, 16, 16), jnp.float32
    )

    def dec(feats, dirs):
        m = feats.mean(1)
        return {"rgb": jax.nn.sigmoid(m[..., :3]), "sigma": m.sum(-1, keepdims=True)}

    def render(planes, o, d):
        rgb, depth, w = render_rays(planes, dec, o, d, opts, rng=None)
        return rgb, depth

    want_rgb, want_depth = jax.jit(render)(planes, o, d)

    repl = NamedSharding(mesh, P())
    rs = NamedSharding(mesh, P(None, "rays", None))
    f = jax.jit(render, in_shardings=(repl, rs, rs), out_shardings=(rs, rs))
    got_rgb, got_depth = f(
        jax.device_put(planes, repl), jax.device_put(o, rs), jax.device_put(d, rs)
    )
    np.testing.assert_allclose(np.asarray(got_rgb), np.asarray(want_rgb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_depth), np.asarray(want_depth),
                               rtol=1e-4, atol=1e-5)


def test_ray_sharding_constraint_inside_jit_matches_replicated():
    """DP x SP: `options['ray_sharding']` must shard the render over a 2-D
    (data, rays) mesh WITHOUT changing results — here the rays are computed
    INSIDE the jitted function (the training/synthesis situation), where
    input shardings cannot reach them and only the internal
    with_sharding_constraint can."""
    from gnerf_tpu.render import render_rays, sample_rays
    from gnerf_tpu.utils import camera

    mesh = make_mesh(data=2, rays=4)
    opts = dict(
        depth_resolution=8, depth_resolution_importance=8,
        ray_start=2.25, ray_end=3.3, box_warp=1.0, clamp_mode="softplus",
        white_back=False, disparity_space_sampling=False, density_noise=0,
    )
    c2w = jnp.stack([
        camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7)[0],
        camera.lookat_sample(np.pi / 2 + 0.3, np.pi / 2, radius=2.7)[0],
    ])
    planes = jnp.asarray(
        np.random.RandomState(3).randn(2, 3, 4, 16, 16), jnp.float32
    )

    def dec(feats, dirs):
        m = feats.mean(1)
        return {"rgb": jax.nn.sigmoid(m[..., :3]), "sigma": m.sum(-1, keepdims=True)}

    intr = jnp.broadcast_to(camera.FFHQ_INTRINSICS, (2, 3, 3))

    def render(planes, c2w, options):
        o, d = sample_rays(c2w, intr, 8)  # rays computed inside the jit
        rgb, depth, w = render_rays(planes, dec, o, d, options, rng=None)
        return rgb, depth

    want_rgb, want_depth = jax.jit(
        lambda p, c: render(p, c, opts))(planes, c2w)

    sp_opts = dict(opts, ray_sharding=NamedSharding(mesh, P("data", "rays", None)))
    bsh = NamedSharding(mesh, P("data"))
    f = jax.jit(lambda p, c: render(p, c, sp_opts),
                in_shardings=(bsh, bsh))
    got_rgb, got_depth = f(
        jax.device_put(planes, bsh), jax.device_put(c2w, bsh))
    np.testing.assert_allclose(np.asarray(got_rgb), np.asarray(want_rgb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_depth), np.asarray(want_depth),
                               rtol=1e-4, atol=1e-5)


def test_orbit_frames_sharded_matches_single_device():
    """Frame-axis data parallelism for video generation (VERDICT r2 item 5):
    the orbit chunk sharded P('data') over 8 devices with planes/ws/params
    replicated must produce the single-device frames exactly — the flagship
    workload (`/root/reference/g_nerf/gen_videos.py:154-183`) on the mesh."""
    from gnerf_tpu.models import TriPlaneGenerator
    from gnerf_tpu.infer.gen_videos import orbit_label

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
    params = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16))
    c0 = jnp.zeros((1, 25))
    ws = g.mapping(params, z, c0)
    planes = g.backbone_planes(params, ws, noise_mode="const", pack=True)
    labels = jnp.concatenate(
        [orbit_label(i, 8, "ffhq", g.rendering_kwargs) for i in range(8)],
        axis=0,
    )

    def one(c):
        out = g.render_planes(params, planes, c[None], ws,
                              neural_rendering_resolution=8,
                              noise_mode="const")
        return out["image"], out["image_raw"]

    want_img, want_raw = jax.jit(lambda cs: jax.lax.map(one, cs))(labels)

    mesh = make_mesh(data=8, devices=jax.devices()[:8])
    repl = NamedSharding(mesh, P())
    fsh = NamedSharding(mesh, P("data", None))
    osh = NamedSharding(mesh, P("data", None, None, None, None))
    f = jax.jit(lambda cs: jax.vmap(one)(cs),
                in_shardings=(fsh,), out_shardings=(osh, osh))
    got_img, got_raw = f(jax.device_put(labels, fsh))
    np.testing.assert_allclose(np.asarray(got_img), np.asarray(want_img),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_raw), np.asarray(want_raw),
                               rtol=1e-4, atol=1e-4)

    # 2-D frames x rays inference mesh (gen_videos --ray_shards): the
    # in-frame ray constraint composes with the frame axis via vmap's
    # spmd_axis_name — results must still match the single-device frames.
    mesh2 = make_mesh(data=2, rays=4, devices=jax.devices()[:8])
    rk2 = {"ray_sharding": NamedSharding(mesh2, P(None, "rays", None))}

    def one_sp(c):
        out = g.render_planes(params, planes, c[None], ws,
                              neural_rendering_resolution=8,
                              noise_mode="const", rendering_kwargs=rk2)
        return out["image"], out["image_raw"]

    fsh2 = NamedSharding(mesh2, P("data", None))
    osh2 = NamedSharding(mesh2, P("data", None, None, None, None))
    f2 = jax.jit(lambda cs: jax.vmap(one_sp, spmd_axis_name="data")(cs),
                 in_shardings=(fsh2,), out_shardings=(osh2, osh2))
    got_img2, got_raw2 = f2(jax.device_put(labels, fsh2))
    np.testing.assert_allclose(np.asarray(got_img2), np.asarray(want_img),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_raw2), np.asarray(want_raw),
                               rtol=1e-4, atol=1e-4)


def test_multihost_init_disabled_by_default(monkeypatch):
    """init_distributed is a no-op (returns False) without the flag/env —
    single-process behavior unchanged; process_info reports (0, 1)."""
    from gnerf_tpu.parallel import init_distributed, process_info

    monkeypatch.delenv("GNERF_DISTRIBUTED", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert init_distributed() is False
    rank, world = process_info()
    assert (rank, world) == (0, 1)


@pytest.mark.slow
def test_full_pipeline_train_step_8device_mesh():
    """CI guard for the driver's multichip gate (round-1 red item): the FULL
    training step — encoder + generator + depth-D + VGG LPIPS + both Adams +
    R1 — jitted over an 8-device ('data',) mesh with replicated params and
    batch sharding, one real step. Mirrors reference collective semantics at
    `training_loop.py:388-437` (grad all-reduce == pjit-inserted psum)."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
