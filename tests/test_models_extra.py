"""Tests for StyleGAN3, dual discriminators, EG3D loss, profiling, cross-sections."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gnerf_tpu.models import (
    DualDiscriminator,
    DummyDualDiscriminator,
    SingleDiscriminator,
    TriPlaneGenerator,
    filtered_resizing,
    stylegan3,
)


def test_sg3_modulated_conv_matches_torch():
    rng = np.random.RandomState(0)
    N, I, O, k, H = 2, 4, 6, 3, 8
    x = rng.randn(N, I, H, H).astype(np.float32)
    w = rng.randn(O, I, k, k).astype(np.float32)
    s = rng.rand(N, I).astype(np.float32) + 0.5
    gain = np.float32(0.7)

    got = np.asarray(stylegan3.sg3_modulated_conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
        padding=k - 1, input_gain=jnp.asarray(gain),
    ))

    # Oracle: SG3 math with stock torch (pre-normalize, modulate, demod,
    # input gain, grouped conv).
    tw = torch.from_numpy(w)
    ts = torch.from_numpy(s)
    tw = tw * tw.square().mean(dim=[1, 2, 3], keepdim=True).rsqrt()
    ts = ts * ts.square().mean().rsqrt()
    tw = tw[None] * ts[:, None, :, None, None]
    d = (tw.square().sum(dim=[2, 3, 4]) + 1e-8).rsqrt()
    tw = tw * d[:, :, None, None, None]
    tw = tw * gain
    outs = [F.conv2d(torch.from_numpy(x[i:i+1]), tw[i], padding=k - 1)
            for i in range(N)]
    want = torch.cat(outs).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_sg3_design_lowpass_filter():
    f = stylegan3.design_lowpass_filter(12, cutoff=2.0, width=2.0, fs=16)
    assert f.shape == (12,)
    np.testing.assert_allclose(f.sum(), 1.0, rtol=1e-5)
    fr = stylegan3.design_lowpass_filter(12, cutoff=2.0, width=2.0, fs=16, radial=True)
    assert fr.shape == (12, 12)
    np.testing.assert_allclose(fr.sum(), 1.0, rtol=1e-5)
    assert stylegan3.design_lowpass_filter(1, 2.0, 2.0, 16) is None


def test_sg3_generator_tiny_forward():
    g = stylegan3.Generator(z_dim=16, c_dim=0, w_dim=32, img_resolution=32,
                            img_channels=3, channel_base=1024, channel_max=32,
                            num_layers=6)
    p = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    img = g.apply(p, z, None)
    assert img.shape == (2, 3, 32, 32)
    assert np.isfinite(np.asarray(img)).all()
    # Deterministic (no noise inputs in SG3).
    img2 = g.apply(p, z, None)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2))


def test_filtered_resizing_modes():
    from gnerf_tpu.ops import setup_filter

    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(1, 3, 16, 16), jnp.float32)
    f = setup_filter([1, 3, 3, 1])
    for mode in ("antialiased", "classic", "none", 0.5):
        out = filtered_resizing(img, 32, f, filter_mode=mode)
        assert out.shape == (1, 3, 32, 32), mode
        assert np.isfinite(np.asarray(out)).all(), mode
    # 'antialiased' upsample matches torch interpolate.
    want = F.interpolate(torch.from_numpy(np.asarray(img)), size=(32, 32),
                         mode="bilinear", align_corners=False, antialias=True)
    got = filtered_resizing(img, 32, f, filter_mode="antialiased")
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)


def test_dual_discriminators_shapes():
    imgs = {
        "image": jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32)),
        "image_raw": jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16)),
    }
    c = jax.random.normal(jax.random.PRNGKey(2), (2, 25))
    for cls in (SingleDiscriminator, DualDiscriminator, DummyDualDiscriminator):
        d = cls(c_dim=25, img_resolution=32, img_channels=3,
                channel_base=512, channel_max=32, mbstd_group_size=1)
        p = d.init(jax.random.PRNGKey(3))
        out = d.apply(p, imgs, c)
        assert out.shape == (2, 1), cls.__name__
        assert np.isfinite(np.asarray(out)).all(), cls.__name__


def _tiny_g():
    return TriPlaneGenerator(
        z_dim=16, w_dim=16, img_resolution=128, plane_resolution=16,
        channel_base=256, channel_max=32, mapping_layers=2,
        neural_rendering_resolution=8,
        rendering_kwargs=dict(
            TriPlaneGenerator().rendering_kwargs,
            superresolution_module="SuperresolutionHybrid2X",
            depth_resolution=4, depth_resolution_importance=4,
        ),
    )


@pytest.mark.slow
def test_eg3d_train_step_tiny():
    from gnerf_tpu.training.eg3d_loss import (
        EG3DLossConfig,
        init_eg3d_state,
        make_eg3d_train_step,
    )

    g = _tiny_g()
    disc = DualDiscriminator(c_dim=25, img_resolution=16, img_channels=3,
                             channel_base=256, channel_max=32, mbstd_group_size=1)
    cfg = EG3DLossConfig(neural_rendering_resolution=8,
                         density_reg=0.25, density_reg_points=16, r1_gamma=1.0)
    step, opt_g, opt_d = make_eg3d_train_step(g, disc, cfg)
    state = init_eg3d_state(g, disc, opt_g, opt_d, jax.random.PRNGKey(0))

    batch = {
        "z": jax.random.normal(jax.random.PRNGKey(1), (2, 16)),
        "c": jax.random.normal(jax.random.PRNGKey(2), (2, 25)),
        "real_image": jax.random.normal(jax.random.PRNGKey(3), (2, 3, 16, 16)),
        "real_c": jax.random.normal(jax.random.PRNGKey(4), (2, 25)),
    }
    new_state, stats = jax.jit(step)(state, batch, jax.random.PRNGKey(5))
    for k in ("Loss/G/total", "Loss/D/total", "Loss/G/density_reg", "Loss/D/reg"):
        assert np.isfinite(float(stats[k])), (k, stats[k])
    # Both nets moved.
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(state["params_g"])[0]),
        np.asarray(jax.tree_util.tree_leaves(new_state["params_g"])[0]),
    )
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(state["params_d"])[0]),
        np.asarray(jax.tree_util.tree_leaves(new_state["params_d"])[0]),
    )


def test_eg3d_train_step_tiny_bf16():
    """cfg.dtype=bf16 runs G synthesis + both D stacks in bfloat16 (the
    fp32 islands: losses, R1, Adams) — step stays finite, both nets move,
    and the params/opt state remain fp32 (low precision is compute-only)."""
    from gnerf_tpu.training.eg3d_loss import (
        EG3DLossConfig,
        init_eg3d_state,
        make_eg3d_train_step,
    )

    g = _tiny_g()
    disc = DualDiscriminator(c_dim=25, img_resolution=16, img_channels=3,
                             channel_base=256, channel_max=32,
                             mbstd_group_size=1)
    cfg = EG3DLossConfig(neural_rendering_resolution=8,
                         density_reg=0.25, density_reg_points=16,
                         r1_gamma=1.0, dtype=jnp.bfloat16,
                         # exercise the bf16 augment pipe (incl. R1's
                         # double-backward through the bf16 warp)
                         aug="fixed", aug_p=0.5)
    step, opt_g, opt_d = make_eg3d_train_step(g, disc, cfg)
    state = init_eg3d_state(g, disc, opt_g, opt_d, jax.random.PRNGKey(0))

    batch = {
        "z": jax.random.normal(jax.random.PRNGKey(1), (2, 16)),
        "c": jax.random.normal(jax.random.PRNGKey(2), (2, 25)),
        "real_image": jax.random.normal(jax.random.PRNGKey(3), (2, 3, 16, 16)),
        "real_c": jax.random.normal(jax.random.PRNGKey(4), (2, 25)),
    }
    new_state, stats = jax.jit(step)(state, batch, jax.random.PRNGKey(5))
    for k in ("Loss/G/total", "Loss/D/total", "Loss/G/density_reg",
              "Loss/D/reg"):
        assert np.isfinite(float(stats[k])), (k, stats[k])
    for leaf in jax.tree_util.tree_leaves(new_state["params_g"]):
        assert leaf.dtype != jnp.bfloat16
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(state["params_g"])[0]),
        np.asarray(jax.tree_util.tree_leaves(new_state["params_g"])[0]),
    )
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(state["params_d"])[0]),
        np.asarray(jax.tree_util.tree_leaves(new_state["params_d"])[0]),
    )


def test_ada_controller_dynamics():
    """r_t-feedback p controller (upstream ADA heuristic): p climbs while
    D is too confident on reals (rt > target), decays when below, clips to
    [0, 1], and sweeps 0->1 in ada_kimg kimg."""
    from gnerf_tpu.training.eg3d_loss import EG3DLossConfig, ada_update_p

    cfg = EG3DLossConfig(aug="ada", ada_target=0.6, ada_interval=4,
                         ada_kimg=500.0)
    batch = 32
    step = batch * cfg.ada_interval / (cfg.ada_kimg * 1000)
    p = 0.5
    assert ada_update_p(p, rt=0.9, batch_size=batch, cfg=cfg) == pytest.approx(p + step)
    assert ada_update_p(p, rt=0.1, batch_size=batch, cfg=cfg) == pytest.approx(p - step)
    assert ada_update_p(0.0, rt=0.1, batch_size=batch, cfg=cfg) == 0.0
    assert ada_update_p(1.0, rt=0.9, batch_size=batch, cfg=cfg) == 1.0
    # Simulated overfitting run: rt pinned at 1 -> p rises monotonically.
    p = 0.0
    for _ in range(100):
        p2 = ada_update_p(p, rt=1.0, batch_size=batch, cfg=cfg)
        assert p2 >= p
        p = p2
    assert p == pytest.approx(100 * step)


@pytest.mark.slow
def test_eg3d_train_step_with_ada_tiny():
    """EG3D step with the bgc AugmentPipe live in the D path: finite losses,
    both nets move, and gradients flow THROUGH the augmented inputs (the
    R1 term differentiates through the pipe)."""
    from gnerf_tpu.training.eg3d_loss import (
        EG3DLossConfig,
        init_eg3d_state,
        make_eg3d_train_step,
    )

    g = _tiny_g()
    disc = DualDiscriminator(c_dim=25, img_resolution=16, img_channels=3,
                             channel_base=256, channel_max=32, mbstd_group_size=1)
    cfg = EG3DLossConfig(neural_rendering_resolution=8,
                         density_reg=0.25, density_reg_points=16, r1_gamma=1.0,
                         aug="fixed", aug_p=0.8)
    step, opt_g, opt_d = make_eg3d_train_step(g, disc, cfg)
    state = init_eg3d_state(g, disc, opt_g, opt_d, jax.random.PRNGKey(0))

    batch = {
        "z": jax.random.normal(jax.random.PRNGKey(1), (2, 16)),
        "c": jax.random.normal(jax.random.PRNGKey(2), (2, 25)),
        "real_image": jax.random.normal(jax.random.PRNGKey(3), (2, 3, 16, 16)),
        "real_c": jax.random.normal(jax.random.PRNGKey(4), (2, 25)),
    }
    new_state, stats = jax.jit(step)(state, batch, jax.random.PRNGKey(5),
                                     0.0, 0.8)
    for k in ("Loss/G/total", "Loss/D/total", "Loss/D/reg", "Loss/signs/real"):
        assert np.isfinite(float(stats[k])), (k, stats[k])
    assert -1.0 <= float(stats["Loss/signs/real"]) <= 1.0
    for side in ("params_g", "params_d"):
        assert not np.allclose(
            np.asarray(jax.tree_util.tree_leaves(state[side])[0]),
            np.asarray(jax.tree_util.tree_leaves(new_state[side])[0]),
        )


def test_eg3d_schedules_and_blur():
    from gnerf_tpu.training.eg3d_loss import (
        EG3DLossConfig,
        blur_image,
        blur_kernel_size,
        blur_sigma_schedule,
        swapped_conditioning,
        swapping_prob_schedule,
    )

    cfg = EG3DLossConfig(blur_init_sigma=10.0, blur_fade_kimg=200,
                         gpc_reg_prob=0.5, gpc_reg_fade_kimg=1000)
    assert float(blur_sigma_schedule(0, cfg)) == 10.0
    assert float(blur_sigma_schedule(200_000, cfg)) == 0.0
    assert blur_kernel_size(blur_sigma_schedule(0, cfg)) == 30
    assert blur_kernel_size(blur_sigma_schedule(200_000, cfg)) == 0
    np.testing.assert_allclose(float(swapping_prob_schedule(0, cfg)), 1.0)
    np.testing.assert_allclose(float(swapping_prob_schedule(10_000_000, cfg)), 0.5)
    # the fade must be LIVE for a traced step count (round-1 advisor finding:
    # run_g hardcoded cur_nimg=0, freezing swapping_prob at 1.0 forever)
    halfway = jax.jit(lambda n: swapping_prob_schedule(n, cfg))(
        jnp.int32(500_000)
    )
    np.testing.assert_allclose(float(halfway), 0.75)

    c = jnp.arange(6.0).reshape(3, 2)
    swapped = swapped_conditioning(jax.random.PRNGKey(0), c, 1.0)
    np.testing.assert_allclose(np.asarray(swapped), np.roll(np.asarray(c), 1, 0))
    zeros = swapped_conditioning(jax.random.PRNGKey(0), c, None)
    np.testing.assert_allclose(np.asarray(zeros), 0.0)

    img = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16, 16))
    blurred = blur_image(img, 2.0, blur_kernel_size(2.0))
    assert blurred.shape == img.shape
    assert float(jnp.std(blurred)) < float(jnp.std(img))
    np.testing.assert_allclose(np.asarray(blur_image(img, 1e-8, 0)),
                               np.asarray(img))
    # traced sigma with a static kernel size jits (per-bucket recompile model)
    blurred2 = jax.jit(lambda s: blur_image(img, s, 6))(jnp.float32(2.0))
    np.testing.assert_allclose(np.asarray(blurred2), np.asarray(blurred),
                               rtol=1e-5, atol=1e-6)


def test_neural_resolution_schedule():
    """Render-resolution fade (the reference's commented `loss.py:95-97`
    schedule behind its train.py:184-186 flags): exact endpoints, monotone
    bucketed interior, no-op when final is unset."""
    from gnerf_tpu.training.eg3d_loss import (
        EG3DLossConfig,
        neural_resolution_schedule,
    )

    cfg = EG3DLossConfig(neural_rendering_resolution=64,
                         neural_rendering_resolution_final=128,
                         neural_rendering_resolution_fade_kimg=1000.0,
                         res_bucket=8)
    assert neural_resolution_schedule(0, cfg) == 64
    assert neural_resolution_schedule(2_000_000, cfg) == 128
    mid = neural_resolution_schedule(500_000, cfg)
    assert mid == 96 and mid % 8 == 0
    seq = [neural_resolution_schedule(n, cfg)
           for n in range(0, 1_100_000, 50_000)]
    assert seq == sorted(seq)
    assert all(r % 8 == 0 for r in seq)
    assert len(set(seq)) <= (128 - 64) // 8 + 1  # bounded bucket count

    none_cfg = EG3DLossConfig(neural_rendering_resolution=64)
    assert neural_resolution_schedule(10**9, none_cfg) == 64
    # Endpoints are exact even when final is NOT a bucket multiple.
    odd = EG3DLossConfig(neural_rendering_resolution=64,
                         neural_rendering_resolution_final=100,
                         neural_rendering_resolution_fade_kimg=10.0,
                         res_bucket=8)
    assert neural_resolution_schedule(10_000, odd) == 100
    assert neural_resolution_schedule(0, odd) == 64
    # Downward fade also clips into [final, initial].
    down = EG3DLossConfig(neural_rendering_resolution=128,
                          neural_rendering_resolution_final=64,
                          neural_rendering_resolution_fade_kimg=100.0)
    assert neural_resolution_schedule(0, down) == 128
    assert neural_resolution_schedule(10**9, down) == 64


def test_r1_gamma_schedule():
    from gnerf_tpu.training.eg3d_loss import EG3DLossConfig, r1_gamma_schedule

    cfg = EG3DLossConfig(r1_gamma=10.0, r1_gamma_init=2.0,
                         r1_gamma_fade_kimg=100.0)
    np.testing.assert_allclose(float(r1_gamma_schedule(jnp.float32(0), cfg)), 2.0)
    np.testing.assert_allclose(
        float(r1_gamma_schedule(jnp.float32(50_000), cfg)), 6.0)
    np.testing.assert_allclose(
        float(r1_gamma_schedule(jnp.float32(10**8), cfg)), 10.0)
    # No fade configured -> constant python float (no tracing needed).
    assert r1_gamma_schedule(0, EG3DLossConfig(r1_gamma=7.0)) == 7.0
    # Traced step count jits.
    out = jax.jit(lambda n: r1_gamma_schedule(n, cfg))(jnp.int32(50_000))
    np.testing.assert_allclose(float(out), 6.0)


def test_style_mixing():
    """apply_style_mixing (upstream StyleGAN2 run_G semantics): prob=0 is
    identity; prob=1 keeps index 0 (w_avg feeding) and replaces a suffix of
    ws with the mapping of a fresh z."""
    from gnerf_tpu.training.eg3d_loss import apply_style_mixing

    g = _tiny_g()
    p = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    c = jnp.zeros((2, 25))
    mapping_apply = g.backbone.mapping.apply
    pm = p["backbone"]["mapping"]
    ws = mapping_apply(pm, z, c)

    same = apply_style_mixing(mapping_apply, pm, ws, 16, c,
                              jax.random.PRNGKey(2), 0.0)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(ws))

    mixed = apply_style_mixing(mapping_apply, pm, ws, 16, c,
                               jax.random.PRNGKey(2), 1.0)
    np.testing.assert_array_equal(np.asarray(mixed[:, 0]), np.asarray(ws[:, 0]))
    assert not np.allclose(np.asarray(mixed[:, -1]), np.asarray(ws[:, -1]))
    # The mixed suffix is itself a valid mapping output: all finite, and the
    # split point is shared across the batch (one cutoff per batch).
    diff = np.any(np.asarray(mixed) != np.asarray(ws), axis=2)  # [N, num_ws]
    assert (diff[0] == diff[1]).all()
    cut = np.argmax(diff[0])
    assert diff[0, cut:].all() and not diff[0, :cut].any()
    # jit-safe (cutoff is traced).
    jmixed = jax.jit(
        lambda k: apply_style_mixing(mapping_apply, pm, ws, 16, c, k, 1.0)
    )(jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(jmixed), np.asarray(mixed),
                               rtol=1e-6, atol=1e-6)


def test_fade_sr_compat_check():
    """check_fade_sr_compat: shape-only probe over all reachable res
    buckets — rejects the guardless 2X module under a fade, accepts a
    resize-guarded module, and is a no-op without a fade."""
    from gnerf_tpu.training.eg3d_loss import EG3DLossConfig
    from gnerf_tpu.training.train import check_fade_sr_compat

    g2x = _tiny_g()  # SuperresolutionHybrid2X: output tracks 2*res
    p2x = g2x.init(jax.random.PRNGKey(0))
    cfg = EG3DLossConfig(neural_rendering_resolution=8,
                         neural_rendering_resolution_final=4,
                         neural_rendering_resolution_fade_kimg=1.0,
                         res_bucket=4)
    with pytest.raises(ValueError, match="resize guard"):
        check_fade_sr_compat(g2x, p2x, cfg, img_resolution=16)
    # No fade configured -> no probe, no error.
    check_fade_sr_compat(g2x, p2x,
                         EG3DLossConfig(neural_rendering_resolution=8),
                         img_resolution=16)

    g4x = TriPlaneGenerator(
        z_dim=16, w_dim=16, img_resolution=256, plane_resolution=16,
        channel_base=256, channel_max=32, mapping_layers=2,
        neural_rendering_resolution=8,
        rendering_kwargs=dict(
            TriPlaneGenerator().rendering_kwargs,
            superresolution_module="SuperresolutionHybrid4X",
            sr_input_resolution=8,
            depth_resolution=4, depth_resolution_importance=4,
        ),
    )
    check_fade_sr_compat(g4x, g4x.init(jax.random.PRNGKey(1)), cfg,
                         img_resolution=16)


@pytest.mark.slow
def test_eg3d_train_step_res_fade_bucket():
    """The EG3D step compiles and runs at a render resolution OTHER than
    the config's initial one (the res-fade bucket path): image_raw tracks
    `res`, `image` stays at the SR module's fixed output resolution, and
    losses stay finite."""
    import functools

    from gnerf_tpu.training.eg3d_loss import (
        EG3DLossConfig,
        init_eg3d_state,
        make_eg3d_train_step,
    )

    # The fade needs an SR module with the fixed-input resize guard
    # (reference superresolution.py:48,148,296 — the FFHQ-style variants);
    # sr_input_resolution pins it at tiny scale so `image` stays 16^2 while
    # image_raw tracks the faded render resolution.
    g = TriPlaneGenerator(
        z_dim=16, w_dim=16, img_resolution=256, plane_resolution=16,
        channel_base=256, channel_max=32, mapping_layers=2,
        neural_rendering_resolution=8,
        rendering_kwargs=dict(
            TriPlaneGenerator().rendering_kwargs,
            superresolution_module="SuperresolutionHybrid4X",
            sr_input_resolution=8,
            depth_resolution=4, depth_resolution_importance=4,
        ),
    )
    disc = DualDiscriminator(c_dim=25, img_resolution=16, img_channels=3,
                             channel_base=256, channel_max=32,
                             mbstd_group_size=1)
    cfg = EG3DLossConfig(neural_rendering_resolution=8,
                         neural_rendering_resolution_final=4,
                         neural_rendering_resolution_fade_kimg=1.0,
                         res_bucket=4, density_reg=0.25,
                         density_reg_points=16, r1_gamma=1.0,
                         style_mixing_prob=0.9)
    step, opt_g, opt_d = make_eg3d_train_step(g, disc, cfg)
    state = init_eg3d_state(g, disc, opt_g, opt_d, jax.random.PRNGKey(0))
    batch = {
        "z": jax.random.normal(jax.random.PRNGKey(1), (2, 16)),
        "c": jax.random.normal(jax.random.PRNGKey(2), (2, 25)),
        "real_image": jax.random.normal(jax.random.PRNGKey(3), (2, 3, 16, 16)),
        "real_c": jax.random.normal(jax.random.PRNGKey(4), (2, 25)),
    }
    new_state, stats = jax.jit(functools.partial(step, res=4))(
        state, batch, jax.random.PRNGKey(5))
    for k in ("Loss/G/total", "Loss/D/total", "Loss/D/reg"):
        assert np.isfinite(float(stats[k])), (k, stats[k])
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(state["params_g"])[0]),
        np.asarray(jax.tree_util.tree_leaves(new_state["params_g"])[0]),
    )


def test_cross_section():
    from gnerf_tpu.infer.crosssection import sample_cross_section

    g = _tiny_g()
    p = g.init(jax.random.PRNGKey(0))
    ws = g.mapping(p, jax.random.normal(jax.random.PRNGKey(1), (1, 16)),
                   jnp.zeros((1, 25)))
    sl = sample_cross_section(g, p, ws, resolution=8)
    assert sl.shape == (1, 8, 8)
    assert np.isfinite(np.asarray(sl)).all()


def test_profiled_function_and_timer():
    from gnerf_tpu.utils.profiling import StepTimer, profiled_function

    @profiled_function
    def f(x):
        return x * 2

    np.testing.assert_allclose(np.asarray(f(jnp.ones(3))), 2.0)
    t = StepTimer()
    out = t.tick(64)
    assert "Timing/sec_per_kimg" in out and out["Timing/sec_per_tick"] >= 0


def test_eg3d_freeze_d_layers():
    """Freeze-D (reference --freezed -> networks_stylegan2.py:576-597): the
    first N conv layers of D (forward order: fromrgb, conv0, conv1, skip per
    block, highest res first) must not move over a train step; later layers
    and the epilogue must."""
    import numpy as np

    from gnerf_tpu.models import TriPlaneGenerator
    from gnerf_tpu.models.dual_discriminator import DualDiscriminator
    from gnerf_tpu.training.eg3d_loss import (
        EG3DLossConfig,
        freeze_d_trainable_mask,
        init_eg3d_state,
        make_eg3d_train_step,
    )

    g = TriPlaneGenerator(
        z_dim=16, w_dim=16, img_resolution=128, plane_resolution=16,
        channel_base=256, channel_max=32, mapping_layers=2,
        neural_rendering_resolution=16,
        rendering_kwargs=dict(
            TriPlaneGenerator().rendering_kwargs,
            superresolution_module="SuperresolutionHybrid2X",
            depth_resolution=4, depth_resolution_importance=4,
        ),
    )
    disc = DualDiscriminator(c_dim=25, img_resolution=32, img_channels=3,
                             channel_base=256, channel_max=32,
                             mbstd_group_size=1)
    cfg = EG3DLossConfig(neural_rendering_resolution=16, density_reg=0,
                         r1_gamma=1.0, blur_init_sigma=0.0,
                         freeze_d_layers=3)
    step_fn, opt_g, opt_d = make_eg3d_train_step(g, disc, cfg)
    state = init_eg3d_state(g, disc, opt_g, opt_d, jax.random.PRNGKey(0))

    mask = freeze_d_trainable_mask(disc, state["params_d"], 3)
    flat_mask = jax.tree_util.tree_leaves_with_path(mask)
    assert any(not leaf for _, leaf in flat_mask), "mask froze nothing"
    assert any(leaf for _, leaf in flat_mask), "mask froze everything"
    # Top block: fromrgb + conv0 + conv1 = the 3 frozen layers; skip trains.
    top = f"b{disc._d.block_resolutions[0]}"
    assert not jax.tree_util.tree_leaves(mask[top]["fromrgb"])[0]
    assert not jax.tree_util.tree_leaves(mask[top]["conv0"])[0]
    assert not jax.tree_util.tree_leaves(mask[top]["conv1"])[0]
    assert jax.tree_util.tree_leaves(mask[top]["skip"])[0]

    before = jax.tree_util.tree_map(np.asarray, state["params_d"])
    batch = {
        "z": jax.random.normal(jax.random.PRNGKey(1), (2, 16)),
        "c": jnp.tile(jnp.eye(4).reshape(1, 16), (2, 1)),
        "real_image": jax.random.normal(jax.random.PRNGKey(2), (2, 3, 32, 32)),
        "real_c": jnp.tile(jnp.eye(4).reshape(1, 16), (2, 1)),
    }
    batch["c"] = jnp.concatenate(
        [batch["c"], jnp.tile(jnp.asarray([[4.26, 0, 0.5, 0, 4.26, 0.5, 0, 0, 1.0]]), (2, 1))], axis=1)
    batch["real_c"] = batch["c"]
    state, _ = jax.jit(lambda s, b, k: step_fn(s, b, k, jnp.float32(0.0),
                                               jnp.float32(0.0), blur_size=0))(
        state, batch, jax.random.PRNGKey(3))
    after = jax.tree_util.tree_map(np.asarray, state["params_d"])

    def changed(tree_a, tree_b):
        return any(
            not np.allclose(a, b)
            for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                            jax.tree_util.tree_leaves(tree_b))
        )

    assert not changed(before[top]["fromrgb"], after[top]["fromrgb"])
    assert not changed(before[top]["conv0"], after[top]["conv0"])
    assert not changed(before[top]["conv1"], after[top]["conv1"])
    assert changed(before[top]["skip"], after[top]["skip"])
    # The 4x4 epilogue block (mbstd + final FCs) is never frozen.
    assert changed(before["b4"], after["b4"])


def test_eg3d_lazy_phase_steps_tiny():
    """Lazy regularization (reference training_loop.py:123-124): the main
    phase carries no reg terms, Greg moves only G (density TV, gain =
    g_reg_interval), Dreg moves only D (R1, gain = d_reg_interval), all
    three share optimizer states, and only main advances cur_nimg."""
    from gnerf_tpu.training.eg3d_loss import (
        EG3DLossConfig,
        init_eg3d_state,
        make_eg3d_phase_steps,
    )

    g = _tiny_g()
    disc = DualDiscriminator(c_dim=25, img_resolution=16, img_channels=3,
                             channel_base=256, channel_max=32,
                             mbstd_group_size=1)
    cfg = EG3DLossConfig(neural_rendering_resolution=8,
                         density_reg=0.25, density_reg_points=16,
                         r1_gamma=1.0, g_reg_interval=4, d_reg_interval=16,
                         aug="fixed", aug_p=0.5)
    main, greg, dreg, opt_g, opt_d = make_eg3d_phase_steps(g, disc, cfg)
    assert greg is not None and dreg is not None
    state = init_eg3d_state(g, disc, opt_g, opt_d, jax.random.PRNGKey(0))

    batch = {
        "z": jax.random.normal(jax.random.PRNGKey(1), (2, 16)),
        "c": jax.random.normal(jax.random.PRNGKey(2), (2, 25)),
        "real_image": jax.random.normal(jax.random.PRNGKey(3), (2, 3, 16, 16)),
        "real_c": jax.random.normal(jax.random.PRNGKey(4), (2, 25)),
    }
    s1, stats = jax.jit(main)(state, batch, jax.random.PRNGKey(5))
    assert "Loss/G/density_reg" not in stats and "Loss/D/reg" not in stats
    for k in ("Loss/G/total", "Loss/D/total", "Loss/signs/real"):
        assert np.isfinite(float(stats[k])), k
    assert int(s1["cur_nimg"]) == 2

    g_leaf = lambda s: np.asarray(
        jax.tree_util.tree_leaves(s["params_g"])[0])
    d_leaf = lambda s: np.asarray(
        jax.tree_util.tree_leaves(s["params_d"])[0])

    s2, greg_stats = jax.jit(greg)(s1, batch, jax.random.PRNGKey(6))
    assert np.isfinite(float(greg_stats["Loss/G/density_reg"]))
    assert not np.allclose(g_leaf(s1), g_leaf(s2))
    np.testing.assert_array_equal(d_leaf(s1), d_leaf(s2))
    assert int(s2["cur_nimg"]) == 2  # reg phases do not advance the clock

    s3, dreg_stats = jax.jit(dreg)(s2, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(dreg_stats["Loss/D/reg"]))
    # R1's gradient is tiny at random init for some leaves — assert the
    # tree moved ANYWHERE (exact compare), not one sampled leaf.
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(s2["params_d"]),
                        jax.tree_util.tree_leaves(s3["params_d"])))
    assert moved
    np.testing.assert_array_equal(g_leaf(s2), g_leaf(s3))
    assert int(s3["cur_nimg"]) == 2
