"""Tests for the training layer: losses, masking, a full train step."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gnerf_tpu.models import Discriminator, ResNeXt50Encoder, TriPlaneGenerator
from gnerf_tpu.training import (
    SyntheticDataset,
    TrainConfig,
    VGG16LPIPS,
    data_iterator,
    init_train_state,
    lpips_distance,
    make_optimizers,
    make_train_step,
    masked_mean,
    r1_penalty,
    ssim,
)


def _torch_ssim(x, y, data_range=1.0, win_size=11, sigma=1.5):
    """Independent SSIM oracle in stock torch (gaussian window, valid pad)."""
    coords = torch.arange(win_size, dtype=torch.float64) - (win_size - 1) / 2
    g = torch.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = (g / g.sum()).float()
    C = x.shape[1]
    kh = g.view(1, 1, -1, 1).repeat(C, 1, 1, 1)
    kw = g.view(1, 1, 1, -1).repeat(C, 1, 1, 1)

    def blur(t):
        t = F.conv2d(t, kh, groups=C)
        return F.conv2d(t, kw, groups=C)

    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    mx, my = blur(x), blur(y)
    sx = blur(x * x) - mx * mx
    sy = blur(y * y) - my * my
    sxy = blur(x * y) - mx * my
    ssim_map = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
        (mx * mx + my * my + c1) * (sx + sy + c2)
    )
    return ssim_map.mean(dim=(1, 2, 3))


def test_ssim_matches_torch_oracle():
    rng = np.random.RandomState(0)
    x = rng.rand(3, 3, 32, 32).astype(np.float32)
    y = np.clip(x + rng.randn(3, 3, 32, 32).astype(np.float32) * 0.1, 0, 1)
    got = ssim(jnp.asarray(x), jnp.asarray(y), data_range=1.0, size_average=False)
    want = _torch_ssim(torch.from_numpy(x), torch.from_numpy(y))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-3, atol=1e-4)
    # Identical images -> SSIM 1.
    one = ssim(jnp.asarray(x), jnp.asarray(x), size_average=True)
    np.testing.assert_allclose(float(one), 1.0, atol=1e-5)


def test_lpips_distance_properties():
    vgg = VGG16LPIPS(resize_to=64)
    p = vgg.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1)
    b = jnp.asarray(rng.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1)
    d_ab = lpips_distance(vgg, p, a, b)
    d_aa = lpips_distance(vgg, p, a, a)
    assert d_ab.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_aa), 0.0, atol=1e-8)
    assert np.all(np.asarray(d_ab) > 0)


def test_lpips_training_distance_matches_and_grads():
    """lpips_training_distance == lpips_distance in value, and its grad
    w.r.t. the PREDICTION equals the fused form's (the target side is
    constant either way; the training variant just never builds its conv
    backward — losses.lpips_embed docstring)."""
    from gnerf_tpu.training import lpips_training_distance

    vgg = VGG16LPIPS(resize_to=64)
    p = vgg.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    tgt = jnp.asarray(rng.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1)
    pred = jnp.asarray(rng.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1)
    d_fused = lpips_distance(vgg, p, tgt, pred)
    d_split = lpips_training_distance(vgg, p, tgt, pred)
    np.testing.assert_allclose(np.asarray(d_split), np.asarray(d_fused),
                               rtol=1e-5, atol=1e-6)
    g_fused = jax.grad(lambda x: lpips_distance(vgg, p, tgt, x).sum())(pred)
    g_split = jax.grad(
        lambda x: lpips_training_distance(vgg, p, tgt, x).sum())(pred)
    np.testing.assert_allclose(np.asarray(g_split), np.asarray(g_fused),
                               rtol=1e-4, atol=1e-6)


def test_lpips_pre_resize_commutes():
    """The train step hoists vgg.apply's internal resize out (to batch the
    raw/full tiers): resizing before the 0..255 affine must equal the
    internal resize-after path (bilinear weights sum to 1, so the affine
    commutes)."""
    from gnerf_tpu.ops.interpolate import interpolate_bilinear
    from gnerf_tpu.training import lpips_embed

    vgg = VGG16LPIPS(resize_to=64)
    p = vgg.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1)
    internal = lpips_embed(vgg, p, x)  # apply resizes 32 -> 64 itself
    pre = interpolate_bilinear(x, 64, 64, antialias=vgg.antialias)
    external = lpips_embed(vgg, p, pre)
    np.testing.assert_allclose(np.asarray(external), np.asarray(internal),
                               rtol=1e-5, atol=1e-6)


def test_masked_mean():
    v = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    f = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    np.testing.assert_allclose(float(masked_mean(v, f)), 2.0, rtol=1e-5)
    # All-masked is finite (the +eps guard).
    assert np.isfinite(float(masked_mean(v, jnp.zeros(4))))


def test_r1_penalty_analytic():
    # D(x) = a * sum(x^2) per-sample -> dD/dx = 2ax -> penalty = 4a^2 sum(x^2).
    a = 1.5
    x = jnp.asarray(np.random.RandomState(2).randn(3, 2, 4, 4).astype(np.float32))

    def d_apply(imgs):
        return a * jnp.sum(jnp.square(imgs), axis=(1, 2, 3))

    pen = r1_penalty(d_apply, x)
    want = 4 * a * a * np.sum(np.square(np.asarray(x)), axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(pen), want, rtol=1e-4)


def _tiny_setup(train_gen=True, gan_depth=True):
    render_res = 8
    g = TriPlaneGenerator(
        z_dim=32, w_dim=32, img_resolution=128, plane_resolution=16,
        channel_base=512, channel_max=32, mapping_layers=2,
        neural_rendering_resolution=render_res,
        rendering_kwargs=dict(
            TriPlaneGenerator().rendering_kwargs,
            superresolution_module="SuperresolutionHybrid2X",
            depth_resolution=4, depth_resolution_importance=4,
        ),
    )
    enc = ResNeXt50Encoder(out_dim=g.z_dim)
    disc = Discriminator(c_dim=25, img_resolution=render_res, img_channels=1,
                         channel_base=256, channel_max=32, mbstd_group_size=1)
    vgg = VGG16LPIPS(resize_to=32)
    cfg = TrainConfig(batch_size=2, neural_rendering_resolution=render_res,
                      gan_depth=gan_depth, train_en=True, train_gen=train_gen)
    return g, enc, disc, vgg, cfg


@pytest.mark.slow
def test_train_step_runs_and_updates():
    g, enc, disc, vgg, cfg = _tiny_setup(train_gen=True)
    state = init_train_state(g, enc, disc, vgg, cfg, jax.random.PRNGKey(0))
    opt_g, opt_d = make_optimizers(g, state.params_e, state.params_g, cfg)
    step = jax.jit(make_train_step(g, enc, disc, vgg, opt_g, opt_d, cfg))

    ds = SyntheticDataset(resolution=16, depth_resolution=8, size=8)
    batch = {k: jnp.asarray(v) for k, v in next(data_iterator(ds, 2)).items()}
    new_state, stats = step(state, batch, jax.random.PRNGKey(1))

    assert np.isfinite(float(stats["Loss/G/total"]))
    assert np.isfinite(float(stats["Loss/D/total"]))
    assert int(new_state.cur_nimg) == 2
    # Params actually moved.
    before = np.asarray(state.params_g["decoder"]["fc0"]["weight"])
    after = np.asarray(new_state.params_g["decoder"]["fc0"]["weight"])
    assert not np.allclose(before, after)
    # Encoder BN state updated (train mode).
    assert not np.allclose(
        np.asarray(state.state_e["bn1"]["mean"]),
        np.asarray(new_state.state_e["bn1"]["mean"]),
    )
    # D moved too.
    d_before = np.asarray(jax.tree_util.tree_leaves(state.params_d)[0])
    d_after = np.asarray(jax.tree_util.tree_leaves(new_state.params_d)[0])
    assert not np.allclose(d_before, d_after)


@pytest.mark.slow
def test_train_step_respects_frozen_generator():
    g, enc, disc, vgg, cfg = _tiny_setup(train_gen=False, gan_depth=False)
    state = init_train_state(g, enc, disc, vgg, cfg, jax.random.PRNGKey(0))
    opt_g, opt_d = make_optimizers(g, state.params_e, state.params_g, cfg)
    step = jax.jit(make_train_step(g, enc, disc, vgg, opt_g, opt_d, cfg))

    ds = SyntheticDataset(resolution=16, depth_resolution=8, size=8)
    batch = {k: jnp.asarray(v) for k, v in next(data_iterator(ds, 2)).items()}
    new_state, _ = step(state, batch, jax.random.PRNGKey(1))

    # G frozen except mapping (z_dim != 512 -> mapping trains with E).
    before = np.asarray(state.params_g["decoder"]["fc0"]["weight"])
    after = np.asarray(new_state.params_g["decoder"]["fc0"]["weight"])
    np.testing.assert_allclose(before, after)
    m_before = np.asarray(state.params_g["backbone"]["mapping"]["fc0"]["weight"])
    m_after = np.asarray(new_state.params_g["backbone"]["mapping"]["fc0"]["weight"])
    assert not np.allclose(m_before, m_after)
    # Encoder trains.
    e_before = np.asarray(state.params_e["conv1"])
    e_after = np.asarray(new_state.params_e["conv1"])
    assert not np.allclose(e_before, e_after)


def test_synthetic_dataset_contract():
    ds = SyntheticDataset(resolution=32, depth_resolution=8, size=16)
    item = ds[0]
    assert item["condition_image"].shape == (3, 32, 32)
    assert item["condition_c"].shape == (25,)
    assert item["c_depth_image"].shape == (1, 8, 8)
    c2w = item["loss_c"][:16].reshape(4, 4)
    # Valid rigid transform: orthonormal rotation, camera at radius 2.7.
    r = c2w[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(c2w[:3, 3]), 2.7, rtol=1e-5)
    batch = next(data_iterator(ds, 4))
    assert batch["condition_image"].shape == (4, 3, 32, 32)
    assert batch["factor"].shape == (4,)


def test_run_training_preset_override(tmp_path, capsys):
    """--preset decouples the rendering recipe from the data source: a
    synthetic-data run with --preset ffhq must resolve the FLAGSHIP shape
    (512^2 output, 8XDC SR, 48+48 spp) in its dumped options."""
    import json as _json

    from gnerf_tpu.training.train import run_training

    run_training(str(tmp_path), dataset_name="synthetic", preset="ffhq",
                 batch=4, kimg=1, tick=1, dry_run=True)
    out = capsys.readouterr().out
    options = _json.loads(out[out.index("{") : out.rindex("}") + 1])
    assert options["preset"] == "ffhq"
    gen = options["generator"]
    assert gen["img_resolution"] == 512
    rk = gen["rendering_kwargs"]
    assert rk["superresolution_module"] == "SuperresolutionHybrid8XDC"
    assert rk["depth_resolution"] == 48
    assert rk["depth_resolution_importance"] == 48
