"""Tests for the PTI fine-tuning harness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnerf_tpu.models import TriPlaneGenerator
from gnerf_tpu.training import VGG16LPIPS
from gnerf_tpu.training.pti import (
    PTIConfig,
    init_pti_state,
    make_optimizer,
    make_pti_step,
    morphed_w_code,
    run_pti,
)


def _tiny():
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
    vgg = VGG16LPIPS(resize_to=32)
    return g, vgg


def test_morphed_w_code_distance():
    fixed = jnp.zeros((1, 5, 8))
    new = jnp.ones((1, 5, 8))
    out = morphed_w_code(new, fixed, alpha=3.0)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out - fixed)), 3.0, rtol=1e-5)


@pytest.mark.slow
def test_pti_step_freezes_sr_and_reduces_loss():
    g, vgg = _tiny()
    params_g = g.init(jax.random.PRNGKey(0))
    params_vgg = vgg.init(jax.random.PRNGKey(1))
    cfg = PTIConfig(lr=1e-2, neural_rendering_resolution=8, l1_lambda=1.0)

    z = jax.random.normal(jax.random.PRNGKey(2), (1, 16))
    ws = g.mapping(params_g, z, jnp.zeros((1, 25)))
    from gnerf_tpu.utils import camera

    c = camera.pose_to_label(
        camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7),
        camera.FFHQ_INTRINSICS,
    )
    target = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 16, 16),
                                minval=-1, maxval=1)

    state = init_pti_state(g, params_g, vgg, params_vgg, cfg)
    opt = make_optimizer(params_g, cfg)
    step = jax.jit(make_pti_step(g, vgg, cfg, opt))
    batch = {"ws": ws, "loss_image": target, "loss_c": c}

    losses = []
    for i in range(5):
        state, stats = step(state, batch, jax.random.PRNGKey(10 + i))
        losses.append(float(stats["Loss/pti/total"]))
    assert losses[-1] < losses[0], losses
    # SR frozen, decoder tuned.
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state["params_g"]["superresolution"])[0]),
        np.asarray(jax.tree_util.tree_leaves(params_g["superresolution"])[0]),
    )
    assert not np.allclose(
        np.asarray(state["params_g"]["decoder"]["fc0"]["weight"]),
        np.asarray(params_g["decoder"]["fc0"]["weight"]),
    )
    # Original G untouched.
    np.testing.assert_allclose(
        np.asarray(state["params_g_original"]["decoder"]["fc0"]["weight"]),
        np.asarray(params_g["decoder"]["fc0"]["weight"]),
    )


@pytest.mark.slow
def test_pti_locality_regularizer_runs():
    g, vgg = _tiny()
    params_g = g.init(jax.random.PRNGKey(0))
    params_vgg = vgg.init(jax.random.PRNGKey(1))
    cfg = PTIConfig(lr=1e-3, neural_rendering_resolution=8,
                    use_locality_reg=True, latent_ball_num_of_samples=1)
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 16))
    ws = g.mapping(params_g, z, jnp.zeros((1, 25)))
    from gnerf_tpu.utils import camera

    c = camera.pose_to_label(
        camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7),
        camera.FFHQ_INTRINSICS,
    )
    target = jnp.zeros((1, 3, 16, 16))
    tuned, history = run_pti(g, params_g, vgg, params_vgg, ws, target, c,
                             num_steps=2, cfg=cfg)
    assert len(history) == 2 and all(np.isfinite(history))


@pytest.mark.slow
def test_project_w_recovers_known_latent_direction():
    """w-projector (the reference PTI harness's MISSING w_projector module):
    projecting an image the generator itself produced must descend in loss
    and land closer to the source w than the w_avg start."""
    from gnerf_tpu.training.pti import project_w
    from gnerf_tpu.utils import camera

    g, vgg = _tiny()
    params_g = g.init(jax.random.PRNGKey(0))
    params_vgg = vgg.init(jax.random.PRNGKey(1))
    c = camera.pose_to_label(
        camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7),
        camera.FFHQ_INTRINSICS,
    )
    z_true = jax.random.normal(jax.random.PRNGKey(7), (1, 16)) * 2.0
    ws_true = g.mapping(params_g, z_true, jnp.zeros((1, 25)))
    target = g.synthesis(params_g, ws_true, c, noise_mode="none")["image"]

    ws, hist = project_w(
        g, params_g, vgg, params_vgg, target, c,
        num_steps=12, w_avg_samples=32, initial_lr=0.05,
        initial_noise_factor=0.0, rng=jax.random.PRNGKey(3),
    )
    assert ws.shape == (1, g.num_ws, g.w_dim)
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0], hist
    # Closer to the source w than the w_avg start (direction recovered).
    w_avg = jnp.mean(
        g.mapping(params_g,
                  jax.random.normal(jax.random.PRNGKey(8), (32, 16)),
                  jnp.zeros((32, 25)))[:, :1, :], axis=0, keepdims=True)
    d_start = float(jnp.linalg.norm(w_avg[:, 0] - ws_true[:, 0]))
    d_end = float(jnp.linalg.norm(ws[:, :1][:, 0] - ws_true[:, 0]))
    assert d_end < d_start, (d_end, d_start)


@pytest.mark.slow
def test_run_pti_cli_e2e(tmp_path):
    """The train_generator CLI surface: checkpoint in, tuned snapshot out;
    SR stays frozen, non-SR params move, loss history is finite."""
    from gnerf_tpu.models import ResNeXt50Encoder
    from gnerf_tpu.training.pti import run_pti_cli
    from gnerf_tpu.utils import checkpoint as ckpt_lib

    g, _ = _tiny()
    params_g = g.init(jax.random.PRNGKey(0))
    enc = ResNeXt50Encoder(out_dim=g.z_dim)
    params_e, state_e = enc.init(jax.random.PRNGKey(1))
    gen_cfg = dict(
        z_dim=16, w_dim=16, img_resolution=128, plane_resolution=16,
        channel_base=256, channel_max=32, mapping_layers=2,
        neural_rendering_resolution=8,
        rendering_kwargs=g.rendering_kwargs,
    )
    net = str(tmp_path / "snap.npz")
    ckpt_lib.save_checkpoint(
        net, {"G_ema": params_g, "E": params_e, "E_state": state_e},
        config={"generator": gen_cfg})

    out_path, history = run_pti_cli(
        network=net, dataset_name="synthetic", outdir=str(tmp_path / "pti"),
        steps=3, max_items=2)
    assert len(history) == 3 and all(np.isfinite(h) for h in history)
    trees, cfg_out = ckpt_lib.load_checkpoint(out_path)
    tuned = trees["G_ema"]
    assert cfg_out["pti"]["num_items"] == 2
    # SR frozen bit-exactly; at least one non-SR leaf moved.
    for (ka, la), (kb, lb) in zip(
        jax.tree_util.tree_flatten_with_path(params_g["superresolution"])[0],
        jax.tree_util.tree_flatten_with_path(tuned["superresolution"])[0],
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    moved = any(
        not np.allclose(np.asarray(la), np.asarray(lb))
        for la, lb in zip(jax.tree_util.tree_leaves(params_g["backbone"]),
                          jax.tree_util.tree_leaves(tuned["backbone"]))
    )
    assert moved
