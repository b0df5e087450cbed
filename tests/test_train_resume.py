"""Multi-tick convergence + full-state save/resume (VERDICT round-1 item 6).

Covers reference behaviors at `training_loop.py:314-443` (hot loop descends)
and `:503-560` (snapshot/resume) — and goes beyond the reference by
checkpointing optimizer state for bit-identical continuation (the reference
resume is params-only, SURVEY.md 5.4)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnerf_tpu.models import Discriminator, ResNeXt50Encoder, TriPlaneGenerator
from gnerf_tpu.training import (
    SyntheticDataset,
    TrainConfig,
    VGG16LPIPS,
    data_iterator,
    init_train_state,
    make_optimizers,
    make_train_step,
)
from gnerf_tpu.training.train_loop import (
    load_train_state,
    make_chained_step,
    save_train_state,
)


def tiny_setup(dtype=jnp.float32, batch: int = 4):
    """Tiny-but-complete model graph (same shape recipe as the driver's
    multichip dryrun): full component set, minimal sizes."""
    render_res = 8
    g = TriPlaneGenerator(
        z_dim=64, w_dim=64, img_resolution=128, plane_resolution=32,
        channel_base=2048, channel_max=64, mapping_layers=2,
        neural_rendering_resolution=render_res,
        rendering_kwargs=dict(
            TriPlaneGenerator().rendering_kwargs,
            superresolution_module="SuperresolutionHybrid2X",
            depth_resolution=8, depth_resolution_importance=8,
        ),
    )
    enc = ResNeXt50Encoder(out_dim=g.z_dim)
    disc = Discriminator(c_dim=25, img_resolution=render_res, img_channels=1,
                         channel_base=512, channel_max=64, mbstd_group_size=1)
    vgg = VGG16LPIPS(resize_to=32)
    cfg = TrainConfig(batch_size=batch, neural_rendering_resolution=render_res,
                      gan_depth=True, train_en=True, train_gen=True,
                      dtype=dtype)
    state = init_train_state(g, enc, disc, vgg, cfg, jax.random.PRNGKey(0))
    opt_g, opt_d = make_optimizers(g, state.params_e, state.params_g, cfg)
    step = jax.jit(make_train_step(g, enc, disc, vgg, opt_g, opt_d, cfg))
    ds = SyntheticDataset(resolution=16, depth_resolution=render_res, size=32)
    return g, enc, disc, vgg, cfg, state, step, ds


@pytest.mark.slow
def test_multi_tick_convergence_bf16_with_depth_gan():
    """~50 steps on synthetic data in bf16 with the depth-GAN branch live:
    the reconstruction loss must descend and every stat stay finite (the
    depth-D + R1 dynamics are the fragile part in low precision)."""
    _, _, _, _, _, state, step, ds = tiny_setup(dtype=jnp.bfloat16)
    batches = data_iterator(ds, batch_size=4, seed=1)
    rng = jax.random.PRNGKey(2)
    totals, l1s = [], []
    for i in range(50):
        rng, key = jax.random.split(rng)
        batch = {k: jnp.asarray(v) for k, v in next(batches).items()}
        state, stats = step(state, batch, key)
        t = float(stats["Loss/G/total"])
        assert np.isfinite(t), f"non-finite G loss at step {i}: {stats}"
        assert np.isfinite(float(stats["Loss/D/total"])), f"D diverged at {i}"
        assert np.isfinite(float(stats["Loss/D/r1"])), f"R1 blew up at {i}"
        totals.append(t)
        l1s.append(float(stats["Loss/G/l1_loss_raw"]))
    first, last = np.mean(l1s[:10]), np.mean(l1s[-10:])
    assert last < first, (
        f"reconstruction did not descend: first10={first:.4f} last10={last:.4f}")
    # Params must remain finite too (EMA included).
    for leaf in jax.tree_util.tree_leaves(state.params_g_ema):
        assert bool(jnp.isfinite(leaf).all())


def test_make_chained_step_mechanism():
    """make_chained_step is generic over the step function — verify the
    mechanism bit-exactly with a deterministic stub: state threads through
    all K inner steps, batch i pairs with key i (order matters in the
    recurrence below), and per-step stats come back stacked in step order.

    (A numeric comparison of the REAL GAN step across the scanned vs
    standalone programs is NOT meaningful: at random init the BN/ReLU
    chain chaotically amplifies XLA fusion-order noise to percent-level
    loss differences — the same reason the encoder parity test pins the
    grouped formulation. Real-step coverage is the smoke test below plus
    the flagship --chain training run archived in BASELINE.md.)"""

    def stub_step(state, batch, key):
        # Non-commutative recurrence: wrong batch/key pairing or ordering
        # changes the result, so bit-equality proves the wiring.
        x = state["x"] * 1.5 + batch["v"].sum() * jax.random.uniform(key, ())
        return {"x": x, "n": state["n"] + 1}, {"x_now": x}

    K = 3
    batches = [{"v": jnp.arange(4, dtype=jnp.float32) * (i + 1)}
               for i in range(K)]
    keys = [jax.random.PRNGKey(40 + i) for i in range(K)]

    s = {"x": jnp.float32(2.0), "n": jnp.int32(0)}
    seq_stats = []
    for i in range(K):
        s, st = stub_step(s, batches[i], keys[i])
        seq_stats.append(st)

    chained = jax.jit(make_chained_step(stub_step))
    stacked = {"v": jnp.stack([b["v"] for b in batches])}
    s2, chain_stats = chained({"x": jnp.float32(2.0), "n": jnp.int32(0)},
                              stacked, jnp.stack(keys))
    assert int(s2["n"]) == K
    np.testing.assert_array_equal(np.asarray(s2["x"]), np.asarray(s["x"]))
    for i in range(K):
        np.testing.assert_array_equal(
            np.asarray(chain_stats["x_now"][i]),
            np.asarray(seq_stats[i]["x_now"]))


@pytest.mark.slow
def test_chained_real_step_smoke():
    """K=2 chained REAL train steps in one program: stats stay finite, the
    state actually advances (cur_nimg, and step-1 stats differ from step-0
    — the carry threads), and the final params are finite."""
    g, enc, disc, vgg, cfg, state0, _, ds = tiny_setup()
    K = 2
    batches = data_iterator(ds, batch_size=4, seed=11)
    fixed = [
        {k: jnp.asarray(v) for k, v in next(batches).items()} for _ in range(K)
    ]
    keys = jnp.stack([jax.random.PRNGKey(300 + i) for i in range(K)])
    opt_g, opt_d = make_optimizers(g, state0.params_e, state0.params_g, cfg)
    chained = jax.jit(make_chained_step(
        make_train_step(g, enc, disc, vgg, opt_g, opt_d, cfg)))
    stacked = {k: jnp.stack([b[k] for b in fixed]) for k in fixed[0]}
    state1, stats = chained(state0, stacked, keys)
    stats = jax.device_get(stats)
    assert int(state1.cur_nimg) == K * 4
    for name, v in stats.items():
        assert v.shape[0] == K
        assert np.all(np.isfinite(np.asarray(v, np.float32))), name
    assert not np.allclose(stats["Loss/G/total"][0], stats["Loss/G/total"][1])
    for leaf in jax.tree_util.tree_leaves(state1.params_g_ema):
        assert bool(jnp.isfinite(leaf).all())


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["npz", "orbax"])
def test_save_resume_bit_identical(tmp_path, backend):
    """Save full state mid-run, continue 3 steps; reload into a fresh
    template and replay the same 3 batches: results must be BIT-identical
    (params, EMA, optimizer moments, cur_nimg)."""
    g, enc, disc, vgg, cfg, state, step, ds = tiny_setup()
    batches = data_iterator(ds, batch_size=4, seed=3)
    fixed = [
        {k: jnp.asarray(v) for k, v in next(batches).items()} for _ in range(8)
    ]
    rng_keys = [jax.random.PRNGKey(100 + i) for i in range(8)]
    for i in range(5):
        state, _ = step(state, fixed[i], rng_keys[i])

    path = str(tmp_path / ("ts.npz" if backend == "npz" else "ts_orbax"))
    save_train_state(path, state, config={"note": "test"}, backend=backend)

    # Branch A: continue in-memory.
    state_a = state
    for i in range(5, 8):
        state_a, _ = step(state_a, fixed[i], rng_keys[i])

    # Branch B: fresh template <- checkpoint, replay the same steps.
    template = init_train_state(g, enc, disc, vgg, cfg, jax.random.PRNGKey(9))
    state_b, config = load_train_state(path, template, backend=backend)
    assert config == {"note": "test"}
    assert int(state_b.cur_nimg) == 5 * 4
    for i in range(5, 8):
        state_b, _ = step(state_b, fixed[i], rng_keys[i])

    leaves_a = jax.tree_util.tree_leaves(jax.device_get(state_a))
    leaves_b = jax.tree_util.tree_leaves(jax.device_get(state_b))
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_load_train_state_rejects_config_mismatch(tmp_path):
    g, enc, disc, vgg, cfg, state, _, _ = tiny_setup()
    path = str(tmp_path / "ts.npz")
    save_train_state(path, state)
    # A template without the discriminator has a different leaf count.
    bad = init_train_state(g, enc, None, vgg,
                           TrainConfig(batch_size=4, gan_depth=False,
                                       neural_rendering_resolution=8,
                                       train_en=True, train_gen=True),
                           jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="leaves"):
        load_train_state(path, bad)


def test_load_train_state_rejects_shape_mismatch(tmp_path):
    """Same leaf COUNT but a different leaf shape must fail loudly at load
    time with the offending leaf's path (ADVICE r2: leaf-count-only
    validation let same-count/different-config checkpoints load silently)."""
    g, enc, disc, vgg, cfg, state, _, _ = tiny_setup()
    path = str(tmp_path / "ts.npz")
    save_train_state(path, state)
    data = dict(np.load(path, allow_pickle=False))
    # Tamper the largest leaf's shape without changing the leaf count.
    key = max((k for k in data if k.startswith("train_state/")),
              key=lambda k: data[k].size)
    data[key] = data[key].reshape(-1)
    np.savez(path, **data)
    with pytest.raises(ValueError, match="shape"):
        load_train_state(path, state)


def _tiny_eg3d():
    from gnerf_tpu.models.dual_discriminator import DualDiscriminator
    from gnerf_tpu.training.eg3d_loss import (
        EG3DLossConfig,
        init_eg3d_state,
        make_eg3d_train_step,
    )

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
    disc = DualDiscriminator(c_dim=25, img_resolution=16, img_channels=3,
                             channel_base=256, channel_max=32,
                             mbstd_group_size=1)
    cfg = EG3DLossConfig(neural_rendering_resolution=8, density_reg=0.25,
                         density_reg_points=16, r1_gamma=1.0)
    step, opt_g, opt_d = make_eg3d_train_step(g, disc, cfg)
    state = init_eg3d_state(g, disc, opt_g, opt_d, jax.random.PRNGKey(0))
    return g, disc, cfg, jax.jit(step), state


@pytest.mark.slow
def test_eg3d_save_resume_bit_identical(tmp_path):
    """EG3D full-state checkpoint (params + EMA + both Adams + cur_nimg):
    save mid-run, continue 2 steps; reload into a fresh template and replay
    the same 2 batches — results must be BIT-identical. The G-NeRF loop has
    had this contract since r2; the EG3D pretraining loop gets it in r3
    (the reference's GAN-stage pickles are params-only,
    `training_loop.py:503-560`)."""
    g, disc, cfg, step, state = _tiny_eg3d()
    ks = jax.random.PRNGKey(7)

    def batch_at(i):
        k = jax.random.fold_in(ks, i)
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {
            "z": jax.random.normal(k1, (2, 16)),
            "c": jax.random.normal(k2, (2, 25)),
            "real_image": jax.random.normal(k3, (2, 3, 16, 16)),
            "real_c": jax.random.normal(k4, (2, 25)),
        }

    for i in range(3):
        state, _ = step(state, batch_at(i), jax.random.PRNGKey(100 + i))

    path = str(tmp_path / "eg3d-state.npz")
    save_train_state(path, state, config={"aug_p_live": 0.125})

    state_a = state
    for i in range(3, 5):
        state_a, _ = step(state_a, batch_at(i), jax.random.PRNGKey(100 + i))

    _, _, _, _, template = _tiny_eg3d()
    state_b, config = load_train_state(path, template)
    assert float(config["aug_p_live"]) == 0.125
    assert int(np.asarray(state_b["cur_nimg"])) == 3 * 2
    for i in range(3, 5):
        state_b, _ = step(state_b, batch_at(i), jax.random.PRNGKey(100 + i))

    leaves_a = jax.tree_util.tree_leaves(jax.device_get(state_a))
    leaves_b = jax.tree_util.tree_leaves(jax.device_get(state_b))
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.slow
def test_eg3d_runner_resume_continues(tmp_path):
    """Runner-level EG3D resume: a short run writes
    training-state-latest.npz; a second _run_eg3d_training call with
    --resume continues from the saved kimg (schedules ride the restored
    counter) instead of restarting at 0, and extends the stats log."""
    import json
    import os

    from gnerf_tpu.training.train import _run_eg3d_training

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
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    common = dict(
        rendering_kwargs=g.rendering_kwargs, img_resolution=16,
        dataset_name="synthetic", data="", real_data="", batch=8, gamma=1.0,
        tick=0.008, seed=0, run_dir=run_dir, options={"t": 1},
    )
    _run_eg3d_training(g, kimg=0.016, **common)
    ts = os.path.join(run_dir, "training-state-latest.npz")
    assert os.path.exists(ts)
    assert os.path.exists(os.path.join(run_dir, "network-snapshot-final.npz"))
    # TensorBoard export (same surface as the G-NeRF loop).
    assert any(f.startswith("events.out.tfevents") for f in os.listdir(run_dir))
    n_ticks_1 = sum(1 for _ in open(os.path.join(run_dir, "stats.jsonl")))

    _run_eg3d_training(g, kimg=0.032, resume=ts, **common)
    stats = [json.loads(l) for l in open(os.path.join(run_dir, "stats.jsonl"))]
    assert len(stats) > n_ticks_1
    # The resumed segment's kimg coordinates continue past the first run's.
    assert stats[-1]["kimg"] > stats[n_ticks_1 - 1]["kimg"]
    from gnerf_tpu.utils import checkpoint as ckpt_lib

    trees, cfg_out = ckpt_lib.load_checkpoint(ts)
    # cur_nimg leaf persisted at the final value (0.032 kimg = 32 imgs).
    flat = trees["train_state"]
    sizes = [v for v in flat.values() if np.asarray(v).shape == ()]
    assert any(int(np.asarray(v)) == 32 for v in sizes), (
        "expected a scalar cur_nimg==32 leaf in the resumed checkpoint")
