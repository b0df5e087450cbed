"""Chained EG3D cycle == the unchained phase-step loop, step for step.

`make_chained_eg3d_cycle` packs K train steps — main + due lazy-reg phases
+ the ADA p controller — into one jitted program (the dispatch form that
makes hours-scale adversarial runs feasible through the relay; see
eg3d_loss.py). These tests pin its semantics against the reference
cadences the unchained driver implements (`training/train.py`
_run_eg3d_training): same per-step keys, same sched_idx%interval lazy
cadence (reference training_loop.py:123-124), same ada_interval r_t
windows (reference augment.py heuristic), chain-length-independent
trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnerf_tpu.models.dual_discriminator import DualDiscriminator
from gnerf_tpu.models.triplane import TriPlaneGenerator


def _tiny_setup(aug="ada"):
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
    from gnerf_tpu.training.eg3d_loss import EG3DLossConfig

    cfg = EG3DLossConfig(
        neural_rendering_resolution=8, density_reg=0.25,
        density_reg_points=16, r1_gamma=1.0,
        g_reg_interval=2, d_reg_interval=4,
        aug=aug, aug_p=0.1, ada_target=0.6, ada_interval=2,
        # Fast controller so p actually moves within K tiny steps.
        ada_kimg=0.05,
    )
    return g, disc, cfg


def _batches(K, B=2):
    ks = jax.random.split(jax.random.PRNGKey(10), 4)
    return {
        "z": jax.random.normal(ks[0], (K, B, 16)),
        "c": jax.random.normal(ks[1], (K, B, 25)),
        "real_image": jax.random.randint(ks[2], (K, B, 3, 16, 16), 0, 256,
                                         dtype=jnp.int32).astype(jnp.uint8),
        "real_c": jax.random.normal(ks[3], (K, B, 25)),
    }


@pytest.mark.slow
def test_chained_cycle_matches_unchained_phases():
    from gnerf_tpu.training.eg3d_loss import (
        ada_update_p,
        init_eg3d_state,
        make_chained_eg3d_cycle,
        make_eg3d_phase_steps,
    )

    K, B = 4, 2
    g, disc, cfg = _tiny_setup(aug="ada")
    main_fn, greg_fn, dreg_fn, opt_g, opt_d = make_eg3d_phase_steps(
        g, disc, cfg)
    state0 = init_eg3d_state(g, disc, opt_g, opt_d, jax.random.PRNGKey(0))
    batches = _batches(K, B)
    rngs = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(7), i * B)
                      for i in range(K)])
    g_due = np.array([i % cfg.g_reg_interval == 0 for i in range(K)])
    d_due = np.array([i % cfg.d_reg_interval == 0 for i in range(K)])
    sigmas = jnp.full((K,), 1e-8, jnp.float32)
    p0 = float(cfg.aug_p)

    # Reference trajectory: the unchained driver loop, phase by phase.
    state_ref = jax.tree_util.tree_map(jnp.copy, state0)
    p_ref = p0
    rt_window = []
    signs_ref = []
    main_j = jax.jit(main_fn, static_argnames=("blur_size", "res"))
    greg_j = jax.jit(greg_fn, static_argnames=("res",))
    dreg_j = jax.jit(dreg_fn, static_argnames=("blur_size", "res"))
    loss_ref = {"Loss/G/total": [], "Loss/D/total": []}
    for i in range(K):
        b = {k: (v[i].astype(jnp.float32) / 127.5 - 1.0
                 if v.dtype == jnp.uint8 else v[i])
             for k, v in batches.items()}
        state_ref, stats = main_j(state_ref, b, rngs[i], sigmas[i],
                                  jnp.float32(p_ref), blur_size=0, res=8)
        if g_due[i]:
            state_ref, _ = greg_j(state_ref, b,
                                  jax.random.fold_in(rngs[i], 1), res=8)
        if d_due[i]:
            state_ref, _ = dreg_j(state_ref, b,
                                  jax.random.fold_in(rngs[i], 2), sigmas[i],
                                  jnp.float32(p_ref), blur_size=0, res=8)
        for lk in loss_ref:
            loss_ref[lk].append(float(stats[lk]))
        rt_window.append(float(stats["Loss/signs/real"]))
        signs_ref.append(rt_window[-1])
        if (i + 1) % cfg.ada_interval == 0:
            p_ref = ada_update_p(p_ref, float(np.mean(rt_window)), B, cfg)
            rt_window.clear()

    # Chained trajectory: one program.
    cycle = jax.jit(
        make_chained_eg3d_cycle(main_fn, greg_fn, dreg_fn, cfg,
                                blur_size=0, res=8))
    state_c, p_c, stacked = cycle(
        jax.tree_util.tree_map(jnp.copy, state0), batches, rngs,
        jnp.asarray(g_due), jnp.asarray(d_due), sigmas, jnp.float32(p0))

    assert float(p_c) == pytest.approx(p_ref, abs=1e-7)
    assert p_ref != p0, "controller never moved — test is vacuous"
    assert int(state_c["cur_nimg"]) == int(state_ref["cur_nimg"]) == K * B
    for side in ("params_g", "params_d", "params_g_ema"):
        ref_leaves, ref_tree = jax.tree_util.tree_flatten(state_ref[side])
        c_leaves, c_tree = jax.tree_util.tree_flatten(state_c[side])
        assert ref_tree == c_tree
        for rl, cl in zip(ref_leaves, c_leaves):
            # Loose at K=4: the GAN step at random init is chaotic (see the
            # repo's parity notes) and Adam normalizes, so scan+cond fusion
            # rounding amplifies to ~1e-3 relative norm over 4 steps. The
            # TIGHT single-step check below pins the body semantics; here
            # the point is that the K-step trajectory tracks (a cadence or
            # key bug diverges at O(1)).
            r, c = np.asarray(rl, np.float64), np.asarray(cl, np.float64)
            rel = np.linalg.norm(c - r) / (np.linalg.norm(r) + 1e-12)
            assert rel < 2e-2, rel
            assert np.max(np.abs(c - r)) < 1e-3
    # Per-step stats come back stacked; the masked reg stats are zero
    # exactly at the not-due positions.
    assert stacked["Loss/G/total"].shape == (K,)
    np.testing.assert_allclose(np.asarray(stacked["Loss/signs/real"]),
                               np.asarray(signs_ref), rtol=1e-4, atol=1e-5)
    # Per-step loss traces are the pre-optimizer signal along the carried
    # trajectory — these must track tightly for the chain to be "the same
    # training run".
    for lk, vals in loss_ref.items():
        np.testing.assert_allclose(np.asarray(stacked[lk]),
                                   np.asarray(vals), rtol=5e-3, atol=1e-4)
    greg_vals = np.asarray(stacked["Loss/G/density_reg"])
    assert (greg_vals[~g_due] == 0).all()
    assert (greg_vals[g_due] != 0).any()
    dreg_vals = np.asarray(stacked["Loss/D/reg"])
    assert (dreg_vals[~d_due] == 0).all()
    assert (dreg_vals[d_due] != 0).any()
    # The controller's per-step p trace is monotone toward the sign of
    # (r_t - target) moves and stays in [0, 1].
    p_trace = np.asarray(stacked["Progress/augment"])
    assert ((p_trace >= 0) & (p_trace <= 1)).all()
    assert p_trace[-1] == pytest.approx(p_ref, abs=1e-7)

    # Tight single-step check (no chaotic amplification): one K=1 cycle
    # with BOTH phases due == main + greg + dreg called eagerly.
    b1 = {k: v[:1] for k, v in batches.items()}
    state_c1, _, _ = jax.jit(
        make_chained_eg3d_cycle(main_fn, greg_fn, dreg_fn, cfg,
                                blur_size=0, res=8))(
        jax.tree_util.tree_map(jnp.copy, state0), b1, rngs[:1],
        jnp.ones((1,), bool), jnp.ones((1,), bool), sigmas[:1],
        jnp.float32(p0))
    b0 = {k: (v[0].astype(jnp.float32) / 127.5 - 1.0
              if v.dtype == jnp.uint8 else v[0])
          for k, v in batches.items()}
    state_e1, _ = main_j(jax.tree_util.tree_map(jnp.copy, state0), b0,
                         rngs[0], sigmas[0], jnp.float32(p0),
                         blur_size=0, res=8)
    state_e1, _ = greg_j(state_e1, b0, jax.random.fold_in(rngs[0], 1), res=8)
    state_e1, _ = dreg_j(state_e1, b0, jax.random.fold_in(rngs[0], 2),
                         sigmas[0], jnp.float32(p0), blur_size=0, res=8)
    for side in ("params_g", "params_d", "params_g_ema"):
        for rl, cl in zip(jax.tree_util.tree_leaves(state_e1[side]),
                          jax.tree_util.tree_leaves(state_c1[side])):
            r, c = np.asarray(rl, np.float64), np.asarray(cl, np.float64)
            rel = np.linalg.norm(c - r) / (np.linalg.norm(r) + 1e-12)
            # Not ULP-tight even at one step: Adam's m/(sqrt(v)+eps) has an
            # unbounded derivative at g=0, so elements with near-zero grads
            # turn 1e-8 fusion noise into ~lr-scale update differences
            # (measured 7e-5 rel norm). The per-step LOSS traces above are
            # the pre-optimizer signal and match at 1e-4.
            assert rel < 1e-3, rel


@pytest.mark.slow
def test_chained_cycle_uint8_equals_prenormalized():
    """The cycle's device-side uint8 -> [-1,1] normalization is exactly the
    driver's host-side /127.5-1 (the 4x staging saver must not change the
    math)."""
    from gnerf_tpu.training.eg3d_loss import (
        init_eg3d_state,
        make_chained_eg3d_cycle,
        make_eg3d_phase_steps,
    )

    K, B = 2, 2
    g, disc, cfg = _tiny_setup(aug="noaug")
    main_fn, greg_fn, dreg_fn, opt_g, opt_d = make_eg3d_phase_steps(
        g, disc, cfg)
    state0 = init_eg3d_state(g, disc, opt_g, opt_d, jax.random.PRNGKey(0))
    batches = _batches(K, B)
    rngs = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(7), i)
                      for i in range(K)])
    due = jnp.zeros((K,), bool)
    sigmas = jnp.full((K,), 1e-8, jnp.float32)
    cycle = jax.jit(
        make_chained_eg3d_cycle(main_fn, greg_fn, dreg_fn, cfg,
                                blur_size=0, res=8))
    st_u8, _, _ = cycle(jax.tree_util.tree_map(jnp.copy, state0), batches,
                        rngs, due, due, sigmas, jnp.float32(0.0))
    pre = dict(batches,
               real_image=batches["real_image"].astype(jnp.float32)
               / 127.5 - 1.0)
    st_f32, _, _ = cycle(jax.tree_util.tree_map(jnp.copy, state0), pre,
                         rngs, due, due, sigmas, jnp.float32(0.0))
    for rl, cl in zip(jax.tree_util.tree_leaves(st_u8["params_d"]),
                      jax.tree_util.tree_leaves(st_f32["params_d"])):
        # Not bit-exact: XLA fuses the in-program cast+normalize into its
        # consumers, changing rounding (measured max 3e-9 abs at K=2).
        np.testing.assert_allclose(np.asarray(rl), np.asarray(cl),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_dreg_dslice_matches_full_dreg():
    """make_dreg_dslice == the full dreg_step on the D slice (the
    --chain_dreg_split dispatch form): same params_d/opt_state_d update,
    G state untouched by construction."""
    from gnerf_tpu.training.eg3d_loss import (
        init_eg3d_state,
        make_dreg_dslice,
        make_eg3d_phase_steps,
    )

    g, disc, cfg = _tiny_setup(aug="ada")
    main_fn, greg_fn, dreg_fn, opt_g, opt_d = make_eg3d_phase_steps(
        g, disc, cfg)
    state0 = init_eg3d_state(g, disc, opt_g, opt_d, jax.random.PRNGKey(0))
    b = {k: (v[0].astype(jnp.float32) / 127.5 - 1.0
             if v.dtype == jnp.uint8 else v[0])
         for k, v in _batches(1).items()}
    rng = jax.random.PRNGKey(11)
    full, _ = jax.jit(dreg_fn, static_argnames=("blur_size", "res"))(
        jax.tree_util.tree_map(jnp.copy, state0), b, rng,
        jnp.float32(1e-8), jnp.float32(0.3), blur_size=0, res=8)
    dslice = jax.jit(make_dreg_dslice(dreg_fn),
                     static_argnames=("blur_size", "res"))
    pd, od, stats = dslice(
        jax.tree_util.tree_map(jnp.copy, state0["params_d"]),
        jax.tree_util.tree_map(jnp.copy, state0["opt_state_d"]),
        state0["cur_nimg"], b, rng, jnp.float32(1e-8), jnp.float32(0.3),
        blur_size=0, res=8)
    assert np.isfinite(float(stats["Loss/D/reg"]))
    for rl, cl in zip(jax.tree_util.tree_leaves(full["params_d"]),
                      jax.tree_util.tree_leaves(pd)):
        np.testing.assert_array_equal(np.asarray(rl), np.asarray(cl))
    for rl, cl in zip(jax.tree_util.tree_leaves(full["opt_state_d"]),
                      jax.tree_util.tree_leaves(od)):
        np.testing.assert_array_equal(np.asarray(rl), np.asarray(cl))
