"""Flagship EG3D adversarial train-step cost on the real chip.

VERDICT r2 item 4 asks for a BASELINE.md row for the flagship EG3D step:
512^2 generator (8XDC), DualDiscriminator at 512^2, pose swap, dual
discrimination, R1 through both inputs, density reg. Branch-timed with
scalar fences (full-step wall time through the dev relay is a host-link
artifact — see CLAUDE.md).

    python tools/profile_eg3d.py --batch 4 [--aug ada] [--blur 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


from gnerf_tpu.utils.profiling import timed_median as timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--aug", choices=["noaug", "ada", "fixed"], default="noaug")
    ap.add_argument("--blur", type=float, default=0.0,
                    help="blur_init_sigma (0 = no blur bucket)")
    ap.add_argument("--dtype", choices=["fp32", "bf16"], default="fp32")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chain", type=int, default=4,
                    help="steps per jitted program (lax.scan). The relay "
                         "stages every program OUTPUT buffer through the "
                         "host link (~95 s/GB), so chaining K steps inside "
                         "ONE jit with a scalar output is the only honest "
                         "way to time a step whose state must persist: the "
                         "carry never leaves the device, and the scan's "
                         "internal state aliasing gives donation-equivalent "
                         "memory behavior")
    ap.add_argument("--no-cell-pack", action="store_true",
                    help="disable the PackedPlanes-style single-gather "
                         "warp sampling in the ADA pipe (A/B against the "
                         "default cell-packed layout)")
    ap.add_argument("--fused", action="store_true",
                    help="profile the fused Gboth/Dboth step "
                         "(make_eg3d_train_step) instead of the default "
                         "lazy-regularization phases (reference schedule; "
                         "NB the fused flagship step does NOT fit one v5e "
                         "at batch 4 — see BASELINE.md)")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from gnerf_tpu.models import TriPlaneGenerator
    from gnerf_tpu.models.dual_discriminator import DualDiscriminator
    from gnerf_tpu.training.eg3d_loss import (
        EG3DLossConfig,
        blur_kernel_size,
        init_eg3d_state,
        make_eg3d_phase_steps,
        make_eg3d_train_step,
    )
    from gnerf_tpu.utils import camera

    B = args.batch
    g = TriPlaneGenerator()  # flagship: 512^2, 8XDC, 48+48
    disc = DualDiscriminator(c_dim=25, img_resolution=512, img_channels=3)
    cfg = EG3DLossConfig(
        neural_rendering_resolution=g.neural_rendering_resolution,
        blur_init_sigma=args.blur, blur_fade_kimg=200 if args.blur else 0,
        aug=args.aug, aug_p=0.3,
        aug_cell_pack=not args.no_cell_pack,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
    )
    if args.fused:
        step_fn, opt_g, opt_d = make_eg3d_train_step(g, disc, cfg)
        greg_fn = dreg_fn = None
    else:
        step_fn, greg_fn, dreg_fn, opt_g, opt_d = make_eg3d_phase_steps(
            g, disc, cfg)
    state = init_eg3d_state(g, disc, opt_g, opt_d, jax.random.PRNGKey(0))

    c0 = camera.pose_to_label(
        camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7),
        camera.FFHQ_INTRINSICS,
    )
    batch = {
        "z": jax.random.normal(jax.random.PRNGKey(1), (B, g.z_dim)),
        "c": jnp.tile(jnp.asarray(c0), (B, 1)),
        "real_image": jax.random.normal(jax.random.PRNGKey(2), (B, 3, 512, 512)),
        "real_c": jnp.tile(jnp.asarray(c0), (B, 1)),
    }
    size = blur_kernel_size(args.blur)
    bound = functools.partial(step_fn, blur_size=size)
    K = max(args.chain, 1)

    @jax.jit
    def multi_step(state_, batch_, key, sigma, p):
        def body(st, k):
            new_st, stats = bound(st, batch_, jax.random.fold_in(key, k),
                                  sigma, p)
            return new_st, stats["Loss/G/total"] + stats["Loss/D/total"]

        _, losses = jax.lax.scan(body, state_, jnp.arange(K))
        return jnp.sum(losses)

    t = timed(multi_step, state, batch, jax.random.PRNGKey(3),
              jnp.float32(max(args.blur, 1e-8)), jnp.float32(cfg.aug_p),
              reps=args.reps) / K
    out = {
        "workload": "EG3D adversarial step, flagship 512^2 + DualD(512)",
        "batch": B, "aug": args.aug, "blur_size": size, "dtype": args.dtype,
        "cell_pack": cfg.aug_cell_pack,
        "chain": K, "mode": "fused" if args.fused else "lazy",
        "main_step_s": round(t, 3),
    }
    amort = t
    if greg_fn is not None:
        @jax.jit
        def greg_ck(state_, batch_, key):
            ns, s = greg_fn(state_, batch_, key)
            # Checksum over the UPDATED params keeps the Adam apply alive
            # (a stats-only fence would let XLA DCE the whole update).
            ck = sum(jnp.sum(x) for x in
                     jax.tree_util.tree_leaves(ns["params_g"]))
            return s["Loss/G/density_reg"] + 1e-30 * ck

        tg = timed(greg_ck, state, batch, jax.random.PRNGKey(4),
                   reps=args.reps)
        out["greg_step_s"] = round(tg, 3)
        amort += tg / max(cfg.g_reg_interval, 1)
    if dreg_fn is not None:
        dbound = functools.partial(dreg_fn, blur_size=size)

        @jax.jit
        def dreg_ck(state_, batch_, key, sigma, p):
            ns, s = dbound(state_, batch_, key, sigma, p)
            ck = sum(jnp.sum(x) for x in
                     jax.tree_util.tree_leaves(ns["params_d"]))
            return s["Loss/D/reg"] + 1e-30 * ck

        td = timed(dreg_ck, state, batch, jax.random.PRNGKey(5),
                   jnp.float32(max(args.blur, 1e-8)), jnp.float32(cfg.aug_p),
                   reps=args.reps)
        out["dreg_step_s"] = round(td, 3)
        amort += td / max(cfg.d_reg_interval, 1)
    out["step_s_amortized"] = round(amort, 3)
    out["imgs_per_s_per_chip"] = round(B / amort, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
