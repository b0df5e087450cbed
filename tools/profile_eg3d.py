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
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
    )
    step_fn, opt_g, opt_d = make_eg3d_train_step(g, disc, cfg)
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

    # Scalar-fenced full step (state NOT donated so reps reuse the input).
    step = jax.jit(bound, donate_argnums=())

    def fenced(state_, batch_, key, sigma, p):
        _, stats = step(state_, batch_, key, sigma, p)
        return stats["Loss/G/total"] + stats["Loss/D/total"]

    t = timed(fenced, state, batch, jax.random.PRNGKey(3),
              jnp.float32(max(args.blur, 1e-8)), jnp.float32(cfg.aug_p),
              reps=args.reps)
    print(json.dumps({
        "workload": "EG3D adversarial step, flagship 512^2 + DualD(512)",
        "batch": B, "aug": args.aug, "blur_size": size, "dtype": args.dtype,
        "step_s_scalar_fenced": round(t, 3),
        "imgs_per_s_per_chip": round(B / t, 3),
    }))


if __name__ == "__main__":
    main()
