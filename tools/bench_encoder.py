"""Encoder (ResNeXt50) grouped-vs-dense conv cost on the real chip.

The train-step profile (BASELINE.md) shows the encoder at 0.427 s/step
(batch 4, 512^2, bf16) — 36% of the full flagship step. The FLOP floor is
~1.4 ms, so the stage runs at ~0.3% MFU. Hypothesis: the groups=32 convs
(4..32 channels per group) starve the 128x128 MXU; `groups_as_dense`
(models/encoder.py) trades 32x FLOPs for full lane occupancy.

    python tools/bench_encoder.py [--batch 4] [--res 512] [--dtype bf16]

Prints scalar-fenced fwd and fwd+bwd times for both formulations.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--dtype", choices=["fp32", "bf16"], default="bf16")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gnerf_tpu.models.encoder import ResNeXt50Encoder
    from gnerf_tpu.utils.profiling import timed_median as timed

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    x = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, 3, args.res, args.res)
    ).astype(dtype)

    out = {"batch": args.batch, "res": args.res, "dtype": args.dtype}
    for dense in (False, True):
        enc = ResNeXt50Encoder(out_dim=512, groups_as_dense=dense)
        p, s = enc.init(jax.random.PRNGKey(0))

        @jax.jit
        def fwd(p_, x_):
            z, _ = enc.apply(p_, s, x_, train=True)
            return jnp.sum(z.astype(jnp.float32) ** 2)

        @jax.jit
        def fwd_bwd(p_, x_):
            g = jax.grad(lambda q: fwd(q, x_))(p_)
            return sum(
                jnp.sum(l.astype(jnp.float32) ** 2)
                for l in jax.tree_util.tree_leaves(g)
            )

        key = "dense" if dense else "grouped"
        out[f"{key}_fwd_s"] = round(timed(fwd, p, x, reps=args.reps), 4)
        out[f"{key}_fwd_bwd_s"] = round(timed(fwd_bwd, p, x, reps=args.reps), 4)
    out["speedup_fwd_bwd"] = round(
        out["grouped_fwd_bwd_s"] / out["dense_fwd_bwd_s"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
