"""Frames-per-batch sweep for the 96+96-spp flagship bench workload.

The r3 headline moved to the reference's true inference sampling (96+96),
where the 48-spp optimum (fpb=15) no longer holds: the first 96-spp bench
(fpb=10) measured 45.7 ms/frame against 23.6 (render) + ~1 (SR) isolated —
~21 ms/frame of whole-program overhead. This sweeps fpb in one process to
find the 96-spp optimum.

RESOLVED (r4 sweep on-device, results in BASELINE.md): the overhead was an
XLA pathology specific to the (fpb=10, lax.map) combination — map@12 and
unroll@10 are both fine (41.4 / 39.6 f/s vs 21.8), so neither chunk size
nor loop form alone explains it. Optimum: fpb=15 unroll, 41.9 f/s (now the
bench.py default); fpb=20 unroll exceeds the remote compiler's capacity.

    python tools/sweep_fpb96.py [--frames 60] [--fpbs 4,5,6,10,12,15,20]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from gnerf_tpu.models import TriPlaneGenerator
    from gnerf_tpu.utils import camera

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--fpbs", type=str, default="4,5,6,12,15,20")
    ap.add_argument("--stages-at", type=int, default=0,
                    help="also record stage attribution at this fpb")
    ap.add_argument("--loop", type=str, default="map",
                    choices=["map", "unroll", "both"],
                    help="clip chunk-loop form (bench.measure loop_mode); "
                         "'both' measures each fpb both ways")
    args = ap.parse_args()

    dtype = jnp.bfloat16
    g = TriPlaneGenerator()
    rk96 = dict(g.rendering_kwargs)
    rk96["depth_resolution"] *= 2
    rk96["depth_resolution_importance"] *= 2
    g96 = dataclasses.replace(g, rendering_kwargs=rk96)

    params = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, g.z_dim))
    c0 = camera.pose_to_label(
        camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7),
        camera.FFHQ_INTRINSICS,
    )

    @jax.jit
    def prepare(params, z, c):
        ws = g.mapping(params, z, c)
        planes = g.backbone_planes(params, ws, noise_mode="const",
                                   dtype=dtype, pack=True)
        return ws, planes

    ws, planes = prepare(params, z, c0)

    def pose(i, n=120):
        c2w = camera.lookat_sample(
            np.pi / 2 + 0.7 * np.sin(2 * np.pi * i / n),
            np.pi / 2 - 0.05 + 0.3 * np.cos(2 * np.pi * i / n),
            radius=2.7,
        )
        return camera.pose_to_label(c2w, camera.FFHQ_INTRINSICS)

    n = args.frames
    cs = jnp.concatenate([pose(i) for i in range(n)], axis=0)

    loops = ["map", "unroll"] if args.loop == "both" else [args.loop]
    for fpb in [int(x) for x in args.fpbs.split(",")]:
        if n % fpb:
            print(json.dumps({"fpb": fpb, "skipped": f"{n} % {fpb} != 0"}))
            continue
        for loop_mode in loops:
            try:
                r = bench.measure(g96, params, planes, ws, cs, z, c0, n, fpb,
                                  dtype, with_stages=(fpb == args.stages_at),
                                  loop_mode=loop_mode)
            except Exception as err:  # OOM etc. — record and continue
                print(json.dumps({"fpb": fpb, "loop": loop_mode,
                                  "error": str(err)[:200]}))
                continue
            row = {"fpb": fpb, "loop": loop_mode, "fps": round(r["fps"], 2),
                   "frame_ms": round(r["frame_ms"], 2)}
            if r.get("stage_ms"):
                row["stage_ms"] = r["stage_ms"]
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
