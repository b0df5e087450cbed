"""Serving-path throughput on the real chip (VERDICT r3 item 7).

Measures the THREE programs GNerfService compiles, at the sampling the
server actually loads (double_sampling=True -> 96+96/ray, matching the
reference's inference doubling, `gen_videos.py:127-128`):

  prepare_s        identity onboarding (mapping + packed backbone), n=1
  frame_n1_ms      uncontended single-frame latency path (n=1 program)
  microbatch_ms    the cross-request micro-batched program at the default
                   batch (4 concurrent clients' identities stacked along
                   the batch axis), per-BATCH time
  microbatch_fps   -> frames/s through the micro-batch path
  orbit_chunk_fps  the 15-frame orbit-chunk program (cross-check: must
                   match bench.py's 96+96 headline — it is the same
                   program shape)

Program bodies mirror server.py's `_prepare`/`_render`/`_chunk_body`
exactly (same g.render_planes call, same dtype) but return a SCALAR
checksum instead of the uint8 frame: through the dev relay a returned
[B,3,512,512] pixel buffer is staged over the host link at ~10-20 MB/s,
which would bill ~0.2 s of tunnel time to a ~0.07 s device program. The
uint8 clip+cast the server adds is fused elementwise work (<1% of the
render); co-located deployments read the frames over PCIe/ICI, not this
relay.

    python tools/profile_server.py [--microbatch 4] [--reps 5]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gnerf_tpu.utils.profiling import timed_median as timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--microbatch", type=int, default=4,
                    help="GNerfService's default micro-batch size")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--no-double-sampling", action="store_true",
                    help="measure at the 48+48 training sampling instead "
                         "of the server's default doubled load")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gnerf_tpu.models import TriPlaneGenerator
    from gnerf_tpu.render.renderer import PackedPlanes
    from gnerf_tpu.utils import camera

    dtype = jnp.bfloat16
    g = TriPlaneGenerator()
    if not args.no_double_sampling:
        rk = dict(g.rendering_kwargs)
        rk["depth_resolution"] = int(rk["depth_resolution"] * 2)
        rk["depth_resolution_importance"] = int(
            rk["depth_resolution_importance"] * 2)
        g = dataclasses.replace(g, rendering_kwargs=rk)

    params = g.init(jax.random.PRNGKey(0))
    c0 = camera.pose_to_label(
        camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7),
        camera.FFHQ_INTRINSICS,
    )
    c0 = jnp.asarray(c0)[None]

    @jax.jit
    def prepare_ck(params, z, c):
        ws = g.mapping(params, z, c)
        planes = g.backbone_planes(params, ws, noise_mode="const",
                                   dtype=dtype, pack=True)
        return ws, planes, jnp.sum(planes.rows.astype(jnp.float32))

    @jax.jit
    def frame_ck(params, planes, ws, c):
        out = g.render_planes(params, planes, c, ws, noise_mode="const",
                              dtype=dtype)
        img = jnp.clip((out["image"] + 1) * 127.5, 0, 255).astype(jnp.uint8)
        return jnp.sum(img.astype(jnp.int32))

    @jax.jit
    def prepare_scalar(params, z, c):
        # Timing variant: scalar output only — returning the packed planes
        # would stage ~25 MB through the relay's host link per rep.
        return prepare_ck(params, z, c)[2]

    z1 = jax.random.normal(jax.random.PRNGKey(1), (1, g.z_dim))
    ws1, planes1, _ = prepare_ck(params, z1, c0)
    prep_s = timed(prepare_scalar, params, z1, c0, reps=args.reps)

    out = {"workload": "GNerfService programs, flagship 512^2",
           "samples_per_ray": (g.rendering_kwargs["depth_resolution"],
                               g.rendering_kwargs["depth_resolution_importance"]),
           "prepare_s": round(prep_s, 4)}

    # n=1 uncontended single-frame path.
    t1 = timed(frame_ck, params, planes1, ws1, c0, reps=args.reps)
    out["frame_n1_ms"] = round(t1 * 1e3, 2)

    # Micro-batched path: B distinct identities stacked along the batch
    # axis, exactly like _run_frame_batch (rows concatenate; base index
    # handles n>1).
    B = args.microbatch
    idents = []
    for i in range(B):
        zi = jax.random.normal(jax.random.PRNGKey(10 + i), (1, g.z_dim))
        wsi, pli, _ = prepare_ck(params, zi, c0)
        idents.append((wsi, pli))
    wsB = jnp.concatenate([w for w, _ in idents], axis=0)
    p0 = idents[0][1]
    rowsB = jnp.concatenate([p.rows for _, p in idents], axis=0)
    planesB = PackedPlanes(rowsB, B * p0.n, p0.c, p0.h, p0.w)
    cB = jnp.concatenate([c0] * B, axis=0)
    tB = timed(frame_ck, params, planesB, wsB, cB, reps=args.reps)
    out["microbatch"] = B
    out["microbatch_ms"] = round(tB * 1e3, 2)
    out["microbatch_fps"] = round(B / tB, 2)

    # Orbit chunk (the server's _render_chunk == bench.py's clip chunk).
    F = 15

    @jax.jit
    def chunk_ck(params, planes, ws, cs):
        wsb = jnp.broadcast_to(ws, (F,) + ws.shape[1:])
        out_ = g.render_planes(params, planes, cs, wsb, noise_mode="const",
                               dtype=dtype)
        img = jnp.clip((out_["image"] + 1) * 127.5, 0, 255).astype(jnp.uint8)
        return jnp.sum(img.astype(jnp.int32))

    cs = jnp.concatenate([c0] * F, axis=0)
    tC = timed(chunk_ck, params, planes1, ws1, cs, reps=args.reps)
    out["orbit_chunk_fps"] = round(F / tC, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
