"""On-device throughput of the SERVER's render programs at the sampling it
actually loads (VERDICT r3 Weak #5: the server docstring quoted the 48-spp
bench rate while `load_service` defaults to the reference's doubled 96+96
sampling — a ~2x mismatch).

Measures, scalar-fenced (relay rules, CLAUDE.md):
  * the orbit chunk program (`GNerfService._render_chunk` body: 15 frames
    broadcast over one identity's packed planes, bf16, uint8 output)
  * the micro-batched single-frame program (`_render` body: B distinct
    identities' planes stacked along the batch axis) at B = 1, 2, 4
both at 96+96 (server default) and 48+48 (--no-double-sampling).

    python tools/profile_server.py [--reps 3]
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

    from gnerf_tpu.models import TriPlaneGenerator
    from gnerf_tpu.render.renderer import PackedPlanes
    from gnerf_tpu.utils import camera
    from gnerf_tpu.utils.profiling import timed_median as timed

    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--frames-per-chunk", type=int, default=15)
    args = ap.parse_args()

    dtype = jnp.bfloat16
    base = TriPlaneGenerator()
    results = {}

    c0 = camera.pose_to_label(
        camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7),
        camera.FFHQ_INTRINSICS,
    )

    for tier, doubled in (("96+96", True), ("48+48", False)):
        g = base
        if doubled:
            rk = dict(g.rendering_kwargs)
            rk["depth_resolution"] *= 2
            rk["depth_resolution_importance"] *= 2
            g = dataclasses.replace(g, rendering_kwargs=rk)
        params = g.init(jax.random.PRNGKey(0))

        @jax.jit
        def prepare(params, z, c, g=g):
            ws = g.mapping(params, z, c)
            planes = g.backbone_planes(params, ws, noise_mode="const",
                                       dtype=dtype, pack=True)
            return ws, planes

        # Distinct identities (the micro-batch path stacks different
        # clients' planes).
        idents = []
        for i in range(4):
            z = jax.random.normal(jax.random.PRNGKey(10 + i), (1, g.z_dim))
            ws, planes = prepare(params, z, jnp.asarray(c0))
            idents.append((ws, planes))

        F = args.frames_per_chunk
        cs_chunk = jnp.concatenate([
            camera.pose_to_label(
                camera.lookat_sample(np.pi / 2 + 0.1 * i, np.pi / 2,
                                     radius=2.7), camera.FFHQ_INTRINSICS)
            for i in range(F)
        ], axis=0)

        # Orbit chunk program — GNerfService._chunk_body + a checksum fence
        # (uint8 conversion and its HBM write included; the sum replaces the
        # host fetch, which through the dev relay is a link artifact).
        @jax.jit
        def chunk_ck(params, planes, ws, cs, g=g):
            wsb = jnp.broadcast_to(ws, (F,) + ws.shape[1:])
            out = g.render_planes(params, planes, cs, wsb,
                                  noise_mode="const", dtype=dtype)
            img = jnp.clip((out["image"] + 1) * 127.5, 0, 255).astype(jnp.uint8)
            return jnp.sum(img.astype(jnp.int32))

        ws0, planes0 = idents[0]
        dt = timed(chunk_ck, params, planes0, ws0, cs_chunk, reps=args.reps)
        results[f"orbit_chunk_fps_{tier}"] = round(F / dt, 2)

        # Micro-batched single-frame program (_render body) at B = 1, 2, 4.
        for B in (1, 2, 4):
            ws = jnp.concatenate([idents[i % 4][0] for i in range(B)], axis=0)
            p0 = idents[0][1]
            rows = jnp.concatenate(
                [idents[i % 4][1].rows for i in range(B)], axis=0)
            planes = PackedPlanes(rows, B * p0.n, p0.c, p0.h, p0.w)
            cs = jnp.tile(jnp.asarray(c0), (B, 1))

            @jax.jit
            def frame_ck(params, planes, ws, cs, g=g):
                out = g.render_planes(params, planes, cs, ws,
                                      noise_mode="const", dtype=dtype)
                img = jnp.clip((out["image"] + 1) * 127.5, 0, 255)
                return jnp.sum(img.astype(jnp.int32))

            dt = timed(frame_ck, params, planes, ws, cs, reps=args.reps)
            results[f"microbatch{B}_ms_{tier}"] = round(dt * 1e3, 2)
            results[f"microbatch{B}_fps_{tier}"] = round(B / dt, 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
