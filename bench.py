"""Benchmark harness: flagship 512^2 video-frame generation throughput.

Measures frames/sec/chip of the full G-NeRF pipeline (mapping -> 256^2
tri-plane backbone [amortized per identity] -> 64^2 two-pass volumetric
render with 48+48 samples/ray -> SuperresolutionHybrid8XDC to 512^2) on the
attached accelerator — the `gen_videos.py` workload pinned in BASELINE.md.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is value / 10.0 — 10 frames/sec is the documented nominal
estimate for the PyTorch reference on A100 at these settings (the reference
publishes no numbers; see BASELINE.md).
"""

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


NOMINAL_REFERENCE_FPS = 10.0  # estimated PyTorch/A100 gen_videos.py rate


def main():
    from gnerf_tpu.models import TriPlaneGenerator
    from gnerf_tpu.utils import camera

    # Production precision: bf16 backbone + superresolution (the reference
    # itself runs these blocks in fp16 with clamp, train.py:400-403), fp32
    # volumetric rendering.
    dtype = jnp.bfloat16

    g = TriPlaneGenerator()  # full default config (512^2, 8XDC, 48+48)
    params = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, g.z_dim))
    c0 = camera.pose_to_label(
        camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7),
        camera.FFHQ_INTRINSICS,
    )

    # Identity-level work (mapping + backbone) runs once per identity.
    @jax.jit
    def prepare(params, z, c):
        ws = g.mapping(params, z, c)
        planes = g.backbone_planes(params, ws, noise_mode="const", dtype=dtype,
                                   pack=True)
        return ws, planes

    # Per-clip work: every frame of the orbit in ONE jitted program —
    # lax.map over chunks of FRAMES_PER_BATCH frames, each chunk rendered as
    # one batched program (shared packed planes broadcast over the frame
    # batch). Batching frames improves MXU/HBM utilization ~25% on v5e.
    n_frames = 30
    frames_per_batch = 15

    def clip(params, planes, ws, cs):
        wsb = jnp.broadcast_to(ws, (frames_per_batch,) + ws.shape[1:])

        def chunk(cb):
            out = g.render_planes(params, planes, cb, wsb, noise_mode="const",
                                  dtype=dtype)
            return out["image"]

        chunks = cs.reshape(n_frames // frames_per_batch, frames_per_batch, -1)
        return jax.lax.map(chunk, chunks).reshape(
            n_frames, 3, g.img_resolution, g.img_resolution
        )

    # NOTE: through the remote-device relay, block_until_ready can return
    # before execution finishes; fetching a scalar to host is the only
    # reliable completion barrier, so all timing below is scalar-fenced.
    @jax.jit
    def clip_checksum(params, planes, ws, cs):
        imgs = clip(params, planes, ws, cs)
        return jnp.sum(imgs), jnp.isfinite(imgs).all()

    ws, planes = prepare(params, z, c0)

    def pose(i, n=120):
        c2w = camera.lookat_sample(
            np.pi / 2 + 0.7 * np.sin(2 * np.pi * i / n),
            np.pi / 2 - 0.05 + 0.3 * np.cos(2 * np.pi * i / n),
            radius=2.7,
        )
        return camera.pose_to_label(c2w, camera.FFHQ_INTRINSICS)

    cs = jnp.concatenate([pose(i) for i in range(n_frames)], axis=0)

    # Warm up / compile (scalar fetch = completion fence).
    s, finite = clip_checksum(params, planes, ws, cs)
    assert bool(finite), "non-finite frames"

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        s, _ = clip_checksum(params, planes, ws, cs)
        float(s)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]  # median of 3
    fps = n_frames / dt

    print(json.dumps({
        "metric": "frames/sec/chip, 512^2 G-NeRF video gen (64^2 render, 48+48 spp, 8XDC SR)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / NOMINAL_REFERENCE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
