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
# (derivation in BASELINE.md: ~1.6 TFLOP/frame at ~16% A100-fp16 util)

# TPU v5e (v5 lite) nominal peak: 197 TFLOP/s bf16. MFU below is relative
# to this — honest for the bf16 backbone/SR; the fp32 volumetric stage's
# ceiling is lower, so the figure UNDERSTATES renderer efficiency.
PEAK_FLOPS_BF16 = 197e12


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
    # 60-frame orbit (half the reference's 120-frame video job — same
    # amortization regime, half the bench wall time), 15 frames per jitted
    # chunk (measured optimum; 60-frame single chunks OOM HBM).
    n_frames = 60
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

    # Per-stage program: volumetric render ONLY (ray sample + two-pass
    # march + decoder, no superresolution) on one frame batch — isolates
    # the renderer from the SR conv stack. Mirrors render_planes up to the
    # SR call (gnerf_tpu/models/triplane.py:246-262).
    from gnerf_tpu.render import render_rays, sample_rays

    res = g.neural_rendering_resolution
    opts = dict(g.rendering_kwargs)

    @jax.jit
    def vol_checksum(params, planes, cb):
        cam2world = cb[:, :16].reshape(-1, 4, 4)
        intr = cb[:, 16:25].reshape(-1, 3, 3)
        o, d = sample_rays(cam2world, intr, res)

        def decode(feats, dirs):
            return g.decoder.apply(params["decoder"], feats, dirs)

        feats, depth, _ = render_rays(planes, decode, o, d, opts, rng=None)
        return jnp.sum(feats.astype(jnp.float32)) + jnp.sum(depth)

    @jax.jit
    def prepare_checksum(params, z, c):
        out = prepare(params, z, c)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out))

    def timed(fn, *args, reps=3):
        def fence():
            out = fn(*args)
            float(out[0] if isinstance(out, tuple) else out)

        fence()  # warm up / compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fence()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    # Warm up / compile (scalar fetch = completion fence).
    s, finite = clip_checksum(params, planes, ws, cs)
    assert bool(finite), "non-finite frames"

    dt = timed(clip_checksum, params, planes, ws, cs)
    fps = n_frames / dt

    cb = cs[:frames_per_batch]
    vol_dt = timed(vol_checksum, params, planes, cb)
    prep_dt = timed(prepare_checksum, params, z, c0)
    full_frame_ms = dt / n_frames * 1e3
    vol_frame_ms = vol_dt / frames_per_batch * 1e3
    sr_frame_ms = max(full_frame_ms - vol_frame_ms, 0.0)

    # Mrays/sec through the two-pass renderer (the BASELINE.json
    # north-star): rays marched per frame = render_res^2, each carrying
    # 48 coarse + 48 fine samples x 3 plane lookups + decoder MLP.
    mrays = fps * res * res / 1e6
    msamples = mrays * (
        opts.get("depth_resolution", 48) + opts.get("depth_resolution_importance", 48)
    )

    # FLOP-derived utilization: XLA's own cost model for the compiled clip
    # program (per clip of n_frames), against the chip's nominal bf16 peak.
    flops_per_frame = None
    est_mfu = None
    try:
        cost = clip_checksum.lower(
            params, planes, ws, cs).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if cost and cost.get("flops"):
            flops_per_frame = float(cost["flops"]) / n_frames
            est_mfu = flops_per_frame * fps / PEAK_FLOPS_BF16
    except Exception:
        pass

    print(json.dumps({
        "metric": "frames/sec/chip, 512^2 G-NeRF video gen (64^2 render, 48+48 spp, 8XDC SR)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / NOMINAL_REFERENCE_FPS, 3),
        "mrays_per_s": round(mrays, 3),
        "msamples_per_s": round(msamples, 1),
        "stage_ms": {
            "frame_total": round(full_frame_ms, 3),
            "volumetric_render": round(vol_frame_ms, 3),
            "superresolution": round(sr_frame_ms, 3),
            "identity_prepare_amortized": round(prep_dt * 1e3, 3),
        },
        "flops_per_frame": flops_per_frame,
        "est_mfu": round(est_mfu, 4) if est_mfu is not None else None,
        "peak_flops_assumed": PEAK_FLOPS_BF16,
    }))


if __name__ == "__main__":
    main()
