"""Stage-by-stage device profiling of the render pipeline on the real TPU.

Times each stage of the flagship workload (15-frame batch, 64^2 render,
48+48 spp, 512^2 8XDC SR) in isolation with scalar-fenced timing, to
direct kernel-fusion work at the actual bottlenecks:

    python tools/profile_renderer.py

Stages: plane pack, packed gather (coarse-pass points), decoder MLP,
ray-march compositing, importance sampling, sort-merge, full volumetric
render, SR, full frame.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


from gnerf_tpu.utils.profiling import scalar_fence as fence


def timeit(fn, *args, reps=5, label=""):
    from gnerf_tpu.utils.profiling import timed_median

    t = timed_median(fn, *args, reps=reps)
    if label:  # stream rows as they land — a killed run keeps its evidence
        print(f"[row] {label:28s} {t * 1e3:9.3f} ms", flush=True)
    return t


def main():
    import argparse
    import dataclasses

    from gnerf_tpu.models import TriPlaneGenerator
    from gnerf_tpu.render import renderer as R
    from gnerf_tpu.render import importance as I
    from gnerf_tpu.render.ray_marcher import march_rays
    from gnerf_tpu.render.ray_sampler import sample_rays
    from gnerf_tpu.utils import camera

    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=48, choices=(48, 96),
                    help="coarse (=importance) samples/ray: 48 = training-"
                         "time sampling, 96 = flagship inference (doubled "
                         "at load, the r3+ bench headline)")
    ap.add_argument("--fpb", type=int, default=None,
                    help="frames per batch (default: 15 at 48 spp, 10 at 96)")
    args = ap.parse_args()

    dtype = jnp.bfloat16
    g = TriPlaneGenerator()
    if args.spp != g.rendering_kwargs["depth_resolution"]:
        g = dataclasses.replace(g, rendering_kwargs=dict(
            g.rendering_kwargs, depth_resolution=args.spp,
            depth_resolution_importance=args.spp))
    params = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, g.z_dim))
    c0 = camera.pose_to_label(
        camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7),
        camera.FFHQ_INTRINSICS,
    )
    # frames per batch (bench.py production setting for the sampling tier)
    F = args.fpb or (15 if args.spp == 48 else 10)
    res = g.neural_rendering_resolution
    S = g.rendering_kwargs["depth_resolution"]
    opts = dict(g.rendering_kwargs)

    ws = g.mapping(params, z, c0)
    raw_planes = jax.jit(
        lambda p, w: g.backbone_planes(p, w, noise_mode="const", dtype=dtype,
                                       pack=False)
    )(params, ws)
    packed = jax.jit(R.pack_planes)(raw_planes)

    cs = jnp.concatenate([
        camera.pose_to_label(
            camera.lookat_sample(np.pi / 2 + 0.1 * i, np.pi / 2, radius=2.7),
            camera.FFHQ_INTRINSICS)
        for i in range(F)
    ], axis=0)
    cam2world = cs[:, :16].reshape(-1, 4, 4)
    intr = cs[:, 16:25].reshape(-1, 3, 3)
    o, d = jax.jit(lambda a, b: sample_rays(a, b, res))(cam2world, intr)
    Rrays = o.shape[1]

    # Representative coarse-pass points.
    ray_start, ray_end = opts["ray_start"], opts["ray_end"]
    depths = jax.jit(lambda o: I.sample_stratified(None, o, ray_start, ray_end, S))(o)
    pts = (o[:, :, None, :] + depths * d[:, :, None, :]).reshape(F, -1, 3)
    dirs = jnp.broadcast_to(d[:, :, None, :], (F, Rrays, S, 3)).reshape(F, -1, 3)
    M = pts.shape[1]

    results = {}
    results["pack_planes_ms"] = timeit(jax.jit(R.pack_planes), raw_planes, label="pack_planes_ms") * 1e3

    gather = jax.jit(
        lambda pk, c: R.sample_packed_planes(pk, c, opts["box_warp"]))
    results["gather_coarse_ms"] = timeit(gather, packed, pts, label="gather_coarse_ms") * 1e3

    rows_gather = jax.jit(
        lambda pk, c: R.sample_packed_rows(pk, c, opts["box_warp"]))
    results["gather_rows_ms"] = timeit(rows_gather, packed, pts, label="gather_rows_ms") * 1e3

    rows = rows_gather(packed, pts)
    dec_rows = jax.jit(lambda r: g.decoder.apply_rows(
        params["decoder"], r, (F, M)))
    results["decoder_rows_ms"] = timeit(dec_rows, rows, label="decoder_rows_ms") * 1e3
    # Free the [F*M, 12C] rows tensor (3 GB at 96 spp) before the fused
    # variant recomputes its own copy as a transient — both at once OOM.
    del rows

    fused_rows = jax.jit(lambda pk, c: g.decoder.apply_rows(
        params["decoder"], R.sample_packed_rows(pk, c, opts["box_warp"]),
        (F, M)))
    results["gather_plus_decode_rows_ms"] = timeit(fused_rows, packed, pts, label="gather_plus_decode_rows_ms") * 1e3

    feats = gather(packed, pts)
    dec = jax.jit(lambda f, dd: g.decoder.apply(params["decoder"], f, dd))
    results["decoder_ms"] = timeit(dec, feats, dirs, label="decoder_ms") * 1e3

    out = dec(feats, dirs)
    colors = out["rgb"].reshape(F, Rrays, S, -1)
    sigmas = out["sigma"].reshape(F, Rrays, S, 1)

    march = jax.jit(lambda c, s, dd: march_rays(c, s, dd, opts))
    results["march_ms"] = timeit(march, colors, sigmas, depths, label="march_ms") * 1e3

    _, _, weights = march(colors, sigmas, depths)
    imp = jax.jit(lambda dd, w: I.sample_importance(None, dd, w, S))
    results["importance_ms"] = timeit(imp, depths, weights, label="importance_ms") * 1e3

    fine = imp(depths, weights)
    unify = jax.jit(lambda *a: R.unify_samples(*a, method="onehot"))
    results["sortmerge_onehot_ms"] = timeit(
        unify, depths, colors, sigmas, fine, colors, sigmas, label="sortmerge_onehot_ms") * 1e3
    unify_s = jax.jit(lambda *a: R.unify_samples(*a, method="sort"))
    results["sortmerge_sort_ms"] = timeit(
        unify_s, depths, colors, sigmas, fine, colors, sigmas, label="sortmerge_sort_ms") * 1e3
    unify_h = jax.jit(lambda *a: R.unify_samples(*a, method="hybrid"))
    results["sortmerge_hybrid_ms"] = timeit(
        unify_h, depths, colors, sigmas, fine, colors, sigmas, label="sortmerge_hybrid_ms") * 1e3
    # 'weights' merge folds the final march in (no color transport); its
    # comparable baseline is sortmerge_hybrid_ms + march96_ms.
    mm = jax.jit(lambda *a: R.march_merged(*a, opts))
    results["merge_march_weights_ms"] = timeit(
        mm, depths, colors, sigmas, fine, colors, sigmas, label="merge_march_weights_ms") * 1e3
    mmr = jax.jit(lambda *a: R.march_merged(*a, opts, method="count"))
    results["merge_march_ranks_ms"] = timeit(
        mmr, depths, colors, sigmas, fine, colors, sigmas, label="merge_march_ranks_ms") * 1e3

    # March at the merged S=2*48 length (the production final march; the
    # march_ms row above is the S=48 coarse-pass one).
    d96 = jnp.concatenate([depths, fine], axis=2)
    c96 = jnp.concatenate([colors, colors], axis=2)
    s96 = jnp.concatenate([sigmas, sigmas], axis=2)
    results["march96_ms"] = timeit(march, c96, s96, d96, label="march96_ms") * 1e3

    # Ray generation (camera -> origins/directions), part of the full
    # frame but outside every stage above.
    raygen = jax.jit(lambda a, b: sample_rays(a, b, res))
    results["raygen_ms"] = timeit(raygen, cam2world, intr, label="raygen_ms") * 1e3

    # Stratified depth generation (deterministic grid).
    strat = jax.jit(
        lambda oo: I.sample_stratified(None, oo, ray_start, ray_end, S))
    results["stratified_ms"] = timeit(strat, o, label="stratified_ms") * 1e3

    # Eval chain WITH point generation folded in (what render_rays actually
    # runs per pass) vs the precomputed-pts gather rows above: the delta is
    # the unnormalize/floor/index glue + pts expansion.
    def eval_chain(pk, oo, dd, de):
        pts_ = (oo[:, :, None, :] + de * dd[:, :, None, :]).reshape(F, -1, 3)
        feats_ = R.sample_packed_planes(pk, pts_, opts["box_warp"])
        return g.decoder.apply(params["decoder"], feats_, None)["rgb"]

    results["evalchain_ptsgen_ms"] = timeit(
        jax.jit(eval_chain), packed, o, d, depths, label="evalchain_ptsgen_ms") * 1e3

    def _decode_closure(rows_path=False):
        # Production render_planes attaches rows_fn only when the opt-in
        # decoder_rows_path flag is set (it measured a LOSS on v5e); the
        # volumetric ablation rows must match the production dispatch.
        def decode(f, di):
            return g.decoder.apply(params["decoder"], f, di)

        if rows_path:
            decode.rows_fn = lambda r, shape: g.decoder.apply_rows(
                params["decoder"], r, shape)
        return decode

    # Drop the staged per-stage operands (several GB at 96 spp) before the
    # full-program rows — they recompute everything internally.
    del feats, out, colors, sigmas, fine, weights, c96, s96, d96

    full_vol = jax.jit(
        lambda pk, oo, dd: R.render_rays(pk, _decode_closure(),
                                         oo, dd, opts, rng=None))
    results["volumetric_total_ms"] = timeit(full_vol, packed, o, d, label="volumetric_total_ms") * 1e3

    full_vol_rows = jax.jit(
        lambda pk, oo, dd: R.render_rays(pk, _decode_closure(rows_path=True),
                                         oo, dd, opts, rng=None))
    results["volumetric_rows_path_ms"] = timeit(
        full_vol_rows, packed, o, d, label="volumetric_rows_path_ms") * 1e3

    opts_h = dict(opts, sample_merge="hybrid")
    full_vol_h = jax.jit(
        lambda pk, oo, dd: R.render_rays(pk, _decode_closure(),
                                         oo, dd, opts_h, rng=None))
    results["volumetric_hybrid_ms"] = timeit(full_vol_h, packed, o, d, label="volumetric_hybrid_ms") * 1e3

    opts_w = dict(opts, sample_merge="weights")
    full_vol_w = jax.jit(
        lambda pk, oo, dd: R.render_rays(pk, _decode_closure(),
                                         oo, dd, opts_w, rng=None))
    results["volumetric_weights_ms"] = timeit(full_vol_w, packed, o, d, label="volumetric_weights_ms") * 1e3

    opts_r = dict(opts, sample_merge="ranks")
    full_vol_r = jax.jit(
        lambda pk, oo, dd: R.render_rays(pk, _decode_closure(),
                                         oo, dd, opts_r, rng=None))
    results["volumetric_ranks_ms"] = timeit(full_vol_r, packed, o, d, label="volumetric_ranks_ms") * 1e3

    # 'mxu_barrier' combine: gather split from its consumer fusion (probes
    # the in-program vs isolated gather-rate gap).
    opts_b = dict(opts, packed_combine="mxu_barrier")
    full_vol_b = jax.jit(
        lambda pk, oo, dd: R.render_rays(pk, _decode_closure(),
                                         oo, dd, opts_b, rng=None))
    results["volumetric_mxu_barrier_ms"] = timeit(
        full_vol_b, packed, o, d, label="volumetric_mxu_barrier_ms") * 1e3

    # Coarse-only ablation (no importance pass): one gather+decode+march.
    opts_c = dict(opts, depth_resolution_importance=0)
    vol_coarse = jax.jit(
        lambda pk, oo, dd: R.render_rays(pk, _decode_closure(),
                                         oo, dd, opts_c, rng=None))
    results["volumetric_coarse_only_ms"] = timeit(vol_coarse, packed, o, d, label="volumetric_coarse_only_ms") * 1e3

    feats_img, _, _ = full_vol(packed, o, d)
    feature_image = feats_img.transpose(0, 2, 1).reshape(F, -1, res, res)
    wsb = jnp.broadcast_to(ws, (F,) + ws.shape[1:])
    sr = jax.jit(lambda fi, w: g.superresolution.apply(
        params["superresolution"], fi[:, :3], fi, w, noise_mode="none",
        dtype=dtype)[0])
    results["sr_ms"] = timeit(sr, feature_image, wsb, label="sr_ms") * 1e3

    full = jax.jit(lambda p, pk, w, c: g.render_planes(
        p, pk, c, jnp.broadcast_to(w, (F,) + w.shape[1:]),
        noise_mode="const", dtype=dtype)["image"])
    results["full_frame_batch_ms"] = timeit(full, params, packed, ws, cs, label="full_frame_batch_ms") * 1e3

    per_frame = {k: v / F for k, v in results.items()
                 if k not in ("pack_planes_ms",)}
    print(f"=== per frame-batch ({F} frames, {S}+{S} spp) ===")
    for k, v in results.items():
        print(f"{k:28s} {v:9.3f}")
    print("=== per frame ===")
    for k, v in per_frame.items():
        print(f"{k:28s} {v:9.3f}")
    print(f"rows/frame gather: {M * 3 / 1e6:.2f}M coarse (x2 passes)")


if __name__ == "__main__":
    main()
