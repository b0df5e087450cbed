"""Config-ablation / sub-graph profile of the TRAINING step (VERDICT r2
item 2: training-side perf rigor).

Methodology (same rules as tools/profile_renderer.py, adapted to training):
the axon relay makes `block_until_ready` unreliable and charges ~95 s/GB for
NEW device buffers returned to host, so every timed program returns ONE
scalar (a grad-norm sum) and is fenced by float(). Isolated timings carry
~30 ms dispatch overhead per call — negligible against second-scale training
stages. The stages partition the G branch the way BASELINE.md's inference
stage table partitions the frame:

  e_fwd_bwd            ResNeXt50 encoder forward+backward
  backbone_fwd_bwd     mapping + StyleGAN2 synthesis to 96ch planes, f+b
  render_fwd_bwd       two-pass volumetric render given planes, f+b
  sr_fwd_bwd           SuperresolutionHybrid8XDC given features, f+b
  lpips_fwd_bwd        VGG16-LPIPS at 512^2 + 64^2, f+b
  synthesis_fwd_bwd    backbone+render+SR end-to-end, f+b (remat'd)
  g_branch             the full G loss (recon + depth-GAN G term), f+b
  d_branch             depth-D loss incl. R1 (nested grad), f+b
  full_step            the production jitted train_step (both Adams)

Finer synthesis attribution (--synth-split, VERDICT r3 item 3 — the
0.364 s synthesis branch is 56% of the step):
  render_coarse_fwd_bwd   one 48-spp pass + march only (importance=0), f+b
                          (render_fwd_bwd - this = fine pass + merge)
  gather_fwd_bwd          packed tri-plane sampling alone, f+b (the row
                          gather + its one-scatter VJP)
  synthesis_noremat       synthesis f+b with remat off (difference vs
                          synthesis_fwd_bwd = recompute cost, IF it fits)
  synthesis_remat3        per-stage remat (backbone / render / SR each
                          checkpointed separately) — candidate policy

Run on the real chip:  python tools/profile_train.py --batch 4 --dtype bf16
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


def grad_norm(tree):
    import jax
    import jax.numpy as jnp

    return sum(jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(tree))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dtype", choices=["fp32", "bf16"], default="fp32")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--synth-split", action="store_true",
                    help="finer synthesis attribution (coarse pass, packed "
                         "gather f+b, remat ablations)")
    ap.add_argument("--lpips_ab", action="store_true",
                    help="also time the sep (r4) and fused (one-batch "
                         "concat) LPIPS structural forms next to the "
                         "production split form")
    ap.add_argument("--skip-encoder-split", action="store_true",
                    help="skip the per-stage encoder rows (6 extra compiles)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gnerf_tpu.models import Discriminator, ResNeXt50Encoder, TriPlaneGenerator
    from gnerf_tpu.training import (
        SyntheticDataset,
        TrainConfig,
        VGG16LPIPS,
        data_iterator,
        init_train_state,
        make_optimizers,
        make_train_step,
    )
    from gnerf_tpu.training import losses as L
    from gnerf_tpu.ops.interpolate import interpolate_bilinear

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B = args.batch
    g = TriPlaneGenerator()  # flagship defaults: 512^2, 8XDC, 48+48
    enc = ResNeXt50Encoder(out_dim=g.z_dim)
    disc = Discriminator(c_dim=25, img_resolution=g.neural_rendering_resolution,
                         img_channels=1)
    vgg = VGG16LPIPS()
    cfg = TrainConfig(batch_size=B, gan_depth=True, train_en=True,
                      train_gen=True, dtype=dtype)
    state = init_train_state(g, enc, disc, vgg, cfg, jax.random.PRNGKey(0))
    opt_g, opt_d = make_optimizers(g, state.params_e, state.params_g, cfg)
    step_fn = make_train_step(g, enc, disc, vgg, opt_g, opt_d, cfg)

    ds = SyntheticDataset(resolution=g.img_resolution,
                          depth_resolution=g.neural_rendering_resolution,
                          size=B * 2)
    batch = {k: jnp.asarray(v) for k, v in next(data_iterator(ds, B)).items()}
    res = cfg.neural_rendering_resolution

    id_images = batch["condition_image"].astype(cfg.dtype) / 127.5 - 1.0
    loss_c = batch["loss_c"].astype(jnp.float32)
    real_img = batch["loss_image"].astype(jnp.float32) / 127.5 - 1.0
    real_raw = interpolate_bilinear(
        batch["loss_image"].astype(jnp.float32), res, res, antialias=True
    ) / 127.5 - 1.0

    results: dict[str, float] = {}

    # --- encoder ---------------------------------------------------------
    @jax.jit
    def e_fb(params_e, state_e, x):
        def f(p):
            z, _ = enc.apply(p, state_e, x, train=True)
            return jnp.sum(z)

        return grad_norm(jax.grad(f)(params_e))

    results["e_fwd_bwd"] = timed(e_fb, state.params_e, state.state_e, id_images,
                                 reps=args.reps)

    # Encoder attribution: cumulative fwd+bwd truncated after the stem and
    # after each residual stage (differences = per-stage cost), plus the
    # train=False ablation (running stats, no batch-moment sweeps) to bound
    # the BatchNorm-statistics share of the BN-bound floor argument.
    for k in range(0 if args.skip_encoder_split else 5):
        @jax.jit
        def e_fb_k(params_e, state_e, x, k=k):
            def f(p):
                feat, _ = enc.apply(p, state_e, x, train=True, stages=k)
                return jnp.sum(feat.astype(jnp.float32))

            return grad_norm(jax.grad(f)(params_e))

        results[f"e_fwd_bwd_stages{k}"] = timed(
            e_fb_k, state.params_e, state.state_e, id_images, reps=args.reps)

    if not args.skip_encoder_split:
        @jax.jit
        def e_fb_eval_bn(params_e, state_e, x):
            def f(p):
                z, _ = enc.apply(p, state_e, x, train=False)
                return jnp.sum(z)

            return grad_norm(jax.grad(f)(params_e))

        results["e_fwd_bwd_running_bn"] = timed(
            e_fb_eval_bn, state.params_e, state.state_e, id_images,
            reps=args.reps)

    # Shared activations for the stage boundaries (computed once, reused).
    z0, _ = enc.apply(state.params_e, state.state_e, id_images, train=False)
    ws0 = g.mapping(state.params_g, z0, loss_c)
    planes0 = g.backbone_planes(state.params_g, ws0, noise_mode="const",
                                dtype=cfg.dtype)
    ws0, planes0 = jax.block_until_ready((ws0, planes0))

    # --- mapping + backbone ---------------------------------------------
    @jax.jit
    def bb_fb(params_g, z, c):
        def f(p):
            ws = g.mapping(p, z, c)
            planes = g.backbone_planes(p, ws, noise_mode="const",
                                       dtype=cfg.dtype)
            return jnp.sum(planes.astype(jnp.float32))

        return grad_norm(jax.grad(f)(params_g))

    results["backbone_fwd_bwd"] = timed(bb_fb, state.params_g, z0, loss_c,
                                        reps=args.reps)

    # --- volumetric render (two passes), given planes --------------------
    @jax.jit
    def render_fb(params_g, planes, c, ws):
        def f(pl):
            out = g.render_planes(params_g, pl, c, ws,
                                  neural_rendering_resolution=res,
                                  noise_mode="const", dtype=cfg.dtype,
                                  superres=False)
            return (jnp.sum(out["feature_image"].astype(jnp.float32))
                    + jnp.sum(out["image_depth"]))

        return jnp.sum(jnp.square(jax.grad(f)(planes).astype(jnp.float32)))

    # --- superresolution, given features --------------------------------
    feat0 = jax.block_until_ready(
        g.render_planes(state.params_g, planes0, loss_c, ws0,
                        neural_rendering_resolution=res, noise_mode="const",
                        dtype=cfg.dtype, superres=False)["feature_image"])

    @jax.jit
    def sr_fb(params_g, feat, ws):
        def f(x):
            sr = g.superresolution
            rgb = x[:, :3]
            img = sr.apply(params_g["superresolution"], rgb, x, ws,
                           noise_mode="none", dtype=cfg.dtype)[0]
            return jnp.sum(img.astype(jnp.float32))

        return jnp.sum(jnp.square(jax.grad(f)(feat).astype(jnp.float32)))

    # --- LPIPS at both scales: the three structural forms ---------------
    # All three compute identical values; they differ in how much VGG
    # conv work the VJP + remat re-forward do (r5, BASELINE.md LPIPS row):
    #   sep    r3/r4 production — one remat'd distance per tier, two
    #          batch-N passes each; the constant real side's backward is
    #          DCE'd but its forward is still re-run by remat
    #   fused  the one-batch [real; fake] concat — fuller early-conv
    #          matmuls, but conv backward + remat re-forward now run over
    #          the constant half too (can't DCE half a conv batch)
    #   split  current production (train_loop.lpips_pair_terms) — 2N
    #          targets in ONE un-remat'd fwd-only pass + 2N fakes in ONE
    #          remat'd differentiated pass
    from gnerf_tpu.ops.interpolate import interpolate_bilinear as _interp

    def _to_vgg(x):
        x = x.astype(cfg.dtype)
        if x.shape[-1] != vgg.resize_to:
            x = _interp(x, vgg.resize_to, vgg.resize_to,
                        antialias=vgg.antialias)
        return x

    def _dist(emb_t, emb_f):
        return jnp.sum(jnp.square((emb_t - emb_f).astype(jnp.float32)))

    def _sep_tier(pv, real, fake):
        fa = L.lpips_embed(vgg, pv, real.astype(cfg.dtype))
        fb = L.lpips_embed(vgg, pv, fake.astype(cfg.dtype))
        return _dist(fa, fb)

    _sep_tier_r = jax.checkpoint(_sep_tier)

    def _fused_tier(pv, real, fake):
        return L.lpips_distance(vgg, pv, real.astype(cfg.dtype),
                                fake.astype(cfg.dtype)).sum()

    _fused_tier_r = jax.checkpoint(_fused_tier)

    _embed = lambda pv, x: L.lpips_embed(vgg, pv, x)
    _embed_r = jax.checkpoint(_embed)

    def _split_pair(pv, a, b):
        tgt = jnp.concatenate([_to_vgg(real_img), _to_vgg(real_raw)], axis=0)
        fak = jnp.concatenate([_to_vgg(a), _to_vgg(b)], axis=0)
        emb_t = jax.lax.stop_gradient(_embed(pv, tgt))
        emb_f = _embed_r(pv, fak)
        return _dist(emb_t, emb_f)

    def _lpips_variant(form):
        def f(a, b):
            if form == "sep":
                return (_sep_tier_r(state.params_vgg, real_img, a)
                        + _sep_tier_r(state.params_vgg, real_raw, b))
            if form == "fused":
                return (_fused_tier_r(state.params_vgg, real_img, a)
                        + _fused_tier_r(state.params_vgg, real_raw, b))
            return _split_pair(state.params_vgg, a, b)

        @jax.jit
        def fb(fake_full, fake_raw):
            ga, gb = jax.grad(f, argnums=(0, 1))(fake_full, fake_raw)
            return jnp.sum(jnp.square(ga)) + jnp.sum(jnp.square(gb))

        return fb

    # --- full synthesis f+b ---------------------------------------------
    @jax.jit
    def synth_fb(params_g, z, c, key):
        def f(p):
            ws = g.mapping(p, z, c)
            out = g.synthesis(p, ws, c, neural_rendering_resolution=res,
                              noise_mode="random", rng=key, dtype=cfg.dtype)
            return (jnp.sum(out["image"].astype(jnp.float32))
                    + jnp.sum(out["image_raw"].astype(jnp.float32)))

        return grad_norm(jax.grad(f)(params_g))

    try:
        results["render_fwd_bwd"] = timed(
            render_fb, state.params_g, planes0, loss_c, ws0, reps=args.reps)
        results["sr_fwd_bwd"] = timed(sr_fb, state.params_g, feat0, ws0,
                                      reps=args.reps)
    except TypeError as err:
        print(f"(stage split unavailable: {err})")
    fake_full = real_img + 0.01
    fake_raw = real_raw + 0.01
    results["lpips_fwd_bwd"] = timed(_lpips_variant("split"), fake_full,
                                     fake_raw, reps=args.reps)
    if args.lpips_ab:
        results["lpips_fwd_bwd_sep"] = timed(_lpips_variant("sep"),
                                             fake_full, fake_raw,
                                             reps=args.reps)
        results["lpips_fwd_bwd_fused"] = timed(_lpips_variant("fused"),
                                               fake_full, fake_raw,
                                               reps=args.reps)
    results["synthesis_fwd_bwd"] = timed(
        synth_fb, state.params_g, z0, loss_c, jax.random.PRNGKey(2),
        reps=args.reps)

    if args.synth_split:
        import dataclasses as _dc

        from gnerf_tpu.render.renderer import (pack_planes,
                                               sample_packed_planes)

        # Coarse-only render f+b: one 48-spp pass + march, no importance
        # resample / fine pass / merge. render_fwd_bwd minus this = the
        # second pass plus importance sampling plus the sort-merge.
        rk_coarse = dict(g.rendering_kwargs, depth_resolution_importance=0)
        g_coarse = _dc.replace(g, rendering_kwargs=rk_coarse)

        @jax.jit
        def render_coarse_fb(params_g, planes, c, ws):
            def f(pl):
                out = g_coarse.render_planes(
                    params_g, pl, c, ws, neural_rendering_resolution=res,
                    noise_mode="const", dtype=cfg.dtype, superres=False)
                return (jnp.sum(out["feature_image"].astype(jnp.float32))
                        + jnp.sum(out["image_depth"]))

            return jnp.sum(jnp.square(jax.grad(f)(planes).astype(jnp.float32)))

        results["render_coarse_fwd_bwd"] = timed(
            render_coarse_fb, state.params_g, planes0, loss_c, ws0,
            reps=args.reps)

        # Packed gather f+b in isolation, at the per-step point count
        # (B x res^2 x 96 samples over both passes): the row gather forward
        # + its VJP (ONE 128-lane row scatter-add + dense unpack).
        packed0 = jax.block_until_ready(pack_planes(planes0))
        n_pts = res * res * (g.rendering_kwargs["depth_resolution"]
                             + g.rendering_kwargs["depth_resolution_importance"])
        pts = jax.random.uniform(jax.random.PRNGKey(5), (B, n_pts, 3),
                                 minval=-0.4, maxval=0.4)

        @jax.jit
        def gather_fb(rows, pts):
            def f(r):
                pk = packed0._replace(rows=r)
                feats = sample_packed_planes(
                    pk, pts, box_warp=g.rendering_kwargs["box_warp"])
                return jnp.sum(feats.astype(jnp.float32))

            return jnp.sum(jnp.square(jax.grad(f)(rows).astype(jnp.float32)))

        results["gather_fwd_bwd"] = timed(gather_fb, packed0.rows, pts,
                                          reps=args.reps)

        # Remat ablations: whole-synthesis checkpoint (production) vs none
        # vs per-stage (backbone / render+SR boundaries saved).
        def synth_with(remat_mode):
            def fb(params_g, z, c, key):
                def f(p):
                    ws = g.mapping(p, z, c)
                    if remat_mode == "stage3":
                        bb = jax.checkpoint(
                            lambda p_, w_, k_: g.backbone_planes(
                                p_, w_, noise_mode="random", rng=k_,
                                dtype=cfg.dtype, pack=True))
                        rp = jax.checkpoint(
                            lambda p_, pl_, c_, w_, k_: g.render_planes(
                                p_, pl_, c_, w_,
                                neural_rendering_resolution=res,
                                noise_mode="random", rng=k_,
                                dtype=cfg.dtype))
                        k1, k2 = jax.random.split(key)
                        planes = bb(p, ws, k1)
                        out = rp(p, planes, c, ws, k2)
                    else:
                        def synth_(p_, ws_, c_, key_):
                            return g.synthesis(
                                p_, ws_, c_,
                                neural_rendering_resolution=res,
                                noise_mode="random", rng=key_,
                                dtype=cfg.dtype)

                        if remat_mode == "whole":
                            synth_ = jax.checkpoint(synth_)
                        out = synth_(p, ws, c, key)
                    return (jnp.sum(out["image"].astype(jnp.float32))
                            + jnp.sum(out["image_raw"].astype(jnp.float32)))

                return grad_norm(jax.grad(f)(params_g))

            return jax.jit(fb)

        for mode, name in [("none", "synthesis_noremat"),
                           ("stage3", "synthesis_remat3")]:
            try:
                results[name] = timed(synth_with(mode), state.params_g, z0,
                                      loss_c, jax.random.PRNGKey(2),
                                      reps=args.reps)
            except Exception as err:  # OOM expected for 'none' at flagship
                msg = str(err)
                results[name] = ("OOM" if "RESOURCE_EXHAUSTED" in msg
                                 or "Out of memory" in msg else msg[:120])

    # --- full production step -------------------------------------------
    step = jax.jit(step_fn, donate_argnums=())

    def full(state_, batch_, key):
        _, stats = step(state_, batch_, key)
        return stats["Loss/G/l1_loss"]

    results["full_step"] = timed(full, state, batch, jax.random.PRNGKey(3),
                                 reps=args.reps)

    print(json.dumps({
        "batch": B, "dtype": args.dtype,
        "stages_s": {k: (round(v, 3) if isinstance(v, float) else v)
                     for k, v in results.items()},
        "imgs_per_s_per_chip": round(B / results["full_step"], 3),
    }))


if __name__ == "__main__":
    main()
