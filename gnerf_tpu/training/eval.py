"""Evaluation CLI: reconstruction metrics on a held-out set.

The working replacement for the reference's broken `metrics.metric_main`
surface (`train.py:31,297-298`): encode each held-out identity, re-render
it at its own camera, and report PSNR / SSIM / LPIPS (plus per-item
values in a jsonl). Runs the same validation math the trainer uses, over
a full dataset instead of one grid.
"""

from __future__ import annotations

import json
import os

import click
import numpy as np

import jax
import jax.numpy as jnp


def run_eval(network: str, real_data: str = "", dataset_name: str = "synthetic",
             max_items: int = 64, batch: int = 4, out: str = "",
             lpips_weights: str = "", inception_weights: str = ""):
    from ..models import ResNeXt50Encoder, TriPlaneGenerator
    from ..utils import checkpoint as ckpt
    from .dataset import SyntheticDataset, TestDataset, collate
    from .losses import VGG16LPIPS
    from .metrics import reconstruction_metrics

    trees, config = ckpt.load_checkpoint(network)
    gen_cfg = (config or {}).get("generator", {})
    g = TriPlaneGenerator(**gen_cfg) if gen_cfg else TriPlaneGenerator(
        img_resolution=128,
        rendering_kwargs=dict(
            TriPlaneGenerator().rendering_kwargs,
            superresolution_module="SuperresolutionHybrid2X",
            depth_resolution=12, depth_resolution_importance=12,
        ),
    )
    enc = ResNeXt50Encoder(out_dim=g.z_dim)
    params_g = trees.get("G_ema", trees.get("G"))
    params_e = trees.get("E")
    # EG3D pretraining snapshots carry G_ema/G/D but no encoder: evaluate
    # the GAN GENERATIVELY (sample z, poses from the dataset's label
    # distribution, Frechet distance vs the real set) — the reference's
    # fid50k_full semantics (its `metrics` package import is broken,
    # reference train.py:31; implemented here).
    generative = params_e is None
    state_e = trees.get("E_state")
    if state_e is None and not generative:
        _, state_e = enc.init(jax.random.PRNGKey(0))
    if lpips_weights:
        from .losses import load_lpips

        vgg, params_vgg, _ = load_lpips(lpips_weights)
    else:
        vgg = VGG16LPIPS()
        params_vgg = trees.get("VGG") or vgg.init(jax.random.PRNGKey(1))

    # Size the held-out set from the ACTUAL synthesized output (pure shape
    # inference, no FLOPs): equals g.img_resolution at the flagship configs,
    # but reduced-scale configs legitimately emit smaller images (the SR
    # variants pin their reference output size via __post_init__ asserts
    # while the spatial size flows through dynamically).
    ws_s = jax.ShapeDtypeStruct((1, g.num_ws, g.w_dim), jnp.float32)
    c_s = jax.ShapeDtypeStruct((1, 25), jnp.float32)
    out_res = int(jax.eval_shape(
        lambda p, w, c: g.synthesis(p, w, c, noise_mode="none"),
        params_g, ws_s, c_s)["image"].shape[-1])

    if dataset_name == "synthetic":
        dataset = SyntheticDataset(resolution=out_res, size=max_items)
    elif dataset_name == "afhqv2":
        from .dataset import Afhqv2TestDataset

        dataset = Afhqv2TestDataset(real_path=real_data, max_size=max_items,
                                    resolution=out_res)
    elif dataset_name == "shapenet":
        from .dataset import ShapeNetTestDataset

        dataset = ShapeNetTestDataset(real_path=real_data, max_size=max_items,
                                      resolution=out_res)
    else:
        dataset = TestDataset(real_path=real_data, max_size=max_items,
                              resolution=out_res)

    @jax.jit
    def eval_batch(params_e, state_e, params_g, params_vgg, batch_data):
        imgs = batch_data["condition_image"].astype(jnp.float32) / 127.5 - 1.0
        z, _ = enc.apply(params_e, state_e, imgs, train=False)
        c = batch_data["loss_c"].astype(jnp.float32)
        ws = g.mapping(params_g, z, c)
        outd = g.synthesis(params_g, ws, c, noise_mode="none")
        real = batch_data["loss_image"].astype(jnp.float32) / 127.5 - 1.0
        return reconstruction_metrics(vgg, params_vgg, real, outd["image"])

    @jax.jit
    def render_batch(params_e, state_e, params_g, batch_data):
        imgs = batch_data["condition_image"].astype(jnp.float32) / 127.5 - 1.0
        z, _ = enc.apply(params_e, state_e, imgs, train=False)
        c = batch_data["loss_c"].astype(jnp.float32)
        ws = g.mapping(params_g, z, c)
        return g.synthesis(params_g, ws, c, noise_mode="none")["image"]

    @jax.jit
    def gen_batch(params_g, z, c):
        # Unconditional sample at psi=1 (the fid50k convention: no
        # truncation), poses drawn from the dataset's label distribution.
        ws = g.mapping(params_g, z, c)
        return g.synthesis(params_g, ws, c, noise_mode="none")["image"]

    collect_frames = bool(inception_weights) or generative
    results = []
    real_frames, fake_frames = [], []
    n = min(max_items, len(dataset))
    for start in range(0, n - n % batch, batch):
        items = [dataset[i] for i in range(start, start + batch)]
        bd = {k: jnp.asarray(v) for k, v in collate(items).items()
              if k in ("condition_image", "loss_image", "loss_c")}
        if generative:
            z = jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(0), start),
                (batch, g.z_dim))
            fake = gen_batch(params_g, z,
                             bd["loss_c"].astype(jnp.float32))
            real_frames.append(
                np.asarray(bd["loss_image"], np.float32) / 127.5 - 1.0)
            fake_frames.append(np.asarray(fake, np.float32))
            print(f"[{start + batch}/{n}] sampled")
            continue
        m = eval_batch(params_e, state_e, params_g, params_vgg, bd)
        if collect_frames:
            real_frames.append(
                np.asarray(bd["loss_image"], np.float32) / 127.5 - 1.0)
            fake_frames.append(np.asarray(
                render_batch(params_e, state_e, params_g, bd), np.float32))
        results.append({k: float(v) for k, v in m.items()})
        print(f"[{start + batch}/{n}] " +
              " ".join(f"{k}={v:.4f}" for k, v in results[-1].items()))

    summary = {
        k: float(np.mean([r[k] for r in results])) for k in (
            results[0] if results else ())
    }
    summary["num_items"] = max(len(results), len(real_frames)) * batch
    if inception_weights:
        # Canonical FID over the held-out set: pinned pretrained pool-3
        # InceptionV3 features (tools/convert_inception.py).
        from .inception import load_inception
        from .metrics import frechet_feature_distance, make_inception_feature_fn

        _, params_inc = load_inception(inception_weights)
        feature_fn = make_inception_feature_fn(params_inc)
        summary["fid"] = frechet_feature_distance(
            feature_fn, real_frames, fake_frames)
    elif generative:
        # No pinned inception features available: fall back to a Frechet
        # distance over the VGG embedding — comparable across runs of THIS
        # framework, but NOT canonical FID (and meaningless if the VGG is
        # random-init; loud by design).
        from .metrics import frechet_feature_distance, make_vgg_feature_fn

        print("WARNING: generative eval without --inception-weights — "
              "reporting Frechet distance over VGG features "
              "(frechet_vgg), NOT canonical FID")
        feature_fn = make_vgg_feature_fn(vgg, params_vgg)
        summary["frechet_vgg"] = frechet_feature_distance(
            feature_fn, real_frames, fake_frames)
    print(json.dumps(summary))
    if out:
        with open(out, "w") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")
            f.write(json.dumps(summary) + "\n")
    return summary


@click.command()
@click.option("--network", required=True)
@click.option("--real_data", default="")
@click.option("--dataset_name", default="synthetic")
@click.option("--max_items", type=int, default=64)
@click.option("--batch", type=int, default=4)
@click.option("--out", default="")
@click.option("--lpips-weights", "lpips_weights", default="",
              help="converted vgg16.pt npz (tools/convert_vgg16_lpips.py)")
@click.option("--inception-weights", "inception_weights", default="",
              help="converted inception_v3 npz (tools/convert_inception.py); "
                   "enables FID over the held-out set")
def main(**kwargs):
    run_eval(**kwargs)


if __name__ == "__main__":
    main()
