"""Pivotal Tuning Inversion (PTI): per-identity generator fine-tuning.

Capability equivalent of the reference PTI harness
(`/root/reference/g_nerf/train_generator/train.py` + `training/coaches/*` +
`criteria/localitly_regulizer.py`): freeze the superresolution module, tune
the rest of G against an LPIPS (+optional L1) reconstruction of the target
image(s) at a fixed pivot latent, optionally with the "ball holder"
locality regularizer that keeps the tuned generator close to the original
in a neighborhood of the pivot.

Functional re-design: one jitted `pti_step`; the pivot latent comes from
the identity encoder (the G-NeRF way), from a user-provided ws, or from
`project_w` — a native w-space projector (the module the reference's
`base_coach.py:11` tries to import from `training.projectors.w_projector`
but which is absent from the reference repo; re-derived here from the
standard StyleGAN2/PTI recipe). Single- and multi-image coaching
(reference single_id/multi_id coaches) are both just the shape of the
batch you feed.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.triplane import TriPlaneGenerator
from . import losses as L


@dataclasses.dataclass(frozen=True)
class PTIConfig:
    lr: float = 3e-4                      # hyperparameters.first_inv_lr scale
    l1_lambda: float = 0.0                # reference uses pure LPIPS by default
    lpips_lambda: float = 1.0
    # Ball-holder locality regularizer (reference localitly_regulizer.py).
    use_locality_reg: bool = False
    regulizer_alpha: float = 30.0
    regulizer_l2_lambda: float = 0.1
    regulizer_lpips_lambda: float = 0.1
    latent_ball_num_of_samples: int = 1
    locality_truncation: float = 0.5
    neural_rendering_resolution: int = 64


def _freeze_sr_mask(params_g: Mapping) -> Mapping:
    """Trainable-mask: everything except the superresolution module
    (reference `train_generator/train.py:60-61`)."""
    mask = jax.tree_util.tree_map(lambda _: True, dict(params_g))
    mask["superresolution"] = jax.tree_util.tree_map(
        lambda _: False, params_g["superresolution"]
    )
    return mask


def make_optimizer(params_g, cfg: PTIConfig):
    labels = jax.tree_util.tree_map(
        lambda t: "train" if t else "freeze", _freeze_sr_mask(params_g)
    )
    return optax.multi_transform(
        {"train": optax.adam(cfg.lr, b1=0.9, b2=0.999),
         "freeze": optax.set_to_zero()},
        param_labels=labels,
    )


def morphed_w_code(new_w: jax.Array, fixed_w: jax.Array, alpha: float) -> jax.Array:
    """Move alpha units from the pivot toward a sampled latent
    (reference `localitly_regulizer.py:15-22`)."""
    direction = new_w - fixed_w
    norm = jnp.linalg.norm(direction)
    return fixed_w + alpha * direction / (norm + 1e-8)


def make_pti_step(
    g: TriPlaneGenerator,
    vgg: L.VGG16LPIPS,
    cfg: PTIConfig,
    opt=None,
) -> Callable:
    """Returns pti_step(state, batch, rng) -> (state, stats).

    state: {params_g, params_g_original, params_vgg, opt_state}
    batch: {ws [N, num_ws, w], loss_image [-1,1] [N,3,R,R], loss_c [N,25]}
    """
    res = cfg.neural_rendering_resolution

    def loss_fn(params_g, state, batch, rng):
        k_reg, k_z = jax.random.split(rng)
        out = g.synthesis(
            params_g, batch["ws"], batch["loss_c"],
            neural_rendering_resolution=res, noise_mode="none",
        )
        synth = out["image"]
        real = batch["loss_image"]
        lp = L.lpips_training_distance(vgg, state["params_vgg"], real, synth).mean()
        loss = cfg.lpips_lambda * lp
        stats = {"Loss/pti/lpips": lp}
        if cfg.l1_lambda > 0:
            l1 = jnp.abs(real - synth).mean()
            loss = loss + cfg.l1_lambda * l1
            stats["Loss/pti/l1"] = l1

        if cfg.use_locality_reg:
            # Ball-holder: tuned G must match the ORIGINAL G at latents near
            # the pivot (reference `localitly_regulizer.py:27-55`).
            z = jax.random.normal(
                k_z, (cfg.latent_ball_num_of_samples, g.z_dim)
            )
            w_samples = g.mapping(
                state["params_g_original"], z,
                jnp.zeros((z.shape[0], g.c_dim)),
                truncation_psi=cfg.locality_truncation,
            )
            reg = 0.0
            for i in range(cfg.latent_ball_num_of_samples):
                w_moved = morphed_w_code(
                    w_samples[i : i + 1], batch["ws"], cfg.regulizer_alpha
                )
                new_img = g.synthesis(
                    params_g, w_moved, batch["loss_c"],
                    neural_rendering_resolution=res, noise_mode="none",
                )["image"]
                old_img = jax.lax.stop_gradient(
                    g.synthesis(
                        state["params_g_original"], w_moved, batch["loss_c"],
                        neural_rendering_resolution=res, noise_mode="none",
                    )["image"]
                )
                if cfg.regulizer_l2_lambda > 0:
                    reg = reg + cfg.regulizer_l2_lambda * jnp.mean(
                        jnp.square(old_img - new_img)
                    )
                if cfg.regulizer_lpips_lambda > 0:
                    reg = reg + cfg.regulizer_lpips_lambda * L.lpips_training_distance(
                        vgg, state["params_vgg"], old_img, new_img
                    ).mean()
            reg = reg / cfg.latent_ball_num_of_samples
            loss = loss + reg
            stats["Loss/pti/locality"] = reg

        stats["Loss/pti/total"] = loss
        return loss, stats

    nonlocal_opt = opt

    def pti_step(state: dict, batch, rng):
        o = nonlocal_opt if nonlocal_opt is not None else make_optimizer(
            state["params_g"], cfg
        )
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params_g"], state, batch, rng
        )
        updates, opt_state = o.update(grads, state["opt_state"], state["params_g"])
        params_g = optax.apply_updates(state["params_g"], updates)
        return dict(state, params_g=params_g, opt_state=opt_state), stats

    return pti_step


def init_pti_state(g: TriPlaneGenerator, params_g, vgg: L.VGG16LPIPS,
                   params_vgg, cfg: PTIConfig) -> dict:
    opt = make_optimizer(params_g, cfg)
    return dict(
        params_g=jax.tree_util.tree_map(jnp.copy, params_g),
        params_g_original=params_g,
        params_vgg=params_vgg,
        opt_state=opt.init(params_g),
    )


def run_pti(
    g: TriPlaneGenerator,
    params_g,
    vgg: L.VGG16LPIPS,
    params_vgg,
    ws: jax.Array,
    loss_image: jax.Array,
    loss_c: jax.Array,
    num_steps: int = 350,
    cfg: Optional[PTIConfig] = None,
    rng: Optional[jax.Array] = None,
) -> tuple[Any, list]:
    """Convenience driver: tune G on one pivot (single-id coach)."""
    cfg = cfg or PTIConfig()
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    state = init_pti_state(g, params_g, vgg, params_vgg, cfg)
    opt = make_optimizer(params_g, cfg)
    step = jax.jit(make_pti_step(g, vgg, cfg, opt))
    batch = {"ws": ws, "loss_image": loss_image, "loss_c": loss_c}
    history = []
    for i in range(num_steps):
        rng, k = jax.random.split(rng)
        state, stats = step(state, batch, k)
        history.append(float(stats["Loss/pti/total"]))
    return state["params_g"], history


def project_w(
    g: TriPlaneGenerator,
    params_g,
    vgg: L.VGG16LPIPS,
    params_vgg,
    target_image: jax.Array,   # [N, 3, R, R] in [-1, 1]
    target_c: jax.Array,       # [N, 25]
    num_steps: int = 500,
    w_avg_samples: int = 600,
    initial_lr: float = 0.01,
    initial_noise_factor: float = 0.05,
    lr_rampup_frac: float = 0.05,
    lr_rampdown_frac: float = 0.25,
    noise_ramp_frac: float = 0.75,
    l2_lambda: float = 0.0,
    start_ws: Optional[jax.Array] = None,
    neural_rendering_resolution: Optional[int] = None,
    rng: Optional[jax.Array] = None,
) -> tuple[jax.Array, list]:
    """w-space projector: optimize a single w per image (broadcast to all
    num_ws layers) so G(w) reconstructs the target — PTI's "first inversion"
    step. The reference imports `training.projectors.w_projector` for this
    but the module is MISSING from its tree (`base_coach.py:11`); this is
    the standard StyleGAN2/PTI recipe implemented natively: pivot starts at
    w_avg (estimated from `w_avg_samples` mapping draws, or at `start_ws`
    e.g. the identity encoder's output), Adam with rampup/cosine-rampdown lr,
    and decaying gaussian w-noise scaled by the measured w_std.

    Returns (ws [N, num_ws, w_dim], loss history).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    N = target_image.shape[0]
    res = neural_rendering_resolution or g.neural_rendering_resolution

    k_avg, rng = jax.random.split(rng)
    z_samples = jax.random.normal(k_avg, (w_avg_samples, g.z_dim))
    w_samples = g.mapping(
        params_g, z_samples, jnp.zeros((w_avg_samples, g.c_dim))
    )[:, :1, :]                                  # [S, 1, w_dim]
    w_avg = jnp.mean(w_samples, axis=0, keepdims=True)       # [1, 1, w]
    w_std = jnp.sqrt(jnp.mean(jnp.sum(
        jnp.square(w_samples - w_avg), axis=-1)))            # scalar

    if start_ws is not None:
        w_opt = start_ws[:, :1, :]
    else:
        w_opt = jnp.broadcast_to(w_avg, (N, 1, g.w_dim))

    opt = optax.scale_by_adam()
    opt_state = opt.init(w_opt)

    def loss_fn(w, key, noise_scale):
        w_noised = w + noise_scale * jax.random.normal(key, w.shape)
        ws = jnp.broadcast_to(w_noised, (N, g.num_ws, g.w_dim))
        out = g.synthesis(params_g, ws, target_c,
                          neural_rendering_resolution=res, noise_mode="none")
        synth = out["image"]
        loss = L.lpips_training_distance(vgg, params_vgg, target_image, synth).mean()
        if l2_lambda > 0:
            loss = loss + l2_lambda * jnp.mean(
                jnp.square(target_image - synth))
        return loss

    @jax.jit
    def step(w, opt_state, key, lr, noise_scale):
        loss, grads = jax.value_and_grad(loss_fn)(w, key, noise_scale)
        updates, opt_state = opt.update(grads, opt_state)
        return w - lr * updates, opt_state, loss

    history = []
    for i in range(num_steps):
        t = i / max(num_steps, 1)
        # Upstream projector schedule: quadratic noise decay, cosine lr
        # rampdown with a linear rampup.
        noise_scale = float(w_std) * initial_noise_factor * max(
            0.0, 1.0 - t / noise_ramp_frac) ** 2
        lr_ramp = min(1.0, (1.0 - t) / lr_rampdown_frac)
        lr_ramp = 0.5 - 0.5 * math.cos(lr_ramp * math.pi)
        lr_ramp = lr_ramp * min(1.0, t / lr_rampup_frac) if lr_rampup_frac \
            else lr_ramp
        lr = initial_lr * lr_ramp
        rng, k = jax.random.split(rng)
        w_opt, opt_state, loss = step(
            w_opt, opt_state, k, jnp.float32(lr), jnp.float32(noise_scale))
        history.append(float(loss))
    ws = jnp.broadcast_to(w_opt, (N, g.num_ws, g.w_dim))
    return ws, history


def run_pti_cli(network: str, data: str = "", dataset_name: str = "synthetic",
                outdir: str = "runs/pti", steps: int = 350,
                max_items: int = 4, lpips_weights: str = "",
                locality: bool = False, seed: int = 0,
                pivot: str = "encoder", project_steps: int = 500,
                align_lm: str = ""):
    """CLI driver — the reference `train_generator/train.py` surface: load a
    checkpoint, take the first `max_items` held-out identities as a
    multi-image coaching batch, tune G with the SR module frozen, save the
    tuned snapshot. Pivots come from the identity encoder (the G-NeRF way)
    or, with --pivot project, from the w-space projector (`project_w` — the
    PTI first-inversion step whose module the reference's coaches import
    but never shipped, `base_coach.py:11`)."""
    import os

    import numpy as np

    from ..models import ResNeXt50Encoder
    from ..utils import checkpoint as ckpt_lib
    from .dataset import SyntheticDataset, TestDataset, collate

    trees, config = ckpt_lib.load_checkpoint(network)
    gen_cfg = (config or {}).get("generator", {})
    g = TriPlaneGenerator(**gen_cfg) if gen_cfg else TriPlaneGenerator()
    params_g = trees.get("G_ema", trees.get("G"))
    if "E" not in trees and pivot == "encoder":
        raise ValueError("PTI with --pivot encoder needs an encoder for the "
                         "pivot latents; the checkpoint has no 'E' tree "
                         "(use --pivot project to optimize the pivot "
                         "directly)")
    enc = ResNeXt50Encoder(out_dim=g.z_dim)
    if "E" in trees:
        params_e, state_e = trees["E"], trees.get("E_state")
        if state_e is None:
            _, state_e = enc.init(jax.random.PRNGKey(0))
    else:
        params_e, state_e = enc.init(jax.random.PRNGKey(0))

    if lpips_weights:
        vgg, params_vgg, _ = L.load_lpips(lpips_weights)
    else:
        vgg = L.VGG16LPIPS()
        params_vgg = trees.get("VGG") or vgg.init(jax.random.PRNGKey(1))
        if "VGG" not in trees:
            print("WARNING: no pretrained LPIPS weights — PTI will optimize "
                  "a random-VGG perceptual objective (pass --lpips-weights)")

    # Actual output resolution (reduced configs legitimately undershoot
    # g.img_resolution; see training/eval.py).
    ws_s = jax.ShapeDtypeStruct((1, g.num_ws, g.w_dim), jnp.float32)
    c_s = jax.ShapeDtypeStruct((1, 25), jnp.float32)
    out_res = int(jax.eval_shape(
        lambda p, w, c: g.synthesis(p, w, c, noise_mode="none"),
        params_g, ws_s, c_s)["image"].shape[-1])

    if align_lm:
        # Raw (un-cropped) photos + landmark files -> FFHQ-aligned crops,
        # the preprocessing the reference does with dlib
        # (utils/alignment.py:29-114); landmarks come from files here.
        from ..utils.alignment import align_folder

        if dataset_name == "synthetic" or not data:
            raise ValueError("--align_lm needs --data (a raw-photo folder)")
        aligned_dir = os.path.join(outdir, "aligned")
        written = align_folder(data, align_lm, aligned_dir,
                               output_size=max(out_res, 512))
        if not written:
            raise ValueError(f"no (image, landmark) pairs matched between "
                             f"{data} and {align_lm}")
        print(f"aligned {len(written)} image(s) -> {aligned_dir}")
        data = aligned_dir

    if dataset_name == "synthetic":
        ds = SyntheticDataset(resolution=out_res, size=max_items)
    else:
        ds = TestDataset(real_path=data, max_size=max_items,
                         resolution=out_res)
    items = [ds[i] for i in range(min(max_items, len(ds)))]
    bd = collate(items)
    imgs = jnp.asarray(bd["condition_image"], jnp.float32) / 127.5 - 1.0
    loss_image = jnp.asarray(bd["loss_image"], jnp.float32) / 127.5 - 1.0
    loss_c = jnp.asarray(bd["loss_c"], jnp.float32)

    if pivot == "project":
        start = None
        if "E" in trees:
            z0, _ = enc.apply(params_e, state_e, imgs, train=False)
            start = g.mapping(params_g, z0, loss_c)
        ws, proj_hist = project_w(
            g, params_g, vgg, params_vgg, loss_image, loss_c,
            num_steps=project_steps, start_ws=start,
            rng=jax.random.PRNGKey(seed + 1),
        )
        print(f"project_w: loss {proj_hist[0]:.4f} -> {proj_hist[-1]:.4f} "
              f"over {project_steps} steps")
    else:
        z, _ = enc.apply(params_e, state_e, imgs, train=False)
        ws = g.mapping(params_g, z, loss_c)

    cfg = PTIConfig(
        neural_rendering_resolution=g.neural_rendering_resolution,
        use_locality_reg=locality,
    )
    tuned, history = run_pti(g, params_g, vgg, params_vgg, ws, loss_image,
                             loss_c, num_steps=steps, cfg=cfg,
                             rng=jax.random.PRNGKey(seed))
    os.makedirs(outdir, exist_ok=True)
    out_path = os.path.join(outdir, "network-pti.npz")
    ckpt_lib.save_checkpoint(
        out_path,
        {"G_ema": tuned, "E": params_e, "E_state": state_e},
        config=dict(config or {}, pti={"steps": steps,
                                       "num_items": len(items),
                                       "locality": locality}),
    )
    print(f"PTI: loss {history[0]:.4f} -> {history[-1]:.4f} over {steps} "
          f"steps on {len(items)} image(s); saved {out_path}")
    return out_path, history


def main():  # pragma: no cover - thin click wrapper over run_pti_cli
    import click

    @click.command()
    @click.option("--network", required=True,
                  help="checkpoint with G_ema + E (npz)")
    @click.option("--data", default="", help="held-out image folder")
    @click.option("--dataset_name", default="synthetic")
    @click.option("--outdir", default="runs/pti")
    @click.option("--steps", type=int, default=350,
                  help="reference hyperparameters.max_pti_steps")
    @click.option("--max_items", type=int, default=4,
                  help="images in the multi-id coaching batch")
    @click.option("--lpips-weights", "lpips_weights", default="")
    @click.option("--locality", type=bool, default=False,
                  help="ball-holder locality regularizer")
    @click.option("--seed", type=int, default=0)
    @click.option("--pivot", type=click.Choice(["encoder", "project"]),
                  default="encoder",
                  help="pivot latents: identity encoder (G-NeRF) or w-space "
                       "projection (PTI first inversion)")
    @click.option("--project_steps", type=int, default=500,
                  help="w-projector steps when --pivot project "
                       "(reference hyperparameters.first_inv_steps)")
    @click.option("--align_lm", default="",
                  help="folder of 68-point landmark files (json/npy/txt, "
                       "same stems as --data images): FFHQ-align raw "
                       "photos before encoding")
    def _cli(**kw):
        run_pti_cli(**kw)

    _cli()


if __name__ == "__main__":  # pragma: no cover
    main()
