"""Full EG3D GAN objective: dual discrimination + R1 + density reg + pose swap.

The reference documents this objective in `training/loss.py` (StyleGAN2Loss)
but most of it is commented out and the class is never constructed by the
live trainer (SURVEY.md section 3.2). Here the whole thing is implemented
and usable: an alternative train step that adversarially trains the
tri-plane generator against a (dual) discriminator — the EG3D pretraining
stage that produces the generator G-NeRF fine-tunes.

Pieces (reference spec locations):
  * pose-swapped generator conditioning  (`loss.py:63-72`)
  * blur-scheduled D input               (`loss.py:74-81,92`)
  * non-saturating G loss + logistic D loss + R1 through BOTH the image and
    the raw image for dual discrimination (`loss.py:148-210`)
  * density total-variation regularization at perturbed points
    (`loss.py:131-146`)
  * reconstruction branch with SR frozen  (`loss.py:124-146`)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.dual_discriminator import DualDiscriminator, filtered_resizing
from ..models.triplane import TriPlaneGenerator
from ..ops.upfirdn2d import filter2d
from ..ops.interpolate import interpolate_bilinear
from . import losses as L


@dataclasses.dataclass(frozen=True)
class EG3DLossConfig:
    r1_gamma: float = 1.0
    blur_init_sigma: float = 0.0
    blur_fade_kimg: float = 0.0
    gpc_reg_prob: Optional[float] = 0.5
    gpc_reg_fade_kimg: float = 1000.0
    density_reg: float = 0.25
    density_reg_p_dist: float = 0.004
    density_reg_points: int = 1000
    neural_rendering_resolution: int = 64
    # Neural-rendering-resolution fade (the upstream-EG3D two-stage recipe;
    # present in the reference as CLI flags `train.py:184-186` and the
    # commented schedule `loss.py:95-97`): render at `initial`, blending
    # linearly to `final` over `fade_kimg`. On TPU the render resolution is
    # a STATIC shape, so the continuous schedule is quantized to multiples
    # of `res_bucket` — each bucket is one compiled program (same recompile
    # granularity as the blur-kernel buckets).
    neural_rendering_resolution_final: Optional[int] = None
    neural_rendering_resolution_fade_kimg: float = 1000.0
    res_bucket: int = 8
    # Style-mixing regularization (upstream StyleGAN2/EG3D `run_G`; the
    # reference stores the knob, `loss.py:37`, but its consumer is part of
    # the commented-out objective): with this probability, ws indices past
    # a uniform random cutoff are replaced by the mapping of a fresh z.
    style_mixing_prob: float = 0.0
    # R1-gamma warm-up fade (reference knobs `loss.py:45-46`, consumer
    # commented): gamma blends r1_gamma_init -> r1_gamma over fade_kimg.
    r1_gamma_init: float = 0.0
    r1_gamma_fade_kimg: float = 0.0
    dual_discrimination: bool = True
    filter_mode: Any = "antialiased"
    glr: float = 0.0025
    dlr: float = 0.002
    # ADA (StyleGAN2-ADA "Training GANs with Limited Data"): 'noaug' matches
    # the reference's dormant default (`train.py:154`); 'ada' enables the
    # bgc pipeline with the r_t-feedback p controller (host-side, like the
    # blur schedule); 'fixed' uses a constant p = aug_p.
    aug: str = "noaug"
    aug_p: float = 0.0
    ada_target: float = 0.6
    ada_interval: int = 4
    ada_kimg: float = 500.0
    # Freeze-D transfer learning (reference `--freezed`, train.py:158 ->
    # networks_stylegan2.py:576-597): freeze the first N conv layers of D
    # counted in forward order from the highest-resolution block.
    freeze_d_layers: int = 0
    # Lazy regularization (reference `training_loop.py:123-124`,
    # `train.py:205,363`): density reg runs as its own G phase every
    # g_reg_interval batches (reference --density_reg_every, default 4) and
    # R1 as its own D phase every d_reg_interval batches (default 16), each
    # with gain = interval and Adam lr/betas scaled by
    # interval/(interval+1) (upstream StyleGAN2 lazy-reg calibration).
    # Consumed by make_eg3d_phase_steps — make_eg3d_train_step remains the
    # fused Gboth/Dboth form (reg terms every step, no scaling).
    g_reg_interval: int = 4
    d_reg_interval: int = 16
    # Compute dtype for the generator synthesis and discriminator conv
    # stacks (the reference trains its D + SR blocks in fp16 with clamp,
    # train.py:400-403). Compositing, losses, R1 accumulation and both
    # optimizers stay fp32 regardless.
    dtype: Any = jnp.float32
    # Single-gather (cell-packed) warp sampling in the ADA pipe: the warp
    # dominates the +1.5 s/step ADA overhead (3 run_D warps, ~18M gather
    # rows; BASELINE.md r4 EG3D table) — cell packing cuts gather/scatter
    # rows 4x for ~4.2x warp-operand HBM (grid_sample_2d cell_pack).
    aug_cell_pack: bool = True
    # Rematerialize the G synthesis under value_and_grad: at flagship scale
    # (512^2, batch 4) the un-remat'd fp32 G branch needs 16.15 GB of HLO
    # temps vs the v5e's 15.75 GB HBM (measured r4, profile_eg3d OOM dump —
    # same failure mode TrainConfig.remat_synthesis fixed for the G-NeRF
    # objective). Disable only for tiny-model debugging.
    remat_synthesis: bool = True


# The 'bgc' augmentation preset (blit + geometric + color) — the standard
# StyleGAN2-ADA recipe EG3D-class face GANs train with.
BGC_SPEC = dict(xflip=1.0, rotate90=1.0, xint=1.0, scale=1.0, rotate=1.0,
                aniso=1.0, xfrac=1.0, brightness=1.0, contrast=1.0,
                lumaflip=1.0, hue=1.0, saturation=1.0)


def make_augment_pipe(cfg: EG3DLossConfig):
    """AugmentPipe for the configured mode, or None for 'noaug'.

    pad_fraction 0.55: the static warp margin covers a ~2.9-sigma
    scale*rotation excursion envelope (vs ~3.05 sigma at the 0.6 default —
    the reference pads dynamically, so ANY static margin is a tail
    cutoff; beyond it the rare extreme transform samples zeros at the
    corners). The trim keeps the flagship 512^2 EG3D ADA step inside the
    v5e's 15.75 GB HBM: the warp's grad tensors scale with
    (1 + 2*pad_fraction)^2 and lane-pad 21x (see BASELINE.md r4)."""
    if cfg.aug == "noaug":
        return None
    from .augment import AugmentPipe

    return AugmentPipe(**BGC_SPEC, pad_fraction=0.55,
                       warp_cell_pack=cfg.aug_cell_pack)


def ada_update_p(p: float, rt: float, batch_size: int,
                 cfg: EG3DLossConfig) -> float:
    """One r_t-feedback controller step (upstream ADA heuristic): nudge p
    toward keeping E[sign(D(real))] at ada_target, with a full 0->1 sweep
    taking ada_kimg kimg. Host-side pure python — called every ada_interval
    batches with the interval's mean of the 'Loss/signs/real' stat."""
    adjust = np.sign(rt - cfg.ada_target) * (
        batch_size * cfg.ada_interval / (cfg.ada_kimg * 1000.0))
    return float(np.clip(p + adjust, 0.0, 1.0))


def blur_sigma_schedule(cur_nimg: float, cfg: EG3DLossConfig) -> float:
    """Host-side (python float) blur fade — reference `loss.py:89`. Computed
    OUTSIDE jit because the kernel extent it implies must be static; the
    sigma value itself is then passed into the step as a traced scalar."""
    if cfg.blur_fade_kimg <= 0 or cfg.blur_init_sigma <= 0:
        return 0.0
    return max(1 - cur_nimg / (cfg.blur_fade_kimg * 1e3), 0.0) * cfg.blur_init_sigma


def blur_kernel_size(blur_sigma: float) -> int:
    """Static FIR half-extent for a given sigma (reference `loss.py:75`).
    The train driver re-jits per distinct size (a bounded, ~3*sigma_init
    set of buckets — the same recompile granularity EG3D's dynamic kernel
    effectively has)."""
    return int(np.floor(float(blur_sigma) * 3))


def neural_resolution_schedule(cur_nimg: float, cfg: EG3DLossConfig) -> int:
    """Host-side (python int) render-resolution fade — the reference's
    commented schedule `loss.py:95-97`: linear blend initial -> final over
    fade_kimg, rounded to the nearest int. Quantized to `res_bucket`
    multiples so jit sees a small bounded set of static shapes; the
    endpoints are always exact."""
    initial = cfg.neural_rendering_resolution
    final = cfg.neural_rendering_resolution_final
    if final is None or final == initial:
        return initial
    fade = max(cfg.neural_rendering_resolution_fade_kimg, 1e-8) * 1e3
    alpha = min(float(cur_nimg) / fade, 1.0)
    if alpha >= 1.0:
        return int(final)  # exact even when final is not a bucket multiple
    res = int(np.rint(initial * (1 - alpha) + final * alpha))
    b = max(int(cfg.res_bucket), 1)
    res = int(np.rint(res / b)) * b
    lo, hi = min(initial, final), max(initial, final)
    return int(np.clip(res, lo, hi))


def r1_gamma_schedule(cur_nimg, cfg: EG3DLossConfig):
    """R1 gamma warm-up: r1_gamma_init -> r1_gamma over r1_gamma_fade_kimg
    (reference knobs `loss.py:45-46`; consumer commented there). Traced —
    `cur_nimg` may be the on-device step counter; no recompiles."""
    if cfg.r1_gamma_fade_kimg <= 0:
        return cfg.r1_gamma
    alpha = jnp.minimum(cur_nimg / (cfg.r1_gamma_fade_kimg * 1e3), 1.0)
    return cfg.r1_gamma_init * (1 - alpha) + cfg.r1_gamma * alpha


def apply_style_mixing(mapping_apply, params_mapping, ws: jax.Array,
                       z_dim: int, c_cond: jax.Array, rng: jax.Array,
                       prob: float) -> jax.Array:
    """Style-mixing regularization (upstream StyleGAN2 semantics): with
    probability `prob`, replace ws[:, cutoff:] with the mapping of a fresh
    z at a cutoff drawn uniformly from [1, num_ws). One cutoff per batch
    (matching torch's single scalar draw); jit-safe — the cutoff is a
    traced scalar turned into a per-index mask. Index 0 is never mixed, so
    w_avg statistics taken from ws[:, 0] are unaffected."""
    if prob <= 0:
        return ws
    k_cut, k_apply, k_z = jax.random.split(rng, 3)
    num_ws = ws.shape[1]
    cutoff = jax.random.randint(k_cut, (), 1, num_ws)
    cutoff = jnp.where(jax.random.uniform(k_apply) < prob, cutoff, num_ws)
    z2 = jax.random.normal(k_z, (ws.shape[0], z_dim), ws.dtype)
    ws2 = mapping_apply(params_mapping, z2, c_cond)
    keep = jnp.arange(num_ws)[None, :, None] < cutoff
    return jnp.where(keep, ws, ws2)


def swapping_prob_schedule(cur_nimg, cfg: EG3DLossConfig):
    if cfg.gpc_reg_prob is None:
        return None
    alpha = jnp.minimum(cur_nimg / max(cfg.gpc_reg_fade_kimg * 1e3, 1e-8), 1.0)
    return (1 - alpha) * 1.0 + alpha * cfg.gpc_reg_prob


def swapped_conditioning(rng, c: jax.Array, swapping_prob) -> jax.Array:
    """Generator pose conditioning with probability-`swapping_prob` roll
    (reference `loss.py:63-68`); None -> zeros."""
    if swapping_prob is None:
        return jnp.zeros_like(c)
    c_swapped = jnp.roll(c, 1, axis=0)
    pick = jax.random.uniform(rng, (c.shape[0], 1)) < swapping_prob
    return jnp.where(pick, c_swapped, c)


def blur_image(img: jax.Array, blur_sigma, blur_size: int) -> jax.Array:
    """Gaussian-ish (2^-x^2) blur with the reference's kernel
    (`loss.py:75-78`). `blur_size` is a STATIC python int (fixes the FIR
    extent for jit); `blur_sigma` may be a traced scalar so the fade varies
    step-to-step without recompiling."""
    if blur_size <= 0:
        return img
    x = jnp.arange(-blur_size, blur_size + 1) / blur_sigma
    f = jnp.exp2(-jnp.square(x))
    return filter2d(img, f / jnp.sum(f))


def density_regularization(
    g: TriPlaneGenerator, params_g, ws: jax.Array, rng: jax.Array,
    cfg: EG3DLossConfig,
) -> jax.Array:
    """L1 TV loss between sigma at random points and nearby perturbed points
    (reference `loss.py:131-146`)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    n = cfg.density_reg_points
    initial = jax.random.uniform(k1, (ws.shape[0], n, 3)) * 2 - 1
    perturbed = initial + jax.random.normal(k2, initial.shape) * cfg.density_reg_p_dist
    all_coords = jnp.concatenate([initial, perturbed], axis=1)
    dirs = jax.random.normal(k3, all_coords.shape)
    sigma = g.sample_mixed(params_g, all_coords, dirs, ws,
                           dtype=cfg.dtype)["sigma"]
    sigma_initial = sigma[:, :n].astype(jnp.float32)
    sigma_perturbed = sigma[:, n:].astype(jnp.float32)
    return jnp.abs(sigma_initial - sigma_perturbed).mean() * cfg.density_reg


def freeze_d_trainable_mask(disc, params_d, freeze_layers: int):
    """Boolean trainable-mask implementing the reference's Freeze-D
    (`networks_stylegan2.py:576-597`, CLI `--freezed`): conv layers are
    counted in FORWARD order — per resolution block (highest first):
    fromrgb (where present), conv0, conv1, skip — and the first
    `freeze_layers` are frozen. The epilogue/mapping are never frozen
    (they sit past any realistic freeze depth in the reference too)."""
    trunk = getattr(disc, "_d", disc)
    mask = jax.tree_util.tree_map(lambda _: True, params_d)
    idx = 0
    for res in trunk.block_resolutions:
        block = params_d.get(f"b{res}", {})
        for name in ("fromrgb", "conv0", "conv1", "skip"):
            if name in block:
                trainable = idx >= freeze_layers
                mask[f"b{res}"][name] = jax.tree_util.tree_map(
                    lambda _: trainable, mask[f"b{res}"][name])
                idx += 1
    return mask


def _make_adam(lr: float, disc, cfg: EG3DLossConfig, for_d: bool,
               reg_interval: int = 0):
    """Adam with the reference hyperparameters; when `reg_interval` > 1
    (lazy regularization), lr and betas are scaled by
    mb_ratio = interval / (interval + 1) — the upstream StyleGAN2
    calibration that keeps the effective update magnitude of main+reg
    phases equal to the fused form (`training_loop.py` lazy-reg setup)."""
    b1, b2 = 0.0, 0.99
    if reg_interval and reg_interval > 1:
        mb = reg_interval / (reg_interval + 1)
        lr = lr * mb
        b1, b2 = b1 ** mb, b2 ** mb
    adam = optax.adam(lr, b1=b1, b2=b2, eps=1e-8)
    if for_d and cfg.freeze_d_layers > 0:
        # Labels computed from the param STRUCTURE at optimizer init
        # (optax accepts callable param_labels) — no params needed here.
        def _labels(params_d):
            mask = freeze_d_trainable_mask(disc, params_d,
                                           cfg.freeze_d_layers)
            return jax.tree_util.tree_map(
                lambda t: "train" if t else "freeze", mask)

        return optax.multi_transform(
            {"train": adam, "freeze": optax.set_to_zero()},
            param_labels=_labels,
        )
    return adam


def _make_runners(g: TriPlaneGenerator, disc: DualDiscriminator,
                  cfg: EG3DLossConfig,
                  rendering_overrides: Optional[dict] = None):
    """The shared G/D forward runners both step factories compose from."""
    pipe = make_augment_pipe(cfg)

    def run_g(params_g, z, c, rng, cur_nimg, res):
        k_swap, k_mix, k_noise = jax.random.split(rng, 3)
        # gpc_reg fade rides the live step count (traced scalar): 1.0 ->
        # gpc_reg_prob over gpc_reg_fade_kimg, reference `loss.py:96-97`.
        swapping_prob = swapping_prob_schedule(cur_nimg, cfg)
        c_cond = swapped_conditioning(k_swap, c, swapping_prob)
        mapping_apply = g.backbone.mapping.apply
        params_mapping = params_g["backbone"]["mapping"]
        ws = mapping_apply(params_mapping, z, c_cond)
        ws = apply_style_mixing(mapping_apply, params_mapping, ws, g.z_dim,
                                c_cond, k_mix, cfg.style_mixing_prob)
        def synth(params_g_, ws_, c_, key_):
            return g.synthesis(params_g_, ws_, c_,
                               neural_rendering_resolution=res,
                               noise_mode="random", rng=key_, dtype=cfg.dtype,
                               rendering_kwargs=rendering_overrides)

        if cfg.remat_synthesis:
            synth = jax.checkpoint(synth)
        out = synth(params_g, ws, c, k_noise)
        # D / the losses consume fp32 regardless of the synthesis dtype.
        out = {k: v.astype(jnp.float32) for k, v in out.items()}
        return out, ws

    def run_d(params_d, img, c, rng, aug_p, res, blur_sigma=0.0,
              blur_size: int = 0):
        img = dict(img)
        if blur_size > 0:
            img["image"] = blur_image(img["image"], blur_sigma, blur_size)
        if pipe is not None:
            # Dual-pair augmentation (upstream EG3D run_D): upsample the raw
            # image to full res, augment BOTH with the SAME per-sample
            # transform as one 6-channel batch, then downsample the raw half
            # back — so the discriminator never sees a consistency-breaking
            # mismatch between the two views. aug_p is a traced scalar: the
            # controller varies it without recompiling. The pipe is
            # rematerialized: its 6-channel full-res geometric/wavelet chain
            # is differentiated TWICE (R1 runs through the augmentation,
            # like upstream ADA), and keeping those temps live OOMed the
            # flagship step at 20.3 GB vs 15.75 HBM (r4 profile_eg3d).
            full = img["image"].shape[-1]
            raw_up = interpolate_bilinear(img["image_raw"], full, full,
                                          antialias=True)
            # The pipe runs in the training dtype: its geometric warp
            # materializes a [N, (2*pad+res)^2*4, 6] gather tensor whose
            # 6-channel rows lane-pad 21x on TPU (f32[4,2280,2280,6] ->
            # 9.9 GB padded, the r4 ADA OOM dump's top temp) — bf16 halves
            # every warp temp; augmentation math at bf16 is ample.
            pair = jnp.concatenate([img["image"], raw_up], axis=1)
            pair = pipe(rng, pair.astype(cfg.dtype), p=aug_p)
            img["image"] = pair[:, :3]
            img["image_raw"] = interpolate_bilinear(pair[:, 3:], res, res,
                                                    antialias=True)
        return disc.apply(params_d, img, c, dtype=cfg.dtype)

    return run_g, run_d


def make_eg3d_train_step(
    g: TriPlaneGenerator,
    disc: DualDiscriminator,
    cfg: EG3DLossConfig,
    opt_g=None,
    opt_d=None,
    rendering_overrides: Optional[dict] = None,
) -> tuple[Callable, Any, Any]:
    """Adversarial (z, c) -> image GAN training step (EG3D pretraining) —
    the FUSED form (upstream 'Gboth'/'Dboth' phases, reg_interval=None):
    density reg and R1 run in every step. At flagship scale prefer
    `make_eg3d_phase_steps` (lazy regularization — the reference default,
    `training_loop.py:123-124` — whose small Dreg program keeps R1's
    double-backward out of the main step's memory peak).

    Returns (train_step, opt_g, opt_d). State is a dict with params_g,
    params_g_ema, params_d, opt_state_g, opt_state_d, cur_nimg.

    `rendering_overrides`: per-process render options kept out of any
    serialized config — e.g. {'ray_sharding': NamedSharding(...)} to shard
    the in-step render over a 2-D (data, rays) mesh (same contract as
    train_loop.make_train_step).
    """
    if opt_g is None:
        opt_g = _make_adam(cfg.glr, disc, cfg, for_d=False)
    if opt_d is None:
        opt_d = _make_adam(cfg.dlr, disc, cfg, for_d=True)
    run_g, run_d = _make_runners(g, disc, cfg, rendering_overrides)

    def g_loss_fn(params_g, params_d, z, c, rng, cur_nimg, blur_sigma, blur_size,
                  aug_p, res):
        k_g, k_reg, k_aug = jax.random.split(rng, 3)
        gen_img, ws = run_g(params_g, z, c, k_g, cur_nimg, res)
        gen_logits = run_d(params_d, gen_img, c, k_aug, aug_p, res,
                           blur_sigma, blur_size)
        loss_gmain = jax.nn.softplus(-gen_logits).mean()
        loss = loss_gmain
        stats = {"Loss/G/gan_loss": loss_gmain,
                 "Loss/scores/fake": gen_logits.mean()}
        if cfg.density_reg > 0:
            tv = density_regularization(g, params_g, ws, k_reg, cfg)
            loss = loss + tv
            stats["Loss/G/density_reg"] = tv
        return loss, (stats, jax.lax.stop_gradient(ws[:, 0]))

    def d_loss_fn(params_d, params_g, z, c, real_img_full, real_c, rng, cur_nimg,
                  blur_sigma, blur_size, aug_p, res):
        k_gen, k_aug_f, k_aug_r, k_aug_r1 = jax.random.split(rng, 4)
        gen_img, _ = run_g(jax.lax.stop_gradient(params_g), z, c, k_gen,
                           cur_nimg, res)
        gen_img = jax.tree_util.tree_map(jax.lax.stop_gradient, dict(gen_img))
        gen_logits = run_d(params_d, gen_img, c, k_aug_f, aug_p, res,
                           blur_sigma, blur_size)
        loss_dgen = jax.nn.softplus(gen_logits).mean()

        real_raw = interpolate_bilinear(real_img_full, res, res, antialias=True)
        real = {"image": real_img_full, "image_raw": real_raw}
        real_logits = run_d(params_d, real, real_c, k_aug_r, aug_p, res,
                            blur_sigma, blur_size)
        loss_dreal = jax.nn.softplus(-real_logits).mean()

        # R1 through BOTH inputs for dual discrimination (`loss.py:195-200`);
        # the gradient is taken w.r.t. the PRE-blur/PRE-augment input,
        # flowing through both, matching the reference's run_D-internal blur
        # (and upstream ADA, where R1 differentiates through the pipe). A
        # fresh augment key mirrors torch's independent draw per run_D call.
        def d_sum(image, image_raw):
            return run_d(params_d, {"image": image, "image_raw": image_raw},
                         real_c, k_aug_r1, aug_p, res, blur_sigma,
                         blur_size).sum()

        g_img, g_raw = jax.grad(d_sum, argnums=(0, 1))(real["image"], real["image_raw"])
        r1 = (jnp.sum(jnp.square(g_img), axis=(1, 2, 3))
              + jnp.sum(jnp.square(g_raw), axis=(1, 2, 3)))
        loss_dr1 = (r1 * (r1_gamma_schedule(cur_nimg, cfg) / 2)).mean()

        stats = {
            "Loss/D/loss": loss_dgen + loss_dreal,
            "Loss/D/reg": loss_dr1,
            "Loss/scores/real": real_logits.mean(),
            # The ADA controller's feedback signal r_t = E[sign(D(real))].
            "Loss/signs/real": jnp.sign(real_logits).mean(),
        }
        return loss_dgen + loss_dreal + loss_dr1, stats

    def train_step(state: dict, batch: Mapping[str, jax.Array], rng: jax.Array,
                   blur_sigma=0.0, aug_p=0.0, *, blur_size: int = 0,
                   res: Optional[int] = None):
        """batch: {'z': [N,z], 'c': [N,25], 'real_image': [N,3,R,R],
        'real_c': [N,25]}. `blur_sigma` is the traced fade value from
        `blur_sigma_schedule`; `blur_size` the matching STATIC kernel extent
        from `blur_kernel_size` (jit with static_argnames=('blur_size',));
        `aug_p` the traced ADA strength from the host-side controller
        (`ada_update_p`) — ignored under aug='noaug'; `res` the STATIC
        neural render resolution from `neural_resolution_schedule` (None ->
        the config's initial resolution) — one compiled program per
        (blur_size, res) bucket."""
        if res is None:
            res = cfg.neural_rendering_resolution
        k_g, k_d = jax.random.split(rng)
        (g_l, (g_stats, w_batch)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(
            state["params_g"], state["params_d"], batch["z"], batch["c"], k_g,
            state["cur_nimg"], blur_sigma, blur_size, aug_p, res,
        )
        g_upd, opt_state_g = opt_g.update(g_grads, state["opt_state_g"],
                                          state["params_g"])
        params_g = optax.apply_updates(state["params_g"], g_upd)
        # w_avg EMA (the reference's mapping update_emas): tracked for
        # truncation at inference.
        w_avg = params_g["backbone"]["mapping"].get("w_avg")
        if w_avg is not None:
            beta = 0.998
            batch_mean = w_batch.mean(axis=0)
            params_g["backbone"]["mapping"]["w_avg"] = (
                batch_mean + (w_avg - batch_mean) * beta
            )

        (d_l, d_stats), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state["params_d"], params_g, batch["z"], batch["c"],
            batch["real_image"], batch["real_c"], k_d, state["cur_nimg"],
            blur_sigma, blur_size, aug_p, res,
        )
        d_upd, opt_state_d = opt_d.update(d_grads, state["opt_state_d"],
                                          state["params_d"])
        params_d = optax.apply_updates(state["params_d"], d_upd)

        ema_beta = 0.5 ** (batch["z"].shape[0] / (10 * 1000.0))
        from ..utils.misc import ema_update

        params_g_ema = ema_update(state["params_g_ema"], params_g, ema_beta)

        stats = {**g_stats, **d_stats, "Loss/G/total": g_l, "Loss/D/total": d_l}
        new_state = dict(
            state,
            params_g=params_g,
            params_g_ema=params_g_ema,
            params_d=params_d,
            opt_state_g=opt_state_g,
            opt_state_d=opt_state_d,
            cur_nimg=state["cur_nimg"] + batch["z"].shape[0],
        )
        return new_state, stats

    return train_step, opt_g, opt_d


def make_eg3d_phase_steps(
    g: TriPlaneGenerator,
    disc: DualDiscriminator,
    cfg: EG3DLossConfig,
    rendering_overrides: Optional[dict] = None,
) -> tuple[Callable, Optional[Callable], Optional[Callable], Any, Any]:
    """Lazy-regularization phase steps — the reference's actual training
    schedule (`training_loop.py:123-124`, `train.py:205,363`): every batch
    runs Gmain+Dmain; density reg runs as its own Greg phase every
    `cfg.g_reg_interval` batches and R1 as its own Dreg phase every
    `cfg.d_reg_interval`, each with loss gain = interval and Adam lr/betas
    scaled by interval/(interval+1) (upstream lazy-reg calibration). Beyond
    parity, this is the memory design that fits the flagship ADA step on
    one v5e: R1's double-backward through D and the augment pipe lives in a
    small D-only program instead of inflating every step's peak (the fused
    form needs 16.0+ GB vs 15.75 HBM at 512^2/batch-4/bf16 — r4
    profile_eg3d).

    Returns (main_step, greg_step, dreg_step, opt_g, opt_d); greg_step /
    dreg_step are None when the corresponding term is disabled. All three
    share the same state dict (and optimizer states) as
    make_eg3d_train_step; only main_step advances cur_nimg / EMAs.

    Call signatures:
      main_step(state, batch, rng, blur_sigma, aug_p, *, blur_size, res)
      greg_step(state, batch, rng, *, res)   # res unused; kept for symmetry
      dreg_step(state, batch, rng, blur_sigma, aug_p, *, blur_size, res)
    """
    opt_g = _make_adam(cfg.glr, disc, cfg, for_d=False,
                       reg_interval=cfg.g_reg_interval if cfg.density_reg > 0
                       else 0)
    opt_d = _make_adam(cfg.dlr, disc, cfg, for_d=True,
                       reg_interval=cfg.d_reg_interval if cfg.r1_gamma > 0
                       else 0)
    run_g, run_d = _make_runners(g, disc, cfg, rendering_overrides)

    def g_main_loss(params_g, params_d, z, c, rng, cur_nimg, blur_sigma,
                    blur_size, aug_p, res):
        k_g, k_aug = jax.random.split(rng)
        gen_img, ws = run_g(params_g, z, c, k_g, cur_nimg, res)
        gen_logits = run_d(params_d, gen_img, c, k_aug, aug_p, res,
                           blur_sigma, blur_size)
        loss_gmain = jax.nn.softplus(-gen_logits).mean()
        stats = {"Loss/G/gan_loss": loss_gmain,
                 "Loss/scores/fake": gen_logits.mean()}
        return loss_gmain, (stats, jax.lax.stop_gradient(ws[:, 0]))

    def d_main_loss(params_d, params_g, z, c, real_img_full, real_c, rng,
                    cur_nimg, blur_sigma, blur_size, aug_p, res):
        k_gen, k_aug_f, k_aug_r = jax.random.split(rng, 3)
        gen_img, _ = run_g(jax.lax.stop_gradient(params_g), z, c, k_gen,
                           cur_nimg, res)
        gen_img = jax.tree_util.tree_map(jax.lax.stop_gradient, dict(gen_img))
        gen_logits = run_d(params_d, gen_img, c, k_aug_f, aug_p, res,
                           blur_sigma, blur_size)
        loss_dgen = jax.nn.softplus(gen_logits).mean()
        real_raw = interpolate_bilinear(real_img_full, res, res,
                                        antialias=True)
        real = {"image": real_img_full, "image_raw": real_raw}
        real_logits = run_d(params_d, real, real_c, k_aug_r, aug_p, res,
                            blur_sigma, blur_size)
        loss_dreal = jax.nn.softplus(-real_logits).mean()
        stats = {
            "Loss/D/loss": loss_dgen + loss_dreal,
            "Loss/scores/real": real_logits.mean(),
            "Loss/signs/real": jnp.sign(real_logits).mean(),
        }
        return loss_dgen + loss_dreal, stats

    def main_step(state: dict, batch: Mapping[str, jax.Array],
                  rng: jax.Array, blur_sigma=0.0, aug_p=0.0, *,
                  blur_size: int = 0, res: Optional[int] = None):
        if res is None:
            res = cfg.neural_rendering_resolution
        k_g, k_d = jax.random.split(rng)
        (g_l, (g_stats, w_batch)), g_grads = jax.value_and_grad(
            g_main_loss, has_aux=True
        )(state["params_g"], state["params_d"], batch["z"], batch["c"], k_g,
          state["cur_nimg"], blur_sigma, blur_size, aug_p, res)
        g_upd, opt_state_g = opt_g.update(g_grads, state["opt_state_g"],
                                          state["params_g"])
        params_g = optax.apply_updates(state["params_g"], g_upd)
        w_avg = params_g["backbone"]["mapping"].get("w_avg")
        if w_avg is not None:
            beta = 0.998
            batch_mean = w_batch.mean(axis=0)
            params_g["backbone"]["mapping"]["w_avg"] = (
                batch_mean + (w_avg - batch_mean) * beta
            )

        (d_l, d_stats), d_grads = jax.value_and_grad(
            d_main_loss, has_aux=True
        )(state["params_d"], params_g, batch["z"], batch["c"],
          batch["real_image"], batch["real_c"], k_d, state["cur_nimg"],
          blur_sigma, blur_size, aug_p, res)
        d_upd, opt_state_d = opt_d.update(d_grads, state["opt_state_d"],
                                          state["params_d"])
        params_d = optax.apply_updates(state["params_d"], d_upd)

        from ..utils.misc import ema_update

        ema_beta = 0.5 ** (batch["z"].shape[0] / (10 * 1000.0))
        params_g_ema = ema_update(state["params_g_ema"], params_g, ema_beta)
        stats = {**g_stats, **d_stats,
                 "Loss/G/total": g_l, "Loss/D/total": d_l}
        new_state = dict(
            state, params_g=params_g, params_g_ema=params_g_ema,
            params_d=params_d, opt_state_g=opt_state_g,
            opt_state_d=opt_state_d,
            cur_nimg=state["cur_nimg"] + batch["z"].shape[0],
        )
        return new_state, stats

    greg_step = dreg_step = None
    if cfg.density_reg > 0:
        gain_g = float(max(cfg.g_reg_interval, 1))

        def g_reg_loss(params_g, z, c, rng, cur_nimg):
            # Upstream Greg (`loss.py:112-121`): fresh mapping under the
            # swapped conditioning, NO synthesis — just the density TV at
            # random points, with the lazy gain folded in.
            k_swap, k_reg = jax.random.split(rng)
            swapping_prob = swapping_prob_schedule(cur_nimg, cfg)
            c_cond = swapped_conditioning(k_swap, c, swapping_prob)
            ws = g.backbone.mapping.apply(
                params_g["backbone"]["mapping"], z, c_cond)
            tv = density_regularization(g, params_g, ws, k_reg, cfg)
            return tv * gain_g, tv

        def greg_step(state: dict, batch, rng, *, res: Optional[int] = None):
            del res
            (_, tv), grads = jax.value_and_grad(g_reg_loss, has_aux=True)(
                state["params_g"], batch["z"], batch["c"], rng,
                state["cur_nimg"])
            upd, opt_state_g = opt_g.update(grads, state["opt_state_g"],
                                            state["params_g"])
            params_g = optax.apply_updates(state["params_g"], upd)
            return (dict(state, params_g=params_g, opt_state_g=opt_state_g),
                    {"Loss/G/density_reg": tv})

    if cfg.r1_gamma > 0:
        gain_d = float(max(cfg.d_reg_interval, 1))

        def d_reg_loss(params_d, real_img_full, real_c, rng, cur_nimg,
                       blur_sigma, blur_size, aug_p, res):
            # Upstream Dreg (`loss.py:172-207`): R1 through BOTH dual-
            # discrimination inputs (and through blur + the augment pipe).
            k_aug = rng
            real_raw = interpolate_bilinear(real_img_full, res, res,
                                            antialias=True)

            def d_sum(image, image_raw):
                return run_d(params_d,
                             {"image": image, "image_raw": image_raw},
                             real_c, k_aug, aug_p, res, blur_sigma,
                             blur_size).sum()

            g_img, g_raw = jax.grad(d_sum, argnums=(0, 1))(
                real_img_full, real_raw)
            r1 = (jnp.sum(jnp.square(g_img), axis=(1, 2, 3))
                  + jnp.sum(jnp.square(g_raw), axis=(1, 2, 3)))
            loss = (r1 * (r1_gamma_schedule(cur_nimg, cfg) / 2)).mean()
            return loss * gain_d, loss

        def dreg_step(state: dict, batch, rng, blur_sigma=0.0, aug_p=0.0, *,
                      blur_size: int = 0, res: Optional[int] = None):
            if res is None:
                res = cfg.neural_rendering_resolution
            (_, r1), grads = jax.value_and_grad(d_reg_loss, has_aux=True)(
                state["params_d"], batch["real_image"], batch["real_c"],
                rng, state["cur_nimg"], blur_sigma, blur_size, aug_p, res)
            upd, opt_state_d = opt_d.update(grads, state["opt_state_d"],
                                            state["params_d"])
            params_d = optax.apply_updates(state["params_d"], upd)
            return (dict(state, params_d=params_d, opt_state_d=opt_state_d),
                    {"Loss/D/reg": r1})

    return main_step, greg_step, dreg_step, opt_g, opt_d


def init_eg3d_state(g: TriPlaneGenerator, disc: DualDiscriminator,
                    opt_g, opt_d, rng: jax.Array) -> dict:
    k_g, k_d = jax.random.split(rng)
    params_g = g.init(k_g)
    params_d = disc.init(k_d)
    return dict(
        params_g=params_g,
        params_g_ema=jax.tree_util.tree_map(jnp.copy, params_g),
        params_d=params_d,
        opt_state_g=opt_g.init(params_g),
        opt_state_d=opt_d.init(params_d),
        cur_nimg=jnp.zeros((), jnp.int32),
    )


def make_chained_eg3d_cycle(main_step, greg_step, dreg_step,
                            cfg: EG3DLossConfig, *, blur_size: int = 0,
                            res: Optional[int] = None) -> Callable:
    """K EG3D train steps — main phases, the DUE lazy-reg phases, and the
    ADA r_t-feedback p controller — inside ONE jitted program.

    Why this exists: the per-step loop dispatches up to three programs per
    batch, each returning the donated multi-GB state across the host
    boundary. On hardware that boundary is just dispatch latency; through
    this environment's relay it stages the state at ~10-20 MB/s, i.e.
    ~100 s per return — the reason no hours-scale adversarial run was ever
    feasible (VERDICT r4 #4). One K-step cycle returns state once per K
    steps, same as the G-NeRF objective's `make_chained_step`
    (train_loop.py), while keeping the reference cadences exact:

      * lazy regularization (`training_loop.py:123-124`): Greg/Dreg run at
        positions the CALLER marks due via the (K,) bool arrays — computed
        from the same `sched_idx % interval == 0` rule as the unchained
        loop, so resume alignment is preserved for any K.  Inside the scan
        they are `lax.cond` branches: XLA allocates branch temps
        exclusively (max, not sum), so the R1 double-backward still never
        coexists with the main phase's peak — the property that fits the
        flagship ADA step in one v5e's HBM (see make_eg3d_phase_steps).
      * ADA controller (`augment.py` heuristic; host-side `ada_update_p`
        in the unchained loop): moved INTO the scan carry — every
        `cfg.ada_interval` steps p is nudged by
        sign(mean r_t − ada_target) · B·interval/(ada_kimg·1000), clipped
        to [0,1].  Same cadence, same window means; the caller must keep
        K a multiple of ada_interval so windows never straddle a chain
        boundary.  The final p is returned for host persistence
        (`aug_p_live` in the full-state checkpoint).

    Per-step keys are the caller's (K,)-stacked stream (fold_in(base,
    cur_nimg + i·batch)), split exactly as the unchained loop does (main
    uses the key itself; Greg fold_in(·,1); Dreg fold_in(·,2)), so the
    trained trajectory is chain-length-independent.

    `real_image` may arrive as uint8 [0,255]: normalization to [-1,1]
    happens on device here, quartering the per-chain host→device staging
    bytes (the K×B×3×512² batch is the largest input leaf).

    Call: cycle(state, batches, rngs, greg_due, dreg_due, blur_sigmas,
    aug_p0) -> (new_state, final_aug_p, stacked_stats) where every batch
    leaf / rngs / due / sigma input has a leading K axis and stats are (K,)
    arrays (reg stats are zero at not-due positions — mask with the due
    arrays when aggregating).
    """
    ada = cfg.aug == "ada"

    def cycle(state: dict, batches, rngs, greg_due, dreg_due, blur_sigmas,
              aug_p0):
        def body(carry, xs):
            st, p, rt_sum, rt_n = carry
            b, k, g_due, d_due, sigma = xs
            if b["real_image"].dtype == jnp.uint8:
                b = dict(b, real_image=b["real_image"].astype(jnp.float32)
                         / 127.5 - 1.0)
            st, stats = main_step(st, b, k, sigma, p,
                                  blur_size=blur_size, res=res)
            if greg_step is not None:
                def run_greg(s):
                    return greg_step(s, b, jax.random.fold_in(k, 1), res=res)

                def skip_greg(s):
                    return s, {"Loss/G/density_reg": jnp.zeros(())}

                st, gstats = jax.lax.cond(g_due, run_greg, skip_greg, st)
                stats = {**stats, **gstats}
            if dreg_step is not None:
                def run_dreg(s):
                    return dreg_step(s, b, jax.random.fold_in(k, 2), sigma,
                                     p, blur_size=blur_size, res=res)

                def skip_dreg(s):
                    return s, {"Loss/D/reg": jnp.zeros(())}

                st, dstats = jax.lax.cond(d_due, run_dreg, skip_dreg, st)
                stats = {**stats, **dstats}
            if ada:
                rt_sum = rt_sum + stats["Loss/signs/real"]
                rt_n = rt_n + 1
                do = rt_n >= cfg.ada_interval
                adjust = jnp.sign(rt_sum / jnp.maximum(rt_n, 1)
                                  - cfg.ada_target) * (
                    b["z"].shape[0] * cfg.ada_interval
                    / (cfg.ada_kimg * 1000.0))
                p = jnp.where(do, jnp.clip(p + adjust, 0.0, 1.0), p)
                rt_sum = jnp.where(do, 0.0, rt_sum)
                rt_n = jnp.where(do, 0, rt_n)
            stats = {**stats, "Progress/augment": p}
            return (st, p, rt_sum, rt_n), stats

        carry0 = (state, jnp.float32(aug_p0), jnp.zeros(()),
                  jnp.zeros((), jnp.int32))
        (st, p, _, _), stacked = jax.lax.scan(
            body, carry0, (batches, rngs, greg_due, dreg_due, blur_sigmas))
        return st, p, stacked

    return cycle


def make_dreg_dslice(dreg_step) -> Callable:
    """D-slice wrapper for the lazy Dreg phase: R1 reads/updates ONLY
    {params_d, opt_state_d} (+ cur_nimg for the gamma schedule) — no
    generator state at all — so a Dreg dispatch can take and return just
    the D slice (~quarter of the full train state). Exists for chained
    dispatch through the relay: with the Dreg phase outside the K-step
    cycle (see train.py --chain_dreg_split), returning the full state per
    due Dreg would triple the per-chain staging; the slice keeps it ~25%.

    Call: f(params_d, opt_state_d, cur_nimg, batch, rng, blur_sigma,
    aug_p, *, blur_size, res) -> (params_d, opt_state_d, stats); jit with
    donate_argnums=(0, 1)."""

    def f(params_d, opt_state_d, cur_nimg, batch, rng, blur_sigma=0.0,
          aug_p=0.0, *, blur_size: int = 0, res: Optional[int] = None):
        mini = {"params_d": params_d, "opt_state_d": opt_state_d,
                "cur_nimg": cur_nimg}
        new, stats = dreg_step(mini, batch, rng, blur_sigma, aug_p,
                               blur_size=blur_size, res=res)
        return new["params_d"], new["opt_state_d"], stats

    return f
