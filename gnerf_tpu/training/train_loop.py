"""Joint E (+G) (+depth-D) training system.

TPU-native re-design of the reference trainer
(`/root/reference/g_nerf/training/training_loop.py:101-598`): the whole
update — encoder forward, generator synthesis, reconstruction +
adversarial-depth losses, both Adam updates, and the R1 penalty — is ONE
jitted `train_step` function. Data parallelism is expressed by sharding the
batch over the mesh's 'data' axis and replicating params: XLA inserts the
gradient all-reduces (the reference hand-rolls a flat-buffer all_reduce,
`training_loop.py:388-396` — unnecessary under pjit). Frozen-vs-trained
module selection (train_en / train_gen, reference `:300-310`) is an optax
masked optimizer instead of requires_grad toggles.

Loss recipe (faithful to the live loop, `training_loop.py:325-437`):
  recon = sum over {image, image_raw} of (L1 + (1-SSIM) + LPIPS),
          each per-sample, masked by `factor`, normalized by factor.sum()
  G     = recon + 1.2 * softplus(-D(depth_fake, loss_c)).mean()   [gan_depth]
  D     = softplus(D(depth_fake, loss_c)) + softplus(-D(depth_real, cond_c))
          + (r1_gamma/2) * R1(depth_real)
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.encoder import ResNeXt50Encoder
from ..models.stylegan2 import Discriminator
from ..models.triplane import TriPlaneGenerator
from ..ops.interpolate import interpolate_bilinear
from ..utils import checkpoint as ckpt_lib
from ..utils.misc import ema_update
from ..utils.stats import Collector
from . import losses as L


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    total_kimg: int = 4000
    kimg_per_tick: int = 2
    batch_size: int = 32
    glr: float = 1e-3
    dlr: float = 8e-6
    r1_gamma: float = 1.0
    gan_depth: bool = True
    train_en: bool = True
    train_gen: bool = False
    neural_rendering_resolution: int = 64
    snapshot_ticks: int = 500
    ema_kimg: float = 10.0
    run_dir: str = "training-runs/run0"
    random_seed: int = 0
    dtype: Any = jnp.float32
    # Rematerialization: at flagship scale (512^2, batch 4) the un-remat'd
    # step needs 16.35 GB of HLO temps — past the v5e's 15.75 GB HBM — and
    # XLA's emergency spilling made a ~3 s step take 27 s. Checkpointing
    # the synthesis pipeline and the VGG-LPIPS forward trades ~0.4 s of
    # recompute for the spill. Disable only for tiny-model debugging.
    remat_synthesis: bool = True
    remat_lpips: bool = True


class TrainState(struct.PyTreeNode):
    params_e: Any
    state_e: Any
    params_g: Any
    params_g_ema: Any
    params_d: Any
    params_vgg: Any
    opt_state_g: Any
    opt_state_d: Any
    cur_nimg: jax.Array


def _trainable_mask(g: TriPlaneGenerator, params_e, params_g, cfg: TrainConfig):
    """Boolean masks matching the reference's param_list selection
    (`training_loop.py:300-310`): E if train_en; + G.mapping when z_dim!=512
    and G frozen; + all of G when train_gen."""
    mask_e = jax.tree_util.tree_map(lambda _: bool(cfg.train_en), params_e)
    train_mapping = cfg.train_en and (g.z_dim != 512) and not cfg.train_gen

    def g_mask(path_is_mapping, leaf):
        return True

    if cfg.train_gen:
        mask_g = jax.tree_util.tree_map(lambda _: True, params_g)
    else:
        mask_g = jax.tree_util.tree_map(lambda _: False, params_g)
        if train_mapping:
            mask_g["backbone"]["mapping"] = jax.tree_util.tree_map(
                lambda _: True, params_g["backbone"]["mapping"]
            )
    return {"e": mask_e, "g": mask_g}


def make_optimizers(g: TriPlaneGenerator, params_e, params_g, cfg: TrainConfig):
    mask = _trainable_mask(g, params_e, params_g, cfg)
    # NB: optax.masked passes unmasked updates through UNCHANGED, so frozen
    # params need an explicit set_to_zero branch.
    labels = jax.tree_util.tree_map(
        lambda trainable: "train" if trainable else "freeze", mask
    )
    opt_g = optax.multi_transform(
        {"train": optax.adam(cfg.glr, b1=0.9, b2=0.999, eps=1e-8),
         "freeze": optax.set_to_zero()},
        param_labels=labels,
    )
    opt_d = optax.adam(cfg.dlr, b1=0.0, b2=0.999, eps=1e-8)
    return opt_g, opt_d


def make_train_step(
    g: TriPlaneGenerator,
    enc: ResNeXt50Encoder,
    disc: Optional[Discriminator],
    vgg: L.VGG16LPIPS,
    opt_g,
    opt_d,
    cfg: TrainConfig,
    rendering_overrides: Optional[dict] = None,
) -> Callable:
    """Build the pure train-step function (jit/pjit it at the call site).

    `rendering_overrides` holds per-process render options that must never
    enter the serialized config — e.g. `{'ray_sharding': NamedSharding(...)}`
    to shard every per-ray intermediate of the in-step render over a 2-D
    (data, rays) mesh (DP x SP; the reference's only strategy is DP,
    `training_loop.py:388-437`)."""
    res = cfg.neural_rendering_resolution

    # The VGG feature chain runs in the training dtype (bf16 under --dtype
    # bf16, like the backbone/SR; the reference's vgg16 runs fp16 on GPU).
    # Before r3 the fp32 loss images fed it unconverted, so the LPIPS
    # fwd+bwd silently ran fp32 convs at HIGHEST precision (~9% of the
    # flagship step). Distances still accumulate fp32 (losses.py).
    def _vgg_embed(pv, x):
        return L.lpips_embed(vgg, pv, x)

    _vgg_embed_remat = jax.checkpoint(_vgg_embed) if cfg.remat_lpips \
        else _vgg_embed

    def _to_vgg_res(x):
        # The resize vgg.apply would do internally, hoisted out so the raw
        # and full tiers can share one conv batch (resize and the affine
        # 0..255 conversion commute exactly — bilinear weights sum to 1).
        x = x.astype(cfg.dtype)
        if x.shape[-1] != vgg.resize_to:
            x = interpolate_bilinear(x, vgg.resize_to, vgg.resize_to,
                                     antialias=vgg.antialias)
        return x

    def lpips_pair_terms(params_vgg, real_raw, fake_raw, real_full,
                         fake_full):
        """LPIPS of both recon tiers with the VGG work split by grad need:
        the 2N TARGET images (constants) run ONE fwd-only pass — kept out
        of the remat wrapper (no backward -> nothing to recompute) and
        stop_gradient'd so no conv_transpose ever runs for them — while
        the 2N FAKE images run the differentiated (and remat'd) pass.
        Batching the tiers keeps the early small-channel conv matmuls full
        on the MXU; splitting target from fake avoids paying conv
        backward + remat re-forward on the constant half, which a single
        concatenated [real; fake] batch cannot DCE (r5; the measured A/B
        is the BASELINE.md LPIPS row)."""
        tgt = jnp.concatenate([_to_vgg_res(real_raw), _to_vgg_res(real_full)],
                              axis=0)
        fak = jnp.concatenate([_to_vgg_res(fake_raw), _to_vgg_res(fake_full)],
                              axis=0)
        emb_t = jax.lax.stop_gradient(_vgg_embed(params_vgg, tgt))
        emb_f = _vgg_embed_remat(params_vgg, fak)
        # fp32 accumulation over the ~1.2M embedding dims (losses.py).
        d = jnp.sum(jnp.square((emb_t - emb_f).astype(jnp.float32)), axis=1)
        return jnp.split(d, 2, axis=0)

    def recon_terms(real, fake):
        l1 = jnp.abs(real - fake).mean(axis=(1, 2, 3))
        ssim_val = 1.0 - L.ssim(
            real * 0.5 + 0.5, fake * 0.5 + 0.5, data_range=1.0, size_average=False
        )
        return l1, ssim_val

    def g_loss_fn(train_params, state: TrainState, batch, rng):
        # MUST run inside the differentiated function: stop_gradient on
        # frozen leaves here makes their cotangents symbolic zeros, so XLA
        # DCEs the frozen weight-gradient backward (see freeze_untrained).
        train_params = freeze_untrained(train_params)
        params_e, params_g = train_params["e"], train_params["g"]
        k_noise, k_render = jax.random.split(rng)

        id_images = batch["condition_image"].astype(cfg.dtype) / 127.5 - 1.0
        z, new_state_e = enc.apply(
            state.params_e if not cfg.train_en else params_e,
            state.state_e, id_images, train=cfg.train_en,
        )
        loss_c = batch["loss_c"].astype(jnp.float32)
        ws = g.mapping(params_g, z, loss_c)

        def synth(params_g_, ws_, c_, key_):
            return g.synthesis(
                params_g_, ws_, c_, neural_rendering_resolution=res,
                noise_mode="random", rng=key_, dtype=cfg.dtype,
                rendering_kwargs=rendering_overrides,
            )

        if cfg.remat_synthesis:
            synth = jax.checkpoint(synth)
        out = synth(params_g, ws, loss_c, k_noise)

        real_img = batch["loss_image"].astype(jnp.float32) / 127.5 - 1.0
        # DELIBERATE deviation: the reference's ssim_resize (torchvision 0.12
        # Resize on tensors, `training_loop.py:180`) does NOT antialias; we
        # antialias the 64^2 reconstruction target and D's real input to
        # match EG3D's antialiased filtered_resizing instead of inheriting
        # that aliasing. Recorded in PARITY.md "intentional deviations".
        real_raw = (
            interpolate_bilinear(
                batch["loss_image"].astype(jnp.float32), res, res, antialias=True
            )
            / 127.5
            - 1.0
        )
        factor = batch["factor"].astype(jnp.float32)

        l1_raw, ssim_raw = recon_terms(real_raw, out["image_raw"])
        l1_full, ssim_full = recon_terms(real_img, out["image"])
        lp_raw, lp_full = lpips_pair_terms(
            state.params_vgg, real_raw, out["image_raw"],
            real_img, out["image"]
        )
        recon = L.masked_mean(
            l1_raw + ssim_raw + lp_raw + l1_full + ssim_full + lp_full, factor
        )

        stats = {
            "Loss/G/l1_loss": L.masked_mean(l1_full, factor),
            "Loss/G/l_ssim_val": L.masked_mean(ssim_full, factor),
            "Loss/G/p_loss": L.masked_mean(lp_full, factor),
            "Loss/G/l1_loss_raw": L.masked_mean(l1_raw, factor),
            "Loss/G/ssim_val_raw": L.masked_mean(ssim_raw, factor),
            "Loss/G/p_loss_raw": L.masked_mean(lp_raw, factor),
        }

        total = recon
        if cfg.gan_depth and disc is not None:
            fake_logits = disc.apply(state.params_d, out["image_depth"], loss_c)
            loss_gmain = L.g_nonsaturating_loss(fake_logits)
            total = total + 1.2 * loss_gmain
            stats["Loss/G/main"] = loss_gmain

        aux = {
            "stats": stats,
            "state_e": new_state_e if cfg.train_en else state.state_e,
            "depth_fake": jax.lax.stop_gradient(out["image_depth"]),
        }
        return total, aux

    def d_loss_fn(params_d, state: TrainState, batch, depth_fake):
        loss_c = batch["loss_c"].astype(jnp.float32)
        cond_c = batch["condition_c"].astype(jnp.float32)
        depth_real = interpolate_bilinear(
            batch["c_depth_image"].astype(jnp.float32), res, res, antialias=True
        )

        fake_logits = disc.apply(params_d, depth_fake, loss_c)
        loss_dgen = jax.nn.softplus(fake_logits).mean()

        real_logits = disc.apply(params_d, depth_real, cond_c)
        loss_dreal = jax.nn.softplus(-real_logits).mean()

        r1 = L.r1_penalty(lambda x: disc.apply(params_d, x, cond_c), depth_real)
        loss_dr1 = (r1 * (cfg.r1_gamma / 2)).mean()

        stats = {
            "Loss/scores/fake": fake_logits.mean(),
            "Loss/scores/real": real_logits.mean(),
            "Loss/D/real": loss_dreal,
            "Loss/D/r1": loss_dr1,
        }
        return loss_dgen + loss_dreal + loss_dr1, stats

    def scrub(tree):
        return jax.tree_util.tree_map(
            lambda x: jnp.nan_to_num(x, nan=0.0, posinf=1e5, neginf=-1e5), tree
        )

    def freeze_untrained(train_params):
        """stop_gradient on FROZEN leaves: value_and_grad then yields
        symbolic zeros for them and XLA dead-code-eliminates their weight
        -gradient contractions entirely. Without this, a train_en-only run
        still paid the full generator weight-grad backward (the backbone's
        256^2 modconvs + 512^2 SR) just for optax.set_to_zero to discard it
        — measured 45 s/step vs ~3 s at flagship scale. Matches reference
        semantics: `requires_grad_(False)` params never get grads
        (`training_loop.py:171-172,300-310`)."""
        mask = _trainable_mask(g, train_params["e"], train_params["g"], cfg)
        return jax.tree_util.tree_map(
            lambda p, m: p if m else jax.lax.stop_gradient(p),
            train_params, mask,
        )

    def train_step(state: TrainState, batch, rng):
        train_params = {"e": state.params_e, "g": state.params_g}
        (loss, aux), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            train_params, state, batch, rng
        )
        grads = scrub(grads)
        updates, new_opt_g = opt_g.update(grads, state.opt_state_g, train_params)
        new_train = optax.apply_updates(train_params, updates)

        stats = dict(aux["stats"])
        stats["Loss/G/total"] = loss

        new_params_d = state.params_d
        new_opt_d = state.opt_state_d
        if cfg.gan_depth and disc is not None:
            (d_loss, d_stats), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(state.params_d, state, batch, aux["depth_fake"])
            d_grads = scrub(d_grads)
            d_updates, new_opt_d = opt_d.update(
                d_grads, state.opt_state_d, state.params_d
            )
            new_params_d = optax.apply_updates(state.params_d, d_updates)
            stats.update(d_stats)
            stats["Loss/D/total"] = d_loss

        # G_ema: the reference's custom loop skips EMA (snapshots G as G_ema,
        # `training_loop.py:503-560`); we keep a true EMA — strictly better.
        ema_beta = 0.5 ** (cfg.batch_size / max(cfg.ema_kimg * 1000.0, 1e-8))
        new_ema = ema_update(state.params_g_ema, new_train["g"], ema_beta)

        new_state = state.replace(
            params_e=new_train["e"],
            state_e=aux["state_e"],
            params_g=new_train["g"],
            params_g_ema=new_ema,
            params_d=new_params_d,
            opt_state_g=new_opt_g,
            opt_state_d=new_opt_d,
            cur_nimg=state.cur_nimg + batch["condition_image"].shape[0],
        )
        return new_state, stats

    return train_step


def make_chained_step(train_step: Callable) -> Callable:
    """K consecutive train steps inside ONE jitted program (lax.scan).

    The returned function takes (state, batches, keys) where every leaf of
    `batches` and `keys` has a leading chain axis K, scans `train_step`
    over them with the state as carry, and returns (final_state,
    stacked_stats) — each stat a (K,) array, one entry per inner step.

    Why: the per-step host round-trip (dispatch + donated-state return) is
    pure overhead on TPU — one K-step program crosses the host boundary
    once per K steps. The reference steps its loop from Python once per
    batch (`training_loop.py:314-443`); chaining is the TPU-native form.
    (Through this environment's dev relay, which stages each returned ~GB
    state at ~10-20 MB/s, chaining is the only honest way to RUN flagship
    training at all — see CLAUDE.md.) Ticks/validation/checkpoints happen
    at chain boundaries, so kimg-per-tick resolution coarsens to
    batch*K images — K is a dispatch-granularity knob, not semantics:
    the scanned program applies the identical per-step math."""

    def chained(state: TrainState, batches, keys):
        def body(s, xs):
            b, k = xs
            s2, stats = train_step(s, b, k)
            return s2, stats

        return jax.lax.scan(body, state, (batches, keys))

    return chained


def init_train_state(
    g: TriPlaneGenerator,
    enc: ResNeXt50Encoder,
    disc: Optional[Discriminator],
    vgg: L.VGG16LPIPS,
    cfg: TrainConfig,
    rng: jax.Array,
    opt_g=None,
    opt_d=None,
) -> TrainState:
    k_e, k_g, k_d, k_v = jax.random.split(rng, 4)
    params_e, state_e = enc.init(k_e)
    params_g = g.init(k_g)
    params_d = disc.init(k_d) if disc is not None else {}
    params_vgg = vgg.init(k_v)
    if opt_g is None:
        opt_g, opt_d = make_optimizers(g, params_e, params_g, cfg)
    train_params = {"e": params_e, "g": params_g}
    return TrainState(
        params_e=params_e,
        state_e=state_e,
        params_g=params_g,
        params_g_ema=jax.tree_util.tree_map(jnp.copy, params_g),
        params_d=params_d,
        params_vgg=params_vgg,
        opt_state_g=opt_g.init(train_params),
        opt_state_d=opt_d.init(params_d) if disc is not None else {},
        cur_nimg=jnp.zeros((), jnp.int64 if jax.config.read("jax_enable_x64") else jnp.int32),
    )


def save_snapshot(path: str, state: TrainState, config: Optional[dict] = None):
    """Snapshot in the reference's key layout: G_ema / E / D (+ E BN state)."""
    ckpt_lib.save_checkpoint(
        path,
        {
            "G_ema": state.params_g_ema,
            "G": state.params_g,
            "E": state.params_e,
            "E_state": state.state_e,
            "D": state.params_d,
        },
        config=config,
    )


def save_train_state(path: str, state: TrainState,
                     config: Optional[dict] = None,
                     backend: str = "npz") -> None:
    """FULL-state checkpoint: params + EMA + BOTH optimizer states + VGG +
    cur_nimg, keyed by leaf index so arbitrary optax state structures
    (namedtuples, MaskedNodes) round-trip exactly. Resume from this is
    bit-identical — unlike the reference, whose pickles are params-only
    ('The loop does NOT checkpoint optimizer state or RNG', SURVEY.md 5.4;
    reference `training_loop.py:503-560`)."""
    host = jax.device_get(state)
    leaves = jax.tree_util.tree_leaves(host)
    tree = {f"{i:05d}": np.asarray(x) for i, x in enumerate(leaves)}
    if backend == "orbax":
        ckpt_lib.save_checkpoint_orbax(path, {"train_state": tree}, config=config)
    else:
        ckpt_lib.save_checkpoint(path, {"train_state": tree}, config=config)


def load_train_state(path: str, template: TrainState,
                     backend: str = "npz") -> tuple[TrainState, Optional[dict]]:
    """Restore a save_train_state checkpoint into the structure of
    `template` (a freshly-initialized TrainState with the same config)."""
    if backend == "orbax":
        trees, config = ckpt_lib.load_checkpoint_orbax(path)
    else:
        trees, config = ckpt_lib.load_checkpoint(path)
    flat = trees["train_state"]
    path_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    if len(flat) != len(path_leaves):
        raise ValueError(
            f"checkpoint has {len(flat)} leaves, template has "
            f"{len(path_leaves)} — config mismatch")
    leaves = []
    for i, (path, t_leaf) in enumerate(path_leaves):
        arr = jnp.asarray(flat[f"{i:05d}"])
        t_leaf = jnp.asarray(t_leaf)
        # Leaf-count equality alone would let a same-size/different-config
        # checkpoint load silently; validate every leaf's shape here (and
        # name the offending leaf) rather than at the first train step.
        if arr.shape != t_leaf.shape:
            raise ValueError(
                f"checkpoint leaf {i} ({jax.tree_util.keystr(path)}) has "
                f"shape {arr.shape}, template expects {t_leaf.shape} — "
                f"config mismatch")
        if arr.dtype != t_leaf.dtype:
            print(f"WARNING: load_train_state casting "
                  f"{jax.tree_util.keystr(path)} {arr.dtype} -> {t_leaf.dtype}")
            arr = arr.astype(t_leaf.dtype)
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves), config
