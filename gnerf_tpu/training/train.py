"""Training CLI.

Capability equivalent of the reference launcher
(`/root/reference/g_nerf/train.py`): builds the config tree (dataset choice,
SR module, rendering options per dataset family), prepares the run dir with
`training_options.json`, and drives the tick/snapshot loop. Differences by
design: no process-spawn — one JAX process per host over a device mesh; the
reference's broken `metrics.metric_main` import (`train.py:31`) is replaced
by the built-in SSIM validation metric.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
import time

import click
import numpy as np

import jax
import jax.numpy as jnp


RENDERING_PRESETS = {
    # reference train.py:310-356
    "ffhq": dict(depth_resolution=48, depth_resolution_importance=48,
                 ray_start=2.25, ray_end=3.3, box_warp=1.0,
                 avg_camera_radius=2.7, avg_camera_pivot=(0, 0, 0.2),
                 superresolution_module="SuperresolutionHybrid8XDC",
                 image_resolution=512),
    "afhqv2": dict(depth_resolution=48, depth_resolution_importance=48,
                   ray_start=2.25, ray_end=3.3, box_warp=1.0,
                   avg_camera_radius=2.7, avg_camera_pivot=(0, 0, -0.06),
                   superresolution_module="SuperresolutionHybrid8XDC",
                   image_resolution=512),
    "shapenet": dict(depth_resolution=64, depth_resolution_importance=64,
                     ray_start=0.1, ray_end=2.6, box_warp=1.6, white_back=True,
                     avg_camera_radius=1.7, avg_camera_pivot=(0, 0, 0),
                     superresolution_module="SuperresolutionHybrid2X",
                     image_resolution=128),
    # Generic EG3D-format folder/zip data (ImageFolderDataset): FFHQ optics.
    "folder": dict(depth_resolution=48, depth_resolution_importance=48,
                   ray_start=2.25, ray_end=3.3, box_warp=1.0,
                   avg_camera_radius=2.7, avg_camera_pivot=(0, 0, 0.2),
                   superresolution_module="SuperresolutionHybrid8XDC",
                   image_resolution=512),
    "synthetic": dict(depth_resolution=12, depth_resolution_importance=12,
                      ray_start=2.25, ray_end=3.3, box_warp=1.0,
                      avg_camera_radius=2.7, avg_camera_pivot=(0, 0, 0.2),
                      superresolution_module="SuperresolutionHybrid2X",
                      image_resolution=128),
}


def save_image_grid(images: np.ndarray, path: str, drange=(-1, 1),
                    grid_w: int = None) -> None:
    """Tile [N, C, H, W] into one PNG (reference save_image_grid)."""
    from PIL import Image

    lo, hi = drange
    img = (np.asarray(images, np.float32) - lo) * (255 / (hi - lo))
    img = np.rint(img).clip(0, 255).astype(np.uint8)
    n, c, h, w = img.shape
    gw = grid_w or int(np.ceil(np.sqrt(n)))
    gh = int(np.ceil(n / gw))
    pad = gw * gh - n
    if pad:
        img = np.concatenate([img, np.zeros((pad, c, h, w), np.uint8)])
    img = img.reshape(gh, gw, c, h, w).transpose(0, 3, 1, 4, 2)
    img = img.reshape(gh * h, gw * w, c)
    if c == 1:
        img = img[..., 0]
    Image.fromarray(img).save(path)


def make_validator(g, enc, cfg, vgg=None, lpips_pretrained=True):
    """Validation SSIM (gates the best-checkpoint snapshot, reference
    `training_loop.py:474-529`) plus PSNR and a VGG-feature perceptual
    distance, so the quality-gate run logs a full curve set per tick.
    The perceptual metric is only computed when `lpips_pretrained` — a
    random-VGG distance would log a curve indistinguishable from a real
    perceptual metric (the loss path's fallback is loud; this one must
    not be silent)."""
    from .losses import lpips_distance, ssim as ssim_fn
    from .metrics import psnr as psnr_fn

    vgg = vgg if lpips_pretrained else None

    @jax.jit
    def validate_batch(params_e, state_e, params_g, params_vgg, batch):
        id_images = batch["condition_image"].astype(jnp.float32) / 127.5 - 1.0
        z, _ = enc.apply(params_e, state_e, id_images, train=False)
        c = batch["loss_c"].astype(jnp.float32)
        ws = g.mapping(params_g, z, c)
        out = g.synthesis(params_g, ws, c, noise_mode="none")
        real = batch["loss_image"].astype(jnp.float32) / 127.5 - 1.0
        val = ssim_fn(real * 0.5 + 0.5, out["image"] * 0.5 + 0.5,
                      data_range=1.0)
        psnr = psnr_fn(real * 0.5 + 0.5, out["image"] * 0.5 + 0.5,
                       data_range=1.0).mean()
        if vgg is not None and params_vgg is not None:
            lp = lpips_distance(vgg, params_vgg, real, out["image"]).mean()
        else:
            lp = jnp.zeros(())
        return val, psnr, lp, out["image"]

    return validate_batch


def _paired_dataset(dataset_name, data, real_data, img_resolution):
    """dataset_name -> paired-dataset class (reference `train.py:249-266`
    picks the Dataset class per dataset family the same way; before this
    dispatch existed, shapenet/afhqv2 silently fell through to the FFHQ
    loader layout)."""
    from .dataset import Afhqv2Dataset, FFHQGenDataset, ShapeNetDataset

    cls = {"ffhq": FFHQGenDataset, "afhqv2": Afhqv2Dataset,
           "shapenet": ShapeNetDataset}.get(dataset_name)
    if cls is None:
        raise ValueError(f"unknown --dataset_name {dataset_name!r} "
                         "(expected ffhq/afhqv2/shapenet/folder/synthetic)")
    return cls(path=data, real_path=real_data or None,
               resolution=img_resolution)


def check_fade_sr_compat(g, params_g, cfg, img_resolution: int) -> None:
    """Fail fast on SR/fade incompatibility: every render resolution the fade
    can visit must keep G's `image` at img_resolution (the D's fixed input).
    The FFHQ-style SR variants resize off-size inputs to their fixed
    input_resolution; the 2X/ShapeNet module does not (reference
    `superresolution.py:94-124`), so its output would silently track the
    faded res and crash hours in at the first new bucket. Pure shape
    inference (jax.eval_shape) — no FLOPs, runs once at startup."""
    if cfg.neural_rendering_resolution_final is None:
        return
    lo = min(cfg.neural_rendering_resolution,
             cfg.neural_rendering_resolution_final)
    hi = max(cfg.neural_rendering_resolution,
             cfg.neural_rendering_resolution_final)
    b = max(int(cfg.res_bucket), 1)
    buckets = {cfg.neural_rendering_resolution,
               cfg.neural_rendering_resolution_final}
    buckets |= {r for r in range(lo, hi + 1) if r % b == 0}
    ws_s = jax.ShapeDtypeStruct((1, g.num_ws, g.w_dim), jnp.float32)
    c_s = jax.ShapeDtypeStruct((1, 25), jnp.float32)
    for r in sorted(buckets):
        out = jax.eval_shape(
            lambda p, ws, c, r=r: g.synthesis(
                p, ws, c, neural_rendering_resolution=r, noise_mode="none"),
            params_g, ws_s, c_s)
        if out["image"].shape[-1] != img_resolution:
            raise ValueError(
                f"render-resolution fade visits res={r} at which the "
                f"configured SR module emits a {out['image'].shape[-1]}^2 "
                f"image instead of {img_resolution}^2 — use an SR variant "
                "with the fixed-input resize guard (8XDC/8X/4X family) or "
                "set rendering_kwargs['sr_input_resolution']")


def _run_eg3d_training(g, rendering_kwargs, img_resolution, dataset_name,
                       data, real_data, batch, gamma, kimg, tick, seed,
                       run_dir, options, aug="noaug", aug_p=0.0,
                       ada_target=0.6, ada_kimg=500.0, ray_shards=1,
                       freezed=0,
                       neural_rendering_resolution_final=None,
                       neural_rendering_resolution_fade_kimg=1000.0,
                       style_mixing_prob=0.0, resume="", dtype="fp32",
                       density_reg_every=4, d_reg_interval=16, chain=1,
                       snap=50, chain_dreg_split=False):
    """EG3D adversarial pretraining (z, c) -> image — the stage that
    produces the generator G-NeRF fine-tunes (reference loss.py spec,
    implemented live in eg3d_loss.py).

    `resume` restores a FULL training-state checkpoint (params + EMA + both
    Adams + cur_nimg + live ADA p) written each tick — same preemption
    contract as the G-NeRF loop, beyond the reference's params-only pickles
    (`training_loop.py:503-560`, SURVEY.md 5.4). Per-step keys are a pure
    function of cur_nimg and every schedule (blur, gpc-swap, res-fade, ADA)
    rides the restored counter, so a resumed run continues the exact
    schedule state; only the data order restarts (sampler reseeded from the
    resume position) and the sub-interval ADA r_t window is dropped."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models.dual_discriminator import DualDiscriminator
    from ..parallel import make_mesh, put_global_batch
    from ..utils.stats import Collector
    from .dataset import SyntheticDataset, data_iterator
    from .eg3d_loss import EG3DLossConfig, init_eg3d_state, make_eg3d_train_step
    from ..utils import checkpoint as ckpt_lib

    disc = DualDiscriminator(c_dim=25, img_resolution=img_resolution,
                             img_channels=3)
    cfg = EG3DLossConfig(
        r1_gamma=gamma,
        neural_rendering_resolution=g.neural_rendering_resolution,
        density_reg=rendering_kwargs.get("density_reg", 0.25),
        gpc_reg_prob=rendering_kwargs.get("gpc_reg_prob", 0.5),
        gpc_reg_fade_kimg=rendering_kwargs.get("gpc_reg_fade_kimg", 1000.0),
        blur_init_sigma=rendering_kwargs.get("blur_init_sigma", 0.0),
        blur_fade_kimg=rendering_kwargs.get("blur_fade_kimg",
                                            batch * 200 / 32),
        aug=aug,
        aug_p=aug_p,
        ada_target=ada_target,
        ada_kimg=ada_kimg,
        freeze_d_layers=freezed,
        neural_rendering_resolution_final=neural_rendering_resolution_final,
        neural_rendering_resolution_fade_kimg=(
            neural_rendering_resolution_fade_kimg),
        style_mixing_prob=style_mixing_prob,
        # bf16 runs G synthesis + both D conv stacks in bfloat16
        # (compositing, losses, R1 and the Adams stay fp32).
        dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32,
        # Lazy regularization cadence (reference --density_reg_every /
        # D_reg_interval, training_loop.py:123-124); <=1 disables lazy and
        # fuses the reg terms into every step.
        g_reg_interval=int(density_reg_every),
        d_reg_interval=int(d_reg_interval),
    )
    # Mesh first: with --ray_shards > 1 the step itself needs the 'rays'
    # axis sharding (same DP x SP contract as the G-NeRF objective).
    n_dev = len(jax.devices())
    assert n_dev % ray_shards == 0, (
        f"--ray_shards {ray_shards} must divide device count {n_dev}")
    mesh = make_mesh(data=n_dev // ray_shards, rays=ray_shards)
    rendering_overrides = None
    if ray_shards > 1:
        rendering_overrides = {
            "ray_sharding": NamedSharding(mesh, P("data", "rays", None))
        }
    # Lazy regularization (the reference schedule, `training_loop.py:123-
    # 124`): Greg/Dreg run as their own small programs every
    # g_reg_interval / d_reg_interval batches. Besides parity, this is what
    # fits the flagship ADA step in one v5e's HBM (see eg3d_loss.py).
    from .eg3d_loss import make_eg3d_phase_steps

    lazy = cfg.g_reg_interval > 1 or cfg.d_reg_interval > 1
    if lazy:
        main_fn, greg_fn, dreg_fn, opt_g, opt_d = make_eg3d_phase_steps(
            g, disc, cfg, rendering_overrides=rendering_overrides)
    else:
        main_fn, opt_g, opt_d = make_eg3d_train_step(
            g, disc, cfg, rendering_overrides=rendering_overrides)
        greg_fn = dreg_fn = None
    state = init_eg3d_state(g, disc, opt_g, opt_d, jax.random.PRNGKey(seed))

    check_fade_sr_compat(g, state["params_g"], cfg, img_resolution)

    from ..parallel import process_info
    from .train_loop import load_train_state, save_train_state

    rank, world = process_info()
    resumed_aug_p = None
    if resume:
        state, ckpt_cfg = load_train_state(resume, state)
        if ckpt_cfg and "aug_p_live" in ckpt_cfg:
            resumed_aug_p = float(ckpt_cfg["aug_p_live"])
        if rank == 0:
            print(f"Resumed EG3D training state from {resume} at kimg "
                  f"{int(np.asarray(state['cur_nimg'])) / 1000:.1f}")

    if dataset_name == "synthetic":
        dataset = SyntheticDataset(resolution=img_resolution)
    elif dataset_name == "folder" or data.endswith(".zip"):
        from .dataset import ImageFolderDataset

        dataset = ImageFolderDataset(path=data, resolution=img_resolution)
    else:
        dataset = _paired_dataset(dataset_name, data, real_data, img_resolution)

    # Per-host shard of the global batch (reference batch_gpu = batch//gpus,
    # train.py:273); the sampler walks every world-th index per host. Seeded
    # from the resume position so a resumed run draws fresh data order
    # rather than replaying step 0's (the reference's params-only resume
    # semantics, SURVEY.md 5.4).
    assert batch % world == 0, f"batch {batch} not divisible by {world} hosts"
    local_batch = batch // world
    resume_nimg = int(np.asarray(jax.device_get(state["cur_nimg"])))
    batches = data_iterator(dataset, batch_size=local_batch, rank=rank,
                            num_replicas=world, seed=seed + resume_nimg)

    repl = NamedSharding(mesh, P())
    dsh2 = NamedSharding(mesh, P("data", None))
    dsh4 = NamedSharding(mesh, P("data", None, None, None))
    batch_sh = {"z": dsh2, "c": dsh2, "real_image": dsh4, "real_c": dsh2}
    state = jax.device_put(state, repl)

    def put_batch(v, sh):
        return put_global_batch(v, sh, world)
    # One compiled program per (blur-kernel extent, render resolution)
    # bucket: the D warm-up blur fades over blur_fade_kimg and the neural
    # render resolution fades initial -> final over its fade_kimg — both
    # must be static under jit, and both step through small bounded sets
    # (eg3d_loss.blur_kernel_size / neural_resolution_schedule). sigma and
    # aug_p are traced, so within a bucket no recompile happens.
    from .eg3d_loss import (ada_update_p, blur_kernel_size,
                            blur_sigma_schedule, neural_resolution_schedule)

    _steps: dict = {}
    _dregs: dict = {}
    _gregs: dict = {}

    def step(state, gan_batch, rng, cur_nimg, aug_p):
        sigma = blur_sigma_schedule(cur_nimg, cfg)
        size = blur_kernel_size(sigma)
        res = neural_resolution_schedule(cur_nimg, cfg)
        if (size, res) not in _steps:
            # blur_size/res are baked per bucket via partial: pjit rejects
            # kwargs (even static ones) when in_shardings is specified.
            import functools

            _steps[(size, res)] = jax.jit(
                functools.partial(main_fn, blur_size=size, res=res),
                in_shardings=(repl, batch_sh, repl, repl, repl),
                out_shardings=(repl, repl), donate_argnums=(0,),
            )
        return _steps[(size, res)](state, gan_batch, rng,
                            jax.device_put(jnp.float32(max(sigma, 1e-8)), repl),
                            jax.device_put(jnp.float32(aug_p), repl))

    def reg_steps(state, gan_batch, rng, cur_nimg, aug_p, sched_idx):
        """Run the due lazy phases (reference `batch_idx % reg_interval ==
        0` cadence, resume-consistent via sched_idx = cur_nimg // batch)."""
        import functools

        reg_stats = {}
        if greg_fn is not None and sched_idx % max(cfg.g_reg_interval, 1) == 0:
            if not _gregs:
                _gregs["jit"] = jax.jit(
                    greg_fn, in_shardings=(repl, batch_sh, repl),
                    out_shardings=(repl, repl), donate_argnums=(0,))
            state, s = _gregs["jit"](state, gan_batch,
                                     jax.device_put(
                                         jax.random.fold_in(rng, 1), repl))
            reg_stats.update(s)
        if dreg_fn is not None and sched_idx % max(cfg.d_reg_interval, 1) == 0:
            sigma = blur_sigma_schedule(cur_nimg, cfg)
            size = blur_kernel_size(sigma)
            res = neural_resolution_schedule(cur_nimg, cfg)
            if (size, res) not in _dregs:
                _dregs[(size, res)] = jax.jit(
                    functools.partial(dreg_fn, blur_size=size, res=res),
                    in_shardings=(repl, batch_sh, repl, repl, repl),
                    out_shardings=(repl, repl), donate_argnums=(0,))
            state, s = _dregs[(size, res)](
                state, gan_batch, jax.device_put(
                    jax.random.fold_in(rng, 2), repl),
                jax.device_put(jnp.float32(max(sigma, 1e-8)), repl),
                jax.device_put(jnp.float32(aug_p), repl))
            reg_stats.update(s)
        return state, reg_stats

    # --chain K (same dispatch-granularity knob as the G-NeRF objective):
    # ONE jitted K-step cycle — main + due lazy phases + the device-side
    # ADA controller (eg3d_loss.make_chained_eg3d_cycle) — so the donated
    # multi-GB state crosses the host boundary once per K steps instead of
    # up to 3 times per step. Required for hours-scale adversarial runs
    # through the relay (~100 s per state return; CLAUDE.md).
    chain = max(int(chain), 1)
    if chain > 1 and aug == "ada":
        assert chain % max(cfg.ada_interval, 1) == 0, (
            f"--chain {chain} must be a multiple of ada_interval "
            f"{cfg.ada_interval} so controller windows never straddle a "
            "chain boundary")
    chain_sh = {
        "z": NamedSharding(mesh, P(None, "data", None)),
        "c": NamedSharding(mesh, P(None, "data", None)),
        "real_image": NamedSharding(mesh, P(None, "data", None, None, None)),
        "real_c": NamedSharding(mesh, P(None, "data", None)),
    }
    _cycles: dict = {}
    _dslices: dict = {}
    # --chain_dreg_split: keep the R1 phase OUT of the cycle program and
    # dispatch it separately at its due positions, returning only the D
    # slice (make_dreg_dslice). The in-cycle lax.cond(Dreg) form is the
    # cheaper dispatch shape but its program has crashed this
    # environment's TPU worker at flagship ADA scale — see CLAUDE.md r5.
    split_dreg = bool(chain_dreg_split) and dreg_fn is not None

    def dreg_slice_step(state, batch_i, rng, nimg_i, sigma, p, size, res):
        import functools

        if (size, res) not in _dslices:
            from .eg3d_loss import make_dreg_dslice

            _dslices[(size, res)] = jax.jit(
                functools.partial(make_dreg_dslice(dreg_fn),
                                  blur_size=size, res=res),
                in_shardings=(repl, repl, repl, batch_sh, repl, repl, repl),
                out_shardings=(repl, repl, repl), donate_argnums=(0, 1))
        pd, od, dstats = _dslices[(size, res)](
            state["params_d"], state["opt_state_d"],
            jax.device_put(jnp.int32(nimg_i), repl), batch_i,
            jax.device_put(rng, repl),
            jax.device_put(jnp.float32(max(sigma, 1e-8)), repl),
            jax.device_put(jnp.float32(p), repl))
        return dict(state, params_d=pd, opt_state_d=od), dstats

    def cycle_step(state, gan_batches, rngs, g_due, d_due, sigmas, p0,
                   size, res):
        """Dispatch one K-step cycle, compiled per (blur-size, res) bucket.
        Within a chain the blur KERNEL EXTENT (static) is pinned to the
        chain-start sigma — the fade crosses extent buckets once per
        hundreds of steps, so the quantization is at most one chain late;
        the sigma VALUE itself stays exact per step (traced (K,) input)."""
        if (size, res) not in _cycles:
            from .eg3d_loss import make_chained_eg3d_cycle

            fn = make_chained_eg3d_cycle(
                main_fn, greg_fn, None if split_dreg else dreg_fn, cfg,
                blur_size=size, res=res)
            donate = () if os.environ.get("GNERF_CHAIN_NO_DONATE") else (0,)
            _cycles[(size, res)] = jax.jit(
                fn,
                in_shardings=(repl, chain_sh, repl, repl, repl, repl, repl),
                out_shardings=(repl, repl, repl), donate_argnums=donate)
        return _cycles[(size, res)](state, gan_batches, rngs, g_due, d_due,
                                    sigmas, p0)

    # Preemption-safe shutdown (same contract as the G-NeRF loop, SURVEY.md
    # 5.3): SIGTERM/SIGINT finish the in-flight step, save full state, exit.
    import signal

    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        stop_requested["flag"] = True
        print(f"signal {signum}: finishing step, checkpointing, exiting...")

    prev_handlers = {
        s: signal.signal(s, _request_stop)
        for s in (signal.SIGTERM, signal.SIGINT)
    }

    tb_writer = None
    if rank == 0:
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb_writer = SummaryWriter(run_dir)
        except Exception as err:  # pragma: no cover
            print("Skipping tfevents export:", err)

    collector = Collector()
    cur_nimg = resume_nimg
    tick_idx = int(cur_nimg // max(tick * 1000, 1))
    tick_start = time.time()
    # Per-step keys are a pure function of cur_nimg (not a running split
    # stream), so a resume-from-nimg continues the key sequence rather than
    # replaying it from 0.
    base_rng = jax.random.PRNGKey(seed + 1)
    # ADA adaptive-p controller state (host-side, like the blur schedule):
    # r_t = mean sign(D(real)) over the interval feeds ada_update_p; the
    # live p is persisted with the full-state checkpoint.
    cur_aug_p = resumed_aug_p if resumed_aug_p is not None else float(aug_p)
    rt_window: list = []
    step_idx = 0
    if rank == 0:
        print(f"EG3D pretraining for {kimg} kimg in {run_dir} "
              f"(aug={aug}, p0={cur_aug_p}) ...")
    while cur_nimg < kimg * 1000 and not stop_requested["flag"]:
        if chain > 1:
            # K-step dispatch: same cur_nimg-keyed stream as the unchained
            # path (step i uses fold_in(base, cur_nimg + i*batch)), due
            # masks from the same sched_idx cadence rule, real images
            # shipped uint8 (normalized on device — 4x less host-link
            # staging for the largest input leaf).
            base_sched = cur_nimg // batch
            zs, cs, imgs, ks_list, g_due, d_due, sig_list = (
                [], [], [], [], [], [], [])
            for i in range(chain):
                nimg_i = cur_nimg + i * batch
                kz, ks = jax.random.split(jax.random.fold_in(base_rng,
                                                             nimg_i))
                raw = next(batches)
                zs.append(np.asarray(
                    jax.random.normal(jax.random.fold_in(kz, rank),
                                      (local_batch, g.z_dim))))
                cs.append(np.asarray(raw["loss_c"], np.float32))
                img = np.asarray(raw["loss_image"])
                if img.dtype != np.uint8:  # cycle normalizes uint8 only
                    img = np.asarray(img, np.float32) / 127.5 - 1.0
                imgs.append(img)
                ks_list.append(ks)
                g_due.append(greg_fn is not None and
                             (base_sched + i) % max(cfg.g_reg_interval, 1)
                             == 0)
                d_due.append(dreg_fn is not None and
                             (base_sched + i) % max(cfg.d_reg_interval, 1)
                             == 0)
                sig_list.append(max(blur_sigma_schedule(nimg_i, cfg), 1e-8))
            gan_batches = {
                "z": put_batch(np.stack(zs), chain_sh["z"]),
                "c": put_batch(np.stack(cs), chain_sh["c"]),
                "real_image": put_batch(np.stack(imgs),
                                        chain_sh["real_image"]),
                "real_c": put_batch(np.stack(cs), chain_sh["real_c"]),
            }
            size = blur_kernel_size(blur_sigma_schedule(cur_nimg, cfg))
            res0 = neural_resolution_schedule(cur_nimg, cfg)
            p_before = cur_aug_p
            state, p_final, stats = cycle_step(
                state, gan_batches,
                jax.device_put(jnp.stack(ks_list), repl),
                jax.device_put(jnp.asarray(g_due), repl),
                jax.device_put(jnp.asarray(d_due), repl),
                jax.device_put(jnp.asarray(sig_list, jnp.float32), repl),
                jax.device_put(jnp.float32(cur_aug_p), repl), size, res0)
            cur_aug_p = float(np.asarray(jax.device_get(p_final)))
            base_nimg = cur_nimg
            cur_nimg += batch * chain
            step_idx += chain
            stats = jax.device_get(stats)
            if split_dreg:
                # Due Dreg positions run AFTER the chain (deviation from
                # the interleaved order, bounded by the chain length —
                # same class as the blur-bucket quantization above), each
                # with the pre-step p the interleaved form would have used
                # (the cycle's per-step p trace).
                p_trace = np.asarray(stats["Progress/augment"])
                for i in range(chain):
                    if not d_due[i]:
                        continue
                    img_i = imgs[i]
                    if img_i.dtype == np.uint8:
                        img_i = np.asarray(img_i, np.float32) / 127.5 - 1.0
                    batch_i = {
                        "z": put_batch(zs[i], dsh2),
                        "c": put_batch(cs[i], dsh2),
                        "real_image": put_batch(img_i, dsh4),
                        "real_c": put_batch(cs[i], dsh2),
                    }
                    p_pre = float(p_trace[i - 1]) if i > 0 else p_before
                    state, dstats = dreg_slice_step(
                        state, batch_i, jax.random.fold_in(ks_list[i], 2),
                        base_nimg + i * batch, sig_list[i], p_pre,
                        size, res0)
                    for name, value in dstats.items():
                        collector.report(name, value)
            for name, value in stats.items():
                value = np.asarray(value)
                # Reg stats are zero-filled at not-due scan positions —
                # aggregate only the positions the phase actually ran.
                if name == "Loss/G/density_reg":
                    value = value[np.asarray(g_due)]
                elif name == "Loss/D/reg":
                    value = value[np.asarray(d_due)]
                if value.size:
                    collector.report(name, value)
        else:
            kz, ks = jax.random.split(jax.random.fold_in(base_rng, cur_nimg))
            raw = next(batches)
            # Each host draws only its local_batch z rows (key folded with
            # rank so hosts don't duplicate latents); the global arrays are
            # assembled from the per-process shards.
            z_local = jax.random.normal(jax.random.fold_in(kz, rank),
                                        (local_batch, g.z_dim))
            c_local = np.asarray(raw["loss_c"], np.float32)
            gan_batch = {
                "z": put_batch(z_local, dsh2),
                "c": put_batch(c_local, dsh2),
                "real_image": put_batch(
                    np.asarray(raw["loss_image"], np.float32) / 127.5 - 1.0,
                    dsh4
                ),
                "real_c": put_batch(c_local, dsh2),
            }
            sched_idx = cur_nimg // batch
            state, stats = step(state, gan_batch, jax.device_put(ks, repl),
                                cur_nimg, cur_aug_p)
            state, reg_stats = reg_steps(state, gan_batch, ks, cur_nimg,
                                         cur_aug_p, sched_idx)
            stats = {**stats, **reg_stats}
            cur_nimg += batch
            step_idx += 1
            for name, value in stats.items():
                collector.report(name, value)
            collector.report("Progress/augment", cur_aug_p)
            if aug == "ada":
                rt_window.append(stats["Loss/signs/real"])
                if step_idx % cfg.ada_interval == 0:
                    rt = float(np.mean([np.asarray(jax.device_get(x))
                                        for x in rt_window]))
                    cur_aug_p = ada_update_p(cur_aug_p, rt, batch, cfg)
                    rt_window.clear()
        if cur_nimg >= (tick_idx + 1) * tick * 1000 or cur_nimg >= kimg * 1000:
            # Recompute (don't increment): one chained dispatch can cross
            # several tick boundaries when batch*chain > tick*1000.
            tick_idx = max(tick_idx + 1, cur_nimg // max(tick * 1000, 1))
            fields = collector.update()
            msg = " ".join(f"{k.split('/')[-1]} {v['mean']:.4f}"
                           for k, v in fields.items())
            now = time.time()
            if rank == 0:
                print(f"tick {tick_idx:<4d} kimg {cur_nimg / 1000:<7.1f} "
                      f"sec/tick {now - tick_start:<7.1f} {msg}")
                collector.write_jsonl(os.path.join(run_dir, "stats.jsonl"),
                                      extra={"kimg": cur_nimg / 1000})
                if tb_writer is not None:
                    for name, v in fields.items():
                        tb_writer.add_scalar(name, v["mean"],
                                             global_step=cur_nimg)
                    tb_writer.flush()
                # Disk-full tolerance (reference `training_loop.py:562-564`).
                try:
                    host = jax.device_get(state)
                    trees = {"G_ema": host["params_g_ema"],
                             "G": host["params_g"], "D": host["params_d"]}
                    ckpt_lib.save_checkpoint(
                        os.path.join(run_dir, "network-snapshot-latest.npz"),
                        trees, config=options,
                    )
                    # Periodic history snapshots (reference
                    # `network-snapshot-{kimg}.pkl` cadence,
                    # training_loop.py:503): same host tree, extra disk only.
                    if snap > 0 and tick_idx % snap == 0:
                        ckpt_lib.save_checkpoint(
                            os.path.join(
                                run_dir,
                                f"network-snapshot-{cur_nimg // 1000:06d}.npz"),
                            trees, config=options,
                        )
                    save_train_state(
                        os.path.join(run_dir, "training-state-latest.npz"),
                        state, config={**options, "aug_p_live": cur_aug_p})
                except OSError as err:
                    print(f"WARNING: snapshot write failed: {err}")
            tick_start = now
    for s, h in prev_handlers.items():
        signal.signal(s, h)
    if rank == 0:
        try:
            host = jax.device_get(state)
            ckpt_lib.save_checkpoint(
                os.path.join(run_dir, "network-snapshot-final.npz"),
                {"G_ema": host["params_g_ema"], "G": host["params_g"],
                 "D": host["params_d"]},
                config=options,
            )
            save_train_state(
                os.path.join(run_dir, "training-state-latest.npz"),
                state, config={**options, "aug_p_live": cur_aug_p})
        except OSError as err:
            print(f"WARNING: final snapshot failed: {err}")
        if stop_requested["flag"]:
            print(f"preempted at {cur_nimg / 1000:.1f} kimg — full state "
                  f"saved; resume with --resume "
                  f"{os.path.join(run_dir, 'training-state-latest.npz')}")
        print("done")
    return run_dir


def pick_run_dir(outdir: str, desc: str) -> str:
    os.makedirs(outdir, exist_ok=True)
    prev = [
        int(m.group(1))
        for d in os.listdir(outdir)
        if (m := re.match(r"^(\d+)-", d))
    ]
    run_id = max(prev, default=-1) + 1
    run_dir = os.path.join(outdir, f"{run_id:05d}-{desc}")
    os.makedirs(run_dir, exist_ok=False)
    return run_dir


def run_training(
    outdir: str,
    dataset_name: str = "synthetic",
    data: str = "",
    real_data: str = "",
    batch: int = 8,
    glr: float = 1e-3,
    dlr: float = 8e-6,
    gamma: float = 1.0,
    kimg: int = 4000,
    tick: int = 2,
    snap: int = 50,
    seed: int = 0,
    z_dim: int = 512,
    w_dim: int = 512,
    train_gen: bool = False,
    train_en: bool = True,
    gan_depth: bool = True,
    resume: str = "",
    dry_run: bool = False,
    gen_pose_cond: bool = False,
    c_scale: float = 1.0,
    sr_module: str = "",
    sr_noise_mode: str = "none",
    density_reg: float = 0.25,
    decoder_lr_mul: float = 1.0,
    objective: str = "gnerf",
    lpips_weights: str = "",
    dtype: str = "fp32",
    aug: str = "noaug",
    aug_p: float = 0.0,
    ada_target: float = 0.6,
    ada_kimg: float = 500.0,
    ray_shards: int = 1,
    freezed: int = 0,
    neural_rendering_resolution_final: int = 0,
    neural_rendering_resolution_fade_kimg: float = 1000.0,
    style_mixing_prob: float = 0.0,
    preset: str = "",
    density_reg_every: int = 4,
    d_reg_interval: int = 16,
    chain: int = 1,
    chain_dreg_split: bool = False,
):
    from ..models import Discriminator, ResNeXt50Encoder, TriPlaneGenerator
    from ..models.triplane import DEFAULT_RENDERING_KWARGS
    from ..parallel import (
        init_distributed,
        make_mesh,
        process_info,
        put_global_batch,
    )
    from ..utils import checkpoint as ckpt_lib
    from ..utils.stats import Collector
    from .dataset import (
        ImageFolderDataset,
        SyntheticDataset,
        data_iterator,
    )
    from .losses import VGG16LPIPS, ssim
    from .train_loop import (
        TrainConfig,
        init_train_state,
        load_train_state,
        make_chained_step,
        make_optimizers,
        make_train_step,
        save_snapshot,
        save_train_state,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    # Multi-host: flag-gated jax.distributed.initialize BEFORE the first
    # backend touch; rank gates host I/O below, world shards the sampler.
    init_distributed()
    rank, world = process_info()

    # --preset decouples the rendering/SR/resolution recipe from the data
    # source (default: the dataset's own preset) — e.g. `--dataset_name
    # synthetic --preset ffhq` trains the FLAGSHIP shape (512^2, 8XDC,
    # 48+48 spp) on procedural data for shape-faithful perf/quality runs.
    preset_cfg = RENDERING_PRESETS[preset or dataset_name]
    rendering_kwargs = dict(DEFAULT_RENDERING_KWARGS)
    rendering_kwargs.update(preset_cfg)
    # Reference train.py:317-323 knobs.
    rendering_kwargs.update(
        c_gen_conditioning_zero=not gen_pose_cond,
        c_scale=c_scale,
        superresolution_noise_mode=sr_noise_mode,
        density_reg=density_reg,
        decoder_lr_mul=decoder_lr_mul,
    )
    if sr_module:
        rendering_kwargs["superresolution_module"] = sr_module
    img_resolution = preset_cfg["image_resolution"]

    g = TriPlaneGenerator(
        z_dim=z_dim, w_dim=w_dim, img_resolution=img_resolution,
        rendering_kwargs=rendering_kwargs,
    )
    enc = ResNeXt50Encoder(out_dim=z_dim)
    cfg = TrainConfig(
        total_kimg=kimg, kimg_per_tick=tick, batch_size=batch, glr=glr,
        dlr=dlr, r1_gamma=gamma, gan_depth=gan_depth, train_en=train_en,
        train_gen=train_gen, snapshot_ticks=snap, random_seed=seed,
        # bf16 runs the backbone/SR/LPIPS forward in bfloat16 (compositing
        # and both optimizers stay fp32) — the stability of the depth-GAN +
        # R1 dynamics in bf16 is covered by
        # tests/test_train_resume.py::test_multi_tick_convergence_bf16...
        dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32,
    )
    disc = (
        Discriminator(c_dim=25, img_resolution=cfg.neural_rendering_resolution,
                      img_channels=1)
        if gan_depth else None
    )
    from .losses import lpips_params_or_warn

    vgg, params_vgg_loaded, lpips_pretrained = lpips_params_or_warn(
        jax.random.PRNGKey(seed + 7), lpips_weights or None)

    options = {
        "dataset_name": dataset_name,
        "preset": preset or dataset_name,
        "config": dataclasses.asdict(
            dataclasses.replace(cfg, dtype=str(np.dtype(cfg.dtype)))
        ),
        # Self-describing checkpoints: enough to reconstruct G at load time.
        "generator": {
            "z_dim": z_dim, "w_dim": w_dim, "img_resolution": img_resolution,
            "rendering_kwargs": {
                k: (list(v) if isinstance(v, tuple) else v)
                for k, v in rendering_kwargs.items()
            },
        },
        "rendering_kwargs": {
            k: (list(v) if isinstance(v, tuple) else v)
            for k, v in rendering_kwargs.items()
        },
        "num_devices": len(jax.devices()),
        "ray_shards": ray_shards,
        "lpips_pretrained": lpips_pretrained,
        "aug": {"mode": aug, "p0": aug_p, "ada_target": ada_target,
                "ada_kimg": ada_kimg},
        "neural_rendering_resolution_final": (
            neural_rendering_resolution_final or None),
        "neural_rendering_resolution_fade_kimg": (
            neural_rendering_resolution_fade_kimg),
        "style_mixing_prob": style_mixing_prob,
        # Which train/held-out partition rule produced this run's data: eval
        # numbers are only comparable across runs with the same scheme (the
        # md5 rule replaced sorted-tail slicing in r3 — a resumed pre-r3 run
        # would silently re-partition; see dataset.held_out_partition).
        "held_out_scheme": "md5-basename-v1",
    }
    options["num_processes"] = world
    if rank == 0:
        print(json.dumps(options, indent=2))
    if dry_run:
        print("Dry run -- exiting.")
        return None

    # Rank-gated run-dir I/O (reference `training_loop.py:152,161` gates on
    # rank 0); non-zero ranks still need run_dir for nothing — they skip all
    # host-side writes below.
    run_dir = pick_run_dir(outdir, dataset_name) if rank == 0 else outdir
    if rank == 0:
        with open(os.path.join(run_dir, "training_options.json"), "w") as f:
            json.dump(options, f, indent=2)
        from ..utils.logger import Logger

        Logger(os.path.join(run_dir, "log.txt"))  # tee stdout/stderr

    if objective == "eg3d":
        return _run_eg3d_training(
            g, rendering_kwargs, img_resolution, dataset_name, data,
            real_data, batch, gamma, kimg, tick, seed, run_dir, options,
            aug=aug, aug_p=aug_p, ada_target=ada_target, ada_kimg=ada_kimg,
            ray_shards=ray_shards, freezed=freezed,
            neural_rendering_resolution_final=(
                neural_rendering_resolution_final or None),
            neural_rendering_resolution_fade_kimg=(
                neural_rendering_resolution_fade_kimg),
            style_mixing_prob=style_mixing_prob,
            resume=resume, dtype=dtype,
            density_reg_every=density_reg_every,
            d_reg_interval=d_reg_interval,
            chain=chain,
            snap=snap,
            chain_dreg_split=chain_dreg_split,
        )

    # Dataset.
    if dataset_name == "synthetic":
        dataset = SyntheticDataset(resolution=img_resolution,
                                   depth_resolution=cfg.neural_rendering_resolution)
    elif dataset_name == "folder" or data.endswith(".zip"):
        dataset = ImageFolderDataset(path=data, resolution=img_resolution)
    else:
        dataset = _paired_dataset(dataset_name, data, real_data, img_resolution)
    # Each host feeds its own shard of the global batch (reference
    # `batch_gpu = batch // num_gpus`, train.py:273); single-process keeps
    # the full batch — behavior unchanged.
    assert batch % world == 0, f"batch {batch} not divisible by {world} hosts"

    # Mesh + shardings: batch over 'data', params replicated. With
    # --ray_shards > 1 the mesh gains a 'rays' axis and the in-step render
    # shards every per-ray intermediate over it (DP x SP) via a
    # with_sharding_constraint inside the step — the sharding object itself
    # stays out of the serialized config (see make_train_step).
    n_dev = len(jax.devices())
    assert n_dev % ray_shards == 0, (
        f"--ray_shards {ray_shards} must divide device count {n_dev}")
    mesh = make_mesh(data=n_dev // ray_shards, rays=ray_shards)
    rendering_overrides = None
    if ray_shards > 1:
        rendering_overrides = {
            "ray_sharding": NamedSharding(mesh, P("data", "rays", None))
        }
    repl = NamedSharding(mesh, P())

    state = init_train_state(g, enc, disc, vgg, cfg, jax.random.PRNGKey(seed))
    if lpips_pretrained:
        state = state.replace(params_vgg=params_vgg_loaded)
    resumed_best_ssim = None
    if resume:
        trees, _ = ckpt_lib.load_checkpoint(resume)
        if "train_state" in trees:
            # Full-state checkpoint (training-state-*.npz): bit-identical
            # continuation including both optimizer states and EMA.
            state, ckpt_cfg = load_train_state(resume, state)
            if ckpt_cfg and "best_ssim" in ckpt_cfg:
                resumed_best_ssim = float(ckpt_cfg["best_ssim"])
        elif "G_ema" in trees:
            state = state.replace(
                params_g=ckpt_lib.copy_params(trees["G_ema"], state.params_g),
                params_g_ema=ckpt_lib.copy_params(trees["G_ema"], state.params_g_ema),
            )
        if "E" in trees:
            state = state.replace(
                params_e=ckpt_lib.copy_params(trees["E"], state.params_e))
        if "D" in trees and disc is not None:
            state = state.replace(
                params_d=ckpt_lib.copy_params(trees["D"], state.params_d))

    opt_g, opt_d = make_optimizers(g, state.params_e, state.params_g, cfg)
    train_step = make_train_step(g, enc, disc, vgg, opt_g, opt_d, cfg,
                                 rendering_overrides=rendering_overrides)

    # The sampler is seeded from the resume position so a resumed run walks
    # a FRESH shuffle order instead of replaying the order from step 0
    # (exact data-position restore is not attempted — matches the
    # reference's params-only resume semantics, SURVEY.md 5.4).
    resume_nimg = int(np.asarray(jax.device_get(state.cur_nimg)))
    batches = data_iterator(dataset, batch_size=batch // world, rank=rank,
                            num_replicas=world, seed=seed + resume_nimg)

    state = jax.device_put(state, repl)
    example = next(batches)
    data_sh = {
        k: NamedSharding(mesh, P("data", *([None] * (np.ndim(v) - 1))))
        for k, v in example.items()
    }

    def put_batch(v, sh):
        return put_global_batch(v, sh, world)

    chain = max(int(chain), 1)
    if chain > 1:
        # K-step dispatch (make_chained_step): the donated state crosses the
        # host boundary once per K steps instead of every step. Batch leaves
        # gain a leading chain axis; 'data' sharding moves to axis 1.
        data_sh = {
            k: NamedSharding(mesh, P(None, "data", *([None] * (np.ndim(v) - 1))))
            for k, v in example.items()
        }
        step = jax.jit(make_chained_step(train_step),
                       in_shardings=(repl, data_sh, repl),
                       out_shardings=(repl, repl), donate_argnums=(0,))
    else:
        step = jax.jit(train_step, in_shardings=(repl, data_sh, repl),
                       out_shardings=(repl, repl), donate_argnums=(0,))

    # Validation + snapshots.
    validate_batch = make_validator(g, enc, cfg, vgg=vgg,
                                    lpips_pretrained=lpips_pretrained)
    val_items = [dataset[i] for i in range(min(4, len(dataset)))]
    from .dataset import collate

    val_batch = {k: jnp.asarray(v) for k, v in collate(val_items).items()
                 if k in ("condition_image", "loss_image", "loss_c")}
    if rank == 0:
        save_image_grid(np.asarray(val_batch["condition_image"], np.float32),
                        os.path.join(run_dir, "id_images.png"), drange=(0, 255))
    # Persisted with the full-state checkpoint so a resumed run does not
    # overwrite network-snapshot-best.npz with a worse first tick.
    best_ssim = resumed_best_ssim if resumed_best_ssim is not None else -100.0

    tb_writer = None
    if rank == 0:
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb_writer = SummaryWriter(run_dir)
        except Exception as err:  # pragma: no cover
            print("Skipping tfevents export:", err)

    # Preemption-safe shutdown (beyond the reference, which has no failure
    # handling — SURVEY.md 5.3): SIGTERM/SIGINT request a graceful stop; the
    # loop saves a FULL training-state checkpoint and exits cleanly, so a
    # preempted TPU run resumes bit-identically via --resume.
    import signal

    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        stop_requested["flag"] = True
        print(f"signal {signum}: finishing step, checkpointing, exiting...")

    prev_handlers = {
        s: signal.signal(s, _request_stop)
        for s in (signal.SIGTERM, signal.SIGINT)
    }

    collector = Collector()
    cur_nimg = int(np.asarray(jax.device_get(state.cur_nimg)))  # 0 unless full-state resume
    tick_idx = cur_nimg // max(tick * 1000, 1)
    tick_start = time.time()
    start = tick_start
    # Per-step noise keys are a pure function of cur_nimg, so a preempted +
    # resumed run CONTINUES the key stream where it left off instead of
    # replaying the keys from step 0.
    base_rng = jax.random.PRNGKey(seed + 1)
    pending = example
    print(f"Training for {kimg} kimg in {run_dir} ...")
    while cur_nimg < kimg * 1000 and not stop_requested["flag"]:
        if chain > 1:
            group = [pending] + [next(batches) for _ in range(chain - 1)]
            host_batch = {
                k: np.stack([np.asarray(b[k]) for b in group])
                for k in group[0]
            }
            # Same cur_nimg-keyed stream as the unchained loop: step i of the
            # chain uses fold_in(base, cur_nimg + i*batch), so resume/replay
            # semantics do not depend on the chain length.
            key = jnp.stack([
                jax.random.fold_in(base_rng, cur_nimg + i * batch)
                for i in range(chain)
            ])
        else:
            host_batch = pending
            key = jax.random.fold_in(base_rng, cur_nimg)
        batch_dev = {k: put_batch(v, data_sh[k]) for k, v in host_batch.items()}
        state, stats = step(state, batch_dev, jax.device_put(key, repl))
        pending = next(batches)
        cur_nimg += batch * chain
        stats = jax.device_get(stats)
        for name, value in stats.items():
            # Collector.report flattens tensors into [n, sum, sum_sq], so the
            # chained (K,) stat arrays accumulate identically to K scalar
            # reports — no per-index host loop needed.
            collector.report(name, value)
        if cur_nimg >= (tick_idx + 1) * tick * 1000 or cur_nimg >= kimg * 1000:
            # Recompute (don't increment): one chained dispatch can cross
            # several tick boundaries when batch*chain > tick*1000, and the
            # tick index must track kimg, not loop iterations.
            tick_idx = max(tick_idx + 1, cur_nimg // max(tick * 1000, 1))
            now = time.time()
            fields = collector.update()
            msg = " ".join(
                f"{k.split('/')[-1]} {v['mean']:.4f}" for k, v in fields.items()
            )
            # Validation metrics on the held-out grid; SSIM gates the best
            # snapshot (PSNR/perceptual logged alongside for the curves).
            val_ssim, val_psnr, val_lpips, val_images = validate_batch(
                state.params_e, state.state_e, state.params_g_ema,
                state.params_vgg, val_batch
            )
            val_ssim, val_psnr, val_lpips = (
                float(val_ssim), float(val_psnr), float(val_lpips))
            val_metrics = {"Metrics/val_ssim": val_ssim,
                           "Metrics/val_psnr": val_psnr}
            if lpips_pretrained:
                # Never log a random-VGG "perceptual" curve.
                val_metrics["Metrics/val_lpips"] = val_lpips
            if rank == 0:
                print(f"tick {tick_idx:<5d} kimg {cur_nimg / 1000:<8.1f} "
                      f"sec/tick {now - tick_start:<7.1f} val_ssim {val_ssim:.4f} "
                      f"val_psnr {val_psnr:.2f} {msg}")
                collector.write_jsonl(
                    os.path.join(run_dir, "stats.jsonl"),
                    extra={"kimg": cur_nimg / 1000, **val_metrics},
                )
            if tb_writer is not None:
                for name, v in fields.items():
                    tb_writer.add_scalar(name, v["mean"], global_step=cur_nimg)
                for name, v in val_metrics.items():
                    tb_writer.add_scalar(name, v, global_step=cur_nimg)
                tb_writer.flush()
            is_best = val_ssim > best_ssim
            best_ssim = max(best_ssim, val_ssim)
            if rank == 0:
                # Disk-full tolerance (reference `training_loop.py:562-564`).
                try:
                    if is_best:
                        save_snapshot(
                            os.path.join(run_dir, "network-snapshot-best.npz"),
                            jax.device_get(state), config=options)
                    save_snapshot(
                        os.path.join(run_dir, "network-snapshot-latest.npz"),
                        jax.device_get(state), config=options)
                    save_train_state(
                        os.path.join(run_dir, "training-state-latest.npz"),
                        state, config={**options, "best_ssim": best_ssim})
                    save_image_grid(
                        np.asarray(val_images),
                        os.path.join(run_dir, f"fakes-{cur_nimg // 1000:06d}.png"))
                    if tick_idx % cfg.snapshot_ticks == 0:
                        save_snapshot(
                            os.path.join(
                                run_dir,
                                f"network-snapshot-{cur_nimg // 1000:06d}.npz"),
                            jax.device_get(state), config=options)
                except OSError as err:
                    print(f"WARNING: snapshot write failed: {err}")
            tick_start = now
    for s, h in prev_handlers.items():
        signal.signal(s, h)
    if rank == 0:
        # Disk-full tolerance around final writes (reference swallows
        # OSError around snapshots, `training_loop.py:562-564`).
        try:
            host_state = jax.device_get(state)
            save_snapshot(os.path.join(run_dir, "network-snapshot-final.npz"),
                          host_state, config=options)
            save_train_state(
                os.path.join(run_dir, "training-state-latest.npz"),
                state, config={**options, "best_ssim": best_ssim})
        except OSError as err:
            print(f"WARNING: final snapshot failed: {err}")
        if stop_requested["flag"]:
            print(f"preempted at {cur_nimg / 1000:.1f} kimg — full state "
                  f"saved; resume with --resume "
                  f"{os.path.join(run_dir, 'training-state-latest.npz')}")
        print(f"done in {time.time() - start:.1f}s")
    return run_dir


@click.command()
@click.option("--outdir", type=str, required=True)
@click.option("--dataset_name", type=str, default="synthetic")
@click.option("--data", type=str, default="")
@click.option("--real_data", type=str, default="")
@click.option("--batch", type=int, default=8)
@click.option("--glr", type=float, default=1e-3)
@click.option("--dlr", type=float, default=8e-6)
@click.option("--gamma", type=float, default=1.0)
@click.option("--kimg", type=int, default=4000)
@click.option("--tick", type=int, default=2)
@click.option("--snap", type=int, default=50)
@click.option("--seed", type=int, default=0)
@click.option("--z_dim", type=int, default=512)
@click.option("--train_gen", type=bool, default=False)
@click.option("--train_en", type=bool, default=True)
@click.option("--gan_depth", type=bool, default=True)
@click.option("--resume", type=str, default="")
@click.option("--dry-run", "dry_run", is_flag=True, default=False)
@click.option("--gen_pose_cond", type=bool, default=False)
@click.option("--c_scale", type=float, default=1.0)
@click.option("--sr_module", type=str, default="")
@click.option("--sr_noise_mode", type=str, default="none")
@click.option("--density_reg", type=float, default=0.25)
@click.option("--decoder_lr_mul", type=float, default=1.0)
@click.option("--dtype", type=click.Choice(["fp32", "bf16"]), default="fp32",
              help="forward-pass precision (optimizers/compositing stay fp32)")
@click.option("--lpips-weights", "lpips_weights", type=str, default="",
              help="converted vgg16.pt npz (tools/convert_vgg16_lpips.py); "
                   "empty = RANDOM VGG features (loudly flagged)")
@click.option("--objective", type=click.Choice(["gnerf", "eg3d"]),
              default="gnerf",
              help="gnerf = encoder-inversion training (the live reference "
                   "loop); eg3d = adversarial (z,c)->image pretraining")
@click.option("--aug", type=click.Choice(["noaug", "ada", "fixed"]),
              default="noaug",
              help="EG3D-objective D augmentation: ada = bgc pipeline with "
                   "the r_t-feedback p controller; fixed = constant p")
@click.option("--aug_p", type=float, default=0.0,
              help="initial (ada) / constant (fixed) augmentation p")
@click.option("--freezed", type=int, default=0,
              help="Freeze-D: freeze the first N conv layers of the EG3D "
                   "discriminator (reference --freezed)")
@click.option("--ray_shards", type=int, default=1,
              help="Shard the in-step render's ray axis over this many "
                   "devices (mesh becomes (data=N/ray_shards, rays=ray_shards))")
@click.option("--neural_rendering_resolution_final",
              type=int, default=0,
              help="Fade the neural render resolution to this value "
                   "(EG3D two-stage recipe; 0 = no fade). Reference flag "
                   "train.py:185.")
@click.option("--neural_rendering_resolution_fade_kimg",
              type=float, default=1000.0,
              help="Kimg to blend the render resolution over "
                   "(reference train.py:186).")
@click.option("--style_mixing_prob", type=float, default=0.0,
              help="Style-mixing regularization probability for the EG3D "
                   "objective (reference loss.py:37).")
@click.option("--ada_target", type=float, default=0.6,
              help="ADA controller target for E[sign(D(real))]")
@click.option("--density_reg_every", type=int, default=4,
              help="lazy Greg cadence in batches (reference "
                   "--density_reg_every; <=1 fuses density reg into every "
                   "step). EG3D objective only")
@click.option("--d_reg_interval", type=int, default=16,
              help="lazy Dreg (R1) cadence in batches (reference "
                   "D_reg_interval; <=1 fuses R1 into every step). EG3D "
                   "objective only")
@click.option("--preset", type=str, default="",
              help="rendering/SR/resolution recipe override (a "
                   "RENDERING_PRESETS key; default = dataset_name's own). "
                   "E.g. --dataset_name synthetic --preset ffhq trains the "
                   "flagship 512^2/8XDC/48+48 shape on procedural data")
@click.option("--chain", type=int, default=1,
              help="Steps per dispatch (both objectives): lax.scan K "
                   "consecutive train steps inside one jitted program, so "
                   "the donated state crosses the host boundary once per K "
                   "steps. For --objective eg3d the cycle also runs the due "
                   "lazy-reg phases (lax.cond) and the ADA p controller "
                   "device-side (K must be a multiple of ada_interval). "
                   "Ticks/snapshots land on chain boundaries. NB the "
                   "kimg stop condition is checked once per chain, so a run "
                   "can overshoot the target by up to (chain-1)*batch images "
                   "(kept: a shorter tail chain would recompile the step, "
                   "which costs minutes through the relay).")
@click.option("--chain_dreg_split", type=bool, default=False,
              help="EG3D --chain form: dispatch the lazy R1 (Dreg) phase "
                   "as its own D-slice program at its due positions "
                   "instead of a lax.cond inside the cycle (the cond form "
                   "has crashed this environment's TPU worker at flagship "
                   "ADA scale). Returns only {params_d, opt_state_d}, so "
                   "the extra staging is ~25% of a full state return.")
@click.option("--ada_kimg", type=float, default=500.0,
              help="ADA controller sweep speed: kimg for a full 0->1 p "
                   "traversal (upstream ADA heuristic constant; lower = "
                   "faster adaptation)")
def main(**kwargs):
    run_training(**kwargs)


if __name__ == "__main__":
    main()
