"""Pivotal Tuning Inversion (PTI): per-identity generator fine-tuning.

Capability equivalent of the reference PTI harness
(`/root/reference/g_nerf/train_generator/train.py` + `training/coaches/*` +
`criteria/localitly_regulizer.py`): freeze the superresolution module, tune
the rest of G against an LPIPS (+optional L1) reconstruction of the target
image(s) at a fixed pivot latent, optionally with the "ball holder"
locality regularizer that keeps the tuned generator close to the original
in a neighborhood of the pivot.

Functional re-design: one jitted `pti_step`; the reference's broken
`training.projectors.w_projector` import (`base_coach.py:11`) has no
equivalent here because the pivot comes from the identity encoder (the
G-NeRF way) or from a user-provided ws. Single- and multi-image coaching
(reference single_id/multi_id coaches) are both just the shape of the
batch you feed.
"""

from __future__ import annotations

import dataclasses
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
        lp = L.lpips_distance(vgg, state["params_vgg"], real, synth).mean()
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
                    reg = reg + cfg.regulizer_lpips_lambda * L.lpips_distance(
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
