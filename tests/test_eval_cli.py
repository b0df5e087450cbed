"""run_eval end-to-end: reconstruction mode (full G-NeRF snapshot with an
encoder) and generative mode (EG3D pretraining snapshot, G_ema only — the
reference's fid50k_full semantics; its own `metrics` package import is
broken, reference train.py:31)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnerf_tpu.models import ResNeXt50Encoder
from gnerf_tpu.models.triplane import TriPlaneGenerator
from gnerf_tpu.utils import checkpoint as ckpt_lib



TINY_GEN_CFG = dict(
    z_dim=16, w_dim=16, img_resolution=128, plane_resolution=16,
    channel_base=256, channel_max=32, mapping_layers=2,
    neural_rendering_resolution=8,
    rendering_kwargs=dict(
        TriPlaneGenerator().rendering_kwargs,
        superresolution_module="SuperresolutionHybrid2X",
        depth_resolution=4, depth_resolution_importance=4,
    ),
)


def _tiny_g():
    return TriPlaneGenerator(**TINY_GEN_CFG)


@pytest.mark.slow
def test_run_eval_generative_eg3d_snapshot(tmp_path, capsys):
    """An EG3D snapshot (G_ema/G/D, no encoder) must evaluate generatively:
    z sampled, poses from the dataset labels, Frechet distance over VGG
    features (loud non-canonical-FID warning without inception weights)."""
    from gnerf_tpu.training.eval import run_eval

    g = _tiny_g()
    params_g = g.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "eg3d-snap.npz")
    ckpt_lib.save_checkpoint(path, {"G_ema": params_g},
                             config={"generator": TINY_GEN_CFG})

    summary = run_eval(network=path, dataset_name="synthetic",
                       max_items=8, batch=4)
    assert "frechet_vgg" in summary
    assert np.isfinite(summary["frechet_vgg"])
    assert summary["num_items"] == 8
    assert "ssim" not in summary  # no recon metrics without an encoder
    out = capsys.readouterr().out
    assert "NOT canonical FID" in out


@pytest.mark.slow
def test_run_eval_reconstruction_snapshot(tmp_path):
    """A full snapshot (G_ema + E) evaluates encoder-conditioned
    reconstruction metrics over the held-out set."""
    from gnerf_tpu.training.eval import run_eval

    g = _tiny_g()
    params_g = g.init(jax.random.PRNGKey(0))
    enc = ResNeXt50Encoder(out_dim=g.z_dim)
    params_e, state_e = enc.init(jax.random.PRNGKey(1))
    path = str(tmp_path / "full-snap.npz")
    ckpt_lib.save_checkpoint(
        path, {"G_ema": params_g, "E": params_e, "E_state": state_e},
        config={"generator": TINY_GEN_CFG})

    summary = run_eval(network=path, dataset_name="synthetic",
                       max_items=4, batch=2)
    for k in ("psnr", "ssim", "lpips"):
        assert k in summary and np.isfinite(summary[k]), (k, summary)
    assert summary["num_items"] == 4
