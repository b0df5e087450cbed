"""Golden whole-model parity vs the reference at the SHIPPED-CHECKPOINT
config (VERDICT r2 item 1 — the last correctness hole).

The existing `test_reference_parity.py` proves pixel parity at a reduced
config (128^2, SuperresolutionHybrid2X, channel_max=64, 12+12 samples).
This file runs the flagship shape the released checkpoints use:

  * 512^2 output via SuperresolutionHybrid8XDC
    (`/root/reference/g_nerf/training/superresolution.py:267-303`),
  * full channel schedule (channel_base=32768, channel_max=512 — the
    `train.py:164-165` defaults), 256^2 x 96ch planes,
  * 96+96 doubled sampling (`gen_videos.py:127-128`),
  * the fp16 policy of `train.py:400-403` mapped to the fp32 comparison
    path: g_num_fp16_res=0 -> backbone conv_clamp=None; sr_num_fp16_res=4
    -> SR blocks carry conv_clamp=256 (applied even under force_fp32),
  * truncation_psi path and sample_mixed at this scale.

fp32 both sides, noise_mode='const', stratified jitter zeroed, det
inverse-CDF draws — the same determinism recipe as the reduced harness.
~500 GFLOP per side on one CPU core -> slow tier.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/g_nerf"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference checkout unavailable"),
]

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

Z_DIM = W_DIM = 512
CHANNEL_BASE, CHANNEL_MAX = 32768, 512
DEPTH_RES = 96  # 48 doubled for inference, gen_videos.py:127-128
TRUNCATION_PSI = 0.7
RENDER_COMMON = dict(
    image_resolution=512, disparity_space_sampling=False,
    clamp_mode="softplus", c_gen_conditioning_zero=False, c_scale=1.0,
    superresolution_noise_mode="none", density_reg=0.25,
    density_reg_p_dist=0.004, reg_type="l1", decoder_lr_mul=1.0,
    sr_antialias=True, depth_resolution=DEPTH_RES,
    depth_resolution_importance=DEPTH_RES, ray_start=2.25, ray_end=3.3,
    box_warp=1.0, avg_camera_radius=2.7, white_back=False, density_noise=0,
)


def _camera_label(batch: int) -> np.ndarray:
    from gnerf_tpu.utils import camera

    c2w = camera.lookat_sample(np.pi / 2 + 0.2, np.pi / 2 - 0.1, radius=2.7)
    c = np.asarray(camera.pose_to_label(c2w, camera.FFHQ_INTRINSICS), np.float32)
    return np.repeat(c, batch, axis=0)


@pytest.fixture(scope="module")
def golden():
    torch = pytest.importorskip("torch")
    import _torchvision_shim

    _torchvision_shim.install()
    sys.path.insert(0, REF)
    try:
        from training.triplane import TriPlaneGenerator as RefG
        from training.volumetric_rendering.renderer import (
            ImportanceRenderer as RefRenderer,
        )
    finally:
        sys.path.remove(REF)

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    rk = dict(
        RENDER_COMMON,
        superresolution_module="training.superresolution.SuperresolutionHybrid8XDC",
        avg_camera_pivot=[0, 0, 0.2],
    )
    # The exact flagship G kwargs train.py assembles (train.py:239,275-277,
    # 304,365,375-377,400-401 with all-default flags).
    G = RefG(z_dim=Z_DIM, c_dim=25, w_dim=W_DIM, img_resolution=512,
             img_channels=3, sr_num_fp16_res=4,
             mapping_kwargs={"num_layers": 2}, rendering_kwargs=rk,
             sr_kwargs={"channel_base": CHANNEL_BASE,
                        "channel_max": CHANNEL_MAX,
                        "fused_modconv_default": "inference_only",
                        "w_dim": W_DIM},
             channel_base=CHANNEL_BASE, channel_max=CHANNEL_MAX,
             num_fp16_res=0, conv_clamp=None,
             fused_modconv_default="inference_only")
    G.eval()

    c = _camera_label(1)
    z = np.random.RandomState(1).randn(1, Z_DIM).astype(np.float32)
    coords = (np.random.RandomState(5).rand(1, 1000, 3).astype(np.float32)
              * 1.2 - 0.6)
    dirs = np.random.RandomState(6).randn(1, 1000, 3).astype(np.float32)

    rand_like_orig = torch.rand_like
    pdf_orig = RefRenderer.sample_pdf
    torch.rand_like = lambda x, **kw: torch.zeros_like(x)
    RefRenderer.sample_pdf = (
        lambda self, b, w, n, det=False, eps=1e-5:
        pdf_orig(self, b, w, n, det=True, eps=eps)
    )
    try:
        with torch.no_grad():
            zt, ct = torch.from_numpy(z), torch.from_numpy(c)
            # w_avg is a nonzero buffer after manual_seed? It inits to zeros;
            # give it a nonzero value so truncation is a real interpolation.
            G.backbone.mapping.w_avg.copy_(
                torch.from_numpy(
                    np.random.RandomState(9).randn(W_DIM).astype(np.float32) * 0.1
                )
            )
            ws = G.mapping(zt, ct)
            ws_trunc = G.mapping(zt, ct, truncation_psi=TRUNCATION_PSI)
            out = G.synthesis(ws, ct, noise_mode="const", force_fp32=True)
            mixed = G.sample_mixed(torch.from_numpy(coords),
                                   torch.from_numpy(dirs), ws,
                                   noise_mode="const", force_fp32=True)
    finally:
        torch.rand_like = rand_like_orig
        RefRenderer.sample_pdf = pdf_orig

    return dict(
        z=z, c=c, coords=coords, dirs=dirs,
        ws=ws.numpy(), ws_trunc=ws_trunc.numpy(),
        image=out["image"].numpy(),
        image_raw=out["image_raw"].numpy(),
        image_depth=out["image_depth"].numpy(),
        sigma=mixed["sigma"].numpy(),
        rgb=mixed["rgb"].numpy(),
        g_state={k: v.detach().numpy() for k, v in G.state_dict().items()},
    )


@pytest.fixture(scope="module")
def ours(golden):
    import jax
    import jax.numpy as jnp

    from gnerf_tpu.models import TriPlaneGenerator
    from gnerf_tpu.utils import checkpoint as ckpt

    params = ckpt.convert_torch_generator(golden["g_state"])

    g = TriPlaneGenerator(
        z_dim=Z_DIM, c_dim=25, w_dim=W_DIM, img_resolution=512,
        sr_num_fp16_res=4, mapping_layers=2, channel_base=CHANNEL_BASE,
        channel_max=CHANNEL_MAX,
        rendering_kwargs=dict(
            RENDER_COMMON,
            superresolution_module="SuperresolutionHybrid8XDC",
            avg_camera_pivot=(0, 0, 0.2),
        ),
    )
    f0 = ckpt.flatten_tree(g.init(jax.random.PRNGKey(0)))
    f1 = ckpt.flatten_tree(params)
    assert sorted(f0) == sorted(f1)
    assert all(f0[k].shape == f1[k].shape for k in f0)

    ws = g.mapping(params, jnp.asarray(golden["z"]), jnp.asarray(golden["c"]))
    ws_trunc = g.mapping(params, jnp.asarray(golden["z"]),
                         jnp.asarray(golden["c"]),
                         truncation_psi=TRUNCATION_PSI)
    out = g.synthesis(params, ws, jnp.asarray(golden["c"]),
                      noise_mode="const", rng=None)
    mixed = g.sample_mixed(params, jnp.asarray(golden["coords"]),
                           jnp.asarray(golden["dirs"]), ws)
    return dict(ws=np.asarray(ws), ws_trunc=np.asarray(ws_trunc),
                image=np.asarray(out["image"]),
                image_raw=np.asarray(out["image_raw"]),
                image_depth=np.asarray(out["image_depth"]),
                sigma=np.asarray(mixed["sigma"]),
                rgb=np.asarray(mixed["rgb"]))


def test_flagship_mapping_and_truncation(golden, ours):
    np.testing.assert_allclose(ours["ws"], golden["ws"], atol=2e-5)
    np.testing.assert_allclose(ours["ws_trunc"], golden["ws_trunc"], atol=2e-5)
    # Truncation actually moved ws (guards a silently-ignored psi).
    assert np.abs(golden["ws"] - golden["ws_trunc"]).max() > 1e-3


def test_flagship_image_raw(golden, ours):
    np.testing.assert_allclose(ours["image_raw"], golden["image_raw"],
                               atol=2e-3)


def test_flagship_image(golden, ours):
    np.testing.assert_allclose(ours["image"], golden["image"], atol=4e-3)


def test_flagship_depth(golden, ours):
    np.testing.assert_allclose(ours["image_depth"], golden["image_depth"],
                               atol=1e-3)


def test_flagship_sample_mixed(golden, ours):
    np.testing.assert_allclose(ours["sigma"], golden["sigma"], atol=2e-3)
    np.testing.assert_allclose(ours["rgb"], golden["rgb"], atol=2e-3)
