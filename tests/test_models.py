"""Tests for the model layer (L2/L4)."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gnerf_tpu.models import (
    Discriminator,
    FullyConnectedLayer,
    Generator,
    MappingNetwork,
    OSGDecoder,
    ResNeXt50Encoder,
    SuperresolutionHybrid2X,
    SuperresolutionHybrid8XDC,
    SynthesisNetwork,
    TriPlaneGenerator,
    minibatch_std,
    modulated_conv2d,
)


def test_modulated_conv2d_matches_torch_fused_formulation():
    """Scale-activations formulation must equal the per-sample-weight
    (grouped/fused) formulation, computed here with stock torch."""
    rng = np.random.RandomState(0)
    N, I, O, k, H = 3, 6, 8, 3, 10
    x = rng.randn(N, I, H, H).astype(np.float32)
    weight = rng.randn(O, I, k, k).astype(np.float32)
    styles = rng.rand(N, I).astype(np.float32) + 0.5

    got = np.asarray(modulated_conv2d(
        jnp.asarray(x), jnp.asarray(weight), jnp.asarray(styles),
        padding=k // 2, demodulate=True,
    ))

    # Oracle: explicit per-sample modulated+demodulated weights.
    tw = torch.from_numpy(weight)[None] * torch.from_numpy(styles)[:, None, :, None, None]
    d = (tw.square().sum(dim=[2, 3, 4]) + 1e-8).rsqrt()
    tw = tw * d[:, :, None, None, None]
    outs = [
        F.conv2d(torch.from_numpy(x[i : i + 1]), tw[i], padding=k // 2)
        for i in range(N)
    ]
    want = torch.cat(outs).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_modulated_conv2d_up2_shapes_and_noise():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 8, 8), jnp.float32)
    w = jnp.asarray(rng.randn(6, 4, 3, 3), jnp.float32)
    s = jnp.asarray(rng.rand(2, 4), jnp.float32)
    from gnerf_tpu.ops import setup_filter

    f = setup_filter([1, 3, 3, 1])
    noise = jnp.asarray(rng.randn(2, 1, 16, 16), jnp.float32)
    y = modulated_conv2d(x, w, s, noise=noise, up=2, padding=1,
                         resample_filter=f, flip_weight=False)
    assert y.shape == (2, 6, 16, 16)


def test_fully_connected_equalized_lr():
    fc = FullyConnectedLayer(8, 4, lr_multiplier=0.01, bias_init=1.0)
    p = fc.init(jax.random.PRNGKey(0))
    # Stored weight is scaled up by 1/lr_mult; runtime gain returns it.
    x = jnp.ones((2, 8))
    y = fc.apply(p, x)
    want = np.asarray(x) @ (np.asarray(p["weight"]) * 0.01 / math.sqrt(8)).T + 1.0 * 0.01
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5)


def test_mapping_network_shapes_and_truncation():
    m = MappingNetwork(z_dim=16, c_dim=25, w_dim=32, num_ws=5, num_layers=2)
    p = m.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (3, 16))
    c = jax.random.normal(jax.random.PRNGKey(2), (3, 25))
    ws = m.apply(p, z, c)
    assert ws.shape == (3, 5, 32)
    # All broadcast slots identical.
    np.testing.assert_allclose(np.asarray(ws[:, 0]), np.asarray(ws[:, 4]))
    # truncation_psi=0 collapses to w_avg.
    ws0 = m.apply(p, z, c, truncation_psi=0.0)
    np.testing.assert_allclose(
        np.asarray(ws0), np.broadcast_to(np.asarray(p["w_avg"]), ws0.shape), atol=1e-6
    )
    # c actually matters (embed path wired).
    ws2 = m.apply(p, z, c + 1.0)
    assert not np.allclose(np.asarray(ws), np.asarray(ws2))


def test_synthesis_network_w_bookkeeping_and_determinism():
    net = SynthesisNetwork(w_dim=32, img_resolution=32, img_channels=6,
                           channel_base=1024, channel_max=64)
    # Resolutions 4..32 -> 4 blocks; num_ws = 1 + 2*3 + 1 = 8.
    assert net.block_resolutions == [4, 8, 16, 32]
    assert net.num_ws == 8
    p = net.init(jax.random.PRNGKey(0))
    ws = jax.random.normal(jax.random.PRNGKey(1), (2, net.num_ws, 32))
    img1 = net.apply(p, ws, noise_mode="const")
    img2 = net.apply(p, ws, noise_mode="const")
    assert img1.shape == (2, 6, 32, 32)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2))
    # noise_strength inits to 0 (StyleGAN2 semantics) so all noise modes
    # agree at init; crank it up and the modes must diverge.
    p2 = jax.tree_util.tree_map(lambda x: x, p)
    p2["b8"]["conv1"]["noise_strength"] = jnp.asarray(1.0)
    img3 = net.apply(p2, ws, noise_mode="random", rng=jax.random.PRNGKey(2))
    img4 = net.apply(p2, ws, noise_mode="const")
    img5 = net.apply(p2, ws, noise_mode="none")
    assert not np.allclose(np.asarray(img4), np.asarray(img3))
    assert not np.allclose(np.asarray(img4), np.asarray(img5))
    np.testing.assert_allclose(np.asarray(img5), np.asarray(img1))  # none == zero noise


def test_generator_end_to_end_shapes():
    g = Generator(z_dim=16, c_dim=0, w_dim=32, img_resolution=16,
                  img_channels=3, mapping_layers=2, channel_base=512,
                  channel_max=32)
    p = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    img = g.apply(p, z, None, noise_mode="const")
    assert img.shape == (2, 3, 16, 16)


def test_minibatch_std_matches_oracle():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 6, 5, 5).astype(np.float32)
    got = np.asarray(minibatch_std(jnp.asarray(x), group_size=2, num_channels=1))
    assert got.shape == (4, 7, 5, 5)
    t = torch.from_numpy(x)
    y = t.reshape(2, 2, 1, 6, 5, 5)
    y = y - y.mean(dim=0)
    y = y.square().mean(dim=0)
    y = (y + 1e-8).sqrt().mean(dim=[2, 3, 4]).reshape(-1, 1, 1, 1)
    y = y.repeat(2, 1, 5, 5)
    np.testing.assert_allclose(got[:, 6:], y.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[:, :6], x, rtol=1e-6)


def test_discriminator_shapes():
    d = Discriminator(c_dim=0, img_resolution=32, img_channels=1,
                      channel_base=1024, channel_max=64, mbstd_group_size=2)
    p = d.init(jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 32, 32))
    logits = d.apply(p, img)
    assert logits.shape == (4, 1)
    # Conditional variant.
    dc = Discriminator(c_dim=25, img_resolution=32, img_channels=1,
                       channel_base=1024, channel_max=64, mbstd_group_size=2)
    pc = dc.init(jax.random.PRNGKey(2))
    c = jax.random.normal(jax.random.PRNGKey(3), (4, 25))
    logits_c = dc.apply(pc, img, c)
    assert logits_c.shape == (4, 1)


def test_osg_decoder_semantics():
    dec = OSGDecoder(n_features=8, decoder_output_dim=8)
    p = dec.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 10, 8))
    out = dec.apply(p, feats)
    assert out["rgb"].shape == (2, 10, 8)
    assert out["sigma"].shape == (2, 10, 1)
    rgb = np.asarray(out["rgb"])
    assert rgb.min() >= -0.001 - 1e-6 and rgb.max() <= 1.001 + 1e-6
    # Plane-mean aggregation: permuting planes is invariant.
    out2 = dec.apply(p, feats[:, ::-1])
    np.testing.assert_allclose(np.asarray(out2["rgb"]), rgb, rtol=1e-5, atol=1e-6)


def test_bn_matches_torch():
    from gnerf_tpu.models.encoder import _bn_apply, _bn_init

    rng = np.random.RandomState(3)
    x = rng.randn(4, 8, 6, 6).astype(np.float32)
    p, s = _bn_init(8)
    p = {"scale": jnp.asarray(rng.rand(8).astype(np.float32) + 0.5),
         "bias": jnp.asarray(rng.randn(8).astype(np.float32))}
    s = {"mean": jnp.asarray(rng.randn(8).astype(np.float32)),
         "var": jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)}

    # Eval mode vs torch.
    y, _ = _bn_apply(p, s, jnp.asarray(x), train=False)
    want = F.batch_norm(
        torch.from_numpy(x), torch.from_numpy(np.asarray(s["mean"])),
        torch.from_numpy(np.asarray(s["var"])),
        torch.from_numpy(np.asarray(p["scale"])),
        torch.from_numpy(np.asarray(p["bias"])), training=False,
    ).numpy()
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)

    # Train mode vs torch (returns updated running stats too).
    rm = torch.from_numpy(np.asarray(s["mean"]).copy())
    rv = torch.from_numpy(np.asarray(s["var"]).copy())
    want = F.batch_norm(
        torch.from_numpy(x), rm, rv,
        torch.from_numpy(np.asarray(p["scale"])),
        torch.from_numpy(np.asarray(p["bias"])), training=True, momentum=0.1,
    ).numpy()
    y, ns = _bn_apply(p, s, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ns["mean"]), rm.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ns["var"]), rv.numpy(), rtol=1e-4, atol=1e-5)


def test_encoder_forward_shapes_and_state():
    enc = ResNeXt50Encoder(out_dim=64)
    p, s = enc.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64))
    z, ns = enc.apply(p, s, x, train=False)
    assert z.shape == (2, 64)
    # Eval mode leaves state untouched.
    assert np.allclose(np.asarray(ns["bn1"]["mean"]), np.asarray(s["bn1"]["mean"]))
    z2, ns2 = enc.apply(p, s, x, train=True)
    assert not np.allclose(np.asarray(ns2["bn1"]["mean"]), np.asarray(s["bn1"]["mean"]))


def test_encoder_groups_as_dense_matches_grouped():
    """The block-diagonal dense formulation of the grouped 3x3 conv is
    mathematically identical to feature_group_count=32 (values AND
    gradients) — it exists purely for MXU lane utilization. Compared
    per-block: across a 16-block random-init network, per-conv
    summation-order rounding is chaotically amplified by train-mode BN +
    ReLU boundary flips, so a whole-net fp32 comparison is meaningless."""
    import dataclasses as dc

    enc_g = ResNeXt50Encoder(out_dim=16, groups_as_dense=False)
    enc_d = dc.replace(enc_g, groups_as_dense=True)

    # One bottleneck per stage width (128/256/512/1024 -> 4..32 ch/group).
    for stage, planes in enumerate(enc_g._planes):
        in_c = 64 if stage == 0 else enc_g._planes[stage - 1] * 4
        p, s = enc_g._block_init(jax.random.PRNGKey(stage), in_c, planes, 2)
        x = jax.random.normal(jax.random.PRNGKey(10 + stage), (2, in_c, 8, 8))

        def loss(enc, params):
            y, _ = enc._block_apply(params, s, x, planes, 2, True, None)
            return jnp.sum(y * y)

        vg, gg = jax.value_and_grad(lambda q: loss(enc_g, q))(p)
        vd, gd = jax.value_and_grad(lambda q: loss(enc_d, q))(p)
        np.testing.assert_allclose(float(vg), float(vd), rtol=1e-5)
        fa = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gg)}
        fb = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gd)}
        assert fa.keys() == fb.keys()
        for name in fa:
            np.testing.assert_allclose(
                np.asarray(fa[name]), np.asarray(fb[name]),
                rtol=1e-4, atol=1e-4,
                err_msg=f"stage {stage} grad mismatch at {name}",
            )


def test_superresolution_2x_wiring():
    sr = SuperresolutionHybrid2X(channels=8, img_resolution=128, use_noise=True)
    p = sr.init(jax.random.PRNGKey(0))
    ws = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 512))
    # noise_mode='none' lets us drive with a small spatial size.
    rgb = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 16, 16))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 16, 16))
    img, img_raw = sr.apply(p, rgb, x, ws, noise_mode="none")
    assert img.shape == (2, 3, 32, 32)
    assert img_raw.shape == (2, 3, 16, 16)


def test_triplane_generator_tiny_end_to_end():
    g = TriPlaneGenerator(
        z_dim=32, c_dim=25, w_dim=32, img_resolution=128,
        plane_resolution=16, plane_channels=32, channel_base=512,
        channel_max=64, mapping_layers=2, neural_rendering_resolution=8,
        rendering_kwargs=dict(
            TriPlaneGenerator().rendering_kwargs,
            superresolution_module="SuperresolutionHybrid2X",
            depth_resolution=6, depth_resolution_importance=6,
        ),
    )
    p = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    from gnerf_tpu.utils import camera

    c2w = camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7)
    c = camera.pose_to_label(c2w, camera.FFHQ_INTRINSICS)
    out = g.apply(p, z, c, noise_mode="none")
    # neural res 8 -> SR 2X yields 16 raw? No: raw = block64 output at 8^2;
    # final = 2x up = 16^2.
    assert out["image_raw"].shape == (1, 3, 8, 8)
    assert out["image"].shape == (1, 3, 16, 16)
    assert out["image_depth"].shape == (1, 1, 8, 8)
    assert np.isfinite(np.asarray(out["image"])).all()
    # Deterministic with noise_mode none.
    out2 = g.apply(p, z, c, noise_mode="none")
    np.testing.assert_allclose(np.asarray(out["image"]), np.asarray(out2["image"]))
    # sample_mixed path (shape extraction).
    ws = g.mapping(p, z, c)
    pts = jax.random.uniform(jax.random.PRNGKey(2), (1, 100, 3), minval=-0.4, maxval=0.4)
    dirs = jnp.zeros((1, 100, 3)).at[..., 2].set(-1.0)
    sm = g.sample_mixed(p, pts, dirs, ws)
    assert sm["sigma"].shape == (1, 100, 1)
    # Plane caching path: planes computed once, reused across two cameras.
    planes = g.backbone_planes(p, ws, noise_mode="none")
    o1 = g.render_planes(p, planes, c, ws, noise_mode="none")
    np.testing.assert_allclose(np.asarray(o1["image"]), np.asarray(out["image"]),
                               rtol=1e-4, atol=1e-5)


def test_encoder_stage_taps():
    """`stages` early-exit returns the stem/stage feature maps with the
    torchvision ResNeXt50 downsampling schedule (feature-tap API used by
    the train profiler for per-stage cost attribution)."""
    import jax

    from gnerf_tpu.models import ResNeXt50Encoder

    enc = ResNeXt50Encoder(out_dim=8)
    params, state = enc.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 3, 64, 64))
    want = {0: (2, 64, 16, 16), 1: (2, 256, 16, 16), 2: (2, 512, 8, 8),
            3: (2, 1024, 4, 4), 4: (2, 2048, 2, 2)}
    for k, shape in want.items():
        feat, _ = enc.apply(params, state, x, train=False, stages=k)
        assert feat.shape == shape, (k, feat.shape)
    z, _ = enc.apply(params, state, x, train=False)
    assert z.shape == (2, 8)


def test_encoder_bf16_no_silent_promotion():
    """A bf16 input must stay bf16 end-to-end through the encoder (train
    AND eval): before r3, the fp32 BatchNorm affine params promoted every
    activation after the first BN to fp32, so the "bf16" encoder silently
    ran fp32 convs at HIGHEST precision (~36% of the flagship train step).
    Also checks the bf16 output tracks the fp32 one."""
    enc = ResNeXt50Encoder(out_dim=64)
    p, s = enc.init(jax.random.PRNGKey(0))
    x32 = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64))
    x16 = x32.astype(jnp.bfloat16)

    for train in (True, False):
        z16, ns = enc.apply(p, s, x16, train=train)
        assert z16.dtype == jnp.bfloat16, (train, z16.dtype)
        # Intermediate taps too (the promotion happened mid-network).
        for st in (0, 2):
            f, _ = enc.apply(p, s, x16, train=train, stages=st)
            assert f.dtype == jnp.bfloat16, (train, st, f.dtype)
        # Running stats stay fp32.
        for leaf in jax.tree_util.tree_leaves(ns):
            assert leaf.dtype == jnp.float32

    # Numerical sanity: the bf16 path must track fp32 closely at an early
    # tap (one stage: cos > 0.99); through all 50 random-init conv/BN
    # layers rounding amplifies (trained nets are far more stable —
    # convergence in bf16 is covered by test_train_resume), so the final
    # latent only gets a direction check.
    def cos(a, b):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        return float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))

    f32, _ = enc.apply(p, s, x32, train=True, stages=1)
    f16, _ = enc.apply(p, s, x16, train=True, stages=1)
    assert cos(f32, f16) > 0.99
    z32, _ = enc.apply(p, s, x32, train=True)
    z16, _ = enc.apply(p, s, x16, train=True)
    assert cos(z32, z16) > 0.5
