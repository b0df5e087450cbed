"""InceptionV3 FID feature net: torch-oracle parity + converter + FID.

Validates the fix for the reference's missing `metrics` package
(`/root/reference/g_nerf/train.py:31`): the JAX InceptionV3 trunk matches
a torchvision-layout torch oracle given the same (randomized) state_dict,
so pretrained torchvision weights ingested by tools/convert_inception.py
produce canonical pool-3 features."""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnerf_tpu.training.inception import (
    FEATURE_DIM,
    InceptionV3Features,
    convert_torch_inception,
    inception_conv_shapes,
)

torch = pytest.importorskip("torch")

from _inception_shim import InceptionV3Trunk  # noqa: E402


@pytest.fixture(scope="module")
def oracle_and_params():
    torch.manual_seed(0)
    net = InceptionV3Trunk().eval()
    # Randomize BN stats so the affine fold is actually exercised.
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.02)
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = convert_torch_inception(state)
    return net, params


def test_shape_table_matches_shim():
    net = InceptionV3Trunk()
    state = net.state_dict()
    for path, shape in inception_conv_shapes().items():
        assert tuple(state[f"{path}.conv.weight"].shape) == shape, path


def test_features_match_torch_oracle(oracle_and_params):
    net_t, params = oracle_and_params
    # resize_to=96 keeps CPU time sane; the trunk is the full architecture.
    feat = InceptionV3Features(resize_to=96)
    rng = np.random.RandomState(1)
    imgs = rng.rand(2, 3, 64, 64).astype(np.float32) * 2.0 - 1.0

    got = np.asarray(feat.features(params, jnp.asarray(imgs)))
    assert got.shape == (2, FEATURE_DIM)

    with torch.no_grad():
        x = torch.from_numpy(imgs)
        x = torch.nn.functional.interpolate(
            x, size=(96, 96), mode="bilinear", align_corners=False)
        x = (x + 1.0) * 0.5
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        want = net_t((x - mean) / std).numpy()

    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_init_tree_matches_converted_structure(oracle_and_params):
    _, params = oracle_and_params
    rand = InceptionV3Features().init(jax.random.PRNGKey(0))
    flat_a = jax.tree_util.tree_structure(params)
    flat_b = jax.tree_util.tree_structure(rand)
    assert flat_a == flat_b
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(rand)):
        assert a.shape == b.shape


def test_fid_with_inception_features(oracle_and_params, tmp_path):
    """End-to-end: identical streams -> FID ~ 0; shifted stream -> FID > 0;
    npz round-trip through the converter's save format."""
    from gnerf_tpu.training.inception import load_inception
    from gnerf_tpu.training.metrics import (
        feature_statistics,
        frechet_distance,
        make_inception_feature_fn,
    )
    from gnerf_tpu.utils import checkpoint as ckpt_lib

    _, params = oracle_and_params
    path = str(tmp_path / "inception.npz")
    ckpt_lib.save_checkpoint(path, {"inception": params},
                             config={"pretrained": True})
    net, loaded = load_inception(path)
    net = dataclasses.replace(net, resize_to=96)

    feature_fn = jax.jit(lambda im: net.features(loaded, im))
    rng = np.random.RandomState(2)
    a = rng.rand(8, 3, 32, 32).astype(np.float32) * 2 - 1
    b = np.clip(a + 0.5, -1, 1)

    fa = np.asarray(feature_fn(jnp.asarray(a)))
    fb = np.asarray(feature_fn(jnp.asarray(b)))
    mu_a, sig_a = feature_statistics(fa)
    mu_b, sig_b = feature_statistics(fb)
    same = frechet_distance(mu_a, sig_a, mu_a, sig_a)
    diff = frechet_distance(mu_a, sig_a, mu_b, sig_b)
    assert abs(same) < 1e-6
    assert diff > same
    # public API smoke
    fn = make_inception_feature_fn(loaded, resize_to=96)
    out = fn(jnp.asarray(a[:2]))
    assert out.shape == (2, FEATURE_DIM)
