"""Tests for checkpointing, stats, misc utilities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnerf_tpu.utils import checkpoint as ckpt
from gnerf_tpu.utils.misc import (
    InfiniteSampler,
    assert_shape,
    count_params,
    ema_update,
)
from gnerf_tpu.utils.stats import Collector, moments


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "a": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros((4,))},
        "c": jnp.ones(()),
    }
    path = str(tmp_path / "ckpt.npz")
    ckpt.save_checkpoint(path, {"G": tree, "E": {"x": jnp.ones((2,))}},
                         config={"z_dim": 512, "note": "hi"})
    trees, config = ckpt.load_checkpoint(path)
    assert config == {"z_dim": 512, "note": "hi"}
    np.testing.assert_allclose(np.asarray(trees["G"]["a"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    np.testing.assert_allclose(np.asarray(trees["E"]["x"]), 1.0)


def test_copy_params_shape_tolerant(capsys):
    src = {"a": np.ones((2, 2)), "b": np.ones((3,)), "extra": np.ones(1)}
    dst = {"a": np.zeros((2, 2)), "b": np.zeros((4,)), "c": np.zeros((1,))}
    out = ckpt.copy_params(src, dst)
    np.testing.assert_allclose(np.asarray(out["a"]), 1.0)   # copied
    np.testing.assert_allclose(np.asarray(out["b"]), 0.0)   # shape mismatch
    np.testing.assert_allclose(np.asarray(out["c"]), 0.0)   # missing in src


def test_torch_generator_name_mapping():
    state = {
        "backbone.mapping.fc0.weight": np.ones((4, 4)),
        "backbone.synthesis.b4.conv1.weight": np.ones((3, 3, 3, 3)),
        "backbone.synthesis.b4.resample_filter": np.ones((4, 4)),  # dropped
        "decoder.net.0.weight": np.ones((64, 32)),
        "decoder.net.2.bias": np.ones((33,)),
        "superresolution.block0.conv0.affine.weight": np.ones((32, 512)),
    }
    tree = ckpt.convert_torch_generator(state)
    assert tree["backbone"]["mapping"]["fc0"]["weight"].shape == (4, 4)
    assert tree["backbone"]["synthesis"]["b4"]["conv1"]["weight"].shape == (3, 3, 3, 3)
    assert "resample_filter" not in tree["backbone"]["synthesis"]["b4"]
    assert tree["decoder"]["fc0"]["weight"].shape == (64, 32)
    assert tree["decoder"]["fc1"]["bias"].shape == (33,)
    assert tree["superresolution"]["block0"]["conv0"]["affine"]["weight"].shape == (32, 512)


def test_assert_shape():
    x = jnp.zeros((2, 3, 4))
    assert_shape(x, (2, None, 4))
    with pytest.raises(AssertionError):
        assert_shape(x, (2, 3, 5))
    with pytest.raises(AssertionError):
        assert_shape(x, (2, 3))


def test_ema_update():
    ema = {"w": jnp.zeros((2,))}
    new = {"w": jnp.ones((2,))}
    out = ema_update(ema, new, beta=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)


def test_infinite_sampler_sharding():
    n = 10
    s0 = InfiniteSampler(n, rank=0, num_replicas=2, seed=1)
    s1 = InfiniteSampler(n, rank=1, num_replicas=2, seed=1)
    it0, it1 = iter(s0), iter(s1)
    a = [next(it0) for _ in range(20)]
    b = [next(it1) for _ in range(20)]
    assert all(0 <= i < n for i in a + b)
    # Coverage: together they eventually see every index.
    assert set(a + b) == set(range(n))


def test_stats_collector():
    c = Collector()
    c.report("Loss/x", np.array([1.0, 2.0, 3.0]))
    c.report("Loss/x", 4.0)
    out = c.update()
    assert out["Loss/x"]["num"] == 4
    np.testing.assert_allclose(out["Loss/x"]["mean"], 2.5)
    # moments() device-side triple folds in equivalently.
    m = moments(jnp.asarray([1.0, 2.0, 3.0, 4.0]))
    c2 = Collector()
    c2.report_moments("y", m)
    out2 = c2.update()
    assert out2["y"]["num"] == 4
    np.testing.assert_allclose(out2["y"]["mean"], 2.5)


def test_count_params():
    assert count_params({"a": np.zeros((2, 3)), "b": {"c": np.zeros(5)}}) == 11
