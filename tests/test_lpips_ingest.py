"""LPIPS weight-ingestion parity: torch oracle -> converter -> JAX.

Builds a hand-written torch module mirroring the NVIDIA `vgg16.pt`
semantics (VGG16 features, richzhang ScalingLayer whitening, per-layer
unit-normalized features x LPIPS linear weights; `return_lpips=True`
returns embeddings whose squared distance is the LPIPS value — the
contract the reference relies on at
`/root/reference/g_nerf/training/training_loop.py:345-354`), runs it
through tools/convert_vgg16_lpips.py's mapping + calibration, and asserts
the JAX net reproduces the torch distances.

Channel counts are shrunk (the layer STRUCTURE — 13 convs, 4 pools, 5
LPIPS taps — is the real thing) so the test runs in seconds on one CPU
core; the mapping logic is channel-count agnostic.
"""

from __future__ import annotations

import numpy as np
import pytest

import gnerf_tpu.training.losses as L

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import tools.convert_vgg16_lpips as conv_tool  # noqa: E402

# Tiny VGG16-structured config: same 13-conv/4-pool layout, small channels.
TINY_CFG = (4, 4, "M", 8, 8, "M", 8, 8, 8, "M", 16, 16, 16, "M", 16, 16, 16)
TINY_CHANNELS = tuple(c for c in TINY_CFG if c != "M")
TINY_LPIPS_DIMS = tuple(TINY_CHANNELS[i] for i in L._LPIPS_LAYERS)


class TorchLPIPSOracle(nn.Module):
    """vgg16.pt-style net: [0,255] NCHW in; resize_images -> 256 bilinear
    antialias; whitening; VGG features; return_lpips -> embedding."""

    def __init__(self, seed: int = 0):
        super().__init__()
        g = torch.Generator().manual_seed(seed)
        layers = []
        in_c = 3
        for v in TINY_CFG:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                conv = nn.Conv2d(in_c, v, 3, padding=1)
                with torch.no_grad():
                    conv.weight.normal_(0.0, 0.3, generator=g)
                    conv.bias.normal_(0.0, 0.1, generator=g)
                layers.append(conv)
                layers.append(nn.ReLU(inplace=False))
                in_c = v
        self.features = nn.Sequential(*layers)
        self.lins = nn.ModuleList()
        for d in TINY_LPIPS_DIMS:
            lin = nn.Conv2d(d, 1, 1, bias=False)
            with torch.no_grad():
                lin.weight.copy_(torch.rand(1, d, 1, 1, generator=g) + 0.05)
            self.lins.append(lin)
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))

    def _feats(self, x):
        x = x / 255.0 * 2.0 - 1.0
        x = (x - self.shift) / self.scale
        feats = []
        conv_i = 0
        for m in self.features:
            x = m(x)
            if isinstance(m, nn.ReLU):
                if conv_i in L._LPIPS_LAYERS:
                    feats.append(x)
                conv_i += 1
        return feats

    def forward(self, x, resize_images: bool = False,
                return_lpips: bool = False):
        if resize_images:
            x = F.interpolate(x, size=(256, 256), mode="bilinear",
                              align_corners=False, antialias=True)
        feats = self._feats(x)
        outs = []
        for f, lin in zip(feats, self.lins):
            n, c, h, w = f.shape
            fn = f / torch.sqrt((f * f).sum(1, keepdim=True) + 1e-10)
            w_lin = lin.weight.view(1, c, 1, 1).clamp(min=0).sqrt()
            outs.append((fn * w_lin / (h * w) ** 0.5).reshape(n, -1))
        return torch.cat(outs, 1)

    def richzhang_distance(self, a, b):
        """The classic formulation: lin(conv) on squared normalized diffs,
        spatial mean, summed over layers — must equal the squared distance
        of the embeddings above."""
        da = self._feats(F.interpolate(a, size=(256, 256), mode="bilinear",
                                       align_corners=False, antialias=True))
        db = self._feats(F.interpolate(b, size=(256, 256), mode="bilinear",
                                       align_corners=False, antialias=True))
        total = torch.zeros(a.shape[0])
        for fa, fb, lin in zip(da, db, self.lins):
            na = fa / torch.sqrt((fa * fa).sum(1, keepdim=True) + 1e-10)
            nb = fb / torch.sqrt((fb * fb).sum(1, keepdim=True) + 1e-10)
            total = total + lin((na - nb) ** 2).mean((2, 3)).reshape(-1)
        return total


@pytest.fixture()
def tiny_vgg(monkeypatch):
    monkeypatch.setattr(L, "_VGG_CFG", TINY_CFG)
    monkeypatch.setattr(conv_tool, "VGG_CHANNELS", TINY_CHANNELS)
    monkeypatch.setattr(conv_tool, "LPIPS_DIMS", TINY_LPIPS_DIMS)
    return TorchLPIPSOracle()


def _rand_pair(rng, res=64, n=2):
    a = rng.rand(n, 3, res, res).astype(np.float32) * 255.0
    b = np.clip(a + rng.randn(n, 3, res, res).astype(np.float32) * 40.0,
                0.0, 255.0)
    return a, b


def test_mapping_and_calibration_reproduce_torch(tiny_vgg, tmp_path):
    sd = conv_tool.extract_tensors(tiny_vgg)
    params = conv_tool.map_params(sd)
    # Whitening buffers were discovered from the module.
    assert set(params["preprocess"]) == {"shift", "scale"}

    best = conv_tool.calibrate(tiny_vgg, params)
    assert best["resize_to"] == 256
    assert best["antialias"] is True
    assert best["calibration_err"] < 5e-3

    out = tmp_path / "lpips_tiny.npz"
    p = best.pop("_params")
    conv_tool.write_npz(str(out), p, dict(best, pretrained=True))

    net, jparams, meta = L.load_lpips(str(out))
    assert meta["pretrained"] is True
    assert net.resize_to == 256 and net.antialias is True

    rng = np.random.RandomState(3)
    a255, b255 = _rand_pair(rng, res=48, n=3)
    a = a255 / 255.0 * 2.0 - 1.0  # [-1, 1] convention of lpips_distance
    b = b255 / 255.0 * 2.0 - 1.0
    got = np.asarray(L.lpips_distance(net, jparams, a, b))
    with torch.no_grad():
        ta, tb = torch.from_numpy(a255), torch.from_numpy(b255)
        fa = tiny_vgg(ta, resize_images=True, return_lpips=True)
        fb = tiny_vgg(tb, resize_images=True, return_lpips=True)
        want_embed = (fa - fb).square().sum(1).numpy()
        want_rz = tiny_vgg.richzhang_distance(ta, tb).numpy()
    # Embedding formulation == richzhang formulation (sanity of the oracle).
    np.testing.assert_allclose(want_embed, want_rz, rtol=1e-4)
    np.testing.assert_allclose(got, want_embed, rtol=5e-3, atol=1e-5)


def test_state_dict_convert_path(tiny_vgg, tmp_path):
    pt = tmp_path / "vgg_tiny_sd.pt"
    torch.save(tiny_vgg.state_dict(), str(pt))
    out = tmp_path / "lpips_sd.npz"
    meta = conv_tool.convert(str(pt), str(out))
    assert meta["pretrained"] is True

    net, jparams, _ = L.load_lpips(str(out))
    rng = np.random.RandomState(5)
    a255, b255 = _rand_pair(rng, res=64, n=2)
    got = np.asarray(L.lpips_distance(
        net, jparams, a255 / 127.5 - 1.0, b255 / 127.5 - 1.0))
    with torch.no_grad():
        fa = tiny_vgg(torch.from_numpy(a255), resize_images=True,
                      return_lpips=True)
        fb = tiny_vgg(torch.from_numpy(b255), resize_images=True,
                      return_lpips=True)
        want = (fa - fb).square().sum(1).numpy()
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-5)


def test_random_fallback_warns(capsys):
    import jax

    net, params, pretrained = L.lpips_params_or_warn(jax.random.PRNGKey(0))
    assert not pretrained
    assert "RANDOM" in capsys.readouterr().out
    assert "conv0" in params


def test_lpips_bf16_no_silent_promotion():
    """A bf16 input must stay bf16 through the VGG feature chain (before
    r3 the fp32 conv bias promoted everything after conv0 to fp32 —
    HIGHEST-precision convs in the 'bf16' train step), while the distance
    reduction accumulates fp32 and tracks the fp32 result."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gnerf_tpu.training.losses import VGG16LPIPS, lpips_distance

    vgg = VGG16LPIPS(resize_to=32)
    p = vgg.init(jax.random.PRNGKey(0))
    a32 = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32)) * 255
    b32 = jax.random.uniform(jax.random.PRNGKey(2), (2, 3, 32, 32)) * 255

    e16 = vgg.apply(p, a32.astype(jnp.bfloat16))
    assert e16.dtype == jnp.bfloat16
    for f in vgg.features(p, a32.astype(jnp.bfloat16)):
        assert f.dtype == jnp.bfloat16

    d32 = lpips_distance(vgg, p, a32 / 127.5 - 1, b32 / 127.5 - 1)
    d16 = lpips_distance(vgg, p, (a32 / 127.5 - 1).astype(jnp.bfloat16),
                         (b32 / 127.5 - 1).astype(jnp.bfloat16))
    assert d16.dtype == jnp.float32  # fp32 accumulation
    np.testing.assert_allclose(np.asarray(d16), np.asarray(d32),
                               rtol=0.08, atol=1e-4)
