"""Golden-value tests for the L0 ops against stock-PyTorch oracles.

The oracles are written here from the published op semantics using only
standard torch functions (pad / conv2d / grid_sample / interpolate) — the
dual-implementation testing strategy SURVEY.md section 4 calls for.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gnerf_tpu import ops


def _tp(a):
    return torch.from_numpy(np.asarray(a, dtype=np.float32))


def torch_upfirdn2d(x, f, up=1, down=1, padding=(0, 0, 0, 0), flip_filter=False, gain=1.0):
    """Oracle: zero-insert upsample, pad/crop, FIR, downsample via stock torch."""
    x = _tp(x)
    f = _tp(f)
    if f.ndim == 1:
        f = torch.outer(f, f) * np.sqrt(1.0)  # build full 2D from separable taps
        # NB: separable application == outer-product filter application.
    upx = upy = up
    downx = downy = down
    padx0, padx1, pady0, pady1 = padding
    n, c, h, w = x.shape
    y = torch.zeros(n, c, h * upy, w * upx)
    y[:, :, ::upy, ::upx] = x
    y = F.pad(y, [max(padx0, 0), max(padx1, 0), max(pady0, 0), max(pady1, 0)])
    y = y[
        :,
        :,
        max(-pady0, 0) : y.shape[2] - max(-pady1, 0),
        max(-padx0, 0) : y.shape[3] - max(-padx1, 0),
    ]
    k = f * gain
    if not flip_filter:
        k = torch.flip(k, dims=(0, 1))
    k = k[None, None].repeat(c, 1, 1, 1)
    y = F.conv2d(y, k, groups=c)
    return y[:, :, ::downy, ::downx].numpy()


@pytest.mark.parametrize("up,down,padding", [
    (1, 1, (0, 0, 0, 0)),
    (2, 1, (2, 1, 2, 1)),
    (1, 2, (1, 1, 1, 1)),
    (2, 2, (3, 2, 2, 3)),
    (1, 1, (2, -1, -1, 2)),  # negative padding = crop
    (4, 1, (3, 1, 2, 2)),
])
@pytest.mark.parametrize("flip_filter", [False, True])
def test_upfirdn2d_matches_torch(up, down, padding, flip_filter):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 12, 10).astype(np.float32)
    f = np.asarray([1.0, 3.0, 3.0, 1.0], dtype=np.float32)
    f = np.outer(f, f)
    f /= f.sum()
    got = ops.upfirdn2d(jnp.asarray(x), jnp.asarray(f), up=up, down=down,
                        padding=padding, flip_filter=flip_filter, gain=2.0)
    want = torch_upfirdn2d(x, f, up=up, down=down, padding=padding,
                           flip_filter=flip_filter, gain=2.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_separable_matches_full():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 2, 16, 16).astype(np.float32)
    taps = np.asarray([1, 3, 5, 7, 7, 5, 3, 1], dtype=np.float32)
    taps /= taps.sum()
    full = np.outer(taps, taps)
    a = ops.upfirdn2d(jnp.asarray(x), jnp.asarray(taps), up=2, padding=(3, 3, 3, 3), gain=4)
    b = ops.upfirdn2d(jnp.asarray(x), jnp.asarray(full), up=2, padding=(3, 3, 3, 3), gain=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_upfirdn2d_gradient_matches_numeric():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 1, 8, 8).astype(np.float32))
    f = ops.setup_filter([1, 3, 3, 1])

    def loss(x):
        y = ops.upfirdn2d(x, f, up=2, padding=(2, 1, 2, 1), gain=4)
        return jnp.sum(y * y)

    g_custom = jax.grad(loss)(x)
    # Numerical check on a handful of entries.
    eps = 1e-3
    for (i, j) in [(0, 0), (3, 4), (7, 7)]:
        xp = x.at[0, 0, i, j].add(eps)
        xm = x.at[0, 0, i, j].add(-eps)
        num = (loss(xp) - loss(xm)) / (2 * eps)
        np.testing.assert_allclose(g_custom[0, 0, i, j], num, rtol=1e-2, atol=1e-2)


def test_upsample2d_downsample2d_roundtrip_shapes():
    x = jnp.asarray(np.random.RandomState(3).randn(2, 4, 8, 8).astype(np.float32))
    f = ops.setup_filter([1, 3, 3, 1])
    up = ops.upsample2d(x, f)
    assert up.shape == (2, 4, 16, 16)
    down = ops.downsample2d(up, f)
    assert down.shape == (2, 4, 8, 8)
    # filter2d preserves shape
    assert ops.filter2d(x, f).shape == x.shape


def test_setup_filter_matches_reference_semantics():
    f = ops.setup_filter([1, 3, 3, 1])
    want = np.outer([1, 3, 3, 1], [1, 3, 3, 1]) / 64.0
    np.testing.assert_allclose(np.asarray(f), want, rtol=1e-6)
    f_sep = ops.setup_filter([1, 2, 3, 4, 4, 3, 2, 1])
    assert f_sep.ndim == 1  # >= 8 taps stays separable
    np.testing.assert_allclose(float(jnp.sum(f_sep)), 1.0, rtol=1e-6)


@pytest.mark.parametrize("act,gain,clamp", [
    ("linear", None, None),
    ("lrelu", None, None),
    ("lrelu", 1.0, 256.0),
    ("relu", None, None),
    ("tanh", None, None),
    ("sigmoid", None, None),
    ("softplus", None, None),
    ("swish", None, None),
    ("elu", None, None),
    ("selu", None, None),
])
def test_bias_act_matches_torch(act, gain, clamp):
    torch_fns = {
        "linear": lambda t: t,
        "relu": F.relu,
        "lrelu": lambda t: F.leaky_relu(t, 0.2),
        "tanh": torch.tanh,
        "sigmoid": torch.sigmoid,
        "elu": F.elu,
        "selu": F.selu,
        "softplus": F.softplus,
        "swish": lambda t: torch.sigmoid(t) * t,
    }
    def_gains = {"relu": np.sqrt(2), "lrelu": np.sqrt(2), "swish": np.sqrt(2)}
    rng = np.random.RandomState(4)
    x = rng.randn(3, 5, 4, 4).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    got = ops.bias_act(jnp.asarray(x), jnp.asarray(b), act=act, gain=gain, clamp=clamp)
    t = _tp(x) + _tp(b).reshape(1, -1, 1, 1)
    t = torch_fns[act](t)
    g = gain if gain is not None else def_gains.get(act, 1.0)
    t = t * g
    if clamp is not None:
        t = t.clamp(-clamp, clamp)
    # atol 1e-4: XLA-CPU and torch use different polynomial approximations for
    # the transcendentals (tanh/sigmoid/...).
    np.testing.assert_allclose(np.asarray(got), t.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("up,down,kernel,groups", [
    (1, 1, 3, 1),
    (1, 1, 1, 1),
    (2, 1, 3, 1),
    (1, 2, 3, 1),
    (1, 2, 1, 1),
    (2, 1, 3, 2),
])
def test_conv2d_resample_matches_torch(up, down, kernel, groups):
    rng = np.random.RandomState(5)
    cin, cout = 4, 6
    x = rng.randn(2, cin, 8, 8).astype(np.float32)
    w = rng.randn(cout, cin // groups, kernel, kernel).astype(np.float32)
    f = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32)
    f /= f.sum()
    padding = kernel // 2

    got = ops.conv2d_resample(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(f),
        up=up, down=down, padding=padding, groups=groups, flip_weight=(up == 1),
    )

    # Oracle built from upfirdn-oracle + stock conv2d, following the op's
    # documented padding conventions.
    fw = fh = f.shape[0]
    px0 = px1 = py0 = py1 = padding
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2
    wt = _tp(w)
    flip_weight = up == 1
    if not flip_weight and kernel > 1:
        wt = torch.flip(wt, dims=(2, 3))
    if up > 1:
        y = torch_upfirdn2d(x, f, up=up, padding=(px0, px1, py0, py1), gain=up ** 2)
        y = F.conv2d(_tp(y), wt, groups=groups).numpy()
        if down > 1:
            y = torch_upfirdn2d(y, f, down=down, padding=(0, 0, 0, 0))
    elif down > 1:
        y = torch_upfirdn2d(x, f, padding=(px0, px1, py0, py1))
        y = F.conv2d(_tp(y), wt, stride=down, groups=groups).numpy()
    else:
        y = F.conv2d(_tp(x), wt, padding=padding, groups=groups).numpy()
    np.testing.assert_allclose(np.asarray(got), y, rtol=1e-4, atol=1e-4)


def test_grid_sample_2d_matches_torch():
    rng = np.random.RandomState(6)
    feat = rng.randn(2, 8, 9, 7).astype(np.float32)
    # Include far out-of-bounds and exactly-on-border coordinates.
    coords = np.concatenate([
        rng.uniform(-1.3, 1.3, size=(2, 500, 2)),
        np.array([[[-1.0, -1.0], [1.0, 1.0], [0.0, 0.0], [2.0, 0.0]]] * 2),
    ], axis=1).astype(np.float32)
    got = ops.grid_sample_2d(jnp.asarray(feat), jnp.asarray(coords))
    want = F.grid_sample(
        _tp(feat), _tp(coords)[:, None], mode="bilinear",
        padding_mode="zeros", align_corners=False,
    )  # [B, C, 1, M]
    want = want[:, :, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_grid_sample_3d_matches_torch():
    rng = np.random.RandomState(7)
    grid = rng.randn(1, 4, 6, 5, 7).astype(np.float32)
    coords = rng.uniform(-1.2, 1.2, size=(1, 300, 3)).astype(np.float32)
    got = ops.grid_sample_3d(jnp.asarray(grid), jnp.asarray(coords))
    want = F.grid_sample(
        _tp(grid), _tp(coords).reshape(1, 1, 1, -1, 3), mode="bilinear",
        padding_mode="zeros", align_corners=False,
    )  # [N, C, 1, 1, M]
    want = want[:, :, 0, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw,antialias", [
    ((64, 64), (128, 128), True),   # SR path: upsample (antialias inert)
    ((64, 64), (128, 128), False),
    ((32, 48), (16, 24), True),     # antialiased downsample
    ((32, 48), (16, 24), False),
    ((17, 13), (23, 29), False),    # odd sizes
])
def test_interpolate_bilinear_matches_torch(in_hw, out_hw, antialias):
    rng = np.random.RandomState(8)
    x = rng.randn(2, 3, *in_hw).astype(np.float32)
    got = ops.interpolate_bilinear(jnp.asarray(x), out_hw[0], out_hw[1], antialias=antialias)
    want = F.interpolate(_tp(x), size=out_hw, mode="bilinear",
                         align_corners=False, antialias=antialias).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_filtered_lrelu_composition():
    rng = np.random.RandomState(9)
    x = rng.randn(1, 3, 8, 8).astype(np.float32)
    b = rng.randn(3).astype(np.float32)
    fu = np.asarray(ops.setup_filter([1, 3, 3, 1]))
    fd = np.asarray(ops.setup_filter([1, 3, 3, 1]))
    up, down, padding = 2, 2, (3, 3, 3, 3)
    got = ops.filtered_lrelu(
        jnp.asarray(x), jnp.asarray(fu), jnp.asarray(fd), jnp.asarray(b),
        up=up, down=down, padding=padding, gain=np.sqrt(2), slope=0.2, clamp=256,
    )
    # Oracle: the documented composition in stock torch.
    t = _tp(x) + _tp(b).reshape(1, -1, 1, 1)
    t = torch_upfirdn2d(t.numpy(), fu, up=up, padding=padding, gain=up ** 2)
    t = F.leaky_relu(_tp(t), 0.2) * np.sqrt(2)
    t = t.clamp(-256, 256)
    t = torch_upfirdn2d(t.numpy(), fd, down=down, padding=(0, 0, 0, 0))
    # Output size formula from the reference docstring.
    in_h = in_w = 8
    fu_w = fd_w = 4
    out_w = (in_w * up + 6 - (fu_w - 1) - (fd_w - 1) + (down - 1)) // down
    assert got.shape == (1, 3, out_w, out_w)
    np.testing.assert_allclose(np.asarray(got), t, rtol=1e-4, atol=1e-4)


def test_fma():
    a = jnp.ones((2, 3)) * 2
    b = jnp.ones((3,)) * 3
    c = jnp.ones((2, 3))
    np.testing.assert_allclose(np.asarray(ops.fma(a, b, c)), np.full((2, 3), 7.0))


def test_grid_sample_2d_lane_pack_bit_identical():
    """The lane-packed small-C path (P = 128 // C pixels per gather row,
    fused mask-select) is bit-identical to the unpacked row-per-pixel path
    in BOTH the forward values and the gradient wrt the feature map (its
    VJP scatters into the packed rows)."""
    rng = np.random.RandomState(11)
    for C, W in ((6, 33), (3, 7), (16, 40)):
        feat = rng.randn(2, C, 17, W).astype(np.float32)
        coords = np.concatenate([
            rng.uniform(-1.3, 1.3, size=(2, 300, 2)),
            np.array([[[-1.0, -1.0], [1.0, 1.0], [0.0, 0.0], [2.0, 0.0]]] * 2),
        ], axis=1).astype(np.float32)
        f, c = jnp.asarray(feat), jnp.asarray(coords)
        packed = ops.grid_sample_2d(f, c, lane_pack=True)
        plain = ops.grid_sample_2d(f, c, lane_pack=False)
        np.testing.assert_array_equal(np.asarray(packed), np.asarray(plain))

        cot = jnp.asarray(rng.randn(*packed.shape).astype(np.float32))
        g_packed = jax.grad(
            lambda ff: jnp.vdot(ops.grid_sample_2d(ff, c, lane_pack=True),
                                cot))(f)
        g_plain = jax.grad(
            lambda ff: jnp.vdot(ops.grid_sample_2d(ff, c, lane_pack=False),
                                cot))(f)
        np.testing.assert_allclose(np.asarray(g_packed), np.asarray(g_plain),
                                   rtol=1e-6, atol=1e-6)


def test_grid_sample_2d_cell_pack_matches_plain():
    """The cell-packed single-gather path (four half-pixel-shifted copies,
    2x2-pixel cells, P = 128 // (4C) cells per row) matches the plain path
    in forward values and feature-map gradients. Not bit-identical — the
    packed combine sums the 4 corner terms in one reduce instead of the
    lerp tree — so fp32 tolerance."""
    rng = np.random.RandomState(12)
    for C, H, W in ((6, 17, 33), (3, 8, 7), (1, 9, 11), (32, 12, 12)):
        feat = rng.randn(2, C, H, W).astype(np.float32)
        coords = np.concatenate([
            rng.uniform(-1.3, 1.3, size=(2, 300, 2)),
            np.array([[[-1.0, -1.0], [1.0, 1.0], [0.0, 0.0], [2.0, 0.0]]] * 2),
        ], axis=1).astype(np.float32)
        f, c = jnp.asarray(feat), jnp.asarray(coords)
        packed = ops.grid_sample_2d(f, c, cell_pack=True)
        plain = ops.grid_sample_2d(f, c, lane_pack=False)
        np.testing.assert_allclose(np.asarray(packed), np.asarray(plain),
                                   rtol=1e-6, atol=1e-6)

        cot = jnp.asarray(rng.randn(*packed.shape).astype(np.float32))
        g_packed = jax.grad(
            lambda ff: jnp.vdot(ops.grid_sample_2d(ff, c, cell_pack=True),
                                cot))(f)
        g_plain = jax.grad(
            lambda ff: jnp.vdot(ops.grid_sample_2d(ff, c, lane_pack=False),
                                cot))(f)
        np.testing.assert_allclose(np.asarray(g_packed), np.asarray(g_plain),
                                   rtol=1e-5, atol=1e-5)


def test_grid_sample_2d_cell_pack_coord_grads_match_plain():
    """cell_pack's custom VJP (r4: single row scatter + hand-written
    lane-friendly unpack — AD through the pack transposes materialized
    4.53 GB C-minor temps and OOMed the flagship EG3D+ADA step) must also
    return the exact bilinear COORDINATE cotangents of the plain path."""
    rng = np.random.RandomState(7)
    for C, H, W in ((6, 17, 33), (32, 12, 12)):
        feat = rng.randn(2, C, H, W).astype(np.float32)
        coords = rng.uniform(-1.2, 1.2, size=(2, 257, 2)).astype(np.float32)
        f, c = jnp.asarray(feat), jnp.asarray(coords)
        cot = jnp.asarray(
            rng.randn(2, 257, C).astype(np.float32))
        g_packed = jax.grad(
            lambda cc: jnp.vdot(ops.grid_sample_2d(f, cc, cell_pack=True),
                                cot))(c)
        g_plain = jax.grad(
            lambda cc: jnp.vdot(ops.grid_sample_2d(f, cc, lane_pack=False),
                                cot))(c)
        np.testing.assert_allclose(np.asarray(g_packed), np.asarray(g_plain),
                                   rtol=1e-4, atol=1e-4)
