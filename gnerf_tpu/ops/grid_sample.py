"""Bilinear grid sampling (align_corners=False, zeros padding).

This is THE hot op of the framework: every ray sample does three bilinear
tri-plane lookups through it (reference
`/root/reference/g_nerf/training/volumetric_rendering/renderer.py:55-65`
calls stock `torch.nn.functional.grid_sample`). The border math
(align_corners=False) and zeros padding are the correctness fulcrum for
pixel parity, so both are replicated exactly and golden-tested against
torch in `tests/test_ops.py` (the grid_sample_* tests).

TPU design: rather than a scatter/gather "grid" op, sampling is expressed as
four row-gathers from an [H*W, C]-flattened feature map plus a fused
weighted sum — `jnp.take` with fill keeps out-of-bounds corners zero. The
trailing C dimension stays contiguous so each gather moves whole C-sized
rows (C=32 -> 128-byte rows, a native HBM transaction). On the renderer's
hot path the PackedPlanes layout (gnerf_tpu/render/renderer.py) goes
further: one gather per bilinear footprint over 2x2-pixel 128-lane cells.
(A fused Pallas render kernel was evaluated in r3 and is an analytical dead
end — XLA already fuses the corner-weighting into the gather consumer; see
BASELINE.md.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int) -> jax.Array:
    """Map [-1, 1] grid coords to pixel coords, align_corners=False."""
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample_2d(features: jax.Array, coords: jax.Array,
                   lane_pack: bool | None = None,
                   cell_pack: bool = False) -> jax.Array:
    """Sample `features` at continuous `coords`.

    Args:
      features: [B, C, H, W] feature maps.
      coords:   [B, M, 2] sampling locations in [-1, 1]; coords[..., 0] is x
                (indexes W), coords[..., 1] is y (indexes H) — the
                torch.grid_sample convention.
      lane_pack: pack P = 128 // C consecutive x-pixels into each gather row
                (None = auto: on when C <= 16). TPU gather rows are padded
                to 128 lanes, so a small-C channels-last operand wastes
                128/C of its HBM footprint — e.g. the ADA augment warp's
                [4, 2280, 2280, 6] operand ballooned 21.3x to 9.9 GB and
                OOMed the flagship EG3D step (r4). Packing stores ~P*C of
                128 lanes (126/128 at C=6) and selects the pixel within the
                row with a fused mask-reduce. Bit-identical to the unpacked
                path (the select has one nonzero).
      cell_pack: PackedPlanes-style single-gather sampling (see
                render/renderer.py:38-92): FOUR half-pixel-shifted copies of
                the map tiled into 2x2-pixel cells so every bilinear
                footprint lies in exactly one cell of one copy — ONE
                row-gather per sample point instead of four, and the VJP is
                ONE row scatter instead of four (the renderer measured the
                packed backward 10x faster at flagship scale). Cells of
                4*C lanes are grouped 128 // (4*C) per gather row
                (120/128 occupied at C=6); the in-row cell and the 4 corner
                weights reduce in one fused multiply-sum. Costs ~4.2x the
                operand HBM of the lane_pack layout (4 copies), in exchange
                for 4x fewer gather/scatter rows — the ADA warp trade
                (~18M rows/step, BASELINE.md r4 EG3D table). Requires
                4*C <= 128; falls back to lane_pack otherwise.

    Returns:
      [B, M, C] sampled features (channels last; zeros outside the image).
    """
    B, C, H, W = features.shape
    if lane_pack is None:
        lane_pack = C <= 16
    x = _unnormalize(coords[..., 0].astype(jnp.float32), W)
    y = _unnormalize(coords[..., 1].astype(jnp.float32), H)

    if cell_pack and 4 * C <= 128:
        return _grid_sample_2d_cells(features, x, y)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    if lane_pack and 128 // C >= 2:
        P = 128 // C
        Wp = -(-W // P)  # ceil
        padded = jnp.pad(features, ((0, 0), (0, 0), (0, 0), (0, Wp * P - W)))
        # [B, H*Wp, P*C] rows: P consecutive x-pixels, channels minor.
        flat = jnp.transpose(padded, (0, 2, 3, 1)).reshape(B, H * Wp, P * C)
        lane_iota = jnp.arange(P, dtype=jnp.int32)

        def corner(ix, iy):
            inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            cell = jnp.where(inb, iy * Wp + ix // P, 0)
            g = jnp.take_along_axis(flat, cell[..., None], axis=1)
            # Select the target pixel's C lanes: multiply by the one-hot
            # pixel mask and reduce over P — fuses into the gather consumer,
            # no [B, M, P, C] temp in HBM.
            sel = (ix % P)[..., None] == lane_iota  # [B, M, P]
            sel = sel & inb[..., None]
            g = g.reshape(*g.shape[:-1], P, C)
            return jnp.sum(g * sel[..., None].astype(g.dtype), axis=-2)

    else:
        # [B, H*W, C]: gathers move contiguous C-rows.
        flat = jnp.transpose(features, (0, 2, 3, 1)).reshape(B, H * W, C)

        def corner(ix, iy):
            inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            idx = jnp.where(inb, iy * W + ix, 0)
            vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
            return vals * inb[..., None].astype(flat.dtype)

    v00 = corner(x0, y0)
    v01 = corner(x1, y0)
    v10 = corner(x0, y1)
    v11 = corner(x1, y1)

    wx = wx[..., None].astype(flat.dtype)
    wy = wy[..., None].astype(flat.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _cells_layout(C: int, H: int, W: int):
    """Static geometry of the 2x2-cell packed layout for a [*, C, H, W] map."""
    P = 128 // (4 * C)
    ky, kx = H // 2 + 1, W // 2 + 1
    kxp = -(-kx // P) * P
    nrows = 4 * ky * (kxp // P)
    return P, ky, kx, kxp, nrows


def _cells_pack(features: jax.Array) -> jax.Array:
    """Pack [B, C, H, W] into [B*nrows, P*4C] single-gather cell rows.

    Layout (mirrors render/renderer.py:75-92 pack_planes, generalized to
    C != 32 by grouping P = 128 // (4*C) cells per gather row): copy (b, a)
    of four covers footprints with y0 % 2 == b, x0 % 2 == a; row lanes are
    (slot, dy, dx, c) with slot = in-row cell index along x.
    """
    B, C, H, W = features.shape
    P, ky, kx, kxp, nrows = _cells_layout(C, H, W)
    # Zero pad: 1 left/top (x0 = -1 footprints); bottom/right so every
    # shifted slice b:b+2*ky / a:a+2*kxp is in range (and kx pads to a
    # multiple of P so P-cell rows never straddle a cell-row boundary).
    padded = jnp.pad(
        features, ((0, 0), (0, 0), (1, 2 * ky - H), (1, 2 * kxp - W)))
    copies = []
    for b in (0, 1):
        for a in (0, 1):
            sub = padded[:, :, b : b + 2 * ky, a : a + 2 * kxp]
            sub = sub.reshape(B, C, ky, 2, kxp, 2)
            # -> [B, ky, kxp, dy, dx, C]
            sub = jnp.transpose(sub, (0, 2, 4, 3, 5, 1))
            copies.append(sub.reshape(B, ky, kxp // P, P * 4 * C))
    rows_t = jnp.stack(copies, axis=1)  # [B, 4, ky, kxp//P, P*4C]
    return rows_t.reshape(B * nrows, P * 4 * C)


def _cells_unpack_grad(flat_bar: jax.Array, B: int, C: int, H: int,
                       W: int) -> jax.Array:
    """Transpose of _cells_pack: packed-row cotangents -> [B, C, H, W].

    Written by hand (not left to AD) because XLA's transpose of the pack
    materializes the four copies' gradient contributions as full-map
    C-minor tensors: at the ADA warp shape (C=6, 2280^2) each lane-pads
    21.3x to 4.53 GB and the flagship EG3D+ADA step OOMs at 23.6/15.75 GB
    (r4 OOM dump, grid_sample.py pack transposes). Here every full-map
    intermediate is W-minor (lane-dense) and the only scatter is the
    caller's single 128-lane row scatter into `flat_bar`.
    """
    P, ky, kx, kxp, nrows = _cells_layout(C, H, W)
    rows_bar = flat_bar.reshape(B, 4, ky, kxp // P, P, 2, 2, C)
    padded_bar = jnp.zeros((B, C, 2 * ky + 1, 2 * kxp + 1),
                           dtype=flat_bar.dtype)
    for i, (b, a) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        # [B, ky, kxp//P, P(slot), dy, dx, C] -> [B, ky, kxp, dy, dx, C]
        sub = rows_bar[:, i].reshape(B, ky, kxp, 2, 2, C)
        # inverse of the pack transpose (0,2,4,3,5,1)
        sub = jnp.transpose(sub, (0, 5, 1, 3, 2, 4))  # [B, C, ky, dy, kxp, dx]
        sub = sub.reshape(B, C, 2 * ky, 2 * kxp)
        padded_bar = padded_bar.at[:, :, b : b + 2 * ky,
                                   a : a + 2 * kxp].add(sub)
    return padded_bar[:, :, 1 : 1 + H, 1 : 1 + W]


def _cells_geometry(features_shape, x, y, dtype):
    """Row indices + fused corner-weight mask for the packed-cell gather."""
    B, C, H, W = features_shape
    P, ky, kx, kxp, nrows = _cells_layout(C, H, W)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(dtype)
    wy = (y - y0).astype(dtype)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    xp = x0 + 1  # padded coords; x0 = -1 -> cell column 0
    yp = y0 + 1
    a_par = xp & 1
    b_par = yp & 1
    cellx = jnp.clip((xp - a_par) >> 1, 0, kx - 1)
    celly = jnp.clip((yp - b_par) >> 1, 0, ky - 1)
    base = jnp.arange(B, dtype=jnp.int32).reshape(B, 1) * nrows
    row = base + ((b_par * 2 + a_par) * ky + celly) * (kxp // P) + cellx // P

    def mask(ix, iy):
        return ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)).astype(dtype)

    masks = (mask(x0, y0), mask(x0 + 1, y0),
             mask(x0, y0 + 1), mask(x0 + 1, y0 + 1))
    # Corner order matches the (dy, dx) lane layout.
    cw = jnp.stack([
        (1 - wx) * (1 - wy) * masks[0],
        wx * (1 - wy) * masks[1],
        (1 - wx) * wy * masks[2],
        wx * wy * masks[3],
    ], axis=-1)  # [B, M, 4]
    sel = (cellx % P)[..., None] == jnp.arange(P, dtype=jnp.int32)  # [B, M, P]
    wmat = sel[..., :, None].astype(dtype) * cw[..., None, :]  # [B, M, P, 4]
    return row, wmat, sel, (wx, wy), masks


def _cells_gather(features, x, y):
    B, C, H, W = features.shape
    P = _cells_layout(C, H, W)[0]
    flat = _cells_pack(features)
    row, wmat, sel, frac, masks = _cells_geometry(
        features.shape, x, y, features.dtype)
    g = jnp.take_along_axis(flat, row.reshape(-1)[:, None], axis=0)
    g = g.reshape(B, x.shape[1], P, 4, C)
    return g, row, wmat, sel, frac, masks


@jax.custom_vjp
def _grid_sample_2d_cells(features: jax.Array, x: jax.Array,
                          y: jax.Array) -> jax.Array:
    """Single-gather bilinear sampling via 2x2-pixel cells (cell_pack=True).

    custom_vjp: the features cotangent is ONE 128-lane row scatter into the
    packed layout + a lane-friendly manual unpack (see _cells_unpack_grad);
    pixel-coordinate cotangents are the exact bilinear derivatives (matching
    AD through the plain 4-gather path).
    """
    g, _, wmat, _, _, _ = _cells_gather(features, x, y)
    return jnp.sum(g * wmat[..., None], axis=(2, 3))


def _grid_sample_2d_cells_fwd(features, x, y):
    g, _, wmat, _, _, _ = _cells_gather(features, x, y)
    return jnp.sum(g * wmat[..., None], axis=(2, 3)), (features, x, y)


def _grid_sample_2d_cells_bwd(res, gout):
    features, x, y = res
    B, C, H, W = features.shape
    P, ky, kx, kxp, nrows = _cells_layout(C, H, W)
    # Recompute geometry (cheap scalar math) and the gathered rows (one
    # row-gather) instead of saving them: residuals stay O(inputs).
    g, row, wmat, sel, (wx, wy), masks = _cells_gather(features, x, y)
    gout = gout.astype(features.dtype)

    # d features: rows cotangent -> single row scatter -> manual unpack.
    grad_rows = gout[:, :, None, None, :] * wmat[..., None]  # [B,M,P,4,C]
    flat_bar = jnp.zeros((B * nrows, P * 4 * C), dtype=gout.dtype)
    flat_bar = flat_bar.at[row.reshape(-1)].add(
        grad_rows.reshape(-1, P * 4 * C))
    features_bar = _cells_unpack_grad(flat_bar, B, C, H, W)

    # d coords (pixel units): s_k = <g_k, gout> per corner, then the exact
    # bilinear weight derivatives (masks are constants of the coordinates).
    s = jnp.sum(g * sel[..., None, None].astype(g.dtype)
                * gout[:, :, None, None, :], axis=(2, 4))  # [B, M, 4]
    m00, m01, m10, m11 = masks
    dwx = (-s[..., 0] * (1 - wy) * m00 + s[..., 1] * (1 - wy) * m01
           - s[..., 2] * wy * m10 + s[..., 3] * wy * m11)
    dwy = (-s[..., 0] * (1 - wx) * m00 - s[..., 1] * wx * m01
           + s[..., 2] * (1 - wx) * m10 + s[..., 3] * wx * m11)
    return features_bar, dwx.astype(x.dtype), dwy.astype(y.dtype)


_grid_sample_2d_cells.defvjp(_grid_sample_2d_cells_fwd,
                             _grid_sample_2d_cells_bwd)


def grid_sample_3d(grid: jax.Array, coords: jax.Array) -> jax.Array:
    """Trilinear sampling of a dense 3D grid (align_corners=False, zeros).

    Equivalent of `sample_from_3dgrid` (reference `renderer.py:67-80`).

    Args:
      grid:   [B, C, D, H, W] voxel features.
      coords: [B, M, 3] in [-1, 1]; coords[..., 0] = x (W), [..., 1] = y (H),
              [..., 2] = z (D) — torch grid_sample 3D convention.

    Returns:
      [B, M, C].
    """
    B, C, D, H, W = grid.shape
    x = _unnormalize(coords[..., 0].astype(jnp.float32), W)
    y = _unnormalize(coords[..., 1].astype(jnp.float32), H)
    z = _unnormalize(coords[..., 2].astype(jnp.float32), D)

    x0f, y0f, z0f = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    wx, wy, wz = x - x0f, y - y0f, z - z0f
    x0, y0, z0 = x0f.astype(jnp.int32), y0f.astype(jnp.int32), z0f.astype(jnp.int32)

    flat = jnp.transpose(grid, (0, 2, 3, 4, 1)).reshape(B, D * H * W, C)

    def corner(ix, iy, iz):
        inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H) & (iz >= 0) & (iz < D)
        idx = jnp.where(inb, (iz * H + iy) * W + ix, 0)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * inb[..., None].astype(flat.dtype)

    out = 0.0
    for dz, fz in ((z0, 1 - wz), (z0 + 1, wz)):
        for dy, fy in ((y0, 1 - wy), (y0 + 1, wy)):
            for dx, fx in ((x0, 1 - wx), (x0 + 1, wx)):
                w = (fx * fy * fz)[..., None]
                out = out + corner(dx, dy, dz) * w.astype(flat.dtype)
    return out
