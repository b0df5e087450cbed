"""Two-pass hierarchical tri-plane volume renderer.

JAX/TPU re-derivation of the reference ImportanceRenderer
(`/root/reference/g_nerf/training/volumetric_rendering/renderer.py:82-167`):
stratified coarse pass -> march for weights -> inverse-CDF fine pass ->
depth-sorted merge -> final march. Functionally pure: plane features, a
decoder callable, rays, options and an RNG key in; composited features,
depth and weight-sum out. Everything is static-shaped so the whole renderer
jits into one XLA program; the sort-merge (`unify_samples`) stays an XLA
sort + take_along_axis.

The tri-plane projection uses the EG3D-corrected orthogonal basis
(reference `generate_planes`, `renderer.py:23-37`): a point (x, y, z) in the
box projects to plane UVs (x, y), (x, z), (z, x) — derived by inverting the
reference's plane-axis matrices, then hardcoded here (no 3x3 bmm needed).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample_2d
from ..ops.precision import dot_precision
from . import math_utils
from .importance import sample_importance, sample_stratified
from .ray_marcher import march_rays

# decoder(sampled_features [N, 3, M, C], directions [N, M, 3]) ->
#   {'rgb': [N, M, C_out], 'sigma': [N, M, 1]}
Decoder = Callable[[jax.Array, jax.Array], Mapping[str, jax.Array]]


@jax.tree_util.register_pytree_node_class
class PackedPlanes(NamedTuple):
    """Tri-planes repacked for single-gather bilinear sampling.

    Four half-pixel-shifted copies of each (zero-padded) plane are tiled
    into 2x2-pixel cells of 4*C = 128 lanes, so that EVERY bilinear
    footprint (x0..x0+1, y0..y0+1) lies entirely inside exactly one cell of
    exactly one copy — one 128-lane row-gather per sample point instead of
    four 32-lane gathers (2.8x faster on the TPU gather engine).

    rows: [N*3*4*Ky*Kx, 4*C] with lane layout (dy, dx, c);
    copy (b, a) covers footprints with y0 % 2 == b, x0 % 2 == a.
    """

    rows: jax.Array
    n: int
    c: int
    h: int
    w: int

    @property
    def ky(self) -> int:
        return self.h // 2 + 1

    @property
    def kx(self) -> int:
        return self.w // 2 + 1

    # Pytree protocol: rows is the only array leaf; the dims stay static
    # under jit (they drive index arithmetic and arange shapes).
    def tree_flatten(self):
        return (self.rows,), (self.n, self.c, self.h, self.w)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def pack_planes(plane_features: jax.Array) -> PackedPlanes:
    """[N, 3, C, H, W] -> PackedPlanes (H, W even). Do this ONCE per
    identity and reuse across frames; the packing is a single reshuffle."""
    N, n_planes, C, H, W = plane_features.shape
    assert H % 2 == 0 and W % 2 == 0
    ky, kx = H // 2 + 1, W // 2 + 1
    # Zero padding: 1 left/top (for x0 = -1 footprints), 2 right/bottom.
    padded = jnp.pad(plane_features, ((0, 0), (0, 0), (0, 0), (1, 2), (1, 2)))
    copies = []
    for b in (0, 1):
        for a in (0, 1):
            sub = padded[:, :, :, b : b + 2 * ky, a : a + 2 * kx]
            sub = sub.reshape(N, n_planes, C, ky, 2, kx, 2)
            # -> [N, 3, Ky, Kx, dy, dx, C]
            sub = jnp.transpose(sub, (0, 1, 3, 5, 4, 6, 2))
            copies.append(sub.reshape(N, n_planes, ky * kx, 4 * C))
    rows = jnp.stack(copies, axis=2)  # [N, 3, 4, Ky*Kx, 4C]
    return PackedPlanes(rows.reshape(-1, 4 * C), N, C, H, W)


def _expand_corner_weights(cw: jax.Array, C: int) -> jax.Array:
    """[..., 4] per-corner weights -> [R, 4*C] lane-expanded multiplier.

    Broadcast, NOT jnp.repeat — repeat lowers to a gather that stalls
    fusion with the row-gather consumer (measured r2; both packed-sampling
    paths must keep this exact formulation)."""
    return jnp.broadcast_to(
        cw.reshape(-1, 4)[:, :, None], (cw.size // 4, 4, C)
    ).reshape(-1, 4 * C)


def sample_packed_planes(packed: PackedPlanes, coordinates: jax.Array,
                         box_warp: float, combine: str = "mxu") -> jax.Array:
    """Bilinear tri-plane sampling from PackedPlanes: one row-gather total.

    coordinates: [N, M, 3] -> [N, 3, M, C].

    combine='mxu' (default): corner weights are broadcast onto all 128
    lanes (pure fused elementwise on the gather consumer) and the 4 corner
    blocks are reduced by ONE constant one-hot matmul
    [R, 4C] @ kron(1_4, I_C) on the MXU with fp32 accumulation. The
    'lanes' variant's 32-lane static slices of the 128-lane rows force
    lane-shuffle VPU work and sub-128 minor-dim temps; measured on v5e
    (r3, 15-frame batch, 8.85M rows/pass): 65.7 ms vs 84.5 ms per pass.
    combine='lanes': per-corner [*, C] slices + weighted VPU sum (r1/r2
    formulation, kept for A/B).
    combine='mxu_barrier': 'mxu' with an optimization_barrier on the
    gathered rows — keeps XLA from fusing the weight-multiply chain into
    the gather's consumer. Probe for the measured in-program gather rate
    gap (6.8 ns/row fused vs 2.9 isolated, r3)."""
    N = coordinates.shape[0]
    n_planes, C = 3, packed.c
    H, W, ky, kx = packed.h, packed.w, packed.ky, packed.kx
    assert H == W, "packed sampling assumes square planes"
    assert packed.n in (N, 1), (
        f"planes batch {packed.n} incompatible with coords batch {N}"
    )
    M = coordinates.shape[1]
    dtype = packed.rows.dtype

    # Per-AXIS pixel coords computed once (each axis feeds two plane UVs:
    # planes use (x,y), (x,z), (z,x)) — halves the floor/frac chain vs
    # per-plane unnormalization.
    p_axis = ((2.0 / box_warp) * coordinates + 1.0) * W
    p_axis = (p_axis - 1.0) / 2.0  # [N, M, 3]
    p0f = jnp.floor(p_axis)
    w_axis = (p_axis - p0f).astype(dtype)
    i_axis = p0f.astype(jnp.int32)

    def per_plane(a):  # [N, M, 3-indexed] -> [N, 3, M]
        return jnp.stack([a[..., 0], a[..., 0], a[..., 2]], axis=1), jnp.stack(
            [a[..., 1], a[..., 2], a[..., 0]], axis=1
        )

    x0, y0 = per_plane(i_axis)
    wx, wy = per_plane(w_axis)

    xp = x0 + 1  # padded coords; footprint x0 = -1 maps to cell column 0
    yp = y0 + 1
    a = xp & 1
    b = yp & 1
    cellx = jnp.clip((xp - a) >> 1, 0, kx - 1)
    celly = jnp.clip((yp - b) >> 1, 0, ky - 1)
    if packed.n == 1 and N > 1:
        # One identity's planes shared by a batch of frames (multi-frame
        # rendering): broadcast the plane base over the coord batch.
        base = jnp.arange(n_planes, dtype=jnp.int32).reshape(1, n_planes, 1)
    else:
        base = jnp.arange(N * n_planes, dtype=jnp.int32).reshape(N, n_planes, 1)
    rows = (((base * 2 + b) * 2 + a) * ky + celly) * kx + cellx

    gathered = jnp.take_along_axis(
        packed.rows, rows.reshape(-1)[:, None], axis=0
    )  # [N*3*M, 4C], lane blocks: (y0,x0) (y0,x1) (y1,x0) (y1,x1)

    # Per-corner weights with the zeros-outside mask (padding already covers
    # +-1; mask kills far-out footprints whose cells were clamped). Combine
    # via static lane slices — pure fused VPU work, no transposes.
    def mask(ix, iy):
        return ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)).astype(dtype)

    w00 = (1 - wx) * (1 - wy) * mask(x0, y0)
    w01 = wx * (1 - wy) * mask(x0 + 1, y0)
    w10 = (1 - wx) * wy * mask(x0, y0 + 1)
    w11 = wx * wy * mask(x0 + 1, y0 + 1)

    if combine == "mxu_barrier":
        gathered = jax.lax.optimization_barrier(gathered)
        combine = "mxu"
    if combine == "mxu":
        cw = jnp.stack([w00, w01, w10, w11], axis=-1)  # [N, 3, M, 4]
        wexp = _expand_corner_weights(cw, C)
        sel = jnp.asarray(
            np.kron(np.ones((4, 1)), np.eye(C)), dtype=dtype)  # [4C, C]
        # dot_precision: fp32 planes must contract at HIGHEST (the TPU
        # DEFAULT fp32 dot quantizes operands to bf16-class); bf16 planes
        # keep the fast DEFAULT path that the A/B measured.
        out = jnp.dot(gathered * wexp, sel,
                      precision=dot_precision(dtype),
                      preferred_element_type=jnp.float32).astype(dtype)
    elif combine == "lanes":
        def wcol(w):
            return w.reshape(-1, 1)

        out = (gathered[:, 0 * C : 1 * C] * wcol(w00)
               + gathered[:, 1 * C : 2 * C] * wcol(w01)
               + gathered[:, 2 * C : 3 * C] * wcol(w10)
               + gathered[:, 3 * C : 4 * C] * wcol(w11))
    else:
        # A typo'd option must not silently fall through to the ~19 ms/pass
        # slower lane-slice path and poison A/B ablations.
        raise ValueError(f"unknown packed combine mode {combine!r} "
                         "(expected 'mxu', 'mxu_barrier' or 'lanes')")
    return out.reshape(N, n_planes, M, C)


def sample_packed_rows(packed: PackedPlanes, coordinates: jax.Array,
                       box_warp: float) -> jax.Array:
    """Point-major packed sampling for the folded decoder path.

    Same single row-gather as `sample_packed_planes`, but rows are ordered
    (batch, point, plane) and the per-corner bilinear weights are applied
    WITHOUT combining corners or averaging planes: the output
    [N*M, 12*C] (plane-major blocks of 4 corners x C channels) feeds
    `OSGDecoder.apply_rows`, whose first matmul against a 12x-tiled W1/3
    computes bilinear-combine + plane-mean + FC0 in ONE MXU pass — the
    [N,3,M,C] feature tensor (fp32, 4x lane padding in HBM) never exists.
    """
    N = coordinates.shape[0]
    n_planes, C = 3, packed.c
    H, W, ky, kx = packed.h, packed.w, packed.ky, packed.kx
    assert H == W, "packed sampling assumes square planes"
    assert packed.n in (N, 1)
    M = coordinates.shape[1]
    dtype = packed.rows.dtype

    p_axis = ((2.0 / box_warp) * coordinates + 1.0) * W
    p_axis = (p_axis - 1.0) / 2.0  # [N, M, 3]
    p0f = jnp.floor(p_axis)
    w_axis = (p_axis - p0f).astype(dtype)
    i_axis = p0f.astype(jnp.int32)

    def per_plane(a):  # [N, M, axis] -> [N, M, plane]
        return (jnp.stack([a[..., 0], a[..., 0], a[..., 2]], axis=-1),
                jnp.stack([a[..., 1], a[..., 2], a[..., 0]], axis=-1))

    x0, y0 = per_plane(i_axis)  # [N, M, 3]
    wx, wy = per_plane(w_axis)

    xp = x0 + 1
    yp = y0 + 1
    a = xp & 1
    b = yp & 1
    cellx = jnp.clip((xp - a) >> 1, 0, kx - 1)
    celly = jnp.clip((yp - b) >> 1, 0, ky - 1)
    if packed.n == 1 and N > 1:
        base = jnp.arange(n_planes, dtype=jnp.int32).reshape(1, 1, n_planes)
    else:
        base = jnp.arange(N * n_planes, dtype=jnp.int32).reshape(N, 1, n_planes)
    rows = (((base * 2 + b) * 2 + a) * ky + celly) * kx + cellx  # [N, M, 3]

    gathered = jnp.take_along_axis(
        packed.rows, rows.reshape(-1)[:, None], axis=0
    )  # [N*M*3, 4C], lane blocks (y0,x0) (y0,x1) (y1,x0) (y1,x1)

    def mask(ix, iy):
        return ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)).astype(dtype)

    w00 = (1 - wx) * (1 - wy) * mask(x0, y0)
    w01 = wx * (1 - wy) * mask(x0 + 1, y0)
    w10 = (1 - wx) * wy * mask(x0, y0 + 1)
    w11 = wx * wy * mask(x0 + 1, y0 + 1)
    cw = jnp.stack([w00, w01, w10, w11], axis=-1)  # [N, M, 3, 4]
    # XLA fuses the elementwise weighting chain into a single pass.
    weighted = gathered * _expand_corner_weights(cw, C)
    return weighted.reshape(N * M, n_planes * 4 * C)


def project_onto_planes(coordinates: jax.Array) -> jax.Array:
    """[N, M, 3] box coords -> [N, 3, M, 2] per-plane UVs (x indexes W)."""
    x, y, z = coordinates[..., 0], coordinates[..., 1], coordinates[..., 2]
    uv0 = jnp.stack([x, y], axis=-1)
    uv1 = jnp.stack([x, z], axis=-1)
    uv2 = jnp.stack([z, x], axis=-1)
    return jnp.stack([uv0, uv1, uv2], axis=1)


def sample_from_planes(
    plane_features: jax.Array,
    coordinates: jax.Array,
    box_warp: float,
) -> jax.Array:
    """Bilinearly sample the three feature planes at 3D points.

    Args:
      plane_features: [N, 3, C, H, W].
      coordinates:    [N, M, 3] world coords inside the box.
      box_warp:       side length of the tri-plane box.

    Returns:
      [N, 3, M, C] per-plane features (zeros outside the box).

    TPU note: XLA has exactly one fast gather lowering — the
    take_along_axis row-gather pattern on a 2D-ish operand, and batched
    (leading-dim) variants run ~2x slower. So ALL lookups (N batch x 3
    planes x 4 bilinear corners) are flattened into a single row-gather
    from one [N*3*H*W, C] operand; corner weights and the out-of-box zero
    mask are applied afterwards as fused elementwise work.
    """
    N, n_planes, C, H, W = plane_features.shape
    M = coordinates.shape[1]
    coords = (2.0 / box_warp) * coordinates
    uv = project_onto_planes(coords)  # [N, 3, M, 2]

    # Pixel coords, align_corners=False.
    x = ((uv[..., 0] + 1.0) * W - 1.0) / 2.0
    y = ((uv[..., 1] + 1.0) * H - 1.0) / 2.0
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f).astype(plane_features.dtype)
    wy = (y - y0f).astype(plane_features.dtype)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    # Flatten operand: row index = ((n*3 + p)*H + iy)*W + ix.
    flat = jnp.transpose(plane_features, (0, 1, 3, 4, 2)).reshape(-1, C)
    base = (
        jnp.arange(N * n_planes, dtype=jnp.int32).reshape(N, n_planes, 1) * (H * W)
    )

    def corner(ix, iy):
        inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        rows = base + jnp.where(inb, iy * W + ix, 0)
        return rows.reshape(-1), inb

    rows00, m00 = corner(x0, y0)
    rows01, m01 = corner(x0 + 1, y0)
    rows10, m10 = corner(x0, y0 + 1)
    rows11, m11 = corner(x0 + 1, y0 + 1)
    all_rows = jnp.concatenate([rows00, rows01, rows10, rows11])

    gathered = jnp.take_along_axis(
        flat, all_rows[:, None], axis=0
    ).reshape(4, N, n_planes, M, C)
    masks = jnp.stack([m00, m01, m10, m11]).astype(flat.dtype)[..., None]
    w00 = ((1 - wx) * (1 - wy))[..., None]
    w01 = (wx * (1 - wy))[..., None]
    w10 = ((1 - wx) * wy)[..., None]
    w11 = (wx * wy)[..., None]
    weights = jnp.stack([w00, w01, w10, w11])
    return jnp.sum(gathered * (weights * masks), axis=0)


def run_model(
    plane_features: Union[jax.Array, PackedPlanes],
    decoder: Decoder,
    sample_coordinates: jax.Array,
    sample_directions: jax.Array,
    options: Mapping[str, Any],
    rng: Optional[jax.Array] = None,
) -> Mapping[str, jax.Array]:
    """Tri-plane lookup + decoder MLP at arbitrary 3D points.

    Accepts raw [N, 3, C, H, W] planes or PackedPlanes (pack once per
    identity with `pack_planes` for the fast single-gather path). When the
    decoder closure carries a `rows_fn` attribute (the OSG folded path,
    `triplane.py::OSGDecoder.apply_rows`), packed planes are sampled
    point-major and bilinear-combine + plane-mean fold into the decoder's
    first matmul — the [N, 3, M, C] feature tensor never materializes."""
    rows_fn = getattr(decoder, "rows_fn", None)
    if isinstance(plane_features, PackedPlanes) and rows_fn is not None:
        N, M = sample_coordinates.shape[:2]
        rows = sample_packed_rows(
            plane_features, sample_coordinates, box_warp=options["box_warp"]
        )
        out = dict(rows_fn(rows, (N, M)))
    elif isinstance(plane_features, PackedPlanes):
        feats = sample_packed_planes(
            plane_features, sample_coordinates, box_warp=options["box_warp"],
            combine=options.get("packed_combine", "mxu"),
        )
        out = dict(decoder(feats, sample_directions))
    else:
        feats = sample_from_planes(
            plane_features, sample_coordinates, box_warp=options["box_warp"]
        )
        out = dict(decoder(feats, sample_directions))
    noise = options.get("density_noise", 0)
    if noise > 0 and rng is not None:
        out["sigma"] = out["sigma"] + jax.random.normal(rng, out["sigma"].shape) * noise
    return out


def unify_samples(depths1, colors1, densities1, depths2, colors2, densities2,
                  method: str = "hybrid"):
    """Concatenate coarse+fine samples and sort by depth along the sample axis.

    method='onehot': the depth key sorts via XLA sort; colors/densities are
    permuted with a one-hot contraction over the (tiny) sample axis, which
    runs on the MXU/VPU instead of TPU's slow row-gather engine.
    method='sort': one variadic `lax.sort` carries every payload lane
    through the sort network — EXACT (no dot rounding) and no S x S
    contraction; A/B-benchmarked against 'onehot' on real hardware
    (tools/profile_renderer.py).
    method='hybrid': the fp32 scalar lanes (depth, density) ride the sort
    network (exact, no S x S fp32 HIGHEST matrix), while the wide color
    block is permuted by ONE bf16 one-hot contraction (exact transport —
    a single nonzero per output row — at DEFAULT precision). Cuts the
    permutation-matrix HBM traffic of 'onehot' roughly in half and keeps
    the sort network narrow. Default: fastest of the three on real v5e
    (r3 A/B, tools/profile_renderer.py: 40.9 / 44.9 / 49.4 ms per
    15-frame batch for hybrid / onehot / sort, identical pixels)."""
    all_depths = jnp.concatenate([depths1, depths2], axis=-2)
    all_colors = jnp.concatenate([colors1, colors2], axis=-2)
    all_densities = jnp.concatenate([densities1, densities2], axis=-2)
    d = all_depths.shape[-1]
    c = all_colors.shape[-1]

    if method == "hybrid":
        assert d == 1 and all_densities.shape[-1] == 1, (
            "hybrid merge assumes scalar depth/density lanes"
        )
        s = all_depths.shape[-2]
        key = all_depths[..., 0]  # [N, R, S]
        iota = jax.lax.broadcasted_iota(jnp.int32, key.shape, key.ndim - 1)
        key_s, dens_s, perm = jax.lax.sort(
            (key, all_densities[..., 0], iota), dimension=-1, num_keys=1
        )
        oh = jax.nn.one_hot(perm, s, dtype=all_colors.dtype)
        colors = jnp.einsum(
            "nrij,nrjc->nric", oh, all_colors,
            precision=dot_precision(all_colors.dtype),
        )
        return key_s[..., None], colors, dens_s[..., None]

    if method == "sort":
        # [N, R, S, L] -> variadic sort of L same-shape operands keyed by
        # the depth lane, all permuted in one pass.
        payload = jnp.concatenate(
            [all_depths, all_colors, all_densities], axis=-1)
        lanes = tuple(payload[..., i] for i in range(payload.shape[-1]))
        sorted_lanes = jax.lax.sort(
            (all_depths[..., 0],) + lanes, dimension=-1, num_keys=1
        )
        payload = jnp.stack(sorted_lanes[1:], axis=-1)
    else:
        s = all_depths.shape[-2]
        idx = jnp.argsort(all_depths[..., 0], axis=-1)  # [N, R, S]
        # Split the permute by dtype: depths/densities are fp32 and need
        # Precision.HIGHEST (the default fp32 dot is bf16-class on TPU and
        # would quantize them to 1/64 steps — caught by
        # tests/test_reference_parity.py), but when colors are bf16 a
        # DEFAULT-precision bf16 one-hot contraction transports them
        # EXACTLY (single nonzero per output row) at ~6x the HIGHEST fp32
        # rate — the S x 34-lane HIGHEST einsum shrinks to S x 2.
        scalars = jnp.concatenate([all_depths, all_densities], axis=-1)
        oh32 = jax.nn.one_hot(idx, s, dtype=scalars.dtype)
        scalars = jnp.einsum("nrij,nrjc->nric", oh32, scalars,
                             precision=dot_precision(scalars.dtype))
        ohc = oh32.astype(all_colors.dtype) if all_colors.dtype != scalars.dtype else oh32
        colors = jnp.einsum("nrij,nrjc->nric", ohc, all_colors,
                            precision=dot_precision(all_colors.dtype))
        return (scalars[..., :d], colors, scalars[..., d:])
    return payload[..., :d], payload[..., d : d + c], payload[..., d + c :]


def march_merged(depths1, colors1, densities1, depths2, colors2, densities2,
                 options: Mapping[str, Any], method: str = "sort"):
    """Merge + composite without transporting colors through the sort.

    `sample_merge='weights'` (method='sort'): the midpoint compositing of
    `march_rays` is LINEAR in the sorted colors — rgb = sum_i
    w_i (c_i + c_{i+1})/2 = sum_j v_j c_sorted[j] with the 2-tap stencil
    v_j = (w_{j-1} + w_j)/2 (w_{-1} = w_{S-1} = 0). So instead of permuting
    the wide [S, C] color block (the one-hot contraction of
    'hybrid'/'onehot', or 34 payload lanes of 'sort'), sort ONLY the scalar
    lanes (depth, density, iota), march to per-sample weights v in sorted
    order, and carry v back to the ORIGINAL sample order with a second
    scalar sort keyed on the permutation. Colors are then consumed UNSORTED
    by one streaming weighted sum — no S x S one-hot matrix, no color
    transport at all. Same math as unify_samples + march_rays (fp32
    summation re-association only; march semantics mirrored from
    ray_marcher.py / reference MipRayMarcher2 `ray_marcher.py:25-57`).

    `sample_merge='ranks'` (method='count'): same algebra, but the sort
    network is replaced by STABLE RANKS from a comparison-count matrix
    (the same trick that beats vmapped searchsorted ~5x on the TPU VPU,
    cf. importance.py:110): rank_j = #{k : d_k < d_j or (d_k = d_j, k < j)}
    matches lax.sort's stable order exactly, so the permutation matrix
    one_hot(rank) transports depth/density into sorted order (2 fp32
    HIGHEST lanes — exact: one nonzero per row) and the SAME matrix used
    in the opposite direction carries the per-sample color weights v back
    to original order. Zero lax.sort, zero color transport; the S x S
    bool compare + two narrow permutation einsums are pure VPU/MXU work."""
    assert options.get("clamp_mode", "softplus") == "softplus", (
        "march_merged only supports clamp_mode='softplus'"
    )
    all_depths = jnp.concatenate([depths1, depths2], axis=-2)
    all_colors = jnp.concatenate([colors1, colors2], axis=-2)
    all_densities = jnp.concatenate([densities1, densities2], axis=-2)
    assert all_depths.shape[-1] == 1 and all_densities.shape[-1] == 1, (
        "weights merge assumes scalar depth/density lanes"
    )

    key = all_depths[..., 0].astype(jnp.float32)  # [N, R, S]
    dens = all_densities[..., 0].astype(jnp.float32)
    if method == "count":
        s = key.shape[-1]
        dj = key[..., :, None]  # [N, R, S(j), 1]
        dk = key[..., None, :]  # [N, R, 1, S(k)]
        ltri = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1) < (
            jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        )  # [S(j), S(k)]: k < j
        cmp = (dk < dj) | ((dk == dj) & ltri)
        rank = jnp.sum(cmp, axis=-1, dtype=jnp.int32)  # [N, R, S]
        # Permutation matrix P[j, i] = 1 iff sorted position of j is i.
        # fp32 transport is EXACT (single nonzero per row) but must run at
        # HIGHEST: the TPU DEFAULT fp32 dot quantizes values to bf16-class.
        oh = jax.nn.one_hot(rank, s, dtype=jnp.float32)
        scal = jnp.stack([key, dens], axis=-1)  # [N, R, S, 2]
        sorted_scal = jnp.einsum(
            "nrji,nrjc->nric", oh, scal,
            precision=jax.lax.Precision.HIGHEST)
        d_s, dens_s = sorted_scal[..., 0], sorted_scal[..., 1]
        perm = None
    else:
        iota = jax.lax.broadcasted_iota(jnp.int32, key.shape, key.ndim - 1)
        d_s, dens_s, perm = jax.lax.sort((key, dens, iota), dimension=-1,
                                         num_keys=1)

    # march_rays on the sorted scalar lanes (fp32, see ray_marcher.py).
    deltas = d_s[..., 1:] - d_s[..., :-1]
    dens_mid = jax.nn.softplus((dens_s[..., :-1] + dens_s[..., 1:]) / 2 - 1.0)
    depths_mid = (d_s[..., :-1] + d_s[..., 1:]) / 2
    alpha = 1.0 - jnp.exp(-dens_mid * deltas)
    alpha_shifted = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1)
    w = alpha * jnp.cumprod(alpha_shifted, axis=-1)[..., :-1]  # [N, R, S-1]

    # Per-sample color weights (2-tap stencil), back to original order.
    zero = jnp.zeros_like(w[..., :1])
    v = (jnp.concatenate([zero, w], axis=-1)
         + jnp.concatenate([w, zero], axis=-1)) / 2  # [N, R, S]
    if method == "count":
        # v_un[j] = v[rank_j]: the same permutation matrix, applied in the
        # sorted->original direction.
        v_un = jnp.einsum("nrji,nri->nrj", oh, v,
                          precision=jax.lax.Precision.HIGHEST)
    else:
        _, v_un = jax.lax.sort((perm, v), dimension=-1, num_keys=1)

    composite_rgb = jnp.sum(
        v_un[..., None] * all_colors.astype(jnp.float32), axis=-2)
    weight_total = jnp.sum(w, axis=-1)[..., None]
    composite_depth = jnp.sum(w * depths_mid, axis=-1)[..., None] / weight_total
    composite_depth = jnp.nan_to_num(composite_depth, nan=jnp.inf)
    composite_depth = jnp.clip(composite_depth, jnp.min(all_depths),
                               jnp.max(all_depths))

    if options.get("white_back", False):
        composite_rgb = composite_rgb + 1.0 - weight_total
    composite_rgb = composite_rgb * 2.0 - 1.0
    return composite_rgb, composite_depth, w[..., None]


def render_rays(
    plane_features: jax.Array,
    decoder: Decoder,
    ray_origins: jax.Array,
    ray_directions: jax.Array,
    options: Mapping[str, Any],
    rng: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Full two-pass hierarchical render.

    Args:
      plane_features: [N, 3, C, H, W] tri-planes from the backbone.
      decoder:        the point decoder callable.
      ray_origins / ray_directions: [N, R, 3].
      options: rendering kwargs (depth_resolution, depth_resolution_importance,
               ray_start/ray_end ('auto' or floats), box_warp, white_back,
               disparity_space_sampling, density_noise, clamp_mode).
      rng: optional PRNG key for stratified jitter / importance draws /
           density noise; None -> fully deterministic sampling.

    Returns:
      (features [N, R, C_out], depth [N, R, 1], weight_sum [N, R, 1]).

    Sequence-parallel option: `options['ray_sharding']` may hold a
    `jax.sharding.NamedSharding` for the [N, R, 3] ray tensors (e.g.
    P('data', 'rays', None) over a 2-D mesh). The constraint is applied to
    the ray origins/directions and XLA propagates it through every per-ray
    intermediate (points, gathered features, compositing), sharding the
    render over the 'rays' axis even when the rays are COMPUTED inside the
    enclosing jit (training / synthesis), where input shardings cannot
    reach them. Pass it per-call (`rendering_kwargs={'ray_sharding': ...}`)
    — a device-topology object must not be stored in the serialized
    rendering config.
    """
    keys = (
        jax.random.split(rng, 4) if rng is not None else (None, None, None, None)
    )

    ray_sharding = options.get("ray_sharding")
    if ray_sharding is not None:
        ray_origins = jax.lax.with_sharding_constraint(ray_origins, ray_sharding)
        ray_directions = jax.lax.with_sharding_constraint(
            ray_directions, ray_sharding)

    if options["ray_start"] == options["ray_end"] == "auto":
        ray_start, ray_end = math_utils.get_ray_limits_box(
            ray_origins, ray_directions, box_side_length=options["box_warp"]
        )
        is_valid = ray_end > ray_start
        # Branchless version of the reference fix-up (`renderer.py:94-96`):
        # invalid rays get start=min(valid starts) and end=max(valid STARTS)
        # — the reference's max is over ray_start too, not ray_end. When NO
        # ray is valid the reference skips the fix-up entirely (its
        # torch.any guard); mirror that by keeping the original limits.
        big = jnp.inf
        vmin = jnp.min(jnp.where(is_valid, ray_start, big))
        vmax = jnp.max(jnp.where(is_valid, ray_start, -big))
        keep = is_valid | ~jnp.any(is_valid)
        ray_start = jnp.where(keep, ray_start, vmin)
        ray_end = jnp.where(keep, ray_end, vmax)
    else:
        ray_start, ray_end = options["ray_start"], options["ray_end"]

    depths_coarse = sample_stratified(
        keys[0],
        ray_origins,
        ray_start,
        ray_end,
        options["depth_resolution"],
        options.get("disparity_space_sampling", False),
    )
    N, R, S, _ = depths_coarse.shape

    def eval_points(depths, key):
        pts = (
            ray_origins[:, :, None, :] + depths * ray_directions[:, :, None, :]
        ).reshape(N, -1, 3)
        dirs = jnp.broadcast_to(
            ray_directions[:, :, None, :], (N, R, depths.shape[2], 3)
        ).reshape(N, -1, 3)
        out = run_model(plane_features, decoder, pts, dirs, options, key)
        colors = out["rgb"].reshape(N, R, depths.shape[2], -1)
        densities = out["sigma"].reshape(N, R, depths.shape[2], 1)
        return colors, densities

    colors_coarse, densities_coarse = eval_points(depths_coarse, keys[1])

    n_imp = options["depth_resolution_importance"]
    if n_imp > 0:
        _, _, weights = march_rays(
            colors_coarse, densities_coarse, depths_coarse, options
        )
        depths_fine = sample_importance(keys[2], depths_coarse, weights, n_imp)
        colors_fine, densities_fine = eval_points(depths_fine, keys[3])
        merge = options.get("sample_merge", "hybrid")
        if merge in ("weights", "ranks"):
            rgb_final, depth_final, weights = march_merged(
                depths_coarse, colors_coarse, densities_coarse,
                depths_fine, colors_fine, densities_fine, options,
                method="count" if merge == "ranks" else "sort",
            )
        else:
            all_depths, all_colors, all_densities = unify_samples(
                depths_coarse, colors_coarse, densities_coarse,
                depths_fine, colors_fine, densities_fine,
                method=merge,
            )
            rgb_final, depth_final, weights = march_rays(
                all_colors, all_densities, all_depths, options
            )
    else:
        rgb_final, depth_final, weights = march_rays(
            colors_coarse, densities_coarse, depths_coarse, options
        )

    return rgb_final, depth_final, jnp.sum(weights, axis=2)
