"""3D shape extraction: dense sigma grid -> isosurface mesh.

Capability equivalent of the reference shape path
(`/root/reference/g_nerf/gen_videos.py:189-224` + `shape_utils.py`): evaluate
sigma on a voxel grid through `sample_mixed`-style chunked queries, write an
`.mrc` volume, run isosurface extraction, write a `.ply` mesh.

TPU-native design: the grid sweep reuses ONE set of backbone planes and one
jitted chunk evaluator (the reference re-runs the backbone inside
`sample_mixed` every chunk, `triplane.py:98-102` — 13 redundant backbone
passes at 512^3/10M); chunks are a fixed static shape so there is exactly
one compilation. The grid is embarrassingly parallel: chunks can be sharded
over the mesh's data axis.

Because skimage/mrcfile/plyfile are not available in this environment, the
`.mrc` (MRC2014, mode 2) writer, the PLY writer, and the isosurface
extractor (marching tetrahedra — 6-tet cube decomposition, no large case
tables) are implemented natively here.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Sigma grid evaluation


def create_samples(N: int, cube_length: float = 2.0,
                   voxel_origin=(0, 0, 0)) -> tuple[np.ndarray, np.ndarray, float]:
    """Voxel-center sample coordinates in the reference's axis order
    (`gen_videos.py:33-55`): index = ((x * N) + y) * N + z."""
    origin = np.asarray(voxel_origin, dtype=np.float64) - cube_length / 2
    voxel_size = cube_length / (N - 1)
    idx = np.arange(N ** 3, dtype=np.int64)
    samples = np.empty((N ** 3, 3), dtype=np.float32)
    samples[:, 2] = (idx % N) * voxel_size + origin[0]
    samples[:, 1] = ((idx // N) % N) * voxel_size + origin[1]
    samples[:, 0] = ((idx // N // N) % N) * voxel_size + origin[2]
    return samples[None], origin, voxel_size


def extract_sigma_grid(
    g,
    params_g,
    ws: jax.Array,
    voxel_resolution: int = 512,
    cube_length: float = 1.0,
    max_batch: int = 1 << 20,
    apply_pad_mask: bool = True,
    mesh=None,
) -> np.ndarray:
    """[res, res, res] float32 sigma volume for one identity.

    Matches the reference post-processing: axis-0 flip + border zeroing
    (`gen_videos.py:211-221`).

    The 512³ sweep is embarrassingly parallel over points (SURVEY 3.4:
    "ideal TPU mesh sharding demo"): pass a `jax.sharding.Mesh` to shard
    each chunk's point axis over the mesh's 'data' axis with replicated
    planes — XLA runs every chip on its slice with zero collectives."""
    samples, _, _ = create_samples(voxel_resolution, cube_length)
    total = samples.shape[1]

    planes = g.backbone_planes(params_g, ws, noise_mode="const", pack=True)
    decoder = g.decoder
    opts = dict(g.rendering_kwargs)

    from ..render.renderer import run_model

    def eval_chunk_fn(planes, coords):
        dirs = jnp.zeros_like(coords).at[..., 2].set(-1.0)
        out = run_model(planes, lambda f, d: decoder.apply(params_g["decoder"], f, d),
                        coords, dirs, opts)
        return out["sigma"]

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        pts_sh = NamedSharding(mesh, P(None, "data", None))
        n_dev = mesh.devices.size
        max_batch = -(-max_batch // n_dev) * n_dev  # divisible chunks
        planes = jax.device_put(planes, repl)
        eval_chunk = jax.jit(eval_chunk_fn, in_shardings=(repl, pts_sh),
                             out_shardings=pts_sh)

        def put(chunk):
            return jax.device_put(jnp.asarray(chunk), pts_sh)
    else:
        eval_chunk = jax.jit(eval_chunk_fn)

        def put(chunk):
            return jnp.asarray(chunk)

    sigmas = np.empty((total,), dtype=np.float32)
    head = 0
    while head < total:
        chunk = samples[:, head : head + max_batch]
        n = chunk.shape[1]
        if n < max_batch:  # pad to the static shape; single compilation
            pad = np.zeros((1, max_batch - n, 3), dtype=np.float32)
            chunk = np.concatenate([chunk, pad], axis=1)
        out = np.asarray(eval_chunk(planes, put(chunk)))[0, :n, 0]
        sigmas[head : head + n] = out
        head += n

    vol = sigmas.reshape(voxel_resolution, voxel_resolution, voxel_resolution)
    vol = np.flip(vol, 0).copy()
    if apply_pad_mask:
        pad = int(30 * voxel_resolution / 256)
        pad_top = int(38 * voxel_resolution / 256)
        vol[:pad] = 0
        vol[-pad:] = 0
        vol[:, :pad] = 0
        vol[:, -pad_top:] = 0
        vol[:, :, :pad] = 0
        vol[:, :, -pad:] = 0
    return vol


# ---------------------------------------------------------------------------
# MRC2014 I/O (mode 2 = float32), minimal native implementation


def write_mrc(path: str, volume: np.ndarray, voxel_size: float = 1.0) -> None:
    vol = np.ascontiguousarray(volume, dtype=np.float32)
    nz, ny, nx = vol.shape
    header = bytearray(1024)
    struct.pack_into("<3i", header, 0, nx, ny, nz)        # NX NY NZ
    struct.pack_into("<i", header, 12, 2)                 # MODE 2 = float32
    struct.pack_into("<3i", header, 28, nx, ny, nz)       # MX MY MZ
    struct.pack_into("<3f", header, 40, nx * voxel_size, ny * voxel_size,
                     nz * voxel_size)                     # CELLA
    struct.pack_into("<3f", header, 52, 90.0, 90.0, 90.0) # CELLB
    struct.pack_into("<3i", header, 64, 1, 2, 3)          # MAPC MAPR MAPS
    struct.pack_into("<3f", header, 76, float(vol.min()), float(vol.max()),
                     float(vol.mean()))                   # DMIN DMAX DMEAN
    header[208:212] = b"MAP "                             # MAP stamp
    header[212:216] = b"\x44\x44\x00\x00"                 # little-endian stamp
    struct.pack_into("<f", header, 216, float(vol.std()))
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(vol.tobytes())


def read_mrc(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.read(1024)
        nx, ny, nz = struct.unpack_from("<3i", header, 0)
        mode = struct.unpack_from("<i", header, 12)[0]
        assert mode == 2, f"only mode-2 (float32) MRC supported, got {mode}"
        data = np.frombuffer(f.read(nx * ny * nz * 4), dtype=np.float32)
    return data.reshape(nz, ny, nx)


# ---------------------------------------------------------------------------
# Isosurface extraction: marching tetrahedra


_CUBE_TETS = np.array([
    [0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
    [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
], dtype=np.int64)

_CUBE_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], dtype=np.int64)


def marching_tetrahedra(volume: np.ndarray, level: float = 10.0,
                        spacing: float = 1.0) -> tuple[np.ndarray, np.ndarray]:
    """Isosurface of `volume` at `level` via 6-tetrahedron cube splitting.

    Returns (vertices [V, 3] float32, faces [F, 3] int64). Vectorized numpy;
    produces a watertight triangulation equivalent in capability to
    skimage's marching_cubes (used by reference `shape_utils.py:61`)."""
    vol = np.asarray(volume, dtype=np.float32)
    nz, ny, nx = vol.shape

    # Cube origin grids (exclude last voxel along each axis).
    gz, gy, gx = np.meshgrid(
        np.arange(nz - 1), np.arange(ny - 1), np.arange(nx - 1), indexing="ij"
    )
    base = np.stack([gz.ravel(), gy.ravel(), gx.ravel()], axis=1)  # [C, 3]

    # Only keep cubes that straddle the level (cheap prefilter).
    corner_vals = np.stack([
        vol[base[:, 0] + c[2], base[:, 1] + c[1], base[:, 2] + c[0]]
        for c in _CUBE_CORNERS
    ], axis=1)  # [C, 8]   (corner xyz -> index: x fastest per _CUBE_CORNERS)
    inside = corner_vals > level
    active = np.any(inside, axis=1) & ~np.all(inside, axis=1)
    base = base[active]
    corner_vals = corner_vals[active]
    if base.shape[0] == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    # Corner positions in (z, y, x) volume coordinates.
    corner_pos = base[:, None, :] + _CUBE_CORNERS[None, :, ::-1]  # [C, 8, 3]

    verts_out = []
    faces_out = []
    vert_count = 0

    for tet in _CUBE_TETS:
        v = corner_vals[:, tet]           # [C, 4]
        p = corner_pos[:, tet]            # [C, 4, 3]
        ins = v > level                   # [C, 4]
        n_in = ins.sum(axis=1)

        def edge_verts(sel, pairs):
            """Interpolated crossing points for `pairs` of local tet corners."""
            pts = []
            for a, b in pairs:
                va, vb = v[sel, a], v[sel, b]
                t = (level - va) / np.where(vb - va == 0, 1e-12, vb - va)
                t = np.clip(t, 0.0, 1.0)[:, None]
                pts.append(p[sel, a] * (1 - t) + p[sel, b] * t)
            return pts

        # Case: exactly one corner inside -> one triangle.
        for corner in range(4):
            others = [c for c in range(4) if c != corner]
            sel = (n_in == 1) & ins[:, corner]
            if not np.any(sel):
                continue
            tri = edge_verts(sel, [(corner, o) for o in others])
            n = tri[0].shape[0]
            verts_out.extend(tri)
            idx = vert_count + np.arange(n)
            faces_out.append(np.stack([idx, idx + n, idx + 2 * n], axis=1))
            vert_count += 3 * n

        # Case: exactly three corners inside -> one triangle (inverted).
        for corner in range(4):
            others = [c for c in range(4) if c != corner]
            sel = (n_in == 3) & ~ins[:, corner]
            if not np.any(sel):
                continue
            tri = edge_verts(sel, [(o, corner) for o in others])
            n = tri[0].shape[0]
            verts_out.extend(tri)
            idx = vert_count + np.arange(n)
            faces_out.append(np.stack([idx, idx + n, idx + 2 * n], axis=1))
            vert_count += 3 * n

        # Case: two inside -> quad (two triangles).
        for pair in ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)):
            a, b = pair
            others = [c for c in range(4) if c not in pair]
            sel = (n_in == 2) & ins[:, a] & ins[:, b]
            if not np.any(sel):
                continue
            # Crossings: a-o0, a-o1, b-o0, b-o1 -> quad (ao0, ao1, bo1, bo0).
            q = edge_verts(sel, [(a, others[0]), (a, others[1]),
                                 (b, others[1]), (b, others[0])])
            n = q[0].shape[0]
            verts_out.extend(q)
            idx = vert_count + np.arange(n)
            faces_out.append(np.stack([idx, idx + n, idx + 2 * n], axis=1))
            faces_out.append(np.stack([idx, idx + 2 * n, idx + 3 * n], axis=1))
            vert_count += 4 * n

    verts = np.concatenate(verts_out, axis=0).astype(np.float32) * spacing
    faces = np.concatenate(faces_out, axis=0).astype(np.int64)
    return verts, faces


# ---------------------------------------------------------------------------
# PLY writer


def write_ply(path: str, verts: np.ndarray, faces: np.ndarray,
              offset=(0.0, 0.0, 0.0), scale: float = 1.0) -> None:
    """Binary little-endian PLY (same surface as reference
    `shape_utils.py:40-100`'s plyfile output)."""
    v = (np.asarray(verts, np.float32) * scale) + np.asarray(offset, np.float32)
    f = np.asarray(faces, np.int32)
    with open(path, "wb") as fh:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(v)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(f)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        fh.write(header.encode())
        fh.write(v.astype("<f4").tobytes())
        counts = np.full((len(f), 1), 3, dtype=np.uint8)
        body = np.empty(len(f), dtype=[("n", "u1"), ("idx", "<i4", (3,))])
        body["n"] = counts[:, 0]
        body["idx"] = f
        fh.write(body.tobytes())


def convert_mrc(mrc_path: str, level: float = 10.0) -> str:
    """`.mrc` -> `.ply` (the reference shape_utils CLI flow)."""
    vol = read_mrc(mrc_path)
    verts, faces = marching_tetrahedra(vol, level=level)
    out = mrc_path.replace(".mrc", ".ply")
    write_ply(out, verts, faces)
    return out


if __name__ == "__main__":
    import click

    @click.command()
    @click.argument("mrc_files", nargs=-1)
    @click.option("--level", type=float, default=10.0)
    def main(mrc_files, level):
        for p in mrc_files:
            print(convert_mrc(p, level=level))

    main()
