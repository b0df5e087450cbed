"""Tests for the inference surface: shape extraction, MRC/PLY I/O."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnerf_tpu.infer import (
    create_samples,
    extract_sigma_grid,
    marching_tetrahedra,
    read_mrc,
    write_mrc,
    write_ply,
)
from gnerf_tpu.models import TriPlaneGenerator


def test_create_samples_ordering():
    samples, origin, voxel_size = create_samples(4, cube_length=2.0)
    assert samples.shape == (1, 64, 3)
    # Reference axis order: z fastest (last column of index), x slowest.
    np.testing.assert_allclose(samples[0, 0], [-1, -1, -1], atol=1e-6)
    np.testing.assert_allclose(samples[0, 1] - samples[0, 0],
                               [0, 0, voxel_size], atol=1e-6)
    np.testing.assert_allclose(samples[0, 4] - samples[0, 0],
                               [0, voxel_size, 0], atol=1e-6)
    np.testing.assert_allclose(samples[0, 16] - samples[0, 0],
                               [voxel_size, 0, 0], atol=1e-6)
    np.testing.assert_allclose(samples[0, -1], [1, 1, 1], atol=1e-6)


def test_mrc_roundtrip(tmp_path):
    vol = np.random.RandomState(0).rand(8, 9, 10).astype(np.float32)
    path = str(tmp_path / "vol.mrc")
    write_mrc(path, vol)
    back = read_mrc(path)
    np.testing.assert_allclose(back, vol)
    # Header sanity: 1024-byte header + payload.
    assert os.path.getsize(path) == 1024 + vol.size * 4


def test_marching_tetrahedra_sphere():
    # Volume: sigma = 20 inside a radius-10 sphere, 0 outside; level 10 puts
    # the isosurface at the sphere boundary.
    n = 32
    zz, yy, xx = np.meshgrid(*([np.arange(n) - n / 2 + 0.5] * 3), indexing="ij")
    r = np.sqrt(xx ** 2 + yy ** 2 + zz ** 2)
    vol = np.where(r < 10.0, 20.0, 0.0).astype(np.float32)
    verts, faces = marching_tetrahedra(vol, level=10.0)
    assert len(verts) > 100 and len(faces) > 100
    assert faces.max() < len(verts)
    # All vertices near the sphere surface (within one voxel).
    center = np.array([n / 2 - 0.5] * 3)
    radii = np.linalg.norm(verts - center, axis=1)
    assert abs(radii.mean() - 10.0) < 1.0
    assert radii.std() < 1.0


def test_write_ply(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int64)
    path = str(tmp_path / "mesh.ply")
    write_ply(path, verts, faces)
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode()
    assert "element vertex 3" in header
    assert "element face 1" in header
    body = data[header_end:]
    assert len(body) == 3 * 12 + 1 * (1 + 12)


def test_extract_sigma_grid_tiny():
    g = TriPlaneGenerator(
        z_dim=16, w_dim=16, img_resolution=128, plane_resolution=16,
        channel_base=256, channel_max=32, mapping_layers=2,
        rendering_kwargs=dict(
            TriPlaneGenerator().rendering_kwargs,
            superresolution_module="SuperresolutionHybrid2X",
        ),
    )
    p = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16))
    ws = g.mapping(p, z, jnp.zeros((1, 25)))
    vol = extract_sigma_grid(g, p, ws, voxel_resolution=16, cube_length=1.0,
                             max_batch=1024, apply_pad_mask=False)
    assert vol.shape == (16, 16, 16)
    assert np.isfinite(vol).all()
    # Chunking must not change results: single-chunk pass agrees.
    vol2 = extract_sigma_grid(g, p, ws, voxel_resolution=16, cube_length=1.0,
                              max_batch=16 ** 3, apply_pad_mask=False)
    np.testing.assert_allclose(vol, vol2, rtol=1e-4, atol=1e-5)


def test_extract_sigma_grid_mesh_sharded():
    """Sharding the sigma sweep's point axis over an 8-device mesh must not
    change results (SURVEY 3.4's embarrassingly-parallel scale-out)."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from gnerf_tpu.parallel import make_mesh

    g = TriPlaneGenerator(
        z_dim=16, w_dim=16, img_resolution=128, plane_resolution=16,
        channel_base=256, channel_max=32, mapping_layers=2,
        rendering_kwargs=dict(
            TriPlaneGenerator().rendering_kwargs,
            superresolution_module="SuperresolutionHybrid2X",
        ),
    )
    p = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16))
    ws = g.mapping(p, z, jnp.zeros((1, 25)))
    want = extract_sigma_grid(g, p, ws, voxel_resolution=16, cube_length=1.0,
                              max_batch=1024, apply_pad_mask=False)
    got = extract_sigma_grid(g, p, ws, voxel_resolution=16, cube_length=1.0,
                             max_batch=1024, apply_pad_mask=False,
                             mesh=make_mesh(data=8))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
