"""Tests for the native C++ image loader (vs PIL oracle)."""

import os
import subprocess

import numpy as np
import pytest

from gnerf_tpu.utils import native_loader


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=False,
                   capture_output=True)
    # Reload binding in case the .so appeared just now.
    import importlib

    importlib.reload(native_loader)
    yield


def _write_images(tmpdir, n=4, h=40, w=36):
    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        ext = "png" if i % 2 else "jpg"
        p = os.path.join(tmpdir, f"img{i}.{ext}")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    return paths


def test_native_library_builds():
    assert native_loader.native_available(), (
        "libgnerf_loader.so failed to build/load"
    )


def test_decode_matches_pil(tmp_path):
    paths = _write_images(str(tmp_path))
    from PIL import Image

    for p in paths:
        want = np.asarray(Image.open(p).convert("RGB")).transpose(2, 0, 1)
        got = native_loader.decode_image(p, want.shape[1], want.shape[2])
        np.testing.assert_array_equal(got, want)


def test_batch_loader_decode_and_flip(tmp_path):
    paths = _write_images(str(tmp_path))
    loader = native_loader.NativeImageLoader(paths, out_h=40, out_w=36, threads=2)
    batch = loader.get_batch([0, 1, 2, 3])
    assert batch.shape == (4, 3, 40, 36)
    from PIL import Image

    for i, p in enumerate(paths):
        want = np.asarray(Image.open(p).convert("RGB")).transpose(2, 0, 1)
        np.testing.assert_array_equal(batch[i], want)
    # Flips.
    flipped = loader.get_batch([0], flips=[True])
    np.testing.assert_array_equal(flipped[0], batch[0][:, :, ::-1])


def test_batch_loader_resize(tmp_path):
    paths = _write_images(str(tmp_path), h=64, w=64)
    loader = native_loader.NativeImageLoader(paths, out_h=32, out_w=32)
    batch = loader.get_batch([0, 1])
    assert batch.shape == (2, 3, 32, 32)
    # Box-downscale sanity: mean is preserved within rounding.
    from PIL import Image

    src = np.asarray(Image.open(paths[0]).convert("RGB")).astype(np.float64)
    assert abs(batch[0].mean() - src.mean()) < 2.0


def test_missing_file_zero_fill(tmp_path):
    paths = _write_images(str(tmp_path), n=1)
    loader = native_loader.NativeImageLoader(
        paths + [str(tmp_path / "missing.jpg")], out_h=40, out_w=36
    )
    if not native_loader.native_available():
        pytest.skip("native lib absent")
    batch = loader.get_batch([1])
    assert (batch == 0).all()
