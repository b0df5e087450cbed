"""Tests for the on-disk dataset loaders (fabricated layouts) and metrics."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnerf_tpu.training import (
    Afhqv2Dataset,
    FFHQGenDataset,
    ShapeNetDataset,
    TestDataset,
    VGG16LPIPS,
    collate,
)
from gnerf_tpu.training.metrics import (
    feature_statistics,
    frechet_distance,
    frechet_feature_distance,
    make_vgg_feature_fn,
    psnr,
    reconstruction_metrics,
)


def _write_img(path, h=32, w=32, seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(path)


def _label():
    return list(np.eye(4).flatten().astype(float)) + list(
        np.asarray([[4.26, 0, 0.5], [0, 4.26, 0.5], [0, 0, 1]]).flatten()
    )


def _make_gen_pairs(root, ids=("00001", "00002"), per_id_dirs=True):
    os.makedirs(root, exist_ok=True)
    poses = {}
    depths = {}
    for i, name in enumerate(ids):
        d = os.path.join(root, name) if per_id_dirs else os.path.join(root, f"dir{i}")
        os.makedirs(d, exist_ok=True)
        f = os.path.join(d, f"{name}_f.jpg")
        s = os.path.join(d, f"{name}_s.jpg")
        _write_img(f, seed=i)
        _write_img(s, seed=100 + i)
        poses[f"{name}_f.json"] = _label()
        poses[f"{name}_s.json"] = _label()
        depths[f"{name}_f"] = np.random.rand(1, 16, 16).astype(np.float32)
        depths[f"{name}_s"] = np.random.rand(1, 16, 16).astype(np.float32)
    with open(os.path.join(root, "pose_labels.json"), "w") as fh:
        json.dump(poses, fh)
    np.save(os.path.join(root, "depth_images.npy"), depths, allow_pickle=True)


def _make_real_ffhq(root, n=4):
    os.makedirs(os.path.join(root, "cropped_image"), exist_ok=True)
    os.makedirs(os.path.join(root, "label"), exist_ok=True)
    labels = {}
    for i in range(n):
        name = f"{i:05d}.jpg"
        _write_img(os.path.join(root, "cropped_image", name), seed=200 + i)
        labels[name.replace(".jpg", ".png")] = _label()
    with open(os.path.join(root, "label", "labels.json"), "w") as fh:
        json.dump(labels, fh)


def test_ffhq_gen_dataset(tmp_path):
    gen_root = str(tmp_path / "gen")
    real_root = str(tmp_path / "real")
    _make_gen_pairs(gen_root)
    _make_real_ffhq(real_root)
    ds = FFHQGenDataset(path=gen_root, real_path=real_root, held_out=1, seed=0,
                        resolution=32)
    assert len(ds) >= 2
    for idx in range(4):
        item = ds[idx]
        assert set(FFHQGenDataset.ITEM_KEYS) <= set(item.keys())
        assert item["condition_image"].shape == (3, 32, 32)
        assert item["condition_c"].shape == (25,)
        assert item["c_depth_image"].shape == (1, 16, 16)
        assert item["factor"] in (0.0, 1.0)
    batch = collate([ds[0], ds[1]])
    assert batch["loss_c"].shape == (2, 25)


def test_test_dataset(tmp_path):
    real_root = str(tmp_path / "real")
    _make_real_ffhq(real_root, n=5)
    ds = TestDataset(real_path=real_root, held_out=3, resolution=32)
    assert len(ds) == 3
    item = ds[0]
    assert item["condition_image"].shape[0] == 3
    assert item["loss_c"].shape == (25,)


def test_held_out_partition_deterministic(tmp_path):
    """The hash split is a function of the file SET (not listing order),
    train/test are disjoint and exhaustive, and a manifest overrides it
    (VERDICT r2 item 9: pin the held-out split)."""
    from gnerf_tpu.training.dataset import held_out_partition

    names = [f"/data/{i:05d}.jpg" for i in range(20)]
    train, held = held_out_partition(names, held_out=6)
    assert len(held) == 6 and len(train) == 14
    assert set(train) | set(held) == set(names)
    assert not set(train) & set(held)
    # Shuffled listing order -> identical partition.
    rng = np.random.RandomState(0)
    shuffled = list(names)
    rng.shuffle(shuffled)
    train2, held2 = held_out_partition(shuffled, held_out=6)
    assert train2 == train and held2 == held
    # Manifest override wins.
    manifest = tmp_path / "held.txt"
    manifest.write_text("00003.jpg\n00017.jpg\n")
    train3, held3 = held_out_partition(names, held_out=6, manifest=str(manifest))
    assert held3 == ["/data/00003.jpg", "/data/00017.jpg"]
    assert len(train3) == 18


def test_train_and_test_datasets_disjoint(tmp_path):
    """FFHQGenDataset's real branch and TestDataset see complementary halves
    of the same hash partition — no eval leakage."""
    real_root = str(tmp_path / "real")
    _make_real_ffhq(real_root, n=6)
    gen_root = str(tmp_path / "gen")
    _make_gen_pairs(gen_root)
    train_ds = FFHQGenDataset(path=gen_root, real_path=real_root, held_out=2,
                              resolution=32)
    test_ds = TestDataset(real_path=real_root, held_out=2, resolution=32)
    train_files = set(train_ds._real_fnames)
    test_files = set(test_ds._fnames)
    assert len(test_files) == 2
    assert not train_files & test_files
    assert len(train_files) == 4


def test_afhq_dataset(tmp_path):
    gen_root = str(tmp_path / "gen")
    real_root = str(tmp_path / "afhq")
    _make_gen_pairs(gen_root)
    os.makedirs(os.path.join(real_root, "train", "cat"), exist_ok=True)
    os.makedirs(os.path.join(real_root, "train", "label"), exist_ok=True)
    labels = {}
    for i in range(3):
        name = f"cat{i}.png"
        _write_img(os.path.join(real_root, "train", "cat", name), seed=i)
        labels[name] = _label()
    with open(os.path.join(real_root, "train", "label", "labels.json"), "w") as fh:
        json.dump(labels, fh)
    ds = Afhqv2Dataset(path=gen_root, real_path=real_root, resolution=32)
    item = ds[0]
    assert item["condition_c"].shape == (25,)


def test_shapenet_dataset(tmp_path):
    gen_root = str(tmp_path / "gen")
    real_root = str(tmp_path / "srn")
    _make_gen_pairs(gen_root)
    os.makedirs(os.path.join(real_root, "views"), exist_ok=True)
    os.makedirs(os.path.join(real_root, "label"), exist_ok=True)
    rel_names = []
    labels = {}
    for i in range(3):
        rel = os.path.join("views", f"v{i}.png")
        _write_img(os.path.join(real_root, rel), seed=i)
        rel_names.append(rel)
        labels[rel] = _label()
    with open(os.path.join(real_root, "train_up_sphere.txt"), "w") as fh:
        fh.write("\n".join(rel_names))
    with open(os.path.join(real_root, "label", "labels.json"), "w") as fh:
        json.dump(labels, fh)
    ds = ShapeNetDataset(path=gen_root, real_path=real_root)
    item = ds[0]
    assert item["condition_c"].shape == (25,)


def test_psnr():
    a = jnp.zeros((2, 3, 8, 8))
    b = jnp.full((2, 3, 8, 8), 0.2)
    out = np.asarray(psnr(a, b))
    want = 10 * np.log10(4.0 / 0.04)
    np.testing.assert_allclose(out, want, rtol=1e-5)
    # identical -> huge psnr
    assert float(psnr(a, a)[0]) > 100


def test_reconstruction_metrics_and_frechet():
    vgg = VGG16LPIPS(resize_to=32)
    pv = vgg.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.rand(4, 3, 16, 16).astype(np.float32) * 2 - 1)
    fake = jnp.clip(real + 0.1, -1, 1)
    m = reconstruction_metrics(vgg, pv, real, fake)
    assert set(m) == {"psnr", "ssim", "lpips"}
    assert 10 < float(m["psnr"]) < 40

    # Frechet distance: identical distributions -> ~0; shifted -> > 0.
    feats = rng.randn(500, 8)
    mu1, s1 = feature_statistics(feats)
    mu2, s2 = feature_statistics(feats + 0.0)
    assert abs(frechet_distance(mu1, s1, mu2, s2)) < 1e-6
    mu3, s3 = feature_statistics(feats + 2.0)
    assert frechet_distance(mu1, s1, mu3, s3) > 1.0

    fn = make_vgg_feature_fn(vgg, pv)
    fd_same = frechet_feature_distance(fn, [np.asarray(real)], [np.asarray(real)])
    fd_diff = frechet_feature_distance(
        fn, [np.asarray(real)],
        [rng.rand(4, 3, 16, 16).astype(np.float32) * 2 - 1],
    )
    assert abs(fd_same) < 1e-4
    assert fd_diff > fd_same


def test_image_folder_dataset_dir_and_zip(tmp_path):
    """Generic EG3D-format data: directory AND zip archive with
    dataset.json labels (reference ImageFolderDataset, dataset.py:167-247)."""
    import zipfile

    from PIL import Image

    from gnerf_tpu.training.dataset import ImageFolderDataset

    rng = np.random.RandomState(0)
    root = tmp_path / "imgs"
    root.mkdir()
    labels = []
    for i in range(4):
        arr = rng.randint(0, 255, (32, 32, 3), np.uint8)
        name = f"img{i:02d}.png"
        Image.fromarray(arr).save(root / name)
        labels.append([name, list(np.linspace(i, i + 1, 25))])
    with open(root / "dataset.json", "w") as f:
        json.dump({"labels": labels}, f)

    ds = ImageFolderDataset(str(root), resolution=16)
    assert len(ds) == 4
    item = ds[1]
    assert item["loss_image"].shape == (3, 16, 16)
    assert item["loss_c"].shape == (25,)
    np.testing.assert_allclose(item["loss_c"][0], 1.0)
    std = ds.get_label_std()
    assert std.shape == (25,) and np.all(std > 0)

    # xflip doubles the set; flipped image mirrors.
    ds_flip = ImageFolderDataset(str(root), resolution=16, xflip=True)
    assert len(ds_flip) == 8
    np.testing.assert_array_equal(
        ds_flip[5]["loss_image"], ds_flip[1]["loss_image"][:, :, ::-1])

    # Zip archive path: identical content.
    zpath = tmp_path / "data.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in root.iterdir():
            z.write(p, p.name)
    dz = ImageFolderDataset(str(zpath), resolution=16)
    assert len(dz) == 4
    np.testing.assert_array_equal(dz[1]["loss_image"], ds[1]["loss_image"])
    np.testing.assert_allclose(dz[1]["loss_c"], ds[1]["loss_c"])

    # Missing labels -> zeros (unconditional mode).
    (root / "dataset.json").unlink()
    du = ImageFolderDataset(str(root), resolution=16)
    np.testing.assert_array_equal(du[0]["loss_c"], np.zeros(25, np.float32))


def test_imread_enforces_resolution_native_or_pil(tmp_path):
    """The dataset image loader enforces the size contract (mismatched
    files are resized to `resolution`) and, when the native C++ runtime is
    built, its decode of an already-right-size file is pixel-identical to
    PIL (both are libjpeg/libpng underneath)."""
    import importlib
    import subprocess

    from gnerf_tpu.training.dataset import _imread_rgb_chw
    from gnerf_tpu.utils import native_loader

    # Build the .so if this test runs before test_native_loader's build
    # fixture (alphabetical collection order — on a fresh checkout the
    # gitignored .so does not exist yet). make is a no-op when built.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    build = subprocess.run(["make", "-C", os.path.join(repo, "native")],
                           check=False, capture_output=True, text=True)
    importlib.reload(native_loader)

    p_big = str(tmp_path / "big.png")
    _write_img(p_big, h=64, w=64, seed=3)
    out = _imread_rgb_chw(p_big, resolution=32)
    assert out.shape == (3, 32, 32) and out.dtype == np.uint8

    p_ok = str(tmp_path / "ok.png")
    _write_img(p_ok, h=32, w=32, seed=4)
    got = _imread_rgb_chw(p_ok, resolution=32)
    want = _imread_rgb_chw(p_ok)  # PIL passthrough at file size
    np.testing.assert_array_equal(got, want)
    assert native_loader.native_available(), (
        "native loader should be built in CI (make -C native); build rc="
        f"{build.returncode}, stderr:\n{build.stderr[-2000:]}")


def test_paired_dataset_dispatch(tmp_path):
    """--dataset_name now selects the matching paired-dataset class
    (shapenet/afhqv2 used to silently fall through to the FFHQ layout)."""
    from gnerf_tpu.training.dataset import Afhqv2Dataset, ShapeNetDataset
    from gnerf_tpu.training.train import _paired_dataset

    gen_root = str(tmp_path / "gen")
    _make_gen_pairs(gen_root)

    ds = _paired_dataset("ffhq", gen_root, "", 32)
    assert type(ds).__name__ == "FFHQGenDataset"
    assert _paired_dataset("afhqv2", gen_root, "", 32).__class__ is Afhqv2Dataset
    assert _paired_dataset("shapenet", gen_root, "", 32).__class__ is ShapeNetDataset
    with pytest.raises(ValueError, match="unknown --dataset_name"):
        _paired_dataset("nope", gen_root, "", 32)


def test_afhq_and_shapenet_test_datasets(tmp_path):
    """Reference Afhqv2_Test_/ShapeNet_Test_ equivalents: complementary
    sorted-slice AFHQ split, listing-file ShapeNet test root; both emit the
    eval item contract."""
    from gnerf_tpu.training.dataset import Afhqv2TestDataset, ShapeNetTestDataset

    # AFHQ: 5 crops, train slice = first 3 sorted, test = last 2.
    afhq = str(tmp_path / "afhq")
    os.makedirs(os.path.join(afhq, "train", "cat"), exist_ok=True)
    os.makedirs(os.path.join(afhq, "train", "label"), exist_ok=True)
    labels = {}
    for i in range(5):
        name = f"cat{i}.png"
        _write_img(os.path.join(afhq, "train", "cat", name), seed=i)
        labels[name] = _label()
    with open(os.path.join(afhq, "train", "label", "labels.json"), "w") as fh:
        json.dump(labels, fh)
    ds = Afhqv2TestDataset(real_path=afhq, train_size=3, resolution=32)
    assert len(ds) == 2
    item = ds[0]
    assert item["condition_image"].shape == (3, 32, 32)
    assert item["loss_c"].shape == (25,)
    assert os.path.basename(ds._fnames[0]) == "cat3.png"  # complement of [:3]

    # ShapeNet: separate test root with train.txt listing.
    sn = str(tmp_path / "chairs_test")
    os.makedirs(os.path.join(sn, "views"), exist_ok=True)
    os.makedirs(os.path.join(sn, "label"), exist_ok=True)
    rels, sn_labels = [], {}
    for i in range(3):
        rel = os.path.join("views", f"{i:03d}.png")
        _write_img(os.path.join(sn, rel), seed=50 + i)
        rels.append(rel)
        sn_labels[rel] = _label()
    with open(os.path.join(sn, "train.txt"), "w") as fh:
        fh.write("\n".join(rels) + "\n")
    with open(os.path.join(sn, "label", "labels.json"), "w") as fh:
        json.dump(sn_labels, fh)
    ds2 = ShapeNetTestDataset(real_path=sn, resolution=16)
    assert len(ds2) == 3
    item2 = ds2[1]
    assert item2["condition_image"].shape == (3, 16, 16)
    np.testing.assert_array_equal(
        item2["condition_c"], np.asarray(_label(), np.float32))
