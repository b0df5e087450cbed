"""End-to-end on a REAL photograph from the reference's shipped samples.

The reference's primary deliverable reads real JPEGs straight off disk
(`/root/reference/g_nerf/gen_videos.py:112-119`: cv2.imread -> BGR->RGB ->
[-1,1] -> E -> mapping -> 120-frame orbit). Everything else in this suite
runs on synthetic arrays; these tests drive the actual I/O + preprocessing
+ serving path on a real photo: native imread -> (optional FFHQ alignment
from landmarks) -> E -> mapping -> 3-frame orbit -> video writer, asserting
shapes, dtype ranges, and determinism.
"""

import json
import os

import numpy as np
import pytest

SAMPLES = "/root/reference/samples"
PHOTO = os.path.join(SAMPLES, "66667.jpg")

needs_photo = pytest.mark.skipif(
    not os.path.isfile(PHOTO), reason="reference sample photos not staged")


def _synthetic_landmarks(cx, cy, iod):
    """68-pt layout with plausible eye/mouth geometry (see
    tests/test_alignment.py for the full-featured variant)."""
    lm = np.zeros((68, 2))
    ring = np.stack([3 * np.cos(np.linspace(0, 2 * np.pi, 6, False)),
                     1.5 * np.sin(np.linspace(0, 2 * np.pi, 6, False))], -1)
    lm[36:42] = ring + [cx - iod / 2, cy]
    lm[42:48] = ring + [cx + iod / 2, cy]
    lm[48] = [cx - 0.35 * iod, cy + 1.1 * iod]
    lm[54] = [cx + 0.35 * iod, cy + 1.1 * iod]
    lm[0:17] = np.stack([np.linspace(cx - iod, cx + iod, 17),
                         np.full(17, cy + 1.4 * iod)], -1)
    lm[17:36] = np.stack([np.linspace(cx - iod / 2, cx + iod / 2, 19),
                          np.full(19, cy - 0.4 * iod)], -1)
    lm[55:68] = lm[48]
    return lm


@needs_photo
def test_real_photo_imread_native_and_pil_agree():
    """The native C++ decoder and the PIL fallback agree on a real JPEG
    (identical decode; both resize bilinearly when asked)."""
    from PIL import Image

    from gnerf_tpu.utils import native_loader

    img = native_loader.decode_image(PHOTO, 512, 512)
    assert img.shape == (3, 512, 512) and img.dtype == np.uint8
    # A real face photo is neither blank nor saturated.
    assert 16 < img.mean() < 240 and img.std() > 10

    ref = np.asarray(Image.open(PHOTO).convert("RGB")).transpose(2, 0, 1)
    if native_loader.native_available():
        # Same source pixels (512x512 source needs no resize): exact match
        # modulo IDCT rounding across JPEG decoders.
        assert ref.shape == img.shape
        diff = np.abs(img.astype(np.int16) - ref.astype(np.int16))
        assert diff.mean() < 2.0 and diff.max() <= 32

    # Determinism: two loads are bit-identical.
    np.testing.assert_array_equal(img, native_loader.decode_image(PHOTO, 512, 512))

    # Odd output sizes exercise the resize path on real data.
    odd = native_loader.decode_image(PHOTO, 257, 123)
    assert odd.shape == (3, 257, 123) and odd.dtype == np.uint8


@needs_photo
def test_real_photo_load_images_and_alignment(tmp_path):
    """gen_videos' identity loader on the real photo: plain decode and the
    --align_lm branch (synthetic landmarks fixture)."""
    from gnerf_tpu.infer.gen_videos import _load_images

    plain = _load_images(PHOTO, None)
    assert plain.shape == (1, 3, 512, 512) and plain.dtype == np.uint8

    # Alignment branch: landmarks centered on the photo, so the warp quad
    # stays (mostly) inside — output is a well-formed 512^2 crop.
    lm_dir = tmp_path / "lm"
    lm_dir.mkdir()
    lm = _synthetic_landmarks(cx=256.0, cy=220.0, iod=120.0)
    with open(lm_dir / "66667.json", "w") as f:
        json.dump(lm.tolist(), f)
    aligned = _load_images(PHOTO, None, align_lm=str(lm_dir))
    assert aligned.shape == (1, 3, 512, 512) and aligned.dtype == np.uint8
    assert aligned.std() > 10
    # The warp actually did something: aligned != plain decode.
    assert np.abs(aligned.astype(np.int16) - plain.astype(np.int16)).mean() > 1
    # Deterministic.
    np.testing.assert_array_equal(
        aligned, _load_images(PHOTO, None, align_lm=str(lm_dir)))

    # A photo with NO landmark file falls back to the plain decode.
    other = _load_images(PHOTO, None, align_lm=str(tmp_path))
    np.testing.assert_array_equal(other, plain)


@needs_photo
@pytest.mark.slow
def test_real_photo_orbit_video_e2e(tmp_path):
    """Full pipeline on the real photo: imread -> E -> mapping -> 3-frame
    orbit -> video writer, twice, bit-identical."""
    import jax

    from gnerf_tpu.infer.gen_videos import generate_videos
    from gnerf_tpu.models import ResNeXt50Encoder, TriPlaneGenerator
    from gnerf_tpu.utils import checkpoint as ckpt

    gen_cfg = dict(
        z_dim=32, c_dim=25, w_dim=32, img_resolution=128,
        plane_resolution=16, plane_channels=32, channel_base=512,
        channel_max=64, mapping_layers=2, neural_rendering_resolution=8,
        rendering_kwargs=dict(
            TriPlaneGenerator().rendering_kwargs,
            superresolution_module="SuperresolutionHybrid2X",
            depth_resolution=4, depth_resolution_importance=4,
        ),
    )
    g = TriPlaneGenerator(**gen_cfg)
    enc = ResNeXt50Encoder(out_dim=g.z_dim)
    params_g = g.init(jax.random.PRNGKey(0))
    params_e, state_e = enc.init(jax.random.PRNGKey(1))
    net = str(tmp_path / "tiny.npz")
    ckpt.save_checkpoint(
        net, {"G_ema": params_g, "E": params_e, "E_state": state_e},
        config={"generator": gen_cfg},
    )

    def run(sub):
        out = str(tmp_path / sub)
        generate_videos(network=net, id_image=PHOTO, video_out_path=out,
                        outdir=out, res=8, frames=3, fp32=True)
        return out

    def outputs_of(out):
        """{relative path: bytes} of every file written under `out`
        (container format varies with what's installed: mp4/avi/PNG dir)."""
        blobs = {}
        for root, _, files in os.walk(out):
            for f in files:
                p = os.path.join(root, f)
                blobs[os.path.relpath(p, out)] = open(p, "rb").read()
        return blobs

    blobs1 = outputs_of(run("a"))
    assert blobs1, "no video output written"
    # Identity name propagates from the photo filename.
    assert any("66667" in k for k in blobs1)
    assert all(len(b) > 0 for b in blobs1.values())

    # Determinism end-to-end: same photo, same weights, same orbit.
    blobs2 = outputs_of(run("b"))
    assert blobs1.keys() == blobs2.keys()
    for k in blobs1:
        assert blobs1[k] == blobs2[k], f"nondeterministic output: {k}"
