"""FFHQ alignment warp (utils/alignment.py) vs the reference geometry.

The reference's ``utils/alignment.py:29-114`` builds an oriented quad from
dlib 68-point landmarks and warps it out with ``PIL.Image.transform(QUAD,
quad + 0.5, BILINEAR)``. PIL itself is available here, so these tests use
PIL as the live oracle for the warp, and re-derive the quad math by hand on
a synthetic landmark fixture."""

import numpy as np
import pytest

from gnerf_tpu.utils.alignment import (align_face, align_folder, ffhq_quad,
                                       load_landmarks, quad_warp)


def _smooth_image(h, w, seed=0):
    """Low-frequency uint8 RGB test image (bilinear-resampling friendly)."""
    rng = np.random.RandomState(seed)
    small = rng.rand(h // 8 + 2, w // 8 + 2, 3)
    import PIL.Image

    img = PIL.Image.fromarray(np.uint8(small * 255)).resize(
        (w, h), PIL.Image.BILINEAR)
    return np.asarray(img)


def _synthetic_landmarks(cx=128.0, cy=120.0, iod=48.0, tilt_deg=0.0):
    """68-point layout with controlled eye/mouth geometry: eyes as 6-point
    rings around (cx±iod/2, cy), outer mouth corners 1.1*iod below the eye
    midline — everything else is filler (the reference math only reads the
    eye rings and lm[48]/lm[54])."""
    lm = np.zeros((68, 2))
    th = np.deg2rad(tilt_deg)
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])

    def place(p):
        return np.asarray([cx, cy]) + (np.asarray(p) @ rot.T)

    ring = np.stack([3 * np.cos(np.linspace(0, 2 * np.pi, 6, False)),
                     1.5 * np.sin(np.linspace(0, 2 * np.pi, 6, False))], -1)
    lm[36:42] = place(ring + [-iod / 2, 0])
    lm[42:48] = place(ring + [iod / 2, 0])
    lm[48] = place([-0.35 * iod, 1.1 * iod])
    lm[54] = place([0.35 * iod, 1.1 * iod])
    # chin/brow filler inside the face bounding box
    lm[0:17] = place(np.stack([np.linspace(-iod, iod, 17),
                               np.full(17, 1.4 * iod)], -1))
    lm[17:36] = place(np.stack([np.linspace(-iod / 2, iod / 2, 19),
                                np.full(19, -0.4 * iod)], -1))
    lm[55:68] = lm[48]
    return lm


def test_quad_warp_matches_pil():
    """quad_warp == PIL Image.transform(QUAD, quad+0.5, BILINEAR) — the
    exact call the reference makes (alignment.py:109) — on a rotated quad."""
    import PIL.Image

    img = _smooth_image(96, 112, seed=1)
    c = np.array([56.0, 48.0])
    x = np.array([30.0, 10.0])   # oriented, non-axis-aligned
    y = np.array([-10.0, 30.0])
    quad = np.stack([c - x - y, c - x + y, c + x + y, c + x - y])
    size = 64

    ours = quad_warp(img.astype(np.float64), quad, size)

    pil = PIL.Image.fromarray(img).transform(
        (size, size), PIL.Image.QUAD, (quad + 0.5).flatten(),
        PIL.Image.BILINEAR)
    ref = np.asarray(pil, np.float64)
    # PIL quantizes each channel to uint8; geometry parity = sub-level match.
    assert np.max(np.abs(ours - ref)) <= 1.0 + 1e-6


def test_quad_warp_zero_fill_outside():
    img = np.full((32, 32, 3), 200.0)
    quad = np.array([[-40.0, -40.0], [-40.0, -20.0],
                     [-20.0, -20.0], [-20.0, -40.0]])
    out = quad_warp(img, quad, 8)
    assert np.all(out == 0.0)


def test_ffhq_quad_geometry():
    """Quad construction invariants + hand-computed values on an untilted
    fixture (reference alignment.py:47-64)."""
    iod = 48.0
    lm = _synthetic_landmarks(cx=128, cy=120, iod=iod, tilt_deg=0.0)
    quad, qsize = ffhq_quad(lm)

    eye_avg = np.array([128.0, 120.0])
    mouth_avg = np.array([128.0, 120.0 + 1.1 * iod])
    c_expect = eye_avg + (mouth_avg - eye_avg) * 0.1
    # untilted: x ∝ eye_to_eye - rot90(eye_to_mouth) = (iod + 1.1*iod, 0)
    scale = max(iod * 2.0, 1.1 * iod * 1.8)
    assert np.allclose(quad.mean(axis=0), c_expect, atol=1e-9)
    # all four edges have length qsize; x/y axes orthogonal
    edges = np.diff(np.vstack([quad, quad[:1]]), axis=0)
    np.testing.assert_allclose(np.hypot(*edges.T), qsize, rtol=1e-12)
    assert np.isclose(qsize, 2 * scale)
    assert abs(np.dot(edges[0], edges[1])) < 1e-9
    # corner order NW,SW,SE,NE around the (untilted) center
    assert quad[0, 0] < c_expect[0] and quad[0, 1] < c_expect[1]
    assert quad[1, 0] < c_expect[0] and quad[1, 1] > c_expect[1]
    assert quad[2, 0] > c_expect[0] and quad[2, 1] > c_expect[1]

    # tilting the face tilts the quad with it
    quad_t, _ = ffhq_quad(_synthetic_landmarks(tilt_deg=20.0))
    e0 = quad_t[3] - quad_t[0]
    assert abs(np.rad2deg(np.arctan2(e0[1], e0[0])) - 20.0) < 1.0


def test_align_face_matches_pil_pipeline_no_pad():
    """End-to-end align_face == the reference pipeline executed with PIL
    (crop + QUAD transform), on a fixture whose quad stays inside the image
    (no shrink, no pad branch)."""
    import PIL.Image

    img = _smooth_image(256, 256, seed=2)
    lm = _synthetic_landmarks(cx=128, cy=110, iod=24.0, tilt_deg=10.0)
    out_size = 64
    ours = align_face(img, lm, output_size=out_size)

    quad, qsize = ffhq_quad(lm)
    assert int(np.floor(qsize / out_size * 0.5)) <= 1  # no shrink
    border = max(int(np.rint(qsize * 0.1)), 3)
    crop = (int(np.floor(quad[:, 0].min())), int(np.floor(quad[:, 1].min())),
            int(np.ceil(quad[:, 0].max())), int(np.ceil(quad[:, 1].max())))
    crop = (max(crop[0] - border, 0), max(crop[1] - border, 0),
            min(crop[2] + border, 256), min(crop[3] + border, 256))
    pil = PIL.Image.fromarray(img).crop(crop)
    q = quad - np.array(crop[:2], np.float64)
    # quad fully interior -> pad branch must not fire
    pad = (int(np.floor(q[:, 0].min())), int(np.floor(q[:, 1].min())),
           int(np.ceil(q[:, 0].max())), int(np.ceil(q[:, 1].max())))
    pad = (max(-pad[0] + border, 0), max(-pad[1] + border, 0),
           max(pad[2] - pil.size[0] + border, 0),
           max(pad[3] - pil.size[1] + border, 0))
    assert max(pad) <= border - 4
    ref = np.asarray(pil.transform((out_size, out_size), PIL.Image.QUAD,
                                   (q + 0.5).flatten(), PIL.Image.BILINEAR))
    assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= 1


def test_align_face_pad_branch():
    """Face near the border: the reflect-pad + feather branch fires and
    still produces a full-valued crop (no black fill from out-of-image)."""
    img = _smooth_image(128, 128, seed=3)
    lm = _synthetic_landmarks(cx=20, cy=24, iod=30.0)
    out = align_face(img, lm, output_size=32)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8
    # reflect-padded content everywhere: no fully-black fill rows
    assert (out.reshape(-1, 3).sum(axis=1) > 0).mean() > 0.99


def test_align_face_shrink_branch():
    """A huge face (qsize > 2x output) takes the shrink path and still
    lands the eye midline in the upper half, mouth lower half."""
    img = _smooth_image(512, 512, seed=4)
    lm = _synthetic_landmarks(cx=256, cy=240, iod=110.0)
    quad, qsize = ffhq_quad(lm)
    out_size = 32
    assert int(np.floor(qsize / out_size * 0.5)) > 1
    out = align_face(img, lm, output_size=out_size)
    assert out.shape == (out_size, out_size, 3)


def test_load_landmarks_and_align_folder(tmp_path):
    import json

    import PIL.Image

    lm = _synthetic_landmarks()
    for name, writer in [
        ("a.json", lambda p: p.write_text(json.dumps(lm.tolist()))),
        ("a.npy", lambda p: np.save(str(p), lm)),
        ("a.txt", lambda p: np.savetxt(str(p), lm)),
    ]:
        writer(tmp_path / name)
        got = load_landmarks(str(tmp_path / name))
        np.testing.assert_allclose(got, lm, atol=1e-6)

    with pytest.raises(ValueError):
        bad = tmp_path / "bad.json"
        bad.write_text(json.dumps([[0, 0]] * 5))
        load_landmarks(str(bad))

    data = tmp_path / "raw"
    lms = tmp_path / "lms"
    outd = tmp_path / "aligned"
    data.mkdir()
    lms.mkdir()
    PIL.Image.fromarray(_smooth_image(256, 256)).save(data / "face1.png")
    PIL.Image.fromarray(_smooth_image(256, 256)).save(data / "nolm.png")
    (lms / "face1.json").write_text(json.dumps(lm.tolist()))
    written = align_folder(str(data), str(lms), str(outd), output_size=64)
    assert len(written) == 1 and written[0].endswith("face1.png")
    out = np.asarray(PIL.Image.open(written[0]))
    assert out.shape == (64, 64, 3)
