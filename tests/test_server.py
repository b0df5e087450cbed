"""Serving runtime: identity cache + HTTP API, driven end-to-end with a
tiny model over a real (loopback) socket."""

from __future__ import annotations

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnerf_tpu.infer.server import GNerfService, load_service, make_handler
from gnerf_tpu.models import ResNeXt50Encoder, TriPlaneGenerator


@pytest.fixture(scope="module")
def tiny_service():
    g = TriPlaneGenerator(
        z_dim=16, w_dim=16, img_resolution=128, plane_resolution=16,
        channel_base=256, channel_max=32, mapping_layers=2,
        neural_rendering_resolution=16,
        rendering_kwargs=dict(
            TriPlaneGenerator().rendering_kwargs,
            superresolution_module="SuperresolutionHybrid2X",
            depth_resolution=4, depth_resolution_importance=4,
        ),
    )
    params_g = g.init(jax.random.PRNGKey(0))
    enc = ResNeXt50Encoder(out_dim=16)
    params_e, state_e = enc.init(jax.random.PRNGKey(1))
    return GNerfService(g, params_g, enc, params_e, state_e,
                        max_identities=2, dtype=jnp.float32)


def test_service_encode_render_and_lru(tiny_service):
    s = tiny_service
    a = s.encode_seed(0)
    frame = s.render_frame(a, yaw=np.pi / 2 + 0.3)
    assert frame.shape == (32, 32, 3) and frame.dtype == np.uint8

    img = np.random.RandomState(0).randint(0, 255, (3, 32, 32), np.uint8)
    b = s.encode_image(img)
    assert s.num_identities == 2
    # Same pose, different identities -> different frames.
    fa = s.render_frame(a)
    fb = s.render_frame(b)
    assert not np.array_equal(fa, fb)

    # LRU: a third identity evicts the least-recently-used one.
    s.render_frame(a)  # touch a
    c = s.encode_seed(7)
    assert s.num_identities == 2
    s.render_frame(a)
    s.render_frame(c)
    with pytest.raises(KeyError):
        s.render_frame(b)

    orbit = s.render_orbit(a, frames=3)
    assert len(orbit) == 3


def test_microbatch_concurrent_matches_direct(tiny_service):
    """Concurrent single-frame requests (different identities) micro-batch
    into one program; each caller's pixels must equal the un-batched
    single-identity program's output."""
    from gnerf_tpu.utils import camera

    s = tiny_service
    assert s._batcher is not None  # on by default
    ids = [s.encode_seed(100), s.encode_seed(101)]
    poses = [(np.pi / 2 + 0.2, np.pi / 2), (np.pi / 2 - 0.3, np.pi / 2 + 0.1)]

    def direct(ident, yaw, pitch):
        ws, planes = s._get(ident)
        c = camera.pose_to_label(
            camera.lookat_sample(yaw, pitch, radius=2.7),
            camera.FFHQ_INTRINSICS)
        img = np.asarray(s._render(s.params_g, planes, ws, jnp.asarray(c)))
        return img[0].transpose(1, 2, 0)

    want = [direct(i, *p) for i, p in zip(ids, poses)]

    got = [None, None]
    errs = []

    def worker(k):
        try:
            got[k] = s.render_frame(ids[k], yaw=poses[k][0], pitch=poses[k][1])
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=worker, args=(k,)) for k in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    for g_, w in zip(got, want):
        np.testing.assert_array_equal(g_, w)


def test_microbatcher_backpressure_and_error_fanout():
    from gnerf_tpu.infer.server import MicroBatcher, ServiceOverloaded
    import time as _time

    release = threading.Event()

    def slow_batch(items):
        release.wait(timeout=5)
        if items[0] == "boom":
            raise ValueError("boom")
        return [x * 2 for x in items]

    mb = MicroBatcher(slow_batch, batch_size=1, window_ms=0.0, max_queue=1)
    try:
        # First submit occupies the worker; fill the queue, then overflow.
        results = []
        t1 = threading.Thread(target=lambda: results.append(mb.submit(1)))
        t1.start()
        _time.sleep(0.2)  # worker now blocked in slow_batch
        t2 = threading.Thread(target=lambda: results.append(mb.submit(2)))
        t2.start()
        _time.sleep(0.2)  # queue holds item 2
        with pytest.raises(ServiceOverloaded):
            mb.submit(3)
        release.set()
        t1.join(timeout=5)
        t2.join(timeout=5)
        assert sorted(results) == [2, 4]
        # Errors fan out to the submitting caller.
        with pytest.raises(ValueError, match="boom"):
            mb.submit("boom")
    finally:
        release.set()
        mb.close()


def test_microbatcher_close_drains_queued_requests():
    """A request still queued when close() runs must error out, not hang
    its submitting thread forever."""
    from gnerf_tpu.infer.server import MicroBatcher, ServiceOverloaded
    import time as _time

    release = threading.Event()

    def slow_batch(items):
        release.wait(timeout=5)
        return list(items)

    mb = MicroBatcher(slow_batch, batch_size=1, window_ms=0.0, max_queue=4)
    outcomes = []

    def submit_and_record(x):
        try:
            outcomes.append(("ok", mb.submit(x)))
        except ServiceOverloaded as e:
            outcomes.append(("overloaded", str(e)))

    t1 = threading.Thread(target=submit_and_record, args=(1,))
    t1.start()
    _time.sleep(0.2)  # worker blocked in slow_batch on item 1
    t2 = threading.Thread(target=submit_and_record, args=(2,))
    t2.start()
    _time.sleep(0.2)  # item 2 queued behind the blocked worker
    mb._stop = True   # stop collector before it can dequeue item 2
    release.set()     # let the in-flight batch finish
    mb.close()
    t1.join(timeout=5)
    t2.join(timeout=5)
    assert not t1.is_alive() and not t2.is_alive()
    assert sorted(k for k, _ in outcomes) == ["ok", "overloaded"]


def test_microbatcher_submit_after_close_and_dead_collector():
    """submit() must fail fast (503), never hang, when it races past the
    shutdown drain or the collector thread has died."""
    from gnerf_tpu.infer.server import MicroBatcher, ServiceOverloaded

    mb = MicroBatcher(lambda items: list(items), batch_size=1, window_ms=0.0)
    assert mb.submit(7) == 7
    mb.close()
    # Post-close submit: the drain has already swept the queue; the timed
    # wait must bail out with ServiceOverloaded instead of blocking.
    with pytest.raises(ServiceOverloaded):
        mb.submit(8)

    # Dead collector (simulates the BaseException re-raise path): _stop is
    # False but the thread is gone — liveness polling must still 503.
    mb2 = MicroBatcher(lambda items: list(items), batch_size=1, window_ms=0.0)
    mb2._stop = True
    mb2.thread.join(timeout=5)
    assert not mb2.thread.is_alive()
    mb2._stop = False
    with pytest.raises(ServiceOverloaded):
        mb2.submit(9)


def test_http_api_end_to_end(tiny_service):
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(tiny_service))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"

        def post(path, payload):
            req = urllib.request.Request(
                base + path, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            return urllib.request.urlopen(req, timeout=120)

        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] is True

        with post("/encode", {"seed": 3}) as r:
            ident = json.loads(r.read())["identity"]

        # base64-image encode path.
        from PIL import Image

        arr = np.random.RandomState(1).randint(0, 255, (32, 32, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        with post("/encode",
                  {"image": base64.b64encode(buf.getvalue()).decode()}) as r:
            ident2 = json.loads(r.read())["identity"]
        assert ident2 != ident

        with post("/render", {"identity": ident, "yaw": 1.8}) as r:
            assert r.headers["Content-Type"] == "image/png"
            png = r.read()
        img = Image.open(io.BytesIO(png))
        assert img.size == (32, 32)

        with post("/orbit", {"identity": ident, "frames": 2}) as r:
            avi = r.read()
        assert avi[:4] == b"RIFF" and b"MJPG" in avi

        # Unbounded client frame counts are rejected, not rendered
        # (ADVICE r2: one huge request would tie up the device loop).
        try:
            post("/orbit", {"identity": ident, "frames": 100000})
            clamped = False
        except urllib.error.HTTPError as err:
            clamped = err.code == 400
        assert clamped

        # Unknown identity -> 404.
        try:
            post("/render", {"identity": "nope"})
            raised = False
        except urllib.error.HTTPError as err:
            raised = err.code == 404
        assert raised

        # raw-photo + landmarks encode path: the server FFHQ-aligns before
        # running E (reference utils/alignment.py semantics, dlib-free).
        # Last in the test: with max_identities=2 this evicts `ident`.
        big = np.random.RandomState(2).randint(0, 255, (128, 128, 3),
                                               np.uint8)
        lm = np.zeros((68, 2))
        lm[36:42] = [52, 56]
        lm[42:48] = [76, 56]
        lm[48], lm[54] = [56, 80], [72, 80]
        buf = io.BytesIO()
        Image.fromarray(big).save(buf, format="PNG")
        with post("/encode",
                  {"image": base64.b64encode(buf.getvalue()).decode(),
                   "landmarks": lm.tolist(), "align_size": 32}) as r:
            ident3 = json.loads(r.read())["identity"]
        assert ident3 not in (ident, ident2)
    finally:
        httpd.shutdown()


def test_load_service_from_checkpoint(tmp_path):
    from gnerf_tpu.utils import checkpoint as ckpt

    g = TriPlaneGenerator(
        z_dim=16, w_dim=16, img_resolution=128, plane_resolution=16,
        channel_base=256, channel_max=32, mapping_layers=2,
        neural_rendering_resolution=16,
        rendering_kwargs=dict(
            TriPlaneGenerator().rendering_kwargs,
            superresolution_module="SuperresolutionHybrid2X",
            depth_resolution=4, depth_resolution_importance=4,
        ),
    )
    params_g = g.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "net.npz")
    config = {"generator": {
        "z_dim": 16, "w_dim": 16, "img_resolution": 128,
        "plane_resolution": 16, "channel_base": 256, "channel_max": 32,
        "mapping_layers": 2, "neural_rendering_resolution": 16,
        "rendering_kwargs": {
            k: (list(v) if isinstance(v, tuple) else v)
            for k, v in g.rendering_kwargs.items()
        },
    }}
    ckpt.save_checkpoint(path, {"G_ema": params_g}, config=config)
    svc = load_service(path)
    # Reference inference convention: samples/ray doubled at load
    # (gen_videos.py:127-128) unless double_sampling=False.
    assert svc.g.rendering_kwargs["depth_resolution"] == 8
    assert svc.g.rendering_kwargs["depth_resolution_importance"] == 8
    svc_fast = load_service(path, double_sampling=False)
    assert svc_fast.g.rendering_kwargs["depth_resolution"] == 4
    ident = svc.encode_seed(0)
    frame = svc.render_frame(ident)
    assert frame.shape == (32, 32, 3)
