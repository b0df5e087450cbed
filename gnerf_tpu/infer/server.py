"""Serving runtime: persistent model + identity cache behind HTTP.

Production-shaped inference the reference has no equivalent of (its
`gen_videos.py` reloads the pickle per invocation): load a checkpoint
ONCE, keep the jitted render program and per-identity prepared state
(mapping + packed tri-planes — the expensive, reusable part) resident,
and serve frames over a minimal stdlib HTTP API:

    POST /encode   {"image": <base64 png/jpg>[, "landmarks": 68x[x,y],
                    "align_size": 512]} | {"seed": int}
                   -> {"identity": "<id>"}           (runs E + backbone once;
                   with "landmarks", the raw photo is FFHQ-aligned first)
    POST /render   {"identity": "...", "yaw": float, "pitch": float,
                    "radius": 2.7, "fov": null}
                   -> image/png frame (512^2)
    POST /orbit    {"identity": "...", "frames": int}
                   -> video/avi (MJPEG, video_io.MJPEGWriter)
    GET  /healthz  -> {"ok": true, "identities": N}

Design notes (TPU-first): every request shape is static — one compiled
program serves all poses; the identity cache holds device-resident
PackedPlanes (bf16, ~25 MB each) with LRU eviction; rendering batches of
frames reuse the same chunked program as bench.py/gen_videos.

Concurrency: single-frame requests from CONCURRENT clients are
micro-batched — a collector thread drains a bounded queue into one
batched program (different identities' packed planes stack along the
batch axis; the tail pads by repeating, so the program shape stays
static). The bounded queue is the backpressure valve: when it is full the
HTTP layer answers 503 instead of queueing unboundedly. Orbit requests
keep the dedicated chunked-throughput program.

Measured at flagship scale (512^2, v5e through the dev relay): warm
identity onboarding 0.05 s, single-frame latency ~104 ms (~30 ms of which
is relay dispatch; device time ~15 ms), orbit throughput limited by the
relay's host link (11.8 MB of pixels per 15-frame chunk). A co-located
deployment's orbit rate is bench.py's — the server reuses its exact
chunked program AND its sampling (the default `double_sampling=True` load
matches the bench's 96+96 workload, asserted by
test_server.py::test_load_service_from_checkpoint): 41.9 f/s on one v5e
(BASELINE.md r4; 75 f/s with `--double-sampling false`, the 48-spp tier).

Start:  python -m gnerf_tpu.infer.server --network g.npz --port 8000
Library use: `GNerfService` (no HTTP) for embedding into other servers.
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
from collections import OrderedDict
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

# Upper bound on client-requested orbit length (10 s at 30 fps).
MAX_ORBIT_FRAMES = 300


class ServiceOverloaded(RuntimeError):
    """Raised when the request queue is full — the HTTP layer maps this to
    503 so callers get immediate backpressure instead of unbounded queueing."""


class _Slot:
    __slots__ = ("event", "result", "error")

    def __init__(self):
        self.event = threading.Event()
        self.result = None
        self.error = None


class MicroBatcher:
    """Batches concurrent single-item requests into one device program.

    TPU serving wants LARGE batched programs (MXU utilization) and a SINGLE
    thread issuing device work (one program stream, no lock contention), so
    instead of a per-request device call under a lock, requests land in a
    bounded queue and a collector thread drains up to `batch_size` of them
    per dispatch (waiting at most `window_ms` for stragglers after the
    first). `run_batch(items)` must return one result per item; errors fan
    out to every request in the failed batch. The bounded queue is the
    backpressure valve: `submit` raises ServiceOverloaded when it is full.
    """

    def __init__(self, run_batch, batch_size: int = 4, window_ms: float = 4.0,
                 max_queue: int = 64):
        self.run_batch = run_batch
        self.batch_size = batch_size
        self.window = window_ms / 1e3
        self.queue: queue.Queue = queue.Queue(maxsize=max_queue)
        self._stop = False
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def submit(self, item):
        if self._stop:
            raise ServiceOverloaded("service shut down")
        slot = _Slot()
        try:
            self.queue.put_nowait((item, slot))
        except queue.Full:
            raise ServiceOverloaded(
                f"request queue full ({self.queue.maxsize}); retry later"
            ) from None
        # Timed wait: a submit racing close() can enqueue AFTER the shutdown
        # drain swept the queue, and the collector thread can die on a
        # re-raised SystemExit/KeyboardInterrupt — in either case no one
        # will ever set this slot's event, so poll the liveness conditions
        # instead of blocking forever.
        while not slot.event.wait(timeout=0.5):
            if self._stop or not self.thread.is_alive():
                raise ServiceOverloaded("service shut down")
        if slot.error is not None:
            raise slot.error
        return slot.result

    def close(self):
        self._stop = True
        self.thread.join(timeout=2)
        # Drain anything still queued (or enqueued during shutdown) so no
        # submit() blocks forever on a slot the collector will never serve.
        while True:
            try:
                _, slot = self.queue.get_nowait()
            except queue.Empty:
                break
            slot.error = ServiceOverloaded("service shut down")
            slot.event.set()

    def _loop(self):
        while not self._stop:
            try:
                batch = [self.queue.get(timeout=0.1)]
            except queue.Empty:
                continue
            deadline = time.perf_counter() + self.window
            while len(batch) < self.batch_size:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.queue.get(timeout=remaining))
                except queue.Empty:
                    break
            # BaseException too: a SystemExit/KeyboardInterrupt escaping
            # run_batch must not strand every queued waiter.
            try:
                results = self.run_batch([item for item, _ in batch])
                for (_, slot), result in zip(batch, results):
                    slot.result = result
                    slot.event.set()
            except BaseException as err:  # noqa: BLE001 — fan the error out
                wrapped = err if isinstance(err, Exception) else RuntimeError(
                    f"batch collector died: {err!r}")
                for _, slot in batch:
                    slot.error = wrapped
                    slot.event.set()
                if not isinstance(err, Exception):
                    raise


class GNerfService:
    """Checkpoint-resident renderer with an LRU identity cache."""

    def __init__(self, g, params_g, enc=None, params_e=None, state_e=None,
                 max_identities: int = 16, dtype=jnp.bfloat16,
                 microbatch: int = 4, microbatch_window_ms: float = 4.0,
                 max_queue: int = 64):
        self.g = g
        self.params_g = params_g
        self.enc = enc
        self.params_e = params_e
        self.state_e = state_e
        self.dtype = dtype
        self._identities: OrderedDict[str, tuple] = OrderedDict()
        self._max = max_identities
        self._lock = threading.Lock()
        self._counter = 0

        @jax.jit
        def _prepare(params, z, c):
            ws = g.mapping(params, z, c)
            planes = g.backbone_planes(params, ws, noise_mode="const",
                                       dtype=dtype, pack=True)
            return ws, planes

        @jax.jit
        def _render(params, planes, ws, c):
            out = g.render_planes(params, planes, c, ws, noise_mode="const",
                                  dtype=dtype)
            img = jnp.clip((out["image"] + 1) * 127.5, 0, 255)
            return img.astype(jnp.uint8)

        # Throughput path for orbits: FRAMES_PER_CHUNK frames per program
        # with the packed planes broadcast over the frame batch (same
        # batching as bench.py — ~5x the per-frame path on a v5e). With
        # more than one attached chip the frame batch is sharded over the
        # mesh's 'data' axis (planes/params replicated) — frames are
        # embarrassingly parallel, so orbits scale with the chip count.
        n_dev = len(jax.devices())
        self.frames_per_chunk = 15 if n_dev == 1 else 2 * n_dev

        def _chunk_body(params, planes, ws, cs):
            wsb = jnp.broadcast_to(ws, (self.frames_per_chunk,) + ws.shape[1:])
            out = g.render_planes(params, planes, cs, wsb, noise_mode="const",
                                  dtype=dtype)
            img = jnp.clip((out["image"] + 1) * 127.5, 0, 255)
            return img.astype(jnp.uint8)

        if n_dev > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import make_mesh

            mesh = make_mesh()
            repl = NamedSharding(mesh, P())
            fsh = NamedSharding(mesh, P("data", None))
            osh = NamedSharding(mesh, P("data", None, None, None))
            _render_chunk = jax.jit(_chunk_body,
                                    in_shardings=(repl, repl, repl, fsh),
                                    out_shardings=osh)
        else:
            _render_chunk = jax.jit(_chunk_body)

        self._prepare = _prepare
        self._render = _render
        self._render_chunk = _render_chunk
        # Cross-request micro-batching of single-frame renders: concurrent
        # clients' (different) identities stack along the batch axis of ONE
        # program (PackedPlanes rows concatenate; the packed-sampling base
        # index already handles n>1 batches). microbatch=0 disables.
        self._batcher = (
            MicroBatcher(self._run_frame_batch, batch_size=microbatch,
                         window_ms=microbatch_window_ms, max_queue=max_queue)
            if microbatch and microbatch > 1 else None
        )

    def _run_frame_batch(self, items):
        """items: list of (ws [1,...], PackedPlanes n=1, label [1,25]) →
        list of [H, W, 3] uint8 frames. An uncontended single request runs
        at its own n=1 shape (second cached program) instead of paying the
        padded batch's ~B x device work; partial batches n>=2 pad the tail
        by repeating the first item so dispatch shapes stay static."""
        n = len(items)
        B = (self._batcher.batch_size if self._batcher and n > 1 else n)
        items = items + [items[0]] * (B - n)
        ws = jnp.concatenate([it[0] for it in items], axis=0)
        from ..render.renderer import PackedPlanes

        p0 = items[0][1]
        rows = jnp.concatenate([it[1].rows for it in items], axis=0)
        planes = PackedPlanes(rows, B * p0.n, p0.c, p0.h, p0.w)
        cs = jnp.concatenate([it[2] for it in items], axis=0)
        imgs = np.asarray(self._render(self.params_g, planes, ws, cs))
        return [imgs[i].transpose(1, 2, 0) for i in range(n)]

    def close(self):
        if self._batcher is not None:
            self._batcher.close()

    # -- identities ---------------------------------------------------------

    def encode_image(self, image_chw_uint8: np.ndarray) -> str:
        """Identity from a reference image via the encoder E."""
        if self.enc is None:
            raise ValueError("service has no encoder loaded")
        x = jnp.asarray(image_chw_uint8[None], jnp.float32) / 127.5 - 1.0
        z, _ = self.enc.apply(self.params_e, self.state_e, x, train=False)
        return self._register(z)

    def encode_seed(self, seed: int) -> str:
        z = jax.random.normal(jax.random.PRNGKey(seed), (1, self.g.z_dim))
        return self._register(z)

    def _register(self, z) -> str:
        from ..utils import camera

        c0 = camera.pose_to_label(
            camera.lookat_sample(np.pi / 2, np.pi / 2, radius=2.7),
            camera.FFHQ_INTRINSICS,
        )
        ws, planes = self._prepare(self.params_g, z, jnp.asarray(c0))
        jax.block_until_ready(ws)
        with self._lock:
            self._counter += 1
            ident = f"id{self._counter:06d}"
            self._identities[ident] = (ws, planes)
            while len(self._identities) > self._max:
                self._identities.popitem(last=False)  # LRU eviction
        return ident

    def _get(self, identity: str):
        with self._lock:
            if identity not in self._identities:
                raise KeyError(identity)
            self._identities.move_to_end(identity)
            return self._identities[identity]

    # -- rendering ----------------------------------------------------------

    def render_frame(self, identity: str, yaw: float = np.pi / 2,
                     pitch: float = np.pi / 2, radius: float = 2.7,
                     fov: Optional[float] = None) -> np.ndarray:
        """One [H, W, 3] uint8 frame at the given orbit pose."""
        from ..utils import camera

        ws, planes = self._get(identity)
        intr = (camera.fov_to_intrinsics(fov)
                if fov is not None else camera.FFHQ_INTRINSICS)
        c = camera.pose_to_label(
            camera.lookat_sample(yaw, pitch, radius=radius), intr)
        if self._batcher is not None:
            return self._batcher.submit((ws, planes, jnp.asarray(c)))
        img = np.asarray(self._render(self.params_g, planes, ws,
                                      jnp.asarray(c)))
        return img[0].transpose(1, 2, 0)

    def render_orbit(self, identity: str, frames: int = 30,
                     radius: float = 2.7) -> list[np.ndarray]:
        """Batched orbit: frames rendered in FRAMES_PER_CHUNK-sized jitted
        chunks (padding the tail pose-wise so the program shape is static)."""
        from ..utils import camera

        ws, planes = self._get(identity)
        cs = [
            camera.pose_to_label(
                camera.lookat_sample(
                    np.pi / 2 + 0.7 * np.sin(2 * np.pi * i / frames),
                    np.pi / 2 - 0.05 + 0.3 * np.cos(2 * np.pi * i / frames),
                    radius=radius),
                camera.FFHQ_INTRINSICS)
            for i in range(frames)
        ]
        fpc = self.frames_per_chunk
        pad = -len(cs) % fpc
        cs = cs + cs[-1:] * pad
        labels = jnp.concatenate(cs, axis=0)
        out: list[np.ndarray] = []
        for start in range(0, labels.shape[0], fpc):
            imgs = np.asarray(self._render_chunk(
                self.params_g, planes, ws, labels[start:start + fpc]))
            out.extend(img.transpose(1, 2, 0) for img in imgs)
        return out[:frames]

    @property
    def num_identities(self) -> int:
        with self._lock:
            return len(self._identities)


def load_service(network: str, max_identities: int = 16,
                 double_sampling: bool = True) -> GNerfService:
    """Build a service from a gnerf_tpu checkpoint npz.

    `double_sampling` doubles the samples/ray at load — the reference's
    inference convention (`gen_videos.py:127-128`, same as our gen_videos
    CLI). Disable for ~2x renderer throughput at training-time quality."""
    import dataclasses as _dc

    from ..models import ResNeXt50Encoder, TriPlaneGenerator
    from ..utils import checkpoint as ckpt

    trees, config = ckpt.load_checkpoint(network)
    gen_cfg = dict((config or {}).get("generator") or {})
    rk = gen_cfg.pop("rendering_kwargs", None)
    if rk:
        gen_cfg["rendering_kwargs"] = {
            k: (tuple(v) if isinstance(v, list) else v) for k, v in rk.items()
        }
    g = TriPlaneGenerator(**gen_cfg)
    if double_sampling:
        rk2 = dict(g.rendering_kwargs)
        rk2["depth_resolution"] = int(rk2["depth_resolution"] * 2)
        rk2["depth_resolution_importance"] = int(
            rk2["depth_resolution_importance"] * 2)
        g = _dc.replace(g, rendering_kwargs=rk2)
    params_g = trees.get("G_ema", trees.get("G"))
    enc = params_e = state_e = None
    if "E" in trees:
        enc = ResNeXt50Encoder(out_dim=g.z_dim)
        params_e = trees["E"]
        state_e = trees.get("E_state")
        if state_e is None:
            _, state_e = enc.init(jax.random.PRNGKey(0))
    return GNerfService(g, params_g, enc, params_e, state_e,
                        max_identities=max_identities)


# ---------------------------------------------------------------------------
# HTTP layer (stdlib only)


def make_handler(service: GNerfService):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _bytes(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True,
                                 "identities": service.num_identities})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/encode":
                    if "seed" in req:
                        ident = service.encode_seed(int(req["seed"]))
                    else:
                        from PIL import Image

                        raw = base64.b64decode(req["image"])
                        img = np.asarray(
                            Image.open(io.BytesIO(raw)).convert("RGB"))
                        if "landmarks" in req:
                            # Raw photo + 68 landmarks -> FFHQ-aligned crop
                            # (the input E was trained on; reference
                            # utils/alignment.py:29-114 sans dlib).
                            from ..utils.alignment import align_face

                            lm = np.asarray(req["landmarks"], np.float64)
                            img = align_face(
                                img, lm,
                                output_size=int(req.get("align_size", 512)))
                        img = img.transpose(2, 0, 1)
                        ident = service.encode_image(img)
                    self._json(200, {"identity": ident})
                elif self.path == "/render":
                    frame = service.render_frame(
                        req["identity"],
                        yaw=float(req.get("yaw", np.pi / 2)),
                        pitch=float(req.get("pitch", np.pi / 2)),
                        radius=float(req.get("radius", 2.7)),
                        fov=req.get("fov"),
                    )
                    from PIL import Image

                    buf = io.BytesIO()
                    Image.fromarray(frame).save(buf, format="PNG")
                    self._bytes(200, buf.getvalue(), "image/png")
                elif self.path == "/orbit":
                    from .video_io import MJPEGWriter

                    n_frames = int(req.get("frames", 30))
                    # A single TPU program loop serves every request; an
                    # unbounded frame count would tie it (and host RAM for
                    # the buffered JPEGs) up arbitrarily long.
                    if not 1 <= n_frames <= MAX_ORBIT_FRAMES:
                        self._json(400, {
                            "error": f"frames must be in "
                                     f"[1, {MAX_ORBIT_FRAMES}], got {n_frames}"})
                        return
                    frames = service.render_orbit(
                        req["identity"], frames=n_frames)
                    w = MJPEGWriter(fps=30)
                    for fr in frames:
                        w.append_data(fr)
                    self._bytes(200, w.to_bytes(), "video/avi")
                else:
                    self._json(404, {"error": "not found"})
            except KeyError as err:
                self._json(404, {"error": f"unknown identity {err}"})
            except ServiceOverloaded as err:
                self._json(503, {"error": str(err)})
            except Exception as err:  # noqa: BLE001 — serving boundary
                self._json(500, {"error": str(err)})

    return Handler


def serve(service: GNerfService, port: int = 8000, host: str = "127.0.0.1"):
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    print(f"gnerf_tpu serving on http://{host}:{port} "
          f"(identities cached: {service.num_identities})")
    httpd.serve_forever()


def main():
    import click

    @click.command()
    @click.option("--network", required=True)
    @click.option("--port", type=int, default=8000)
    @click.option("--host", default="127.0.0.1")
    @click.option("--max-identities", type=int, default=16)
    @click.option("--double-sampling", type=bool, default=True,
                  help="double samples/ray at load (reference inference "
                       "convention, gen_videos.py:127-128); false = ~2x "
                       "renderer throughput at training-time quality")
    def _main(network, port, host, max_identities, double_sampling):
        serve(load_service(network, max_identities=max_identities,
                           double_sampling=double_sampling),
              port=port, host=host)

    _main()


if __name__ == "__main__":
    main()
