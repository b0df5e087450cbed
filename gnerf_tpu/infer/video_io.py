"""Video output with graceful degradation.

The reference writes libx264 mp4 via imageio-ffmpeg
(`/root/reference/g_nerf/gen_videos.py:145,183`). Here the backend chain is

  1. imageio + ffmpeg  -> H.264 .mp4 (when an ffmpeg binary exists),
  2. pure-python MJPEG  -> .avi (PIL JPEG frames in a hand-written RIFF/AVI
     container — a real video file, playable everywhere, zero native deps),
  3. numbered-PNG frame directory (`<name>_frames/%05d.png`).

All backends share the imageio writer interface (append_data/close).
"""

from __future__ import annotations

import os
import struct


class MJPEGWriter:
    """Motion-JPEG AVI writer in pure python (RIFF 'AVI ' container,
    'MJPG' fourcc, idx1 index). Frames are buffered as JPEG blobs and the
    container is emitted on close() so all chunk sizes are exact."""

    def __init__(self, path: str = None, fps: int = 30, quality: int = 92):
        self.path = path
        self.fps = int(fps)
        self.quality = quality
        self._frames: list[bytes] = []
        self._size = None  # (w, h)

    def append_data(self, frame) -> None:
        import io

        import numpy as np
        from PIL import Image

        arr = np.asarray(frame)
        h, w = arr.shape[:2]
        if self._size is None:
            self._size = (w, h)
        elif self._size != (w, h):
            raise ValueError(f"frame size changed: {self._size} -> {(w, h)}")
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=self.quality)
        self._frames.append(buf.getvalue())

    def to_bytes(self) -> bytes:
        """Assemble the RIFF/AVI container in memory (the frames are already
        buffered as JPEG blobs, so no file round-trip is needed — used by the
        serving path to stream the video straight into the HTTP response)."""
        if self._size is None:
            return b""
        w, h = self._size
        n = len(self._frames)

        def chunk(fourcc: bytes, payload: bytes) -> bytes:
            pad = b"\x00" if len(payload) % 2 else b""
            return fourcc + struct.pack("<I", len(payload)) + payload + pad

        def lst(kind: bytes, payload: bytes) -> bytes:
            return chunk(b"LIST", kind + payload)

        max_bytes = max((len(f) for f in self._frames), default=0)
        avih = struct.pack(
            "<14I",
            int(1e6 / max(self.fps, 1)),  # dwMicroSecPerFrame
            max_bytes * self.fps,         # dwMaxBytesPerSec
            0,                            # dwPaddingGranularity
            0x10,                         # dwFlags: AVIF_HASINDEX
            n, 0, 1,                      # frames, initial, streams
            max_bytes, w, h, 0, 0, 0, 0,
        )
        strh = struct.pack(
            "<4s4sIHHIIIIIIIi4H",
            b"vids", b"MJPG", 0, 0, 0, 0,
            1, self.fps,                  # dwScale / dwRate
            0, n, max_bytes, 10000, 0,
            0, 0, w, h,                   # rcFrame
        )
        strf = struct.pack(
            "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
        )
        hdrl = lst(
            b"hdrl",
            chunk(b"avih", avih)
            + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
        )

        movi_payload = b""
        index = b""
        for f in self._frames:
            # idx1 offsets are relative to the start of the 'movi' fourcc.
            offset = 4 + len(movi_payload)
            movi_payload += chunk(b"00dc", f)
            index += struct.pack("<4sIII", b"00dc", 0x10, offset, len(f))
        movi = lst(b"movi", movi_payload)
        idx1 = chunk(b"idx1", index)

        riff_payload = b"AVI " + hdrl + movi + idx1
        return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload

    def close(self) -> None:
        blob = self.to_bytes()
        if blob and self.path is not None:
            with open(self.path, "wb") as fh:
                fh.write(blob)
        # Reset _size too: a defensive second close() must be a no-op, not
        # rebuild a 0-frame AVI over the file just written.
        self._frames = []
        self._size = None


class VideoWriter:
    def __init__(self, path: str, fps: int = 30):
        self.path = path
        self.fps = fps
        self._writer = None
        self._frame_dir = None
        self._count = 0
        self._out_path = path
        try:
            import imageio

            self._writer = imageio.get_writer(
                path, mode="I", fps=fps, codec="libx264"
            )
        except Exception:
            try:
                self._out_path = path.rsplit(".", 1)[0] + ".avi"
                self._writer = MJPEGWriter(self._out_path, fps=fps)
            except Exception:
                self._writer = None
                self._frame_dir = path.rsplit(".", 1)[0] + "_frames"
                os.makedirs(self._frame_dir, exist_ok=True)

    def append_data(self, frame) -> None:
        if self._writer is not None:
            self._writer.append_data(frame)
        else:
            from PIL import Image

            Image.fromarray(frame).save(
                os.path.join(self._frame_dir, f"{self._count:05d}.png")
            )
        self._count += 1

    @property
    def output_path(self) -> str:
        return self._out_path if self._writer is not None else self._frame_dir

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
