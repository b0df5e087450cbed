"""Video output with graceful degradation.

Writes H.264 mp4 via imageio when an ffmpeg backend exists; otherwise falls
back to a numbered-PNG frame directory (`<name>_frames/%05d.png`) so the
pipeline works in hermetic environments. Same append_data/close interface
as an imageio writer."""

from __future__ import annotations

import os


class VideoWriter:
    def __init__(self, path: str, fps: int = 30):
        self.path = path
        self.fps = fps
        self._writer = None
        self._frame_dir = None
        self._count = 0
        try:
            import imageio

            self._writer = imageio.get_writer(
                path, mode="I", fps=fps, codec="libx264"
            )
        except Exception:
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
        return self.path if self._writer is not None else self._frame_dir

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
