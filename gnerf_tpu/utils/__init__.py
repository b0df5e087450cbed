"""Runtime infrastructure: configs, cameras, checkpoints, stats, misc."""

from . import camera, checkpoint, misc, profiling, stats
from .config import EasyDict, construct, register
from .logger import Logger
from .url import make_cache_dir_path, open_url

__all__ = [
    "EasyDict",
    "Logger",
    "camera",
    "checkpoint",
    "construct",
    "make_cache_dir_path",
    "misc",
    "open_url",
    "profiling",
    "register",
    "stats",
]
