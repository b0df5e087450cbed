"""`open_url`: cached URL/file opener (reference dnnlib.util.open_url parity).

Supports plain file paths, file:// URLs, and http(s) URLs with a local
cache + retry loop (`/root/reference/g_nerf/dnnlib/util.py:398+`). In
zero-egress environments http fetches fail fast with a clear error after
checking the cache."""

from __future__ import annotations

import hashlib
import io
import os
import time
import urllib.parse
import urllib.request
from typing import IO, Optional


def make_cache_dir_path(*paths: str) -> str:
    base = os.environ.get(
        "GNERF_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gnerf_tpu"),
    )
    path = os.path.join(base, *paths)
    os.makedirs(path, exist_ok=True)
    return path


def open_url(
    url: str,
    cache_dir: Optional[str] = None,
    num_attempts: int = 10,
    verbose: bool = True,
    cache: bool = True,
) -> IO[bytes]:
    """Open a file path or URL as a binary stream, with download caching."""
    assert num_attempts >= 1

    # Plain file path or file:// URL.
    if os.path.isfile(url):
        return open(url, "rb")
    parsed = urllib.parse.urlparse(url)
    if parsed.scheme == "file":
        return open(urllib.request.url2pathname(parsed.path), "rb")
    if parsed.scheme not in ("http", "https"):
        raise IOError(f"Cannot open {url!r}: not a file or http(s)/file URL")

    cache_dir = cache_dir or make_cache_dir_path("downloads")
    url_md5 = hashlib.md5(url.encode()).hexdigest()
    cache_path = os.path.join(cache_dir, url_md5)
    if cache and os.path.isfile(cache_path):
        return open(cache_path, "rb")

    last_err = None
    for attempt in range(num_attempts):
        try:
            if verbose:
                print(f"Downloading {url} (attempt {attempt + 1}) ...")
            with urllib.request.urlopen(url, timeout=30) as resp:
                data = resp.read()
            if cache:
                tmp = cache_path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(data)
                os.replace(tmp, cache_path)
            return io.BytesIO(data)
        except Exception as err:  # noqa: BLE001 — retry loop
            last_err = err
            time.sleep(min(2 ** attempt * 0.1, 5.0))
    raise IOError(
        f"Failed to download {url!r} after {num_attempts} attempts "
        f"(no-egress environment?): {last_err}"
    )
