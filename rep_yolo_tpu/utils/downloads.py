"""Weight/file download helpers.

Counterpart of the reference's `attempt_download` / gdrive fetch
(reference utils/google_utils.py:19-120): resolve a missing weights file
from a release URL with retry, size sanity-check, and graceful offline
failure. Uses urllib only (no requests dependency); callers in air-gapped
environments simply get the FileNotFoundError path.
"""

from __future__ import annotations

import os
import time
import urllib.request
from pathlib import Path

RELEASE_URL = os.environ.get(
    "REP_YOLO_RELEASE_URL",
    "https://github.com/example/rep-yolo-tpu/releases/download/v1.0")


def safe_download(url: str, dest: str | Path, min_bytes: float = 1e5,
                  retries: int = 3) -> Path:
    """Download url -> dest with retry + size check (reference
    utils/google_utils.py:26-52)."""
    dest = Path(dest)
    dest.parent.mkdir(parents=True, exist_ok=True)
    err = None
    for attempt in range(retries):
        try:
            urllib.request.urlretrieve(url, dest)
            if dest.exists() and dest.stat().st_size > min_bytes:
                return dest
            raise IOError(f"downloaded file too small: {dest}")
        except Exception as e:  # noqa: BLE001 - network errors vary widely
            err = e
            if dest.exists():
                dest.unlink()
            time.sleep(1.0 * (attempt + 1))
    raise FileNotFoundError(
        f"download failed after {retries} attempts: {url} ({err})")


def attempt_download(weights: str | Path) -> Path:
    """Return the weights path, fetching from the release bucket when the
    file is missing (reference utils/google_utils.py:19-24)."""
    weights = Path(str(weights).strip().replace("'", ""))
    if weights.exists() or str(weights) == "":
        return weights
    name = weights.name
    return safe_download(f"{RELEASE_URL}/{name}", weights)
