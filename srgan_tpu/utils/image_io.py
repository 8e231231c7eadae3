"""Host-side image IO helpers (PIL ↔ numpy/JAX arrays)."""

from __future__ import annotations

import numpy as np
from PIL import Image


def array_to_image(arr) -> Image.Image:
    """HWC float array in [0, 1] → PIL image (clamped).

    The working replacement for the reference's ``tensor_to_image``
    (``src/utils.py:94-99``) — note that helper de-normalizes with
    ``*0.5+0.5`` although the training range is [0, 1] (SURVEY.md appendix);
    we use the pipeline's actual [0, 1] range.
    """
    arr = np.asarray(arr)
    if arr.ndim == 4:
        arr = arr[0]
    arr = np.clip(arr, 0.0, 1.0)
    return Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8))


def load_image(path: str) -> np.ndarray:
    """Decode an image to HWC float32 in [0, 1] — the working version of the
    reference's stub ``load_image`` (``src/utils.py:169-170``,
    SURVEY.md §3.3)."""
    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0


def save_image(arr, path: str) -> None:
    array_to_image(arr).save(path)
