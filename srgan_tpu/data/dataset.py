"""Host-side image datasets: folder scan, decode, corrupt-file skipping.

Capability parity with the reference's two datasets:
  - ``ImageDatasetWithTransforms`` (``src/utils.py:19-47``): one folder of
    images; each item yields (HR, LR) derived from the same source.
  - ``ImageDataset`` (``src/utils.py:50-90``): two parallel folders (e.g.
    ``LRbicx4/`` and ``original/``) for paired evaluation, asserting equal
    counts.

TPU-native split of work: the host does decode + one resize to the canonical
HR clip size (PIL, matching the reference's bicubic ``normalize_img_size``,
``src/transformers.py:79-82``); the LR degradation + noise runs batched on
device (``srgan_tpu.ops.resize.degrade_batch``). Corrupt files are skipped at
scan/decode time (the reference raises IndexError mid-epoch,
``src/utils.py:38-40`` — we keep the data-level fault tolerance, SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image, UnidentifiedImageError

IMAGE_EXTENSIONS = ("jpg", "jpeg", "png", "JPG")  # ``src/utils.py:27``


def list_image_files(folder: str) -> List[str]:
    return sorted(
        f for f in os.listdir(folder) if f.endswith(IMAGE_EXTENSIONS)
    )


def load_image_rgb(path: str) -> Optional[np.ndarray]:
    """Decode an image to HWC uint8 RGB; None on corrupt/unreadable files."""
    try:
        with Image.open(path) as img:
            return np.asarray(img.convert("RGB"))
    except (UnidentifiedImageError, IOError, OSError):
        return None


def load_hr_clip(
    path: str, hr_size: Tuple[int, int], *, use_native: Optional[bool] = None
) -> Optional[np.ndarray]:
    """Decode + bicubic resize to (height, width), float32 in [0, 1] HWC.

    Matches ``normalize_img_size``: PIL BICUBIC to the fixed clip size then
    ToTensor scaling (``src/transformers.py:79-82``). Uses the native C++
    loader (``srgan_tpu.native``, PIL-parity resampler, GIL-free) when its
    shared library is built; PIL otherwise.
    """
    if use_native is None:
        use_native = _native_available()
    if use_native:
        from srgan_tpu import native

        return native.load_image(path, hr_size[0], hr_size[1])
    try:
        with Image.open(path) as img:
            img = img.convert("RGB")
            h, w = hr_size
            img = img.resize((w, h), Image.BICUBIC)
            return np.asarray(img, dtype=np.float32) / 255.0
    except (UnidentifiedImageError, IOError, OSError):
        return None


def load_hr_clip_u8(
    path: str, hr_size: Tuple[int, int], *, use_native: Optional[bool] = None
) -> Optional[np.ndarray]:
    """Like :func:`load_hr_clip` but uint8 output (lossless — the bicubic
    resampler quantizes to the uint8 grid per pass): 4x smaller host→device
    transfers; /255 happens on device (``ops.resize.prepare_batch``)."""
    if use_native is None:
        use_native = _native_available()
    if use_native:
        from srgan_tpu import native

        return native.load_image_u8(path, hr_size[0], hr_size[1])
    try:
        with Image.open(path) as img:
            img = img.convert("RGB")
            h, w = hr_size
            img = img.resize((w, h), Image.BICUBIC)
            return np.asarray(img, dtype=np.uint8)
    except (UnidentifiedImageError, IOError, OSError):
        return None


def _native_available() -> bool:
    try:
        from srgan_tpu import native

        return native.available()
    except Exception:
        return False


class ImageFolderDataset:
    """Single-folder dataset yielding canonical HR clips (HWC float32).

    LR degradation happens on device per batch; see
    ``srgan_tpu.data.pipeline.TrainPipeline``.
    """

    def __init__(self, folder_path: str, hr_size: Tuple[int, int] = (512, 1024)):
        self.folder_path = folder_path
        self.hr_size = hr_size
        self.image_files = list_image_files(folder_path)

    def __len__(self) -> int:
        return len(self.image_files)

    def path(self, idx: int) -> str:
        return os.path.join(self.folder_path, self.image_files[idx])

    def __getitem__(self, idx: int) -> Optional[np.ndarray]:
        return load_hr_clip(self.path(idx), self.hr_size)


class PairedImageDataset:
    """Two parallel folders of already-paired LR/HR images for evaluation.

    Reference ``ImageDataset`` (``src/utils.py:50-90``): asserts equal counts;
    corrupt files are skipped (the reference's skip-forward recursion is buggy
    — ``utils.py:80-88`` — ours simply drops the pair).
    """

    def __init__(self, folder_path: str, path1: str, path2: str):
        self.dir1 = os.path.join(folder_path, path1)
        self.dir2 = os.path.join(folder_path, path2)
        self.files1 = list_image_files(self.dir1)
        self.files2 = list_image_files(self.dir2)
        assert len(self.files1) == len(self.files2), (
            "the sizes have to be the same!!!"  # ``src/utils.py:66``
        )

    def __len__(self) -> int:
        return len(self.files1)

    def __getitem__(self, idx: int):
        """Returns (img1, img2) as HWC float32 in [0,1], or None if either
        image is corrupt."""
        a = load_image_rgb(os.path.join(self.dir1, self.files1[idx]))
        b = load_image_rgb(os.path.join(self.dir2, self.files2[idx]))
        if a is None or b is None:
            return None
        return a.astype(np.float32) / 255.0, b.astype(np.float32) / 255.0


def split_indices(
    n: int, split_ratio: float, seed: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Seeded random split of ``range(n)``.

    The reference uses an *unseeded* 70/30 ``random_split`` and discards the
    30% (``src/train.py:82-87``); we make the split reproducible (documented
    deviation, SURVEY.md appendix).
    """
    perm = np.random.default_rng(seed).permutation(n)
    cut = int(split_ratio * n)
    return perm[:cut], perm[cut:]
