"""ctypes binding for the native C++ image loader.

Optional fast path: if ``libsrgan_loader.so`` has been built (``build.sh``),
``load_batch`` decodes + resizes a whole batch on C++ threads with the GIL
released (ctypes releases it for the call's duration). Falls back cleanly —
callers check :func:`available` (see ``srgan_tpu.data.dataset``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libsrgan_loader.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    try:
        _bind(lib)
    except AttributeError:
        # Stale .so predating the current API (missing version/u8/encoder
        # symbols): treat as not-built — available() rebuilds once, and
        # every caller must survive a None here (PIL fallback), not crash
        # on a missing attribute.
        return None
    _lib = lib
    return lib


def _bind(lib) -> None:
    """Declare every exported symbol's signature; raises AttributeError on
    a library too old to have one of them."""
    lib.srgan_load_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.srgan_load_image.restype = ctypes.c_int
    lib.srgan_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.srgan_load_batch.restype = ctypes.c_int
    lib.srgan_load_image_u8.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.srgan_load_image_u8.restype = ctypes.c_int
    lib.srgan_load_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.srgan_load_batch_u8.restype = ctypes.c_int
    lib.srgan_loader_version.restype = ctypes.c_int
    lib.srgan_save_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.srgan_save_image.restype = ctypes.c_int
    lib.srgan_save_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.srgan_save_batch.restype = ctypes.c_int
    lib.srgan_save_image_u8.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.srgan_save_image_u8.restype = ctypes.c_int
    lib.srgan_save_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.srgan_save_batch_u8.restype = ctypes.c_int


def build() -> bool:
    """Compile the shared library (g++). Returns True on success."""
    script = os.path.join(os.path.dirname(__file__), "build.sh")
    # Unlink the old .so first: dlopen identifies already-loaded libraries
    # by (dev, inode), so rebuilding INTO the same inode would make the
    # post-build CDLL return the stale cached handle (and rewriting a file
    # that backs live mappings is unsafe). Unlinking keeps existing
    # mappings alive on the orphaned inode while the build creates a fresh
    # one that loads as a genuinely new library.
    try:
        os.unlink(_LIB_PATH)
    except OSError:
        pass
    try:
        subprocess.run(["sh", script], check=True, capture_output=True)
    except (subprocess.CalledProcessError, OSError):
        return False
    global _lib
    _lib = None
    return _load() is not None


_BUILD_TRIED = False


def available() -> bool:
    """True when the shared library is loadable; attempts a one-time
    automatic build (g++, ~2 s) if it is missing — falls back silently so
    environments without a toolchain just use the PIL path."""
    global _BUILD_TRIED
    if _load() is not None:
        return True
    if not _BUILD_TRIED:
        _BUILD_TRIED = True
        build()
    return _load() is not None


def encoder_available() -> bool:
    """True when the library exposes the v4 encoder API (float + uint8
    save); rebuilds once if a stale pre-encoder ``.so`` is on disk."""
    if not available():
        return False
    lib = _load()
    if lib.srgan_loader_version() >= 4:
        return True
    if build():
        lib = _load()
        return lib is not None and lib.srgan_loader_version() >= 4
    return False


def save_image(path: str, img: np.ndarray) -> bool:
    """Encode one HWC float32 [0,1] image (PNG, or JPEG for .jpg/.jpeg).
    uint8 conversion matches ``utils.image_io.array_to_image``."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader not built (run native.build())")
    img = np.ascontiguousarray(img, dtype=np.float32)
    h, w, _ = img.shape
    rc = lib.srgan_save_image(
        path.encode(), h, w,
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return rc == 0


def save_batch(
    paths: List[str], imgs: np.ndarray, num_threads: int = 4
) -> np.ndarray:
    """Encode a batch (n, h, w, 3) float32 on C++ threads (GIL released for
    the whole batch). Returns an ok mask."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader not built (run native.build())")
    imgs = np.ascontiguousarray(imgs, dtype=np.float32)
    n, h, w, _ = imgs.shape
    status = np.empty(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.srgan_save_batch(
        arr, n, h, w,
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    return status == 0


def save_batch_u8(
    paths: List[str], imgs: np.ndarray, num_threads: int = 4
) -> np.ndarray:
    """Encode a uint8 (n, h, w, 3) batch on C++ threads — the zero-copy
    sink for device-quantized SR frames (``steps.infer_step_u8``)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader not built (run native.build())")
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    n, h, w, _ = imgs.shape
    status = np.empty(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.srgan_save_batch_u8(
        arr, n, h, w,
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    return status == 0


def load_image(path: str, out_h: int, out_w: int) -> Optional[np.ndarray]:
    """Decode + PIL-parity bicubic resize one image to (out_h, out_w, 3)
    float32 [0,1]; None for corrupt/unreadable files."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader not built (run native.build())")
    out = np.empty((out_h, out_w, 3), np.float32)
    rc = lib.srgan_load_image(
        path.encode(), out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def load_image_u8(path: str, out_h: int, out_w: int) -> Optional[np.ndarray]:
    """uint8 variant of :func:`load_image`."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader not built (run native.build())")
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.srgan_load_image_u8(
        path.encode(), out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None


def load_batch(
    paths: List[str], out_h: int, out_w: int, num_threads: int = 4
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode a batch on C++ threads. Returns (batch, ok_mask):
    batch (n, out_h, out_w, 3) float32, ok_mask (n,) bool (False entries are
    corrupt files — content undefined, drop them)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader not built (run native.build())")
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    status = np.empty(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.srgan_load_batch(
        arr, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    return out, status == 0


def load_batch_u8(
    paths: List[str], out_h: int, out_w: int, num_threads: int = 4
) -> Tuple[np.ndarray, np.ndarray]:
    """Like :func:`load_batch` but uint8 output (lossless — the resampler
    quantizes to the uint8 grid per pass anyway). Keeps host→device batch
    transfers 4x smaller."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader not built (run native.build())")
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    status = np.empty(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.srgan_load_batch_u8(
        arr, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    return out, status == 0
