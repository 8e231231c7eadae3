"""Device-side resize / degradation transforms.

The reference does all of this on the host with PIL/torchvision per image
(``src/transformers.py:73-82``): bicubic resize to the HR clip size and a
bilinear downscale + per-image gaussian noise for the LR input. Here the hot
transforms are jit-compiled batched device ops (``jax.image.resize``), leaving
only decode + one resize-to-canonical-size on the host (see
``srgan_tpu.data``).

Fidelity note (documented deviation, SURVEY.md §7(a)): the reference degrades
the *original* image to LR while normalizing the same original to HR; we
degrade the canonical HR tensor. With sources larger than the HR clip the two
differ only by resampling error of the intermediate; PSNR parity is gated by
the golden-tolerance tests in ``tests/test_resize.py``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def resize_bicubic(img: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bicubic resize of an HWC/NHWC image to (height, width), antialiased
    when downscaling — the analogue of ``transforms.Resize(..., BICUBIC)``
    (``src/transformers.py:80``)."""
    shape = (*img.shape[:-3], *size, img.shape[-1])
    return jax.image.resize(img, shape, method="cubic", antialias=True)


def resize_bilinear(img: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize (torchvision ``Resize`` default interpolation, used by
    ``downward_img_quality``, ``src/transformers.py:74``)."""
    shape = (*img.shape[:-3], *size, img.shape[-1])
    return jax.image.resize(img, shape, method="bilinear", antialias=True)


@functools.partial(jax.jit, static_argnames=("factor",))
def degrade_batch(
    hr: jax.Array, key: jax.Array, *, factor: int = 4, noise_std_max: float = 0.03
) -> jax.Array:
    """HR NHWC batch → noisy LR batch.

    Mirrors ``downward_img_quality`` (``src/transformers.py:73-77``): bilinear
    downscale by ``factor``, then additive gaussian noise whose stddev is
    drawn per image from U(0, noise_std_max) — the reference samples a fresh
    severity per ``__call__``, i.e. per image.
    """
    b, h, w, _ = hr.shape
    lr = resize_bilinear(hr, (h // factor, w // factor))
    k_std, k_noise = jax.random.split(key)
    std = jax.random.uniform(
        k_std, (b, 1, 1, 1), minval=0.0, maxval=noise_std_max, dtype=lr.dtype
    )
    noise = jax.random.normal(k_noise, lr.shape, dtype=lr.dtype)
    return lr + noise * std


@functools.partial(jax.jit, static_argnames=("factor",))
def prepare_batch(
    hr_u8: jax.Array, key: jax.Array, *, factor: int = 4,
    noise_std_max: float = 0.03,
):
    """uint8 HR batch → (float32 HR, degraded float32 LR), all on device.

    Batches travel host→device as uint8 (4x less transfer than float32 —
    lossless, the host resampler outputs uint8-grid values); the /255
    conversion and the LR degradation run fused on device.
    """
    hr = hr_u8.astype(jnp.float32) * (1.0 / 255.0)
    lr = degrade_batch(hr, key, factor=factor, noise_std_max=noise_std_max)
    return hr, lr


@functools.partial(jax.jit, static_argnames=("factor",), donate_argnums=())
def gather_prepare_batch(
    dataset_u8: jax.Array, idx: jax.Array, key: jax.Array, *,
    factor: int = 4, noise_std_max: float = 0.03,
):
    """Device-resident-dataset path: gather a batch by index from the uint8
    dataset cached in HBM, then convert + degrade — zero host→device bytes
    per step after the one-time dataset upload."""
    hr_u8 = jnp.take(dataset_u8, idx, axis=0)
    return prepare_batch(
        hr_u8, key, factor=factor, noise_std_max=noise_std_max
    )


@jax.jit
def add_gaussian_noise(
    img: jax.Array, key: jax.Array, std: float = 0.01, mean: float = 0.0
) -> jax.Array:
    """``AddGaussianNoise`` (``src/transformers.py:9-36``): additive N(mean,
    std) noise, clipped back to [0, 1]."""
    noise = jax.random.normal(key, img.shape, dtype=img.dtype) * std + mean
    return jnp.clip(img + noise, 0.0, 1.0)


def add_salt_pepper(
    img: jax.Array,
    key: jax.Array,
    salt_prob: float = 0.001,
    pepper_prob: float = 0.001,
) -> jax.Array:
    """Vectorized salt-and-pepper spots for an HWC image.

    Reference ``AddSaltPepperSpots`` (``src/transformers.py:39-70``) loops
    over sampled coordinates on the host; here each pixel is independently
    salted/peppered with probability ~ U(0, p) * p-scaled masks — same
    expected corruption density, fully parallel, jit/TPU-friendly (no
    data-dependent loop bounds).
    """
    k_s, k_p, k_su, k_pu = jax.random.split(key, 4)
    h, w, _ = img.shape
    salt_density = jax.random.uniform(k_su, (), minval=0.0, maxval=salt_prob)
    pepper_density = jax.random.uniform(k_pu, (), minval=0.0, maxval=pepper_prob)
    salt = jax.random.uniform(k_s, (h, w, 1)) < salt_density
    pepper = jax.random.uniform(k_p, (h, w, 1)) < pepper_density
    img = jnp.where(salt, 1.0, img)
    return jnp.where(pepper, 0.0, img)
