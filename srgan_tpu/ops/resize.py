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
the golden-tolerance tests in ``tests/test_resize.py``. Pinned tolerances
(vs the reference's host oracles): bilinear downscale max|Δ| < 2e-3 vs torch
antialiased interpolate; bicubic downscale < 6e-3; bicubic upscale < 1e-5 vs
float-mode PIL (identical a=-0.5 Keys kernel); degrade-from-HR vs
degrade-from-original LR agreement ≥ 38 dB PSNR on synthetic sets.
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


@functools.partial(
    jax.jit,
    static_argnames=("factor", "salt_prob", "pepper_prob", "spot_size"),
)
def degrade_batch(
    hr: jax.Array, key: jax.Array, *, factor: int = 4,
    noise_std_max: float = 0.03,
    salt_prob: float = 0.0, pepper_prob: float = 0.0, spot_size: int = 1,
) -> jax.Array:
    """HR NHWC batch → noisy LR batch.

    Mirrors ``downward_img_quality`` (``src/transformers.py:73-77``): bilinear
    downscale by ``factor``, then additive gaussian noise whose stddev is
    drawn per image from U(0, noise_std_max) — the reference samples a fresh
    severity per ``__call__``, i.e. per image. Optional salt & pepper spots
    (``src/transformers.py:39-70``, off by default like the reference's
    unused transform) are applied per image after the noise.
    """
    b, h, w, _ = hr.shape
    lr = resize_bilinear(hr, (h // factor, w // factor))
    k_std, k_noise, k_sp = jax.random.split(key, 3)
    std = jax.random.uniform(
        k_std, (b, 1, 1, 1), minval=0.0, maxval=noise_std_max, dtype=lr.dtype
    )
    noise = jax.random.normal(k_noise, lr.shape, dtype=lr.dtype)
    lr = lr + noise * std
    if salt_prob > 0.0 or pepper_prob > 0.0:
        keys = jax.random.split(k_sp, b)
        lr = jax.vmap(
            lambda im, k: add_salt_pepper(
                im, k, salt_prob, pepper_prob, spot_size
            )
        )(lr, keys)
    return lr


def random_flips(imgs: jax.Array, key: jax.Array) -> jax.Array:
    """Per-image random horizontal/vertical flips (the 4 shape-preserving
    dihedral elements — rotations would swap H/W on non-square clips).

    A training-time augmentation the reference lacks (its pipeline is
    resize + noise only, ``src/transformers.py:73-95``); on TPU it is two
    reversed copies + two selects fused into the batch-prep graph —
    negligible next to the conv tower. Applied to the HR batch BEFORE
    degradation so the LR view is the degraded flip of the same image
    (label-consistent pairs)."""
    b = imgs.shape[0]
    kh, kv = jax.random.split(key)
    fh = jax.random.bernoulli(kh, 0.5, (b, 1, 1, 1))
    fv = jax.random.bernoulli(kv, 0.5, (b, 1, 1, 1))
    imgs = jnp.where(fh, imgs[:, :, ::-1, :], imgs)
    return jnp.where(fv, imgs[:, ::-1, :, :], imgs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "factor", "salt_prob", "pepper_prob", "spot_size", "augment_flips",
    ),
)
def prepare_batch(
    hr_u8: jax.Array, key: jax.Array, *, factor: int = 4,
    noise_std_max: float = 0.03,
    salt_prob: float = 0.0, pepper_prob: float = 0.0, spot_size: int = 1,
    augment_flips: bool = False,
):
    """uint8 HR batch → (float32 HR, degraded float32 LR), all on device.

    Batches travel host→device as uint8 (4x less transfer than float32 —
    lossless, the host resampler outputs uint8-grid values); the /255
    conversion and the LR degradation run fused on device.
    """
    if augment_flips:
        # Split only when augmenting so augment-off runs keep their exact
        # historical RNG stream (bit-reproducibility of recorded figures).
        k_aug, key = jax.random.split(key)
        hr_u8 = random_flips(hr_u8, k_aug)
    hr = hr_u8.astype(jnp.float32) * (1.0 / 255.0)
    lr = degrade_batch(
        hr, key, factor=factor, noise_std_max=noise_std_max,
        salt_prob=salt_prob, pepper_prob=pepper_prob, spot_size=spot_size,
    )
    return hr, lr


@functools.partial(
    jax.jit,
    static_argnames=(
        "factor", "salt_prob", "pepper_prob", "spot_size", "augment_flips",
    ),
    donate_argnums=(),
)
def gather_prepare_batch(
    dataset_u8: jax.Array, idx: jax.Array, key: jax.Array, *,
    factor: int = 4, noise_std_max: float = 0.03,
    salt_prob: float = 0.0, pepper_prob: float = 0.0, spot_size: int = 1,
    augment_flips: bool = False,
):
    """Device-resident-dataset path: gather a batch by index from the uint8
    dataset cached in HBM, then convert + degrade — zero host→device bytes
    per step after the one-time dataset upload."""
    hr_u8 = jnp.take(dataset_u8, idx, axis=0)
    return prepare_batch(
        hr_u8, key, factor=factor, noise_std_max=noise_std_max,
        salt_prob=salt_prob, pepper_prob=pepper_prob, spot_size=spot_size,
        augment_flips=augment_flips,
    )


@jax.jit
def add_gaussian_noise(
    img: jax.Array, key: jax.Array, std: float = 0.01, mean: float = 0.0
) -> jax.Array:
    """``AddGaussianNoise`` (``src/transformers.py:9-36``): additive N(mean,
    std) noise, clipped back to [0, 1]."""
    noise = jax.random.normal(key, img.shape, dtype=img.dtype) * std + mean
    return jnp.clip(img + noise, 0.0, 1.0)


def grow_spots(seeds: jax.Array, spot_size: int) -> jax.Array:
    """Dilate a boolean (H, W) seed mask so each seed at (y, x) covers the
    square [y, y+spot_size) x [x, x+spot_size) — the exact footprint of the
    reference's ``img[:, y:y+s, x:x+s] = v`` spot writes
    (``src/transformers.py:60,68``), expressed as one max-pool window op
    instead of a host-side coordinate loop."""
    if spot_size <= 1:
        return seeds
    s = spot_size
    grown = jax.lax.reduce_window(
        seeds.astype(jnp.float32),
        0.0,
        jax.lax.max,
        window_dimensions=(s, s),
        window_strides=(1, 1),
        padding=((s - 1, 0), (s - 1, 0)),
    )
    return grown > 0.0


def add_salt_pepper(
    img: jax.Array,
    key: jax.Array,
    salt_prob: float = 0.001,
    pepper_prob: float = 0.001,
    spot_size: int = 1,
) -> jax.Array:
    """Vectorized salt-and-pepper spots for an HWC image.

    Reference ``AddSaltPepperSpots`` (``src/transformers.py:39-70``) draws
    ``num_pixels * U(0, p)`` square spots and writes them in a host-side
    coordinate loop. TPU-native equivalence: every valid top-left position
    seeds independently with the density that gives the same expected spot
    count, and seeds are dilated to ``spot_size``-square footprints with a
    max-pool window — same expected corruption density and identical spot
    geometry (incl. overlap semantics: salt first, pepper wins), fully
    parallel, no data-dependent loop bounds.
    """
    k_s, k_p, k_su, k_pu = jax.random.split(key, 4)
    h, w, _ = img.shape
    s = spot_size
    # Reference spot count is num_pixels * U(0, p) over (h-s+1)(w-s+1)
    # valid top-left coords → per-position seed density scales by the ratio.
    scale = (h * w) / float((h - s + 1) * (w - s + 1))
    salt_density = (
        jax.random.uniform(k_su, (), minval=0.0, maxval=salt_prob) * scale
    )
    pepper_density = (
        jax.random.uniform(k_pu, (), minval=0.0, maxval=pepper_prob) * scale
    )
    row_valid = (jnp.arange(h) < (h - s + 1))[:, None]
    col_valid = (jnp.arange(w) < (w - s + 1))[None, :]
    valid = row_valid & col_valid

    def spot_mask(k, density):
        seeds = (jax.random.uniform(k, (h, w)) < density) & valid
        return grow_spots(seeds, s)[:, :, None]

    img = jnp.where(spot_mask(k_s, salt_density), 1.0, img)
    return jnp.where(spot_mask(k_p, pepper_density), 0.0, img)
