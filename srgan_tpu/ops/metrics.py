"""Pure-JAX PSNR and SSIM, batched and jit-friendly.

The reference computes these on CPU through scikit-image, one image at a
time, forcing a device→host copy per sample inside the scoring loop
(``src/utils.py:141-151``, ``src/train.py:280-287``). Here both metrics are
computed on-device over whole NHWC batches, so scoring costs one
``device_get`` of two scalars per batch.

Fidelity notes (SURVEY.md §2, §7(a)):
  - PSNR matches ``skimage.metrics.peak_signal_noise_ratio(..., data_range=1)``
    exactly: ``10*log10(R^2 / mse)`` with the MSE over all pixels+channels.
  - SSIM matches ``skimage.metrics.structural_similarity(..., data_range=1,
    win_size=3)`` with the *correct* channel axis. (The reference passes CHW
    arrays with ``multichannel=True`` — ``src/utils.py:151`` — which makes
    skimage treat W as the channel axis; SURVEY.md pins the corrected metric
    as canonical.) Algorithm: per channel, 3x3 uniform filter, sample
    covariance (N/(N-1)), K1=0.01, K2=0.03, mean of the SSIM map over the
    interior (skimage crops ``(win-1)//2`` border pixels), averaged over
    channels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def psnr(img1: jax.Array, img2: jax.Array, data_range: float = 1.0) -> jax.Array:
    """PSNR of a single image pair (any matching shapes), in dB."""
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    mse = jnp.mean((img1 - img2) ** 2)
    return 10.0 * jnp.log10((data_range**2) / mse)


def _uniform_filter_valid3(x: jax.Array) -> jax.Array:
    """3x3 mean filter, valid padding, over the leading two axes of (H, W)."""
    s = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(3, 3),
        window_strides=(1, 1),
        padding="VALID",
    )
    return s / 9.0


def _ssim_map_single_channel(
    x: jax.Array, y: jax.Array, data_range: float
) -> jax.Array:
    """(H-2, W-2) SSIM map of one (H, W) channel pair, skimage semantics
    with win_size=3 (valid-conv output *is* skimage's interior crop)."""
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    np_ = 9.0  # window pixel count
    cov_norm = np_ / (np_ - 1.0)  # sample covariance, skimage default

    ux = _uniform_filter_valid3(x)
    uy = _uniform_filter_valid3(y)
    uxx = _uniform_filter_valid3(x * x)
    uyy = _uniform_filter_valid3(y * y)
    uxy = _uniform_filter_valid3(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    return (a1 * a2) / (b1 * b2)


def _ssim_single_channel(
    x: jax.Array, y: jax.Array, data_range: float
) -> jax.Array:
    """SSIM of one (H, W) channel pair, skimage semantics with win_size=3."""
    return jnp.mean(_ssim_map_single_channel(x, y, data_range))


def ssim(img1: jax.Array, img2: jax.Array, data_range: float = 1.0) -> jax.Array:
    """SSIM of a single HWC image pair (win_size=3, channel-averaged)."""
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    per_channel = jax.vmap(
        functools.partial(_ssim_single_channel, data_range=data_range),
        in_axes=(-1, -1),
    )(img1, img2)
    return jnp.mean(per_channel)


def psnr_masked(
    img1: jax.Array, img2: jax.Array, valid_h, valid_w,
    data_range: float = 1.0,
) -> jax.Array:
    """PSNR over the top-left ``valid_h x valid_w`` region of padded HWC
    images. With the full region valid this equals :func:`psnr` (the
    size-bucketed eval path's invariant, ``tests/test_eval.py``).

    ``valid_h``/``valid_w`` are traced scalars: one executable serves every
    image in a size bucket."""
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    h, w, c = img1.shape
    mask = (
        (jnp.arange(h) < valid_h)[:, None] & (jnp.arange(w) < valid_w)[None, :]
    )[..., None]
    sq = jnp.where(mask, (img1 - img2) ** 2, 0.0)
    mse = jnp.sum(sq) / (jnp.sum(mask) * c)
    return 10.0 * jnp.log10((data_range**2) / mse)


def ssim_masked(
    img1: jax.Array, img2: jax.Array, valid_h, valid_w,
    data_range: float = 1.0,
) -> jax.Array:
    """SSIM (win_size=3, skimage semantics) over only the 3x3 windows that
    lie fully inside the valid region of padded HWC images. Full-region
    valid ⇒ equals :func:`ssim` exactly (every valid-conv window is kept,
    matching skimage's interior crop)."""
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    h, w, _ = img1.shape
    # valid-conv map index (i, j) covers pixels [i, i+2] x [j, j+2]
    map_mask = (
        (jnp.arange(h - 2) < valid_h - 2)[:, None]
        & (jnp.arange(w - 2) < valid_w - 2)[None, :]
    )

    def one_channel(x, y):
        s = _ssim_map_single_channel(x, y, data_range)
        return jnp.sum(jnp.where(map_mask, s, 0.0)) / jnp.sum(map_mask)

    per_channel = jax.vmap(one_channel, in_axes=(-1, -1))(img1, img2)
    return jnp.mean(per_channel)


@jax.jit
def batched_psnr_ssim(batch1: jax.Array, batch2: jax.Array):
    """Per-image PSNR and SSIM over an NHWC batch; returns two (B,) arrays.

    Replaces the reference's per-image host round-trips in ``compute_score``
    (``src/train.py:280-287``) with one fused on-device computation.
    """
    p = jax.vmap(psnr)(batch1, batch2)
    s = jax.vmap(ssim)(batch1, batch2)
    return p, s
