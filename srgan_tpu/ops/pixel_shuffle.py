"""Pixel-shuffle (depth-to-space) for NHWC batches.

The reference upsamples with ``nn.PixelShuffle(2)`` on NCHW tensors
(``src/models.py:72-76``). On TPU the natural layout is NHWC, where
pixel-shuffle is a reshape + transpose that XLA fuses into the producing
convolution's output layout — no materialized intermediate.

Channel-order note: torch's PixelShuffle on NCHW splits channels as
(C_out, r, r); we match that order so ported weights produce identical
images.
"""

from __future__ import annotations

import jax


def pixel_shuffle(x: jax.Array, upscale_factor: int = 2) -> jax.Array:
    """(B, H, W, C*r*r) → (B, H*r, W*r, C), torch channel convention."""
    r = upscale_factor
    b, h, w, c = x.shape
    if c % (r * r) != 0:
        raise ValueError(f"channels {c} not divisible by r^2={r * r}")
    c_out = c // (r * r)
    # torch splits NCHW channels as (c_out, r, r): flattened index is
    # co*r*r + rh*r + rw. Our NHWC channel axis uses the same flat order.
    x = x.reshape(b, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, rh, w, rw, c_out
    return x.reshape(b, h * r, w * r, c_out)


def pixel_unshuffle(x: jax.Array, downscale_factor: int = 2) -> jax.Array:
    """Inverse of :func:`pixel_shuffle` (space-to-depth)."""
    r = downscale_factor
    b, h, w, c = x.shape
    if h % r or w % r:
        raise ValueError(f"spatial dims ({h},{w}) not divisible by r={r}")
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h/r, w/r, c, rh, rw
    return x.reshape(b, h // r, w // r, c * r * r)
