"""Depthwise 3x3 stencil primitives (NHWC) used by the reconstruction loss
and the image enhancer.

The reference reaches these through ``torch.nn.functional.conv2d(...,
groups=3)`` with hand-built kernels (``src/utils.py:181-196``,
``src/models.py:31-34``). Here they are XLA depthwise convolutions in NHWC —
the layout the TPU vector unit wants — with the kernels built once as
constants so XLA can fold and fuse them into surrounding elementwise work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# 3x3 kernels, exactly the constants the reference builds:
# Sobel-like +/-5 edge kernels (``src/utils.py:181-188``),
SOBEL_X = np.array(
    [[-5.0, 0.0, 5.0], [-5.0, 0.0, 5.0], [-5.0, 0.0, 5.0]], dtype=np.float32
)
SOBEL_Y = SOBEL_X.T.copy()
# the 8-neighbour difference kernel with unit centre (``src/utils.py:192-194``)
DIFF_KERNEL = np.array(
    [
        [-1 / 8, -1 / 8, -1 / 8],
        [-1 / 8, 1.0, -1 / 8],
        [-1 / 8, -1 / 8, -1 / 8],
    ],
    dtype=np.float32,
)
# and the (unused-in-loop) mean filter with unit centre (``src/utils.py:189-191``).
MEAN_FILTER = np.array(
    [
        [1 / 9, 1 / 9, 1 / 9],
        [1 / 9, 1.0, 1 / 9],
        [1 / 9, 1 / 9, 1 / 9],
    ],
    dtype=np.float32,
)


def depthwise_conv3x3(x: jax.Array, kernel) -> jax.Array:
    """Depthwise 3x3 'same' convolution of an NHWC batch with one shared
    2-D kernel applied to every channel (zero padding, stride 1).

    Matches ``F.conv2d(images, k.expand(C,1,3,3), padding=1, groups=C)`` on
    the corresponding NCHW tensor (``src/utils.py:198-203``).
    """
    c = x.shape[-1]
    k = jnp.asarray(kernel, dtype=x.dtype)
    # HWIO with feature_group_count=C: (3, 3, 1, C)
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        # These stencils feed loss values and metrics: keep them full fp32
        # regardless of the surrounding compute dtype policy.
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=())
def sobel_edge_map(images: jax.Array) -> jax.Array:
    """Raw edge magnitude: max(|sobel_x * I|, |sobel_y * I|) per channel.

    Reference: ``ReconstructionLoss.high_pass_filter`` before normalization
    (``src/utils.py:198-207``).
    """
    ex = jnp.abs(depthwise_conv3x3(images, SOBEL_X))
    ey = jnp.abs(depthwise_conv3x3(images, SOBEL_Y))
    return jnp.maximum(ex, ey)


def sharpen(x: jax.Array, factor: float = 1.0) -> jax.Array:
    """Laplacian-style sharpening with clamp to [0, 1].

    Reference: ``ImageEnhancer.forward`` (``src/models.py:37-41``):
    ``clamp(x + factor * conv(x, DIFF_KERNEL, depthwise), 0, 1)``.
    """
    return jnp.clip(x + factor * depthwise_conv3x3(x, DIFF_KERNEL), 0.0, 1.0)
