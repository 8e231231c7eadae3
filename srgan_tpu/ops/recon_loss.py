"""Edge-weighted reconstruction loss + masked total-variation smoothness.

This is the reference's *active* training objective
(``src/utils.py:173-241``, called as ``g_criterion(hr, sr)`` from
``src/train.py:194``):

  1. ``edges = clamp(normalize(max(|sobel_x*HR|, |sobel_y*HR|), mean=1,
     std=0.2), 0, 2)`` — a high-pass edge importance map computed from the
     HR image, normalized *globally over the whole batch tensor* to mean 1 /
     std 0.2 (torch ``std`` is Bessel-corrected; we match, see ``_std``).
  2. ``edge_loss = sum(|HR - SR| * edges) / sum(edges)`` — edge-weighted L1.
  3. ``tv_loss = relu(mean(|DIFF_KERNEL * SR| * (1 - edges)))`` — smoothness
     penalized only *off*-edge (``src/utils.py:217-226``).

Everything is one fused XLA graph on NHWC tensors; a Pallas fast path that
fuses the three depthwise stencils and the reductions into a single pass over
VMEM tiles lives in ``srgan_tpu.ops.pallas.recon_loss_kernel`` and is selected
with ``use_pallas=True`` (TPU only).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from srgan_tpu.ops.filters import DIFF_KERNEL, depthwise_conv3x3, sobel_edge_map


def _std(x: jax.Array) -> jax.Array:
    """Bessel-corrected std over all elements, matching ``torch.std``
    (``src/utils.py:200``)."""
    n = x.size
    mean = jnp.mean(x)
    return jnp.sqrt(jnp.sum((x - mean) ** 2) / (n - 1))


def edge_importance_map(hr: jax.Array) -> jax.Array:
    """Normalized, clamped edge map of the HR batch.

    Reference ``high_pass_filter`` (``src/utils.py:198-215``): sobel magnitude
    → renormalize to mean 1 / std 0.2 over the *entire* batch tensor → clamp
    to [0, 2]. (The reference's mean-filter smoothing loop runs zero times,
    ``utils.py:210-211``, and is omitted.)
    """
    edges = sobel_edge_map(hr)
    edges = (edges - jnp.mean(edges)) / _std(edges) * 0.2 + 1.0
    return jnp.clip(edges, 0.0, 2.0)


def pallas_loss_supported(shape) -> bool:
    """Whether the Pallas reconstruction-loss kernel supports an NHWC batch
    of this shape. The kernel lays each image plane out as (H, W) with W on
    the 128-wide lane dimension and DMAs HBM row strips, so Mosaic requires
    the width to be lane-tile aligned (W % 128 == 0); misaligned widths
    (e.g. 96px test crops) must take the XLA path instead of failing in the
    TPU compiler."""
    return len(shape) == 4 and shape[2] % 128 == 0 and shape[2] > 0


def reconstruction_loss(
    hr: jax.Array, sr: jax.Array, *, use_pallas: bool | None = None
) -> Tuple[jax.Array, jax.Array]:
    """Return ``(edge_loss, tv_loss)`` for an NHWC batch pair.

    Argument order matches the reference call ``g_criterion(hr_imgs,
    sr_images)`` (``src/train.py:194``): the edge map comes from the first
    argument, the TV penalty applies to the second.

    ``use_pallas=None`` (default) selects the fused Pallas kernel on TPU
    (measured ~3.8x faster forward / ~3.2x faster backward than the XLA
    graph at reference shapes) when the shape is kernel-compatible, and the
    XLA graph elsewhere.
    """
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu" and pallas_loss_supported(hr.shape)
        )
    if use_pallas:
        from srgan_tpu.ops.pallas.recon_loss_kernel import (
            reconstruction_loss_pallas,
        )

        return reconstruction_loss_pallas(hr, sr)

    edges = edge_importance_map(hr)
    return reconstruction_loss_with_edges(hr, sr, edges)


def reconstruction_loss_with_edges(
    hr: jax.Array, sr: jax.Array, edges: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Loss terms given a precomputed edge map.

    Lets callers amortize the (HR-only) edge computation — e.g. the
    vmap-stacked generator pool shares one HR batch across N members, so the
    Sobel/normalize pass runs once instead of N times."""
    diff = jnp.abs(hr - sr)
    edge_loss = jnp.sum(diff * edges) / jnp.sum(edges)
    tv = jnp.abs(depthwise_conv3x3(sr, DIFF_KERNEL)) * (1.0 - edges)
    tv_loss = jax.nn.relu(jnp.mean(tv))
    return edge_loss, tv_loss
