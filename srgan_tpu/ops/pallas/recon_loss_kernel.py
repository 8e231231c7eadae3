"""Pallas TPU kernels for the reconstruction loss (edge-weighted L1 +
masked TV) — the training objective's non-matmul hot path.

Why a kernel: the loss (``src/utils.py:173-241`` semantics, see
``srgan_tpu.ops.recon_loss``) is a stack of depthwise 3x3 stencils over
C=3 NHWC images plus global reductions. With only 3 channels the lane
dimension of an NHWC conv is nearly empty on TPU (3/128 utilization), so the
XLA conv path wastes the VPU. These kernels relayout the batch as
(B*C, H, W) planes — W rides the 128-wide lane dimension at full width — and
compute each 3x3 stencil as 9 shifted adds in VMEM, fused with the
reductions, in two passes:

  pass 1 (``_edge_stats_kernel``):  sobel-magnitude edge map + its global
      sum / sum-of-squares (for the mean-1/std-0.2 renormalization).
  pass 2 (``_loss_sums_kernel``):   recomputes the (cheap) edge map, applies
      the normalization scalars, and accumulates the three loss reductions:
      Σ|hr−sr|·edges, Σedges, Σ|K*sr|·(1−edges).

The backward pass (gradient w.r.t. ``sr`` only — ``hr`` is data, exactly the
set of gradients the training step needs) is one more fused elementwise pass
(``_grad_kernel``), wired up through ``jax.custom_vjp``.

Each grid step processes one full (H, W) plane (≤ 2 MB fp32 for the 512x1024
reference clip — fits VMEM comfortably alongside temporaries).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU


def _shift_sum(x, weights):
    """Σ_ij w[i,j] * shift(x, i-1, j-1) with zero boundary — a 3x3 'same'
    correlation done as 9 shifted adds on the VPU (no conv, no matmul)."""
    h, w = x.shape
    xp = jnp.pad(x, ((1, 1), (1, 1)))
    out = jnp.zeros_like(x)
    for di in range(3):
        for dj in range(3):
            wt = weights[di][dj]
            if wt == 0.0:
                continue
            out = out + wt * jax.lax.slice(xp, (di, dj), (di + h, dj + w))
    return out


# Kernel weight tables (match srgan_tpu.ops.filters constants).
_SOBEL_X_W = ((-5.0, 0.0, 5.0), (-5.0, 0.0, 5.0), (-5.0, 0.0, 5.0))
_SOBEL_Y_W = ((-5.0, -5.0, -5.0), (0.0, 0.0, 0.0), (5.0, 5.0, 5.0))
_DIFF_W = (
    (-0.125, -0.125, -0.125),
    (-0.125, 1.0, -0.125),
    (-0.125, -0.125, -0.125),
)


def _edges_raw(hr_plane):
    ex = jnp.abs(_shift_sum(hr_plane, _SOBEL_X_W))
    ey = jnp.abs(_shift_sum(hr_plane, _SOBEL_Y_W))
    return jnp.maximum(ex, ey)


def _edge_stats_kernel(hr_ref, sum_ref, sumsq_ref):
    e = _edges_raw(hr_ref[0])
    sum_ref[0, 0] = jnp.sum(e)
    sumsq_ref[0, 0] = jnp.sum(e * e)


def _loss_sums_kernel(hr_ref, sr_ref, scale_ref, wdiff_ref, esum_ref, tv_ref):
    mean = scale_ref[0, 0]
    std = scale_ref[0, 1]
    hr = hr_ref[0]
    sr = sr_ref[0]
    e = _edges_raw(hr)
    e = jnp.clip((e - mean) / std * 0.2 + 1.0, 0.0, 2.0)
    wdiff_ref[0, 0] = jnp.sum(jnp.abs(hr - sr) * e)
    esum_ref[0, 0] = jnp.sum(e)
    tv_ref[0, 0] = jnp.sum(jnp.abs(_shift_sum(sr, _DIFF_W)) * (1.0 - e))


def _grad_kernel(hr_ref, sr_ref, scale_ref, dsr_ref):
    """d(edge_loss + tv_loss)/d sr for one plane.

    edge term: -sign(hr-sr) * edges * (g_edge / Σedges)
    tv term:   correlate(sign(K*sr) * (1-edges), K) * (g_tv / N)  [K symmetric]
    The scalar prefactors arrive via scale_ref:
      [0,0]=mean, [0,1]=std, [0,2]=g_edge/Σedges, [0,3]=g_tv/N (0 if relu off).
    """
    mean = scale_ref[0, 0]
    std = scale_ref[0, 1]
    c_edge = scale_ref[0, 2]
    c_tv = scale_ref[0, 3]
    hr = hr_ref[0]
    sr = sr_ref[0]
    e = _edges_raw(hr)
    e = jnp.clip((e - mean) / std * 0.2 + 1.0, 0.0, 2.0)
    g_edge = -jnp.sign(hr - sr) * e * c_edge
    inner = jnp.sign(_shift_sum(sr, _DIFF_W)) * (1.0 - e)
    g_tv = _shift_sum(inner, _DIFF_W) * c_tv  # K symmetric ⇒ corr == conv
    dsr_ref[0] = g_edge + g_tv


def _planes(x: jax.Array) -> jax.Array:
    """NHWC → (B*C, H, W): full-width rows on the lane dimension."""
    b, h, w, c = x.shape
    return x.transpose(0, 3, 1, 2).reshape(b * c, h, w)


def _plane_call(kernel, n, h, w, n_scalar_out, inputs, scalar_in=None):
    """Run ``kernel`` over a (n,) grid of (1, H, W) plane blocks, returning
    per-plane (n, 1) scalar accumulators."""
    in_specs = [
        pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for _ in inputs
    ]
    args = list(inputs)
    if scalar_in is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, scalar_in.shape[1]), lambda i: (0, 0),
                memory_space=pltpu.SMEM,
            )
        )
        args.append(scalar_in)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM)
            for _ in range(n_scalar_out)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n, 1), jnp.float32)
            for _ in range(n_scalar_out)
        ),
        interpret=_INTERPRET,
    )(*args)


def _bessel_stats(s: jax.Array, ss: jax.Array, count: int):
    total = jnp.sum(s)
    mean = total / count
    var = (jnp.sum(ss) - count * mean * mean) / (count - 1)  # torch-style
    return mean, jnp.sqrt(var)


def _forward_impl(hr: jax.Array, sr: jax.Array):
    b, h, w, c = hr.shape
    n = b * c
    count = b * h * w * c
    hr_p = _planes(hr.astype(jnp.float32))
    sr_p = _planes(sr.astype(jnp.float32))

    e_sum, e_sumsq = _plane_call(_edge_stats_kernel, n, h, w, 2, (hr_p,))
    mean, std = _bessel_stats(e_sum, e_sumsq, count)
    scale = jnp.stack([mean, std]).reshape(1, 2)

    wdiff, esum, tv = _plane_call(
        _loss_sums_kernel, n, h, w, 3, (hr_p, sr_p), scalar_in=scale
    )
    edge_total = jnp.sum(esum)
    edge_loss = jnp.sum(wdiff) / edge_total
    tv_mean = jnp.sum(tv) / count
    tv_loss = jax.nn.relu(tv_mean)
    return edge_loss, tv_loss, (mean, std, edge_total, tv_mean)


@jax.custom_vjp
def reconstruction_loss_pallas(
    hr: jax.Array, sr: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    edge_loss, tv_loss, _ = _forward_impl(hr, sr)
    return edge_loss, tv_loss


def _fwd(hr, sr):
    edge_loss, tv_loss, (mean, std, edge_total, tv_mean) = _forward_impl(hr, sr)
    return (edge_loss, tv_loss), (hr, sr, mean, std, edge_total, tv_mean)


def _bwd(residuals, cotangents):
    hr, sr, mean, std, edge_total, tv_mean = residuals
    g_edge, g_tv = cotangents
    b, h, w, c = hr.shape
    n = b * c
    count = b * h * w * c

    c_edge = g_edge / edge_total
    # relu gate: d relu(m)/dm = (m > 0)
    c_tv = jnp.where(tv_mean > 0, g_tv / count, 0.0)
    scale = jnp.stack([mean, std, c_edge, c_tv]).reshape(1, 4)

    hr_p = _planes(hr.astype(jnp.float32))
    sr_p = _planes(sr.astype(jnp.float32))
    dsr_p = pl.pallas_call(
        _grad_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        interpret=_INTERPRET,
    )(hr_p, sr_p, scale)

    dsr = dsr_p.reshape(b, c, h, w).transpose(0, 2, 3, 1).astype(sr.dtype)
    # hr is the target image (data): no gradient, like the reference where
    # autograd never reaches the HR tensor.
    return jnp.zeros_like(hr), dsr


reconstruction_loss_pallas.defvjp(_fwd, _bwd)
