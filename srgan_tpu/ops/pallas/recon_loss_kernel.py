"""Pallas TPU kernels for the reconstruction loss (edge-weighted L1 +
masked TV) — the training objective's non-matmul hot path.

Why a kernel: the loss (``src/utils.py:173-241`` semantics, see
``srgan_tpu.ops.recon_loss``) is a stack of depthwise 3x3 stencils over C=3
NHWC images plus global reductions. With only 3 channels the lane dimension
of an NHWC conv is nearly empty on TPU (3/128 utilization), so the XLA conv
path wastes the VPU and re-reads the large activations once per pass. These
kernels relayout the batch as (B*C, H, W) planes — W rides the 128-wide lane
dimension at full width — and fuse each 3x3 stencil (9 shifted adds in VMEM)
with the reductions.

Memory structure (the guide's DMA pattern): plane data stays in HBM
(``memory_space=ANY``); each grid step DMAs one row-strip plus a 1-row halo
into VMEM scratch with ``make_async_copy``, computes, and accumulates into
SMEM scalar accumulators (TPU grid steps are sequential, so read-modify-
write across steps is safe). VMEM footprint is a few strips, independent of
image size — full 512x1024 planes blew the 16MB scoped-vmem limit.

Passes:
  1. ``_edge_stats_kernel``:  sobel-magnitude edge map + global Σ / Σ²
     (for the mean-1/std-0.2 renormalization, Bessel-corrected like torch).
  2. ``_loss_sums_kernel``:   recomputes the (cheap) edge map, applies the
     normalization scalars, accumulates Σ|hr−sr|·e, Σe, Σ|K*sr|·(1−e).
  3. ``_grad_kernel``  (backward, via ``jax.custom_vjp``): d(loss)/d sr in
     one fused pass — gradient w.r.t. ``sr`` only; ``hr`` is data, exactly
     the gradient set the train step needs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU

# Rows per grid step (plus a 1-row halo on each side in scratch).
_TILE_H = 128


def _shift_sum(nb, weights, h, w):
    """Sum_ij w[i,j]*shift(x) for a (h, w) tile given its (h+2, w)
    row-padded neighbourhood ``nb`` — a 3x3 'same' correlation as 9 shifted
    adds on the VPU. Row halo comes from ``nb``; column shifts use lane
    rolls with the wrapped boundary column masked to zero (lane-axis
    pads/concats do not lower in Mosaic)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    out = jnp.zeros((h, w), nb.dtype)
    for di in range(3):
        rows = jax.lax.slice(nb, (di, 0), (di + h, w))
        for dj in range(3):
            wt = weights[di][dj]
            if wt == 0.0:
                continue
            if dj == 1:
                sh = rows
            else:
                # circular roll; negative shifts expressed mod w
                sh = pltpu.roll(rows, shift=(1 - dj) % w, axis=1)
                valid = (col >= 1) if dj == 0 else (col <= w - 2)
                sh = jnp.where(valid, sh, 0.0)
            out = out + wt * sh
    return out


# Kernel weight tables (match srgan_tpu.ops.filters constants).
_SOBEL_X_W = ((-5.0, 0.0, 5.0), (-5.0, 0.0, 5.0), (-5.0, 0.0, 5.0))
_SOBEL_Y_W = ((-5.0, -5.0, -5.0), (0.0, 0.0, 0.0), (5.0, 5.0, 5.0))
_DIFF_W = (
    (-0.125, -0.125, -0.125),
    (-0.125, 1.0, -0.125),
    (-0.125, -0.125, -0.125),
)


def _row_mask(h_total, tile_h, w, s):
    """(tile_h, w) mask of rows that lie inside the real image for strip s
    (the last strip may overhang)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w), 0)
    return (row + s * tile_h < h_total).astype(jnp.float32)


def _edges_from_strip(strip_nb, tile_h, w):
    """strip_nb: (tile_h+2, w) row-padded neighbourhood → (tile_h, w)
    raw sobel edge magnitude."""
    ex = jnp.abs(_shift_sum(strip_nb, _SOBEL_X_W, tile_h, w))
    ey = jnp.abs(_shift_sum(strip_nb, _SOBEL_Y_W, tile_h, w))
    return jnp.maximum(ex, ey)


# DMA windows must be sublane(8)-aligned in offset and size for Mosaic's
# tiled HBM layout: planes are pre-padded with _PAD_TOP zero rows on top and
# to strips*_TILE_H + 2*_PAD_TOP rows total, and every strip copies the
# aligned window [s*_TILE_H, s*_TILE_H + _TILE_H + 16). The 1- or 2-row
# stencil halo is then a static row-slice inside the window (real row r sits
# at window row r - s*_TILE_H + _PAD_TOP).
_PAD_TOP = 8


def _dma_strip(hbm_ref, i, s, scratch, sem):
    dma = pltpu.make_async_copy(
        hbm_ref.at[i, pl.ds(s * _TILE_H, _TILE_H + 2 * _PAD_TOP), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()


def _edge_stats_kernel(meta_ref, hr_hbm, sum_ref, sumsq_ref):
    i = pl.program_id(0)
    s = pl.program_id(1)
    h_total = meta_ref[0, 0]
    w = hr_hbm.shape[-1]

    def body(scratch, sem):
        _dma_strip(hr_hbm, i, s, scratch, sem)
        nb = jax.lax.slice(
            scratch[...], (_PAD_TOP - 1, 0), (_PAD_TOP + _TILE_H + 1, w)
        )
        e = _edges_from_strip(nb, _TILE_H, w)
        m = _row_mask(h_total, _TILE_H, w, s)
        e = e * m

        @pl.when((i == 0) & (s == 0))
        def _():
            sum_ref[0, 0] = 0.0
            sumsq_ref[0, 0] = 0.0

        sum_ref[0, 0] += jnp.sum(e)
        sumsq_ref[0, 0] += jnp.sum(e * e)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((_TILE_H + 2 * _PAD_TOP, w), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def _loss_sums_kernel(meta_ref, scale_ref, hr_hbm, sr_hbm,
                      wdiff_ref, esum_ref, tv_ref):
    i = pl.program_id(0)
    s = pl.program_id(1)
    h_total = meta_ref[0, 0]
    mean = scale_ref[0, 0]
    std = scale_ref[0, 1]
    w = hr_hbm.shape[-1]

    def body(hr_s, sr_s, sem):
        _dma_strip(hr_hbm, i, s, hr_s, sem)
        _dma_strip(sr_hbm, i, s, sr_s, sem)
        m = _row_mask(h_total, _TILE_H, w, s)
        hr_nb = jax.lax.slice(
            hr_s[...], (_PAD_TOP - 1, 0), (_PAD_TOP + _TILE_H + 1, w)
        )
        sr_nb = jax.lax.slice(
            sr_s[...], (_PAD_TOP - 1, 0), (_PAD_TOP + _TILE_H + 1, w)
        )
        e = _edges_from_strip(hr_nb, _TILE_H, w)
        e = jnp.clip((e - mean) / std * 0.2 + 1.0, 0.0, 2.0) * m
        hr_c = jax.lax.slice(hr_nb, (1, 0), (1 + _TILE_H, w))
        sr_c = jax.lax.slice(sr_nb, (1, 0), (1 + _TILE_H, w))
        diff_tv = jnp.abs(_shift_sum(sr_nb, _DIFF_W, _TILE_H, w))

        @pl.when((i == 0) & (s == 0))
        def _():
            wdiff_ref[0, 0] = 0.0
            esum_ref[0, 0] = 0.0
            tv_ref[0, 0] = 0.0

        wdiff_ref[0, 0] += jnp.sum(jnp.abs(hr_c - sr_c) * e)
        esum_ref[0, 0] += jnp.sum(e)
        # (1 - e) must also be masked: outside rows contribute (1-0)=1.
        tv_ref[0, 0] += jnp.sum(diff_tv * (1.0 - e) * m)

    pl.run_scoped(
        body,
        hr_s=pltpu.VMEM((_TILE_H + 2 * _PAD_TOP, w), jnp.float32),
        sr_s=pltpu.VMEM((_TILE_H + 2 * _PAD_TOP, w), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def _grad_kernel(meta_ref, scale_ref, hr_hbm, sr_hbm, dsr_ref):
    """d(edge_loss + tv_loss)/d sr for one strip.

    edge term: -sign(hr−sr)·e·c_edge
    tv term:   K * (sign(K*sr)·(1−e)) · c_tv   [K symmetric ⇒ corr == conv]
    The tv backward stencil needs sign(K*sr)·(1−e) in a 1-row halo around
    the strip, so the inner field is computed on tile_h+2 rows (requiring a
    2-row input halo, which the ±1-strip DMA window provides via a
    (tile_h+4)-row scratch).
    """
    i = pl.program_id(0)
    s = pl.program_id(1)
    h_total = meta_ref[0, 0]
    mean = scale_ref[0, 0]
    std = scale_ref[0, 1]
    c_edge = scale_ref[0, 2]
    c_tv = scale_ref[0, 3]
    w = hr_hbm.shape[-1]
    th = _TILE_H

    def body(hr_s, sr_s, sem):
        _dma_strip(hr_hbm, i, s, hr_s, sem)
        _dma_strip(sr_hbm, i, s, sr_s, sem)

        # edge map + inner field on th+2 rows (centres at real rows
        # [s*th-1, s*th+th+1)); the 2-row input halo lives at window rows
        # [_PAD_TOP-2, _PAD_TOP+th+2)
        hr_nb = jax.lax.slice(
            hr_s[...], (_PAD_TOP - 2, 0), (_PAD_TOP + th + 2, w)
        )
        sr_nb = jax.lax.slice(
            sr_s[...], (_PAD_TOP - 2, 0), (_PAD_TOP + th + 2, w)
        )
        e_x = jnp.abs(_shift_sum(hr_nb, _SOBEL_X_W, th + 2, w))
        e_y = jnp.abs(_shift_sum(hr_nb, _SOBEL_Y_W, th + 2, w))
        e = jnp.maximum(e_x, e_y)
        e = jnp.clip((e - mean) / std * 0.2 + 1.0, 0.0, 2.0)
        # rows of the inner field correspond to real rows s*th-1 + r
        row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, w), 0)
        real_row = row + s * th - 1
        m_inner = ((real_row >= 0) & (real_row < h_total)).astype(jnp.float32)
        e = e * m_inner

        ksr = _shift_sum(sr_nb, _DIFF_W, th + 2, w)
        inner = jnp.sign(ksr) * (1.0 - e) * m_inner

        # tv gradient for the strip's th rows: correlate inner with K
        g_tv = _shift_sum(inner, _DIFF_W, th, w) * c_tv

        hr_c = jax.lax.slice(hr_nb, (2, 0), (2 + th, w))
        sr_c = jax.lax.slice(sr_nb, (2, 0), (2 + th, w))
        e_c = jax.lax.slice(e, (1, 0), (1 + th, w))
        g_edge = -jnp.sign(hr_c - sr_c) * e_c * c_edge

        m = _row_mask(h_total, th, w, s)
        dsr_ref[0, :, :] = (g_edge + g_tv) * m

    pl.run_scoped(
        body,
        hr_s=pltpu.VMEM((th + 2 * _PAD_TOP, w), jnp.float32),
        sr_s=pltpu.VMEM((th + 2 * _PAD_TOP, w), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


# ------------------------------------------------------------- host side --


def _planes(x: jax.Array) -> jax.Array:
    """NHWC → (B*C, H, W): full-width rows on the lane dimension."""
    b, h, w, c = x.shape
    return x.transpose(0, 3, 1, 2).reshape(b * c, h, w)


def _strips(h: int) -> int:
    return -(-h // _TILE_H)


def _pad_planes(p: jax.Array) -> jax.Array:
    """Pad rows: _PAD_TOP zero rows on top, and bottom up to
    strips*_TILE_H + 2*_PAD_TOP total, so every strip's aligned DMA window
    is in range."""
    n, h, w = p.shape
    total = _strips(h) * _TILE_H + 2 * _PAD_TOP
    return jnp.pad(p, ((0, 0), (_PAD_TOP, total - h - _PAD_TOP), (0, 0)))


def _scalar_call(kernel, n_out, planes_inputs, meta, scale=None):
    """Run an accumulate-into-SMEM kernel over (n_planes, strips)."""
    n, hp, w = planes_inputs[0].shape
    grid = (n, (hp - 2 * _PAD_TOP) // _TILE_H)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]  # meta
    args = [meta]
    if scale is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(scale)
    in_specs += [pl.BlockSpec(memory_space=pltpu.HBM) for _ in planes_inputs]
    args += list(planes_inputs)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.SMEM) for _ in range(n_out)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((1, 1), jnp.float32) for _ in range(n_out)
        ),
        interpret=_INTERPRET,
    )(*args)


def _forward_impl(hr: jax.Array, sr: jax.Array):
    b, h, w, c = hr.shape
    count = b * h * w * c
    hr_p = _pad_planes(_planes(hr.astype(jnp.float32)))
    meta = jnp.array([[h]], jnp.int32)

    e_sum, e_sumsq = _scalar_call(_edge_stats_kernel, 2, (hr_p,), meta)
    total = e_sum[0, 0]
    mean = total / count
    var = (e_sumsq[0, 0] - count * mean * mean) / (count - 1)  # torch Bessel
    std = jnp.sqrt(var)
    scale = jnp.stack([mean, std]).reshape(1, 2)

    sr_p = _pad_planes(_planes(sr.astype(jnp.float32)))
    wdiff, esum, tv = _scalar_call(
        _loss_sums_kernel, 3, (hr_p, sr_p), meta, scale
    )
    edge_total = esum[0, 0]
    edge_loss = wdiff[0, 0] / edge_total
    tv_mean = tv[0, 0] / count
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
    c_tv = jnp.where(tv_mean > 0, g_tv / count, 0.0)  # relu gate
    scale = jnp.stack([mean, std, c_edge, c_tv]).reshape(1, 4)
    meta = jnp.array([[h]], jnp.int32)

    hr_p = _pad_planes(_planes(hr.astype(jnp.float32)))
    sr_p = _pad_planes(_planes(sr.astype(jnp.float32)))
    strips = _strips(h)
    dsr_p = pl.pallas_call(
        _grad_kernel,
        grid=(n, strips),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, _TILE_H, w), lambda i, s: (i, s, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, strips * _TILE_H, w), jnp.float32),
        interpret=_INTERPRET,
    )(meta, scale, hr_p, sr_p)

    dsr = dsr_p[:, :h, :].reshape(b, c, h, w).transpose(0, 2, 3, 1)
    # hr is the target image (data): no gradient, like the reference where
    # autograd never reaches the HR tensor.
    return jnp.zeros_like(hr), dsr.astype(sr.dtype)


reconstruction_loss_pallas.defvjp(_fwd, _bwd)
