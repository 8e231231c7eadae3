"""Fused residual-tower Pallas kernel: the generator's hot path as ONE
VMEM-resident program.

The SRResNet tower is N blocks of [conv3x3 → GroupNorm → ReLU → conv3x3 →
GroupNorm → +skip] at LR resolution (``src/models.py:10-25,60-62``
semantics, GroupNorm per ``readme.md:20``). XLA executes it as ~6N separate
HLOs with every intermediate round-tripping HBM and runs the 64-channel
convs at ~28 TFLOPS effective. This kernel keeps the whole (H, W, F)
activation resident on-chip for all N blocks (v5e's physical VMEM is far
larger than the 16 MB default scope — we raise ``vmem_limit_bytes``):

  - grid over batch; the activation is the fori-loop carry, a VMEM value;
  - each 3x3 conv is 9 shifted (H, W, F) x (F, F) matmuls accumulated in
    f32 (matmul inputs in ``compute_dtype``); shifts are value pads/slices
    on the non-minor axes (Mosaic lowers neither lane-axis concats nor
    sub-extent scratch-ref slicing);
  - GroupNorm statistics via (F, G) indicator matmuls (1D reshapes don't
    lower);
  - block inputs stream to an HBM side output through a small staging
    buffer — the backward kernel (hand-written, wired via
    ``jax.custom_vjp``) replays each block from its saved input and
    backpropagates through GN2∘conv2∘ReLU∘GN1∘conv1 on-chip, accumulating
    dW/dscale/dbias across the sequential batch grid.

Use :func:`residual_tower` (custom-vjp) and
:func:`residual_tower_reference` (pure-JAX oracle, the numerically exact
spec) — equivalence tests in tests/test_tower_kernel.py.

STATUS — experimental, NOT wired into the model path. Measured at flagship
shapes (N=16, F=64, batch 12, 128x256, bf16) on v5e:
  - this kernel fwd: 33.2 ms; flax/XLA conv tower fwd: 23.5 ms.
  - both sit at the same structural ceiling: 64-channel matmuls use at most
    64/128 of the MXU's K and N dimensions (~49 TFLOPS ceiling; XLA's conv
    lowering reaches ~28, this kernel's 9x [HW,64]x[64,64] tap decomposition
    ~28 on raw convs but pays extra for value spills).
  - beating XLA here needs im2col-style K=576 patch matmuls in-kernel,
    which requires lane-axis patch packing that Mosaic does not currently
    lower (lane concats/sub-tile writes fail). Revisit if Mosaic grows
    those, or with an F=128 model variant where the MXU is fully used.
Kept because the fwd+bwd machinery (remat-in-kernel, hand-written
GroupNorm/conv backward, grid-accumulated dW) is correct, tested, and the
starting point for that revisit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU
_EPS = 1e-6  # flax GroupNorm default
_VMEM_LIMIT = 120 * 1024 * 1024


class TowerParams(NamedTuple):
    """Stacked block parameters. F features, N blocks."""

    w1: jax.Array  # (N, 3, 3, F, F) HWIO per tap
    s1: jax.Array  # (N, F) GroupNorm scale
    b1: jax.Array  # (N, F) GroupNorm bias
    w2: jax.Array  # (N, 3, 3, F, F)
    s2: jax.Array  # (N, F)
    b2: jax.Array  # (N, F)


def group_indicator(f: int, g: int) -> np.ndarray:
    ind = np.zeros((f, g), np.float32)
    for c in range(f):
        ind[c, c // (f // g)] = 1.0
    return ind


def _pad_hw(x):
    """Zero-pad H (major) and W (second-minor) by 1 — lane axis untouched."""
    return jnp.pad(x, ((1, 1), (1, 1), (0, 0)))


def _conv_val(a, w_blk, compute_dtype):
    """3x3 'same' conv of an (H, W, F) value with (3, 3, F, F) weights:
    9 shifted matmuls, f32 accumulation."""
    h, wd, f = a.shape
    ap = _pad_hw(a if a.dtype == compute_dtype else a.astype(compute_dtype))
    acc = jnp.zeros((h, wd, w_blk.shape[-1]), jnp.float32)
    for di in range(3):
        for dj in range(3):
            v = jax.lax.slice(ap, (di, dj, 0), (di + h, dj + wd, f))
            wt = w_blk[di, dj]
            acc = acc + jax.lax.dot_general(
                v, wt if wt.dtype == compute_dtype else wt.astype(compute_dtype),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc


def _conv_transpose_val(dc, w_blk, compute_dtype):
    """Gradient w.r.t. the conv input: dX = Σ_taps shift(dc @ W[tap]^T)."""
    h, wd, f = dc.shape
    acc = jnp.zeros((h + 2, wd + 2, w_blk.shape[-2]), jnp.float32)
    dcc = dc.astype(compute_dtype)
    for di in range(3):
        for dj in range(3):
            contrib = jax.lax.dot_general(
                dcc, w_blk[di, dj].T.astype(compute_dtype),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + jnp.pad(
                contrib, ((di, 2 - di), (dj, 2 - dj), (0, 0))
            )
    return jax.lax.slice(acc, (1, 1, 0), (1 + h, 1 + wd, acc.shape[2]))


def _conv_dw_taps(a_in, dc, compute_dtype):
    """dW[di,dj] = view(pad(a_in), di, dj)^T @ dc (contract pixels);
    returns list of 9 (F, F) f32."""
    h, wd, f = a_in.shape
    ap = _pad_hw(a_in.astype(compute_dtype))
    dcc = dc.astype(compute_dtype)
    taps = []
    for di in range(3):
        for dj in range(3):
            v = jax.lax.slice(ap, (di, dj, 0), (di + h, dj + wd, f))
            taps.append(
                jax.lax.dot_general(
                    v, dcc, (((0, 1), (0, 1)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
    return taps


def _gn_stats(c, ind, count):
    f = c.shape[2]
    s = jnp.sum(c, axis=(0, 1)).reshape(1, f)
    ss = jnp.sum(c * c, axis=(0, 1)).reshape(1, f)
    mean_g = jnp.dot(s, ind, preferred_element_type=jnp.float32) / count
    var_g = jnp.dot(ss, ind, preferred_element_type=jnp.float32) / count \
        - mean_g * mean_g
    mean_c = jnp.dot(mean_g, ind.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(
        jax.lax.rsqrt(var_g + _EPS), ind.T, preferred_element_type=jnp.float32
    )
    return mean_c.reshape(1, 1, f), inv_c.reshape(1, 1, f)


def _gn_bwd(dout, z, inv_c, scale, ind, count):
    """Backward of y = z*scale+bias with z = (c-μ)/σ per group. Returns
    (dc, dscale (1,F), dbias (1,F))."""
    f = dout.shape[2]
    dbias = jnp.sum(dout, axis=(0, 1)).reshape(1, f)
    dscale = jnp.sum(dout * z, axis=(0, 1)).reshape(1, f)
    dz = dout * scale.reshape(1, 1, f)

    def gmean(t2d):
        g = jnp.dot(t2d, ind, preferred_element_type=jnp.float32) / count
        return jnp.dot(g, ind.T, preferred_element_type=jnp.float32) \
            .reshape(1, 1, f)

    m_dz = gmean(jnp.sum(dz, axis=(0, 1)).reshape(1, f))
    m_dzz = gmean(jnp.sum(dz * z, axis=(0, 1)).reshape(1, f))
    dc = inv_c * (dz - m_dz - z * m_dzz)
    return dc, dscale, dbias


# ----------------------------------------------------------- pure-JAX ref --


def residual_tower_reference(
    x: jax.Array, params: TowerParams, compute_dtype=jnp.float32
) -> jax.Array:
    """Pure-JAX spec of the tower (batched). Matches the flax
    ResidualBlock chain with zero conv biases (see tests)."""

    def one(xi):
        f = xi.shape[-1]
        ind = jnp.asarray(group_indicator(f, 8))
        count = xi.shape[0] * xi.shape[1] * (f // 8)

        def block(a, p):
            w1, s1, b1, w2, s2, b2 = p
            c1 = _conv_val(a, w1, compute_dtype)
            mean1, inv1 = _gn_stats(c1, ind, count)
            g1 = (c1 - mean1) * inv1 * s1.reshape(1, 1, f) \
                + b1.reshape(1, 1, f)
            r = jax.nn.relu(g1)
            c2 = _conv_val(r, w2, compute_dtype)
            mean2, inv2 = _gn_stats(c2, ind, count)
            g2 = (c2 - mean2) * inv2 * s2.reshape(1, 1, f) \
                + b2.reshape(1, 1, f)
            return g2 + a, None

        out, _ = jax.lax.scan(block, xi.astype(jnp.float32), params)
        return out

    return jax.vmap(one)(x).astype(x.dtype)


# -------------------------------------------------------------- fwd kernel --


def _make_fwd_kernel(compute_dtype):
    def _fwd_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                    ind_ref, y_ref):
        n_blocks = w1_ref.shape[0]
        h, wd, f = y_ref.shape[1], y_ref.shape[2], y_ref.shape[3]
        count = h * wd * (f // ind_ref.shape[1])

        def scoped():
            ind = ind_ref[...]

            def block(n, a):
                # a is carried in compute_dtype: the carry and every
                # intermediate except the live conv accumulator stay narrow
                # so peak VMEM fits (full-f32 temporaries blow the 128 MB
                # physical budget).
                c1 = _conv_val(a, w1_ref[n], compute_dtype)
                mean1, inv1 = _gn_stats(c1, ind, count)
                r = jnp.maximum(
                    (c1 - mean1) * inv1 * s1_ref[n].reshape(1, 1, f)
                    + b1_ref[n].reshape(1, 1, f),
                    0.0,
                ).astype(compute_dtype)
                c2 = _conv_val(r, w2_ref[n], compute_dtype)
                mean2, inv2 = _gn_stats(c2, ind, count)
                g2 = (c2 - mean2) * inv2 * s2_ref[n].reshape(1, 1, f) \
                    + b2_ref[n].reshape(1, 1, f)
                return (g2 + a.astype(jnp.float32)).astype(compute_dtype)

            a0 = x_ref[0].astype(compute_dtype)
            a_final = jax.lax.fori_loop(0, n_blocks, block, a0)
            y_ref[0] = a_final.astype(y_ref.dtype)

        scoped()

    return _fwd_kernel


# -------------------------------------------------------------- bwd kernel --


def _make_bwd_kernel(compute_dtype, save_dtype):
    def _bwd_kernel(dy_ref, x_ref, w1_ref, s1_ref, b1_ref, w2_ref,
                    s2_ref, b2_ref, ind_ref, dx_ref, dw1_ref, ds1_ref,
                    db1_ref, dw2_ref, ds2_ref, db2_ref):
        i = pl.program_id(0)
        n_blocks = w1_ref.shape[0]
        h, wd, f = dy_ref.shape[1], dy_ref.shape[2], dy_ref.shape[3]
        count = h * wd * (f // ind_ref.shape[1])

        @pl.when(i == 0)
        def _():
            for ref in (dw1_ref, ds1_ref, db1_ref, dw2_ref, ds2_ref, db2_ref):
                ref[...] = jnp.zeros(ref.shape, ref.dtype)

        def scoped(save_ref):
            ind = ind_ref[...]

            # ---- replay the forward, stashing every block's input ----
            # The carry MUST round to compute_dtype per block exactly like
            # _make_fwd_kernel's: an f32 carry here would stash block
            # inputs that drift from the true forward activations as N
            # grows, and every dW/dscale/dbias/dx would be evaluated at
            # (slightly) wrong points under bf16 compute.
            def fwd_block(n, a):
                save_ref[n] = a.astype(save_ref.dtype)
                c1 = _conv_val(a, w1_ref[n], compute_dtype)
                mean1, inv1 = _gn_stats(c1, ind, count)
                g1 = (c1 - mean1) * inv1 * s1_ref[n].reshape(1, 1, f) \
                    + b1_ref[n].reshape(1, 1, f)
                r = jnp.maximum(g1, 0.0).astype(compute_dtype)
                c2 = _conv_val(r, w2_ref[n], compute_dtype)
                mean2, inv2 = _gn_stats(c2, ind, count)
                g2 = (c2 - mean2) * inv2 * s2_ref[n].reshape(1, 1, f) \
                    + b2_ref[n].reshape(1, 1, f)
                return (g2 + a.astype(jnp.float32)).astype(compute_dtype)

            jax.lax.fori_loop(
                0, n_blocks, fwd_block, x_ref[0].astype(compute_dtype)
            )

            def block(t, da):
                n = n_blocks - 1 - t
                a = save_ref[n].astype(jnp.float32)

                # replay forward
                c1 = _conv_val(a, w1_ref[n], compute_dtype)
                mean1, inv1 = _gn_stats(c1, ind, count)
                z1 = (c1 - mean1) * inv1
                g1 = z1 * s1_ref[n].reshape(1, 1, f) + b1_ref[n].reshape(1, 1, f)
                r = jnp.maximum(g1, 0.0)
                c2 = _conv_val(r, w2_ref[n], compute_dtype)
                mean2, inv2 = _gn_stats(c2, ind, count)
                z2 = (c2 - mean2) * inv2

                # backward
                dc2, dscale2, dbias2 = _gn_bwd(
                    da, z2, inv2, s2_ref[n], ind, count
                )
                ds2_ref[n, :] += dscale2[0]
                db2_ref[n, :] += dbias2[0]
                dw2_taps = _conv_dw_taps(r, dc2, compute_dtype)
                k = 0
                for di in range(3):
                    for dj in range(3):
                        dw2_ref[n, di, dj, :, :] += dw2_taps[k]
                        k += 1
                dr = _conv_transpose_val(dc2, w2_ref[n], compute_dtype)
                dg1 = jnp.where(g1 > 0.0, dr, 0.0)

                dc1, dscale1, dbias1 = _gn_bwd(
                    dg1, z1, inv1, s1_ref[n], ind, count
                )
                ds1_ref[n, :] += dscale1[0]
                db1_ref[n, :] += dbias1[0]
                dw1_taps = _conv_dw_taps(a, dc1, compute_dtype)
                k = 0
                for di in range(3):
                    for dj in range(3):
                        dw1_ref[n, di, dj, :, :] += dw1_taps[k]
                        k += 1
                dx_in = _conv_transpose_val(dc1, w1_ref[n], compute_dtype)
                return dx_in + da  # +skip passthrough

            da0 = dy_ref[0].astype(jnp.float32)
            da_final = jax.lax.fori_loop(0, n_blocks, block, da0)
            dx_ref[0] = da_final

        pl.run_scoped(
            scoped,
            save_ref=pltpu.VMEM((n_blocks, h, wd, f), save_dtype),
        )

    return _bwd_kernel


# ---------------------------------------------------------------- wrapper --


def _fwd_impl(x, params: TowerParams, compute_dtype):
    b, h, w, f = x.shape
    n = params.w1.shape[0]
    ind = jnp.asarray(group_indicator(f, 8))
    w1 = params.w1.astype(compute_dtype)
    w2 = params.w2.astype(compute_dtype)
    xc = x.astype(compute_dtype)  # narrow IO windows: they are double-
    y = pl.pallas_call(           # buffered f32 otherwise (saves ~17 MB)
        _make_fwd_kernel(compute_dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, f), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(7)],
        ],
        out_specs=pl.BlockSpec((1, h, w, f), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, f), compute_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_INTERPRET,
    )(xc, w1, params.s1, params.b1, w2, params.s2, params.b2, ind)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def residual_tower(
    x: jax.Array, params: TowerParams, compute_dtype=jnp.float32
) -> jax.Array:
    """Fused N-block residual tower. x: (B, H, W, F); returns same shape
    and dtype. Matmul inputs run in ``compute_dtype`` (use bfloat16 on TPU),
    accumulation and statistics in f32. The backward pass replays the
    forward on-chip (remat) — only x is saved."""
    return _fwd_impl(x, params, compute_dtype)


def _tower_fwd(x, params, compute_dtype):
    # jax.custom_vjp passes fwd the primal's full argument list (nondiff
    # args stay in position); bwd receives nondiff args first.
    y = _fwd_impl(x, params, compute_dtype)
    return y, (x, params)


def _tower_bwd(compute_dtype, residuals, dy):
    x, params = residuals
    b, h, w, f = x.shape
    save_dtype = jnp.bfloat16 if compute_dtype == jnp.bfloat16 else x.dtype
    ind = jnp.asarray(group_indicator(f, 8))
    outs = pl.pallas_call(
        _make_bwd_kernel(compute_dtype, save_dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, f), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, f), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(7)],
        ],
        out_specs=(
            pl.BlockSpec((1, h, w, f), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, f), jnp.float32),
            jax.ShapeDtypeStruct(params.w1.shape, jnp.float32),
            jax.ShapeDtypeStruct(params.s1.shape, jnp.float32),
            jax.ShapeDtypeStruct(params.b1.shape, jnp.float32),
            jax.ShapeDtypeStruct(params.w2.shape, jnp.float32),
            jax.ShapeDtypeStruct(params.s2.shape, jnp.float32),
            jax.ShapeDtypeStruct(params.b2.shape, jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_INTERPRET,
    )(dy.astype(jnp.float32), x, params.w1, params.s1, params.b1,
      params.w2, params.s2, params.b2, ind)
    dx, dw1, ds1, db1, dw2, ds2, db2 = outs
    dparams = TowerParams(
        w1=dw1.astype(params.w1.dtype),
        s1=ds1.astype(params.s1.dtype),
        b1=db1.astype(params.b1.dtype),
        w2=dw2.astype(params.w2.dtype),
        s2=ds2.astype(params.s2.dtype),
        b2=db2.astype(params.b2.dtype),
    )
    return dx.astype(x.dtype), dparams


residual_tower.defvjp(_tower_fwd, _tower_bwd)
