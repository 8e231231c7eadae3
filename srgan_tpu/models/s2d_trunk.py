"""Space-to-depth residual-trunk reformulation (probe; VERDICT r4 #2).

The flagship trunk (16 ResidualBlocks at LR resolution, F=64 —
capability-parity with the reference tower, ``src/models.py:44-60``) is
output-width-bound on the v5e MXU: every conv3x3 contracts onto only 64
of the 128 output lanes (measured 7.8 TFLOPS im2col,
``ops/pallas/residual_tower_kernel.py``). The last untried standard TPU
reformulation is to relayout ONCE at the stem — ``pixel_unshuffle(2)``
to (H/2, W/2, 4F=256) — and run an *exactly equivalent* tower at full
128-lane width.

The equivalence (proved by ``tests/test_s2d_trunk.py``):

  - a fine conv3x3 (pad 1, Cin→Cout) equals a coarse conv3x3 (pad 1,
    4Cin→4Cout) whose kernel is the index-mapped embedding of the fine
    kernel: output fine pixel (2i+a, 2j+b) reads fine input
    (2i+a+u, 2j+b+v) = coarse (i+s, j+t) phase (p, q) with
    s = ⌊(a+u)/2⌋, p = (a+u) − 2s (same for t, q). Only 25% of the
    coarse kernel entries are nonzero — the transform is exact but runs
    **4x the MACs** when the structural zeros are stored dense (the MXU
    multiplies zeros at full cost);
  - GroupNorm(8) over 64 fine channels equals GroupNorm(8) over the 256
    coarse channels: unshuffle's channel order (c·4 + 2·rh + rw) keeps
    each fine group's 8 channels × 4 phases CONTIGUOUS (coarse channels
    32g..32g+31), and the statistics run over the identical element set
    (H·W·8 fine = (H/2)(W/2)·32 coarse). Scale/bias lift by
    ``np.repeat(·, 4)``;
  - ReLU, the block residual add and the global skip commute with the
    (bijective) unshuffle, so the WHOLE trunk folds: one unshuffle at
    entry, one shuffle at exit, nothing per-block.

So the exact variant trades 4x FLOPs for ~2x better MXU output-width
utilization — a predicted net loss; the probe also measures a natively
dense 256-wide control (the upper bound with zero folding overhead) to
separate the two effects. Measured by ``scripts/s2d_trunk_probe.py``:

MEASURED (v5e chip, ``python scripts/s2d_trunk_probe.py`` defaults —
batch 24, 128x256 LR, 16 blocks, bf16, grads included): **REJECTED**,
the fourth and final conv-ceiling probe.

  fine (shipped F=64 trunk)   132.0 ms/step   1.00x  (the 109.8 img/s path)
  s2d_exact (folded, dense)   436.5 ms/step   0.30x  (4x MACs, as predicted)
  s2d_dense (256-wide bound)  138.2 ms/step   0.955x (zero fold overhead)

The decisive row is the CONTROL: even a natively-parameterized 256-wide
coarse trunk with no folding overhead at all is 4.5% *slower* than the
F=64 fine trunk — on these shapes XLA's F=64 convs are not
output-width-bound in practice (spatial dim folds into the free matmul
axis), so there is no width win for any s2d variant to collect, and the
exact fold's 4x dense MACs price it at 0.30x. With tower-kernel,
grouped-conv, int8 and now s2d all measured and rejected, the F=64 conv
ceiling is CLOSED: the shipped XLA conv path is the fastest known
formulation on this hardware (see PARITY.md perf notes).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def fold_conv3x3_to_s2d(kernel: jax.Array, bias: jax.Array):
    """Fold a fine conv3x3 HWIO kernel (3, 3, Cin, Cout) into the exactly
    equivalent coarse conv3x3 kernel (3, 3, 4·Cin, 4·Cout) acting on
    ``pixel_unshuffle(x, 2)`` (zero padding 1 matches on both grids: the
    folded kernel never reads a coarse phase outside the fine halo).

    Returns ``(k_coarse, b_coarse)``. Differentiable in ``kernel``/``bias``
    (a static gather + mask), so train steps can fold per-step and the
    gradient flows back to the fine parameters.
    """
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3), "trunk convs are 3x3"
    gidx = np.zeros((3, 3, 4 * cin, 4 * cout), np.int64)
    mask = np.zeros((3, 3, 4 * cin, 4 * cout), np.float32)
    ci = np.arange(cin)
    co = np.arange(cout)
    for a in range(2):
        for b in range(2):
            for u in range(-1, 2):
                for v in range(-1, 2):
                    alpha, beta = a + u, b + v
                    s, p = alpha // 2, alpha % 2
                    t, q = beta // 2, beta % 2
                    rows = ci * 4 + p * 2 + q
                    cols = co * 4 + a * 2 + b
                    flat = (
                        ((u + 1) * 3 + (v + 1)) * cin * cout
                        + ci[:, None] * cout
                        + co[None, :]
                    )
                    gidx[s + 1, t + 1, rows[:, None], cols[None, :]] = flat
                    mask[s + 1, t + 1, rows[:, None], cols[None, :]] = 1.0
    k_coarse = kernel.reshape(-1)[gidx] * mask
    return k_coarse, jnp.repeat(bias, 4)


def _conv3x3(x, kernel, bias, compute_dtype):
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        kernel.astype(compute_dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(compute_dtype)


def _group_norm(x, scale, bias, num_groups, eps=1e-6):
    """flax ``nn.GroupNorm`` semantics (contiguous channel groups, fast
    variance, eps 1e-6), stats in float32."""
    b, h, w, c = x.shape
    xg = x.reshape(b, h, w, num_groups, c // num_groups).astype(jnp.float32)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = (xg * xg).mean(axis=(1, 2, 4), keepdims=True) - mean * mean
    y = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )
    return y.astype(x.dtype)


def fine_trunk(
    params: dict,
    out1: jax.Array,
    *,
    num_residuals: int,
    group_norm_groups: int = 8,
    compute_dtype: Any = jnp.float32,
):
    """Pure-jax re-implementation of the shipped trunk (``srresnet.py``
    blocks + post-trunk conv + global skip) on an SRResNet param subtree.
    Used as the probe baseline and the equivalence-test oracle."""
    out = out1.astype(compute_dtype)
    for i in range(num_residuals):
        p = params[f"ResidualBlock_{i}"]
        res = out
        y = _conv3x3(out, p["Conv_0"]["kernel"], p["Conv_0"]["bias"],
                     compute_dtype)
        y = _group_norm(y, p["GroupNorm_0"]["scale"], p["GroupNorm_0"]["bias"],
                        group_norm_groups)
        y = jax.nn.relu(y)
        y = _conv3x3(y, p["Conv_1"]["kernel"], p["Conv_1"]["bias"],
                     compute_dtype)
        y = _group_norm(y, p["GroupNorm_1"]["scale"], p["GroupNorm_1"]["bias"],
                        group_norm_groups)
        out = y + res
    tail = params["Conv_1"]
    out = _conv3x3(out, tail["kernel"], tail["bias"], compute_dtype)
    return out + out1.astype(compute_dtype)


def s2d_trunk(
    params: dict,
    out1: jax.Array,
    *,
    num_residuals: int,
    group_norm_groups: int = 8,
    compute_dtype: Any = jnp.float32,
):
    """The space-to-depth trunk: same SRResNet params, identical output
    (to fp tolerance), computed at (H/2, W/2, 4F) with folded kernels."""
    from srgan_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle

    x1 = pixel_unshuffle(out1.astype(compute_dtype), 2)
    out = x1
    for i in range(num_residuals):
        p = params[f"ResidualBlock_{i}"]
        res = out
        k0, b0 = fold_conv3x3_to_s2d(p["Conv_0"]["kernel"],
                                     p["Conv_0"]["bias"])
        y = _conv3x3(out, k0, b0, compute_dtype)
        y = _group_norm(
            y,
            jnp.repeat(p["GroupNorm_0"]["scale"], 4),
            jnp.repeat(p["GroupNorm_0"]["bias"], 4),
            group_norm_groups,
        )
        y = jax.nn.relu(y)
        k1, b1 = fold_conv3x3_to_s2d(p["Conv_1"]["kernel"],
                                     p["Conv_1"]["bias"])
        y = _conv3x3(y, k1, b1, compute_dtype)
        y = _group_norm(
            y,
            jnp.repeat(p["GroupNorm_1"]["scale"], 4),
            jnp.repeat(p["GroupNorm_1"]["bias"], 4),
            group_norm_groups,
        )
        out = y + res
    kt, bt = fold_conv3x3_to_s2d(params["Conv_1"]["kernel"],
                                 params["Conv_1"]["bias"])
    out = _conv3x3(out, kt, bt, compute_dtype)
    return pixel_shuffle(out + x1, 2)
