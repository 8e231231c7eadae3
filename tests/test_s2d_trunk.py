"""Space-to-depth trunk equivalence (VERDICT r4 #2 probe support).

Three exactness claims behind ``srgan_tpu/models/s2d_trunk.py``:
  1. the pure-jax ``fine_trunk`` reproduces the flax block tower
     (``srresnet.py`` ResidualBlocks + post-conv + global skip) bit-close —
     it is the probe's baseline and this test's oracle link;
  2. ``fold_conv3x3_to_s2d`` embeds a fine conv3x3 exactly: coarse conv on
     ``pixel_unshuffle(x)`` == unshuffled fine conv, including the zero
     halo (padding 1 on both grids);
  3. the full ``s2d_trunk`` (folded convs + regrouped GroupNorm + coarse
     residual adds + one shuffle at exit) equals ``fine_trunk``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srgan_tpu.config import ModelConfig
from srgan_tpu.models.s2d_trunk import (
    fine_trunk,
    fold_conv3x3_to_s2d,
    s2d_trunk,
)
from srgan_tpu.models.srresnet import ResidualBlock, init_generator
from srgan_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(num_features=16, num_residuals=3, group_norm_groups=4)
    model, params = init_generator(cfg, jax.random.key(0), sample_hw=(8, 8))
    x = jax.random.uniform(jax.random.key(1), (2, 12, 16, 16), jnp.float32)
    return cfg, params, x


def test_fold_conv3x3_exact():
    k = jax.random.normal(jax.random.key(2), (3, 3, 6, 10), jnp.float32)
    b = jax.random.normal(jax.random.key(3), (10,), jnp.float32)
    x = jax.random.normal(jax.random.key(4), (2, 8, 12, 6), jnp.float32)
    fine = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    kc, bc = fold_conv3x3_to_s2d(k, b)
    assert kc.shape == (3, 3, 24, 40)
    # 25% structural density: each fine weight lands exactly once per
    # output phase.
    assert int((np.asarray(kc) != 0).sum()) <= 9 * 6 * 10 * 4
    coarse = jax.lax.conv_general_dilated(
        pixel_unshuffle(x, 2), kc, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bc
    np.testing.assert_allclose(
        np.asarray(pixel_shuffle(coarse, 2)), np.asarray(fine),
        rtol=1e-5, atol=1e-5,
    )


def test_fine_trunk_matches_flax_blocks(tiny):
    cfg, params, x = tiny
    out = x
    for i in range(cfg.num_residuals):
        out = ResidualBlock(
            num_features=cfg.num_features,
            group_norm_groups=cfg.group_norm_groups,
        ).apply({"params": params[f"ResidualBlock_{i}"]}, out)
    kt = params["Conv_1"]
    out = jax.lax.conv_general_dilated(
        out, kt["kernel"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + kt["bias"] + x
    mine = fine_trunk(
        params, x,
        num_residuals=cfg.num_residuals,
        group_norm_groups=cfg.group_norm_groups,
    )
    np.testing.assert_allclose(
        np.asarray(mine), np.asarray(out), rtol=1e-5, atol=1e-5
    )


def test_s2d_trunk_equals_fine_trunk(tiny):
    cfg, params, x = tiny
    kwargs = dict(
        num_residuals=cfg.num_residuals,
        group_norm_groups=cfg.group_norm_groups,
    )
    a = fine_trunk(params, x, **kwargs)
    b = s2d_trunk(params, x, **kwargs)
    assert b.shape == a.shape
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4
    )


def test_s2d_trunk_gradients_flow(tiny):
    """Folding is a static gather — gradients must reach the FINE params
    (the property a train step over the s2d trunk would rely on)."""
    cfg, params, x = tiny
    kwargs = dict(
        num_residuals=cfg.num_residuals,
        group_norm_groups=cfg.group_norm_groups,
    )

    def loss_fine(p):
        return jnp.sum(fine_trunk(p, x, **kwargs) ** 2)

    def loss_s2d(p):
        return jnp.sum(s2d_trunk(p, x, **kwargs) ** 2)

    sub = {
        k: v for k, v in params.items()
        if k.startswith("ResidualBlock_") or k == "Conv_1"
    }
    g_fine = jax.grad(loss_fine)(sub)
    g_s2d = jax.grad(loss_s2d)(sub)
    for gf, gs in zip(jax.tree.leaves(g_fine), jax.tree.leaves(g_s2d)):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gf), rtol=5e-3, atol=5e-3
        )
