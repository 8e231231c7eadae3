"""Space-to-depth trunk probe: does full 128-lane width beat F=64?

VERDICT r4 next-step #2 — the last untried conv-ceiling reformulation.
Relayout ONCE at the stem (``pixel_unshuffle(2)``) and run the 16-block
residual tower at (H/2, W/2, 4F=256) with exactly-folded kernels (the
math and the exactness tests live in ``srgan_tpu/models/s2d_trunk.py`` /
``tests/test_s2d_trunk.py``). The fold is exact but stores 75% structural
zeros dense, so it runs 4x the MACs; the bet is >=2x better MXU
output-width utilization at 256 lanes-worth of output channels.

Measures the RESIDUAL TOWER ONLY (~90% of a train step's FLOPs — same
scoping as ``scripts/grouped_pool_probe.py``), grads included, three
formulations at flagship shapes:

  fine        the shipped trunk: 16 blocks at (H, W, 64), per-block XLA
              convs (the baseline behind the 109.8 img/s headline);
  s2d_exact   the folded coarse trunk (identical function, grads flow to
              the fine params through the static gather);
  s2d_dense   a natively-parameterized 256-wide coarse trunk — NOT
              equivalent; the zero-folding-overhead upper bound that
              separates "width wins" from "fold costs".

Decision rule (from the verdict): ship a trunk option only if s2d_exact
beats fine by >= 15%; otherwise record the fourth rejection in the module
header and declare the F=64 conv ceiling CLOSED.

Usage: python scripts/s2d_trunk_probe.py [--batch 24] [--blocks 16]
       [--features 64] [--steps 10] [--hw 128 256]
Prints one JSON line per formulation + a verdict line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srgan_tpu.utils.platform import (  # noqa: E402
    enable_compilation_cache,
    honor_jax_platforms_env,
)

honor_jax_platforms_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from srgan_tpu.config import ModelConfig  # noqa: E402
from srgan_tpu.models.s2d_trunk import (  # noqa: E402
    _conv3x3,
    _group_norm,
    fine_trunk,
    s2d_trunk,
)
from srgan_tpu.models.srresnet import init_generator  # noqa: E402
from srgan_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle  # noqa: E402


def dense_coarse_trunk(params, out1, *, num_residuals, group_norm_groups,
                       compute_dtype):
    """Natively 256-wide coarse trunk (independent dense params): the
    upper-bound control. Same op graph as ``s2d_trunk`` minus the fold."""
    x1 = pixel_unshuffle(out1.astype(compute_dtype), 2)
    out = x1
    for i in range(num_residuals):
        p = params[f"block_{i}"]
        res = out
        y = _conv3x3(out, p["k0"], p["b0"], compute_dtype)
        y = _group_norm(y, p["s0"], p["n0"], group_norm_groups)
        y = jax.nn.relu(y)
        y = _conv3x3(y, p["k1"], p["b1"], compute_dtype)
        y = _group_norm(y, p["s1"], p["n1"], group_norm_groups)
        out = y + res
    y = _conv3x3(out, params["kt"], params["bt"], compute_dtype)
    return pixel_shuffle(y + x1, 2)


def _time(fn, params, x, steps):
    run = jax.jit(fn)
    t0 = time.time()
    g = run(params, x)
    # tunnel-safe completion: fetch a scalar, not block_until_ready
    float(jax.tree.leaves(g)[0].reshape(-1)[0])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(steps):
        g = run(params, x)
    float(jax.tree.leaves(g)[0].reshape(-1)[0])
    return (time.time() - t0) / steps, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--blocks", type=int, default=16)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--hw", type=int, nargs=2, default=(128, 256))
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    enable_compilation_cache()
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    h, w = args.hw
    f = args.features
    cfg = ModelConfig(num_features=f, num_residuals=args.blocks)
    _, params = init_generator(cfg, jax.random.key(0), sample_hw=(16, 16))
    sub = {
        k: v for k, v in params.items()
        if k.startswith("ResidualBlock_") or k == "Conv_1"
    }
    x = jax.random.uniform(
        jax.random.key(1), (args.batch, h, w, f), jnp.float32
    )
    kwargs = dict(num_residuals=args.blocks, group_norm_groups=8,
                  compute_dtype=dtype)

    key = jax.random.key(2)
    dense = {}
    for i in range(args.blocks):
        ks = jax.random.split(jax.random.fold_in(key, i), 2)
        dense[f"block_{i}"] = {
            "k0": jax.random.normal(ks[0], (3, 3, 4 * f, 4 * f),
                                    jnp.float32) * 0.02,
            "b0": jnp.zeros((4 * f,)),
            "s0": jnp.ones((4 * f,)), "n0": jnp.zeros((4 * f,)),
            "k1": jax.random.normal(ks[1], (3, 3, 4 * f, 4 * f),
                                    jnp.float32) * 0.02,
            "b1": jnp.zeros((4 * f,)),
            "s1": jnp.ones((4 * f,)), "n1": jnp.zeros((4 * f,)),
        }
    dense["kt"] = jax.random.normal(
        jax.random.fold_in(key, 99), (3, 3, 4 * f, 4 * f), jnp.float32
    ) * 0.02
    dense["bt"] = jnp.zeros((4 * f,))

    results = {}
    cases = (
        ("fine", lambda p, xx: jax.grad(
            lambda q: jnp.sum(fine_trunk(q, xx, **kwargs) ** 2) / xx.size
        )(p), sub),
        ("s2d_exact", lambda p, xx: jax.grad(
            lambda q: jnp.sum(s2d_trunk(q, xx, **kwargs) ** 2) / xx.size
        )(p), sub),
        ("s2d_dense", lambda p, xx: jax.grad(
            lambda q: jnp.sum(
                dense_coarse_trunk(q, xx, **kwargs) ** 2
            ) / xx.size
        )(p), dense),
    )
    for name, fn, p in cases:
        step_s, compile_s = _time(fn, p, x, args.steps)
        results[name] = step_s
        print(json.dumps({
            "formulation": name,
            "ms_per_step": round(step_s * 1e3, 2),
            "compile_s": round(compile_s, 1),
            "batch": args.batch, "hw": [h, w], "blocks": args.blocks,
            "dtype": str(dtype.__name__),
        }), flush=True)

    speedup = results["fine"] / results["s2d_exact"]
    print(json.dumps({
        "verdict": "SHIP" if speedup >= 1.15 else "REJECT",
        "s2d_exact_speedup_vs_fine": round(speedup, 3),
        "s2d_dense_speedup_vs_fine": round(
            results["fine"] / results["s2d_dense"], 3
        ),
        "rule": "ship only if s2d_exact >= 1.15x fine (VERDICT r4 #2)",
    }), flush=True)


if __name__ == "__main__":
    main()
