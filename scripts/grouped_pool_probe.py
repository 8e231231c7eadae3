"""Width-fused pool probe: can grouped convs beat the scan pool executor?

VERDICT r3 next-step #4: N pool members' independent F=64 residual towers
are mathematically the N·F-channel block-diagonal computation — expressible
as convs with ``feature_group_count=N`` — and the builder's own F=128 data
(PARITY capacity table, ~2.6x utilization/FLOP over F=64) suggests a wider
program might fill the 128-lane MXU where the F=64-per-member towers are
output-width-bound.

This probe measures the RESIDUAL TOWER ONLY — it carries ~90% of the pool
step's FLOPs (16 blocks × 2 convs at LR resolution vs 4 head/tail convs) —
in three formulations at flagship shapes (B, 128x256, bf16, grads + loss
included, matching a train step's differentiated region):

  scan3      lax.scan over 3 members, each an F=64 tower with its own
             grad (the shipped scan executor's layout);
  grouped3   ONE tower on 3F=192-channel tensors, every conv
             feature_group_count=3, GroupNorm with 3x groups (per-member
             statistics by construction) — the width-fused candidate;
  dense192   an F=192 dense tower (3x the per-member FLOPs of grouped3):
             the MXU-utilization upper bound at this width.

Decision rule (from the verdict): build the grouped executor only if
grouped3 beats scan3 by >= 20%; otherwise record the negative result next
to the tower kernel's (ops/pallas/residual_tower_kernel.py:29-42).

MEASURED (r4, v5e, b24 128x256 bf16, 16 blocks, grads included):
  scan3 413 ms | grouped3 596 ms | dense192 558 ms  →  REJECTED.
The grouped formulation is 1.44x SLOWER than the scan executor: XLA:TPU's
``feature_group_count`` lowering does not pack the 3x64-channel
block-diagonal onto the 128-lane MXU the way a dense wide conv fills it —
the dense192 control does show the width effect (3x the FLOPs of scan3 in
only 1.35x the time, ~2.2x utilization/FLOP, consistent with the F=128
capacity measurement in PARITY), but that efficiency belongs to genuinely
dense width, not to grouped packing of independent members. Conclusion:
the pool's 3x cost is irreducible by regrouping at F=64; spend capacity
on dense width (F=128) instead when quality-per-wall-clock matters.
(Probe note: activations must be jit arguments — as closure constants the
~200 MB tensors blow the axon remote-compile request limit, HTTP 413.)

Usage: python scripts/grouped_pool_probe.py [--batch 24] [--blocks 16]
       [--features 64] [--members 3] [--steps 10] [--hw 128 256]
Prints one JSON line per formulation + a verdict line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srgan_tpu.utils.platform import (  # noqa: E402
    enable_compilation_cache,
    honor_jax_platforms_env,
)

honor_jax_platforms_env()
enable_compilation_cache()

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class Tower(nn.Module):
    """K residual blocks, mirroring models/srresnet.ResidualBlock
    (conv3x3 → GN → ReLU → conv3x3 → GN, + skip), with optional channel
    grouping: ``groups=N`` makes every conv ``feature_group_count=N`` and
    scales GroupNorm's group count by N, so member channels never mix —
    the block-diagonal (width-fused) formulation of N independent towers."""

    features: int  # TOTAL channels (N*F for the grouped formulation)
    blocks: int
    groups: int = 1
    gn_groups_per_member: int = 8
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        for _ in range(self.blocks):
            r = x
            y = nn.Conv(self.features, (3, 3), padding=1,
                        feature_group_count=self.groups,
                        dtype=self.compute_dtype)(x)
            y = nn.GroupNorm(
                num_groups=self.gn_groups_per_member * self.groups,
                dtype=self.compute_dtype)(y)
            y = nn.relu(y)
            y = nn.Conv(self.features, (3, 3), padding=1,
                        feature_group_count=self.groups,
                        dtype=self.compute_dtype)(y)
            y = nn.GroupNorm(
                num_groups=self.gn_groups_per_member * self.groups,
                dtype=self.compute_dtype)(y)
            x = y + r
        return x


def timed(run_once, steps):
    run_once()  # compile
    t0 = time.perf_counter()
    for _ in range(steps):
        run_once()
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--blocks", type=int, default=None)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--members", type=int, default=3)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--hw", type=int, nargs=2, default=None)
    args = ap.parse_args()
    on_tpu = jax.devices()[0].platform == "tpu"
    batch = args.batch or (24 if on_tpu else 2)
    blocks = args.blocks or (16 if on_tpu else 2)
    h, w = args.hw or ((128, 256) if on_tpu else (16, 32))
    f, n = args.features, args.members
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    steps = args.steps if on_tpu else 2

    key = jax.random.key(0)
    x = jax.random.uniform(key, (batch, h, w, f), jnp.float32)
    tgt = jax.random.uniform(jax.random.key(1), (batch, h, w, f), jnp.float32)

    results = {}

    # --- scan3: per-member grad inside its own scan iteration -----------
    member = Tower(features=f, blocks=blocks, groups=1, compute_dtype=dt)
    p0 = member.init(key, x)["params"]
    stacked = jax.tree.map(
        lambda a: jnp.stack([a] * n) * (1 + 0.01 * jnp.arange(
            n, dtype=a.dtype).reshape((n,) + (1,) * a.ndim)),
        p0,
    )

    # NOTE: activations/targets must be jit ARGUMENTS, not closure
    # captures — captured they embed as HLO constants (hundreds of MB at
    # flagship shapes) and the axon remote-compile request bounces with
    # HTTP 413.
    @jax.jit
    def scan_step(sp, xx, tt):
        def body(c, p_i):
            def loss(pp):
                y = member.apply({"params": pp}, xx)
                return jnp.mean((y.astype(jnp.float32) - tt) ** 2)

            l, g = jax.value_and_grad(loss)(p_i)
            return c + l, g

        total, grads = jax.lax.scan(body, jnp.zeros(()), sp)
        return total, grads

    def run_scan():
        total, _ = scan_step(stacked, x, tgt)
        float(total)

    results["scan%d" % n] = timed(run_scan, steps)

    # --- grouped3: one block-diagonal tower over N*F channels -----------
    grouped = Tower(features=n * f, blocks=blocks, groups=n,
                    compute_dtype=dt)
    xg = jnp.concatenate([x] * n, axis=-1)
    tg = jnp.concatenate([tgt] * n, axis=-1)
    pg = grouped.init(key, xg)["params"]

    @jax.jit
    def grouped_step(p, xx, tt):
        def loss(pp):
            y = grouped.apply({"params": pp}, xx)
            # sum of per-member means == the scan formulation's total loss
            d = (y.astype(jnp.float32) - tt) ** 2
            return jnp.mean(d) * n

        return jax.value_and_grad(loss)(p)

    def run_grouped():
        l, _ = grouped_step(pg, xg, tg)
        float(l)

    results["grouped%d" % n] = timed(run_grouped, steps)

    # --- dense192: utilization ceiling at the fused width ----------------
    dense = Tower(features=n * f, blocks=blocks, groups=1, compute_dtype=dt)
    pd = dense.init(key, xg)["params"]

    @jax.jit
    def dense_step(p, xx, tt):
        def loss(pp):
            y = dense.apply({"params": pp}, xx)
            return jnp.mean((y.astype(jnp.float32) - tt) ** 2)

        return jax.value_and_grad(loss)(p)

    def run_dense():
        l, _ = dense_step(pd, xg, tg)
        float(l)

    results["dense%d" % (n * f)] = timed(run_dense, steps)

    out = {
        "batch": batch, "blocks": blocks, "features": f, "members": n,
        "hw": [h, w], "dtype": str(dt.__name__),
        "ms": {k: round(v * 1e3, 2) for k, v in results.items()},
    }
    scan_ms = results["scan%d" % n]
    grp_ms = results["grouped%d" % n]
    out["grouped_speedup_vs_scan"] = round(scan_ms / grp_ms, 3)
    out["verdict"] = (
        "BUILD the grouped executor" if scan_ms / grp_ms >= 1.2
        else "REJECT: grouped formulation does not clear the 20% bar"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
