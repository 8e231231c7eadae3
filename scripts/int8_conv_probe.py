"""Probe: does an int8 conv tower actually beat bf16 on this TPU?

Decision gate for a quantized serving path (reference workload: the
inference surface of ``src/main.py:7-28`` / ``src/evaluation.py:41-61``
at production batch). v5e lists ~394 TOPS int8 vs ~197 TFLOPS bf16, so a
post-training-quantized SRResNet *could* ~2x the serving device rate —
IF XLA lowers int8 conv to the MXU fast path at our shapes. This probe
measures that directly before any quantization machinery gets built,
same measure-then-ship-or-reject rule as residual_tower_kernel.py and
grouped_pool_probe.py.

Method: a 16-deep 3x3 conv tower (the flagship residual trunk's shape,
F=64 @ 128x256) under one jit with a lax.scan over layers — one
dispatch, one scalar fetch (tunnel-safe timing per CLAUDE.md). Variants:
  bf16     — the shipped serving path's conv dtype
  int8     — int8 weights & activations, int32 accumulate
             (jax.lax.conv_general_dilated(preferred_element_type=int32))
Run: python scripts/int8_conv_probe.py  (env: PROBE_BATCH/PROBE_F/PROBE_REPS)

MEASURED (v5e, batch 48, F=64 @128x256, depth 16, 2026-08-19):
    bf16  47.01 ms/iter  39.47 effective T(mac)OPS
    int8  38.44 ms/iter  48.26 effective T(mac)OPS   -> 1.22x
VERDICT: REJECTED. The int8 conv path delivers 1.22x, not the ~2x the
datasheet ratio promises — the same F=64 output-width bound that caps
the bf16 convs (PARITY.md "tower kernel" postscript) caps the int8 MXU
path harder (48 of ~394 peak TOPS = 12% utilization vs bf16's 20%).
A full quantized serving trunk would also pay per-layer dequant →
GroupNorm (float, input-dependent — cannot fold into conv scales the
way BatchNorm can) → requant round-trips at full activation size,
shrinking the end-to-end win well under the measured 22% conv ceiling,
for nonzero PSNR risk. Not worth the machinery; the bf16 serving path
stays. Same measure-then-reject record as residual_tower_kernel.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srgan_tpu.utils.platform import (  # noqa: E402
    enable_compilation_cache,
    honor_jax_platforms_env,
)

honor_jax_platforms_env()
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

BATCH = int(os.environ.get("PROBE_BATCH", "48"))
H, W = 128, 256
F = int(os.environ.get("PROBE_F", "64"))
DEPTH = 16
REPS = int(os.environ.get("PROBE_REPS", "10"))

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def conv(x, k, acc_dtype):
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=DN, preferred_element_type=acc_dtype,
    )


def tower_bf16(x, ks):
    def body(h, k):
        return conv(h, k, jnp.float32).astype(jnp.bfloat16), None
    h, _ = lax.scan(body, x, ks)
    return jnp.float32(h.sum())


def tower_int8(x, ks):
    # int8 x int8 -> int32 accumulate; rescale+clip back to int8 between
    # layers (the shape a real static-scale quantized trunk would have).
    def body(h, k):
        acc = conv(h, k, jnp.int32)
        h2 = jnp.clip(acc >> 6, -128, 127).astype(jnp.int8)
        return h2, None
    h, _ = lax.scan(body, x, ks)
    return jnp.float32(h.astype(jnp.int32).sum())


def run(name, fn, x, ks):
    f = jax.jit(fn)
    try:
        flops = None
        try:
            cost = f.lower(x, ks).compile().cost_analysis()
            cost = cost[0] if isinstance(cost, list) else cost
            flops = float(cost.get("flops", 0.0))
        except Exception:
            pass
        float(f(x, ks))  # compile + settle
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = f(x, ks)
        float(out)
        dt = (time.perf_counter() - t0) / REPS
        eff = (2 * BATCH * H * W * 3 * 3 * F * F * DEPTH) / dt / 1e12
        print(f"{name:8s} {dt*1e3:8.2f} ms/iter   {eff:6.2f} T(mac)OPS"
              + (f"   xla_flops={flops:.3e}" if flops else ""))
        return dt
    except Exception as e:
        print(f"{name:8s} FAILED: {type(e).__name__}: {e}")
        return None


def main():
    key = jax.random.key(0)
    xf = jax.random.normal(key, (BATCH, H, W, F), jnp.bfloat16)
    ksf = jax.random.normal(key, (DEPTH, 3, 3, F, F), jnp.bfloat16) * 0.05
    xi = jax.random.randint(key, (BATCH, H, W, F), -128, 127, jnp.int8)
    ksi = jax.random.randint(key, (DEPTH, 3, 3, F, F), -16, 16, jnp.int8)

    print(f"device={jax.devices()[0].device_kind} batch={BATCH} "
          f"F={F} {H}x{W} depth={DEPTH}")
    t_bf = run("bf16", tower_bf16, xf, ksf)
    t_i8 = run("int8", tower_int8, xi, ksi)
    if t_bf and t_i8:
        print(f"int8 speedup over bf16: {t_bf / t_i8:.2f}x")


if __name__ == "__main__":
    main()
