"""SRResNet super-resolution generator, TPU-first.

Capability parity with the reference generator (``src/models.py:44-87``):
conv9x9 stem + LeakyReLU(0.2) → N residual blocks → conv3x3 + global skip →
log2(upscale) stages of [conv3x3 (F→4F) → pixel-shuffle(2) → ReLU] → conv9x9
head to RGB. Defaults (3, 64, 16, 4x) give ~1.55M params like the reference.

TPU-native design choices:
  - NHWC layout end to end — XLA:TPU's native conv layout; the channel dim
    (64/256) lands on the 128-wide lane dimension.
  - GroupNorm in residual blocks instead of the reference's BatchNorm
    (``models.py:16,19``): per-sample statistics need no cross-device sync,
    which is exactly the distributed-training blocker the reference flags
    itself (``readme.md:20``).
  - Optional bfloat16 compute: params stay float32 (master copy), conv inputs
    are cast per-op so the MXU runs at its bf16 rate.
  - Fully static shapes under jit; fully-convolutional, so any spatial size
    compiles (one compilation per distinct input shape).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from srgan_tpu.config import ModelConfig
from srgan_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class ResidualBlock(nn.Module):
    """conv3x3 → norm → ReLU → conv3x3 → norm, plus identity skip
    (reference ``src/models.py:10-25``, with GroupNorm for mesh safety)."""

    num_features: int
    norm: str = "group"
    group_norm_groups: int = 8
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        out = nn.Conv(
            self.num_features, (3, 3), padding=1, dtype=self.compute_dtype
        )(x)
        out = self._norm(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.num_features, (3, 3), padding=1, dtype=self.compute_dtype
        )(out)
        out = self._norm(out)
        return out + residual

    def _norm(self, x):
        if self.norm == "group":
            return nn.GroupNorm(
                num_groups=self.group_norm_groups, dtype=self.compute_dtype
            )(x)
        if self.norm != "none":
            # a typo ("Group", "groupnorm") must not silently train an
            # unnormalized architecture and bake itself into the sidecar
            raise ValueError(
                f"norm must be 'group' or 'none', got {self.norm!r}"
            )
        return x


class _ScanBody(nn.Module):
    """(carry, _) adapter around ResidualBlock for nn.scan."""

    num_features: int
    norm: str
    group_norm_groups: int
    compute_dtype: Any
    remat: bool = False

    @nn.compact
    def __call__(self, carry, _):
        cls = nn.remat(ResidualBlock) if self.remat else ResidualBlock
        out = cls(
            num_features=self.num_features,
            norm=self.norm,
            group_norm_groups=self.group_norm_groups,
            compute_dtype=self.compute_dtype,
        )(carry)
        return out, None


class SRResNet(nn.Module):
    """The flagship generator. Input/output: NHWC float in [0, 1] (output is
    unclamped, like the reference — ``src/models.py:80-87`` has no output
    activation)."""

    in_channels: int = 3
    num_features: int = 64
    num_residuals: int = 16
    upscale_factor: int = 4
    norm: str = "group"
    group_norm_groups: int = 8
    # Output head:
    #  - "reference": conv9x9 (F→3) at full output resolution, the
    #    reference's layout (``src/models.py:78,86``). On TPU this conv is
    #    HBM-bound: XLA re-reads the huge post-upsample activation once per
    #    kernel tap, and the 3-wide output pads to 128 lanes (measured
    #    3 TFLOPS effective, ~60% of the whole forward pass).
    #  - "subpixel" (default): the algebraically-equivalent reformulation.
    #    A k×k conv after PixelShuffle(r) equals a ceil((k+1)/r+1)-tap conv
    #    on the pre-shuffle tensor emitting 3·r² phase channels, then the
    #    shuffle; ReLU commutes with the shuffle (elementwise vs permutation).
    #    The head becomes conv5x5 (4F→3·4) at half resolution — ~2.6x faster
    #    measured, same function class (strictly ⊇ the reference head's).
    head: str = "subpixel"
    # Rematerialize each residual block in backward (jax.checkpoint):
    # trades ~30% more FLOPs for dropping all block activations from HBM —
    # enables much larger batches/images per chip.
    remat: bool = False
    # TEST-ONLY (not in ModelConfig since r3): roll the residual tower into
    # one lax.scan over stacked block params. Measured on the real chip and
    # rejected as a compile-time mitigation: without remat the scan pins all
    # stacked block activations and flagship shapes OOM at COMPILE time
    # (20.17G of 15.75G HBM — XLA cannot rematerialize across a scan
    # boundary); with per-block remat the scanned gradient graph compiles no
    # faster than the unrolled tower. Kept for the CPU equivalence test
    # (stacked-vs-unrolled math identity) and as the documented negative
    # result; the persistent XLA compile cache is the shipped mitigation.
    scan_blocks: bool = False
    compute_dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: ModelConfig) -> "SRResNet":
        return cls(
            in_channels=cfg.in_channels,
            num_features=cfg.num_features,
            num_residuals=cfg.num_residuals,
            upscale_factor=cfg.upscale_factor,
            norm=cfg.norm,
            group_norm_groups=cfg.group_norm_groups,
            head=cfg.head,
            remat=cfg.remat,
            compute_dtype=_dtype(cfg.compute_dtype),
        )

    @nn.compact
    def __call__(self, x):
        # Both heads build log2(factor) shuffle stages (and the subpixel
        # head folds one into its phase conv), so only powers of two >= 2
        # produce the scale the config claims — upscale_factor=3 would
        # silently emit 2x frames while eval/tiling trust the field.
        f = self.upscale_factor
        if f < 2 or (f & (f - 1)) != 0:
            raise ValueError(
                f"upscale_factor must be a power of two >= 2 (2/4/8...), "
                f"got {f}"
            )
        if self.head not in ("subpixel", "coarse", "reference"):
            # same contract as norm: a typo ("Reference", "subpixl") must
            # not silently build the subpixel default and bake itself into
            # the sidecar
            raise ValueError(
                "head must be 'subpixel', 'coarse' or 'reference', "
                f"got {self.head!r}"
            )
        x = x.astype(self.compute_dtype)
        out1 = nn.Conv(
            self.num_features, (9, 9), padding=4, dtype=self.compute_dtype
        )(x)
        out1 = nn.leaky_relu(out1, negative_slope=0.2)

        block_kwargs = dict(
            num_features=self.num_features,
            norm=self.norm,
            group_norm_groups=self.group_norm_groups,
            compute_dtype=self.compute_dtype,
        )
        block_cls = nn.remat(ResidualBlock) if self.remat else ResidualBlock
        out = out1
        if self.scan_blocks:
            ScanTower = nn.scan(
                _ScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.num_residuals,
            )
            out, _ = ScanTower(
                name="blocks", remat=self.remat, **block_kwargs
            )(out, None)
        else:
            # Explicit names pin the param tree regardless of the remat
            # flag: nn.remat's auto-naming would otherwise produce
            # "CheckpointResidualBlock_N", making checkpoints silently
            # non-portable across a pure compute-schedule choice (a
            # pixel-phase run without --remat could not be GAN-fine-tuned
            # with it).
            for i in range(self.num_residuals):
                out = block_cls(
                    name=f"ResidualBlock_{i}", **block_kwargs
                )(out)

        out = nn.Conv(
            self.num_features, (3, 3), padding=1, dtype=self.compute_dtype
        )(out)
        out = out + out1  # global skip (``models.py:84``)

        # Pixel-shuffle upsampling: one 2x stage per power of two. The
        # reference iterates ``upscale_factor // 2`` times (``models.py:70``),
        # identical for the supported 2x/4x; log2 also keeps 8x correct.
        num_stages = int(math.log2(self.upscale_factor))

        if self.head == "reference":
            for _ in range(num_stages):
                out = nn.Conv(
                    self.num_features * 4, (3, 3), padding=1,
                    dtype=self.compute_dtype,
                )(out)
                out = pixel_shuffle(out, 2)
                out = nn.relu(out)
            out = nn.Conv(
                self.in_channels, (9, 9), padding=4, dtype=self.compute_dtype
            )(out)
        else:  # "subpixel"/"coarse": fold the RGB head through the shuffles
            for _ in range(num_stages - 1):
                out = nn.Conv(
                    self.num_features * 4, (3, 3), padding=1,
                    dtype=self.compute_dtype,
                )(out)
                out = pixel_shuffle(out, 2)
                out = nn.relu(out)
            # Final stage: conv → relu (commuted through the shuffle) →
            # phase conv emitting the RGB phases → shuffle(s). Identical
            # function class to [conv→ps→relu→conv9x9] at ~2.6x the speed
            # (the 9x9 full-res conv re-read its 800 MB input per tap).
            out = nn.Conv(
                self.num_features * 4, (3, 3), padding=1,
                dtype=self.compute_dtype,
            )(out)
            out = nn.relu(out)
            if self.head == "coarse" and num_stages >= 2:
                # Fold the 5x5 phase conv one level further down: unshuffle
                # the previous stage's 2x and run the equivalent 3x3 conv at
                # the LOWEST resolution with 4x the channels. Function class
                # strictly contains the subpixel head's (see
                # fold_phase_conv_to_coarse + its equivalence test).
                # MEASURED SLOWER than subpixel on v5e (246 vs 224 ms/step at
                # flagship shapes): the unshuffle relayout + the 48-wide
                # output (still padded to 128 lanes) eat the theoretical
                # full-width-matmul win. Kept as a verified variant; subpixel
                # remains the default.
                out = pixel_unshuffle(out, 2)
                out = nn.Conv(
                    self.in_channels * 16, (3, 3), padding=1,
                    dtype=self.compute_dtype,
                )(out)
                out = pixel_shuffle(out, 2)
                out = pixel_shuffle(out, 2)
            else:
                out = nn.Conv(
                    self.in_channels * 4, (5, 5), padding=2,
                    dtype=self.compute_dtype,
                )(out)
                out = pixel_shuffle(out, 2)
        return out.astype(jnp.float32)


def reference_head_to_subpixel(k9: jax.Array, b3: jax.Array):
    """Map a reference-head tail kernel to the equivalent subpixel-head
    phase kernel.

    ``k9``: (9, 9, F, C) HWIO kernel of the post-shuffle conv9x9;
    ``b3``: (C,) bias. Returns ``(k5, b12)`` with ``k5``: (5, 5, 4F, 4C) and
    ``b12``: (4C,) such that ``conv9x9(pixel_shuffle(x)) ==
    pixel_shuffle(conv5x5(x))`` exactly (zero padding matches: 2 coarse pad
    rows == 4 fine pad rows).

    Index algebra: output fine pixel (2i+a, 2j+b) reads fine input
    (2i+a+u, 2j+b+v) = coarse (i+s, j+t) phase (p, q) with
    u = 2s + p − a, v = 2t + q − b.
    """
    import numpy as np

    kh, kw, f, c = k9.shape
    assert (kh, kw) == (9, 9)
    k9 = np.asarray(k9)
    # channel layout (torch pixel-shuffle order (c, rh, rw)):
    # in d*4 + p*2 + q ; out c*4 + a*2 + b
    k5_full = np.zeros((5, 5, 4 * f, 4 * c), np.float32)
    for d in range(f):
        for p in range(2):
            for q in range(2):
                for cc in range(c):
                    for a in range(2):
                        for b in range(2):
                            for s in range(-2, 3):
                                for t in range(-2, 3):
                                    u = 2 * s + p - a
                                    v = 2 * t + q - b
                                    if -4 <= u <= 4 and -4 <= v <= 4:
                                        k5_full[
                                            s + 2, t + 2,
                                            d * 4 + p * 2 + q,
                                            cc * 4 + a * 2 + b,
                                        ] = k9[u + 4, v + 4, d, cc]
    b12 = np.repeat(np.asarray(b3), 4)
    return jnp.asarray(k5_full), jnp.asarray(b12)


def fold_phase_conv_to_coarse(k5: jax.Array, b12: jax.Array):
    """Map a subpixel-head phase kernel to the equivalent coarse-head kernel.

    ``k5``: (5, 5, C_in, C_out) HWIO kernel of the conv that runs AFTER one
    pixel-shuffle in the subpixel head; ``b12``: (C_out,). Returns
    ``(k3, b48)`` with ``k3``: (3, 3, 4·C_in, 4·C_out) such that
    ``ps(conv5x5(x)) == ps(ps(conv3x3(unshuffle(x))))`` exactly.

    Index algebra (r=2, torch channel order (c, rh, rw)): fine output pixel
    (2i+a, 2j+b) reads fine input (2i+a+u, 2j+b+v) = coarse (i+s, j+t) phase
    (p, q) with u = 2s + p − a, v = 2t + q − b; u, v ∈ [−2, 2] → s, t ∈
    [−1, 1] (a 3x3 coarse kernel, zero where u or v falls out of range).
    """
    import numpy as np

    kh, kw, cin, cout = k5.shape
    assert (kh, kw) == (5, 5)
    k5 = np.asarray(k5)
    k3 = np.zeros((3, 3, 4 * cin, 4 * cout), np.float32)
    for d in range(cin):
        for p in range(2):
            for q in range(2):
                for c in range(cout):
                    for a in range(2):
                        for b in range(2):
                            for s in range(-1, 2):
                                for t in range(-1, 2):
                                    u = 2 * s + p - a
                                    v = 2 * t + q - b
                                    if -2 <= u <= 2 and -2 <= v <= 2:
                                        k3[
                                            s + 1, t + 1,
                                            d * 4 + p * 2 + q,
                                            c * 4 + a * 2 + b,
                                        ] = k5[u + 2, v + 2, d, c]
    b48 = np.repeat(np.asarray(b12), 4)
    return jnp.asarray(k3), jnp.asarray(b48)


def init_generator(
    cfg: ModelConfig,
    key: jax.Array,
    sample_hw: Optional[tuple] = None,
):
    """Initialize generator params. ``sample_hw`` is the LR (height, width)
    used for shape inference; defaults to 32x32."""
    model = SRResNet.from_config(cfg)
    h, w = sample_hw or (32, 32)
    sample = jnp.zeros((1, h, w, cfg.in_channels), jnp.float32)
    variables = model.init(key, sample)
    return model, variables["params"]
