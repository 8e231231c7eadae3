"""Fully-convolutional patch discriminator.

Capability parity with the reference (``src/models.py:90-120``): four stages
of [strided conv → 3x3/s2 max-pool → InstanceNorm → LeakyReLU(0.2)] — the
last stage drops the LeakyReLU — followed by a Sigmoid. Stage convs: k8 s2 p2
(3→64), then k4 s2 p1 for 64→128→256→512. ~2.77M params. For a 512x1024 HR
input the patch output is (B, 1, 3, 512) in NHWC, matching the reference's
(B, 512, 1, 3) NCHW.

InstanceNorm (per-sample, per-channel statistics; no affine, like torch's
``InstanceNorm2d`` default) is realized as GroupNorm with one group per
channel — already mesh-safe, no cross-device stats (SURVEY.md §2).

The stride/pool stack needs ≥ ~196px inputs (each stage divides by 4); we
validate eagerly with a clear error instead of the reference's mid-stack
crash (SURVEY.md §7(f)).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from srgan_tpu.config import DiscriminatorConfig

def min_input_size(num_stages: int = 4) -> int:
    """Smallest spatial input surviving ``num_stages`` of conv/s2 + pool/s2,
    by exact inversion of the shape arithmetic (conv out =
    floor((in + 2p - k)/2) + 1, pool k3 s2 VALID). For the reference's 4
    stages this is 428px — i.e. the reference discriminator only works on
    HR-scale inputs like its 512x1024 clips (SURVEY.md §2 estimated ~196;
    the exact floor is 428)."""
    size = 1
    for stage in range(num_stages - 1, -1, -1):
        size = 2 * (size - 1) + 3                      # invert pool k3 s2
        k_minus_2p = 4 if stage == 0 else 2            # k8 p2 / k4 p1
        size = 2 * (size - 1) + k_minus_2p             # invert conv s2
    return size


class Discriminator(nn.Module):
    input_channels: int = 3
    num_filters: int = 64
    # Reference parity is 4 stages (``src/models.py:96-116``); fewer stages
    # give a shallower patch critic usable on small images (framework knob).
    num_stages: int = 4
    compute_dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: DiscriminatorConfig) -> "Discriminator":
        dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.compute_dtype]
        return cls(
            input_channels=cfg.in_channels,
            num_filters=cfg.num_filters,
            num_stages=cfg.num_stages,
            compute_dtype=dt,
        )

    @nn.compact
    def __call__(self, x):
        if not 1 <= self.num_stages <= 4:
            # >4 would silently truncate to the 4 defined stages while
            # min_input_size(num_stages) keeps growing — rejecting legal
            # inputs for a model that doesn't exist; 0 crashes opaquely.
            raise ValueError(
                f"num_stages must be 1..4 (reference stack is 4, "
                f"src/models.py:90-120), got {self.num_stages}"
            )
        h, w = x.shape[1], x.shape[2]
        floor = min_input_size(self.num_stages)
        if h < floor or w < floor:
            raise ValueError(
                f"Discriminator input {h}x{w} too small: the "
                f"{self.num_stages}-stage conv/pool stack needs >= {floor}px "
                "per side (the reference crashes mid-stack below this, "
                "SURVEY.md §2/§7(f))."
            )
        x = x.astype(self.compute_dtype)
        nf = self.num_filters
        all_stages = (
            # (features, kernel, padding, apply_leaky_relu)
            (nf, 8, 2, True),
            (nf * 2, 4, 1, True),
            (nf * 4, 4, 1, True),
            (nf * 8, 4, 1, False),
        )
        stages = all_stages[: self.num_stages]
        # the last active stage drops the LeakyReLU, like the reference's
        stages = stages[:-1] + ((*stages[-1][:3], False),)
        for features, k, p, leaky in stages:
            x = nn.Conv(
                features, (k, k), strides=2, padding=p, dtype=self.compute_dtype
            )(x)
            # torch MaxPool2d(3, stride=2): VALID padding, floor sizes.
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
            x = nn.GroupNorm(
                num_groups=features,
                use_scale=False,
                use_bias=False,
                dtype=self.compute_dtype,
            )(x)  # InstanceNorm
            if leaky:
                x = nn.leaky_relu(x, negative_slope=0.2)
        return nn.sigmoid(x).astype(jnp.float32)


def init_discriminator(cfg: DiscriminatorConfig, key: jax.Array, sample_hw=None):
    model = Discriminator.from_config(cfg)
    floor = min_input_size(cfg.num_stages)
    h, w = sample_hw or (floor, floor)
    sample = jnp.zeros((1, h, w, cfg.in_channels), jnp.float32)
    variables = model.init(key, sample)
    return model, variables["params"]
