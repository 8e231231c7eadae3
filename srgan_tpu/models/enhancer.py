"""Post-inference image enhancer (Laplacian sharpen + clamp).

Reference ``ImageEnhancer`` (``src/models.py:28-41``): a parameterless
depthwise 8-neighbour sharpening filter applied in the eval path only
(``src/evaluation.py:50``). Here it is a jit'd epilogue fused into the
inference graph rather than a separate host-side pass.
"""

from __future__ import annotations

import functools

import jax

from srgan_tpu.ops.filters import sharpen


@functools.partial(jax.jit, static_argnames=("factor",))
def enhance(x: jax.Array, factor: float = 1.0) -> jax.Array:
    """NHWC batch → sharpened batch, clamped to [0, 1]."""
    return sharpen(x, factor=factor)
