"""Spatially-sharded inference for images larger than one chip's memory.

SURVEY.md §5 notes the reference's only "context scaling" analog is image
size, bounded by its fixed 1024x512 clips; scaling beyond one device's HBM
is listed as the natural extension. Here it is: shard the image's width axis
across the data mesh and jit the fully-convolutional generator over it —
XLA GSPMD inserts the halo exchanges (collective-permutes) that the conv
stencils need at shard boundaries automatically, which is exactly the
TPU-native replacement for manual tile-overlap inference.

Works for any fully-convolutional apply_fn (the SRResNet generator and the
enhancer epilogue both qualify).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@functools.lru_cache(maxsize=8)
def _sharded_apply(apply_fn, sharding):
    """One jitted executable per (apply_fn, sharding): a fresh lambda per
    call would miss jax's pjit cache and pay a retrace — and, over the
    axon tunnel, a compile-service round trip — for every image."""
    return jax.jit(
        lambda pp, xx: apply_fn({"params": pp}, xx),
        out_shardings=sharding,
    )


def upscale_spatially_sharded(
    apply_fn,
    params,
    image: np.ndarray,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
) -> np.ndarray:
    """Super-resolve one HWC (or NHWC) image with W sharded over the mesh.

    Params are replicated; the input/output batch is sharded on the width
    dimension, so each device holds a vertical stripe and peak per-device
    activation memory drops by the mesh size.

    Exactness: when ``W % mesh_size == 0`` the sharded program is the
    identical computation (GSPMD halo exchange) and the output matches the
    single-device result (tested). Otherwise the width is edge-padded up
    to divisibility first, which is an APPROXIMATION near the true right
    border: conv stencils within the receptive field of column ``W-1`` see
    replicated-edge context instead of the model's own zero SAME padding,
    and GroupNorm statistics include the padded stripe (a GLOBAL shift).
    For ``norm="none"`` models the interior (outside the pad's receptive
    field) remains bit-exact; for GroupNorm models the interior moves by
    the stats shift — proportional to the pad fraction, negligible for
    trained models at realistic sizes
    (``tests/test_parallel.py::test_non_divisible_width``).
    """
    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), (axis,))
    arr = np.asarray(image, dtype=np.float32)
    squeeze = arr.ndim == 3
    if squeeze:
        arr = arr[None]

    n = mesh.devices.size
    w = arr.shape[2]
    pad_w = (-w) % n  # W must divide evenly across shards
    if pad_w:
        arr = np.pad(arr, ((0, 0), (0, 0), (0, pad_w), (0, 0)), mode="edge")

    in_sharding = NamedSharding(mesh, P(None, None, axis, None))
    replicated = NamedSharding(mesh, P())
    x = jax.device_put(arr, in_sharding)
    p = jax.device_put(params, replicated)
    out = _sharded_apply(apply_fn, in_sharding)(p, x)
    out = np.asarray(out)
    if pad_w:
        scale = out.shape[2] // arr.shape[2]
        out = out[:, :, : scale * w]
    return out[0] if squeeze else out
