"""Test harness: run everything on CPU with 8 virtual devices so the
data-parallel / mesh paths are exercised without TPU hardware (the JAX idiom
for fake multi-chip, SURVEY.md §4).

Note: env vars alone are NOT enough here — the driver environment presets
``JAX_PLATFORMS=axon`` (the real-TPU tunnel) and pytest plugins (jaxtyping)
import jax before this conftest runs, baking that env into jax.config. Also,
jax 0.9 ignores the legacy ``--xla_force_host_platform_device_count`` XLA
flag entirely; ``jax_num_cpu_devices`` is the supported knob. The
``jax.config.update`` calls below take effect as long as no backend has been
initialized yet, which is guaranteed at conftest-import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
