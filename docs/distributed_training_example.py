"""Minimal data-parallel training template (documentation).

The reference ships a 41-line DDP skeleton (``src/分布式训练示例.py``) showing
init_process_group / DDP / DistributedSampler / mp.spawn with placeholder
models. This is the TPU-native equivalent, runnable end to end on any JAX
backend. To fake an 8-device mesh on CPU, set the env var
``JAX_NUM_CPU_DEVICES=8`` (or call
``jax.config.update("jax_num_cpu_devices", 8)`` before first device use) —
the older ``XLA_FLAGS=--xla_force_host_platform_device_count=8`` flag is
silently ignored by jax >= 0.9 (see ``tests/conftest.py``):

  1. one process per *host* (not per device); `jax.distributed.initialize()`
     replaces the TCP rendezvous when there are multiple hosts;
  2. a 1-D mesh over all devices; batches sharded on it, params replicated;
  3. the jit'd step computes a batch-mean loss → XLA inserts the gradient
     all-reduce over ICI (the DDP-hook equivalent). No collective code.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# -- your model/optimizer (placeholders, like the reference template) --------
import flax.linen as nn
import optax


class YourModel(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(1)(x)


def main():
    # jax.distributed.initialize()   # multi-host only

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    batch_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    model = YourModel()
    params = model.init(jax.random.key(0), jnp.zeros((1, 8)))["params"]
    params = jax.device_put(params, replicated)
    tx = optax.adam(1e-3)
    opt_state = jax.device_put(tx.init(params), replicated)

    @jax.jit
    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            pred = model.apply({"params": p}, x)
            return jnp.mean((pred - y) ** 2)  # batch mean → psum'd grads

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(jax.devices())
    for step in range(3):
        # per-epoch reshuffled, host-sharded sampling in real code
        # (srgan_tpu.data.pipeline.EpochSampler)
        x = jax.device_put(np.random.rand(4 * n, 8).astype(np.float32),
                           batch_sharding)
        y = jax.device_put(np.random.rand(4 * n, 1).astype(np.float32),
                           batch_sharding)
        params, opt_state, loss = train_step(params, opt_state, x, y)
        print(f"step {step}: loss={float(loss):.4f}")


if __name__ == "__main__":
    main()
