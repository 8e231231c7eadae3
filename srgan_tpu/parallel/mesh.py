"""Device mesh + sharding layout for data-parallel training.

The reference's only distributed strategy is DDP data parallelism over NCCL
with one process per GPU and a hardcoded TCP rendezvous
(``src/train.py:29-31,45,47,301-302``). TPU-native equivalent: a 1-D
``jax.sharding.Mesh`` over the ``data`` axis; batches are sharded over it,
parameters are replicated, and XLA inserts the gradient all-reduce (the DDP
hook equivalent) over ICI/DCN automatically when the jit'd step computes
batch-mean losses. Multi-host setup is one ``jax.distributed.initialize()``
call — no explicit rendezvous code (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from srgan_tpu.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    if devices is None:
        devices = jax.devices()
        if cfg.num_devices is not None:
            devices = devices[: cfg.num_devices]
    return Mesh(np.asarray(devices), (cfg.data_axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """NHWC batches: shard the batch dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    return jax.device_put(batch, batch_sharding(mesh, axis))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)


def initialize_multihost(**kwargs) -> None:
    """Multi-host bring-up: replaces the reference's MASTER_ADDR/PORT +
    ``init_process_group("nccl")`` rendezvous (``src/train.py:29-31``)."""
    jax.distributed.initialize(**kwargs)


def process_shard_info() -> tuple:
    """(num_shards, shard_index) for host-sharded data loading — the
    ``DistributedSampler(num_replicas, rank)`` equivalent
    (``src/train.py:90-93``)."""
    return jax.process_count(), jax.process_index()


def combine_host_metrics(per_host: list) -> dict:
    """Merge per-host metric dicts: finite scalars are averaged across
    hosts, everything else (epoch counters, pool snapshots, strings) is
    taken from host 0 verbatim."""
    base = per_host[0]
    out = dict(base)
    for k, v in base.items():
        if not isinstance(v, float):
            continue
        vals = [h[k] for h in per_host if k in h]
        out[k] = float(np.mean([x for x in vals if np.isfinite(x)] or [v]))
    return out


def reduce_metrics(metrics: dict) -> dict:
    """Cross-host mean of the scalar metrics in an epoch record.

    The reference writes one metrics curve PER RANK (``src/train.py:123-137``,
    rank-suffixed files); that per-host behavior stays the default here, and
    this all-reduce is the opt-in aggregation (``TrainConfig.reduce_metrics``)
    so multi-host runs can log one global curve. Identity when
    single-process."""
    if jax.process_count() == 1:
        return dict(metrics)
    from jax.experimental import multihost_utils

    keys = sorted(
        k for k, v in metrics.items()
        if isinstance(v, float) and not isinstance(v, bool)
    )
    vec = np.asarray([metrics[k] for k in keys], np.float32)
    gathered = np.asarray(multihost_utils.process_allgather(vec))  # (P, K)
    per_host = [
        {**metrics, **{k: float(row[i]) for i, k in enumerate(keys)}}
        for row in gathered
    ]
    return combine_host_metrics(per_host)
