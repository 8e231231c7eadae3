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
    """Replicate a pytree (params/opt state) across the mesh.

    Multi-process: ``jax.device_put`` cannot target non-addressable devices,
    so each leaf is assembled into a global fully-replicated array from this
    process's (identical, same-seed) host copy via
    ``jax.make_array_from_process_local_data``."""
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.device_put(tree, sharding)


def put_global(batch, sharding: Optional[NamedSharding]):
    """Lay a host-local numpy batch out over a (possibly multi-process) mesh.

    Single-process: plain ``jax.device_put``. Multi-process: this host's
    rows become its block of the global batch-sharded array (the global
    batch is the concatenation of all hosts' local batches — the
    ``DistributedSampler`` per-rank-batch semantics, ``src/train.py:90-95``).
    """
    if sharding is None:
        return jax.device_put(batch)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(batch)
        )
    return jax.device_put(batch, sharding)


def host_local_rows(arr) -> np.ndarray:
    """This host's rows of a (possibly) batch-sharded global array.

    Single-process / fully-addressable arrays fetch whole. Multi-process
    batch-sharded arrays return the process-local block in row order —
    the per-rank view, matching the reference's per-rank validation
    artifacts (``src/train.py:233-260``)."""
    if getattr(arr, "is_fully_addressable", True) or arr.is_fully_replicated:
        return np.asarray(arr)
    # Row semantics require dim-0 (batch) sharding: on an array sharded
    # along any OTHER axis every shard's index[0] is slice(None), the
    # dedup below would keep one stripe and silently return a fragment.
    def _full_axis(sl, dim):
        return (sl.start in (None, 0)) and (sl.stop in (None, dim))

    if any(
        not _full_axis(s.index[i], arr.shape[i])
        for s in arr.addressable_shards
        for i in range(1, arr.ndim)
    ):
        raise ValueError(
            "host_local_rows needs a batch-(dim-0-)sharded array; got "
            f"shards along a non-leading axis (sharding={arr.sharding})"
        )
    seen = set()
    rows = []
    for s in sorted(
        arr.addressable_shards, key=lambda s: s.index[0].start or 0
    ):
        start = s.index[0].start or 0
        if start in seen:
            continue  # replicated copy of a block already collected
        seen.add(start)
        rows.append(np.asarray(s.data))
    return np.concatenate(rows)


def initialize_multihost(**kwargs) -> None:
    """Multi-host bring-up: replaces the reference's MASTER_ADDR/PORT +
    ``init_process_group("nccl")`` rendezvous (``src/train.py:29-31``)."""
    jax.distributed.initialize(**kwargs)


def process_shard_info() -> tuple:
    """(num_shards, shard_index) for host-sharded data loading — the
    ``DistributedSampler(num_replicas, rank)`` equivalent
    (``src/train.py:90-93``)."""
    return jax.process_count(), jax.process_index()


def any_process_flag(flag: bool) -> bool:
    """Cross-host OR of a per-host boolean (identity when single-process).

    Used to turn host-local events (e.g. a SIGTERM delivered to one host)
    into a COLLECTIVE decision: every process must call this at the same
    point, and every process receives the same answer — a host-local break
    out of a loop of collective train steps would deadlock the others."""
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils

    v = np.asarray([1.0 if flag else 0.0], np.float32)
    gathered = np.asarray(multihost_utils.process_allgather(v))
    return bool(gathered.max() > 0.0)


_NO_REDUCE_KEYS = ("epoch",)  # identical across hosts by construction


def _reducible(key: str, value) -> bool:
    """True for the numeric scalars that cross-host aggregation averages:
    python/numpy floats AND ints (``n_batches``-style counters included),
    excluding bools and the epoch counter."""
    if key in _NO_REDUCE_KEYS or isinstance(value, bool):
        return False
    return isinstance(value, (int, float, np.floating, np.integer))


def combine_host_metrics(per_host: list) -> dict:
    """Merge per-host metric dicts: finite numeric scalars (floats and int
    counters alike) are averaged across hosts; everything else (the epoch
    counter, pool snapshots, strings) comes from ``per_host[0]``. NOTE:
    when called from :func:`reduce_metrics`, every entry of ``per_host``
    spreads the CALLING host's dict (only the scalar keys differ per row),
    so non-reduced fields are the local host's values, not host 0's — they
    are identical across hosts in normal operation (lockstep pool
    bookkeeping), but a host-local divergence (e.g. a NaN entering one
    host's loss EMA) stays visible in that host's record rather than being
    masked by host 0's copy. Int-typed values whose mean is integral stay
    ints (hosts run equal batch counts by construction — ``EpochSampler``
    truncates shards to a common length)."""
    base = per_host[0]
    out = dict(base)
    for k, v in base.items():
        if not _reducible(k, v):
            continue
        vals = [float(h[k]) for h in per_host if k in h]
        mean = float(np.mean([x for x in vals if np.isfinite(x)] or [v]))
        if isinstance(v, (int, np.integer)) and mean.is_integer():
            mean = int(mean)
        out[k] = mean
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

    keys = sorted(k for k, v in metrics.items() if _reducible(k, v))
    # float32: x64 is disabled by default and process_allgather would
    # downcast anyway; int counters (small) are exact in float32.
    vec = np.asarray([float(metrics[k]) for k in keys], np.float32)
    gathered = np.asarray(multihost_utils.process_allgather(vec))  # (P, K)
    per_host = [
        {
            **metrics,
            **{
                k: (
                    int(row[i])
                    if isinstance(metrics[k], (int, np.integer))
                    else float(row[i])
                )
                for i, k in enumerate(keys)
            },
        }
        for row in gathered
    ]
    return combine_host_metrics(per_host)
