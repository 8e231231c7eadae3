"""Batched, prefetched host→device input pipeline.

Replaces the reference's ``DataLoader(batch_size=12, num_workers=0)`` +
per-item PIL transforms + per-batch ``.to(device)`` copies
(``src/train.py:90-95,151-153``) with a TPU-first pipeline:

  - native C++ (or PIL-fallback) decode + PIL-parity bicubic resize to
    canonical HR clips, as **uint8** — the resampler quantizes to the uint8
    grid anyway, so this is lossless and host→device batches are 4x smaller;
  - per-epoch reshuffled, host-sharded sampling (the ``DistributedSampler``
    + ``set_epoch`` equivalent, ``src/train.py:90-103``);
  - **device-resident dataset cache** (``DataConfig.device_cache``): decode
    once, upload the whole uint8 dataset to HBM, and assemble every batch
    with an on-device gather — zero host→device bytes per training step.
    Auto-enabled when the dataset fits the budget; essential on slow host
    links (the dev tunnel moves ~20 MB/s, making per-batch uploads the
    bottleneck at ~6 img/s vs the ~109 img/s compute rate);
  - streaming fallback with double-buffered ``jax.device_put`` prefetch;
  - jit-compiled on-device /255 conversion + LR degradation (bilinear
    ÷factor + per-image gaussian noise, ``src/transformers.py:73-77``) with
    randomness threaded through ``jax.random`` keys (SURVEY.md §7(e)).

Batch shapes are static (drop-remainder) so every training step hits the
same compiled executable.
"""

from __future__ import annotations

import collections
import concurrent.futures as futures
import sys
from typing import Iterator, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from srgan_tpu.config import DataConfig
from srgan_tpu.data.dataset import (
    ImageFolderDataset,
    _native_available,
    load_hr_clip_u8,
    split_indices,
)
from srgan_tpu.ops.resize import gather_prepare_batch, prepare_batch
from srgan_tpu.parallel.mesh import put_global


class EpochSampler:
    """Per-epoch reshuffled, sharded index sampler.

    Semantics of ``DistributedSampler(shuffle=True)`` + ``set_epoch``
    (``src/train.py:90-103``): every epoch draws a fresh permutation seeded
    by (seed, epoch) — identical on every host — and this host keeps its
    ``shard_index``-strided slice.
    """

    def __init__(
        self,
        indices: Sequence[int],
        *,
        num_shards: int = 1,
        shard_index: int = 0,
        seed: int = 0,
    ):
        self.indices = np.asarray(indices)
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.seed = seed

    def epoch_indices(self, epoch: int) -> np.ndarray:
        perm = np.random.default_rng((self.seed, epoch)).permutation(
            len(self.indices)
        )
        shuffled = self.indices[perm]
        if self.num_shards == 1:
            return shuffled
        # Equal length on every shard: multi-host steps are collective —
        # one host running an extra batch would deadlock the others — so
        # shards truncate to the common floor (DistributedSampler instead
        # pads with duplicates; either keeps ranks in lockstep).
        per_shard = len(shuffled) // self.num_shards
        return shuffled[self.shard_index :: self.num_shards][:per_shard]


class HostBatcher:
    """Decode + batch assembly of HR clips (NHWC uint8 numpy).

    Fast path: one call into the native C++ loader per batch — decode and
    PIL-parity resize run on ``num_workers`` C++ threads with the GIL
    released (``srgan_tpu/native/loader.cpp``). Fallback: a Python thread
    pool over PIL decodes.
    """

    def __init__(
        self,
        dataset: ImageFolderDataset,
        batch_size: int,
        num_workers: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.native = _native_available()
        self.pool = (
            None
            if self.native
            else futures.ThreadPoolExecutor(max_workers=self.num_workers)
        )

    def decode_many(self, indices) -> Tuple[np.ndarray, np.ndarray]:
        """Decode arbitrary count of images → (uint8 array, ok mask)."""
        paths = [self.dataset.path(int(i)) for i in indices]
        h, w = self.dataset.hr_size
        if self.native:
            from srgan_tpu import native

            return native.load_batch_u8(paths, h, w, self.num_workers)
        out = np.zeros((len(paths), h, w, 3), np.uint8)
        ok = np.zeros(len(paths), bool)

        def work(k):
            img = load_hr_clip_u8(paths[k], (h, w), use_native=False)
            if img is not None:
                out[k] = img
                ok[k] = True

        list(self.pool.map(work, range(len(paths)))) if self.pool else [
            work(k) for k in range(len(paths))
        ]
        return out, ok

    def batches(self, indices: np.ndarray) -> Iterator[np.ndarray]:
        n_full = len(indices) // self.batch_size
        last_good = None
        for b in range(n_full):
            chunk = indices[b * self.batch_size : (b + 1) * self.batch_size]
            batch, ok = self.decode_many(chunk)
            if not ok.any():
                # A fully-corrupt batch must NOT change the number of
                # yielded batches: on multi-process runs every host has to
                # dispatch the same number of collective train steps (one
                # host running fewer batches deadlocks the others — the
                # same invariant EpochSampler enforces on indices), and
                # steps_per_epoch() promises n_full either way. Substitute
                # the previous good batch (or zeros if the epoch STARTS
                # corrupt) instead of dropping.
                print(
                    f"warning: batch {b}: all {len(chunk)} files failed to "
                    "decode; repeating previous batch",
                    file=sys.stderr,
                )
                yield (last_good if last_good is not None
                       else np.zeros_like(batch))
                continue
            if not ok.all():
                # corrupt-file skip with static shapes: refill bad slots
                good = np.flatnonzero(ok)
                for bad in np.flatnonzero(~ok):
                    batch[bad] = batch[good[bad % len(good)]]
            last_good = batch
            yield batch

    def close(self):
        if self.pool is not None:
            self.pool.shutdown(wait=False)


def _device_prefetch(
    iterator: Iterator[np.ndarray], depth: int, sharding=None
) -> Iterator[jax.Array]:
    """Keep ``depth`` batches in flight on device (double buffering)."""
    queue: collections.deque = collections.deque()

    for batch in iterator:
        queue.append(put_global(batch, sharding))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


class DeviceCacheBudget:
    """Shared HBM accounting for ``device_cache="auto"`` pipelines.

    A trainer holds TWO pipelines (train + val); if each checked its own
    footprint against the full ``device_cache_budget_bytes`` independently,
    both could auto-enable and together commit 2x the budget. Construct one
    tracker and pass it to every pipeline: reservations are first-come
    (construct the train pipeline first — its cache is the hot one).
    """

    def __init__(self, total_bytes: int):
        self.remaining = int(total_bytes)

    def try_reserve(self, nbytes: int) -> bool:
        if nbytes <= self.remaining:
            self.remaining -= nbytes
            return True
        return False


class TrainPipeline:
    """End-to-end training input pipeline: yields (hr, lr) device batches.

    ``sharding`` (optional ``jax.sharding.NamedSharding``) lays each batch
    out over the data mesh so the jit'd train step consumes it without any
    resharding.
    """

    def __init__(
        self,
        cfg: DataConfig,
        folder: str,
        *,
        use_split: bool = True,
        num_shards: int = 1,
        shard_index: int = 0,
        seed: int = 0,
        sharding=None,
        cache_budget: "DeviceCacheBudget | None" = None,
        augment: "bool | None" = None,
    ):
        self.cfg = cfg
        # Validation pipelines pass augment=False: scoring must see the
        # images themselves, not random flips of them.
        self.augment = cfg.augment_flips if augment is None else augment
        self.dataset = ImageFolderDataset(folder, cfg.hr_size)
        if use_split and cfg.split_ratio < 1.0:
            train_idx, _ = split_indices(
                len(self.dataset), cfg.split_ratio, cfg.split_seed
            )
        else:
            train_idx = np.arange(len(self.dataset))
        self.sampler = EpochSampler(
            train_idx,
            num_shards=num_shards,
            shard_index=shard_index,
            seed=seed,
        )
        self.batcher = HostBatcher(self.dataset, cfg.batch_size, cfg.num_workers)
        self.sharding = sharding
        self.cache_budget = cache_budget
        self._cache_decision = None   # memoized _cache_wanted (one reserve)
        self._device_dataset = None   # uint8 (rows, H, W, 3) in HBM
        self._row_of = None           # dataset index -> cache row (-1 corrupt)

    # ------------------------------------------------------------------ #

    def steps_per_epoch(self) -> int:
        per_shard = len(self.sampler.indices) // self.sampler.num_shards
        return per_shard // self.cfg.batch_size

    def _cache_wanted(self) -> bool:
        # Memoized: with a shared DeviceCacheBudget the auto decision
        # RESERVES bytes, and epoch() asks every epoch — deciding once keeps
        # the reservation single-shot and the answer stable across epochs.
        if self._cache_decision is None:
            self._cache_decision = self._decide_cache()
        return self._cache_decision

    def _decide_cache(self) -> bool:
        if self.cfg.device_cache == "off":
            return False
        if self.cfg.device_cache == "on":
            return True
        h, w = self.cfg.hr_size
        # Budget against what actually gets cached: the sampler's index set
        # (the train split) — held-out rows are never drawn, never cached,
        # and must not disqualify a split that would fit.
        nbytes = len(self.sampler.indices) * h * w * 3
        if self.cache_budget is not None:
            return self.cache_budget.try_reserve(nbytes)
        return nbytes <= self.cfg.device_cache_budget_bytes

    def _ensure_device_cache(self):
        if self._device_dataset is not None:
            return self._device_dataset
        # Cache exactly the rows the sampler can draw. With host-sharded
        # sampling every epoch re-deals the SAME split across hosts, so the
        # union over epochs is the full split on every host — the cache is
        # replicated, and the split set is host-independent by construction.
        cache_idx = np.asarray(self.sampler.indices)
        batch, ok = self.batcher.decode_many(cache_idx)
        # batch[ok] copies; on the common no-corruption path keep the
        # original array — a flagship cache is GBs and the copy would
        # transiently double host RAM.
        rows = batch if ok.all() else batch[ok]
        self._row_of = np.full(len(self.dataset), -1, np.int64)
        self._row_of[cache_idx[ok]] = np.arange(len(rows))
        if self.sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.sharding.mesh, P())
            # put_global handles the multi-process case: every host decodes
            # the full dataset (decode_many(all_idx) above), so each can
            # supply the complete replicated value.
            self._device_dataset = put_global(rows, repl)
        else:
            self._device_dataset = jax.device_put(rows)
        return self._device_dataset

    # ------------------------------------------------------------------ #

    def epoch(
        self, epoch: int, key: jax.Array
    ) -> Iterator[Tuple[jax.Array, jax.Array]]:
        if self._cache_wanted():
            yield from self._epoch_cached(epoch, key)
        else:
            yield from self._epoch_streaming(epoch, key)

    def _epoch_cached(self, epoch, key):
        dataset = self._ensure_device_cache()
        indices = self.sampler.epoch_indices(epoch)
        rows = self._row_of[indices]
        bad = rows < 0
        if bad.any():
            good = rows[~bad]
            if len(good):
                # Corrupt-file skip WITHOUT changing the batch count:
                # steps_per_epoch() promises len(indices)//b batches, and
                # multi-host runs require identical counts on every host
                # (collective steps) — so substitute good rows for bad
                # slots, mirroring HostBatcher.batches()'s refill.
                rows = rows.copy()
                rows[bad] = good[np.arange(int(bad.sum())) % len(good)]
            else:
                rows = good  # every sampled file corrupt: nothing to run
        multiprocess = jax.process_count() > 1
        if multiprocess:
            # Corrupt files may fall unevenly across shards; hosts must run
            # identical batch counts (collective steps), so truncate every
            # shard to the global minimum. One tiny allgather per epoch.
            from jax.experimental import multihost_utils

            counts = np.asarray(
                multihost_utils.process_allgather(
                    np.asarray([len(rows)], np.int32)
                )
            )
            rows = rows[: int(counts.min())]
        b = self.cfg.batch_size
        for step in range(len(rows) // b):
            chunk = rows[step * b : (step + 1) * b]
            if multiprocess:
                # Global batch-sharded gather indices: each host's rows land
                # on its devices; the gather of the replicated HBM cache is
                # then communication-free under GSPMD.
                idx = put_global(chunk, self.sharding)
            elif self.sharding is not None:
                # Single-process mesh: commit the indices batch-sharded so
                # the gather output IS batch-sharded — no per-batch
                # reshard of the full hr/lr tensors afterwards.
                idx = jax.device_put(jnp.asarray(chunk), self.sharding)
            else:
                idx = jnp.asarray(chunk)
            step_key = jax.random.fold_in(key, step)
            hr, lr = gather_prepare_batch(
                dataset, idx, step_key,
                factor=self.cfg.upscale_factor,
                noise_std_max=self.cfg.noise_std_max,
                salt_prob=self.cfg.salt_prob,
                pepper_prob=self.cfg.pepper_prob,
                spot_size=self.cfg.sp_spot_size,
                augment_flips=self.augment,
            )
            if self.sharding is not None and not multiprocess:
                hr = jax.device_put(hr, self.sharding)
                lr = jax.device_put(lr, self.sharding)
            yield hr, lr

    def _epoch_streaming(self, epoch, key):
        indices = self.sampler.epoch_indices(epoch)
        hr_stream = _device_prefetch(
            self.batcher.batches(indices),
            self.cfg.prefetch_depth,
            self.sharding,
        )
        for step, hr_u8 in enumerate(hr_stream):
            step_key = jax.random.fold_in(key, step)
            yield prepare_batch(
                hr_u8,
                step_key,
                factor=self.cfg.upscale_factor,
                noise_std_max=self.cfg.noise_std_max,
                salt_prob=self.cfg.salt_prob,
                pepper_prob=self.cfg.pepper_prob,
                spot_size=self.cfg.sp_spot_size,
                augment_flips=self.augment,
            )

    def close(self):
        self.batcher.close()
