"""Batched, prefetched host→device input pipeline.

Replaces the reference's ``DataLoader(batch_size=12, num_workers=0)`` +
per-item PIL transforms + per-batch ``.to(device)`` copies
(``src/train.py:90-95,151-153``) with:

  - a thread pool decoding/resizing images to canonical HR clips on the host,
  - per-epoch reshuffled, host-sharded sampling (the ``DistributedSampler`` +
    ``set_epoch`` equivalent, ``src/train.py:90-103``),
  - double-buffered ``jax.device_put`` prefetch so the next batch's H2D copy
    overlaps the current step's compute,
  - on-device, jit-compiled LR degradation (bilinear ÷factor + per-image
    gaussian noise, ``src/transformers.py:73-77``) — the randomness is
    threaded through ``jax.random`` keys for reproducibility under jit
    (SURVEY.md §7(e)).

Batch shapes are static (drop-remainder) so every training step hits the same
compiled executable.
"""

from __future__ import annotations

import collections
import concurrent.futures as futures
import itertools
from typing import Iterator, Optional, Sequence, Tuple

import jax
import numpy as np

from srgan_tpu.config import DataConfig
from srgan_tpu.data.dataset import ImageFolderDataset, split_indices
from srgan_tpu.ops.resize import degrade_batch


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
        drop_remainder_to: Optional[int] = None,
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
        return shuffled[self.shard_index :: self.num_shards]


class HostBatcher:
    """Decode + batch assembly of HR clips (NHWC float32 numpy).

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
        from srgan_tpu.data.dataset import _native_available

        self.native = _native_available()
        self.pool = (
            None
            if self.native
            else futures.ThreadPoolExecutor(max_workers=self.num_workers)
        )

    def _batch_native(self, chunk: np.ndarray) -> Optional[np.ndarray]:
        from srgan_tpu import native

        paths = [self.dataset.path(int(i)) for i in chunk]
        h, w = self.dataset.hr_size
        batch, ok = native.load_batch(paths, h, w, self.num_workers)
        if ok.all():
            return batch
        if not ok.any():
            return None
        good = np.flatnonzero(ok)
        # corrupt-file skip with static shapes: refill bad slots from good
        for bad in np.flatnonzero(~ok):
            batch[bad] = batch[good[bad % len(good)]]
        return batch

    def batches(self, indices: np.ndarray) -> Iterator[np.ndarray]:
        n_full = len(indices) // self.batch_size
        for b in range(n_full):
            chunk = indices[b * self.batch_size : (b + 1) * self.batch_size]
            if self.native:
                batch = self._batch_native(chunk)
                if batch is not None:
                    yield batch
                continue
            imgs = list(self.pool.map(self.dataset.__getitem__, chunk))
            imgs = [im for im in imgs if im is not None]  # corrupt-file skip
            if not imgs:
                continue
            while len(imgs) < self.batch_size:  # keep static shapes
                imgs.append(imgs[len(imgs) % len(imgs)])
            yield np.stack(imgs)

    def close(self):
        if self.pool is not None:
            self.pool.shutdown(wait=False)


def _device_prefetch(
    iterator: Iterator[np.ndarray], depth: int, sharding=None
) -> Iterator[jax.Array]:
    """Keep ``depth`` batches in flight on device (double buffering)."""
    queue: collections.deque = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


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
    ):
        self.cfg = cfg
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

    def steps_per_epoch(self) -> int:
        per_shard = len(self.sampler.indices) // self.sampler.num_shards
        return per_shard // self.cfg.batch_size

    def epoch(
        self, epoch: int, key: jax.Array
    ) -> Iterator[Tuple[jax.Array, jax.Array]]:
        indices = self.sampler.epoch_indices(epoch)
        hr_stream = _device_prefetch(
            self.batcher.batches(indices),
            self.cfg.prefetch_depth,
            self.sharding,
        )
        for step, hr in enumerate(hr_stream):
            step_key = jax.random.fold_in(key, step)
            lr = degrade_batch(
                hr,
                step_key,
                factor=self.cfg.upscale_factor,
                noise_std_max=self.cfg.noise_std_max,
            )
            yield hr, lr

    def close(self):
        self.batcher.close()
