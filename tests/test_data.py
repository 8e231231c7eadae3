"""Data pipeline tests: folder datasets, corrupt-file skipping, sampler
sharding/reshuffle semantics, device prefetch batches."""

import os

import numpy as np
import pytest
from PIL import Image

import jax

from srgan_tpu.config import DataConfig
from srgan_tpu.data.dataset import (
    ImageFolderDataset,
    PairedImageDataset,
    split_indices,
)
from srgan_tpu.data.pipeline import EpochSampler, TrainPipeline


def _make_images(folder, n, size=(40, 30), prefix="img"):
    os.makedirs(folder, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 255, (*size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(folder, f"{prefix}_{i:03d}.png"))


class TestImageFolderDataset:
    def test_scan_and_load(self, tmp_path):
        folder = str(tmp_path / "train")
        _make_images(folder, 4)
        ds = ImageFolderDataset(folder, hr_size=(32, 48))
        assert len(ds) == 4
        img = ds[0]
        assert img.shape == (32, 48, 3)
        assert img.dtype == np.float32
        assert 0.0 <= img.min() and img.max() <= 1.0

    def test_corrupt_file_skipped(self, tmp_path):
        folder = str(tmp_path / "train")
        _make_images(folder, 2)
        with open(os.path.join(folder, "bad.png"), "wb") as f:
            f.write(b"not an image")
        ds = ImageFolderDataset(folder, hr_size=(16, 16))
        # scan still lists it; decode returns None (skip, utils.py:38-40)
        assert len(ds) == 3
        results = [ds[i] for i in range(3)]
        assert sum(r is None for r in results) == 1

    def test_extension_filter(self, tmp_path):
        folder = str(tmp_path / "train")
        _make_images(folder, 1)
        open(os.path.join(folder, "notes.txt"), "w").write("x")
        assert len(ImageFolderDataset(folder, (8, 8))) == 1


class TestPairedDataset:
    def test_pairs(self, tmp_path):
        root = str(tmp_path)
        _make_images(os.path.join(root, "LRbicx4"), 3, size=(10, 8))
        _make_images(os.path.join(root, "original"), 3, size=(40, 32))
        ds = PairedImageDataset(root, "LRbicx4", "original")
        assert len(ds) == 3
        a, b = ds[0]
        assert a.shape == (10, 8, 3) and b.shape == (40, 32, 3)

    def test_count_mismatch_asserts(self, tmp_path):
        root = str(tmp_path)
        _make_images(os.path.join(root, "a"), 2)
        _make_images(os.path.join(root, "b"), 3)
        with pytest.raises(AssertionError):
            PairedImageDataset(root, "a", "b")


class TestSampler:
    def test_epoch_reshuffle(self):
        s = EpochSampler(np.arange(100), seed=0)
        e0, e1 = s.epoch_indices(0), s.epoch_indices(1)
        assert not np.array_equal(e0, e1)  # set_epoch reshuffling
        assert np.array_equal(np.sort(e0), np.arange(100))
        # deterministic per (seed, epoch)
        assert np.array_equal(e0, EpochSampler(np.arange(100), seed=0).epoch_indices(0))

    def test_sharding_partitions(self):
        idx = np.arange(64)
        shards = [
            EpochSampler(idx, num_shards=4, shard_index=r, seed=3).epoch_indices(5)
            for r in range(4)
        ]
        union = np.sort(np.concatenate(shards))
        assert np.array_equal(union, idx)
        for a in range(4):
            for b in range(a + 1, 4):
                assert not set(shards[a]) & set(shards[b])

    def test_shards_derive_from_one_global_permutation(self):
        """DistributedSampler parity (``src/train.py:90-103``): every host
        draws the SAME (seed, epoch) permutation and keeps its strided
        slice — so interleaving the shard streams reconstructs the global
        permutation exactly (multi-host consistency, VERDICT r1 #9)."""
        idx = np.arange(57)  # non-divisible length
        num_shards = 4
        per_shard = len(idx) // num_shards
        global_perm = EpochSampler(idx, seed=9).epoch_indices(2)
        shards = []
        for r in range(num_shards):
            shard = EpochSampler(
                idx, num_shards=num_shards, shard_index=r, seed=9
            ).epoch_indices(2)
            # strided slice of the global permutation, truncated to the
            # common floor: multi-host steps are collectives, so every
            # host must run the SAME batch count (r3 multi-process rule)
            assert np.array_equal(
                shard, global_perm[r::num_shards][:per_shard]
            )
            shards.append(shard)
        assert len({len(s) for s in shards}) == 1

    def test_split_indices(self):
        tr, val = split_indices(10, 0.7, seed=1)
        assert len(tr) == 7 and len(val) == 3
        assert not set(tr) & set(val)


class TestTrainPipeline:
    def test_batches(self, tmp_path):
        folder = str(tmp_path / "train")
        _make_images(folder, 6)
        cfg = DataConfig(
            hr_size=(16, 16), upscale_factor=2, batch_size=2,
            split_ratio=1.0, num_workers=2,
        )
        pipe = TrainPipeline(cfg, folder, use_split=False)
        assert pipe.steps_per_epoch() == 3
        batches = list(pipe.epoch(0, jax.random.key(0)))
        assert len(batches) == 3
        hr, lr = batches[0]
        assert hr.shape == (2, 16, 16, 3)
        assert lr.shape == (2, 8, 8, 3)
        pipe.close()

    def test_streaming_matches_cached(self, tmp_path):
        """device_cache on/off must produce identical (hr, lr) batches —
        both paths ride the same uint8 grid and the same jit transforms."""
        folder = str(tmp_path / "train")
        _make_images(folder, 4)
        base = dict(hr_size=(16, 16), upscale_factor=2, batch_size=2,
                    split_ratio=1.0, num_workers=2)
        pipe_c = TrainPipeline(DataConfig(**base, device_cache="on"), folder,
                               use_split=False)
        pipe_s = TrainPipeline(DataConfig(**base, device_cache="off"), folder,
                               use_split=False)
        got_c = list(pipe_c.epoch(0, jax.random.key(7)))
        got_s = list(pipe_s.epoch(0, jax.random.key(7)))
        assert len(got_c) == len(got_s) == 2
        for (hc, lc), (hs, ls) in zip(got_c, got_s):
            np.testing.assert_array_equal(np.asarray(hc), np.asarray(hs))
            np.testing.assert_array_equal(np.asarray(lc), np.asarray(ls))
        pipe_c.close()
        pipe_s.close()

    def test_fully_corrupt_batch_substituted_not_dropped(self, tmp_path):
        """A batch whose every file fails to decode must still be yielded
        (previous good batch, or zeros at epoch start): dropping it would
        desync per-host batch counts on multi-process runs — one host
        running fewer collective steps deadlocks the others — and break
        the steps_per_epoch() contract."""
        from srgan_tpu.data.pipeline import HostBatcher
        from srgan_tpu.data.dataset import ImageFolderDataset

        folder = str(tmp_path / "train")
        _make_images(folder, 2)  # img_0.png, img_1.png (sorted first)
        for name in ("z_bad0.png", "z_bad1.png"):  # sorted last
            with open(os.path.join(folder, name), "wb") as f:
                f.write(b"not an image")
        ds = ImageFolderDataset(folder, hr_size=(16, 16))
        batcher = HostBatcher(ds, batch_size=2, num_workers=1)

        # corrupt chunk FIRST: no prior good batch -> zeros substitute
        got = list(batcher.batches(np.array([2, 3, 0, 1])))
        assert len(got) == 2
        assert not got[0].any()
        assert got[1].any()

        # corrupt chunk SECOND: previous good batch repeated
        got = list(batcher.batches(np.array([0, 1, 2, 3])))
        assert len(got) == 2
        np.testing.assert_array_equal(got[0], got[1])
        batcher.close()

    def test_cache_corrupt_rows_dropped(self, tmp_path):
        folder = str(tmp_path / "train")
        _make_images(folder, 4)
        with open(os.path.join(folder, "bad.png"), "wb") as f:
            f.write(b"junk")
        cfg = DataConfig(hr_size=(8, 8), upscale_factor=2, batch_size=2,
                         split_ratio=1.0, device_cache="on")
        pipe = TrainPipeline(cfg, folder, use_split=False)
        batches = list(pipe.epoch(0, jax.random.key(0)))
        assert len(batches) == 2  # 4 good images -> 2 batches
        pipe.close()

    def test_shared_cache_budget_single_reservation(self, tmp_path):
        """Two auto-mode pipelines sharing one DeviceCacheBudget must not
        BOTH cache when only one fits: the first to decide reserves the
        bytes, the second streams (VERDICT-r3 review finding: independent
        checks let train+val commit 2x the budget)."""
        from srgan_tpu.data.pipeline import DeviceCacheBudget

        folder = str(tmp_path / "train")
        _make_images(folder, 4)
        base = dict(hr_size=(8, 8), upscale_factor=2, batch_size=2,
                    split_ratio=1.0, device_cache="auto")
        one_cache = 4 * 8 * 8 * 3  # exactly one 4-image uint8 cache
        budget = DeviceCacheBudget(one_cache)
        first = TrainPipeline(DataConfig(**base), folder, use_split=False,
                              cache_budget=budget)
        second = TrainPipeline(DataConfig(**base), folder, use_split=False,
                               cache_budget=budget)
        assert first._cache_wanted() is True
        assert second._cache_wanted() is False
        # memoized: asking again (as epoch() does) must not re-reserve or
        # flip the answer
        assert first._cache_wanted() is True
        assert budget.remaining == 0
        # both still yield identical data regardless of the path taken
        got_f = list(first.epoch(0, jax.random.key(3)))
        got_s = list(second.epoch(0, jax.random.key(3)))
        for (hf, lf), (hs, ls) in zip(got_f, got_s):
            np.testing.assert_array_equal(np.asarray(hf), np.asarray(hs))
            np.testing.assert_array_equal(np.asarray(lf), np.asarray(ls))
        first.close()
        second.close()

    def test_split_used(self, tmp_path):
        folder = str(tmp_path / "train")
        _make_images(folder, 10)
        cfg = DataConfig(hr_size=(8, 8), upscale_factor=2, batch_size=1,
                         split_ratio=0.7)
        pipe = TrainPipeline(cfg, folder, use_split=True)
        assert len(pipe.sampler.indices) == 7  # 70% kept, 30% discarded
        pipe.close()
