"""Subprocess worker for the real multi-process distributed e2e test.

Each worker is one *process* of a 2-process JAX CPU cluster — the actual
topology of the reference's ``mp.spawn`` + ``init_process_group("nccl")``
launch (``src/train.py:29-31,301-302``), executed for real rather than
simulated on a single-process virtual mesh. Gloo carries the CPU
collectives; the same code path uses ICI/DCN on a TPU pod.

Modes
-----
``pixel``      2 processes × 2 devices, single generator, pixel loss,
               streaming pipeline. Dumps epoch-0 shard indices, the final
               (cross-host reduced) epoch record, and the final generator
               params — the test asserts disjoint shards, identical reduced
               records on both hosts, and parity with the ``reference`` run.
``gan_pool``   2 processes × 2 devices, 2-generator stacked pool + GAN +
               device-resident cache + reduce_metrics: the full fused
               multi-generator path under a real multi-process topology.
``reference``  single process × 4 devices emulating the SAME global batch
               order (each global batch = concat of the two host shards'
               local batches) — the params-parity oracle for ``pixel``.
``sigterm``    like ``pixel`` but effectively endless (200 epochs) with a
               tight stop-sync cadence; the TEST delivers SIGTERM to host 0
               only, and BOTH hosts must agree on the stop via the
               collective OR (Trainer._should_stop), snapshot together, and
               exit 0 — a host-local break would deadlock the peer in its
               next collective step.

Invoked by ``tests/test_multiprocess.py``; not a pytest module itself.
"""

import argparse
import json
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

N_PROCS = 2
LOCAL_DEVICES = 2
LOCAL_BATCH = 2


def build_cfg(args, batch_size: int):
    from srgan_tpu.config import (
        Config,
        DataConfig,
        DiscriminatorConfig,
        ModelConfig,
        PoolConfig,
        TrainConfig,
    )

    gan = args.mode == "gan_pool"
    sig = args.mode == "sigterm"
    return Config(
        model=ModelConfig(num_features=8, num_residuals=1, upscale_factor=2),
        discriminator=DiscriminatorConfig(num_filters=8, num_stages=2),
        data=DataConfig(
            hr_size=(32, 32),
            upscale_factor=2,
            batch_size=batch_size,
            split_ratio=1.0,
            num_workers=2,
            device_cache="on" if gan else "off",
        ),
        pool=PoolConfig(num_generators=2 if gan else 1),
        train=TrainConfig(
            # sigterm mode runs "forever" — the test's signal ends it
            num_epochs=200 if sig else 2,
            validate_every=1000 if sig else 1,
            score_max_batches=1 if sig else 2,
            stop_sync_every_batches=2,
            results_dir=args.results_dir,
            seed=3,
            use_gan=gan,
            reduce_metrics=True,
        ),
    )


def shard_indices_epoch0(cfg, train_dir, num_shards, shard_index):
    """The epoch-0 sampler slice this host trains on (introspection only —
    mirrors the pipeline Trainer builds internally)."""
    from srgan_tpu.data.pipeline import TrainPipeline

    pipe = TrainPipeline(
        cfg.data,
        train_dir,
        use_split=True,
        num_shards=num_shards,
        shard_index=shard_index,
        seed=cfg.train.seed,
    )
    idx = pipe.sampler.epoch_indices(0)
    pipe.close()
    return [int(i) for i in idx]


def first_batch_sums(cfg, train_dir):
    """Per-row pixel sums of this host's rows of the FIRST training batch
    (epoch 0), through the exact pipeline the Trainer uses. The test
    concatenates the hosts' rows in process order and compares bitwise
    against the single-process emulation — the strong form of the
    "same global batch order" claim (batch content, noise included)."""
    from srgan_tpu.data.pipeline import TrainPipeline
    from srgan_tpu.parallel.mesh import (
        batch_sharding, host_local_rows, make_mesh,
    )

    mesh = make_mesh()
    pipe = TrainPipeline(
        cfg.data,
        train_dir,
        use_split=True,
        num_shards=jax.process_count(),
        shard_index=jax.process_index(),
        seed=cfg.train.seed,
        sharding=batch_sharding(mesh),
    )
    epoch_key = jax.random.fold_in(jax.random.key(cfg.train.seed), 0)
    for hr, lr_imgs in pipe.epoch(0, epoch_key):
        out = {
            "hr_sums": np.asarray(
                host_local_rows(hr), np.float64
            ).sum(axis=(1, 2, 3)).tolist(),
            "lr_sums": np.asarray(
                host_local_rows(lr_imgs), np.float64
            ).sum(axis=(1, 2, 3)).tolist(),
        }
        pipe.close()
        return out
    pipe.close()
    return {}


def flat_params(trainer):
    """Leader generator params as a flat list of numpy arrays (replicated
    across hosts, so every process can fetch them whole)."""
    _, params = trainer._leader()
    leaves = jax.tree.leaves(params)
    return [np.asarray(leaf) for leaf in leaves]


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--mode", choices=["pixel", "gan_pool", "reference", "sigterm"]
    )
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--train-dir", required=True)
    p.add_argument("--val-dir", required=True)
    p.add_argument("--results-dir", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    multiproc = args.mode in ("pixel", "gan_pool", "sigterm")
    if multiproc:
        jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=N_PROCS,
            process_id=args.process_id,
        )
        assert jax.process_count() == N_PROCS
        assert jax.device_count() == N_PROCS * LOCAL_DEVICES
        batch_size = LOCAL_BATCH  # per-host, like the reference's per-rank 12
    else:
        jax.config.update("jax_num_cpu_devices", N_PROCS * LOCAL_DEVICES)
        batch_size = LOCAL_BATCH * N_PROCS  # the equivalent global batch

    cfg = build_cfg(args, batch_size)

    if args.mode == "reference":
        # Patch the sampler so each single-process global batch is the
        # concatenation of the two host shards' local batches — the exact
        # global batch order the multi-process run assembles via
        # jax.make_array_from_process_local_data (host 0 rows first).
        from srgan_tpu.data import pipeline as pl

        def emulated(self, epoch):
            perm = np.random.default_rng((self.seed, epoch)).permutation(
                len(self.indices)
            )
            shuffled = self.indices[perm]
            per = len(shuffled) // N_PROCS
            shards = [shuffled[i::N_PROCS][:per] for i in range(N_PROCS)]
            chunks = []
            for b in range(per // LOCAL_BATCH):
                for s in shards:
                    chunks.append(s[b * LOCAL_BATCH : (b + 1) * LOCAL_BATCH])
            return (
                np.concatenate(chunks) if chunks else shuffled[:0]
            )

        pl.EpochSampler.epoch_indices = emulated

    from srgan_tpu.training.loop import Trainer

    trainer = Trainer(cfg)
    last = trainer.train(args.train_dir, args.val_dir)

    out = {
        "mode": args.mode,
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "record": {
            k: v for k, v in last.items() if not isinstance(v, (list, dict))
        },
        "pool_meta": last.get("pool"),
    }
    if args.mode == "sigterm":
        from srgan_tpu.training.checkpoint import latest_ckpt_dir

        ckpt_dir = latest_ckpt_dir(args.results_dir, "Training")
        out["ckpt_dir"] = (
            os.path.basename(ckpt_dir) if ckpt_dir is not None else None
        )
    if multiproc and args.mode != "sigterm":
        out["shard_indices"] = shard_indices_epoch0(
            cfg, args.train_dir, N_PROCS, jax.process_index()
        )
    if args.mode in ("pixel", "reference"):
        out["first_batch"] = first_batch_sums(cfg, args.train_dir)
    leaves = flat_params(trainer)
    np.savez(args.out + ".params.npz", *leaves)
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"[{args.mode}:{jax.process_index()}] OK", flush=True)


if __name__ == "__main__":
    main()
