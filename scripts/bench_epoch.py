"""Real-data training epoch throughput benchmark (VERDICT r1 item #2).

Measures the END-TO-END epoch loop rate (``Trainer.train_epoch`` over the
device-cached real-data pipeline) at the flagship shapes, to compare against
the synthetic fused-step compute rate from ``bench.py``. The reference's
equivalent hot loop is ``src/train.py:151-166`` (DataLoader + H2D copies +
train_generator per batch).

Generates a deterministic synthetic image folder on first use (structured
content — gradients, shapes, band-limited texture — so quality runs on the
same data are meaningful), then times full epochs. Epoch 0 pays the
decode+upload of the device cache and is reported separately.

Usage:
  python scripts/bench_epoch.py [--images 360] [--batch 24] [--epochs 4]
                                [--gan] [--pool N] [--features 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(folder: str, n: int, h: int, w: int, seed: int = 0) -> None:
    """Deterministic structured images: smooth 2-D gradients + random
    rectangles/circles + band-limited texture. JPEG q95."""
    from PIL import Image

    os.makedirs(folder, exist_ok=True)
    existing = [f for f in os.listdir(folder) if f.endswith(".jpg")]
    if len(existing) >= n:
        return
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for i in range(n):
        path = os.path.join(folder, f"img_{i:05d}.jpg")
        if os.path.exists(path):
            continue
        img = np.zeros((h, w, 3), np.float32)
        # smooth background gradient
        for c in range(3):
            a, b, ph = rng.uniform(-1, 1, 3)
            img[..., c] = 0.5 + 0.25 * (
                a * (yy / h - 0.5) + b * (xx / w - 0.5) + 0.3 * np.sin(
                    2 * np.pi * (ph + yy / h * rng.uniform(1, 3))
                )
            )
        # rectangles and circles with sharp edges (gives PSNR headroom)
        for _ in range(rng.integers(6, 14)):
            cy, cx = rng.uniform(0, h), rng.uniform(0, w)
            col = rng.uniform(0, 1, 3).astype(np.float32)
            if rng.random() < 0.5:
                hh, ww = rng.uniform(10, h / 3), rng.uniform(10, w / 3)
                mask = (np.abs(yy - cy) < hh / 2) & (np.abs(xx - cx) < ww / 2)
            else:
                r = rng.uniform(8, h / 4)
                mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
            img[mask] = 0.7 * col + 0.3 * img[mask]
        # band-limited texture: upsampled low-res noise
        lo = rng.uniform(-0.08, 0.08, (h // 16, w // 16, 3)).astype(np.float32)
        tex = np.kron(lo, np.ones((16, 16, 1), np.float32))
        img = np.clip(img + tex, 0.0, 1.0)
        Image.fromarray((img * 255).astype(np.uint8)).save(path, quality=95)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=360)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--gan", action="store_true")
    ap.add_argument("--pool", type=int, default=1)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--d-features", type=int, default=64,
                    help="discriminator base width (scale with --features "
                         "so the critic keeps pace with a wider generator)")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint residual blocks (fits pool+GAN at "
                         "larger batches)")
    ap.add_argument("--pool-exec", choices=("scan", "vmap"), default="scan",
                    help="stacked-pool executor (PoolConfig.member_exec)")
    ap.add_argument("--d-target", choices=("leader", "round_robin"),
                    default="leader",
                    help="which member's SR trains the shared critic "
                         "(PoolConfig.d_train_target)")
    ap.add_argument("--no-mutual", action="store_true",
                    help="ablate the epoch-end weak-learns-from-strong "
                         "interpolation (readme.md:13)")
    ap.add_argument("--starting-gan-loss", type=float, default=None,
                    help="override the two-regime gate threshold "
                         "(readme.md:10); e.g. 1e9 makes every member "
                         "always gate-ON (P(GAN)=p_gan_above regime off)")
    ap.add_argument("--data-dir", default="/tmp/srbench_data")
    ap.add_argument("--score", action="store_true",
                    help="compute held-out PSNR/SSIM after each epoch "
                         "(for quality curves, e.g. F=64 vs F=128)")
    ap.add_argument("--val-images", type=int, default=48)
    ap.add_argument("--lr-generator", type=float, default=1e-4,
                    help="generator LR (GroupNorm tolerates ~3x the "
                         "reference's 1e-4; see PARITY.md quality tables)")
    ap.add_argument("--seed", type=int, default=0,
                    help="TrainConfig.seed (init + noise + gate RNG); vary "
                         "to measure seed-to-seed quality spread")
    args = ap.parse_args()

    h, w = 512, 1024
    t0 = time.perf_counter()
    make_dataset(args.data_dir, args.images, h, w)
    print(f"dataset ready ({time.perf_counter() - t0:.1f}s)")

    from srgan_tpu.utils.platform import (
        enable_compilation_cache,
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    enable_compilation_cache()

    import jax

    from srgan_tpu.config import (
        Config, DataConfig, DiscriminatorConfig, ModelConfig, PoolConfig,
        TrainConfig,
    )
    from srgan_tpu.data.pipeline import TrainPipeline
    from srgan_tpu.training.loop import Trainer

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = Config(
        model=ModelConfig(
            num_features=args.features,
            remat=args.remat,
            compute_dtype="bfloat16" if on_tpu else "float32",
        ),
        discriminator=DiscriminatorConfig(
            num_filters=args.d_features,
            compute_dtype="bfloat16" if on_tpu else "float32",
        ),
        data=DataConfig(
            hr_size=(h, w), batch_size=args.batch, device_cache="on"
        ),
        pool=PoolConfig(
            num_generators=args.pool, member_exec=args.pool_exec,
            mutual_learning=not args.no_mutual,
            d_train_target=args.d_target,
            **(
                {"starting_gan_loss": args.starting_gan_loss}
                if args.starting_gan_loss is not None else {}
            ),
        ),
        train=TrainConfig(
            use_gan=args.gan, num_epochs=args.epochs,
            lr_generator=args.lr_generator, seed=args.seed,
        ),
    )
    trainer = Trainer(cfg)
    pipeline = TrainPipeline(
        cfg.data, args.data_dir, use_split=True,
        seed=cfg.train.seed, sharding=trainer.data_sharding,
    )
    val_pipeline = None
    if args.score:
        val_dir = args.data_dir.rstrip("/") + "_val"
        make_dataset(val_dir, args.val_images, h, w, seed=777)
        val_pipeline = TrainPipeline(
            cfg.data, val_dir, use_split=False,
            seed=cfg.train.seed + 1, sharding=trainer.data_sharding,
            augment=False,
        )
    print(f"steps/epoch={pipeline.steps_per_epoch()} batch={args.batch} "
          f"gan={args.gan} pool={args.pool} F={args.features}")

    rates = []
    active_pool = trainer.spool if trainer.spool is not None else trainer.pool
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        m = trainer.train_epoch(pipeline, epoch)
        dt = time.perf_counter() - t0
        # Epoch-end pool bookkeeping (re-sort + mutual learning + pre_loss
        # snapshot + auto gate calibration) — Trainer.train runs this after
        # every epoch; this harness bypassed it before r4, so the r3
        # mutual-learning ablation rows compared two arms in NEITHER of
        # which the mechanism executed (see PARITY correction). Kept
        # outside the timed window like compute_score, so rates stay
        # comparable with the r3 tables.
        active_pool.end_epoch()
        ips = m["n_batches"] * args.batch / dt
        rates.append(ips)
        tag = " (incl. cache build)" if epoch == 0 else ""
        score = ""
        if val_pipeline is not None:
            psnr, ssim = trainer.compute_score(val_pipeline, epoch)
            score = f"  psnr={psnr:.3f} ssim={ssim:.4f}"
        gate = ""
        if args.gan and active_pool.gan_threshold is not None:
            snap = active_pool.snapshot()
            gate = (f"  gate={active_pool.gan_threshold:.4f} "
                    f"gan_updates={[s['gan_updates'] for s in snap]} "
                    f"loss={[round(s['running_loss'], 4) for s in snap]}")
        print(f"epoch {epoch}: {ips:.1f} img/s  wall {dt:.2f}s  "
              f"g_loss={m['g_loss']:.4f}{score}{gate}{tag}")
    steady = rates[1:] or rates
    print(f"steady-state epoch rate: {np.mean(steady):.1f} img/s "
          f"(epochs 1..{args.epochs - 1})")


if __name__ == "__main__":
    main()
