"""Quality-parity check: train the reference-equivalent torch model and the
srgan_tpu model on the SAME images with the same schedule, compare PSNR.

BASELINE.md procedure ("run the reference's own train/eval on CPU, record
images/sec and final PSNR/SSIM, and measure the TPU rebuild against those").
The reference itself can't run here (NCCL + weight downloads), so the torch
side is the same reference-equivalent harness as measure_cpu_baseline.py:
SRResNet(BatchNorm) + ReconstructionLoss + Adam + LinearLR, per
``src/train.py:27-139`` semantics. torch is a test oracle only.

Usage:
  python scripts/quality_parity.py torch  --data /tmp/qp/train --val /tmp/qp/val
  python scripts/quality_parity.py jax    --data /tmp/qp/train --val /tmp/qp/val
Each prints one JSON line with final val PSNR (and img/s).

Scale knobs (env): QP_HR, QP_FACTOR, QP_EPOCHS, QP_BATCH, QP_FEATURES,
QP_BLOCKS, QP_LR. Defaults reproduce the r1 small-scale point; the r3
mid-scale point (VERDICT r2 #8) is
  QP_HR=256 QP_FEATURES=64 QP_BLOCKS=8 QP_EPOCHS=30.
The jax side also takes QP_PERCEPTUAL (perceptual-loss weight), QP_ENCODER
(a trained contrastive-encoder .npz from scripts/train_encoder.py as the
feature source — without it the VGG path falls back to random features,
see models/vgg.py) and QP_SEED.
"""

import argparse
import glob
import json
import os
import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_env = os.environ.get
HR = int(_env("QP_HR", "128"))   # HR crop size (torch runs on 1 CPU core)
FACTOR = int(_env("QP_FACTOR", "2"))
EPOCHS = int(_env("QP_EPOCHS", "6"))
BATCH = int(_env("QP_BATCH", "2"))
FEATURES = int(_env("QP_FEATURES", "32"))
BLOCKS = int(_env("QP_BLOCKS", "4"))
LR_G = float(_env("QP_LR", "1e-4"))


def load_split(data_dir, val_dir):
    def load(folder):
        imgs = []
        paths = sorted(
            glob.glob(os.path.join(folder, "*.png"))
            + glob.glob(os.path.join(folder, "*.jpg"))
        )
        for p in paths:
            img = Image.open(p).convert("RGB").resize((HR, HR), Image.BICUBIC)
            imgs.append(np.asarray(img, np.float32) / 255.0)
        return np.stack(imgs)

    return load(data_dir), load(val_dir)


def degrade(hr_batch, rng):
    """bilinear ÷factor + per-image gaussian noise (transformers.py:73-77)."""
    out = []
    for img in hr_batch:
        pil = Image.fromarray((img * 255).astype(np.uint8))
        lr = np.asarray(
            pil.resize((HR // FACTOR, HR // FACTOR), Image.BILINEAR), np.float32
        ) / 255.0
        std = rng.uniform(0, 0.03)
        out.append(lr + rng.standard_normal(lr.shape).astype(np.float32) * std)
    return np.stack(out)


def psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(1.0 / mse)


def run_torch(train_hr, val_hr):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from measure_cpu_baseline import Block, loss_fn

    torch.manual_seed(0)

    class Gen(nn.Module):
        def __init__(self):
            super().__init__()
            f = FEATURES
            self.head = nn.Conv2d(3, f, 9, padding=4)
            self.blocks = nn.Sequential(*[Block(f) for _ in range(BLOCKS)])
            self.mid = nn.Conv2d(f, f, 3, padding=1)
            # FACTOR//2 [conv -> PixelShuffle(2) -> ReLU] stages, exactly
            # the reference's upsample tower (``src/models.py:70-76``) —
            # one stage at 2x, two at the flagship 4x (VERDICT r3 weak #5:
            # the 4x claim needs a direct torch A/B, not extrapolation).
            self.up = nn.Sequential(*[
                layer
                for _ in range(FACTOR // 2)
                for layer in (
                    nn.Conv2d(f, 4 * f, 3, padding=1),
                    nn.PixelShuffle(2),
                    nn.ReLU(),
                )
            ])
            self.tail = nn.Conv2d(f, 3, 9, padding=4)

        def forward(self, x):
            h = F.leaky_relu(self.head(x), 0.2)
            return self.tail(self.up(self.mid(self.blocks(h)) + h))

    assert FACTOR in (2, 4, 8), "power-of-two upscale factors only"
    model = Gen()
    opt = torch.optim.Adam(model.parameters(), lr=LR_G)
    sched = torch.optim.lr_scheduler.LinearLR(
        opt, start_factor=1, end_factor=0.01, total_iters=EPOCHS
    )
    rng = np.random.default_rng(0)
    n = len(train_hr)
    t0 = time.perf_counter()
    images = 0
    for epoch in range(EPOCHS):
        perm = np.random.default_rng((0, epoch)).permutation(n)
        for b in range(n // BATCH):
            hr = train_hr[perm[b * BATCH:(b + 1) * BATCH]]
            lr = degrade(hr, rng)
            hr_t = torch.from_numpy(hr.transpose(0, 3, 1, 2))
            lr_t = torch.from_numpy(lr.transpose(0, 3, 1, 2))
            opt.zero_grad()
            sr = model(lr_t)
            loss = loss_fn(hr_t, sr)
            loss.backward()
            opt.step()
            images += BATCH
        sched.step()
    wall = time.perf_counter() - t0

    # validate
    rng = np.random.default_rng(99)
    ps = []
    with torch.no_grad():
        for i in range(len(val_hr)):
            hr = val_hr[i:i + 1]
            lr = degrade(hr, rng)
            sr = model(torch.from_numpy(lr.transpose(0, 3, 1, 2)))
            ps.append(psnr(sr.numpy().transpose(0, 2, 3, 1), hr))
    print(json.dumps({
        "side": "torch-reference-equivalent",
        "val_psnr": float(np.mean(ps)),
        "train_images_per_sec": images / wall,
        "epochs": EPOCHS,
    }))


def run_jax(train_dir, val_dir):
    from srgan_tpu.utils.platform import (
        enable_compilation_cache,
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    enable_compilation_cache()

    from srgan_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from srgan_tpu.training.loop import Trainer

    p_weight = float(_env("QP_PERCEPTUAL", "0"))
    cfg = Config(
        model=ModelConfig(
            num_features=FEATURES, num_residuals=BLOCKS, upscale_factor=FACTOR
        ),
        data=DataConfig(
            hr_size=(HR, HR), upscale_factor=FACTOR, batch_size=BATCH,
            split_ratio=1.0,
        ),
        train=TrainConfig(
            num_epochs=EPOCHS, lr_generator=LR_G, validate_every=100,
            results_dir="/tmp/qp_results", seed=int(_env("QP_SEED", "0")),
            perceptual_weight=p_weight,
            # QP_ENCODER: trained contrastive-encoder .npz
            # (scripts/train_encoder.py) as the perceptual feature source —
            # the zero-egress-compatible TRAINED prior (vs random VGG)
            perceptual_encoder_npz=_env("QP_ENCODER") or None,
        ),
    )
    trainer = Trainer(cfg, use_mesh=False)
    last = trainer.train(train_dir, val_dir)
    print(json.dumps({
        "side": "srgan_tpu",
        "val_psnr": last["psnr"],
        "val_ssim": last.get("ssim"),
        "train_images_per_sec": last["images_per_sec"],
        "epochs": EPOCHS,
        "perceptual_weight": p_weight,
        "perceptual_encoder": _env("QP_ENCODER") or None,
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("side", choices=["torch", "jax"])
    ap.add_argument("--data", required=True)
    ap.add_argument("--val", required=True)
    args = ap.parse_args()
    if args.side == "torch":
        train_hr, val_hr = load_split(args.data, args.val)
        run_torch(train_hr, val_hr)
    else:
        run_jax(args.data, args.val)
