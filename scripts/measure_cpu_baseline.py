"""Measure the reference's CPU training throughput (images/sec).

BASELINE.md: "run the reference's own train/eval on CPU ... record
images/sec, and measure the TPU rebuild against those runs". The reference
itself cannot run here (its ``train_example`` hard-requires NCCL GPUs and
torchvision weight downloads, ``src/train.py:31``, ``src/models.py:126``),
so this harness times a functionally equivalent torch CPU train step —
SRResNet(3, 64, 16, 4x) forward + edge-weighted-L1/TV loss + backward +
Adam — at the reference's data shapes (HR 512x1024, LR 128x256,
``src/transformers.py:74,80``). This file is a measurement tool only; the
framework itself contains no torch.

Writes BASELINE_CPU.json at the repo root.
"""

import json
import os
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

torch.manual_seed(0)


class Block(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.c1 = nn.Conv2d(f, f, 3, padding=1)
        self.b1 = nn.BatchNorm2d(f)
        self.c2 = nn.Conv2d(f, f, 3, padding=1)
        self.b2 = nn.BatchNorm2d(f)

    def forward(self, x):
        y = F.relu(self.b1(self.c1(x)))
        return self.b2(self.c2(y)) + x


class Gen(nn.Module):
    """Same architecture/FLOPs as the reference generator (models.py:44-87)."""

    def __init__(self, f=64, nblocks=16):
        super().__init__()
        self.head = nn.Conv2d(3, f, 9, padding=4)
        self.blocks = nn.Sequential(*[Block(f) for _ in range(nblocks)])
        self.mid = nn.Conv2d(f, f, 3, padding=1)
        self.up = nn.Sequential(
            nn.Conv2d(f, 4 * f, 3, padding=1), nn.PixelShuffle(2), nn.ReLU(),
            nn.Conv2d(f, 4 * f, 3, padding=1), nn.PixelShuffle(2), nn.ReLU(),
        )
        self.tail = nn.Conv2d(f, 3, 9, padding=4)

    def forward(self, x):
        h = F.leaky_relu(self.head(x), 0.2)
        return self.tail(self.up(self.mid(self.blocks(h)) + h))


def loss_fn(hr, sr):
    """Reference ReconstructionLoss semantics (utils.py:198-241)."""
    sx = torch.tensor([[-5.0, 0, 5], [-5, 0, 5], [-5, 0, 5]]).reshape(1, 1, 3, 3)
    sx = sx.expand(3, 1, 3, 3)
    sy = sx.transpose(-1, -2)
    ex = torch.abs(F.conv2d(hr, sx, padding=1, groups=3))
    ey = torch.abs(F.conv2d(hr, sy, padding=1, groups=3))
    e = torch.max(ex, ey)
    e = torch.clamp((e - e.mean()) / e.std() * 0.2 + 1, 0, 2)
    edge = torch.sum(torch.abs(hr - sr) * e) / torch.sum(e)
    dk = torch.full((3, 3), -1 / 8)
    dk[1, 1] = 1.0
    dk = dk.reshape(1, 1, 3, 3).expand(3, 1, 3, 3)
    tv = torch.relu(torch.mean(torch.abs(F.conv2d(sr, dk, padding=1, groups=3)) * (1 - e)))
    return edge + tv


def main():
    batch = int(os.environ.get("BASELINE_BATCH", "1"))
    steps = int(os.environ.get("BASELINE_STEPS", "2"))
    hr = torch.rand(batch, 3, 512, 1024)
    lr = torch.rand(batch, 3, 128, 256)
    model = Gen()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)

    def step():
        opt.zero_grad()
        sr = model(lr)
        loss = loss_fn(hr, sr)
        loss.backward()
        opt.step()
        return loss.item()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    ips = batch * steps / dt
    out = {
        "images_per_sec_cpu": ips,
        "batch": batch,
        "steps": steps,
        "hr": [512, 1024],
        "lr": [128, 256],
        "torch_threads": torch.get_num_threads(),
        "note": "reference-equivalent torch CPU train step (SRResNet 4x + "
                "ReconstructionLoss + Adam), measured per BASELINE.md",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BASELINE_CPU.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
