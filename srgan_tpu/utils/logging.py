"""Structured metrics logging + step timing.

The reference's observability is tqdm postfixes and prints (SURVEY.md §5);
here every epoch appends one JSON line (losses, PSNR/SSIM, images/sec) to
``results/{prefix}_metrics.jsonl`` so runs are machine-readable, plus the
same PNG artifacts for parity.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    """Per-epoch JSONL records. Lazily truncates on the first log unless
    ``append=True`` (resume): a fresh run otherwise inherits a crashed
    attempt's records and the file shows duplicate epochs."""

    def __init__(self, results_dir: str, prefix: str, append: bool = False):
        os.makedirs(results_dir, exist_ok=True)
        self.path = os.path.join(results_dir, f"{prefix}_metrics.jsonl")
        self._mode = "a" if append else "w"

    def log(self, record: dict) -> None:
        with open(self.path, self._mode) as f:
            self._mode = "a"
            f.write(json.dumps(record) + "\n")

    def read_records(self) -> list:
        """Existing records on disk (empty when the file is absent)."""
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


class Throughput:
    """images/sec over a window — the BASELINE headline metric."""

    def __init__(self):
        self.images = 0
        self.start: Optional[float] = None

    def begin(self):
        self.start = time.perf_counter()
        self.images = 0

    def add(self, n: int):
        self.images += n

    def images_per_sec(self) -> float:
        if not self.start or not self.images:
            return 0.0
        return self.images / (time.perf_counter() - self.start)
