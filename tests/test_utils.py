"""Utility-layer tests: plotting artifacts, profiling timers, metrics log."""

import json
import os

import numpy as np

from srgan_tpu.utils.logging import MetricsLogger, ProgressLine, Throughput
from srgan_tpu.utils.plotting import (
    comparison_grid,
    save_comparison,
    save_rating_curve,
)
from srgan_tpu.utils.profiling import StepTimer, annotate


class TestPlotting:
    def test_comparison_grid_shape(self, rng):
        b, h, w = 2, 8, 10
        lr_up = rng.random((b, h, w, 3)).astype(np.float32)
        sr = rng.random((b, h, w, 3)).astype(np.float32)
        hr = rng.random((b, h, w, 3)).astype(np.float32)
        grid = comparison_grid(lr_up, sr, hr, padding=2)
        # rows of [LR|SR|HR] with padding (make_grid nrow=1 semantics)
        assert grid.shape == ((h + 2) * b + 2, 3 * w + 4, 3)

    def test_save_artifacts(self, tmp_path, rng):
        b, h, w = 1, 8, 8
        img = rng.random((b, h, w, 3)).astype(np.float32)
        p1 = save_comparison(img, img, img, str(tmp_path), "T", epoch=4, rank=1)
        assert p1.endswith("T_epoch_5_1_comparison.png")  # reference naming
        assert os.path.exists(p1)
        p2 = save_rating_curve([1, 2], [20.0, 21.0], [0.5, 0.6],
                               str(tmp_path), "T", rank=0)
        assert p2.endswith("Ttraining_loss_curve_0.png")
        assert os.path.exists(p2)


class TestLogging:
    def test_jsonl_roundtrip(self, tmp_path):
        log = MetricsLogger(str(tmp_path), "X")
        log.log({"epoch": 1, "psnr": 20.5})
        log.log({"epoch": 2, "psnr": 21.0})
        recs = [json.loads(l) for l in open(log.path)]
        assert recs[1]["psnr"] == 21.0

    def test_throughput(self):
        t = Throughput()
        t.begin()
        t.add(10)
        assert t.images_per_sec() > 0


class TestProgressLine:
    def test_always_renders_and_clears(self, capsys):
        p = ProgressLine("always", total=10)
        p.update(0, 3, {"g_loss": 0.5, "d_loss": None}, 42.0)
        p.update(0, 4, {"g_loss": 0.4, "d_loss": 0.1}, 43.0)
        p.close()
        err = capsys.readouterr().err
        assert "epoch 1 [3/10] g_loss=0.5000 (42.0 img/s)" in err
        assert "g_loss=0.4000 d_loss=0.1000" in err
        # the close() wipes the line so the epoch summary starts clean
        assert err.endswith("\r")

    def test_off_and_non_tty_auto_stay_silent(self, capsys):
        for mode in ("off", "auto"):  # capsys stderr is not a TTY
            p = ProgressLine(mode, total=5)
            p.update(0, 1, {"g_loss": 1.0}, 1.0)
            p.close()
        assert capsys.readouterr().err == ""


class TestProfiling:
    def test_step_timer(self):
        timer = StepTimer()
        for _ in range(3):
            with timer.step():
                sum(range(1000))
        s = timer.summary()
        assert s["steps"] == 3 and s["mean_ms"] >= 0

    def test_annotate_noop_outside_trace(self):
        with annotate("region"):
            pass  # must not raise without an active trace
