"""scripts/mfu_report.py — FLOP/MFU observability smoke test."""

import json

from scripts import mfu_report


class TestMfuReport:
    def test_report_runs_and_counts_flops(self, capsys):
        mfu_report.main([
            "--hr", "64", "128", "--batch", "1", "--serve-batch", "1",
            "--steps", "1",
        ])
        line = capsys.readouterr().out.strip().splitlines()[-1]
        rec = json.loads(line)
        paths = rec["paths"]
        assert set(paths) == {
            "train_pixel_step", "train_gan_step", "serving_forward_u8",
            "train_pool3_gan_step_scan", "train_gan_perceptual_step",
        }
        for name, p in paths.items():
            assert p["ms_per_step"] > 0, name
            assert p["images_per_sec"] > 0, name
            # XLA's cost analysis must be available on the CPU backend; the
            # train steps carry more FLOPs than the serving forward
            assert p.get("gflops_per_step", 0) > 0, name
        assert (
            paths["train_pixel_step"]["gflops_per_step"]
            > paths["serving_forward_u8"]["gflops_per_step"]
        )
        assert (
            paths["train_gan_step"]["gflops_per_step"]
            > paths["train_pixel_step"]["gflops_per_step"]
        )
        # the encoder feature term adds FLOPs on top of the GAN step
        assert (
            paths["train_gan_perceptual_step"]["gflops_per_step"]
            > paths["train_gan_step"]["gflops_per_step"]
        )
        # N members' G updates dwarf the single-member GAN step
        assert (
            paths["train_pool3_gan_step_scan"]["gflops_per_step"]
            > paths["train_gan_step"]["gflops_per_step"]
        )
