"""Evaluation / inference surface tests: CLI contract, paired-eval
semantics, single-image upscale API."""

import os

import numpy as np
import pytest
from PIL import Image

from srgan_tpu.config import ModelConfig
from srgan_tpu.eval.evaluation import evaluate_model
from srgan_tpu.eval.inference import Upscaler
from srgan_tpu.utils.image_io import array_to_image, load_image, save_image


def _make_pair_dirs(root, n=2, lr_size=(32, 24), hr_size=(128, 96)):
    rng = np.random.default_rng(3)
    for sub, size in (("LRbicx4", lr_size), ("original", hr_size)):
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            arr = rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"p_{i}.png"))


class TestEvaluation:
    def test_paired_eval_runs(self, tmp_path):
        root = str(tmp_path)
        _make_pair_dirs(root)
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=4)
        )
        psnr, ssim = evaluate_model(
            root, "LRbicx4", "original",
            upscaler=up, extra_downscale=True, apply_enhance=True,
            verbose=False,
        )
        assert np.isfinite(psnr)
        assert -1.0 <= ssim <= 1.0

    def test_extra_downscale_semantics(self, tmp_path):
        """With the reference's ÷4-then-SR quirk, SR output size equals the
        original LR size (``src/evaluation.py:45-46``) — so scoring runs at
        LR scale; without it, at 4x LR scale. Both must work."""
        root = str(tmp_path)
        _make_pair_dirs(root)
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=4)
        )
        p1, _ = evaluate_model(root, "LRbicx4", "original", upscaler=up,
                               extra_downscale=False, apply_enhance=False,
                               verbose=False)
        assert np.isfinite(p1)


class TestUpscaler:
    def test_upscale_shapes(self, rng):
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        )
        img = rng.random((12, 10, 3)).astype(np.float32)
        out = up.upscale(img)
        assert out.shape == (24, 20, 3)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_uint8_input(self, rng):
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        )
        img = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
        out = up.upscale(img)
        assert out.shape == (16, 16, 3)

    def test_upscale_file_roundtrip(self, tmp_path, rng):
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        )
        src = str(tmp_path / "in.png")
        dst = str(tmp_path / "out.png")
        Image.fromarray(
            rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
        ).save(src)
        up.upscale_file(src, dst)
        out = load_image(dst)
        assert out.shape == (16, 16, 3)


class TestImageIO:
    def test_array_roundtrip(self, rng):
        arr = rng.random((5, 6, 3)).astype(np.float32)
        img = array_to_image(arr)
        back = np.asarray(img, dtype=np.float32) / 255.0
        np.testing.assert_allclose(back, arr, atol=1 / 255.0 + 1e-6)

    def test_clamps_out_of_range(self):
        arr = np.array([[[1.5, -0.2, 0.5]]], dtype=np.float32)
        img = np.asarray(array_to_image(arr))
        assert img[0, 0, 0] == 255 and img[0, 0, 1] == 0
