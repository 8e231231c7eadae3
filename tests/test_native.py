"""Native C++ loader: PIL-parity resampling, corrupt handling, batch API.

Skipped entirely if the shared library can't be built (no g++/libjpeg)."""

import numpy as np
import pytest
from PIL import Image

from srgan_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available() and not native.build():
        pytest.skip("native loader cannot be built in this environment")


def _png(tmp, arr, name="t.png"):
    p = str(tmp / name)
    Image.fromarray(arr).save(p)
    return p


class TestNativeLoader:
    def test_pil_parity_downscale_exact(self, tmp_path, rng):
        src = rng.integers(0, 255, (40, 56, 3)).astype(np.uint8)
        p = _png(tmp_path, src)
        pil = np.asarray(
            Image.fromarray(src).resize((32, 24), Image.BICUBIC), np.float32
        ) / 255.0
        nat = native.load_image(p, 24, 32)
        # downscale path is bit-exact vs PIL (per-pass uint8 quantization
        # emulated); upscale may differ by 1/255 on <1% of pixels
        np.testing.assert_array_equal(nat, pil)

    def test_pil_parity_upscale_tolerance(self, tmp_path, rng):
        src = rng.integers(0, 255, (24, 32, 3)).astype(np.uint8)
        p = _png(tmp_path, src)
        pil = np.asarray(
            Image.fromarray(src).resize((64, 48), Image.BICUBIC), np.float32
        ) / 255.0
        nat = native.load_image(p, 48, 64)
        d = np.abs(nat - pil)
        assert d.max() <= 1.01 / 255.0
        assert (d > 0).mean() < 0.01

    def test_jpeg(self, tmp_path, rng):
        src = rng.integers(0, 255, (30, 30, 3)).astype(np.uint8)
        p = str(tmp_path / "t.jpg")
        Image.fromarray(src).save(p, quality=95)
        out = native.load_image(p, 16, 16)
        assert out is not None and out.shape == (16, 16, 3)
        assert 0.0 <= out.min() and out.max() <= 1.0

    def test_palette_png_with_transparency(self, tmp_path, rng):
        """Palette PNG with a tRNS chunk: used to heap-overflow (the alpha
        channel that tRNS expansion added was never stripped because the
        guard tested the original color_type). Now decodes as plain
        palette-RGB, matching PIL convert('RGB')'s drop-the-transparency
        behavior."""
        arr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
        p = str(tmp_path / "pal.png")
        Image.fromarray(arr).convert(
            "P", palette=Image.ADAPTIVE
        ).save(p, transparency=0)
        out = native.load_image_u8(p, 32, 32)
        assert out is not None
        pil = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(out, pil)

    def test_corrupt_returns_none(self, tmp_path):
        p = str(tmp_path / "bad.png")
        with open(p, "wb") as f:
            f.write(b"not an image at all")
        assert native.load_image(p, 8, 8) is None
        assert native.load_image(str(tmp_path / "missing.png"), 8, 8) is None

    def test_truncated_files_skipped_not_crashed(self, tmp_path, rng):
        """Fuzz the decoders' error paths: VALID headers with bodies cut at
        many points (mid-chunk, mid-scanline, mid-marker) must come back as
        skips through the longjmp handlers — never a crash, hang, or
        partial-write OOB. A decode that happens to succeed (cut past the
        image data) must still be well-formed."""
        import io

        src = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
        blobs = {}
        for fmt, name in (("PNG", "t.png"), ("JPEG", "t.jpg")):
            buf = io.BytesIO()
            Image.fromarray(src).save(buf, format=fmt)
            blobs[name] = buf.getvalue()
        k = 0
        for name, blob in blobs.items():
            for frac in (0.1, 0.3, 0.5, 0.7, 0.9, 0.99):
                p = str(tmp_path / f"cut{k}_{name}")
                with open(p, "wb") as f:
                    f.write(blob[: max(16, int(len(blob) * frac))])
                k += 1
                out = native.load_image(p, 16, 16)
                if out is not None:  # tolerated tail truncation
                    assert out.shape == (16, 16, 3)
                    assert np.isfinite(out).all()
                    assert 0.0 <= out.min() and out.max() <= 1.0

    def test_batch(self, tmp_path, rng):
        paths = []
        for i in range(4):
            src = rng.integers(0, 255, (20 + i, 20, 3)).astype(np.uint8)
            paths.append(_png(tmp_path, src, f"b{i}.png"))
        bad = str(tmp_path / "bad.png")
        open(bad, "wb").write(b"junk")
        paths.append(bad)
        batch, ok = native.load_batch(paths, 16, 16, num_threads=2)
        assert batch.shape == (5, 16, 16, 3)
        assert ok.tolist() == [True, True, True, True, False]

    def test_pipeline_uses_native(self, tmp_path, rng):
        """HostBatcher picks the native path and matches the PIL dataset."""
        import jax

        from srgan_tpu.config import DataConfig
        from srgan_tpu.data.pipeline import TrainPipeline

        folder = tmp_path / "imgs"
        folder.mkdir()
        for i in range(4):
            _png(folder, rng.integers(0, 255, (40, 40, 3)).astype(np.uint8),
                 f"i{i}.png")
        cfg = DataConfig(hr_size=(16, 16), upscale_factor=2, batch_size=2,
                         split_ratio=1.0)
        pipe = TrainPipeline(cfg, str(folder), use_split=False)
        assert pipe.batcher.native
        batches = list(pipe.epoch(0, jax.random.key(0)))
        assert len(batches) == 2
        hr, lr = batches[0]
        assert hr.shape == (2, 16, 16, 3) and lr.shape == (2, 8, 8, 3)
        pipe.close()


class TestNativeEncoder:
    def test_png_bit_parity_with_pil_conversion(self, tmp_path, rng):
        """Native float->uint8->PNG must match array_to_image's conversion
        (clamp, *255+0.5 floor) bit for bit."""
        from srgan_tpu.utils.image_io import array_to_image

        if not native.encoder_available():
            pytest.skip("encoder API not available")
        img = (rng.random((24, 32, 3)).astype(np.float32) - 0.1) * 1.3
        p = str(tmp_path / "out.png")
        assert native.save_image(p, img)
        got = np.asarray(Image.open(p).convert("RGB"))
        want = np.asarray(array_to_image(img))
        np.testing.assert_array_equal(got, want)

    def test_jpeg_roundtrip_close(self, tmp_path, rng):
        if not native.encoder_available():
            pytest.skip("encoder API not available")
        # smooth gradient — random noise is pathological for JPEG's DCT
        y, x = np.mgrid[0:24, 0:32].astype(np.float32)
        img = np.stack([y / 24, x / 32, (y + x) / 56], axis=-1)
        p = str(tmp_path / "out.jpg")
        assert native.save_image(p, img)
        got = np.asarray(Image.open(p).convert("RGB")).astype(np.float32)
        assert np.abs(got / 255.0 - np.clip(img, 0, 1)).mean() < 0.05

    def test_batch_threaded(self, tmp_path, rng):
        if not native.encoder_available():
            pytest.skip("encoder API not available")
        imgs = rng.random((7, 16, 16, 3)).astype(np.float32)
        paths = [str(tmp_path / f"b{i}.png") for i in range(7)]
        ok = native.save_batch(paths, imgs, num_threads=3)
        assert ok.all()
        for i, p in enumerate(paths):
            got = np.asarray(Image.open(p).convert("RGB"))
            want = (np.clip(imgs[i], 0, 1) * 255 + 0.5).astype(np.uint8)
            np.testing.assert_array_equal(got, want)

    def test_unwritable_path_fails_cleanly(self, rng):
        if not native.encoder_available():
            pytest.skip("encoder API not available")
        img = rng.random((8, 8, 3)).astype(np.float32)
        assert not native.save_image("/nonexistent_dir_xyz/o.png", img)
