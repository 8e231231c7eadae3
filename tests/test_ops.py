"""Unit tests for the compute ops: stencils, losses, metrics, pixel-shuffle.

Golden values are cross-checked against independent numpy re-derivations of
the reference semantics (torch-style Bessel std, skimage SSIM algorithm),
and against torch where a direct semantic twin exists (torch is CPU-only in
this image and used strictly as a test oracle, never in the compute path).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srgan_tpu.ops.filters import (
    DIFF_KERNEL,
    SOBEL_X,
    SOBEL_Y,
    depthwise_conv3x3,
    sharpen,
)
from srgan_tpu.ops.gan_loss import (
    discriminator_loss,
    generator_adversarial_loss,
    uniformity_loss,
)
from srgan_tpu.ops.metrics import batched_psnr_ssim, psnr, ssim
from srgan_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from srgan_tpu.ops.recon_loss import edge_importance_map, reconstruction_loss
from srgan_tpu.ops.resize import degrade_batch


def _np_depthwise3x3(x_nhwc, k):
    """Reference depthwise conv via numpy (zero pad, stride 1)."""
    b, h, w, c = x_nhwc.shape
    xp = np.pad(x_nhwc, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros_like(x_nhwc)
    for di in range(3):
        for dj in range(3):
            out += k[di, dj] * xp[:, di : di + h, dj : dj + w, :]
    return out


class TestDepthwiseConv:
    def test_matches_numpy(self, rng):
        x = rng.standard_normal((2, 9, 11, 3)).astype(np.float32)
        for k in (SOBEL_X, SOBEL_Y, DIFF_KERNEL):
            got = np.asarray(depthwise_conv3x3(jnp.asarray(x), k))
            want = _np_depthwise3x3(x, k)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_matches_torch_grouped_conv(self, rng):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
        got = np.asarray(depthwise_conv3x3(jnp.asarray(x), SOBEL_X))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        kt = torch.from_numpy(SOBEL_X).reshape(1, 1, 3, 3).expand(3, 1, 3, 3)
        want = F.conv2d(xt, kt, padding=1, groups=3).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestSharpen:
    def test_range_and_identity_on_flat(self):
        flat = jnp.full((1, 8, 8, 3), 0.5)
        out = sharpen(flat)
        # interior of a flat image is unchanged (kernel sums to 0 there)
        np.testing.assert_allclose(np.asarray(out)[:, 2:-2, 2:-2], 0.5, atol=1e-6)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


class TestReconstructionLoss:
    def test_edge_map_stats(self, rng):
        hr = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
        edges = edge_importance_map(hr)
        assert edges.shape == hr.shape
        assert float(edges.min()) >= 0.0 and float(edges.max()) <= 2.0
        # clamp at [0,2] around mean 1 keeps the mean near 1
        assert abs(float(edges.mean()) - 1.0) < 0.1

    def test_zero_when_identical(self, rng):
        hr = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        edge_loss, tv_loss = reconstruction_loss(hr, hr)
        assert float(edge_loss) == pytest.approx(0.0, abs=1e-6)
        assert float(tv_loss) >= 0.0

    def test_matches_torch_reference_semantics(self, rng):
        """Re-derive the loss with torch ops exactly as the reference
        computes it (``src/utils.py:198-241``) and compare."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        hr = rng.random((2, 16, 16, 3)).astype(np.float32)
        sr = rng.random((2, 16, 16, 3)).astype(np.float32)

        def t_depthwise(x, k):
            kt = torch.from_numpy(k).reshape(1, 1, 3, 3).expand(3, 1, 3, 3)
            return F.conv2d(x, kt, padding=1, groups=3)

        hrt = torch.from_numpy(hr.transpose(0, 3, 1, 2))
        srt = torch.from_numpy(sr.transpose(0, 3, 1, 2))
        ex = torch.abs(t_depthwise(hrt, SOBEL_X))
        ey = torch.abs(t_depthwise(hrt, SOBEL_Y))
        edges = torch.max(ex, ey)
        edges = (edges - edges.mean()) / edges.std() * 0.2 + 1.0
        edges = torch.clamp(edges, 0, 2)
        diff = torch.abs(hrt - srt)
        want_edge = (torch.sum(diff * edges) / torch.sum(edges)).item()
        tv = torch.abs(t_depthwise(srt, DIFF_KERNEL)) * (1 - edges)
        want_tv = torch.relu(torch.mean(tv)).item()

        got_edge, got_tv = reconstruction_loss(jnp.asarray(hr), jnp.asarray(sr))
        assert float(got_edge) == pytest.approx(want_edge, rel=1e-4)
        assert float(got_tv) == pytest.approx(want_tv, rel=1e-4)


class TestGanLosses:
    def test_relativistic_signs(self):
        real = jnp.ones((2, 4, 4, 1)) * 0.9
        fake = jnp.ones((2, 4, 4, 1)) * 0.1
        # D confident on real → d_loss negative; G loss positive.
        assert float(discriminator_loss(real, fake)) < 0
        assert float(generator_adversarial_loss(real, fake)) > 0

    def test_uniformity_matches_torch_pdist(self, rng):
        torch = pytest.importorskip("torch")
        e = rng.standard_normal((5, 8)).astype(np.float32)
        got = float(uniformity_loss(jnp.asarray(e)))
        et = torch.from_numpy(e)
        d = torch.pdist(et, p=2)
        want = torch.log(torch.mean(torch.exp(-2 * d.pow(2) + 1e-7))).item()
        assert got == pytest.approx(want, rel=1e-4)

    def test_uniformity_singleton(self):
        assert float(uniformity_loss(jnp.ones((1, 8)))) == 0.0


def _skimage_ssim_np(x, y, data_range=1.0):
    """Independent numpy re-derivation of skimage structural_similarity
    (win_size=3, uniform filter, sample covariance, interior crop) for one
    (H, W) channel."""
    def box_valid(a):
        out = np.zeros((a.shape[0] - 2, a.shape[1] - 2), a.dtype)
        for di in range(3):
            for dj in range(3):
                out += a[di : di + out.shape[0], dj : dj + out.shape[1]]
        return out / 9.0

    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    cov_norm = 9.0 / 8.0
    ux, uy = box_valid(x), box_valid(y)
    vx = cov_norm * (box_valid(x * x) - ux * ux)
    vy = cov_norm * (box_valid(y * y) - uy * uy)
    vxy = cov_norm * (box_valid(x * y) - ux * uy)
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux**2 + uy**2 + c1) * (vx + vy + c2)
    )
    return s.mean()


class TestMetrics:
    def test_psnr_known_value(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)
        # mse = 0.01 → psnr = 10*log10(1/0.01) = 20
        assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-3)

    def test_ssim_identical_is_one(self, rng):
        x = jnp.asarray(rng.random((16, 16, 3)).astype(np.float32))
        assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)

    def test_ssim_matches_skimage_algorithm(self, rng):
        x = rng.random((20, 24, 3)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.1, x.shape).astype(np.float32), 0, 1)
        want = np.mean(
            [_skimage_ssim_np(x[..., c], y[..., c]) for c in range(3)]
        )
        got = float(ssim(jnp.asarray(x), jnp.asarray(y)))
        assert got == pytest.approx(float(want), abs=1e-5)

    def test_batched_matches_single(self, rng):
        b1 = jnp.asarray(rng.random((3, 16, 16, 3)).astype(np.float32))
        b2 = jnp.asarray(rng.random((3, 16, 16, 3)).astype(np.float32))
        p, s = batched_psnr_ssim(b1, b2)
        assert p.shape == (3,) and s.shape == (3,)
        assert float(p[1]) == pytest.approx(float(psnr(b1[1], b2[1])), abs=1e-4)
        assert float(s[2]) == pytest.approx(float(ssim(b1[2], b2[2])), abs=1e-5)


class TestPixelShuffle:
    def test_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4, 6, 12)).astype(np.float32))
        y = pixel_shuffle(x, 2)
        assert y.shape == (2, 8, 12, 3)
        np.testing.assert_allclose(np.asarray(pixel_unshuffle(y, 2)), np.asarray(x))

    def test_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.standard_normal((1, 3, 5, 16)).astype(np.float32)
        got = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        want = (
            torch.nn.functional.pixel_shuffle(xt, 2).numpy().transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(got, want)


class TestDegrade:
    def test_shapes_and_noise(self, rng):
        hr = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
        lr = degrade_batch(hr, jax.random.key(0), factor=4, noise_std_max=0.03)
        assert lr.shape == (2, 16, 16, 3)
        # determinism under the same key
        lr2 = degrade_batch(hr, jax.random.key(0), factor=4, noise_std_max=0.03)
        np.testing.assert_array_equal(np.asarray(lr), np.asarray(lr2))
