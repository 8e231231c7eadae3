"""Pallas reconstruction-loss kernel vs the XLA reference implementation
(interpret mode on CPU; the real Mosaic path runs on TPU in bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import srgan_tpu.ops.pallas.recon_loss_kernel as rk
from srgan_tpu.ops.recon_loss import pallas_loss_supported, reconstruction_loss


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(rk, "_INTERPRET", True)


class TestPallasReconLoss:
    def test_forward_matches_xla(self, rng):
        hr = jnp.asarray(rng.random((2, 16, 32, 3)).astype(np.float32))
        sr = jnp.asarray(rng.random((2, 16, 32, 3)).astype(np.float32))
        e_ref, tv_ref = reconstruction_loss(hr, sr)
        e_k, tv_k = rk.reconstruction_loss_pallas(hr, sr)
        assert float(e_k) == pytest.approx(float(e_ref), rel=1e-4)
        assert float(tv_k) == pytest.approx(float(tv_ref), rel=1e-4)

    def test_gradient_matches_xla(self, rng):
        hr = jnp.asarray(rng.random((1, 16, 32, 3)).astype(np.float32))
        sr = jnp.asarray(rng.random((1, 16, 32, 3)).astype(np.float32))

        def loss_ref(s):
            e, tv = reconstruction_loss(hr, s)
            return e + tv

        def loss_k(s):
            e, tv = rk.reconstruction_loss_pallas(hr, s)
            return e + tv

        g_ref = jax.grad(loss_ref)(sr)
        g_k = jax.grad(loss_k)(sr)
        # sign() at |hr-sr| kinks differs only on a measure-zero set;
        # random float inputs never hit it exactly.
        np.testing.assert_allclose(
            np.asarray(g_k), np.asarray(g_ref), rtol=1e-3, atol=1e-5
        )

    def test_auto_select_requires_lane_alignment(self):
        # Mosaic HBM row-strip DMAs need W % 128 == 0 (lane tiling); the
        # default selection must route misaligned widths (e.g. 96px test
        # crops, which crashed the remote TPU compiler) to the XLA path.
        assert pallas_loss_supported((2, 512, 1024, 3))
        assert pallas_loss_supported((1, 96, 128, 3))
        assert not pallas_loss_supported((2, 96, 96, 3))
        assert not pallas_loss_supported((2, 512, 1000, 3))

    def test_use_pallas_flag(self, rng):
        hr = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
        sr = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
        e1, tv1 = reconstruction_loss(hr, sr, use_pallas=True)
        e2, tv2 = reconstruction_loss(hr, sr, use_pallas=False)
        assert float(e1) == pytest.approx(float(e2), rel=1e-4)
        assert float(tv1) == pytest.approx(float(tv2), rel=1e-4)
