"""Torch-checkpoint migration: a reference-layout torch SRResNet in eval
mode must produce (near-)identical outputs through the ported flax model.

The torch model here reproduces the reference's state_dict *contract*
(module names conv1 / residual_blocks.N.{conv1,bn1,conv2,bn2} / conv2 /
upsample.K / conv3, ``src/models.py:44-87``) so the porter can be verified
without touching the reference repo.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from srgan_tpu.models.srresnet import SRResNet  # noqa: E402
from srgan_tpu.utils.torch_port import port_torch_srresnet  # noqa: E402


class _Block(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = nn.Conv2d(f, f, 3, padding=1)
        self.bn1 = nn.BatchNorm2d(f)
        self.relu = nn.ReLU()
        self.conv2 = nn.Conv2d(f, f, 3, padding=1)
        self.bn2 = nn.BatchNorm2d(f)

    def forward(self, x):
        y = self.relu(self.bn1(self.conv1(x)))
        return self.bn2(self.conv2(y)) + x


class _TorchSRResNet(nn.Module):
    """Reference state_dict layout (names + shapes), small dims for test."""

    def __init__(self, f=8, blocks=2, upscale=2):
        super().__init__()
        self.conv1 = nn.Conv2d(3, f, 9, padding=4)
        self.residual_blocks = nn.Sequential(*[_Block(f) for _ in range(blocks)])
        self.conv2 = nn.Conv2d(f, f, 3, padding=1)
        layers = []
        for _ in range(upscale // 2):
            layers += [nn.Conv2d(f, 4 * f, 3, padding=1), nn.PixelShuffle(2),
                       nn.ReLU()]
        self.upsample = nn.Sequential(*layers)
        self.conv3 = nn.Conv2d(f, 3, 9, padding=4)

    def forward(self, x):
        h = F.leaky_relu(self.conv1(x), 0.2)
        out = self.conv2(self.residual_blocks(h)) + h
        return self.conv3(self.upsample(out))


class TestTorchPort:
    def _trained_torch(self, upscale=2):
        torch.manual_seed(0)
        m = _TorchSRResNet(upscale=upscale)
        # push BN running stats away from init so folding is non-trivial
        m.train()
        for _ in range(3):
            m(torch.randn(2, 3, 16, 16))
        m.eval()
        return m

    def test_outputs_match(self, rng):
        m = self._trained_torch()
        x = rng.random((1, 16, 16, 3)).astype(np.float32)
        with torch.no_grad():
            want = m(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        want = want.transpose(0, 2, 3, 1)

        cfg, params = port_torch_srresnet(m.state_dict())
        assert cfg.norm == "none" and cfg.head == "reference"
        assert cfg.num_residuals == 2 and cfg.upscale_factor == 2
        model = SRResNet.from_config(cfg)
        got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_4x_outputs_match(self, rng):
        m = self._trained_torch(upscale=4)
        x = rng.random((1, 12, 10, 3)).astype(np.float32)
        with torch.no_grad():
            want = m(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        cfg, params = port_torch_srresnet(m.state_dict())
        assert cfg.upscale_factor == 4
        got = np.asarray(
            SRResNet.from_config(cfg).apply({"params": params}, jnp.asarray(x))
        )
        assert got.shape == (1, 48, 40, 3)
        np.testing.assert_allclose(
            got, want.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
        )

    def test_ddp_prefix_stripped(self, rng):
        m = self._trained_torch()
        sd = {f"module.{k}": v for k, v in m.state_dict().items()}
        cfg, params = port_torch_srresnet(sd)
        x = rng.random((1, 8, 8, 3)).astype(np.float32)
        with torch.no_grad():
            want = m(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(
            SRResNet.from_config(cfg).apply({"params": params}, jnp.asarray(x))
        )
        np.testing.assert_allclose(
            got, want.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
        )
