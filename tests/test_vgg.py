"""VGG19 perceptual extractor: torchvision weight-porter parity.

No pretrained download is needed: a torchvision-layout ``features``
Sequential with RANDOM weights is built in-test, its state_dict saved and
ported, and the NHWC flax feature maps are checked against torch's NCHW
forward (reference extractor contract: ``src/models.py:123-151``; loss
``src/utils.py:154-166``).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from srgan_tpu.models.vgg import (  # noqa: E402
    _VGG19_CFG,
    LAYER_NAME_MAPPING,
    VGG19Features,
    init_vgg_extractor,
    load_torch_vgg19_weights,
    perceptual_loss,
)


class _FakeTorchVGG19(tnn.Module):
    """torchvision ``vgg19().features`` layout (conv/relu/maxpool indices)
    with random weights — the state_dict keys the porter consumes."""

    def __init__(self):
        super().__init__()
        layers = []
        in_ch = 3
        for item in _VGG19_CFG:
            if item == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers.append(tnn.Conv2d(in_ch, int(item), 3, padding=1))
                layers.append(tnn.ReLU(inplace=False))
                in_ch = int(item)
        self.features = tnn.Sequential(*layers)

    def extract(self, x, wanted):
        """Reference ``VGGFeatureExtractor.forward`` semantics
        (``src/models.py:140-151``): named taps with early exit."""
        feats = {}
        for idx, layer in enumerate(self.features):
            x = layer(x)
            name = LAYER_NAME_MAPPING.get(idx)
            if name in wanted:
                feats[name] = x
            if len(feats) == len(wanted):
                break
        return feats


@pytest.fixture(scope="module")
def fake_vgg(tmp_path_factory):
    torch.manual_seed(3)
    m = _FakeTorchVGG19().eval()
    # keep activations in a sane range through 16 random conv layers
    with torch.no_grad():
        for p in m.parameters():
            p.mul_(0.2)
    path = str(tmp_path_factory.mktemp("vgg") / "vgg19-random.pth")
    torch.save(m.state_dict(), path)
    return m, path


class TestVGGPorter:
    def test_ported_features_match_torch(self, fake_vgg, rng):
        torch_model, ckpt_path = fake_vgg
        layers = ("conv1_2", "conv2_2", "conv3_3")
        model = VGG19Features(layers=layers)
        params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))[
            "params"
        ]
        params = load_torch_vgg19_weights(ckpt_path, params)

        x = rng.random((2, 32, 32, 3)).astype(np.float32)
        got = model.apply({"params": params}, jnp.asarray(x))
        with torch.no_grad():
            want = torch_model.extract(
                torch.from_numpy(x.transpose(0, 3, 1, 2)), set(layers)
            )
        assert set(got) == set(layers)
        for name in layers:
            w = want[name].numpy().transpose(0, 2, 3, 1)  # NCHW→NHWC
            np.testing.assert_allclose(
                np.asarray(got[name]), w, rtol=1e-4, atol=1e-4,
                err_msg=f"feature map {name} diverges from torch",
            )

    def test_early_exit_param_tree(self):
        """Only convs up to the deepest requested tap get parameters
        (the reference's early exit, ``src/models.py:148-150``)."""
        model = VGG19Features(layers=("conv2_2",))
        params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))[
            "params"
        ]
        indices = sorted(int(k.split("_")[1]) for k in params)
        # conv2_2 activation is torchvision index 8 → last conv is index 7
        assert max(indices) == 7
        assert len(indices) == 4  # conv1_1, conv1_2, conv2_1, conv2_2

    def test_cache_discovery_ports_weights(self, fake_vgg, tmp_path,
                                           monkeypatch):
        """init_vgg_extractor picks up a cached vgg19*.pth automatically."""
        _, ckpt_path = fake_vgg
        hub = tmp_path / ".cache" / "torch" / "hub" / "checkpoints"
        os.makedirs(hub)
        import shutil

        shutil.copy(ckpt_path, hub / "vgg19-dcbb9e9d.pth")
        monkeypatch.setenv("HOME", str(tmp_path))
        model, params = init_vgg_extractor(
            jax.random.key(0), layers=("conv1_2",)
        )
        state = torch.load(ckpt_path, weights_only=True)
        want = state["features.0.weight"].numpy().transpose(2, 3, 1, 0)
        np.testing.assert_allclose(
            np.asarray(params["conv_0"]["kernel"]), want, rtol=1e-6
        )

    def test_perceptual_loss_zero_on_identical(self, rng):
        model, params = init_vgg_extractor(
            jax.random.key(1), layers=("conv1_2",)
        )
        x = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
        loss = perceptual_loss(x, x, model.apply, params)
        assert float(loss) == pytest.approx(0.0, abs=1e-6)
        y = jnp.clip(x + 0.3, 0, 1)
        assert float(perceptual_loss(y, x, model.apply, params)) > 0.0
