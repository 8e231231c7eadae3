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
    export_torch_vgg19_to_npz,
    init_vgg_extractor,
    load_torch_vgg19_weights,
    load_vgg19_weights_npz,
    perceptual_loss,
    save_vgg19_weights_npz,
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
        with pytest.warns(RuntimeWarning, match="RANDOM feature weights"):
            model, params = init_vgg_extractor(
                jax.random.key(1), layers=("conv1_2",)
            )
        x = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
        loss = perceptual_loss(x, x, model.apply, params)
        assert float(loss) == pytest.approx(0.0, abs=1e-6)
        y = jnp.clip(x + 0.3, 0, 1)
        assert float(perceptual_loss(y, x, model.apply, params)) > 0.0


class TestNpzWeights:
    """Torch-free pretrained-weight path (VERDICT r2 next #4): export once
    with torch, load forever via numpy."""

    def test_random_fallback_warns(self, tmp_path, monkeypatch):
        monkeypatch.setenv("HOME", str(tmp_path))  # no torchvision cache
        with pytest.warns(RuntimeWarning, match="RANDOM feature weights"):
            init_vgg_extractor(jax.random.key(0), layers=("conv1_2",))

    def test_npz_roundtrip_without_torch(self, tmp_path, rng):
        model = VGG19Features(layers=("conv2_2",))
        params = model.init(jax.random.key(7), jnp.zeros((1, 16, 16, 3)))[
            "params"
        ]
        path = str(tmp_path / "w.npz")
        save_vgg19_weights_npz(params, path)
        template = model.init(
            jax.random.key(8), jnp.zeros((1, 16, 16, 3))
        )["params"]
        loaded = load_vgg19_weights_npz(path, template)
        for pname in params:
            np.testing.assert_array_equal(
                np.asarray(loaded[pname]["kernel"]),
                np.asarray(params[pname]["kernel"]),
            )
        # init_vgg_extractor consumes it with NO fallback warning
        import warnings as w

        with w.catch_warnings():
            w.simplefilter("error", RuntimeWarning)
            _, p2 = init_vgg_extractor(
                jax.random.key(9), layers=("conv2_2",), weights_npz=path
            )
        np.testing.assert_array_equal(
            np.asarray(p2["conv_0"]["kernel"]),
            np.asarray(params["conv_0"]["kernel"]),
        )

    def test_npz_missing_or_misshaped_raises(self, tmp_path):
        model = VGG19Features(layers=("conv1_2",))
        params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))[
            "params"
        ]
        partial = str(tmp_path / "partial.npz")
        np.savez(partial, **{"conv_0.kernel": np.zeros((3, 3, 3, 64),
                                                       np.float32)})
        with pytest.raises(KeyError, match="missing"):
            load_vgg19_weights_npz(partial, params)
        bad = str(tmp_path / "bad.npz")
        np.savez(bad, **{
            "conv_0.kernel": np.zeros((3, 3, 3, 32), np.float32),
            "conv_0.bias": np.zeros((32,), np.float32),
            "conv_2.kernel": np.zeros((3, 3, 64, 64), np.float32),
            "conv_2.bias": np.zeros((64,), np.float32),
        })
        with pytest.raises(ValueError, match="kernel shape"):
            load_vgg19_weights_npz(bad, params)

    def test_export_torch_matches_porter(self, fake_vgg, tmp_path):
        """export_torch_vgg19_to_npz → load_vgg19_weights_npz reproduces
        the direct torch porter bit-for-bit."""
        _, ckpt_path = fake_vgg
        out = export_torch_vgg19_to_npz(
            str(tmp_path / "vgg.npz"), torch_ckpt=ckpt_path
        )
        model = VGG19Features(layers=("conv3_3",))
        template = model.init(
            jax.random.key(0), jnp.zeros((1, 16, 16, 3))
        )["params"]
        via_npz = load_vgg19_weights_npz(out, template)
        via_torch = load_torch_vgg19_weights(ckpt_path, template)
        for pname in template:
            np.testing.assert_array_equal(
                np.asarray(via_npz[pname]["kernel"]),
                np.asarray(via_torch[pname]["kernel"]),
            )
            np.testing.assert_array_equal(
                np.asarray(via_npz[pname]["bias"]),
                np.asarray(via_torch[pname]["bias"]),
            )
