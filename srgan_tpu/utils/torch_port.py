"""Port reference PyTorch SRResNet checkpoints into srgan_tpu.

The reference saves torch ``state_dict``s (``src/train.py:123-125``) and its
eval reloads them with DDP-prefix stripping (``src/evaluation.py:26-31``).
This module lets those users switch frameworks without retraining:

  - conv kernels transpose OIHW → HWIO;
  - the reference's BatchNorm layers (``src/models.py:16,19``) are **folded
    into the preceding convs** for inference: in eval mode BN is the
    per-channel affine y = (x − μ)·γ/√(σ²+ε) + β, which composes exactly
    with the conv producing x. The ported model is the ``norm="none"``,
    ``head="reference"`` SRResNet — bit-equivalent to the torch model in
    eval mode (fp32);
  - the "module." DDP prefix is stripped like the reference does.

No torch import is needed to USE the ported weights — only to read the
``.pth`` file (torch stays a porting/test tool, never in the compute path).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from srgan_tpu.config import ModelConfig


def _fold_bn(conv_w, conv_b, bn_gamma, bn_beta, bn_mean, bn_var, eps=1e-5):
    """Fold an eval-mode BatchNorm into the preceding conv.

    conv_w: (O, I, kh, kw) torch layout; returns the same layout.
    """
    inv = bn_gamma / np.sqrt(bn_var + eps)
    w = conv_w * inv[:, None, None, None]
    b = (conv_b - bn_mean) * inv + bn_beta
    return w, b


def _hwio(w_oihw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))


def port_torch_srresnet(
    state_dict: Dict[str, np.ndarray],
    num_residuals: int | None = None,
) -> Tuple[ModelConfig, dict]:
    """torch SRResNet ``state_dict`` → (ModelConfig, flax params).

    Expects the reference's module names (``src/models.py:44-87``):
    ``conv1``, ``residual_blocks.{i}.{conv1,bn1,conv2,bn2}``, ``conv2``,
    ``upsample.{0,3,...}`` (convs at stride-3 positions in the Sequential),
    ``conv3``. Values may be torch tensors or numpy arrays; a DDP
    ``module.`` prefix is stripped.
    """
    sd = {}
    for k, v in state_dict.items():
        name = k[7:] if k.startswith("module.") else k  # evaluation.py:26-29
        sd[name] = np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v,
            dtype=np.float32,
        )

    if num_residuals is None:
        num_residuals = 1 + max(
            (int(k.split(".")[1]) for k in sd if k.startswith("residual_blocks.")),
            default=-1,
        )

    params: dict = {}

    def conv(name_t):
        return {
            "kernel": _hwio(sd[f"{name_t}.weight"]),
            "bias": jnp.asarray(sd[f"{name_t}.bias"]),
        }

    def conv_bn(conv_t, bn_t):
        w, b = _fold_bn(
            sd[f"{conv_t}.weight"], sd[f"{conv_t}.bias"],
            sd[f"{bn_t}.weight"], sd[f"{bn_t}.bias"],
            sd[f"{bn_t}.running_mean"], sd[f"{bn_t}.running_var"],
        )
        return {"kernel": _hwio(w), "bias": jnp.asarray(b)}

    # stem
    params["Conv_0"] = conv("conv1")
    # residual tower (norm folded → norm="none" blocks with Conv_0/Conv_1)
    for i in range(num_residuals):
        base = f"residual_blocks.{i}"
        params[f"ResidualBlock_{i}"] = {
            "Conv_0": conv_bn(f"{base}.conv1", f"{base}.bn1"),
            "Conv_1": conv_bn(f"{base}.conv2", f"{base}.bn2"),
        }
    # mid conv
    params["Conv_1"] = conv("conv2")
    # upsample convs: Sequential indices 0, 3, 6, ... (conv, shuffle, relu)
    up_indices = sorted(
        int(k.split(".")[1]) for k in sd
        if k.startswith("upsample.") and k.endswith(".weight")
    )
    for j, idx in enumerate(up_indices):
        params[f"Conv_{2 + j}"] = conv(f"upsample.{idx}")
    # tail
    params[f"Conv_{2 + len(up_indices)}"] = conv("conv3")

    stem_features = sd["conv1.weight"].shape[0]
    cfg = ModelConfig(
        in_channels=sd["conv1.weight"].shape[1],
        num_features=stem_features,
        num_residuals=num_residuals,
        upscale_factor=2 ** len(up_indices),
        norm="none",          # BN folded into the convs
        head="reference",     # post-shuffle conv9x9 tail, like the .pth
    )
    return cfg, params


def load_torch_checkpoint(path: str, num_residuals: int | None = None):
    """Read a reference ``.pth`` file and port it. Returns
    (ModelConfig, params) ready for ``SRResNet.from_config(cfg).apply``."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return port_torch_srresnet(state, num_residuals=num_residuals)
