"""Contrastive image encoder — the reference's PLANNED perceptual prior,
built for real.

The reference ships ``uniformity_loss`` with a comment explaining its
intent: train an image encoder whose embeddings replace the pixel loss with
a contrastive objective (``src/utils.py:118-137``; the loss itself is
ported at ``srgan_tpu.ops.gan_loss.uniformity_loss``). That encoder never
existed — the loss is dead code in the reference. Here it becomes
load-bearing: a small conv encoder trained with alignment + uniformity
(the two-term decomposition of contrastive learning, Wang & Isola 2020 —
alignment pulls two augmented views of one image together, uniformity
spreads the batch over the embedding sphere) on any image folder, exported
to a torch-free ``.npz``, and consumed by the perceptual loss as a TRAINED
multi-scale feature prior.

Why it matters in this environment: the reference's other feature prior —
pretrained VGG19 (``src/models.py:123-151``) — requires downloaded weights
that a zero-egress image can never hold, so ``--perceptual`` there falls
back to random features (a weak regularizer, measured PSNR-neutral in
PARITY.md). This encoder is trainable entirely in-image, making the
perceptual objective real: ``--perceptual-encoder encoder.npz``.

Training entry point: ``scripts/train_encoder.py``.

TPU shape notes: NHWC, stride-2 convs (MXU-friendly), GroupNorm (batch-
independent → mesh-safe, same reasoning as the generator's ``readme.md:20``
swap), bf16-capable compute with fp32 params.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# npz key holding the architecture (json), so a single archive file fully
# specifies the extractor — no sidecar to lose.
_META_KEY = "__meta__"


class ConvEncoder(nn.Module):
    """Small conv encoder with multi-scale feature taps.

    As a PERCEPTUAL EXTRACTOR (``__call__``) it returns a dict of named
    post-activation feature maps — one per stride-2 stage — mirroring the
    VGG19 extractor's interface (``models/vgg.py:VGG19Features``), so
    ``steps.perceptual_term`` consumes either interchangeably.

    As a CONTRASTIVE MODEL (``method="embed"``) it pools the deepest map
    and projects to an L2-normalized embedding — the representation the
    alignment/uniformity objective trains (``src/utils.py:118-137``).
    """

    features: Sequence[int] = (32, 64, 128)
    group_norm_groups: int = 8
    embed_dim: int = 128
    compute_dtype: Any = jnp.float32

    def setup(self):
        # setup() (not @compact) so BOTH __call__ and embed can share the
        # trunk submodules; flax derives param names from the attribute
        # lists ("downs_0", "convs_1", ..., "proj").
        self.downs = [
            nn.Conv(f, (3, 3), strides=(2, 2), padding=1,
                    dtype=self.compute_dtype)
            for f in self.features
        ]
        self.convs = [
            nn.Conv(f, (3, 3), padding=1, dtype=self.compute_dtype)
            for f in self.features
        ]
        self.gn_a = [
            nn.GroupNorm(num_groups=min(self.group_norm_groups, f),
                         dtype=self.compute_dtype)
            for f in self.features
        ]
        self.gn_b = [
            nn.GroupNorm(num_groups=min(self.group_norm_groups, f),
                         dtype=self.compute_dtype)
            for f in self.features
        ]
        self.proj = nn.Dense(self.embed_dim)

    def __call__(self, x) -> Dict[str, jax.Array]:
        taps: Dict[str, jax.Array] = {}
        x = x.astype(self.compute_dtype)
        for i in range(len(self.features)):
            x = self.downs[i](x)
            x = nn.leaky_relu(self.gn_a[i](x), 0.2)
            x = self.convs[i](x)
            x = nn.leaky_relu(self.gn_b[i](x), 0.2)
            taps[f"stage{i + 1}"] = x
        return taps

    def embed(self, x) -> jax.Array:
        """(B, H, W, 3) → (B, embed_dim) L2-normalized embeddings."""
        taps = self(x)
        deepest = taps[f"stage{len(self.features)}"]
        pooled = jnp.mean(deepest, axis=(1, 2)).astype(jnp.float32)
        z = self.proj(pooled)
        return z / jnp.maximum(
            jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8
        )


def init_encoder(
    key: jax.Array,
    features: Sequence[int] = (32, 64, 128),
    embed_dim: int = 128,
    group_norm_groups: int = 8,
    sample_hw: Tuple[int, int] = (64, 64),
) -> Tuple[ConvEncoder, Any]:
    """Fresh encoder (trunk + projection head) for contrastive training."""
    model = ConvEncoder(
        features=tuple(features),
        embed_dim=embed_dim,
        group_norm_groups=group_norm_groups,
    )
    sample = jnp.zeros((1, *sample_hw, 3), jnp.float32)
    params = model.init(key, sample, method=ConvEncoder.embed)["params"]
    return model, params


def alignment_loss(z1: jax.Array, z2: jax.Array) -> jax.Array:
    """Mean squared distance between the two views' embeddings (the
    alignment term pairing the reference's uniformity term; α=2 of
    Wang & Isola's (α, t) parameterization)."""
    return jnp.mean(jnp.sum((z1 - z2) ** 2, axis=-1))


def save_encoder_npz(model: ConvEncoder, params, path: str) -> None:
    """Torch-free interchange archive: flat ``a/b/c`` param keys plus an
    architecture record, so loading needs only the file (same design as
    ``vgg.save_vgg19_weights_npz``, plus self-describing metadata)."""
    flat = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            name = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, name)
            else:
                flat[name] = np.asarray(v, np.float32)

    walk(params, "")
    meta = {
        "features": list(model.features),
        "embed_dim": model.embed_dim,
        "group_norm_groups": model.group_norm_groups,
    }
    np.savez(path, **flat, **{_META_KEY: np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )})


def load_encoder_npz(path: str) -> Tuple[ConvEncoder, Any]:
    """Rebuild (model, trunk params) from a :func:`save_encoder_npz`
    archive. The projection head is loaded too when present — the
    perceptual extractor ignores it (``__call__`` never touches ``proj``),
    but contrastive fine-tuning can continue from the full state."""
    data = np.load(path)
    if _META_KEY not in data.files:
        raise KeyError(
            f"encoder archive {path!r} has no {_META_KEY} record — was it "
            "written by save_encoder_npz?"
        )
    meta = json.loads(bytes(data[_META_KEY].tobytes()).decode())
    model = ConvEncoder(
        features=tuple(meta["features"]),
        embed_dim=int(meta["embed_dim"]),
        group_norm_groups=int(meta["group_norm_groups"]),
    )
    params: Dict[str, Any] = {}
    for key in data.files:
        if key == _META_KEY:
            continue
        parts = key.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return model, params


def init_encoder_extractor(weights_npz: str) -> Tuple[ConvEncoder, Any]:
    """The perceptual-extractor entry point (counterpart of
    ``vgg.init_vgg_extractor``): load a TRAINED encoder archive. No random
    fallback here — the whole point of the encoder path is a trained
    prior; a missing file is an error, not a silent objective change."""
    model, params = load_encoder_npz(weights_npz)
    # The extractor's __call__ never reads the projection head; drop it so
    # the replicated/broadcast param tree is exactly what the graph uses.
    params = {k: v for k, v in params.items() if k != "proj"}
    return model, params
