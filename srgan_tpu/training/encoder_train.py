"""Contrastive image-encoder training (alignment + uniformity).

Trains the perceptual prior the reference only PLANNED: its
``uniformity_loss`` ships with a comment describing a future image-encoder
contrastive objective (``src/utils.py:118-137``) that was never trained —
the loss is dead code upstream. Here it is load-bearing: SimCLR-style two
augmented views per image, alignment (pull the views together) + the
exact ported uniformity term (spread the batch over the sphere,
``srgan_tpu.ops.gan_loss.uniformity_loss``), on ANY image folder, fully
in-image (no downloads — the pretrained-VGG19 route needs network egress).
The result is a torch-free ``.npz`` consumed by ``train
--perceptual-encoder`` as a TRAINED multi-scale feature prior (measured
+0.22 dB paired PSNR over pixel-only at the 4x parity config, PARITY.md).

Surfaces: ``python -m srgan_tpu.cli train-encoder`` and the
``scripts/train_encoder.py`` wrapper; both call
:func:`train_contrastive_encoder`.
"""

from __future__ import annotations

import functools
import os
import sys
import time
from typing import Sequence

import jax
import numpy as np


def load_corpus(folder: str, load_size: int) -> np.ndarray:
    """Decode every readable image to (load_size, load_size) uint8."""
    from srgan_tpu.data.dataset import list_image_files, load_hr_clip_u8

    imgs = []
    for f in list_image_files(folder):
        img = load_hr_clip_u8(os.path.join(folder, f), (load_size, load_size))
        if img is not None:
            imgs.append(img)
    if not imgs:
        raise FileNotFoundError(f"no readable images in {folder}")
    return np.stack(imgs)


@functools.partial(jax.jit, static_argnames=("crop",))
def two_views(imgs_u8, key, crop: int):
    """Two independently augmented views per image: random crop, flips,
    brightness/contrast jitter, gaussian noise — the cheap photometric/
    geometric family (all fused into one executable; RNG threaded per
    view/image)."""
    import jax.numpy as jnp

    def one_view(img_u8, k):
        x = img_u8.astype(jnp.float32) / 255.0
        kcy, kcx, kf, kb, kcon, kn = jax.random.split(k, 6)
        h, w = x.shape[0], x.shape[1]
        oy = jax.random.randint(kcy, (), 0, h - crop + 1)
        ox = jax.random.randint(kcx, (), 0, w - crop + 1)
        x = jax.lax.dynamic_slice(x, (oy, ox, 0), (crop, crop, 3))
        fh, fw = jax.random.bernoulli(kf, shape=(2,))
        x = jnp.where(fh, x[::-1], x)
        x = jnp.where(fw, x[:, ::-1], x)
        b = jax.random.uniform(kb, (), minval=-0.15, maxval=0.15)
        c = jax.random.uniform(kcon, (), minval=0.8, maxval=1.2)
        x = (x - 0.5) * c + 0.5 + b
        x = x + 0.02 * jax.random.normal(kn, x.shape)
        return jnp.clip(x, 0.0, 1.0)

    n = imgs_u8.shape[0]
    k1, k2 = jax.random.split(key)
    v1 = jax.vmap(one_view)(imgs_u8, jax.random.split(k1, n))
    v2 = jax.vmap(one_view)(imgs_u8, jax.random.split(k2, n))
    return v1, v2


def train_contrastive_encoder(
    data_dir: str,
    out_path: str,
    *,
    steps: int = 1500,
    batch: int = 32,
    crop: int = 96,
    load_size: int = 160,
    features: Sequence[int] = (32, 64, 128),
    embed_dim: int = 128,
    lr: float = 1e-3,
    unif_weight: float = 1.0,
    seed: int = 0,
    verbose: bool = True,
) -> dict:
    """Train the encoder on ``data_dir`` and write the ``.npz`` archive.

    Returns a summary dict (``loss0``/``lossN``/``align``/``unif``/
    ``wall_s`` …) — the JSON line both CLI surfaces print.
    """
    if steps < 1:
        # Never write a random-weight archive that LOOKS like a trained
        # prior — feeding it to --perceptual-encoder would silently
        # reproduce the random-feature objective this path exists to
        # eliminate (and the summary below would crash on float(None)).
        raise ValueError(f"steps must be >= 1, got {steps}")
    import jax
    import jax.numpy as jnp

    from srgan_tpu.models.encoder import (
        ConvEncoder,
        alignment_loss,
        init_encoder,
        save_encoder_npz,
    )
    from srgan_tpu.ops.gan_loss import uniformity_loss
    from srgan_tpu.training.train_state import TrainState

    corpus = load_corpus(data_dir, load_size)
    if verbose:
        print(f"corpus: {len(corpus)} images @ {load_size}px", file=sys.stderr)

    model, params = init_encoder(
        jax.random.key(seed),
        features=list(features),
        embed_dim=embed_dim,
        sample_hw=(crop, crop),
    )
    state = TrainState.create(apply_fn=model.apply, params=params)
    lam = unif_weight

    def loss_fn(p, v1, v2):
        z1 = model.apply({"params": p}, v1, method=ConvEncoder.embed)
        z2 = model.apply({"params": p}, v2, method=ConvEncoder.embed)
        align = alignment_loss(z1, z2)
        unif = 0.5 * (uniformity_loss(z1) + uniformity_loss(z2))
        return align + lam * unif, (align, unif)

    @jax.jit
    def train_step(state, v1, v2, lr):
        (loss, (align, unif)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, v1, v2)
        return state.apply_gradients(grads, lr), loss, align, unif

    rng = np.random.default_rng(seed)
    lr_arr = jnp.asarray(lr)
    t0 = time.perf_counter()
    loss0 = align = unif = loss = None
    for step in range(steps):
        idx = rng.choice(len(corpus), size=batch, replace=len(corpus) < batch)
        batch_u8 = jnp.asarray(corpus[idx])
        key = jax.random.fold_in(jax.random.key(seed + 1), step)
        v1, v2 = two_views(batch_u8, key, crop)
        state, loss, align, unif = train_step(state, v1, v2, lr_arr)
        if step == 0:
            loss0 = float(loss)
        if verbose and step % 100 == 0:
            print(
                f"step {step}: loss={float(loss):.4f} "
                f"align={float(align):.4f} unif={float(unif):.4f}",
                file=sys.stderr, flush=True,
            )

    save_encoder_npz(model, state.params, out_path)
    return {
        "out": out_path,
        "steps": steps,
        "images": len(corpus),
        "loss0": loss0,
        "lossN": float(loss),
        "align": float(align),
        "unif": float(unif),
        "wall_s": round(time.perf_counter() - t0, 1),
    }
