"""Train the contrastive image encoder (alignment + uniformity).

Builds the perceptual prior the reference only PLANNED: its
``uniformity_loss`` ships with a comment describing a future image-encoder
contrastive objective (``src/utils.py:118-137``) that was never trained.
This script trains that encoder — SimCLR-style two augmented views per
image, alignment (pull the views together) + the reference's uniformity
term (spread the batch over the sphere; the exact ported loss,
``srgan_tpu.ops.gan_loss.uniformity_loss``) — on ANY image folder, fully
in-image (no downloads; the pretrained-VGG19 route is impossible in a
zero-egress environment). The result is a torch-free ``.npz`` consumed by
``--perceptual-encoder`` as a TRAINED multi-scale feature prior.

Usage:
  python scripts/train_encoder.py --data /tmp/srbench_512x1024 \
      --out /tmp/encoder.npz [--steps 1500] [--batch 32] [--crop 96]

Prints one JSON line: {"align": ..., "unif": ..., "loss0": ..., "lossN": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srgan_tpu.utils.platform import (  # noqa: E402
    enable_compilation_cache,
    honor_jax_platforms_env,
)

honor_jax_platforms_env()
enable_compilation_cache()

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def load_corpus(folder: str, load_size: int) -> np.ndarray:
    """Decode every readable image to (load_size, load_size) uint8."""
    from srgan_tpu.data.dataset import list_image_files, load_hr_clip_u8

    imgs = []
    for f in list_image_files(folder):
        img = load_hr_clip_u8(
            os.path.join(folder, f), (load_size, load_size)
        )
        if img is not None:
            imgs.append(img)
    if not imgs:
        sys.exit(f"error: no readable images in {folder}")
    return np.stack(imgs)


@functools.partial(jax.jit, static_argnames=("crop",))
def two_views(imgs_u8: jax.Array, key: jax.Array, crop: int) -> tuple:
    """Two independently augmented views per image: random crop, flips,
    brightness/contrast jitter, gaussian noise — the cheap photometric/
    geometric family (all fused into one executable; RNG threaded per
    view/image)."""

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


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--data", required=True, help="image folder to train on")
    ap.add_argument("--out", required=True, help="output .npz archive")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--crop", type=int, default=96)
    ap.add_argument("--load-size", type=int, default=160,
                    help="images are pre-resized to this square size; "
                         "crops are cut from it on device")
    ap.add_argument("--features", type=int, nargs="+", default=[32, 64, 128])
    ap.add_argument("--embed-dim", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--unif-weight", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from srgan_tpu.models.encoder import (
        ConvEncoder,
        alignment_loss,
        init_encoder,
        save_encoder_npz,
    )
    from srgan_tpu.ops.gan_loss import uniformity_loss
    from srgan_tpu.training.train_state import TrainState

    corpus = load_corpus(args.data, args.load_size)
    print(f"corpus: {len(corpus)} images @ {args.load_size}px", file=sys.stderr)

    model, params = init_encoder(
        jax.random.key(args.seed),
        features=args.features,
        embed_dim=args.embed_dim,
        sample_hw=(args.crop, args.crop),
    )
    state = TrainState.create(apply_fn=model.apply, params=params)
    lam = args.unif_weight

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

    rng = np.random.default_rng(args.seed)
    lr = jnp.asarray(args.lr)
    t0 = time.perf_counter()
    loss0 = align = unif = loss = None
    for step in range(args.steps):
        idx = rng.choice(len(corpus), size=args.batch,
                         replace=len(corpus) < args.batch)
        batch_u8 = jnp.asarray(corpus[idx])
        key = jax.random.fold_in(jax.random.key(args.seed + 1), step)
        v1, v2 = two_views(batch_u8, key, args.crop)
        state, loss, align, unif = train_step(state, v1, v2, lr)
        if step == 0:
            loss0 = float(loss)
        if step % 100 == 0:
            print(
                f"step {step}: loss={float(loss):.4f} "
                f"align={float(align):.4f} unif={float(unif):.4f}",
                file=sys.stderr, flush=True,
            )

    save_encoder_npz(model, state.params, args.out)
    print(json.dumps({
        "out": args.out,
        "steps": args.steps,
        "images": len(corpus),
        "loss0": loss0,
        "lossN": float(loss),
        "align": float(align),
        "unif": float(unif),
        "wall_s": round(time.perf_counter() - t0, 1),
    }))


if __name__ == "__main__":
    main()
