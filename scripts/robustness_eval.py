"""Degradation-shift robustness grid for a trained checkpoint.

VERDICT r4 next-step #7: every quality number in PARITY shares one
synthetic degradation family — bilinear ÷factor + per-image U(0, σ_max)
gaussian noise (the reference's ``downward_img_quality``,
``src/transformers.py:73-77``). This script scores one checkpoint under a
grid of SHIFTED degradations, so PARITY can state how gracefully the
flagship degrades off-distribution and whether the degradation-side
training flags (``--augment``, salt&pepper) buy robustness:

  - unseen noise severity: σ_max ∈ {0, train default, 2x, ~3x};
  - salt & pepper spots ON (the reference defines the transform,
    ``src/transformers.py:39-70``, but never trains with it);
  - bicubic instead of bilinear downscale (kernel shift — the reference's
    HR normalization uses bicubic, ``src/transformers.py:79-82``, while
    its LR degradation uses bilinear).

HR clips come from the SAME validation pipeline as ``Trainer.compute_score``
/ ``scripts/score_val.py`` (deterministic order, full batches); each cell
re-degrades the identical HR batches on device with a fixed seed, so the
grid is perfectly paired — cells differ only in the degradation.

Usage:
  python scripts/robustness_eval.py --results-dir /tmp/run \
      --val-dir /tmp/val [--ema] [--member 0] [--batch 24] \
      [--max-batches 30] [--train-sigma 0.03]

Prints one JSON line per cell + a final summary line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srgan_tpu.utils.platform import (  # noqa: E402
    enable_compilation_cache,
    honor_jax_platforms_env,
)

honor_jax_platforms_env()
enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--results-dir", required=True)
    ap.add_argument("--prefix", default="Training")
    ap.add_argument("--val-dir", required=True)
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--member", type=int, default=0)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--max-batches", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--train-sigma", type=float, default=0.03,
                    help="the σ_max the run was trained with (the "
                    "in-distribution anchor cell)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from srgan_tpu.config import DataConfig
    from srgan_tpu.data.pipeline import TrainPipeline
    from srgan_tpu.models.srresnet import SRResNet
    from srgan_tpu.ops.resize import (
        add_salt_pepper,
        resize_bicubic,
        resize_bilinear,
    )
    from srgan_tpu.training import checkpoint as ckpt
    from srgan_tpu.training.steps import eval_step

    model_cfg = ckpt.load_model_config(args.results_dir, args.prefix)
    if model_cfg is None:
        raise SystemExit(f"no {args.prefix}_model.json in {args.results_dir}")
    model = SRResNet.from_config(model_cfg)
    params = ckpt.restore_generator_params(
        args.results_dir, args.prefix, index=args.member, ema=args.ema
    )
    factor = model_cfg.upscale_factor

    files = sorted(
        f for f in os.listdir(args.val_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if len(files) < args.batch:
        sys.exit(
            f"error: {args.val_dir} has {len(files)} images but --batch "
            f"is {args.batch} — lower --batch"
        )
    w, h = Image.open(os.path.join(args.val_dir, files[0])).size
    data_cfg = DataConfig(
        hr_size=(h, w), upscale_factor=factor, batch_size=args.batch,
    )
    pipe = TrainPipeline(data_cfg, args.val_dir, use_split=False,
                         seed=args.seed + 1)
    key = jax.random.fold_in(jax.random.key(args.seed + 977), 0)
    hr_batches = []
    for b, (hr, _) in enumerate(pipe.epoch(0, key)):
        if b >= args.max_batches:
            break
        hr_batches.append(hr)
    pipe.close()

    def degrade(hr, k, *, sigma, salt=0.0, pepper=0.0, spot=1,
                method="bilinear"):
        bsz, hh, ww, _ = hr.shape
        resize = resize_bicubic if method == "bicubic" else resize_bilinear
        lr = resize(hr, (hh // factor, ww // factor))
        k_std, k_noise, k_sp = jax.random.split(k, 3)
        std = jax.random.uniform(
            k_std, (bsz, 1, 1, 1), minval=0.0, maxval=max(sigma, 1e-12),
            dtype=lr.dtype,
        )
        lr = lr + jax.random.normal(k_noise, lr.shape, lr.dtype) * std
        if salt > 0.0 or pepper > 0.0:
            keys = jax.random.split(k_sp, bsz)
            lr = jax.vmap(
                lambda im, kk: add_salt_pepper(im, kk, salt, pepper, spot)
            )(lr, keys)
        return lr

    ts = args.train_sigma
    cells = [
        ("clean (sigma 0)", dict(sigma=0.0)),
        (f"train default (sigma {ts})", dict(sigma=ts)),
        (f"2x noise (sigma {2 * ts})", dict(sigma=2 * ts)),
        (f"3.3x noise (sigma {round(10 * ts / 3, 3)})",
         dict(sigma=10 * ts / 3)),
        ("salt&pepper 2%/2% spot2 + train noise",
         dict(sigma=ts, salt=0.02, pepper=0.02, spot=2)),
        ("bicubic downscale + train noise",
         dict(sigma=ts, method="bicubic")),
        ("bicubic clean", dict(sigma=0.0, method="bicubic")),
    ]

    run = jax.jit(
        lambda p, hr, lr: eval_step(model.apply, p, hr, lr)
    )
    summary = {}
    for name, kw in cells:
        psnrs, ssims = [], []
        for b, hr in enumerate(hr_batches):
            k = jax.random.fold_in(jax.random.key(args.seed + 31), b)
            lr = degrade(hr, k, **kw)
            p, s = run(params, hr, lr)
            psnrs.append(p)
            ssims.append(s)
        cell = {
            "cell": name,
            "psnr": round(float(jnp.mean(jnp.stack(psnrs))), 4),
            "ssim": round(float(jnp.mean(jnp.stack(ssims))), 4),
        }
        summary[name] = (cell["psnr"], cell["ssim"])
        print(json.dumps(cell), flush=True)

    anchor = summary.get(f"train default (sigma {ts})")
    print(json.dumps({
        "results_dir": args.results_dir,
        "ema": args.ema,
        "member": args.member,
        "n_batches": len(hr_batches),
        "anchor_psnr": anchor[0] if anchor else None,
        "worst_cell_delta_db": round(
            min(v[0] for v in summary.values()) - anchor[0], 3
        ) if anchor else None,
    }))


if __name__ == "__main__":
    main()
