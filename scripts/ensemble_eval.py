"""Leader-vs-ensemble serving quality on a trained pool checkpoint.

Scores the held-out folder two ways — member 0 only (the reference's
serving mode, ``src/evaluation.py:22-31``) and the pool-ensemble mean
(``Upscaler.from_checkpoint(..., ensemble=True)``) — with the training
pipeline's own degradation (bilinear ÷factor, no noise) as the LR source,
so the comparison isolates the serving-side choice.

Usage:
  python scripts/ensemble_eval.py --results-dir /tmp/ens_run \
      [--val-dir /tmp/srbench_data_val] [--prefix Training]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results-dir", required=True)
    ap.add_argument("--prefix", default="Training")
    ap.add_argument("--val-dir", default="/tmp/srbench_data_val")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ema", action="store_true",
                    help="score the EMA (Polyak) shadow weights saved by "
                         "an --ema-decay run instead of the raw params")
    args = ap.parse_args()

    from srgan_tpu.utils.platform import (
        enable_compilation_cache,
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from srgan_tpu.data.dataset import ImageFolderDataset, load_hr_clip_u8
    from srgan_tpu.eval.inference import Upscaler
    from srgan_tpu.ops.metrics import batched_psnr_ssim
    from srgan_tpu.ops.resize import resize_bilinear
    from srgan_tpu.training.steps import (
        infer_step,
        infer_step_ensemble,
        infer_step_tta,
    )

    ds = ImageFolderDataset(args.val_dir, (512, 1024))
    lead = Upscaler.from_checkpoint(args.results_dir, args.prefix,
                                    ema=args.ema)
    ens = Upscaler.from_checkpoint(
        args.results_dir, args.prefix, ensemble=True, ema=args.ema
    )
    f = lead.model.upscale_factor

    @jax.jit
    def prep(hr_u8):
        hr = hr_u8.astype(jnp.float32) / 255.0
        lr = resize_bilinear(hr, (hr.shape[1] // f, hr.shape[2] // f))
        return hr, lr

    @jax.jit
    def score(sr, hr):
        p, s = batched_psnr_ssim(jnp.clip(sr, 0.0, 1.0), hr)
        return jnp.mean(p), jnp.mean(s)

    # A pool-1 checkpoint degrades `ens` to a PLAIN upscaler
    # (from_checkpoint's contract) — its params carry no member axis, so
    # the ensemble steps would vmap over raw weight axes. Score only the
    # lead rows and say so, instead of crashing (or silently double-
    # reporting the lead as an "ensemble").
    rows = [
        ("lead", lead, infer_step, {}),
        ("ens", ens, infer_step_ensemble, {}),
        ("lead+tta", lead, infer_step_tta, {}),
        ("ens+tta", ens, infer_step_tta, {"ensemble": True}),
    ]
    if not getattr(ens, "ensemble", False):
        print("note: single-member checkpoint — skipping the ensemble "
              "rows (train with --num-generators N>1 for a pool)",
              file=sys.stderr)
        rows = [r for r in rows if r[0] in ("lead", "lead+tta")]

    sums = {name: [0.0, 0.0] for name, *_ in rows}
    n_batches = 0
    batch_paths = [
        [ds.path(j) for j in range(i, min(i + args.batch, len(ds)))]
        for i in range(0, len(ds), args.batch)
    ]
    for paths in batch_paths:
        if len(paths) < args.batch:
            continue  # static shapes: drop the remainder
        imgs = [load_hr_clip_u8(p, (512, 1024)) for p in paths]
        if any(im is None for im in imgs):
            # A corrupt decode would shorten the batch — defeating the
            # static-shape intent (recompile per distinct count) and
            # crashing np.stack when ALL decodes fail. Skip the whole batch
            # visibly instead (ADVICE r3).
            print(f"warning: skipping batch with "
                  f"{sum(im is None for im in imgs)} unreadable file(s)",
                  file=sys.stderr)
            continue
        hr_u8 = jnp.asarray(np.stack(imgs))
        hr, lr = prep(hr_u8)
        for name, up, step, kw in rows:
            sr = step(up.model.apply, up.params, lr, **kw)
            p, s = score(sr, hr)
            sums[name][0] += float(p)
            sums[name][1] += float(s)
        n_batches += 1
    if n_batches == 0:
        # Printing 0.000 averages would read as a (terrible) quality score;
        # fail loudly instead (ADVICE r3: len(ds) < --batch drops every
        # batch silently).
        sys.exit(
            f"error: no full batches scored — the folder has {len(ds)} "
            f"readable images but --batch is {args.batch}; lower --batch "
            "or point --val-dir at a larger set"
        )
    for name in sums:
        p, s = (v / max(1, n_batches) for v in sums[name])
        print(f"{name}: psnr={p:.3f} ssim={s:.4f} ({n_batches} batches)")


if __name__ == "__main__":
    main()
