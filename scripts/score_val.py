"""Score a training checkpoint on a val folder with the TRAINING metric.

Same pipeline + ``eval_step`` as ``Trainer.compute_score`` (the per-epoch
"psnr/ssim" columns of the metrics JSONL — reference scoring loop,
``src/train.py:263-294``), but driven standalone from a committed
checkpoint, so one finished run can be scored under different weight
views. ``--ema`` scores the Polyak shadow saved by an ``--ema-decay`` run;
default scores the raw training params. That makes EMA quality A/Bs
perfectly PAIRED: the shadow never feeds back into training, so raw and
EMA views of one run share the identical training trajectory.

Usage:
  python scripts/score_val.py --results-dir /tmp/run --val-dir /tmp/val \
      [--ema] [--member N] [--batch 24]

Prints one JSON line: {"psnr": ..., "ssim": ..., "ema": ..., "n_batches": N}
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
    ap.add_argument("--ema", action="store_true",
                    help="score the EMA shadow instead of the raw params")
    ap.add_argument("--member", type=int, default=0,
                    help="pool member to score (loss-sorted; 0 = leader)")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--max-batches", type=int, default=30,
                    help="compute_score's cap (src/train.py:271-272)")
    ap.add_argument("--seed", type=int, default=0)
    # Degradation knobs (ADVICE r4: a run trained with non-default
    # degradation must be scorable under the SAME pipeline, or the
    # "same as Trainer.compute_score" pairing silently breaks).
    ap.add_argument("--noise-std-max", type=float, default=0.03,
                    help="match the run's --noise-std-max")
    ap.add_argument("--salt-prob", type=float, default=0.0,
                    help="match the run's --salt-prob")
    ap.add_argument("--pepper-prob", type=float, default=0.0,
                    help="match the run's --pepper-prob")
    ap.add_argument("--spot-size", type=int, default=1,
                    help="match the run's --spot-size")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from srgan_tpu.config import DataConfig
    from srgan_tpu.data.pipeline import TrainPipeline
    from srgan_tpu.models.srresnet import SRResNet
    from srgan_tpu.training import checkpoint as ckpt
    from srgan_tpu.training.steps import eval_step

    model_cfg = ckpt.load_model_config(args.results_dir, args.prefix)
    if model_cfg is None:
        raise SystemExit(f"no {args.prefix}_model.json in {args.results_dir}")
    model = SRResNet.from_config(model_cfg)
    params = ckpt.restore_generator_params(
        args.results_dir, args.prefix, index=args.member, ema=args.ema
    )

    # Probe one val image for the HR size (the pipeline resizes to hr_size
    # exactly like training; the val set is uniform in these runs).
    from PIL import Image

    files = sorted(
        f for f in os.listdir(args.val_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if not files:
        sys.exit(f"error: no images (.png/.jpg/.jpeg) in {args.val_dir}")
    if len(files) < args.batch:
        # The pipeline yields only FULL batches (static shapes); with
        # fewer images than --batch it yields none and the mean below
        # would crash on an empty stack.
        sys.exit(
            f"error: {args.val_dir} has {len(files)} images but --batch "
            f"is {args.batch} — no full batch to score; lower --batch"
        )
    w, h = Image.open(os.path.join(args.val_dir, files[0])).size
    data_cfg = DataConfig(
        hr_size=(h, w), upscale_factor=model_cfg.upscale_factor,
        batch_size=args.batch,
        noise_std_max=args.noise_std_max,
        salt_prob=args.salt_prob,
        pepper_prob=args.pepper_prob,
        sp_spot_size=args.spot_size,
    )
    pipe = TrainPipeline(data_cfg, args.val_dir, use_split=False,
                         seed=args.seed + 1)
    key = jax.random.fold_in(jax.random.key(args.seed + 977), 0)
    psnrs, ssims = [], []
    for b, (hr, lr_imgs) in enumerate(pipe.epoch(0, key)):
        if b >= args.max_batches:
            break
        p, s = eval_step(model.apply, params, hr, lr_imgs)
        psnrs.append(p)
        ssims.append(s)
    pipe.close()
    print(json.dumps({
        "psnr": round(float(jnp.mean(jnp.stack(psnrs))), 4),
        "ssim": round(float(jnp.mean(jnp.stack(ssims))), 4),
        "ema": args.ema,
        "member": args.member,
        "n_batches": len(psnrs),
    }))


if __name__ == "__main__":
    main()
