"""Command-line entry points: ``python -m srgan_tpu.cli <train|eval|upscale>``.

Replaces the reference's three ad-hoc entries — ``python src/train.py``
(``src/train.py:297-302``), ``python src/evaluation.py``
(``src/evaluation.py:64-79``) and the broken ``src/main.py`` — with one
launcher. On TPU a single process drives all local devices via the mesh; no
``mp.spawn``-per-device (SURVEY.md §2 Train CLI row).
"""

from __future__ import annotations

import argparse
import sys


def _add_train(sub):
    p = sub.add_parser("train", help="train the (pool of) SR generator(s)")
    p.add_argument("--train-dir", default="data/train")
    p.add_argument("--val-dir", default="data/val")
    p.add_argument("--epochs", type=int, default=30)  # train.py:23
    p.add_argument("--batch-size", type=int, default=12)  # train.py:94
    p.add_argument("--hr-height", type=int, default=512)
    p.add_argument("--hr-width", type=int, default=1024)
    p.add_argument("--upscale", type=int, default=4)
    p.add_argument("--num-features", type=int, default=64)
    p.add_argument("--num-residuals", type=int, default=16)
    p.add_argument("--num-generators", type=int, default=1)
    p.add_argument("--gan", action="store_true",
                   help="enable adversarial training (BASELINE configs 2+)")
    p.add_argument("--d-stages", type=int, default=4,
                   help="discriminator conv/pool stages (4 = reference "
                        "parity, needs >=428px inputs; fewer stages give a "
                        "shallower patch critic for smaller images)")
    p.add_argument("--d-features", type=int, default=64,
                   help="discriminator base channel width (64 = reference "
                        "parity; scale with --num-features so the critic "
                        "keeps pace with a wider generator, e.g. 128)")
    p.add_argument("--vgg-weights", default=None, metavar="NPZ",
                   help="pretrained VGG19 feature weights (.npz exported "
                        "via vgg.export_torch_vgg19_to_npz; torch-free). "
                        "Without it --perceptual falls back to RANDOM "
                        "features and warns")
    p.add_argument("--perceptual", type=float, default=0.0, metavar="WEIGHT",
                   help="perceptual-loss weight, 0 = off (the reference's "
                        "disabled utils.py:154-166 path). Feature source: "
                        "--perceptual-encoder if given, else VGG19")
    p.add_argument("--perceptual-encoder", default=None, metavar="NPZ",
                   help="TRAINED contrastive-encoder feature prior "
                        "(scripts/train_encoder.py output) — the "
                        "reference's planned image-encoder objective "
                        "(utils.py:118-137), trainable fully in-image; "
                        "replaces VGG as the perceptual feature source")
    p.add_argument("--starting-gan-loss", type=float, default=None,
                   help="two-regime gate threshold (readme.md:10). Default "
                        "auto: calibrated at the first epoch end to "
                        "gate-auto-frac x the median running loss, so the "
                        "below-regime actually engages at default configs "
                        "(r3 measured losses bottoming just above the old "
                        "hand default of 0.05)")
    p.add_argument("--gate-auto-frac", type=float, default=0.6,
                   help="auto-calibration fraction for the gate threshold "
                        "(only read while --starting-gan-loss is unset)")
    p.add_argument("--pool-exec", choices=("scan", "vmap"), default="scan",
                   help="stacked-pool executor: 'scan' (default) runs "
                        "members sequentially inside one executable (1x "
                        "activation memory — flagship pool GAN fits at "
                        "full batch with no --remat, and the Pallas loss "
                        "kernel engages); 'vmap' interleaves all members "
                        "in one differentiated region (N x memory — needs "
                        "--remat + smaller batch at flagship shapes)")
    p.add_argument("--no-mutual", action="store_true",
                   help="disable the epoch-end weak-learns-from-strong "
                        "interpolation (readme.md:13). Leader quality is "
                        "unaffected (PARITY pool ablation); diverse members "
                        "can ensemble better at serving time (--ensemble)")
    p.add_argument("--mutual-alpha", type=float, default=0.2,
                   help="weak<-strong interpolation strength "
                        "(utils.py:113-115's alpha)")
    p.add_argument("--pre-loss-gate", action="store_true",
                   help="modulate P(GAN) by own loss vs last epoch's "
                        "pre_loss snapshot (readme.md:5 clause; off = EMA "
                        "interpretation, pre_loss is telemetry)")
    p.add_argument("--continue-training", action="store_true",
                   help="fine-tune phase: reload checkpoint, LR/5, "
                        "Post-Training prefix (train.py:51-59)")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="snapshot the full state every N epochs "
                        "(preemption recovery; 0 = end-of-run only)")
    p.add_argument("--keep-best", action="store_true",
                   help="snapshot to <prefix>-best whenever val PSNR "
                        "improves (long GAN fine-tunes can end below their "
                        "peak)")
    p.add_argument("--resume", action="store_true",
                   help="continue the same run from the last snapshot")
    p.add_argument("--validate-every", type=int, default=5,
                   help="comparison-grid cadence in epochs (train.py:114)")
    p.add_argument("--device-cache", choices=["auto", "on", "off"],
                   default="auto",
                   help="HBM-resident uint8 dataset cache (fastest epochs; "
                        "'off' streams from host when the cache + training "
                        "program don't fit together)")
    p.add_argument("--noise-std-max", type=float, default=0.03,
                   help="max per-image LR noise severity (transformers.py:76)")
    p.add_argument("--salt-prob", type=float, default=0.0,
                   help="salt-spot density bound for LR corruption "
                        "(transformers.py:39-70; 0 = off, the reference's "
                        "unused default)")
    p.add_argument("--pepper-prob", type=float, default=0.0,
                   help="pepper-spot density bound (see --salt-prob)")
    p.add_argument("--spot-size", type=int, default=1,
                   help="square spot side for salt & pepper corruption")
    p.add_argument("--augment", action="store_true",
                   help="random H/V flips of each HR clip before "
                        "degradation (device-side, ~free; validation never "
                        "augments). Off by default — the reference's "
                        "pipeline has no augmentation")
    p.add_argument("--lr-generator", type=float, default=1e-4)
    p.add_argument("--lr-schedule", choices=("linear", "cosine"),
                   default="linear",
                   help="linear = the reference's LinearLR 1->0.01 "
                        "(train.py:70-71); cosine = its commented-out "
                        "CosineAnnealingLR variant (train.py:68-69)")
    p.add_argument("--lr-discriminator", type=float, default=5e-5)
    p.add_argument("--ema-decay", type=float, default=0.0, metavar="D",
                   help="Polyak/EMA-average the generator weights with this "
                        "per-step decay (0 = off, reference behavior). "
                        "Validation/keep-best and `eval --ema` then use the "
                        "averaged weights; horizon ~1/(1-D) steps")
    p.add_argument("--results-dir", default="results")
    p.add_argument("--prefix", default="Training")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 conv compute (TPU MXU fast path)")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint each residual block (fits larger "
                        "batches/pools per chip)")
    p.add_argument("--progress", choices=["auto", "always", "off"],
                   default="auto",
                   help="in-epoch live loss line (reference tqdm-postfix "
                        "parity; auto = only on a TTY)")
    p.add_argument("--debug-nans", action="store_true")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the run into this "
                        "directory (view with TensorBoard/XProf)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() first")
    p.add_argument("--reduce-metrics", action="store_true",
                   help="all-reduce the scalar epoch record across hosts "
                        "(one identical global curve per host; default "
                        "keeps the reference's per-rank curves)")


def _add_eval(sub):
    p = sub.add_parser("eval", help="batch evaluation on a paired LR/HR set")
    p.add_argument("-D", "--data_dir", default="data")
    p.add_argument("-lr", "--lr_dir", default="LRbicx4")
    p.add_argument("-hr", "--hr_dir", default="original")
    p.add_argument("--no-extra-downscale", action="store_true")
    p.add_argument("--no-enhance", action="store_true")
    p.add_argument("--bucketed", action="store_true",
                   help="pad to the set's max size + masked metrics: ONE "
                        "compiled SR/metric graph for size-diverse sets")
    p.add_argument("--results-dir", default="results")
    p.add_argument("--prefix", default="Training")
    p.add_argument("--torch-checkpoint", default=None,
                   help="evaluate a reference PyTorch .pth generator "
                        "directly (ported on the fly)")
    p.add_argument("--ensemble", action="store_true",
                   help="serve the member-MEAN SR of every pool generator "
                        "in the checkpoint (the reference serves only "
                        "member 0; measured quality gain in PARITY.md)")
    p.add_argument("--tta", action="store_true",
                   help="geometric self-ensemble (x8 dihedral test-time "
                        "augmentation); composes with --ensemble")
    p.add_argument("--ema", action="store_true",
                   help="serve the Polyak-averaged (EMA) weights saved by "
                        "an --ema-decay training run")
    p.add_argument("--perceptual-metric", default=None, metavar="NPZ",
                   help="trained contrastive-encoder archive "
                        "(train-encoder output): also report the average "
                        "encoder feature distance (LPIPS-style, lower = "
                        "better) — the eval-side counterpart of "
                        "--perceptual-encoder")


def _add_upscale(sub):
    p = sub.add_parser("upscale", help="super-resolve one image file")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--results-dir", default="results")
    p.add_argument("--prefix", default="Training")
    p.add_argument("--enhance", action="store_true")
    p.add_argument("--ensemble", action="store_true",
                   help="serve the member-MEAN SR of every pool generator "
                        "in the checkpoint (the reference serves only "
                        "member 0; measured quality gain in PARITY.md)")
    p.add_argument("--tta", action="store_true",
                   help="geometric self-ensemble (x8 dihedral test-time "
                        "augmentation); composes with --ensemble")
    p.add_argument("--ema", action="store_true",
                   help="serve the Polyak-averaged (EMA) weights saved by "
                        "an --ema-decay training run")
    p.add_argument("--tile", type=int, default=0,
                   help="tile size (LR px) for tiled inference: one compiled "
                        "executable for ANY image size, HBM bounded by "
                        "--tile-batch tiles. 0 = direct whole-image path")
    p.add_argument("--tile-overlap", type=int, default=16,
                   help="feather-blended tile margin (LR px)")
    p.add_argument("--tile-batch", type=int, default=16,
                   help="tiles per device batch in tiled mode")
    p.add_argument("--dp", action="store_true",
                   help="shard inference batches over every visible device "
                        "(data-parallel serving mesh)")


def _add_upscale_dir(sub):
    p = sub.add_parser(
        "upscale-dir",
        help="super-resolve every image in a folder (batch serving path)",
    )
    p.add_argument("input_dir")
    p.add_argument("output_dir")
    p.add_argument("--results-dir", default="results")
    p.add_argument("--prefix", default="Training")
    p.add_argument("--enhance", action="store_true")
    p.add_argument("--ensemble", action="store_true",
                   help="serve the member-MEAN SR of every pool generator "
                        "in the checkpoint (the reference serves only "
                        "member 0; measured quality gain in PARITY.md)")
    p.add_argument("--tta", action="store_true",
                   help="geometric self-ensemble (x8 dihedral test-time "
                        "augmentation); composes with --ensemble")
    p.add_argument("--ema", action="store_true",
                   help="serve the Polyak-averaged (EMA) weights saved by "
                        "an --ema-decay training run")
    p.add_argument("--batch-size", type=int, default=8,
                   help="images per device batch (same-size images batch "
                        "together; sizes are bucketed automatically)")
    p.add_argument("--dp", action="store_true",
                   help="shard inference batches over every visible device "
                        "(data-parallel serving mesh)")


def add_train_encoder_args(p):
    """Shared flag set for the two encoder-training surfaces (this CLI and
    ``scripts/train_encoder.py``)."""
    p.add_argument("--data", required=True, help="image folder to train on")
    p.add_argument("--out", required=True, help="output .npz archive")
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--crop", type=int, default=96)
    p.add_argument("--load-size", type=int, default=160,
                   help="images are pre-resized to this square size; "
                        "crops are cut from it on device")
    p.add_argument("--features", type=int, nargs="+", default=[32, 64, 128])
    p.add_argument("--embed-dim", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--unif-weight", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)


def run_train_encoder(args) -> dict:
    from srgan_tpu.training.encoder_train import train_contrastive_encoder

    return train_contrastive_encoder(
        args.data, args.out,
        steps=args.steps, batch=args.batch, crop=args.crop,
        load_size=args.load_size, features=args.features,
        embed_dim=args.embed_dim, lr=args.lr,
        unif_weight=args.unif_weight, seed=args.seed,
    )


def _add_train_encoder(sub):
    p = sub.add_parser(
        "train-encoder",
        help="train the contrastive image-encoder perceptual prior "
             "(alignment + the reference's uniformity loss, "
             "utils.py:118-137) — feed the .npz to train "
             "--perceptual-encoder",
    )
    add_train_encoder_args(p)


def main(argv=None):
    from srgan_tpu.utils.platform import (
        enable_compilation_cache,
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    enable_compilation_cache()
    parser = argparse.ArgumentParser("srgan_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    _add_train(sub)
    _add_train_encoder(sub)
    _add_eval(sub)
    _add_upscale(sub)
    _add_upscale_dir(sub)
    args = parser.parse_args(argv)

    if args.cmd == "train":
        from srgan_tpu.config import (
            Config, DataConfig, DiscriminatorConfig, ModelConfig, PoolConfig,
            TrainConfig,
        )
        from srgan_tpu.training.loop import Trainer

        if args.multihost:
            from srgan_tpu.parallel.mesh import initialize_multihost

            initialize_multihost()
        cfg = Config(
            discriminator=DiscriminatorConfig(
                num_stages=args.d_stages,
                num_filters=args.d_features,
                compute_dtype="bfloat16" if args.bf16 else "float32",
            ),
            model=ModelConfig(
                upscale_factor=args.upscale,
                num_features=args.num_features,
                num_residuals=args.num_residuals,
                remat=args.remat,
                compute_dtype="bfloat16" if args.bf16 else "float32",
            ),
            data=DataConfig(
                train_dir=args.train_dir,
                val_dir=args.val_dir,
                hr_size=(args.hr_height, args.hr_width),
                upscale_factor=args.upscale,
                batch_size=args.batch_size,
                noise_std_max=args.noise_std_max,
                salt_prob=args.salt_prob,
                pepper_prob=args.pepper_prob,
                sp_spot_size=args.spot_size,
                augment_flips=args.augment,
                device_cache=args.device_cache,
            ),
            pool=PoolConfig(
                num_generators=args.num_generators,
                starting_gan_loss=args.starting_gan_loss,
                gate_auto_frac=args.gate_auto_frac,
                pre_loss_gate=args.pre_loss_gate,
                member_exec=args.pool_exec,
                mutual_learning=not args.no_mutual,
                mutual_alpha=args.mutual_alpha,
            ),
            train=TrainConfig(
                num_epochs=args.epochs,
                lr_generator=args.lr_generator,
                lr_schedule=args.lr_schedule,
                lr_discriminator=args.lr_discriminator,
                use_gan=args.gan,
                ema_decay=args.ema_decay,
                perceptual_weight=args.perceptual,
                vgg_weights_npz=args.vgg_weights,
                perceptual_encoder_npz=args.perceptual_encoder,
                validate_every=args.validate_every,
                results_dir=args.results_dir,
                run_prefix=args.prefix,
                seed=args.seed,
                debug_nans=args.debug_nans,
                checkpoint_every=args.checkpoint_every,
                keep_best=args.keep_best,
                reduce_metrics=args.reduce_metrics,
                progress=args.progress,
            ),
        )
        try:
            if args.profile_dir:
                from srgan_tpu.utils.profiling import trace

                ctx = trace(args.profile_dir)
            else:
                import contextlib

                ctx = contextlib.nullcontext()
            with ctx:
                Trainer(cfg).train(
                    continue_training=args.continue_training,
                    resume=args.resume,
                )
        except Exception as e:  # noqa: BLE001 — annotate OOMs, re-raise
            if "RESOURCE_EXHAUSTED" in str(e):
                hints = ["--batch-size lower than "
                         f"{cfg.data.batch_size}"]
                if cfg.data.device_cache != "off":
                    hints.insert(0, "--device-cache off (the HBM dataset "
                                    "cache competes with the training "
                                    "program)")
                if not cfg.model.remat:
                    hints.insert(0, "--remat (required for multi-generator "
                                    "GAN at flagship shapes)")
                print(
                    "error: the training program exceeded device memory. "
                    "Try: " + "; ".join(hints) + ".",
                    file=sys.stderr,
                )
            raise
    elif args.cmd == "train-encoder":
        import json

        print(json.dumps(run_train_encoder(args)))
    elif args.cmd == "eval":
        from srgan_tpu.eval.evaluation import evaluate_model

        evaluate_model(
            dataset=args.data_dir,
            lr_path=args.lr_dir,
            hr_path=args.hr_dir,
            results_dir=args.results_dir,
            prefix=args.prefix,
            torch_checkpoint=args.torch_checkpoint,
            extra_downscale=not args.no_extra_downscale,
            apply_enhance=not args.no_enhance,
            bucketed=args.bucketed,
            ensemble=args.ensemble,
            tta=args.tta,
            ema=args.ema,
            perceptual_metric=args.perceptual_metric,
        )
    elif args.cmd == "upscale":
        import os

        from srgan_tpu.eval.inference import Upscaler

        from srgan_tpu.training.checkpoint import latest_ckpt_dir

        ckpt_dir = latest_ckpt_dir(args.results_dir, args.prefix)
        mesh = None
        if args.dp:
            from srgan_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
        if ckpt_dir is not None:
            up = Upscaler.from_checkpoint(
                args.results_dir, args.prefix, enhance_output=args.enhance,
                mesh=mesh, ensemble=args.ensemble, tta=args.tta,
                ema=args.ema,
            )
        else:
            print("warning: no checkpoint found, using random weights",
                  file=sys.stderr)
            up = Upscaler.random_init(enhance_output=args.enhance, mesh=mesh)
        if args.tile:
            from srgan_tpu.utils.image_io import load_image, save_image

            sr = up.upscale_tiled(
                load_image(args.input),
                tile=args.tile,
                overlap=args.tile_overlap,
                batch_size=args.tile_batch,
            )
            save_image(sr, args.output)
        else:
            up.upscale_file(args.input, args.output)
        print(f"saved {args.output}")
    elif args.cmd == "upscale-dir":
        from srgan_tpu.eval.inference import upscale_directory

        mesh = None
        if args.dp:
            from srgan_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
        n = upscale_directory(
            args.input_dir,
            args.output_dir,
            results_dir=args.results_dir,
            prefix=args.prefix,
            enhance_output=args.enhance,
            batch_size=args.batch_size,
            mesh=mesh,
            ensemble=args.ensemble,
            tta=args.tta,
            ema=args.ema,
        )
        print(f"upscaled {n} images into {args.output_dir}")


if __name__ == "__main__":
    main()
