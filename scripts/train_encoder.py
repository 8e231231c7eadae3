"""Train the contrastive image encoder (alignment + uniformity).

Thin wrapper over :func:`srgan_tpu.training.encoder_train.
train_contrastive_encoder` — the perceptual prior the reference only
planned (``src/utils.py:118-137``); see that module's docstring. The same
surface ships as ``python -m srgan_tpu.cli train-encoder``.

Usage:
  python scripts/train_encoder.py --data /tmp/srbench_512x1024 \
      --out /tmp/encoder.npz [--steps 1500] [--batch 32] [--crop 96]

Prints one JSON line: {"align": ..., "unif": ..., "loss0": ..., "lossN": ...}.
"""

from __future__ import annotations

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
    from srgan_tpu.cli import add_train_encoder_args, run_train_encoder

    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    add_train_encoder_args(ap)
    args = ap.parse_args()
    print(json.dumps(run_train_encoder(args)))


if __name__ == "__main__":
    main()
