"""Orbax checkpointing of full train states + two-phase fine-tune resume.

The reference saves only model ``state_dict``s at the very end of training
(``src/train.py:123-125``) and its resume path reloads rank-0 weights,
divides both learning rates by 5 and renames the run prefix to
"Post-Training" (``src/train.py:51-59``) — the README's
"pixel-train-then-GAN-finetune" mechanism (``readme.md:14``). Here the FULL
state (params + Adam moments + pool bookkeeping + epoch) round-trips through
Orbax, which the reference cannot do at all (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import orbax.checkpoint as ocp

from srgan_tpu.config import ModelConfig, TrainConfig
from srgan_tpu.training.pool import GeneratorPool
from srgan_tpu.training.train_state import TrainState

FINETUNE_PREFIX = "Post-Training"  # ``src/train.py:58``

# Singleton async checkpointer for mid-training snapshots: the device→host
# copy is synchronous (so donated/overwritten buffers are safe to reuse the
# moment save() returns), but serialization + disk writes run on Orbax's
# background thread, overlapping with the next training epochs instead of
# stalling them.
_async_ckptr: Optional[ocp.AsyncCheckpointer] = None


def _get_async_checkpointer() -> ocp.AsyncCheckpointer:
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_ckptr


def wait_for_checkpoints() -> None:
    """Block until any in-flight async snapshot hits disk."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def _ckpt_dir(results_dir: str, prefix: str) -> str:
    return os.path.abspath(os.path.join(results_dir, f"{prefix}_ckpt"))


def save_checkpoint(
    results_dir: str,
    prefix: str,
    *,
    pool: GeneratorPool,
    d_state: Optional[TrainState],
    epoch: int,
    model_config: Optional[ModelConfig] = None,
    block: bool = True,
) -> str:
    """Write a complete training snapshot (all generators, discriminator,
    pool bookkeeping, epoch counter). The generator architecture is recorded
    in a JSON sidecar so inference can rebuild the right model without the
    training config (the reference cannot: its ``.pth`` files carry no
    architecture info and eval hardcodes ``SRResNet()``,
    ``src/evaluation.py:23``)."""
    path = _ckpt_dir(results_dir, prefix)
    if model_config is not None:
        import jax

        # Orbax coordinates the array writes across processes itself (every
        # process must call save), but the JSON sidecar is a plain file —
        # host 0 writes it alone to avoid a same-path race on shared storage.
        if jax.process_index() == 0:
            os.makedirs(results_dir, exist_ok=True)
            with open(
                os.path.join(results_dir, f"{prefix}_model.json"), "w"
            ) as f:
                json.dump(dataclasses.asdict(model_config), f, indent=2)
    payload = {
        "generators": [
            {"params": m.state.params, "opt_state": m.state.opt_state}
            for m in pool.members
        ],
        "pool_meta": pool.snapshot(),
        "epoch": epoch,
    }
    if d_state is not None:
        payload["discriminator"] = {
            "params": d_state.params,
            "opt_state": d_state.opt_state,
        }
    if block:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
    else:
        # Periodic mid-training snapshot: arrays are staged to host
        # synchronously inside save(), then written to disk on the
        # background thread while training continues. Serialize against
        # any previous in-flight save first (same directory).
        ckptr = _get_async_checkpointer()
        ckptr.wait_until_finished()
        ckptr.save(path, args=ocp.args.StandardSave(payload), force=True)
    return path


def _ondisk_tree(ckptr: ocp.StandardCheckpointer, path: str):
    """The saved tree's metadata (shapes/dtypes, no array data).

    StandardCheckpointer.metadata returns the item's tree-of-metadata
    (orbax >= 0.5 exposes it directly as a mapping-like pytree)."""
    meta = ckptr.metadata(path)
    return getattr(meta, "item_metadata", meta)


def _ondisk_has_discriminator(tree):
    """The discriminator's metadata subtree if the checkpoint saved one,
    else ``None``."""
    try:
        return tree["discriminator"]
    except (KeyError, TypeError, IndexError):
        return None


def _ondisk_generator_count(tree, default: int) -> int:
    try:
        return len(tree["generators"])
    except (KeyError, TypeError):
        return default


def _ondisk_uses_legacy_remat_names(tree) -> bool:
    """Checkpoints written before the explicit-block-name fix (when
    ``remat=True`` let ``nn.remat``'s auto-naming produce
    ``CheckpointResidualBlock_N`` keys) need a key-rename shim."""
    try:
        return any(
            k.startswith("CheckpointResidualBlock_")
            for k in tree["generators"][0]["params"]
        )
    except (KeyError, TypeError, IndexError, AttributeError):
        return False


def _rename_block_keys(tree, old: str, new: str):
    """Recursively rename dict keys ``{old}<i>`` → ``{new}<i>`` at any
    depth (params and the param-shaped Adam mu/nu trees alike)."""
    if isinstance(tree, dict):
        return {
            (new + k[len(old):] if k.startswith(old) else k):
                _rename_block_keys(v, old, new)
            for k, v in tree.items()
        }
    if isinstance(tree, tuple) and hasattr(tree, "_fields"):
        # namedtuple (e.g. optax ScaleByAdamState)
        return type(tree)(*(_rename_block_keys(v, old, new) for v in tree))
    if isinstance(tree, (list, tuple)):
        return type(tree)(_rename_block_keys(v, old, new) for v in tree)
    return tree


def restore_checkpoint(
    results_dir: str,
    prefix: str,
    *,
    pool: GeneratorPool,
    d_state: Optional[TrainState],
):
    """Restore in place into freshly-initialized states (shape/dtype
    templates). Returns (pool, d_state, epoch).

    Two-phase tolerance (readme.md:14 / ``src/train.py:51-59`` parity): the
    on-disk tree is probed first, so a pixel-phase checkpoint (no
    discriminator saved) restores cleanly into a GAN-phase Trainer — the
    fresh ``d_state`` is kept as-is — and a GAN-phase checkpoint restores
    into a pixel-phase Trainer by reading-and-discarding the saved
    discriminator (the template mirrors the disk structure either way).

    The pool may also RESIZE across phases (the reference cannot: it loads
    ``Training_generator_model_{i}`` per member and crashes when counts
    differ, ``src/train.py:51-59``): growing (e.g. pixel-train 1 generator,
    GAN-fine-tune a 3-pool) warm-starts the extra members as copies of the
    restored leader with fresh optimizer state; shrinking keeps the first N
    saved members (checkpoints are written loss-sorted, so those are the
    best N).
    """
    import jax
    import jax.numpy as jnp

    path = _ckpt_dir(results_dir, prefix)
    ckptr = ocp.StandardCheckpointer()
    disk_tree = _ondisk_tree(ckptr, path)
    d_meta = _ondisk_has_discriminator(disk_tree)
    n_disk = _ondisk_generator_count(disk_tree, len(pool.members))
    # The restore template must mirror the DISK structure: n_disk generator
    # entries (every member shares one architecture, so member 0's structs
    # template any extra on-disk entries) and n_disk pool_meta records.
    gen_template = [
        {"params": m.state.params, "opt_state": m.state.opt_state}
        for m in pool.members[:n_disk]
    ]
    spare = pool.members[0]
    while len(gen_template) < n_disk:
        gen_template.append(
            {
                "params": spare.state.params,
                "opt_state": spare.state.opt_state,
            }
        )
    legacy_remat = _ondisk_uses_legacy_remat_names(disk_tree)
    if legacy_remat:
        # Template must mirror the DISK key names; restored values are
        # renamed back to the canonical ResidualBlock_N below.
        gen_template = _rename_block_keys(
            gen_template, "ResidualBlock_", "CheckpointResidualBlock_"
        )
    meta_template = pool.snapshot()[:1] * n_disk
    template = {
        "generators": gen_template,
        "pool_meta": meta_template,
        "epoch": 0,
    }
    if d_meta is not None:
        if d_state is not None:
            template["discriminator"] = {
                "params": d_state.params,
                "opt_state": d_state.opt_state,
            }
        else:
            # Saved but unwanted (GAN checkpoint, pixel-phase resume):
            # restore into shape-structs built from the on-disk metadata,
            # then drop it.
            template["discriminator"] = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(tuple(m.shape), m.dtype),
                d_meta,
                is_leaf=lambda m: hasattr(m, "shape") and hasattr(m, "dtype"),
            )
    restored = ckptr.restore(path, target=template)
    if legacy_remat:
        restored["generators"] = _rename_block_keys(
            restored["generators"], "CheckpointResidualBlock_",
            "ResidualBlock_"
        )

    for m, g in zip(pool.members, restored["generators"]):
        m.state = m.state.replace(params=g["params"], opt_state=g["opt_state"])
    for m, meta in zip(pool.members, restored["pool_meta"]):
        m.running_loss = float(meta["running_loss"])
        m.pre_loss = float(meta["pre_loss"])
        m.gan_updates = int(meta["gan_updates"])
        m.pixel_updates = int(meta["pixel_updates"])
    if len(pool.members) > n_disk:
        # Pool grew across phases: warm-start the extras as COPIES of the
        # restored leader (fresh Adam state). Copies, not references — the
        # fused steps donate their state buffers, and members sharing
        # buffers would invalidate each other.
        lead_params = pool.members[0].state.params
        for m in pool.members[n_disk:]:
            m.state = m.state.replace(
                params=jax.tree.map(jnp.array, lead_params)
            )
        print(
            f"checkpoint '{prefix}' has {n_disk} generator(s); pool wants "
            f"{len(pool.members)} — extra members warm-started from the "
            "restored leader"
        )
    elif len(pool.members) < n_disk:
        print(
            f"checkpoint '{prefix}' has {n_disk} generators; pool wants "
            f"{len(pool.members)} — keeping the best (first) "
            f"{len(pool.members)} of the loss-sorted snapshot"
        )
    if d_state is not None and "discriminator" in restored:
        d = restored["discriminator"]
        d_state = d_state.replace(params=d["params"], opt_state=d["opt_state"])
    return pool, d_state, int(restored["epoch"])


def load_model_config(results_dir: str, prefix: str) -> Optional[ModelConfig]:
    """Read the architecture sidecar written by :func:`save_checkpoint`."""
    path = os.path.join(results_dir, f"{prefix}_model.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        data = json.load(f)
    # Tolerate sidecars from other versions: drop keys ModelConfig no
    # longer has (e.g. the removed r2 ``scan_blocks`` knob).
    fields = {f.name for f in dataclasses.fields(ModelConfig)}
    return ModelConfig(**{k: v for k, v in data.items() if k in fields})


def restore_generator_params(results_dir: str, prefix: str, index: int = 0):
    """Raw (template-free) restore of one generator's params — the light
    path for inference, no optimizer state or Trainer needed."""
    path = _ckpt_dir(results_dir, prefix)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path)
    params = restored["generators"][index]["params"]
    # legacy pre-explicit-name remat checkpoints (see
    # _ondisk_uses_legacy_remat_names)
    return _rename_block_keys(
        params, "CheckpointResidualBlock_", "ResidualBlock_"
    )


def finetune_entry(cfg: TrainConfig) -> TrainConfig:
    """The two-phase resume transform: LRs ÷ finetune_lr_divisor, prefix →
    "Post-Training" (``src/train.py:51-59``)."""
    import dataclasses

    return dataclasses.replace(
        cfg,
        lr_generator=cfg.lr_generator / cfg.finetune_lr_divisor,
        lr_discriminator=cfg.lr_discriminator / cfg.finetune_lr_divisor,
        run_prefix=FINETUNE_PREFIX,
    )
