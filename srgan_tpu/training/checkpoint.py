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


def _ckpt_base(results_dir: str, prefix: str) -> str:
    return os.path.abspath(os.path.join(results_dir, f"{prefix}_ckpt"))


def _committed_ckpt_dirs(results_dir: str, prefix: str) -> list:
    """Committed snapshot dirs for ``prefix``, oldest → newest.

    Snapshots are written to VERSIONED dirs (``{prefix}_ckpt@{epoch}`` or
    ``...@{epoch}.{k}`` when that epoch was snapshotted before) and never
    overwritten in place: orbax's ``force=True`` deletes the existing dir
    at save-START, so a hard kill during the (minutes-long, background)
    write would leave NO restorable checkpoint — exactly the window
    ``checkpoint_every`` preemption safety exists to close. Old snapshots
    are garbage-collected only AFTER a newer one has committed (orbax
    commits via atomic rename, so a directory bearing its final name is
    complete). The unversioned ``{prefix}_ckpt`` name written by earlier
    builds is still recognized, ordered before any versioned snapshot."""
    base = f"{prefix}_ckpt"
    out = []
    if not os.path.isdir(results_dir):
        return out
    for name in os.listdir(results_dir):
        if not name.startswith(base) or ".orbax-checkpoint-tmp" in name:
            continue
        if name == base:
            key = (-1, -1)  # legacy fixed-name checkpoint: oldest
        elif name.startswith(base + "@"):
            epoch_s, _, k_s = name[len(base) + 1:].partition(".")
            try:
                key = (int(epoch_s), int(k_s or 0))
            except ValueError:
                continue
        else:
            continue  # e.g. a different prefix sharing the stem
        out.append((key, os.path.join(results_dir, name)))
    return [os.path.abspath(p) for _, p in sorted(out)]


def latest_ckpt_dir(results_dir: str, prefix: str) -> Optional[str]:
    """Newest committed snapshot dir for ``prefix`` (None if no snapshot
    exists). The path existence probe for resume/eval/inference surfaces."""
    dirs = _committed_ckpt_dirs(results_dir, prefix)
    return dirs[-1] if dirs else None


def _next_ckpt_dir(results_dir: str, prefix: str, epoch: int) -> str:
    """A fresh (non-existing) versioned dir name for this snapshot.

    Multi-process: host 0 alone probes the shared filesystem and
    BROADCASTS its choice — every host must save into the same dir, and
    independent existence probes could race host 0's garbage collection of
    an old same-epoch snapshot (one host seeing it pre-delete, another
    post-delete, would split the collective orbax save across two paths
    and deadlock it). The broadcast is itself a collective all hosts enter
    at this same logical point."""
    import jax

    base = _ckpt_base(results_dir, prefix)

    def probe() -> int:
        # One past the HIGHEST slot ever used for this epoch — never the
        # first free hole: GC frees LOW slots while a higher one can still
        # hold an OLDER snapshot (e.g. @7 deleted after @7.1 committed), and
        # re-filling the hole would make the new snapshot sort — and every
        # later restore read — BELOW that older state. In-flight orbax tmp
        # dirs count as occupied so a new save never claims the final name
        # of a write still in progress.
        name0 = os.path.basename(base) + f"@{epoch}"
        try:
            names = os.listdir(os.path.dirname(base))
        except FileNotFoundError:
            return 0
        ks = []
        for name in names:
            if not name.startswith(name0):
                continue
            rest = name[len(name0):]  # "" | ".k" | tmp-suffixed either
            if rest == "" or rest.startswith(".orbax-checkpoint-tmp"):
                ks.append(0)
            elif rest.startswith("."):
                k_s = rest[1:].split(".", 1)[0]
                if k_s.isdigit():
                    ks.append(int(k_s))
        return max(ks) + 1 if ks else 0

    if jax.process_count() > 1:
        import numpy as np
        from jax.experimental import multihost_utils

        k = probe() if jax.process_index() == 0 else 0
        k = int(multihost_utils.broadcast_one_to_all(np.int32(k)))
    else:
        k = probe()
    return f"{base}@{epoch}" + (f".{k}" if k else "")


def _gc_old_ckpts(results_dir: str, prefix: str, keep: str) -> None:
    """Delete committed snapshots other than ``keep`` (host 0 only — the
    results_dir is shared storage on multi-host runs)."""
    import shutil

    import jax

    if jax.process_index() != 0:
        return
    keep = os.path.abspath(keep)
    for path in _committed_ckpt_dirs(results_dir, prefix):
        if path != keep:
            shutil.rmtree(path, ignore_errors=True)


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
    ``src/evaluation.py:23``).

    Crash safety: each snapshot goes to a fresh versioned dir and prior
    snapshots are deleted only after a newer one committed (see
    ``_committed_ckpt_dirs``) — at every instant at least one complete
    checkpoint exists on disk, whatever signal arrives mid-write."""
    # Settle any in-flight async snapshot BEFORE picking the new dir name
    # (its commit must be visible) and before a blocking writer could race
    # it. Folding the wait in here, rather than trusting every call site
    # to remember it, also closes the two-concurrent-writers hazard.
    wait_for_checkpoints()
    path = _next_ckpt_dir(results_dir, prefix, epoch)
    prev = latest_ckpt_dir(results_dir, prefix)
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
            (
                {"params": m.state.params, "opt_state": m.state.opt_state}
                if m.state.ema_params is None
                else {"params": m.state.params,
                      "opt_state": m.state.opt_state,
                      "ema_params": m.state.ema_params}
            )
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
        ckptr.save(path, payload)
        ckptr.wait_until_finished()
        # Committed: older snapshots are now redundant.
        _gc_old_ckpts(results_dir, prefix, keep=path)
    else:
        # Periodic mid-training snapshot: arrays are staged to host
        # synchronously inside save(), then written to disk on the
        # background thread while training continues. The PREVIOUS
        # committed snapshot (``prev``) is garbage-collected now — it is
        # older than the one whose commit wait_for_checkpoints() just
        # confirmed — while that newest committed one survives until this
        # in-flight save commits in its turn.
        if prev is not None:
            _gc_old_ckpts(results_dir, prefix, keep=prev)
        ckptr = _get_async_checkpointer()
        ckptr.save(path, args=ocp.args.StandardSave(payload))
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


def _ondisk_has_ema(tree) -> bool:
    """Whether the snapshot saved EMA shadows (runs with
    ``TrainConfig.ema_decay > 0``; absent otherwise, so old checkpoints
    restore unchanged)."""
    try:
        return "ema_params" in tree["generators"][0]
    except (KeyError, TypeError, IndexError):
        return False


def _ondisk_meta_has_gate(tree) -> bool:
    """Whether the snapshot's pool_meta records carry the auto-calibrated
    ``gan_threshold`` (absent in pre-r4 checkpoints, which restore
    unchanged and recalibrate at the next epoch end)."""
    try:
        return "gan_threshold" in tree["pool_meta"][0]
    except (KeyError, TypeError, IndexError):
        return False


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

    path = latest_ckpt_dir(results_dir, prefix)
    if path is None:
        raise FileNotFoundError(
            f"no committed checkpoint for prefix '{prefix}' in "
            f"{results_dir} (looked for {prefix}_ckpt[@epoch] dirs)"
        )
    ckptr = ocp.StandardCheckpointer()
    disk_tree = _ondisk_tree(ckptr, path)
    d_meta = _ondisk_has_discriminator(disk_tree)
    n_disk = _ondisk_generator_count(disk_tree, len(pool.members))
    # The restore template must mirror the DISK structure: n_disk generator
    # entries (every member shares one architecture, so member 0's structs
    # template any extra on-disk entries) and n_disk pool_meta records.
    disk_has_ema = _ondisk_has_ema(disk_tree)

    def _gen_entry(state):
        entry = {"params": state.params, "opt_state": state.opt_state}
        if disk_has_ema:
            # Mirror the on-disk EMA shadow: restore into the trainer's own
            # shadow when it keeps one, else into a params-shaped template
            # (read-and-discarded below — an EMA checkpoint restores cleanly
            # into a non-EMA run, like the discriminator across phases).
            entry["ema_params"] = (
                state.ema_params if state.ema_params is not None
                else state.params
            )
        return entry

    gen_template = [_gen_entry(m.state) for m in pool.members[:n_disk]]
    spare = pool.members[0]
    while len(gen_template) < n_disk:
        gen_template.append(_gen_entry(spare.state))
    legacy_remat = _ondisk_uses_legacy_remat_names(disk_tree)
    if legacy_remat:
        # Template must mirror the DISK key names; restored values are
        # renamed back to the canonical ResidualBlock_N below.
        gen_template = _rename_block_keys(
            gen_template, "ResidualBlock_", "CheckpointResidualBlock_"
        )
    meta_template = pool.snapshot()[:1] * n_disk
    if not _ondisk_meta_has_gate(disk_tree):
        # Pre-r4 snapshot: its meta records have no gan_threshold — the
        # template must mirror the DISK structure exactly.
        meta_template = [
            {k: v for k, v in rec.items() if k != "gan_threshold"}
            for rec in meta_template
        ]
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

    ema_warm_started = False
    for m, g in zip(pool.members, restored["generators"]):
        if m.state.ema_params is None:
            ema = None  # non-EMA run: saved shadow (if any) read-and-dropped
        elif "ema_params" in g:
            ema = g["ema_params"]
        else:
            # EMA run resuming a pre-EMA snapshot: warm-start the shadow
            # from the restored params (same rule as TrainState.create).
            ema = jax.tree.map(jnp.array, g["params"])
            ema_warm_started = True
        m.state = m.state.replace(
            params=g["params"], opt_state=g["opt_state"], ema_params=ema
        )
    if ema_warm_started:
        print(
            f"checkpoint '{prefix}' has no EMA shadows; warm-starting them "
            "from the restored params"
        )
    for m, meta in zip(pool.members, restored["pool_meta"]):
        m.running_loss = float(meta["running_loss"])
        m.pre_loss = float(meta["pre_loss"])
        m.gan_updates = int(meta["gan_updates"])
        m.pixel_updates = int(meta["pixel_updates"])
    gate = restored["pool_meta"][0].get("gan_threshold")
    if gate is not None and pool.cfg.starting_gan_loss is None:
        import math

        # Auto-gate mode only (an explicit --starting-gan-loss always
        # wins). NaN = the saved run had not calibrated yet; a finite
        # value restores so --resume continues under the SAME regime
        # schedule as the uninterrupted run — recalibrating from restored
        # (already-converged) losses would pin the gate far below
        # anything the members reach and silently disable the
        # below-regime dynamic.
        if math.isfinite(float(gate)):
            pool.gan_threshold = float(gate)
    if len(pool.members) > n_disk:
        # Pool grew across phases: warm-start the extras as COPIES of the
        # restored leader (fresh Adam state). Copies, not references — the
        # fused steps donate their state buffers, and members sharing
        # buffers would invalidate each other.
        lead = pool.members[0].state
        for m in pool.members[n_disk:]:
            m.state = m.state.replace(
                params=jax.tree.map(jnp.array, lead.params),
                ema_params=(
                    None if m.state.ema_params is None
                    else jax.tree.map(
                        jnp.array, lead.ema_params
                        if lead.ema_params is not None else lead.params
                    )
                ),
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


def restore_generator_params(
    results_dir: str, prefix: str, index: int = 0, *, ema: bool = False
):
    """Raw (template-free) restore of one generator's params — the light
    path for inference, no optimizer state or Trainer needed.
    ``ema=True`` reads the EMA shadow instead (see
    :func:`restore_all_generator_params`)."""
    return restore_all_generator_params(results_dir, prefix, ema=ema)[index]


def restore_all_generator_params(
    results_dir: str, prefix: str, *, ema: bool = False
) -> list:
    """Every pool member's params (loss-sorted, leader first — the order
    snapshots are written in). Feeds ensemble inference
    (``Upscaler.from_checkpoint(..., ensemble=True)``): the pool's extra
    members are otherwise dead weight at serving time.

    ``ema=True`` serves the Polyak-averaged shadows instead of the raw
    training params (runs trained with ``--ema-decay``); raises with a
    clear message when the snapshot carries none."""
    path = latest_ckpt_dir(results_dir, prefix)
    if path is None:
        raise FileNotFoundError(
            f"no committed checkpoint for prefix '{prefix}' in {results_dir}"
        )
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path)
    key = "ema_params" if ema else "params"
    if ema and "ema_params" not in restored["generators"][0]:
        raise KeyError(
            f"checkpoint '{prefix}' in {results_dir} has no EMA shadows "
            "(run was trained without --ema-decay); drop --ema or retrain"
        )
    # legacy pre-explicit-name remat checkpoints (see
    # _ondisk_uses_legacy_remat_names)
    return [
        _rename_block_keys(
            g[key], "CheckpointResidualBlock_", "ResidualBlock_"
        )
        for g in restored["generators"]
    ]


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
