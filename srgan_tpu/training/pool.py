"""Multi-generator competitive pool — the reference's headline algorithm.

Spec: ``readme.md:1-17`` (prose) + the surviving helpers
``shuffle_lists_in_same_order`` (``src/utils.py:102-110``) and
``interpolate_models`` (``src/utils.py:113-115``); the loop itself is absent
from the reference snapshot (SURVEY.md §0), so this implements the README
algorithm with the free parameters pinned in :class:`~srgan_tpu.config.PoolConfig`:

  - maintain N generators ordered by running contrastive (pixel) loss,
    ascending (``readme.md:4``);
  - per batch, each generator picks pixel-loss vs GAN-loss update with a
    probability driven by its own loss vs ``pre_loss`` and the two-regime
    ``Starting_GAN_loss`` gate (``readme.md:5,10``):
      * loss > Starting_GAN_loss → mostly pixel, rarely GAN;
      * loss < Starting_GAN_loss → the leader (generator 0, "the main
        information generator", ``readme.md:7``) mostly GAN; others mostly
        pixel while their loss exceeds the current pool minimum;
  - epoch end: re-sort by loss (``readme.md:8``);
  - mutual learning: weak learns from strong via parameter interpolation
    ``param = α·strong + (1-α)·weak``, α=0.2 (``readme.md:13``,
    ``utils.py:113-115``).

TPU-native shape: each generator is an independent :class:`TrainState`
pytree; the per-batch pixel-vs-GAN branch is host-side randomness selecting
one of two *already-compiled* jit steps (SURVEY.md §7(c)) — no trace-time
branching, no recompiles. The mutual-learning lerp is a ``jax.tree.map`` that
XLA fuses into one elementwise kernel over the parameter pytrees.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Sequence

import jax
import numpy as np

from srgan_tpu.config import PoolConfig
from srgan_tpu.training.train_state import TrainState


def interpolate_params(params: Any, target_params: Any, alpha: float = 0.2):
    """``param = alpha*target + (1-alpha)*param`` over whole pytrees
    (reference ``interpolate_models``, ``src/utils.py:113-115``)."""
    return jax.tree.map(
        lambda p, t: alpha * t + (1.0 - alpha) * p, params, target_params
    )


def sort_lists_in_same_order(*lists, reverse: bool = True):
    """Sort N parallel lists by the *last* list's values.

    Faithful port of the reference helper ``shuffle_lists_in_same_order``
    (``src/utils.py:102-110``) — which, despite its name, sorts (descending
    by default). The pool itself uses ascending order per ``readme.md:4``.
    """
    combined = sorted(zip(*lists), key=lambda t: t[-1], reverse=reverse)
    return [list(t) for t in zip(*combined)]


@dataclasses.dataclass
class PoolMember:
    state: TrainState
    # Running (EMA) contrastive/pixel loss — the ordering & gating signal.
    running_loss: float = float("inf")
    # Previous epoch's running loss ("pre_loss", ``readme.md:5``).
    pre_loss: float = float("inf")
    gan_updates: int = 0
    pixel_updates: int = 0


class GeneratorPool:
    """Ordered pool of generator train states with the README scheduler."""

    def __init__(self, members: Sequence[PoolMember], cfg: PoolConfig, seed: int = 0):
        self.members: List[PoolMember] = list(members)
        self.cfg = cfg
        self._rng = np.random.default_rng(seed)
        # The two-regime gate threshold. Explicit config value, or None =
        # auto: calibrated at the first epoch end (see end_epoch); until
        # then every member reads as above-regime (the pixel-mostly phase,
        # exactly the README's early-training behavior).
        self.gan_threshold: float | None = cfg.starting_gan_loss

    @property
    def leader(self) -> PoolMember:
        """Generator 0 — the "main information generator" (``readme.md:7``)."""
        return self.members[0]

    def min_loss(self) -> float:
        return min(m.running_loss for m in self.members)

    def gan_probability(self, index: int) -> float:
        """P(GAN update) for pool member ``index`` this batch — the two-regime
        gate of ``readme.md:10`` with PoolConfig's pinned probabilities.

        ``pre_loss`` (``readme.md:5``): with ``cfg.pre_loss_gate`` the base
        probability is modulated by own-loss vs last epoch's snapshot —
        boosted when improving, damped when regressing (see
        :meth:`_pre_loss_factor`). With the gate off (default) the EMA
        running loss alone drives the regimes: the EMA already compares
        recent batches against the past, which is this implementation's
        default reading of the README's own-loss-vs-pre_loss clause;
        ``pre_loss`` then stays pure telemetry."""
        m = self.members[index]
        if not np.isfinite(m.running_loss):
            return 0.0  # no signal yet → pixel phase
        thr = (
            self.gan_threshold
            if self.gan_threshold is not None
            else float("-inf")  # auto, pre-calibration: above-regime
        )
        if m.running_loss > thr:
            p = self.cfg.p_gan_above
        elif index == 0:
            p = self.cfg.p_gan_leader
        elif m.running_loss > self.min_loss():
            p = self.cfg.p_gan_follower
        else:
            p = self.cfg.p_gan_leader
        return min(1.0, p * self._pre_loss_factor(m.running_loss, m.pre_loss))

    def _pre_loss_factor(self, running_loss: float, pre_loss: float) -> float:
        """The opt-in pre_loss modulation (``readme.md:5``): improved since
        the last epoch snapshot → ``pre_loss_boost``; regressed →
        ``pre_loss_damp``. 1.0 while the gate is off or before the first
        epoch-end snapshot exists. The product is clamped to [0, 1] by the
        caller's Bernoulli draw semantics (probabilities above 1 behave as
        certainty)."""
        if not self.cfg.pre_loss_gate or not np.isfinite(pre_loss):
            return 1.0
        return (
            self.cfg.pre_loss_boost
            if running_loss < pre_loss
            else self.cfg.pre_loss_damp
        )

    def reseed(self, seed) -> None:
        """Re-key the scheduler RNG (after a checkpoint restore, with the
        resume epoch folded in, so the pixel-vs-GAN Bernoulli stream does
        not replay from the start of the run)."""
        self._rng = np.random.default_rng(seed)

    def choose_gan(self, index: int) -> bool:
        """Host-side Bernoulli draw selecting the GAN step for this batch."""
        return bool(self._rng.random() < self.gan_probability(index))

    def record_loss(self, index: int, pixel_loss: float, used_gan: bool):
        m = self.members[index]
        if not np.isfinite(m.running_loss):
            m.running_loss = float(pixel_loss)
        else:
            e = self.cfg.loss_ema
            m.running_loss = e * m.running_loss + (1.0 - e) * float(pixel_loss)
        if used_gan:
            m.gan_updates += 1
        else:
            m.pixel_updates += 1

    def end_epoch(self):
        """Epoch-end re-sort (``readme.md:8``) + weak-learns-from-strong
        mutual learning (``readme.md:13``). First epoch end also calibrates
        an auto gate threshold (``PoolConfig.starting_gan_loss=None``):
        ``gate_auto_frac *`` the median running loss — losses keep falling
        from here, so members cross into the below-regime as they improve
        and the leader-mostly-GAN dynamic (``readme.md:10``) engages at the
        default config (VERDICT r3 weak #2)."""
        self.members.sort(
            key=lambda m: m.running_loss, reverse=not self.cfg.sort_ascending
        )
        if self.cfg.starting_gan_loss is None and self.gan_threshold is None:
            finite = [
                m.running_loss
                for m in self.members
                if np.isfinite(m.running_loss)
            ]
            if finite:
                self.gan_threshold = float(
                    self.cfg.gate_auto_frac * np.median(finite)
                )
        for m in self.members:
            m.pre_loss = m.running_loss
        if self.cfg.mutual_learning and len(self.members) > 1:
            strong = self.members[0].state.params
            strong_ema = self.members[0].state.ema_params
            for m in self.members[1:]:
                # Shadow gets the same weak←strong lerp as the params it
                # averages (ADVICE r4 #2): a stale shadow would otherwise
                # lag the post-lerp trajectory for ~1/(1-decay) steps.
                m.state = m.state.replace(
                    params=interpolate_params(
                        m.state.params, strong, self.cfg.mutual_alpha
                    ),
                    ema_params=(
                        None if m.state.ema_params is None
                        else interpolate_params(
                            m.state.ema_params, strong_ema,
                            self.cfg.mutual_alpha,
                        )
                    ),
                )

    def snapshot(self) -> List[dict]:
        # gan_threshold rides in every record (keeps the list-of-same-
        # struct shape orbax wants); NaN encodes "not yet calibrated" so
        # an auto-gate run resumed before its first end_epoch recalibrates
        # as a fresh run would. Persisting it matters: recalibrating from
        # post-restore (already-converged) losses would pin the gate far
        # below anything the members can reach and silently disable the
        # below-regime dynamic for the rest of a resumed run.
        gate = (
            float(self.gan_threshold)
            if self.gan_threshold is not None
            else float("nan")
        )
        return [
            {
                "running_loss": m.running_loss,
                "pre_loss": m.pre_loss,
                "gan_updates": m.gan_updates,
                "pixel_updates": m.pixel_updates,
                "gan_threshold": gate,
            }
            for m in self.members
        ]
