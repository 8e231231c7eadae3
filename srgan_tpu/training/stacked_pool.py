"""vmap-stacked generator pool: the TPU-idiomatic execution of the
multi-generator algorithm.

The reference's pool is a Python list of models trained sequentially per
batch (``readme.md:4``). On TPU, N small (1.5M-param) generators are far
better executed as ONE vmapped program over a leading pool axis (SURVEY.md
§2, expert-parallel row: "per-generator TrainStates, optionally
vmap-stacked"): a single fused executable updates all N members on the same
batch — N× the MXU work per dispatch, no per-member launch latency, and the
epoch-end bookkeeping (re-sort, mutual learning) becomes gathers/lerps over
the leading axis.

Semantics preserved relative to :mod:`srgan_tpu.training.pool`:
  - each member still trains on every batch (the reference trains members
    sequentially on the same batch; with independent Adam states the result
    is order-independent, so the parallel update is equivalent);
  - running-loss EMA, ascending re-sort, and weak←strong interpolation
    follow the same config knobs;
  - the per-member pixel-vs-GAN choice is a (N,) float mask sampled on the
    host per batch and applied inside the step (``jnp.where`` on the loss
    terms) — all members stay in the one compiled program either way.
"""

from __future__ import annotations

from typing import Any, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

from srgan_tpu.config import PoolConfig
from srgan_tpu.ops.gan_loss import (
    discriminator_loss,
    generator_adversarial_loss,
)
from srgan_tpu.ops.recon_loss import (
    edge_importance_map,
    pallas_loss_supported,
    reconstruction_loss,
    reconstruction_loss_with_edges,
)
from srgan_tpu.training.steps import pack_metrics, perceptual_term
from srgan_tpu.training.train_state import TrainState


def stack_states(states) -> TrainState:
    """List of per-member TrainStates → one TrainState with a leading pool
    axis on every array leaf. Static fields (apply_fn, tx) are taken from
    the first member — every member must share the architecture. The Adam
    ``count`` becomes an (N,) vector; updates run under vmap (see
    :func:`stacked_pool_step`) so per-member bias correction stays exact."""
    params = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[s.params for s in states]
    )
    opt_state = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[s.opt_state for s in states]
    )
    ema = None
    if states[0].ema_params is not None:
        ema = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[s.ema_params for s in states]
        )
    return states[0].replace(
        params=params, opt_state=opt_state, ema_params=ema
    )


def unstack_states(stacked: TrainState, n: int):
    return [
        stacked.replace(
            params=jax.tree.map(lambda x: x[i], stacked.params),
            opt_state=jax.tree.map(lambda x: x[i], stacked.opt_state),
            ema_params=(
                None if stacked.ema_params is None
                else jax.tree.map(lambda x: x[i], stacked.ema_params)
            ),
        )
        for i in range(n)
    ]


def _stacked_loss_fn(stacked_params, apply_fn, d_apply_fn, d_params,
                     hr, lr_imgs, gan_mask,
                     vgg_apply_fn=None, vgg_params=None, p_weight=0.0):
    """Sum over members of the per-member objective; grads decouple because
    each member's params only touch its own term. The HR edge map is shared
    across all members (it depends on HR only) and computed ONCE outside the
    member vmap — the Sobel/normalize pass runs 1x instead of N x; the
    VGG features of HR (perceptual loss, when enabled) share the same trick.
    (The scalar-output Pallas loss kernel cannot run here: its HBM-space
    inputs don't batch under Pallas auto-vmap.)"""
    edges = jax.lax.stop_gradient(edge_importance_map(hr))
    f_real = None
    if vgg_apply_fn is not None:
        f_real = jax.lax.stop_gradient(
            vgg_apply_fn({"params": vgg_params}, hr)
        )

    def one(params, mask):
        sr = apply_fn({"params": params}, lr_imgs)
        com, tv = reconstruction_loss_with_edges(hr, sr, edges)
        if d_apply_fn is not None:
            fake = d_apply_fn({"params": d_params}, sr)
            real = jax.lax.stop_gradient(d_apply_fn({"params": d_params}, hr))
            g_d = generator_adversarial_loss(real, fake)
        else:
            g_d = jnp.zeros(())
        p = jnp.zeros(())
        if f_real is not None:
            p = perceptual_term(sr, f_real, vgg_apply_fn, vgg_params)
        loss = com + tv + mask * g_d + p_weight * p
        return loss, (com, tv, g_d, p, jax.lax.stop_gradient(sr))

    losses, aux = jax.vmap(one)(stacked_params, gan_mask)
    # sum (not mean): keeps each member's gradient identical to its solo
    # update (d sum / d member_i = d member_i's loss).
    return jnp.sum(losses), aux


@functools.partial(
    jax.jit,
    donate_argnums=(0,),
    static_argnames=("apply_fn", "d_apply_fn", "vgg_apply_fn", "return_sr"),
)
def stacked_pool_step(
    stacked_state: TrainState,
    apply_fn,
    d_apply_fn,
    d_params: Any,
    hr: jax.Array,
    lr_imgs: jax.Array,
    gan_mask: jax.Array,
    lr: jax.Array,
    vgg_apply_fn=None,
    vgg_params: Any = None,
    p_weight: float = 0.0,
    d_target_idx: jax.Array | int = 0,
    return_sr: bool = False,
) -> Tuple[TrainState, dict]:
    """One fused update of ALL pool members on one batch.

    ``gan_mask``: (N,) float — 1.0 where the member takes the adversarial
    term this batch (host-sampled Bernoulli per the Starting_GAN_loss gate).
    ``vgg_apply_fn``/``vgg_params``/``p_weight``: optional frozen VGG
    perceptual term, added to every member's objective when set.
    ``return_sr=True`` adds ``metrics["sr"]`` — member ``d_target_idx``'s
    SR output (stop-gradient, pre-update params), already computed inside
    the step — so the discriminator update can consume it without paying a
    second generator forward (``training/loop.py`` feeds it to
    :func:`srgan_tpu.training.steps.discriminator_step_on_sr`).
    """
    grad_fn = jax.grad(_stacked_loss_fn, has_aux=True)
    grads, (com, tv, g_d, p, srs) = grad_fn(
        stacked_state.params, apply_fn, d_apply_fn, d_params,
        hr, lr_imgs, gan_mask, vgg_apply_fn, vgg_params, p_weight,
    )

    # Per-member Adam under vmap: each slice sees its own scalar `count`.
    def member_update(g, o, p):
        updates, new_o = stacked_state.tx.update(g, o, p)
        new_p = jax.tree.map(lambda pp, u: pp - lr * u, p, updates)
        return new_p, new_o

    new_params, new_opt = jax.vmap(member_update)(
        grads, stacked_state.opt_state, stacked_state.params
    )
    new_state = stacked_state.replace(
        params=new_params, opt_state=new_opt
    ).update_ema()
    metrics = {"com_loss": com, "tv_loss": tv, "g_d_loss": g_d, "p_loss": p,
               "g_loss": com + tv + gan_mask * g_d + p_weight * p}
    metrics["packed"] = pack_metrics(metrics)  # (5, N): one drain fetch
    if return_sr:
        metrics["sr"] = jnp.take(srs, d_target_idx, axis=0)
    return new_state, metrics


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1),
    static_argnames=("apply_fn", "d_apply_fn", "vgg_apply_fn"),
)
def stacked_pool_gan_step(
    stacked_state: TrainState,
    d_state: TrainState,
    apply_fn,
    d_apply_fn,
    hr: jax.Array,
    lr_imgs: jax.Array,
    gan_mask: jax.Array,
    g_lr: jax.Array,
    d_lr: jax.Array,
    vgg_apply_fn=None,
    vgg_params: Any = None,
    p_weight: float = 0.0,
    d_target_idx: jax.Array | int = 0,
) -> Tuple[TrainState, TrainState, dict]:
    """Pool update + discriminator update fused into ONE executable.

    The GAN-phase batch work — N generator forwards/backwards, the shared
    edge map, the adversarial terms, and the discriminator's own update on
    the ``d_target_idx`` member's SR — compiles to a single XLA program:
    one dispatch per batch, no SR round-trip through an output buffer, and
    the scheduler is free to overlap D's backward with the tail of the pool
    backward. Semantics are "simultaneous" GAN updates: the generators read
    ``d_state`` pre-update, and D trains against the generators' pre-update
    SR — the same pairing the two-dispatch path
    (:func:`stacked_pool_step` + ``discriminator_step_on_sr``) produces.
    """
    grad_fn = jax.grad(_stacked_loss_fn, has_aux=True)
    grads, (com, tv, g_d, p, srs) = grad_fn(
        stacked_state.params, apply_fn, d_apply_fn, d_state.params,
        hr, lr_imgs, gan_mask, vgg_apply_fn, vgg_params, p_weight,
    )

    def member_update(g, o, pp):
        updates, new_o = stacked_state.tx.update(g, o, pp)
        new_p = jax.tree.map(lambda q, u: q - g_lr * u, pp, updates)
        return new_p, new_o

    new_params, new_opt = jax.vmap(member_update)(
        grads, stacked_state.opt_state, stacked_state.params
    )
    new_g_state = stacked_state.replace(
        params=new_params, opt_state=new_opt
    ).update_ema()

    sr_d = jnp.take(srs, d_target_idx, axis=0)

    def d_loss_fn(d_params):
        real_preds = d_apply_fn({"params": d_params}, hr)
        fake_preds = d_apply_fn({"params": d_params}, sr_d)
        return discriminator_loss(real_preds, fake_preds)

    d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
    new_d_state = d_state.apply_gradients(d_grads, d_lr)

    metrics = {"com_loss": com, "tv_loss": tv, "g_d_loss": g_d, "p_loss": p,
               "g_loss": com + tv + gan_mask * g_d + p_weight * p,
               "d_loss": d_loss}
    # flat (5*N + 1,) vector, d_loss last: one drain fetch per batch
    metrics["packed"] = pack_metrics(metrics, d_loss)
    return new_g_state, new_d_state, metrics


def _scan_member_grad_fn(apply_fn, d_apply_fn, d_params, hr, lr_imgs,
                         vgg_apply_fn, vgg_params, p_weight, use_pallas,
                         edges, f_real, d_real):
    """Per-member objective gradient for the scanned executor.

    Unlike the vmapped ``_stacked_loss_fn``, each member's loss lives in its
    own scan iteration, so the fused Pallas loss kernel CAN run here (its
    HBM-space inputs don't batch under vmap — see ``_stacked_loss_fn``) and
    is selected whenever the shape supports it; otherwise the shared
    precomputed ``edges`` path is used, as in the vmapped step.
    ``d_real`` (D's predictions on HR) is likewise member-independent and
    precomputed by the caller: inside the scan body XLA cannot CSE it
    across iterations, so inlining it would re-run the full D-on-HR
    forward N times per batch."""

    def loss_fn(params, mask):
        sr = apply_fn({"params": params}, lr_imgs)
        if use_pallas:
            com, tv = reconstruction_loss(hr, sr, use_pallas=True)
        else:
            com, tv = reconstruction_loss_with_edges(hr, sr, edges)
        if d_apply_fn is not None:
            fake = d_apply_fn({"params": d_params}, sr)
            g_d = generator_adversarial_loss(d_real, fake)
        else:
            g_d = jnp.zeros(())
        p = jnp.zeros(())
        if f_real is not None:
            p = perceptual_term(sr, f_real, vgg_apply_fn, vgg_params)
        loss = com + tv + mask * g_d + p_weight * p
        return loss, (com, tv, g_d, p, jax.lax.stop_gradient(sr))

    return jax.grad(loss_fn, has_aux=True)


def _scan_pool_update(stacked_state, apply_fn, d_apply_fn, d_params, hr,
                      lr_imgs, gan_mask, g_lr, vgg_apply_fn, vgg_params,
                      p_weight, d_target_idx):
    """Core of the scanned executor: ``lax.scan`` over the pool axis.

    Memory is the reason this exists. The vmapped step differentiates the
    SUM of all members' losses, so the combined N-member forward is one
    differentiated region and all N members' activations are live at the
    backward — at flagship shapes the 3-member GAN program needs ``--remat``
    and batch 12 to fit v5e HBM (PARITY.md). Here each iteration computes
    its own member's grad AND applies Adam *inside the scan body*: nothing
    is differentiated across iterations, so peak activation memory is ONE
    member's — no remat, full batch. (This is NOT the removed
    ``scan_blocks`` formulation, which scanned *inside* one differentiated
    forward and therefore kept every carry live for the backward.)

    Returns ``(new_params, new_opt, (com, tv, g_d, p), sr_selected)`` where
    each loss is (N,) and ``sr_selected`` is member ``d_target_idx``'s
    pre-update SR (carried via select — only one SR buffer stays live).
    """
    use_pallas = (
        jax.default_backend() == "tpu" and pallas_loss_supported(hr.shape)
    )
    edges = None
    if not use_pallas:
        edges = jax.lax.stop_gradient(edge_importance_map(hr))
    f_real = None
    if vgg_apply_fn is not None:
        f_real = jax.lax.stop_gradient(
            vgg_apply_fn({"params": vgg_params}, hr)
        )
    d_real = None
    if d_apply_fn is not None:
        # D(hr) is constant across members — hoisted out of the scan like
        # edges/f_real (XLA can't CSE across the scan's loop boundary).
        d_real = jax.lax.stop_gradient(d_apply_fn({"params": d_params}, hr))
    grad_one = _scan_member_grad_fn(
        apply_fn, d_apply_fn, d_params, hr, lr_imgs,
        vgg_apply_fn, vgg_params, p_weight, use_pallas, edges, f_real,
        d_real,
    )

    n = gan_mask.shape[0]
    sr_sd = jax.eval_shape(
        lambda p: apply_fn({"params": p}, lr_imgs),
        jax.tree.map(lambda x: x[0], stacked_state.params),
    )

    def body(sr_keep, xs):
        i, params_i, opt_i, mask_i = xs
        g, (com, tv, g_d, p, sr) = grad_one(params_i, mask_i)
        updates, new_o = stacked_state.tx.update(g, opt_i, params_i)
        new_p = jax.tree.map(lambda q, u: q - g_lr * u, params_i, updates)
        sr_keep = jnp.where(i == d_target_idx, sr, sr_keep)
        return sr_keep, (new_p, new_o, jnp.stack([com, tv, g_d, p]))

    sr_sel, (new_params, new_opt, losses) = jax.lax.scan(
        body,
        jnp.zeros(sr_sd.shape, sr_sd.dtype),
        (jnp.arange(n, dtype=jnp.int32), stacked_state.params,
         stacked_state.opt_state, gan_mask),
    )
    com, tv, g_d, p = losses.T  # (N, 4) -> 4x (N,)
    return new_params, new_opt, (com, tv, g_d, p), sr_sel


@functools.partial(
    jax.jit,
    donate_argnums=(0,),
    static_argnames=("apply_fn", "d_apply_fn", "vgg_apply_fn", "return_sr"),
)
def scanned_pool_step(
    stacked_state: TrainState,
    apply_fn,
    d_apply_fn,
    d_params: Any,
    hr: jax.Array,
    lr_imgs: jax.Array,
    gan_mask: jax.Array,
    lr: jax.Array,
    vgg_apply_fn=None,
    vgg_params: Any = None,
    p_weight: float = 0.0,
    d_target_idx: jax.Array | int = 0,
    return_sr: bool = False,
) -> Tuple[TrainState, dict]:
    """Drop-in scanned twin of :func:`stacked_pool_step` — same signature,
    same metric structure, sequential member execution with 1x activation
    memory (``PoolConfig.member_exec="scan"``)."""
    new_params, new_opt, (com, tv, g_d, p), sr_sel = _scan_pool_update(
        stacked_state, apply_fn, d_apply_fn, d_params, hr, lr_imgs,
        gan_mask, lr, vgg_apply_fn, vgg_params, p_weight, d_target_idx,
    )
    new_state = stacked_state.replace(
        params=new_params, opt_state=new_opt
    ).update_ema()
    metrics = {"com_loss": com, "tv_loss": tv, "g_d_loss": g_d, "p_loss": p,
               "g_loss": com + tv + gan_mask * g_d + p_weight * p}
    metrics["packed"] = pack_metrics(metrics)
    if return_sr:
        metrics["sr"] = sr_sel
    return new_state, metrics


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1),
    static_argnames=("apply_fn", "d_apply_fn", "vgg_apply_fn"),
)
def scanned_pool_gan_step(
    stacked_state: TrainState,
    d_state: TrainState,
    apply_fn,
    d_apply_fn,
    hr: jax.Array,
    lr_imgs: jax.Array,
    gan_mask: jax.Array,
    g_lr: jax.Array,
    d_lr: jax.Array,
    vgg_apply_fn=None,
    vgg_params: Any = None,
    p_weight: float = 0.0,
    d_target_idx: jax.Array | int = 0,
) -> Tuple[TrainState, TrainState, dict]:
    """Drop-in scanned twin of :func:`stacked_pool_gan_step`: N member
    updates run sequentially under ``lax.scan`` (1x activation memory), the
    shared D update on the selected member's pre-update SR is fused into the
    same executable, and the pairing semantics ("simultaneous": G reads
    pre-update D, D trains on pre-update SR) are identical to the vmapped
    step."""
    new_params, new_opt, (com, tv, g_d, p), sr_d = _scan_pool_update(
        stacked_state, apply_fn, d_apply_fn, d_state.params, hr, lr_imgs,
        gan_mask, g_lr, vgg_apply_fn, vgg_params, p_weight, d_target_idx,
    )
    new_g_state = stacked_state.replace(
        params=new_params, opt_state=new_opt
    ).update_ema()

    def d_loss_fn(d_params):
        real_preds = d_apply_fn({"params": d_params}, hr)
        fake_preds = d_apply_fn({"params": d_params}, sr_d)
        return discriminator_loss(real_preds, fake_preds)

    d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
    new_d_state = d_state.apply_gradients(d_grads, d_lr)

    metrics = {"com_loss": com, "tv_loss": tv, "g_d_loss": g_d, "p_loss": p,
               "g_loss": com + tv + gan_mask * g_d + p_weight * p,
               "d_loss": d_loss}
    metrics["packed"] = pack_metrics(metrics, d_loss)
    return new_g_state, new_d_state, metrics


@jax.jit
def permute_members(stacked_state: TrainState, perm: jax.Array) -> TrainState:
    """Epoch-end re-sort: gather every leaf along the pool axis.

    Scalar leaves pass through unchanged — the state carries ``ema_decay``
    as a 0-dim traced leaf shared by all members (stack_states keeps the
    first member's value), which has no pool axis to gather."""
    return jax.tree.map(
        lambda x: x[perm] if jnp.ndim(x) else x, stacked_state
    )


@functools.partial(jax.jit, static_argnames=("alpha",))
def mutual_learning_lerp(
    stacked_params, alpha: float = 0.2
) -> Any:
    """Weak-learns-from-strong on the stacked axis: every non-leader member
    moves toward member 0 (``interpolate_models`` semantics,
    ``src/utils.py:113-115``), in one fused elementwise kernel."""

    def lerp(x):
        leader = x[0:1]
        followers = alpha * leader + (1.0 - alpha) * x[1:]
        return jnp.concatenate([leader, followers], axis=0)

    return jax.tree.map(lerp, stacked_params)


class StackedGeneratorPool:
    """Driver-side bookkeeping around the stacked train state. Mirrors the
    :class:`~srgan_tpu.training.pool.GeneratorPool` scheduler exactly, with
    device-side execution of the member updates."""

    def __init__(
        self,
        stacked_state: TrainState,
        n: int,
        cfg: PoolConfig,
        seed=0,  # any numpy SeedSequence entropy (int or tuple of ints)
    ):
        self.state = stacked_state
        self.n = n
        self.cfg = cfg
        self._rng = np.random.default_rng(seed)
        self.running_loss = np.full(n, np.inf)
        self.pre_loss = np.full(n, np.inf)
        self.gan_updates = np.zeros(n, np.int64)
        self.pixel_updates = np.zeros(n, np.int64)
        # Gate threshold: explicit config value, or None = auto-calibrated
        # at the first epoch end (same rule as GeneratorPool.end_epoch).
        self.gan_threshold: float | None = cfg.starting_gan_loss

    @classmethod
    def create(cls, states, cfg: PoolConfig, seed=0):
        return cls(stack_states(states), len(states), cfg, seed)

    # -- scheduler (same regimes as GeneratorPool.gan_probability) -------- #

    def gan_probabilities(self) -> np.ndarray:
        """Per-member P(GAN) — same regimes (and same opt-in pre_loss
        modulation, ``readme.md:5``) as ``GeneratorPool.gan_probability``;
        see that docstring for the pre_loss interpretation note."""
        p = np.zeros(self.n)
        finite = np.isfinite(self.running_loss)
        if not finite.any():
            return p
        min_loss = self.running_loss[finite].min()
        thr = (
            self.gan_threshold
            if self.gan_threshold is not None
            else float("-inf")  # auto, pre-calibration: above-regime
        )
        for i in range(self.n):
            if not finite[i]:
                continue
            if self.running_loss[i] > thr:
                p[i] = self.cfg.p_gan_above
            elif i == 0:
                p[i] = self.cfg.p_gan_leader
            elif self.running_loss[i] > min_loss:
                p[i] = self.cfg.p_gan_follower
            else:
                p[i] = self.cfg.p_gan_leader
        if self.cfg.pre_loss_gate:
            has_snap = np.isfinite(self.pre_loss)
            factor = np.where(
                self.running_loss < self.pre_loss,
                self.cfg.pre_loss_boost,
                self.cfg.pre_loss_damp,
            )
            p = np.where(has_snap, np.minimum(1.0, p * factor), p)
        return p

    def sample_gan_mask(self, use_gan: bool) -> np.ndarray:
        if not use_gan:
            # pixel-only phase still counts as a pixel update per member —
            # GeneratorPool.record_loss(…, used_gan=False) does, and the
            # two representations' snapshots must agree (they round-trip
            # through checkpoints via _sync_pool_from_stacked).
            self.pixel_updates += 1
            return np.zeros(self.n, np.float32)
        probs = self.gan_probabilities()
        mask = (self._rng.random(self.n) < probs).astype(np.float32)
        self.gan_updates += mask.astype(np.int64)
        self.pixel_updates += (1 - mask).astype(np.int64)
        return mask

    def record_losses(self, com_losses: np.ndarray):
        e = self.cfg.loss_ema
        fresh = ~np.isfinite(self.running_loss)
        self.running_loss = np.where(
            fresh, com_losses, e * self.running_loss + (1 - e) * com_losses
        )

    def end_epoch(self):
        order = np.argsort(self.running_loss)
        if not self.cfg.sort_ascending:
            order = order[::-1]
        if not np.array_equal(order, np.arange(self.n)):
            self.state = permute_members(self.state, jnp.asarray(order))
            self.running_loss = self.running_loss[order]
            self.gan_updates = self.gan_updates[order]
            self.pixel_updates = self.pixel_updates[order]
        if self.cfg.starting_gan_loss is None and self.gan_threshold is None:
            finite = self.running_loss[np.isfinite(self.running_loss)]
            if finite.size:
                self.gan_threshold = float(
                    self.cfg.gate_auto_frac * np.median(finite)
                )
        self.pre_loss = self.running_loss.copy()
        if self.cfg.mutual_learning and self.n > 1:
            # The EMA shadow gets the SAME lerp: it averages the params'
            # trajectory, and when that trajectory jumps toward the leader
            # an un-lerped shadow would spend ~1/(1-decay) steps averaging
            # a stale pre-lerp path (ADVICE r4 #2).
            self.state = self.state.replace(
                params=mutual_learning_lerp(
                    self.state.params, self.cfg.mutual_alpha
                ),
                ema_params=(
                    None if self.state.ema_params is None
                    else mutual_learning_lerp(
                        self.state.ema_params, self.cfg.mutual_alpha
                    )
                ),
            )

    def leader_params(self, *, serve: bool = False):
        """Member 0's params; ``serve=True`` prefers the EMA shadow when
        the pool trains one (eval/validation/serving read the averaged
        weights — ``TrainState.serve_params`` semantics)."""
        src = self.state.serve_params if serve else self.state.params
        return jax.tree.map(lambda x: x[0], src)

    def member_params(self, i: int, *, serve: bool = False):
        src = self.state.serve_params if serve else self.state.params
        return jax.tree.map(lambda x: x[i], src)

    def snapshot(self):
        # Same record shape as GeneratorPool.snapshot (NaN = auto gate not
        # yet calibrated) — snapshots from either representation restore
        # into either.
        gate = (
            float(self.gan_threshold)
            if self.gan_threshold is not None
            else float("nan")
        )
        return [
            {
                "running_loss": float(self.running_loss[i]),
                "pre_loss": float(self.pre_loss[i]),
                "gan_updates": int(self.gan_updates[i]),
                "pixel_updates": int(self.pixel_updates[i]),
                "gan_threshold": gate,
            }
            for i in range(self.n)
        ]
