"""Fused jit train/eval steps.

Each reference train function (``train_generator``, ``train_discriminator``,
``src/train.py:175-230``) maps to ONE compiled XLA executable: forward + loss
+ backward + Adam update fused, no host sync inside the loop (the reference
calls ``.item()`` and ``cuda.empty_cache()`` every batch —
``train.py:196-201`` — which serializes the GPU; here loss scalars stay on
device until logging).

Two generator steps exist — pixel and GAN — because the multi-generator
scheduler picks between them per batch with host-side randomness
(SURVEY.md §7(c)): both stay compiled, the choice is a cheap Python branch.

All steps are pure functions of (state, batch, lr, ...) and are safe to wrap
in ``shard_map`` / pjit over a data mesh: batch-mean losses turn into global
means via XLA's automatic collective insertion (the DDP-allreduce
equivalent).
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from srgan_tpu.ops.gan_loss import discriminator_loss, generator_adversarial_loss
from srgan_tpu.ops.metrics import batched_psnr_ssim
from srgan_tpu.ops.recon_loss import reconstruction_loss
from srgan_tpu.training.train_state import TrainState

# Layout of the fetch-once loss vector every train step also returns as
# ``metrics["packed"]``. Over the dev tunnel each host fetch costs ~2 ms of
# round-trip latency, so draining 5-6 scalars individually costs more than
# the entire data-prep of a batch; one stacked array = one fetch.
PACKED_KEYS = ("g_loss", "com_loss", "tv_loss", "g_d_loss", "p_loss")


def pack_metrics(metrics: dict, d_loss=None) -> jax.Array:
    """Stack the standard loss scalars (PACKED_KEYS order) — and append
    ``d_loss`` when given — into one device array for a single host fetch."""
    packed = jnp.stack([jnp.asarray(metrics[k]) for k in PACKED_KEYS])
    if d_loss is not None:
        packed = jnp.concatenate(
            [packed.reshape(-1), jnp.reshape(d_loss, (1,))]
        )
    return packed


def perceptual_term(sr, f_real, vgg_apply_fn, vgg_params):
    """Summed per-layer L1 distance between SR features and precomputed HR
    features (reference ``perceptal_loss`` [sic], ``src/utils.py:154-166``;
    the HR features carry no generator gradient so they are extracted once
    and passed in)."""
    f_fake = vgg_apply_fn({"params": vgg_params}, sr)
    p_loss = jnp.zeros(())
    for key in f_real:
        p_loss = p_loss + jnp.mean(jnp.abs(f_fake[key] - f_real[key]))
    return p_loss


def generator_pixel_loss_fn(
    params, apply_fn, hr, lr_imgs,
    vgg_apply_fn=None, vgg_params=None, p_weight=0.0,
):
    """Pixel-phase objective: edge-weighted L1 + masked TV
    (``src/train.py:194-195``: ``g_loss = com_loss + tv_loss``), plus the
    opt-in VGG perceptual term (``src/utils.py:154-166``, disabled in the
    reference's shipped loop — same default here)."""
    sr = apply_fn({"params": params}, lr_imgs)
    com_loss, tv_loss = reconstruction_loss(hr, sr)
    g_loss = com_loss + tv_loss
    p_loss = jnp.zeros(())
    if vgg_apply_fn is not None:
        f_real = jax.lax.stop_gradient(vgg_apply_fn({"params": vgg_params}, hr))
        p_loss = perceptual_term(sr, f_real, vgg_apply_fn, vgg_params)
        g_loss = g_loss + p_weight * p_loss
    return g_loss, {"com_loss": com_loss, "tv_loss": tv_loss,
                    "p_loss": p_loss, "sr": jax.lax.stop_gradient(sr)}


@functools.partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=("vgg_apply_fn", "return_sr"),
)
def generator_pixel_step(
    g_state: TrainState,
    hr: jax.Array,
    lr_imgs: jax.Array,
    lr: jax.Array,
    vgg_apply_fn=None,
    vgg_params: Any = None,
    p_weight: float = 0.0,
    return_sr: bool = False,
) -> Tuple[TrainState, dict]:
    """One pixel-loss generator update (``train_generator``,
    ``src/train.py:175-203``, with the adversarial term at its shipped
    default of 0). With ``vgg_apply_fn`` set, adds the weighted perceptual
    term (one fused executable either way — the branch is trace-time).
    ``return_sr=True`` keeps ``metrics["sr"]`` (the pre-update SR, already
    computed) so a following discriminator update can skip its own
    generator forward."""
    (g_loss, aux), grads = jax.value_and_grad(
        generator_pixel_loss_fn, has_aux=True
    )(g_state.params, g_state.apply_fn, hr, lr_imgs,
      vgg_apply_fn, vgg_params, p_weight)
    if not return_sr:
        aux = {k: v for k, v in aux.items() if k != "sr"}
    new_state = g_state.apply_gradients(grads, lr)
    metrics = {"g_loss": g_loss, "g_d_loss": jnp.zeros(()), **aux}
    metrics["packed"] = pack_metrics(metrics)
    return new_state, metrics


def generator_gan_loss_fn(
    params, apply_fn, d_apply_fn, d_params, hr, lr_imgs,
    vgg_apply_fn=None, vgg_params=None, p_weight=0.0,
):
    """GAN-phase objective: pixel terms + relativistic adversarial term
    ``mean(tanh(real_preds - fake_preds))`` (``src/train.py:184-192``, the
    commented-out generator adversarial path, active in BASELINE configs 2+),
    plus the opt-in perceptual term."""
    sr = apply_fn({"params": params}, lr_imgs)
    com_loss, tv_loss = reconstruction_loss(hr, sr)
    fake_preds = d_apply_fn({"params": d_params}, sr)
    real_preds = jax.lax.stop_gradient(d_apply_fn({"params": d_params}, hr))
    g_d_loss = generator_adversarial_loss(real_preds, fake_preds)
    g_loss = com_loss + tv_loss + g_d_loss
    p_loss = jnp.zeros(())
    if vgg_apply_fn is not None:
        f_real = jax.lax.stop_gradient(vgg_apply_fn({"params": vgg_params}, hr))
        p_loss = perceptual_term(sr, f_real, vgg_apply_fn, vgg_params)
        g_loss = g_loss + p_weight * p_loss
    return g_loss, {
        "com_loss": com_loss,
        "tv_loss": tv_loss,
        "g_d_loss": g_d_loss,
        "p_loss": p_loss,
        "sr": jax.lax.stop_gradient(sr),
    }


@functools.partial(
    jax.jit,
    donate_argnums=(0,),
    static_argnames=("d_apply_fn", "vgg_apply_fn", "return_sr"),
)
def generator_gan_step(
    g_state: TrainState,
    d_apply_fn,
    d_params: Any,
    hr: jax.Array,
    lr_imgs: jax.Array,
    lr: jax.Array,
    vgg_apply_fn=None,
    vgg_params: Any = None,
    p_weight: float = 0.0,
    return_sr: bool = False,
) -> Tuple[TrainState, dict]:
    (g_loss, aux), grads = jax.value_and_grad(generator_gan_loss_fn, has_aux=True)(
        g_state.params, g_state.apply_fn, d_apply_fn, d_params, hr, lr_imgs,
        vgg_apply_fn, vgg_params, p_weight,
    )
    if not return_sr:
        aux = {k: v for k, v in aux.items() if k != "sr"}
    new_state = g_state.apply_gradients(grads, lr)
    metrics = {"g_loss": g_loss, **aux}
    metrics["packed"] = pack_metrics(metrics)
    return new_state, metrics


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1),
    static_argnames=("d_apply_fn", "vgg_apply_fn"),
)
def gan_train_step(
    g_state: TrainState,
    d_state: TrainState,
    d_apply_fn,
    hr: jax.Array,
    lr_imgs: jax.Array,
    g_lr: jax.Array,
    d_lr: jax.Array,
    vgg_apply_fn=None,
    vgg_params: Any = None,
    p_weight: float = 0.0,
) -> Tuple[TrainState, TrainState, dict]:
    """Generator + discriminator GAN updates fused into ONE executable.

    Semantics are identical to ``generator_gan_step(return_sr=True)``
    followed by :func:`discriminator_step_on_sr` (both updates read their
    pre-update counterpart — "simultaneous" GAN semantics), but fusing
    lets XLA CSE the discriminator forwards the two-dispatch pair computes
    twice: ``D(sr)`` and ``D(hr)`` each appear in BOTH the generator's
    adversarial term and the discriminator's own loss, on identical inputs
    and identical pre-update ``d_params``. One executable → each runs
    once, and a per-batch dispatch round-trip disappears with it.
    """
    (g_loss, aux), grads = jax.value_and_grad(
        generator_gan_loss_fn, has_aux=True
    )(
        g_state.params, g_state.apply_fn, d_apply_fn, d_state.params,
        hr, lr_imgs, vgg_apply_fn, vgg_params, p_weight,
    )
    sr = aux.pop("sr")
    new_g = g_state.apply_gradients(grads, g_lr)
    d_loss, d_grads = jax.value_and_grad(_d_loss_on_sr)(
        d_state.params, d_apply_fn, hr, sr
    )
    new_d = d_state.apply_gradients(d_grads, d_lr)
    metrics = {"g_loss": g_loss, **aux, "d_loss": d_loss}
    metrics["packed"] = pack_metrics(metrics, d_loss)
    return new_g, new_d, metrics


def generator_perceptual_step(
    g_state: TrainState,
    vgg_apply_fn,
    vgg_params: Any,
    hr: jax.Array,
    lr_imgs: jax.Array,
    lr: jax.Array,
    weight,
) -> Tuple[TrainState, dict]:
    """Pixel objective + VGG-feature L1 perceptual term, as one update.

    The reference builds the VGG extractor but leaves the perceptual loss
    commented out of the loop (``src/train.py:49,157``; loss at
    ``src/utils.py:154-166``); here it is reachable via
    ``TrainConfig.perceptual_weight`` / ``--perceptual``. Thin alias over
    :func:`generator_pixel_step` with the VGG arguments threaded through."""
    return generator_pixel_step(
        g_state, hr, lr_imgs, lr, vgg_apply_fn, vgg_params, weight
    )


def discriminator_loss_fn(d_params, d_apply_fn, g_apply_fn, g_params, hr, lr_imgs):
    """Relativistic tanh discriminator objective
    ``mean(tanh(fake_preds - real_preds))`` (``src/train.py:206-230``)."""
    sr = jax.lax.stop_gradient(g_apply_fn({"params": g_params}, lr_imgs))
    real_preds = d_apply_fn({"params": d_params}, hr)
    fake_preds = d_apply_fn({"params": d_params}, sr)
    return discriminator_loss(real_preds, fake_preds)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("g_apply_fn",))
def discriminator_step(
    d_state: TrainState,
    g_apply_fn,
    g_params: Any,
    hr: jax.Array,
    lr_imgs: jax.Array,
    lr: jax.Array,
) -> Tuple[TrainState, dict]:
    d_loss, grads = jax.value_and_grad(discriminator_loss_fn)(
        d_state.params, d_state.apply_fn, g_apply_fn, g_params, hr, lr_imgs
    )
    new_state = d_state.apply_gradients(grads, lr)
    return new_state, {"d_loss": d_loss}


def _d_loss_on_sr(d_params, d_apply_fn, hr, sr):
    real_preds = d_apply_fn({"params": d_params}, hr)
    fake_preds = d_apply_fn({"params": d_params}, sr)
    return discriminator_loss(real_preds, fake_preds)


@functools.partial(jax.jit, donate_argnums=(0,))
def discriminator_step_on_sr(
    d_state: TrainState,
    hr: jax.Array,
    sr: jax.Array,
    lr: jax.Array,
) -> Tuple[TrainState, dict]:
    """Discriminator update on a precomputed SR batch.

    Identical objective to :func:`discriminator_step`, but the fake batch is
    the SR the generator step already produced this batch (the generator
    step runs with pre-update params, exactly what the recomputation in
    :func:`discriminator_step` would yield) — saving one full generator
    forward per batch. The train loop runs the G step first and feeds its
    ``metrics["sr"]`` here; G's adversarial term then reads the previous
    batch's D — a one-batch lag the (commented) reference alternation
    doesn't have, documented as a perf-motivated deviation
    (``src/train.py:155-157``)."""
    d_loss, grads = jax.value_and_grad(_d_loss_on_sr)(
        d_state.params, d_state.apply_fn, hr, sr
    )
    new_state = d_state.apply_gradients(grads, lr)
    return new_state, {"d_loss": d_loss}


@functools.partial(jax.jit, static_argnames=("apply_fn",))
def eval_step(apply_fn, params, hr: jax.Array, lr_imgs: jax.Array):
    """Score one batch on device: SR forward + per-image PSNR/SSIM
    (replaces ``compute_score``'s per-image host loop,
    ``src/train.py:263-294``). SR output is intentionally unclamped here,
    matching the reference's training-metric quirk (SURVEY.md appendix)."""
    sr = apply_fn({"params": params}, lr_imgs)
    psnr_b, ssim_b = batched_psnr_ssim(sr, hr)
    return jnp.mean(psnr_b), jnp.mean(ssim_b)


@functools.partial(jax.jit, static_argnames=("apply_fn",))
def infer_step(apply_fn, params, lr_imgs: jax.Array) -> jax.Array:
    """Plain SR forward for validation grids / inference."""
    return apply_fn({"params": params}, lr_imgs)


@functools.partial(jax.jit, static_argnames=("apply_fn",))
def infer_step_ensemble(apply_fn, stacked_params, lr_imgs: jax.Array):
    """Pool-ensemble SR forward: mean of every member's output.

    ``stacked_params`` carries a leading pool axis (the vmap-stacked
    representation, ``training.stacked_pool``). Classic SR self-ensembling
    over the pool the README algorithm already trains — the reference
    never uses its non-leader members at inference
    (``src/evaluation.py:22-31`` loads only ``..._model_0.pth``); here
    they buy output quality for free at serving time (measured: PARITY.md
    pool-ablation section). One fused executable: XLA batches the N
    forwards and the mean."""
    srs = jax.vmap(lambda p: apply_fn({"params": p}, lr_imgs))(stacked_params)
    return jnp.mean(srs, axis=0)


def _dihedral_mean(fwd, lr_imgs: jax.Array) -> jax.Array:
    """Mean of ``fwd`` over the 8 dihedral transforms of the input, each
    output mapped back through the inverse transform — geometric
    self-ensembling (the EDSR-style x8 TTA). All 8 forwards trace into ONE
    executable (the transposed pair just runs at (W, H)); every transform
    commutes exactly with the model's conv/GN trunk, and the pixel-shuffle
    head sees a different sub-pixel phase alignment per transform — which
    is precisely the diversity the average exploits."""
    outs = []
    for t in range(2):
        xt = jnp.transpose(lr_imgs, (0, 2, 1, 3)) if t else lr_imgs
        for fh in range(2):
            for fw in range(2):
                xx = xt
                if fh:
                    xx = xx[:, ::-1]
                if fw:
                    xx = xx[:, :, ::-1]
                y = fwd(xx)
                if fw:
                    y = y[:, :, ::-1]
                if fh:
                    y = y[:, ::-1]
                if t:
                    y = jnp.transpose(y, (0, 2, 1, 3))
                outs.append(y)
    return jnp.mean(jnp.stack(outs), axis=0)


@functools.partial(jax.jit, static_argnames=("apply_fn", "ensemble"))
def infer_step_tta(apply_fn, params, lr_imgs: jax.Array,
                   ensemble: bool = False) -> jax.Array:
    """Geometric self-ensemble SR forward (x8 dihedral TTA), optionally on
    top of the pool ensemble (``ensemble=True``: ``params`` is stacked and
    each of the 8 forwards is the member mean — 8N model forwards fused
    into one executable)."""
    if ensemble:
        def fwd(x):
            return jnp.mean(
                jax.vmap(lambda p: apply_fn({"params": p}, x))(params),
                axis=0,
            )
    else:
        def fwd(x):
            return apply_fn({"params": params}, x)
    return _dihedral_mean(fwd, lr_imgs)


@functools.partial(
    jax.jit, static_argnames=("apply_fn", "enhance_out", "ensemble")
)
def infer_step_tta_u8(apply_fn, params, lr_imgs: jax.Array,
                      enhance_out: bool = False,
                      ensemble: bool = False) -> jax.Array:
    """u8-fetch twin of :func:`infer_step_tta` (same quantization formula
    as :func:`infer_step_u8`)."""
    from srgan_tpu.ops.filters import sharpen

    sr = infer_step_tta(apply_fn, params, lr_imgs, ensemble=ensemble)
    if enhance_out:
        sr = sharpen(sr)
    sr = jnp.clip(sr.astype(jnp.float32), 0.0, 1.0)
    return jnp.floor(sr * 255.0 + 0.5).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("apply_fn", "enhance_out"))
def infer_step_ensemble_u8(
    apply_fn, stacked_params, lr_imgs: jax.Array, enhance_out: bool = False
) -> jax.Array:
    """Ensemble twin of :func:`infer_step_u8`: member-mean SR, optional
    sharpen epilogue, device-side uint8 quantization (same formula)."""
    from srgan_tpu.ops.filters import sharpen

    sr = infer_step_ensemble(apply_fn, stacked_params, lr_imgs)
    if enhance_out:
        sr = sharpen(sr)
    sr = jnp.clip(sr.astype(jnp.float32), 0.0, 1.0)
    return jnp.floor(sr * 255.0 + 0.5).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("apply_fn", "enhance_out"))
def infer_step_u8(
    apply_fn, params, lr_imgs: jax.Array, enhance_out: bool = False
) -> jax.Array:
    """SR forward quantized to uint8 ON DEVICE (optionally through the
    sharpen epilogue first). The serving path fetches these frames to the
    host for encoding; doing the clip + *255+0.5 floor (bit-matching
    ``utils.image_io.array_to_image``) device-side shrinks every
    device→host transfer 4x — which is the serving bottleneck whenever the
    host link is thin (the dev tunnel moves ~20 MB/s; even PCIe hosts save
    real bandwidth)."""
    from srgan_tpu.ops.filters import sharpen

    sr = apply_fn({"params": params}, lr_imgs)
    if enhance_out:
        sr = sharpen(sr)
    sr = jnp.clip(sr.astype(jnp.float32), 0.0, 1.0)
    return jnp.floor(sr * 255.0 + 0.5).astype(jnp.uint8)
