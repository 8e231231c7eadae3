"""Relativistic tanh-squashed adversarial losses.

The reference defines both sides of the objective:
  - discriminator: ``mean(tanh(fake_preds - real_preds))``
    (``src/train.py:218``), minimized — pushes real scores above fake.
  - generator:     ``mean(tanh(real_preds - fake_preds))``
    (``src/train.py:190``, present but commented out), minimized — pushes
    fake scores above real.

Both are active here (BASELINE configs 2+); the single-generator pixel-only
path simply never calls them, matching the reference's shipped state
(``src/train.py:155,184-192``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def discriminator_loss(real_preds: jax.Array, fake_preds: jax.Array) -> jax.Array:
    return jnp.mean(jnp.tanh(fake_preds - real_preds))


def generator_adversarial_loss(
    real_preds: jax.Array, fake_preds: jax.Array
) -> jax.Array:
    return jnp.mean(jnp.tanh(real_preds - fake_preds))


def uniformity_loss(embeddings: jax.Array, t: float = 2.0) -> jax.Array:
    """Log-mean-exp uniformity objective over a batch of embeddings.

    Reference ``src/utils.py:124-137`` — intended for a future image-encoder
    contrastive objective. ``embeddings`` is (B, D); pairwise L2 distances of
    the B(B-1)/2 unordered pairs feed ``log(mean(exp(-t * d^2 + 1e-7)))``.
    Returns 0 for a single-element batch, like the reference.
    """
    b = embeddings.shape[0]
    if b <= 1:
        return jnp.zeros((), dtype=embeddings.dtype)
    # Pairwise squared distances via explicit differences (numerically exact,
    # unlike the ||a||²+||b||²−2ab expansion which cancels in fp32); strict
    # upper triangle matches torch.pdist's unordered-pair semantics.
    diffs = embeddings[:, None, :] - embeddings[None, :, :]
    d2 = jnp.sum(diffs * diffs, axis=-1)
    iu, ju = jnp.triu_indices(b, k=1)
    pair_d2 = d2[iu, ju]
    return jnp.log(jnp.mean(jnp.exp(-t * pair_d2 + 1e-7)))
