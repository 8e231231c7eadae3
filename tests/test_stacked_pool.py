"""vmap-stacked pool: equivalence with per-member sequential updates,
scheduler regimes, epoch-end re-sort + mutual learning on the stacked axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srgan_tpu.config import ModelConfig, PoolConfig
from srgan_tpu.models.srresnet import init_generator
from srgan_tpu.training.stacked_pool import (
    StackedGeneratorPool,
    mutual_learning_lerp,
    permute_members,
    stack_states,
    stacked_pool_step,
    unstack_states,
)
from srgan_tpu.training.train_state import TrainState


def _states(n, norm="group"):
    out = []
    model = None
    for i in range(n):
        cfg = ModelConfig(
            num_features=8, num_residuals=1, upscale_factor=2, norm=norm
        )
        model, params = init_generator(cfg, jax.random.key(i), sample_hw=(8, 8))
        out.append(TrainState.create(apply_fn=model.apply, params=params))
    return model, out


class TestStackedStep:
    def test_matches_sequential_gradients(self, rng):
        """The stacked (vmapped, summed-loss) gradients == each member's
        individual pixel-loss gradients. Gradients are the right check:
        Adam's first-step update ≈ lr·sign(g), so fp reduction-order noise
        in near-zero grads flips post-update params by O(lr) without any
        mathematical difference."""
        from srgan_tpu.training.stacked_pool import _stacked_loss_fn
        from srgan_tpu.training.steps import generator_pixel_loss_fn

        model, states = _states(3)
        hr = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
        lr_imgs = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))

        seq_grads = []
        for s in states:
            g = jax.grad(
                lambda p: generator_pixel_loss_fn(
                    p, model.apply, hr, lr_imgs
                )[0]
            )(s.params)
            seq_grads.append(jax.tree.map(np.asarray, g))

        stacked = stack_states(states)
        grads, aux = jax.grad(_stacked_loss_fn, has_aux=True)(
            stacked.params, model.apply, None, None, hr, lr_imgs, jnp.zeros(3)
        )
        for i in range(3):
            got = jax.tree.map(lambda x: np.asarray(x[i]), grads)
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    a, b, rtol=1e-4, atol=1e-6
                ),
                got, seq_grads[i],
            )

    def test_stacked_step_updates_params(self, rng):
        model, states = _states(2)
        stacked = stack_states(states)
        before = np.asarray(jax.tree.leaves(stacked.params)[0]).copy()
        new_stacked, metrics = stacked_pool_step(
            stacked, model.apply, None, None,
            jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32)),
            jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32)),
            jnp.zeros(2), jnp.asarray(1e-3),
        )
        assert metrics["com_loss"].shape == (2,)
        after = np.asarray(jax.tree.leaves(new_stacked.params)[0])
        assert np.abs(after - before).max() > 0.0

    def test_fused_gan_step_matches_two_dispatch(self, rng):
        """stacked_pool_gan_step (one executable) == stacked_pool_step
        with return_sr + discriminator_step_on_sr (two dispatches): same
        generator params, same D params, same losses."""
        from srgan_tpu.config import DiscriminatorConfig
        from srgan_tpu.models.discriminator import init_discriminator
        from srgan_tpu.training.stacked_pool import stacked_pool_gan_step
        from srgan_tpu.training.steps import discriminator_step_on_sr

        model, states = _states(2)
        d_model, d_params = init_discriminator(
            DiscriminatorConfig(num_filters=8, num_stages=2),
            jax.random.key(9), sample_hw=(64, 64),
        )
        copy = lambda t: jax.tree.map(jnp.array, t)  # noqa: E731
        hr = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
        lr_imgs = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
        gan_mask = jnp.asarray([1.0, 0.0])
        g_lr, d_lr = jnp.asarray(1e-3), jnp.asarray(1e-3)

        # two-dispatch path
        stacked_a = stack_states(
            [s.replace(params=copy(s.params)) for s in states]
        )
        d_state_a = TrainState.create(
            apply_fn=d_model.apply, params=copy(d_params)
        )
        new_a, m_a = stacked_pool_step(
            stacked_a, model.apply, d_model.apply, d_state_a.params,
            hr, lr_imgs, gan_mask, g_lr,
            d_target_idx=np.int32(0), return_sr=True,
        )
        d_state_a, dm_a = discriminator_step_on_sr(
            d_state_a, hr, m_a.pop("sr"), d_lr
        )

        # fused path
        stacked_b = stack_states(
            [s.replace(params=copy(s.params)) for s in states]
        )
        d_state_b = TrainState.create(
            apply_fn=d_model.apply, params=copy(d_params)
        )
        new_b, d_state_b, m_b = stacked_pool_gan_step(
            stacked_b, d_state_b, model.apply, d_model.apply,
            hr, lr_imgs, gan_mask, g_lr, d_lr, d_target_idx=np.int32(0),
        )

        assert float(m_b["d_loss"]) == pytest.approx(
            float(dm_a["d_loss"]), rel=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(m_b["g_loss"]), np.asarray(m_a["g_loss"]), rtol=1e-5
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            ),
            new_a.params, new_b.params,
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            ),
            d_state_a.params, d_state_b.params,
        )

    def test_scanned_step_matches_vmapped(self, rng):
        """scanned_pool_step (lax.scan over members, 1x activation memory)
        produces the same params and metrics as the vmapped step — the two
        executors behind ``PoolConfig.member_exec``. norm="none" models:
        with GroupNorm the residual conv biases have exactly-zero true
        gradients (GN subtracts the mean), so their update is Adam-amplified
        fp noise that legitimately differs between the two executors."""
        from srgan_tpu.training.stacked_pool import scanned_pool_step

        model, states = _states(3, norm="none")
        copy = lambda t: jax.tree.map(jnp.array, t)  # noqa: E731
        hr = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
        lr_imgs = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
        mask = jnp.zeros(3)
        lr = jnp.asarray(1e-3)

        sa = stack_states([s.replace(params=copy(s.params)) for s in states])
        new_v, m_v = stacked_pool_step(
            sa, model.apply, None, None, hr, lr_imgs, mask, lr,
            return_sr=True, d_target_idx=np.int32(1),
        )
        sb = stack_states([s.replace(params=copy(s.params)) for s in states])
        new_s, m_s = scanned_pool_step(
            sb, model.apply, None, None, hr, lr_imgs, mask, lr,
            return_sr=True, d_target_idx=np.int32(1),
        )

        for k in ("com_loss", "tv_loss", "g_loss"):
            np.testing.assert_allclose(
                np.asarray(m_s[k]), np.asarray(m_v[k]), rtol=1e-5, atol=1e-7
            )
        # d_target member's SR (the two-dispatch GAN handoff)
        np.testing.assert_allclose(
            np.asarray(m_s["sr"]), np.asarray(m_v["sr"]), rtol=1e-5,
            atol=1e-6,
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            ),
            new_s.params, new_v.params,
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            ),
            new_s.opt_state, new_v.opt_state,
        )

    def test_scanned_gan_step_matches_vmapped(self, rng):
        """Fused scanned GAN step == fused vmapped GAN step: generator
        params, D params, and every loss agree (same simultaneous-update
        pairing semantics). norm="none" for the same degenerate-bias-grad
        reason as test_scanned_step_matches_vmapped."""
        from srgan_tpu.config import DiscriminatorConfig
        from srgan_tpu.models.discriminator import init_discriminator
        from srgan_tpu.training.stacked_pool import (
            scanned_pool_gan_step,
            stacked_pool_gan_step,
        )

        model, states = _states(2, norm="none")
        d_model, d_params = init_discriminator(
            DiscriminatorConfig(num_filters=8, num_stages=2),
            jax.random.key(9), sample_hw=(64, 64),
        )
        copy = lambda t: jax.tree.map(jnp.array, t)  # noqa: E731
        hr = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
        lr_imgs = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
        gan_mask = jnp.asarray([1.0, 1.0])
        g_lr, d_lr = jnp.asarray(1e-3), jnp.asarray(1e-3)

        sa = stack_states([s.replace(params=copy(s.params)) for s in states])
        da = TrainState.create(apply_fn=d_model.apply, params=copy(d_params))
        new_v, d_v, m_v = stacked_pool_gan_step(
            sa, da, model.apply, d_model.apply,
            hr, lr_imgs, gan_mask, g_lr, d_lr, d_target_idx=np.int32(1),
        )
        sb = stack_states([s.replace(params=copy(s.params)) for s in states])
        db = TrainState.create(apply_fn=d_model.apply, params=copy(d_params))
        new_s, d_s, m_s = scanned_pool_gan_step(
            sb, db, model.apply, d_model.apply,
            hr, lr_imgs, gan_mask, g_lr, d_lr, d_target_idx=np.int32(1),
        )

        assert float(m_s["d_loss"]) == pytest.approx(
            float(m_v["d_loss"]), rel=1e-5, abs=1e-7
        )
        for k in ("com_loss", "tv_loss", "g_d_loss", "g_loss"):
            np.testing.assert_allclose(
                np.asarray(m_s[k]), np.asarray(m_v[k]), rtol=1e-5, atol=1e-7
            )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            ),
            new_s.params, new_v.params,
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            ),
            d_s.params, d_v.params,
        )

    def test_roundtrip_stack_unstack(self):
        model, states = _states(2)
        stacked = stack_states(states)
        back = unstack_states(stacked, 2)
        a = jax.tree.leaves(states[1].params)[0]
        b = jax.tree.leaves(back[1].params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestStackedScheduler:
    def _pool(self, cfg=None):
        model, states = _states(3)
        return StackedGeneratorPool.create(
            states, cfg or PoolConfig(num_generators=3)
        )

    def test_mask_regimes(self):
        cfg = PoolConfig(
            num_generators=3, starting_gan_loss=0.5,
            p_gan_above=0.0, p_gan_leader=1.0, p_gan_follower=0.0,
        )
        pool = self._pool(cfg)
        pool.running_loss = np.array([0.2, 0.3, 0.4])
        probs = pool.gan_probabilities()
        assert probs[0] == 1.0 and probs[1] == 0.0
        # above threshold -> p_gan_above for everyone
        pool.running_loss = np.array([0.9, 0.8, 0.7])
        assert (pool.gan_probabilities() == 0.0).all()
        # no signal yet -> never GAN
        pool.running_loss = np.full(3, np.inf)
        assert (pool.gan_probabilities() == 0.0).all()

    def test_record_and_sort(self):
        pool = self._pool()
        pool.record_losses(np.array([0.9, 0.1, 0.5]))
        leader_before = np.asarray(
            jax.tree.leaves(jax.tree.map(lambda x: x[1], pool.state.params))[0]
        ).copy()
        pool.end_epoch()
        # ascending: old member 1 (loss .1) becomes leader
        assert pool.running_loss[0] == pytest.approx(0.1)
        leader_after = np.asarray(jax.tree.leaves(pool.leader_params())[0])
        np.testing.assert_array_equal(leader_after, leader_before)

    def test_pixel_phase_counts_pixel_updates(self):
        """Pixel-only batches must increment pixel_updates exactly like
        GeneratorPool.record_loss(..., used_gan=False) — the two
        representations' snapshots round-trip through checkpoints and
        must agree."""
        pool = self._pool()
        for _ in range(4):
            mask = pool.sample_gan_mask(use_gan=False)
            assert not mask.any()
        assert (pool.pixel_updates == 4).all()
        assert (pool.gan_updates == 0).all()
        # GAN-phase masks keep splitting between the two counters
        pool.running_loss = np.full(3, 0.2)
        pool.sample_gan_mask(use_gan=True)
        assert (pool.pixel_updates + pool.gan_updates == 5).all()

    def test_mutual_learning_pulls_followers(self):
        model, states = _states(2)
        stacked = stack_states(states)
        lerped = mutual_learning_lerp(stacked.params, alpha=0.5)
        l0 = jax.tree.leaves(jax.tree.map(lambda x: x[0], stacked.params))[0]
        l1 = jax.tree.leaves(jax.tree.map(lambda x: x[1], stacked.params))[0]
        want = 0.5 * np.asarray(l0) + 0.5 * np.asarray(l1)
        got = np.asarray(jax.tree.leaves(lerped)[0][1])
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_permute(self):
        model, states = _states(3)
        stacked = stack_states(states)
        perm = jnp.asarray([2, 0, 1])
        permuted = permute_members(stacked, perm)
        a = jax.tree.leaves(states[2].params)[0]
        b = jax.tree.leaves(jax.tree.map(lambda x: x[0], permuted.params))[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
