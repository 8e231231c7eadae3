"""Training-runtime tests: optimizer parity, LR schedule, jit steps,
pool scheduler, checkpoint round-trip (SURVEY.md §4 plan items a/c/e)."""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srgan_tpu.config import (
    DiscriminatorConfig,
    ModelConfig,
    PoolConfig,
    TrainConfig,
)
from srgan_tpu.models.srresnet import init_generator
from srgan_tpu.training.pool import (
    GeneratorPool,
    PoolMember,
    interpolate_params,
    sort_lists_in_same_order,
)
from srgan_tpu.training.steps import (
    eval_step,
    generator_pixel_step,
)
from srgan_tpu.training.train_state import TrainState, linear_lr


def _tiny_gen(seed=0):
    cfg = ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
    model, params = init_generator(cfg, jax.random.key(seed), sample_hw=(8, 8))
    return model, params


class TestTrainState:
    def test_adam_matches_torch(self, rng):
        """Our scale_by_adam + external-lr update must match torch.optim.Adam
        step-for-step (the reference's optimizer, ``src/train.py:61-62``)."""
        torch = pytest.importorskip("torch")

        w0 = rng.standard_normal((4, 3)).astype(np.float32)
        grads = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(3)]
        lr = 1e-2

        # torch side
        wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        opt = torch.optim.Adam([wt], lr=lr)
        for g in grads:
            opt.zero_grad()
            wt.grad = torch.from_numpy(g.copy())
            opt.step()

        # jax side
        state = TrainState.create(apply_fn=None, params={"w": jnp.asarray(w0)})
        for g in grads:
            state = state.apply_gradients({"w": jnp.asarray(g)}, jnp.asarray(lr))

        np.testing.assert_allclose(
            np.asarray(state.params["w"]), wt.detach().numpy(), rtol=1e-4, atol=1e-5
        )

    def test_epoch_lr_dispatch(self):
        from srgan_tpu.training.train_state import cosine_lr, epoch_lr, linear_lr

        lin = TrainConfig(num_epochs=10, lr_schedule="linear")
        cos = TrainConfig(num_epochs=10, lr_schedule="cosine")
        assert epoch_lr(lin, 1e-4, 3) == linear_lr(lin, 1e-4, 3)
        assert epoch_lr(cos, 1e-4, 3) == cosine_lr(cos, 1e-4, 3)
        # cosine: starts at base, decays toward eta_min, never below it
        vals = [cosine_lr(cos, 1e-4, e) for e in range(10)]
        assert vals[0] == pytest.approx(1e-4)
        assert all(v >= 5e-5 - 1e-12 for v in vals)
        assert vals[-1] < vals[0]

    def test_linear_lr_schedule(self):
        """torch LinearLR(1 → 0.01 over N epochs) parity
        (``src/train.py:70-71``)."""
        torch = pytest.importorskip("torch")

        cfg = TrainConfig(num_epochs=10)
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.Adam([p], lr=1e-4)
        sched = torch.optim.lr_scheduler.LinearLR(
            opt, start_factor=1, end_factor=0.01, total_iters=10
        )
        for epoch in range(10):
            want = opt.param_groups[0]["lr"]
            got = linear_lr(cfg, 1e-4, epoch)
            assert got == pytest.approx(want, rel=1e-6), f"epoch {epoch}"
            sched.step()


class TestGeneratorStep:
    def test_loss_decreases(self, rng):
        model, params = _tiny_gen()
        state = TrainState.create(apply_fn=model.apply, params=params)
        hr = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
        lr_imgs = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
        losses = []
        for _ in range(5):
            state, metrics = generator_pixel_step(
                state, hr, lr_imgs, jnp.asarray(1e-3)
            )
            losses.append(float(metrics["g_loss"]))
        assert losses[-1] < losses[0]

    def test_metrics_structure(self, rng):
        model, params = _tiny_gen()
        state = TrainState.create(apply_fn=model.apply, params=params)
        hr = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        lr_imgs = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
        _, metrics = generator_pixel_step(state, hr, lr_imgs, jnp.asarray(1e-4))
        assert set(metrics) == {
            "g_loss", "com_loss", "tv_loss", "g_d_loss", "p_loss", "packed",
        }
        assert float(metrics["g_d_loss"]) == 0.0  # pixel phase, train.py:192
        assert float(metrics["p_loss"]) == 0.0  # perceptual off by default
        # packed mirrors the scalars in PACKED_KEYS order (one-fetch drain)
        from srgan_tpu.training.steps import PACKED_KEYS

        np.testing.assert_allclose(
            np.asarray(metrics["packed"]),
            [float(metrics[k]) for k in PACKED_KEYS],
        )


class TestGanSteps:
    def _tiny_disc(self):
        from srgan_tpu.models.discriminator import init_discriminator

        cfg = DiscriminatorConfig(num_filters=8, num_stages=2)
        model, params = init_discriminator(cfg, jax.random.key(5))
        return model, params

    def test_generator_gan_step(self, rng):
        from srgan_tpu.training.steps import generator_gan_step

        model, params = _tiny_gen()
        g_state = TrainState.create(apply_fn=model.apply, params=params)
        d_model, d_params = self._tiny_disc()
        # 64px HR → 3x3 patch output; 32px would give a degenerate 1x1 map
        # that InstanceNorm zeroes (all predictions exactly 0.5).
        hr = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
        lr_imgs = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
        g_state, metrics = generator_gan_step(
            g_state, d_model.apply, d_params, hr, lr_imgs, jnp.asarray(1e-4)
        )
        assert np.isfinite(float(metrics["g_loss"]))
        # adversarial term is live in the GAN phase (train.py:190 semantics)
        assert float(metrics["g_d_loss"]) != 0.0

    def test_discriminator_step_moves_loss(self, rng):
        from srgan_tpu.training.steps import discriminator_step

        g_model, g_params = _tiny_gen()
        d_model, d_params = self._tiny_disc()
        d_state = TrainState.create(apply_fn=d_model.apply, params=d_params)
        hr = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
        lr_imgs = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
        losses = []
        for _ in range(4):
            d_state, m = discriminator_step(
                d_state, g_model.apply, g_params, hr, lr_imgs, jnp.asarray(1e-3)
            )
            losses.append(float(m["d_loss"]))
        # minimizing mean(tanh(fake - real)) drives the loss down
        assert losses[-1] < losses[0]

    def test_discriminator_step_on_sr_matches_recompute(self, rng):
        # The loop feeds the D update the SR the generator step already
        # produced (pre-update params) — that must be bit-equal to the
        # SR-recompute inside discriminator_step.
        from srgan_tpu.training.steps import (
            discriminator_step,
            discriminator_step_on_sr,
            generator_pixel_step,
        )

        g_model, g_params = _tiny_gen()
        d_model, d_params = self._tiny_disc()
        hr = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
        lr_imgs = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
        d_lr = jnp.asarray(1e-3)

        # donate_argnums on the steps consumes the state buffers: give each
        # path its own copy of the initial D params.
        copy = lambda t: jax.tree.map(lambda x: jnp.array(x), t)  # noqa: E731
        d_state_a = TrainState.create(
            apply_fn=d_model.apply, params=copy(d_params)
        )
        d_state_a, m_a = discriminator_step(
            d_state_a, g_model.apply, g_params, hr, lr_imgs, d_lr
        )

        g_state = TrainState.create(apply_fn=g_model.apply, params=g_params)
        _, g_metrics = generator_pixel_step(
            g_state, hr, lr_imgs, jnp.asarray(1e-4), return_sr=True
        )
        d_state_b = TrainState.create(
            apply_fn=d_model.apply, params=copy(d_params)
        )
        d_state_b, m_b = discriminator_step_on_sr(
            d_state_b, hr, g_metrics["sr"], d_lr
        )
        assert float(m_a["d_loss"]) == pytest.approx(
            float(m_b["d_loss"]), rel=1e-6
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6
            ),
            d_state_a.params,
            d_state_b.params,
        )

    def test_fused_gan_train_step_matches_two_dispatch(self, rng):
        """gan_train_step (one executable) == generator_gan_step(return_sr)
        + discriminator_step_on_sr: same G params, same D params, same
        losses — the CSE fusion must not change semantics."""
        from srgan_tpu.training.steps import (
            discriminator_step_on_sr,
            gan_train_step,
            generator_gan_step,
        )

        g_model, g_params = _tiny_gen()
        d_model, d_params = self._tiny_disc()
        hr = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
        lr_imgs = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
        g_lr, d_lr = jnp.asarray(1e-4), jnp.asarray(1e-3)
        copy = lambda t: jax.tree.map(jnp.array, t)  # noqa: E731

        g_a = TrainState.create(apply_fn=g_model.apply, params=copy(g_params))
        d_a = TrainState.create(apply_fn=d_model.apply, params=copy(d_params))
        g_a, m_a = generator_gan_step(
            g_a, d_model.apply, d_a.params, hr, lr_imgs, g_lr, return_sr=True
        )
        d_a, dm_a = discriminator_step_on_sr(d_a, hr, m_a.pop("sr"), d_lr)

        g_b = TrainState.create(apply_fn=g_model.apply, params=copy(g_params))
        d_b = TrainState.create(apply_fn=d_model.apply, params=copy(d_params))
        g_b, d_b, m_b = gan_train_step(
            g_b, d_b, d_model.apply, hr, lr_imgs, g_lr, d_lr
        )

        assert float(m_b["g_loss"]) == pytest.approx(
            float(m_a["g_loss"]), rel=1e-5
        )
        assert float(m_b["d_loss"]) == pytest.approx(
            float(dm_a["d_loss"]), rel=1e-5
        )
        for tree_a, tree_b in ((g_a.params, g_b.params),
                               (d_a.params, d_b.params)):
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
                ),
                tree_a, tree_b,
            )

    def test_generator_steps_hide_sr_by_default(self, rng):
        from srgan_tpu.training.steps import generator_pixel_step

        model, params = _tiny_gen()
        g_state = TrainState.create(apply_fn=model.apply, params=params)
        hr = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
        lr_imgs = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
        _, metrics = generator_pixel_step(g_state, hr, lr_imgs, jnp.asarray(1e-4))
        assert "sr" not in metrics


class TestEvalStep:
    def test_psnr_reasonable(self, rng):
        model, params = _tiny_gen()
        hr = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
        lr_imgs = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
        p, s = eval_step(model.apply, params, hr, lr_imgs)
        assert np.isfinite(float(p)) and -1.0 <= float(s) <= 1.0


class TestPool:
    def _mk_pool(self, n, cfg=None):
        members = []
        for i in range(n):
            model, params = _tiny_gen(seed=i)
            members.append(
                PoolMember(TrainState.create(apply_fn=model.apply, params=params))
            )
        return GeneratorPool(members, cfg or PoolConfig(num_generators=n))

    def test_sort_helper_matches_reference_semantics(self):
        """``shuffle_lists_in_same_order`` sorts parallel lists by the last
        list, descending (``src/utils.py:102-110``)."""
        a, b = ["x", "y", "z"], [1.0, 3.0, 2.0]
        sa, sb = sort_lists_in_same_order(a, b)
        assert sb == [3.0, 2.0, 1.0] and sa == ["y", "z", "x"]

    def test_interpolate_params(self):
        p = {"w": jnp.zeros(3)}
        t = {"w": jnp.ones(3)}
        out = interpolate_params(p, t, alpha=0.2)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.2)

    def test_gan_gate_regimes(self):
        cfg = PoolConfig(
            num_generators=3, starting_gan_loss=0.5,
            p_gan_above=0.1, p_gan_leader=0.9, p_gan_follower=0.1,
        )
        pool = self._mk_pool(3, cfg)
        # above threshold → rarely GAN
        pool.members[0].running_loss = 0.8
        pool.members[1].running_loss = 0.9
        pool.members[2].running_loss = 1.0
        assert pool.gan_probability(0) == 0.1
        # below threshold: leader mostly GAN, laggards mostly pixel
        pool.members[0].running_loss = 0.2
        pool.members[1].running_loss = 0.3
        pool.members[2].running_loss = 0.4
        assert pool.gan_probability(0) == 0.9
        assert pool.gan_probability(1) == 0.1
        # a non-leader at the pool minimum → mostly GAN
        pool.members[1].running_loss = 0.1
        assert pool.gan_probability(1) == 0.9

    def test_auto_gate_calibrates_at_first_epoch_end(self):
        """``starting_gan_loss=None`` (the default): pre-calibration every
        member reads as above-regime (pixel-mostly, the README's early
        phase); the first ``end_epoch`` pins the threshold to
        ``gate_auto_frac * median(running_loss)`` so the below-regime
        engages as losses keep improving — the r3 ablation showed the old
        hand default (0.05) sat just below where flagship losses bottom
        out, leaving the leader-mostly-GAN dynamic (readme.md:10)
        permanently dormant (VERDICT r3 weak #2)."""
        cfg = PoolConfig(
            num_generators=3, starting_gan_loss=None, gate_auto_frac=0.6,
            p_gan_above=0.1, p_gan_leader=0.9, p_gan_follower=0.1,
            mutual_learning=False,
        )
        pool = self._mk_pool(3, cfg)
        for m, l in zip(pool.members, (0.10, 0.12, 0.14)):
            m.running_loss = l
        assert pool.gan_threshold is None
        assert [pool.gan_probability(i) for i in range(3)] == [0.1] * 3
        pool.end_epoch()
        assert pool.gan_threshold == pytest.approx(0.6 * 0.12)
        # losses keep falling through the calibrated threshold → regimes
        for m, l in zip(pool.members, (0.05, 0.06, 0.08)):
            m.running_loss = l
        assert pool.gan_probability(0) == 0.9  # leader mostly GAN
        assert pool.gan_probability(1) == 0.1  # follower above the min
        # later epochs must NOT recalibrate the pinned threshold
        pool.end_epoch()
        assert pool.gan_threshold == pytest.approx(0.6 * 0.12)

    def test_auto_gate_stacked_matches_member_list(self):
        from srgan_tpu.training.stacked_pool import StackedGeneratorPool

        cfg = PoolConfig(
            num_generators=3, starting_gan_loss=None,
            p_gan_above=0.2, p_gan_leader=0.8, p_gan_follower=0.1,
            mutual_learning=False,
        )
        pool = self._mk_pool(3, cfg)
        spool = StackedGeneratorPool.create(
            [m.state for m in pool.members], cfg
        )
        losses = [0.10, 0.12, 0.14]
        for i, l in enumerate(losses):
            pool.members[i].running_loss = l
        spool.running_loss = np.asarray(losses)
        np.testing.assert_allclose(
            spool.gan_probabilities(),
            [pool.gan_probability(i) for i in range(3)],
        )
        pool.end_epoch()
        spool.end_epoch()
        assert spool.gan_threshold == pytest.approx(pool.gan_threshold)
        newl = [0.05, 0.06, 0.08]
        for i, l in enumerate(newl):
            pool.members[i].running_loss = l
        spool.running_loss = np.asarray(newl)
        np.testing.assert_allclose(
            spool.gan_probabilities(),
            [pool.gan_probability(i) for i in range(3)],
        )

    def test_epoch_resort_and_mutual_learning(self):
        cfg = PoolConfig(num_generators=2, mutual_alpha=0.5)
        pool = self._mk_pool(2, cfg)
        pool.members[0].running_loss = 0.9  # worse
        pool.members[1].running_loss = 0.1  # better
        strong_params = pool.members[1].state.params
        weak_params = pool.members[0].state.params
        expected = interpolate_params(weak_params, strong_params, 0.5)
        pool.end_epoch()
        # ascending sort: the better model leads
        assert pool.members[0].running_loss == 0.1
        # weak member pulled toward the strong one
        got = pool.members[1].state.params
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(got)[0]),
            np.asarray(jax.tree.leaves(expected)[0]),
            rtol=1e-6,
        )

    def test_no_gan_before_signal(self):
        pool = self._mk_pool(1)
        assert pool.gan_probability(0) == 0.0  # infinite running loss

    def test_pre_loss_gate_off_is_telemetry_only(self):
        """Default: pre_loss never changes the probability (the documented
        EMA interpretation of ``readme.md:5``)."""
        cfg = PoolConfig(
            num_generators=1, starting_gan_loss=0.5, p_gan_leader=0.9,
        )
        pool = self._mk_pool(1, cfg)
        pool.members[0].running_loss = 0.2
        base = pool.gan_probability(0)
        pool.members[0].pre_loss = 0.1  # regressed since snapshot
        assert pool.gan_probability(0) == base == 0.9

    def test_pre_loss_gate_modulates_probability(self):
        """Opt-in ``readme.md:5`` clause: own loss vs pre_loss scales
        P(GAN) — boost when improved, damp when regressed, clamped to 1,
        inactive before the first epoch snapshot."""
        cfg = PoolConfig(
            num_generators=1, starting_gan_loss=0.5,
            p_gan_leader=0.8, p_gan_above=0.2,
            pre_loss_gate=True, pre_loss_boost=1.5, pre_loss_damp=0.5,
        )
        pool = self._mk_pool(1, cfg)
        m = pool.members[0]
        # no snapshot yet → base probability untouched
        m.running_loss = 0.2
        assert pool.gan_probability(0) == pytest.approx(0.8)
        # improved since snapshot → boosted (0.8*1.5 clamps to 1.0)
        m.pre_loss = 0.3
        assert pool.gan_probability(0) == pytest.approx(1.0)
        # regressed → damped
        m.pre_loss = 0.1
        assert pool.gan_probability(0) == pytest.approx(0.4)
        # above-threshold regime modulates too
        m.running_loss = 0.7
        m.pre_loss = 0.9
        assert pool.gan_probability(0) == pytest.approx(0.3)

    def test_pre_loss_gate_stacked_matches_member_list(self):
        """The stacked scheduler applies the identical modulation."""
        from srgan_tpu.training.stacked_pool import StackedGeneratorPool

        cfg = PoolConfig(
            num_generators=3, starting_gan_loss=0.5,
            p_gan_above=0.2, p_gan_leader=0.8, p_gan_follower=0.1,
            pre_loss_gate=True, pre_loss_boost=1.5, pre_loss_damp=0.5,
        )
        pool = self._mk_pool(3, cfg)
        spool = StackedGeneratorPool.create(
            [m.state for m in pool.members], cfg
        )
        losses = [0.2, 0.3, 0.7]
        pres = [0.3, 0.1, np.inf]  # improved / regressed / no snapshot
        for i, (l, p) in enumerate(zip(losses, pres)):
            pool.members[i].running_loss = l
            pool.members[i].pre_loss = p
        spool.running_loss = np.asarray(losses)
        spool.pre_loss = np.asarray(pres)
        want = [pool.gan_probability(i) for i in range(3)]
        np.testing.assert_allclose(spool.gan_probabilities(), want)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, rng):
        from srgan_tpu.training import checkpoint as ckpt

        model, params = _tiny_gen()
        state = TrainState.create(apply_fn=model.apply, params=params)
        pool = GeneratorPool([PoolMember(state)], PoolConfig())
        pool.members[0].running_loss = 0.42

        # mutate params so the restore target differs
        hr = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        lr_imgs = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
        new_state, _ = generator_pixel_step(
            TrainState.create(apply_fn=model.apply, params=params),
            hr, lr_imgs, jnp.asarray(1e-3),
        )
        pool.members[0].state = new_state
        saved = jax.tree.map(np.asarray, new_state.params)

        ckpt.save_checkpoint(
            str(tmp_path), "Test", pool=pool, d_state=None, epoch=7
        )

        # fresh pool with different params
        model2, params2 = _tiny_gen(seed=99)
        fresh = GeneratorPool(
            [PoolMember(TrainState.create(apply_fn=model2.apply, params=params2))],
            PoolConfig(),
        )
        restored_pool, _, epoch = ckpt.restore_checkpoint(
            str(tmp_path), "Test", pool=fresh, d_state=None
        )
        assert epoch == 7
        assert restored_pool.members[0].running_loss == pytest.approx(0.42)
        got = jax.tree.map(np.asarray, restored_pool.members[0].state.params)
        jax.tree.map(np.testing.assert_array_equal, got, saved)

    def test_auto_gate_threshold_survives_roundtrip(self, tmp_path):
        """A resumed auto-gate run must keep its calibrated threshold:
        recalibrating from restored (already-converged) losses pins the
        gate below anything the members reach and silently disables the
        below-regime dynamic (r4 review finding)."""
        from srgan_tpu.training import checkpoint as ckpt

        model, params = _tiny_gen()
        pool = GeneratorPool(
            [PoolMember(TrainState.create(apply_fn=model.apply,
                                          params=params))],
            PoolConfig(starting_gan_loss=None),
        )
        pool.gan_threshold = 0.91  # as calibrated at epoch-1 end
        ckpt.save_checkpoint(
            str(tmp_path), "G", pool=pool, d_state=None, epoch=3
        )

        fresh = GeneratorPool(
            [PoolMember(TrainState.create(apply_fn=model.apply,
                                          params=params))],
            PoolConfig(starting_gan_loss=None),
        )
        assert fresh.gan_threshold is None
        restored, _, _ = ckpt.restore_checkpoint(
            str(tmp_path), "G", pool=fresh, d_state=None
        )
        assert restored.gan_threshold == pytest.approx(0.91)

        # An EXPLICIT --starting-gan-loss always wins over the saved value.
        pinned = GeneratorPool(
            [PoolMember(TrainState.create(apply_fn=model.apply,
                                          params=params))],
            PoolConfig(starting_gan_loss=0.05),
        )
        restored2, _, _ = ckpt.restore_checkpoint(
            str(tmp_path), "G", pool=pinned, d_state=None
        )
        assert restored2.gan_threshold == pytest.approx(0.05)

    def test_uncalibrated_and_legacy_snapshots_restore(self, tmp_path,
                                                       monkeypatch):
        """NaN (saved before the epoch-1 calibration) and pre-r4 records
        (no gan_threshold key at all) both leave the fresh pool's auto
        gate uncalibrated instead of failing the template match."""
        from srgan_tpu.training import checkpoint as ckpt

        model, params = _tiny_gen()

        def mk():
            return GeneratorPool(
                [PoolMember(TrainState.create(apply_fn=model.apply,
                                              params=params))],
                PoolConfig(starting_gan_loss=None),
            )

        # Uncalibrated save: gan_threshold is None → NaN on disk.
        pool = mk()
        ckpt.save_checkpoint(
            str(tmp_path / "nan"), "G", pool=pool, d_state=None, epoch=1
        )
        restored, _, _ = ckpt.restore_checkpoint(
            str(tmp_path / "nan"), "G", pool=mk(), d_state=None
        )
        assert restored.gan_threshold is None

        # Legacy (pre-r4) snapshot: meta records carry no gan_threshold.
        legacy = mk()
        orig = GeneratorPool.snapshot
        monkeypatch.setattr(
            GeneratorPool, "snapshot",
            lambda self: [
                {k: v for k, v in rec.items() if k != "gan_threshold"}
                for rec in orig(self)
            ],
        )
        ckpt.save_checkpoint(
            str(tmp_path / "legacy"), "G", pool=legacy, d_state=None,
            epoch=1,
        )
        monkeypatch.undo()
        restored, _, _ = ckpt.restore_checkpoint(
            str(tmp_path / "legacy"), "G", pool=mk(), d_state=None
        )
        assert restored.gan_threshold is None

    def test_versioned_snapshots_never_overwrite_in_place(self, tmp_path):
        """Crash-safety invariant: a snapshot is NEVER deleted before a
        newer one has committed. Each save lands in a fresh versioned dir
        (a hard kill mid-write can only lose the in-flight one); committed
        predecessors are garbage-collected only afterwards, and restore
        reads the newest committed snapshot."""
        import os

        from srgan_tpu.training import checkpoint as ckpt

        model, params = _tiny_gen()
        pool = GeneratorPool(
            [PoolMember(TrainState.create(apply_fn=model.apply,
                                          params=params))],
            PoolConfig(),
        )

        p1 = ckpt.save_checkpoint(
            str(tmp_path), "V", pool=pool, d_state=None, epoch=1
        )
        assert os.path.basename(p1) == "V_ckpt@1"
        # async save: the previous committed snapshot must survive until
        # this one commits (it is the only restorable state meanwhile)
        p2 = ckpt.save_checkpoint(
            str(tmp_path), "V", pool=pool, d_state=None, epoch=2,
            block=False,
        )
        assert os.path.isdir(p1)
        ckpt.wait_for_checkpoints()
        # next (blocking) save GCs everything older after it commits
        p3 = ckpt.save_checkpoint(
            str(tmp_path), "V", pool=pool, d_state=None, epoch=3
        )
        assert not os.path.isdir(p1) and not os.path.isdir(p2)
        assert ckpt.latest_ckpt_dir(str(tmp_path), "V") == p3

        # same-epoch re-save (interrupt -> resume -> interrupt again) gets
        # a fresh suffixed dir, not an in-place overwrite
        p3b = ckpt.save_checkpoint(
            str(tmp_path), "V", pool=pool, d_state=None, epoch=3
        )
        assert os.path.basename(p3b) == "V_ckpt@3.1"
        _, _, epoch = ckpt.restore_checkpoint(
            str(tmp_path), "V", pool=pool, d_state=None
        )
        assert epoch == 3

    def test_next_ckpt_dir_never_refills_a_gc_hole(self, tmp_path):
        """Regression: after GC frees a LOW slot (@7 deleted once @7.1
        committed), a later same-epoch save must claim @7.2 — re-filling
        the @7 hole would sort the NEW snapshot below the OLDER @7.1, and
        every restore would silently load stale state."""
        import os

        from srgan_tpu.training.checkpoint import _next_ckpt_dir

        os.makedirs(str(tmp_path / "H_ckpt@7.1"))  # survivor of a GC cycle
        assert os.path.basename(
            _next_ckpt_dir(str(tmp_path), "H", 7)
        ) == "H_ckpt@7.2"
        # an in-flight orbax write owns its final name: never claim it
        os.makedirs(str(tmp_path / "H_ckpt@3.orbax-checkpoint-tmp-99"))
        assert os.path.basename(
            _next_ckpt_dir(str(tmp_path), "H", 3)
        ) == "H_ckpt@3.1"
        # longer epoch numbers sharing the prefix are a different epoch
        os.makedirs(str(tmp_path / "H_ckpt@70"))
        assert os.path.basename(
            _next_ckpt_dir(str(tmp_path), "H", 7)
        ) == "H_ckpt@7.2"
        assert os.path.basename(
            _next_ckpt_dir(str(tmp_path), "H", 70)
        ) == "H_ckpt@70.1"

    def test_latest_ckpt_dir_prefers_versioned_over_legacy(self, tmp_path):
        import os

        from srgan_tpu.training.checkpoint import latest_ckpt_dir

        assert latest_ckpt_dir(str(tmp_path), "L") is None
        os.makedirs(str(tmp_path / "L_ckpt"))  # legacy fixed-name dir
        assert latest_ckpt_dir(str(tmp_path), "L").endswith("L_ckpt")
        os.makedirs(str(tmp_path / "L_ckpt@4"))
        os.makedirs(str(tmp_path / "L_ckpt@10"))  # numeric, not lexical
        # in-flight orbax tmp dirs are not committed snapshots
        os.makedirs(str(tmp_path / "L_ckpt@11.orbax-checkpoint-tmp-123"))
        assert latest_ckpt_dir(str(tmp_path), "L").endswith("L_ckpt@10")

    def test_finetune_entry(self):
        from srgan_tpu.training.checkpoint import FINETUNE_PREFIX, finetune_entry

        cfg = TrainConfig(lr_generator=1e-4, lr_discriminator=5e-5)
        out = finetune_entry(cfg)
        assert out.lr_generator == pytest.approx(2e-5)
        assert out.lr_discriminator == pytest.approx(1e-5)
        assert out.run_prefix == FINETUNE_PREFIX
