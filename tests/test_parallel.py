"""Data-parallel mesh tests on the 8-virtual-device CPU mesh
(SURVEY.md §4(c): the JAX idiom for fake multi-node)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srgan_tpu.config import MeshConfig, ModelConfig
from srgan_tpu.models.srresnet import init_generator
from srgan_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from srgan_tpu.training.steps import generator_pixel_step
from srgan_tpu.training.train_state import TrainState


def _tiny_state(seed=0):
    cfg = ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
    model, params = init_generator(cfg, jax.random.key(seed), sample_hw=(8, 8))
    return TrainState.create(apply_fn=model.apply, params=params)


class TestMesh:
    def test_eight_virtual_devices(self):
        assert len(jax.devices()) == 8

    def test_mesh_creation(self):
        mesh = make_mesh(MeshConfig())
        assert mesh.axis_names == ("data",)
        assert mesh.devices.size == 8

    def test_batch_sharded_step_matches_single_device(self, rng):
        """DP-sharded train step must produce the same update as the
        unsharded one (the DDP-equivalence property)."""
        hr = rng.random((8, 16, 16, 3)).astype(np.float32)
        lr_imgs = rng.random((8, 8, 8, 3)).astype(np.float32)

        # single device
        s1 = _tiny_state()
        s1, m1 = generator_pixel_step(
            s1, jnp.asarray(hr), jnp.asarray(lr_imgs), jnp.asarray(1e-3)
        )

        # sharded over the 8-device data mesh
        mesh = make_mesh(MeshConfig())
        s2 = _tiny_state()
        s2 = s2.replace(
            params=replicate(mesh, s2.params),
            opt_state=replicate(mesh, s2.opt_state),
        )
        hr_s = shard_batch(mesh, jnp.asarray(hr))
        lr_s = shard_batch(mesh, jnp.asarray(lr_imgs))
        s2, m2 = generator_pixel_step(s2, hr_s, lr_s, jnp.asarray(1e-3))

        assert float(m1["g_loss"]) == pytest.approx(float(m2["g_loss"]), rel=1e-5)
        p1 = jax.tree.leaves(jax.tree.map(np.asarray, s1.params))
        p2 = jax.tree.leaves(jax.tree.map(np.asarray, s2.params))
        for a, b in zip(p1, p2):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    def test_output_sharding_preserved(self, rng):
        """Donated, replicated state stays replicated after the step (no
        silent gather onto one device)."""
        mesh = make_mesh(MeshConfig())
        state = _tiny_state()
        state = state.replace(
            params=replicate(mesh, state.params),
            opt_state=replicate(mesh, state.opt_state),
        )
        hr = shard_batch(mesh, jnp.asarray(rng.random((8, 16, 16, 3)), jnp.float32))
        lr_imgs = shard_batch(mesh, jnp.asarray(rng.random((8, 8, 8, 3)), jnp.float32))
        new_state, _ = generator_pixel_step(state, hr, lr_imgs, jnp.asarray(1e-3))
        leaf = jax.tree.leaves(new_state.params)[0]
        assert leaf.sharding.is_fully_replicated


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (1, 128, 128, 3)

    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
