"""Model shape / parameter-count parity tests (SURVEY.md §2, §7 step 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srgan_tpu.config import DiscriminatorConfig, ModelConfig
from srgan_tpu.models import (
    SRResNet,
    init_discriminator,
    init_generator,
)
from srgan_tpu.models.enhancer import enhance


def _count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


class TestSRResNet:
    def test_reference_head_param_count(self):
        """Reference SRResNet(3, 64, 16, 4x) has ~1.55M params
        (``src/models.py:44-87``; GroupNorm affine == BatchNorm affine):
        conv1 15,616 + 16 blocks x 74,112 + conv2 36,928 + 2 upsample
        stages x 147,712 + conv3 15,555 = 1,549,315."""
        _, params = init_generator(
            ModelConfig(head="reference"), jax.random.key(0)
        )
        assert _count(params) == 1_549_315

    def test_subpixel_head_param_count(self):
        """Default subpixel head swaps the 15,555-param conv9x9 tail for a
        76,812-param 5x5 phase conv (same function class, see srresnet.py)."""
        _, params = init_generator(ModelConfig(), jax.random.key(0))
        assert _count(params) == 1_549_315 - 15_555 + 76_812

    def test_head_equivalence(self, rng):
        """subpixel(ref-transformed weights) == reference, pixel for pixel:
        conv9x9∘pixel_shuffle == pixel_shuffle∘conv5x5 under the
        ``reference_head_to_subpixel`` kernel mapping."""
        from srgan_tpu.models.srresnet import reference_head_to_subpixel

        cfg_ref = ModelConfig(
            num_features=8, num_residuals=1, upscale_factor=2, head="reference"
        )
        model_ref, params_ref = init_generator(
            cfg_ref, jax.random.key(0), sample_hw=(8, 8)
        )
        cfg_sub = ModelConfig(
            num_features=8, num_residuals=1, upscale_factor=2, head="subpixel"
        )
        model_sub, params_sub = init_generator(
            cfg_sub, jax.random.key(1), sample_hw=(8, 8)
        )
        # copy everything, transforming the tail conv
        new = dict(params_ref)
        tail_name = sorted(
            k for k in params_ref if k.startswith("Conv_")
        )[-1]
        k5, b12 = reference_head_to_subpixel(
            params_ref[tail_name]["kernel"], params_ref[tail_name]["bias"]
        )
        new[tail_name] = {"kernel": k5, "bias": b12}

        x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
        y_ref = model_ref.apply({"params": params_ref}, x)
        y_sub = model_sub.apply({"params": new}, x)
        np.testing.assert_allclose(
            np.asarray(y_sub), np.asarray(y_ref), rtol=1e-4, atol=1e-5
        )

    def test_coarse_head_equivalence(self, rng):
        """coarse(subpixel-transformed weights) == subpixel, pixel for pixel:
        ps∘conv5x5 == ps∘ps∘conv3x3∘unshuffle under
        ``fold_phase_conv_to_coarse``."""
        from srgan_tpu.models.srresnet import fold_phase_conv_to_coarse

        cfg_s = ModelConfig(num_features=8, num_residuals=1, upscale_factor=4,
                            head="subpixel")
        model_s, params_s = init_generator(cfg_s, jax.random.key(0),
                                           sample_hw=(8, 8))
        cfg_c = ModelConfig(num_features=8, num_residuals=1, upscale_factor=4,
                            head="coarse")
        model_c, params_c = init_generator(cfg_c, jax.random.key(1),
                                           sample_hw=(8, 8))

        new = dict(params_s)
        tail = sorted(k for k in params_s if k.startswith("Conv_"))[-1]
        k3, b48 = fold_phase_conv_to_coarse(
            params_s[tail]["kernel"], params_s[tail]["bias"]
        )
        new[tail] = {"kernel": k3, "bias": b48}

        x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
        y_s = model_s.apply({"params": params_s}, x)
        y_c = model_c.apply({"params": new}, x)
        np.testing.assert_allclose(
            np.asarray(y_c), np.asarray(y_s), rtol=1e-4, atol=1e-5
        )

    def test_coarse_head_2x_falls_back(self):
        """At 2x there is only one shuffle — coarse == subpixel layout."""
        cfg = ModelConfig(num_features=8, num_residuals=1, upscale_factor=2,
                          head="coarse")
        model, params = init_generator(cfg, jax.random.key(0), sample_hw=(8, 8))
        out = model.apply({"params": params}, jnp.zeros((1, 8, 8, 3)))
        assert out.shape == (1, 16, 16, 3)

    def test_8x_upscale(self):
        """log2 staging keeps 8x correct (the reference's ``factor//2`` loop
        would build 4 stages = 16x, SURVEY §2 note)."""
        cfg = ModelConfig(num_features=8, num_residuals=1, upscale_factor=8)
        model, params = init_generator(cfg, jax.random.key(0), sample_hw=(4, 4))
        out = model.apply({"params": params}, jnp.zeros((1, 4, 6, 3)))
        assert out.shape == (1, 32, 48, 3)

    @pytest.mark.parametrize("factor", [2, 4])
    def test_upscale_shapes(self, factor):
        cfg = ModelConfig(num_features=16, num_residuals=2, upscale_factor=factor)
        model, params = init_generator(cfg, jax.random.key(0), sample_hw=(8, 8))
        out = model.apply({"params": params}, jnp.zeros((2, 8, 12, 3)))
        assert out.shape == (2, 8 * factor, 12 * factor, 3)
        assert out.dtype == jnp.float32

    def test_scanned_tower_matches_unrolled(self, rng):
        """The test-only lax.scan tower formulation (see the r3 removal
        note on SRResNet.scan_blocks) computes the identical function:
        stacking the unrolled per-block params along a leading axis and
        running the scanned model reproduces the unrolled output."""
        kw = dict(num_features=8, num_residuals=4, upscale_factor=2)
        unrolled = SRResNet(**kw)
        scanned = SRResNet(scan_blocks=True, **kw)
        x = jnp.asarray(rng.random((1, 12, 16, 3)), jnp.float32)
        params = unrolled.init(jax.random.key(0), x)["params"]

        # stack ResidualBlock_i subtrees into the scan's leading-axis layout
        blocks = [params[f"ResidualBlock_{i}"] for i in range(4)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
        scan_params = {
            k: v for k, v in params.items()
            if not k.startswith("ResidualBlock_")
        }
        scan_params["blocks"] = {"ResidualBlock_0": stacked}
        # the scan template must structurally match: verify by init
        template = scanned.init(jax.random.key(1), x)["params"]
        assert jax.tree.structure(template) == jax.tree.structure(
            scan_params
        ), "scan param layout drifted from the stacked-unrolled mapping"

        out_unrolled = unrolled.apply({"params": params}, x)
        out_scanned = scanned.apply({"params": scan_params}, x)
        np.testing.assert_allclose(
            np.asarray(out_scanned), np.asarray(out_unrolled),
            rtol=1e-5, atol=1e-5,
        )

    def test_fully_convolutional(self):
        """Any spatial size works (reference ``models.py:80-87``)."""
        cfg = ModelConfig(num_features=8, num_residuals=1, upscale_factor=2)
        model, params = init_generator(cfg, jax.random.key(0), sample_hw=(8, 8))
        out = model.apply({"params": params}, jnp.zeros((1, 17, 23, 3)))
        assert out.shape == (1, 34, 46, 3)

    def test_bfloat16_compute_float32_params(self):
        cfg = ModelConfig(
            num_features=8, num_residuals=1, upscale_factor=2,
            compute_dtype="bfloat16",
        )
        model, params = init_generator(cfg, jax.random.key(0), sample_hw=(8, 8))
        for leaf in jax.tree.leaves(params):
            assert leaf.dtype == jnp.float32
        out = model.apply({"params": params}, jnp.zeros((1, 8, 8, 3)))
        assert out.dtype == jnp.float32


class TestDiscriminator:
    def test_param_count(self):
        """Reference Discriminator(3, 64) = 2,765,760 params
        (``src/models.py:90-120``; InstanceNorm has no affine params)."""
        _, params = init_discriminator(DiscriminatorConfig(), jax.random.key(0))
        assert _count(params) == 2_765_760

    def test_patch_output_shape_512x1024(self):
        """Reference: (B, 512, 1, 3) NCHW for a 512x1024 input → NHWC
        (B, 1, 3, 512) (SURVEY.md §2)."""
        model, params = init_discriminator(
            DiscriminatorConfig(), jax.random.key(0), sample_hw=(512, 1024)
        )
        out = model.apply({"params": params}, jnp.zeros((1, 512, 1024, 3)))
        assert out.shape == (1, 1, 3, 512)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # sigmoid

    def test_min_size_guard(self):
        model, params = init_discriminator(DiscriminatorConfig(), jax.random.key(0))
        with pytest.raises(ValueError, match="too small"):
            model.apply({"params": params}, jnp.zeros((1, 64, 64, 3)))

    def test_min_input_size_exact(self):
        """428 is the exact floor for the reference's 4-stage stack: 428
        reaches a 1x1 patch output, 427 dies in the final pool."""
        from srgan_tpu.models.discriminator import min_input_size

        assert min_input_size(4) == 428
        model, params = init_discriminator(
            DiscriminatorConfig(), jax.random.key(0), sample_hw=(428, 428)
        )
        out = model.apply({"params": params}, jnp.zeros((1, 428, 428, 3)))
        assert out.shape == (1, 1, 1, 512)

    def test_shallow_discriminator(self):
        """num_stages knob: a 2-stage critic works on small (>=28px) images."""
        cfg = DiscriminatorConfig(num_filters=8, num_stages=2)
        model, params = init_discriminator(cfg, jax.random.key(0))
        out = model.apply({"params": params}, jnp.zeros((2, 32, 32, 3)))
        assert out.shape[0] == 2 and out.shape[-1] == 16


class TestEnhancer:
    def test_shape_and_clamp(self, rng):
        x = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
        out = enhance(x)
        assert out.shape == x.shape
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


class TestCheckpointPortability:
    def test_remat_flag_does_not_change_param_tree(self):
        """remat is a compute-schedule choice; the checkpoint format must
        not depend on it (nn.remat's auto-naming would otherwise rename
        blocks to CheckpointResidualBlock_N, breaking cross-phase
        restores that toggle --remat)."""
        import jax
        import numpy as np

        from srgan_tpu.config import ModelConfig
        from srgan_tpu.models.srresnet import init_generator

        trees = {}
        for remat in (False, True):
            cfg = ModelConfig(num_features=8, num_residuals=2, remat=remat)
            model, params = init_generator(
                cfg, jax.random.key(0), sample_hw=(8, 8)
            )
            trees[remat] = (model, params)
        flat_a = jax.tree_util.tree_structure(trees[False][1])
        flat_b = jax.tree_util.tree_structure(trees[True][1])
        assert flat_a == flat_b
        # and the remat model runs plain-trained params identically
        import jax.numpy as jnp

        x = jnp.ones((1, 8, 8, 3))
        a = trees[False][0].apply({"params": trees[False][1]}, x)
        b = trees[True][0].apply({"params": trees[False][1]}, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestConfigValidation:
    """Misconfigurations must fail loudly at init, not train a silently
    different architecture or emit the wrong scale."""

    def test_bad_norm_string_raises(self):
        cfg = ModelConfig(num_features=8, num_residuals=1, norm="Group")
        with pytest.raises(ValueError, match="norm"):
            init_generator(cfg, jax.random.key(0), sample_hw=(8, 8))

    def test_bad_head_string_raises(self):
        """A typo'd head must not silently build the subpixel default and
        bake itself into the sidecar (same contract as norm)."""
        for bad in ("Reference", "subpixl", ""):
            cfg = ModelConfig(num_features=8, num_residuals=1, head=bad)
            with pytest.raises(ValueError, match="head"):
                init_generator(cfg, jax.random.key(0), sample_hw=(8, 8))

    def test_non_power_of_two_upscale_raises(self):
        for bad in (1, 3, 6):
            cfg = ModelConfig(
                num_features=8, num_residuals=1, upscale_factor=bad
            )
            with pytest.raises(ValueError, match="power of two"):
                init_generator(cfg, jax.random.key(0), sample_hw=(8, 8))

    def test_discriminator_stage_bounds(self):
        from srgan_tpu.config import DiscriminatorConfig
        from srgan_tpu.models.discriminator import init_discriminator

        for bad in (0, 5):
            with pytest.raises(ValueError, match="num_stages"):
                init_discriminator(
                    DiscriminatorConfig(num_filters=8, num_stages=bad),
                    jax.random.key(0), sample_hw=(512, 512),
                )

    def test_vgg_unknown_layer_raises(self):
        from srgan_tpu.models.vgg import init_vgg_extractor

        with pytest.raises(ValueError, match="conv4_4"):
            init_vgg_extractor(
                jax.random.key(0), layers=("conv3_3", "conv4_4")
            )
