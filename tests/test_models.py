"""Model tests: TrajNet/ControlNet/PoseNet shapes + key structural properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rohm_tpu.body import synthetic_model
from rohm_tpu.models import PoseNet, TrajNet
from rohm_tpu.models.guidance import guidance_grad_mask, skating_loss_fn
from rohm_tpu.models.losses import posenet_losses, trajnet_losses


@pytest.fixture(scope="module")
def body():
    return synthetic_model(num_verts=128, seed=0)


MID = 64  # small mid_dim for test speed (real config: 512)


class TestTrajNet:
    def test_output_shape(self):
        model = TrajNet(traj_feat_dim=13, cond_dim=13, mid_dim=MID)
        x = jnp.zeros((2, 32, 13))
        cond = jnp.zeros((2, 32, 13))
        t = jnp.array([5, 9])
        params = model.init(jax.random.PRNGKey(0), x, cond, t)
        out = model.apply(params, x, cond, t)
        assert out.shape == (2, 32, 13)

    def test_controlnet_zero_init_matches_backbone(self):
        """With zero-init taps, a TrajControl model must reproduce the vanilla
        U-Net output when given the same backbone weights (the ControlNet
        property: fine-tuning starts as an exact copy)."""
        vanilla = TrajNet(traj_feat_dim=13, cond_dim=13, mid_dim=MID, trajcontrol=False)
        control = TrajNet(traj_feat_dim=13, cond_dim=13, mid_dim=MID, trajcontrol=True)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 13)), jnp.float32)
        cond = jnp.asarray(np.random.default_rng(1).normal(size=(1, 32, 13)), jnp.float32)
        cc = jnp.asarray(np.random.default_rng(2).normal(size=(1, 32, 272)), jnp.float32)
        t = jnp.array([3])

        pv = vanilla.init(jax.random.PRNGKey(0), x, cond, t)
        pc = control.init(jax.random.PRNGKey(0), x, cond, t, control_cond=cc)
        # graft vanilla weights into the control model's shared modules
        pc_dict = jax.tree_util.tree_map(lambda a: a, pc)  # copy
        merged = {"params": dict(pc_dict["params"])}
        for k, v in pv["params"].items():
            merged["params"][k] = v

        out_v = vanilla.apply(pv, x, cond, t)
        out_c = control.apply(merged, x, cond, t, control_cond=cc)
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_v), atol=1e-5)

    def test_scalar_t(self):
        model = TrajNet(traj_feat_dim=13, cond_dim=13, mid_dim=MID)
        x = jnp.zeros((2, 16, 13))
        params = model.init(jax.random.PRNGKey(0), x, x, jnp.array(3))
        out = model.apply(params, x, x, jnp.array(3))
        assert out.shape == (2, 16, 13)


class TestConvImpl:
    def test_im2col_matches_native_conv(self):
        # Im2colConv must be a drop-in for nn.Conv inside Conv1dBlock:
        # identical param tree (path + shapes) and identical math (outputs
        # and grads to f32 rounding), so checkpoints interchange between
        # conv_impl settings
        from rohm_tpu.models.blocks import Conv1dBlock

        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 9, 8)), jnp.float32
        )
        key = jax.random.PRNGKey(1)
        variants = {}
        for k in (4, 5):  # even k exercises the asymmetric SAME pad
            native = Conv1dBlock(16, kernel_size=k, conv_impl="native")
            im2col = Conv1dBlock(16, kernel_size=k, conv_impl="im2col")
            p = native.init(key, x)
            assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
                im2col.init(key, x)
            )
            np.testing.assert_allclose(
                np.asarray(native.apply(p, x)),
                np.asarray(im2col.apply(p, x)),
                atol=1e-5,
            )
            variants[k] = (native, im2col, p)
        native, im2col, p = variants[5]
        ga = jax.grad(lambda q: jnp.sum(native.apply(q, x) ** 2))(p)
        gb = jax.grad(lambda q: jnp.sum(im2col.apply(q, x) ** 2))(p)
        for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_im2col_matches_native_conv_bf16(self):
        # the stated motivation for im2col is the bf16 backward path on v5e
        # (scripts/bench_conv_im2col.py), so the parity envelope must be
        # bounded in bf16 too: unfold+matmul and XLA conv round differently
        # under bf16 accumulation. Outputs and grads compared against the
        # shared f32 native result with a bf16-scale tolerance (mirrors the
        # bf16 kernel-numerics tests' envelope style).
        from rohm_tpu.models.blocks import Conv1dBlock

        x = jnp.asarray(
            np.random.default_rng(3).normal(size=(2, 9, 8)), jnp.float32
        )
        key = jax.random.PRNGKey(1)
        ref32 = Conv1dBlock(16, kernel_size=5, conv_impl="native")
        p = ref32.init(key, x)
        out_ref = np.asarray(ref32.apply(p, x))
        scale = np.abs(out_ref).max()

        outs, grads = {}, {}
        for impl in ("native", "im2col"):
            m = Conv1dBlock(16, kernel_size=5, conv_impl=impl, dtype=jnp.bfloat16)
            outs[impl] = np.asarray(m.apply(p, x), np.float32)
            g = jax.grad(lambda q: jnp.sum(m.apply(q, x).astype(jnp.float32) ** 2))(p)
            grads[impl] = [np.asarray(a, np.float32) for a in jax.tree_util.tree_leaves(g)]
        # each bf16 impl within bf16 rounding of the f32 reference...
        for impl in outs:
            assert np.abs(outs[impl] - out_ref).max() < 0.05 * scale, impl
        # ...and within bf16 rounding of each other (outputs and grads)
        np.testing.assert_allclose(outs["native"], outs["im2col"],
                                   atol=0.03 * scale)
        for a, b in zip(grads["native"], grads["im2col"]):
            tol = 0.03 * max(np.abs(a).max(), 1e-3)
            np.testing.assert_allclose(a, b, atol=tol)

    def test_trajnet_forward_agrees_across_conv_impl(self):
        # whole-model check through the module-level default switch
        from rohm_tpu.models import blocks

        x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 16, 13)), jnp.float32)
        t = jnp.asarray([3, 7], jnp.int32)
        model = TrajNet(traj_feat_dim=13, cond_dim=13, mid_dim=MID)
        params = model.init(jax.random.PRNGKey(0), x, x, t)
        out_native = model.apply(params, x, x, t)
        old = blocks.DEFAULT_CONV_IMPL
        try:
            blocks.DEFAULT_CONV_IMPL = "im2col"
            out_im2col = model.apply(params, x, x, t)
        finally:
            blocks.DEFAULT_CONV_IMPL = old
        np.testing.assert_allclose(
            np.asarray(out_native), np.asarray(out_im2col), atol=1e-4
        )


class TestPoseNet:
    def test_output_shape_and_traj_passthrough(self):
        model = PoseNet(latent_dim=64, ff_size=128, num_layers=2, num_heads=4)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 17, 294)), jnp.float32)  # odd T fine
        cond = jnp.asarray(rng.normal(size=(2, 17, 294)), jnp.float32)
        t = jnp.array([10, 999])
        params = model.init(jax.random.PRNGKey(0), x, cond, t)
        out = model.apply(params, x, cond, t)
        assert out.shape == (2, 17, 294)
        # first 22 dims are the given traj from cond, passed through verbatim
        np.testing.assert_array_equal(np.asarray(out[..., :22]), np.asarray(cond[..., :22]))

    def test_timestep_changes_output(self):
        model = PoseNet(latent_dim=64, ff_size=128, num_layers=2, num_heads=4)
        x = jnp.ones((1, 8, 294))
        params = model.init(jax.random.PRNGKey(0), x, x, jnp.array([0]))
        o1 = model.apply(params, x, x, jnp.array([0]))
        o2 = model.apply(params, x, x, jnp.array([500]))
        assert np.abs(np.asarray(o1[..., 22:]) - np.asarray(o2[..., 22:])).max() > 1e-4

    def test_dropout_only_in_train(self):
        model = PoseNet(latent_dim=64, ff_size=128, num_layers=2, num_heads=4, dropout=0.5)
        x = jnp.ones((1, 8, 294))
        params = model.init(jax.random.PRNGKey(0), x, x, jnp.array([0]))
        e1 = model.apply(params, x, x, jnp.array([0]))
        e2 = model.apply(params, x, x, jnp.array([0]))
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
        t1 = model.apply(params, x, x, jnp.array([0]), train=True, rngs={"dropout": jax.random.PRNGKey(1)})
        t2 = model.apply(params, x, x, jnp.array([0]), train=True, rngs={"dropout": jax.random.PRNGKey(2)})
        assert np.abs(np.asarray(t1[..., 22:]) - np.asarray(t2[..., 22:])).max() > 1e-6


class TestLosses:
    def _fake_batch(self, rng, bs=2, t=8):
        clean = jnp.asarray(rng.normal(size=(bs, t, 294)) * 0.1, jnp.float32)
        mean = jnp.asarray(rng.normal(size=(294,)) * 0.01, jnp.float32)
        std = jnp.asarray(rng.uniform(0.5, 1.5, size=(294,)), jnp.float32)
        return clean, mean, std

    def test_trajnet_losses_finite_and_weighted(self, body, rng):
        clean, mean, std = self._fake_batch(rng)
        out13 = jnp.asarray(rng.normal(size=(2, 8, 13)) * 0.1, jnp.float32)
        weights = {"weight_loss_root_rec_repr": 1.0, "weight_loss_root_pos_global": 100.0}
        ld = trajnet_losses(out13, clean, mean, std, body, weights, repr_abs_only=True)
        for k, v in ld.items():
            assert np.isfinite(float(v)), k
        assert float(ld["loss_root_pos_global_from_rel_traj"]) == 0.0
        want = 1.0 * float(ld["loss_repr_traj"]) + 100.0 * (
            float(ld["loss_root_pos_global_from_abs_traj"])
            + float(ld["loss_root_pos_global_from_smpl"])
        )
        np.testing.assert_allclose(float(ld["loss"]), want, rtol=1e-5)

    @pytest.mark.slow
    def test_trajnet_loss_grad(self, body, rng):
        clean, mean, std = self._fake_batch(rng)
        out13 = jnp.asarray(rng.normal(size=(2, 8, 13)) * 0.1, jnp.float32)
        weights = {"weight_loss_root_rec_repr": 1.0, "weight_loss_root_pos_global": 1.0}

        g = jax.grad(
            lambda o: trajnet_losses(o, clean, mean, std, body, weights)["loss"]
        )(out13)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_posenet_losses_finite(self, body, rng):
        clean, mean, std = self._fake_batch(rng)
        out = jnp.asarray(rng.normal(size=(2, 8, 294)) * 0.1, jnp.float32)
        weights = {
            "weight_loss_rec_repr_full_body": 1.0,
            "weight_loss_repr_foot_contact_mse": 1.0,
            "weight_loss_joint_pos_global": 100.0,
            "weight_loss_foot_skating": 0.1,
        }
        ld = posenet_losses(out, clean, mean, std, body, weights, skating_active=True)
        for k, v in ld.items():
            assert np.isfinite(float(v)), k

        # skating gate off -> total loss excludes exactly the skating terms
        ld_off = posenet_losses(out, clean, mean, std, body, weights, skating_active=False)
        skating_sum = (
            float(ld["loss_foot_skating_from_abs_traj"])
            + float(ld["loss_foot_skating_from_rel_traj"])
            + float(ld["loss_foot_skating_from_smpl"])
        )
        np.testing.assert_allclose(
            float(ld["loss"]), float(ld_off["loss"]) + 0.1 * skating_sum, rtol=1e-5
        )

    def test_perfect_output_zero_repr_loss(self, body, rng):
        clean, mean, std = self._fake_batch(rng)
        ld = posenet_losses(clean, clean, mean, std, body, {"weight_loss_rec_repr_full_body": 1.0})
        assert float(ld["loss_repr_full_body"]) == 0.0
        assert float(ld["loss_joint_pos_global_from_abs_traj"]) < 1e-8


class TestGuidance:
    @pytest.mark.slow
    def test_skating_grad_masked(self, body, rng):
        x = jnp.asarray(rng.normal(size=(1, 8, 294)) * 0.1, jnp.float32)
        mean = jnp.zeros(294)
        std = jnp.ones(294)
        g = jax.grad(lambda v: skating_loss_fn(v, mean, std, body))(x)
        g = g * guidance_grad_mask()
        assert np.isfinite(np.asarray(g)).all()
        np.testing.assert_array_equal(np.asarray(g[..., :22]), 0.0)
        np.testing.assert_array_equal(np.asarray(g[..., -4:]), 0.0)

    def test_skating_grad_finite_at_zero_velocity(self, body):
        """d|v|/dv at v=0 is NaN in jax; the safe-norm in foot_skating_loss
        must keep gradients finite when consecutive frames are bit-identical
        (static feet, plausible under the quantized kernels)."""
        from rohm_tpu.models.losses import foot_skating_loss

        joints = jnp.tile(jnp.ones((1, 1, 22, 3)), (1, 8, 1, 1))  # frozen pose
        contact = jnp.ones((1, 8, 4))
        g = jax.grad(lambda j: foot_skating_loss(j, contact))(joints)
        assert np.isfinite(np.asarray(g)).all()
        assert float(foot_skating_loss(joints, contact)) == 0.0
