"""Geometry unit tests: parity vs scipy.spatial.transform.Rotation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from rohm_tpu.geometry import (
    aa_to_quat,
    aa_to_rotmat,
    qbetween,
    qinv,
    qmul,
    qrot,
    quat_to_aa,
    quat_to_rotmat,
    rot6d_to_rotmat,
    rotmat_to_aa,
    rotmat_to_quat,
    rotmat_to_rot6d,
    skew_angular_velocity,
)


def random_rotvecs(rng, n=64, scale=np.pi * 0.9):
    v = rng.normal(size=(n, 3))
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    angles = rng.uniform(-scale, scale, size=(n, 1))
    return (v * angles).astype(np.float32)


def quat_allclose(q1, q2, atol=1e-5):
    """Quaternions are equal up to sign."""
    d = np.minimum(np.abs(q1 - q2).max(-1), np.abs(q1 + q2).max(-1))
    np.testing.assert_array_less(d, atol)


class TestAaRotmat:
    def test_aa_to_rotmat_vs_scipy(self, rng):
        aa = random_rotvecs(rng)
        got = np.asarray(aa_to_rotmat(jnp.asarray(aa)))
        want = R.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_aa_to_rotmat_near_zero(self):
        aa = jnp.asarray([[0.0, 0.0, 0.0], [1e-8, -1e-8, 1e-8]])
        got = np.asarray(aa_to_rotmat(aa))
        np.testing.assert_allclose(got, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)

    def test_rotmat_to_aa_roundtrip(self, rng):
        aa = random_rotvecs(rng)
        back = np.asarray(rotmat_to_aa(aa_to_rotmat(jnp.asarray(aa))))
        np.testing.assert_allclose(back, aa, atol=1e-4)

    def test_rotmat_to_aa_vs_scipy(self, rng):
        aa = random_rotvecs(rng)
        m = R.from_rotvec(aa).as_matrix().astype(np.float32)
        got = np.asarray(rotmat_to_aa(jnp.asarray(m)))
        np.testing.assert_allclose(got, aa, atol=1e-4)

    def test_grad_finite_everywhere(self, rng):
        # guidance path differentiates rotmat_to_aa; check no NaN grads
        aa = np.concatenate([random_rotvecs(rng, 8), np.zeros((1, 3), np.float32)])

        def loss(a):
            return jnp.sum(rotmat_to_aa(aa_to_rotmat(a)) ** 2)

        g = jax.grad(loss)(jnp.asarray(aa))
        assert np.isfinite(np.asarray(g)).all()


class TestQuat:
    def test_quat_rotmat_vs_scipy(self, rng):
        aa = random_rotvecs(rng)
        q_scipy = R.from_rotvec(aa).as_quat()  # xyzw
        q_wxyz = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=-1).astype(np.float32)
        got = np.asarray(quat_to_rotmat(jnp.asarray(q_wxyz)))
        np.testing.assert_allclose(got, R.from_rotvec(aa).as_matrix(), atol=1e-5)

    def test_rotmat_to_quat_roundtrip(self, rng):
        aa = random_rotvecs(rng)
        m = R.from_rotvec(aa).as_matrix().astype(np.float32)
        q = np.asarray(rotmat_to_quat(jnp.asarray(m)))
        m2 = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        np.testing.assert_allclose(m2, m, atol=1e-4)

    def test_aa_quat_roundtrip(self, rng):
        aa = random_rotvecs(rng)
        back = np.asarray(quat_to_aa(aa_to_quat(jnp.asarray(aa))))
        np.testing.assert_allclose(back, aa, atol=1e-4)

    def test_qmul_qinv_identity(self, rng):
        aa = random_rotvecs(rng)
        q = aa_to_quat(jnp.asarray(aa))
        ident = np.asarray(qmul(q, qinv(q)))
        want = np.tile(np.array([1.0, 0, 0, 0], np.float32), (len(aa), 1))
        np.testing.assert_allclose(ident, want, atol=1e-5)

    def test_qrot_matches_matrix(self, rng):
        aa = random_rotvecs(rng)
        v = rng.normal(size=(len(aa), 3)).astype(np.float32)
        q = aa_to_quat(jnp.asarray(aa))
        got = np.asarray(qrot(q, jnp.asarray(v)))
        want = np.einsum("nij,nj->ni", R.from_rotvec(aa).as_matrix(), v)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_qbetween(self, rng):
        v0 = rng.normal(size=(32, 3)).astype(np.float32)
        v1 = rng.normal(size=(32, 3)).astype(np.float32)
        q = qbetween(jnp.asarray(v0), jnp.asarray(v1))
        rotated = np.asarray(qrot(q, jnp.asarray(v0)))
        # direction should align with v1
        cos = np.sum(rotated * v1, -1) / (
            np.linalg.norm(rotated, axis=-1) * np.linalg.norm(v1, axis=-1)
        )
        np.testing.assert_allclose(cos, 1.0, atol=1e-4)


class TestRot6d:
    def test_roundtrip(self, rng):
        aa = random_rotvecs(rng)
        m = R.from_rotvec(aa).as_matrix().astype(np.float32)
        six = rotmat_to_rot6d(jnp.asarray(m))
        back = np.asarray(rot6d_to_rotmat(six))
        np.testing.assert_allclose(back, m, atol=1e-5)

    def test_layout_matches_reference(self, rng):
        # reference: smplx_rot_6d = rotmat[..., :-1].reshape(-1, 6)
        m = R.from_rotvec(random_rotvecs(rng, 4)).as_matrix().astype(np.float32)
        want = m[..., :-1].reshape(-1, 6)
        got = np.asarray(rotmat_to_rot6d(jnp.asarray(m)))
        np.testing.assert_allclose(got, want, atol=0)

    def test_gram_schmidt_on_noisy_input(self, rng):
        six = rng.normal(size=(64, 6)).astype(np.float32)
        m = np.asarray(rot6d_to_rotmat(jnp.asarray(six)))
        # valid rotations: orthonormal, det +1
        ident = np.einsum("nij,nkj->nik", m, m)
        np.testing.assert_allclose(ident, np.broadcast_to(np.eye(3), m.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


class TestAngularVelocity:
    def test_constant_spin(self):
        # spin about z at w rad/frame: w_vec ~= (0, 0, w)
        w = 0.12
        t = np.arange(10, dtype=np.float32)
        aa = np.stack([np.zeros_like(t), np.zeros_like(t), w * t], axis=-1)
        mats = R.from_rotvec(aa).as_matrix().astype(np.float32)
        drdt = mats[1:] - mats[:-1]
        got = np.asarray(skew_angular_velocity(jnp.asarray(mats[:-1]), jnp.asarray(drdt)))
        np.testing.assert_allclose(got[:, 2], w, atol=1e-3)
        np.testing.assert_allclose(got[:, :2], 0.0, atol=1e-5)


@pytest.mark.parametrize("shape", [(5, 7), (2, 3, 4)])
def test_batch_shapes(shape, rng):
    aa = rng.normal(size=shape + (3,)).astype(np.float32) * 0.5
    m = aa_to_rotmat(jnp.asarray(aa))
    assert m.shape == shape + (3, 3)
    assert rotmat_to_aa(m).shape == shape + (3,)
    assert rotmat_to_quat(m).shape == shape + (4,)
    assert rotmat_to_rot6d(m).shape == shape + (6,)


class TestQuatExtras:
    def test_qeuler_roundtrip_vs_scipy(self):
        from scipy.spatial.transform import Rotation as R

        from rohm_tpu.geometry import qeuler
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        rotvec = rng.normal(scale=0.4, size=(50, 3))
        r = R.from_rotvec(rotvec)
        q_xyzw = r.as_quat()
        q = np.concatenate([q_xyzw[:, 3:4], q_xyzw[:, :3]], axis=-1)  # wxyz
        ours = np.asarray(qeuler(jnp.asarray(q), "xyz", deg=False))
        # scipy intrinsic XYZ
        ref = r.as_euler("XYZ")
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_qfix_continuity(self):
        from rohm_tpu.geometry import qfix
        import jax.numpy as jnp

        q = np.tile(np.array([1.0, 0, 0, 0]), (6, 1))
        q[3] *= -1  # sign flip mid-sequence
        fixed = np.asarray(qfix(jnp.asarray(q)))
        dots = np.sum(fixed[1:] * fixed[:-1], axis=-1)
        assert (dots >= 0).all()

    def test_qslerp_endpoints_and_midpoint(self):
        from scipy.spatial.transform import Rotation as R

        from rohm_tpu.geometry import qslerp
        import jax.numpy as jnp

        q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0])
        r1 = R.from_euler("z", 90, degrees=True)
        x, y, z, w = r1.as_quat()
        q1 = jnp.asarray([w, x, y, z])
        np.testing.assert_allclose(np.asarray(qslerp(q0, q1, 0.0)), np.asarray(q0), atol=1e-6)
        np.testing.assert_allclose(np.asarray(qslerp(q0, q1, 1.0)), np.asarray(q1), atol=1e-6)
        mid = np.asarray(qslerp(q0, q1, 0.5))
        r_mid = R.from_euler("z", 45, degrees=True)
        x, y, z, w = r_mid.as_quat()
        np.testing.assert_allclose(mid, [w, x, y, z], atol=1e-6)

    def test_euler_quat_roundtrip(self):
        from rohm_tpu.geometry import euler_to_quat, qeuler
        import jax.numpy as jnp

        rng = np.random.default_rng(1)
        e = rng.uniform(-1.0, 1.0, size=(20, 3))
        q = euler_to_quat(jnp.asarray(e), "xyz")
        back = np.asarray(qeuler(q, "xyz", deg=False))
        np.testing.assert_allclose(back, e, atol=1e-5)

    @pytest.mark.parametrize("order", ["xyz", "yzx", "zxy", "xzy", "yxz", "zyx"])
    def test_qeuler_all_orders_vs_reference(self, order):
        """Parity with the REAL reference qeuler for all six Euler orders
        (reference data_loaders/common/quaternion.py:74-122)."""
        torch = pytest.importorskip("torch")
        import sys

        sys.path.insert(0, "/root/reference")
        try:
            from data_loaders.common.quaternion import qeuler as ref_qeuler
        finally:
            sys.path.remove("/root/reference")

        from rohm_tpu.geometry import qeuler

        rng = np.random.default_rng(7)
        q = rng.normal(size=(128, 4))
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
        ours_rad = np.asarray(qeuler(jnp.asarray(q, dtype=jnp.float32), order, deg=False))
        ours_deg = np.asarray(qeuler(jnp.asarray(q, dtype=jnp.float32), order, deg=True))
        qt = torch.from_numpy(q).double()
        ref_rad = ref_qeuler(qt, order, deg=False).numpy()
        ref_deg = ref_qeuler(qt, order, deg=True).numpy()
        np.testing.assert_allclose(ours_rad, ref_rad, atol=3e-5)
        np.testing.assert_allclose(ours_deg, ref_deg, atol=2e-3)

    @pytest.mark.parametrize("order", ["xyz", "yzx", "zxy", "xzy", "yxz", "zyx"])
    def test_euler_quat_roundtrip_all_orders(self, order):
        from rohm_tpu.geometry import euler_to_quat, qeuler

        rng = np.random.default_rng(2)
        e = rng.uniform(-1.0, 1.0, size=(20, 3))
        q = euler_to_quat(jnp.asarray(e), order)
        back = np.asarray(qeuler(q, order, deg=False))
        np.testing.assert_allclose(back, e, atol=1e-5)
