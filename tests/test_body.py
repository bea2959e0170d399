"""SMPL-X body model tests.

Parity oracle: an independent numpy LBS implementation (4x4 homogeneous
matrix composition, scipy rotations) written directly from the published
SMPL/SMPL-X formulation — a different code path from the einsum/unrolled-chain
JAX implementation under test.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from rohm_tpu.body import (
    NUM_BODY_JOINTS,
    NUM_JOINTS,
    SMPLX_PARENTS,
    forward_joints,
    forward_vertices,
    synthetic_model,
)


def numpy_lbs(model, betas, global_orient, body_pose, transl):
    """Reference LBS oracle (single sample), returns (verts, joints55)."""
    v_template = np.asarray(model.v_template, np.float64)
    shapedirs = np.asarray(model.shapedirs, np.float64)
    posedirs = np.asarray(model.posedirs, np.float64)
    j_regressor = np.asarray(model.j_regressor, np.float64)
    weights = np.asarray(model.lbs_weights, np.float64)

    v_shaped = v_template + shapedirs @ betas
    joints = j_regressor @ v_shaped  # [55, 3]

    aa = np.concatenate([global_orient[None], body_pose.reshape(21, 3)], axis=0)
    rot = np.tile(np.eye(3), (NUM_JOINTS, 1, 1))
    rot[:22] = R.from_rotvec(aa).as_matrix()

    # chain of homogeneous transforms
    world = np.zeros((NUM_JOINTS, 4, 4))
    world[0] = np.eye(4)
    world[0, :3, :3] = rot[0]
    world[0, :3, 3] = joints[0]
    for j in range(1, NUM_JOINTS):
        p = SMPLX_PARENTS[j]
        local = np.eye(4)
        local[:3, :3] = rot[j]
        local[:3, 3] = joints[j] - joints[p]
        world[j] = world[p] @ local
    posed_joints = world[:, :3, 3]

    # remove rest-joint contribution for skinning
    a = world.copy()
    for j in range(NUM_JOINTS):
        a[j, :3, 3] -= world[j, :3, :3] @ joints[j]

    pose_feature = (rot[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + (pose_feature @ posedirs).reshape(v_shaped.shape)

    tf = np.einsum("vj,jab->vab", weights, a)
    verts = np.einsum("vab,vb->va", tf[:, :3, :3], v_posed) + tf[:, :3, 3]
    return verts + transl, posed_joints + transl


class TestForward:
    def setup_method(self):
        self.model = synthetic_model(num_verts=256, seed=0)
        rng = np.random.default_rng(1)
        self.betas = rng.normal(scale=0.5, size=(10,))
        self.global_orient = rng.normal(scale=0.8, size=(3,))
        self.body_pose = rng.normal(scale=0.3, size=(63,))
        self.transl = rng.normal(size=(3,))

    def test_joints_match_oracle(self):
        _, want = numpy_lbs(
            self.model, self.betas, self.global_orient, self.body_pose, self.transl
        )
        got = np.asarray(
            forward_joints(
                self.model,
                jnp.asarray(self.betas, jnp.float32),
                jnp.asarray(self.global_orient, jnp.float32),
                jnp.asarray(self.body_pose, jnp.float32),
                jnp.asarray(self.transl, jnp.float32),
                num_joints=NUM_JOINTS,
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_first22_equal_full(self):
        args = (
            jnp.asarray(self.betas, jnp.float32),
            jnp.asarray(self.global_orient, jnp.float32),
            jnp.asarray(self.body_pose, jnp.float32),
            jnp.asarray(self.transl, jnp.float32),
        )
        j22 = forward_joints(self.model, *args, num_joints=NUM_BODY_JOINTS)
        j55 = forward_joints(self.model, *args, num_joints=NUM_JOINTS)
        np.testing.assert_allclose(np.asarray(j22), np.asarray(j55)[:22], atol=1e-6)

    def test_vertices_match_oracle(self):
        want_v, want_j = numpy_lbs(
            self.model, self.betas, self.global_orient, self.body_pose, self.transl
        )
        got_v, got_j = forward_vertices(
            self.model,
            jnp.asarray(self.betas, jnp.float32),
            jnp.asarray(self.global_orient, jnp.float32),
            jnp.asarray(self.body_pose, jnp.float32),
            jnp.asarray(self.transl, jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(got_j), want_j, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_v), want_v, atol=2e-5)

    def test_rest_pose_identity(self):
        got = forward_joints(
            self.model,
            jnp.zeros(10),
            jnp.zeros(3),
            jnp.zeros(63),
            jnp.zeros(3),
            num_joints=NUM_JOINTS,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(self.model.j_template), atol=1e-6
        )

    def test_global_orient_rotates_about_pelvis(self):
        aa = np.array([0.3, -0.2, 0.5])
        rest = np.asarray(self.model.j_template)[:NUM_BODY_JOINTS]
        got = np.asarray(
            forward_joints(
                self.model, jnp.zeros(10), jnp.asarray(aa, jnp.float32), jnp.zeros(63), jnp.zeros(3)
            )
        )
        want = rest[0] + (rest - rest[0]) @ R.from_rotvec(aa).as_matrix().T
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_batched_and_jit(self):
        bs, t = 3, 5
        rng = np.random.default_rng(2)
        betas = jnp.asarray(rng.normal(scale=0.3, size=(bs, t, 10)), jnp.float32)
        go = jnp.asarray(rng.normal(scale=0.5, size=(bs, t, 3)), jnp.float32)
        bp = jnp.asarray(rng.normal(scale=0.2, size=(bs, t, 63)), jnp.float32)
        tr = jnp.asarray(rng.normal(size=(bs, t, 3)), jnp.float32)
        fn = jax.jit(lambda *a: forward_joints(self.model, *a))
        out = fn(betas, go, bp, tr)
        assert out.shape == (bs, t, NUM_BODY_JOINTS, 3)
        # element [1,2] equals unbatched call
        single = forward_joints(self.model, betas[1, 2], go[1, 2], bp[1, 2], tr[1, 2])
        np.testing.assert_allclose(np.asarray(out[1, 2]), np.asarray(single), atol=1e-5)

    def test_guidance_grads_finite(self):
        def loss(bp):
            j = forward_joints(
                self.model,
                jnp.asarray(self.betas, jnp.float32),
                jnp.asarray(self.global_orient, jnp.float32),
                bp,
                jnp.asarray(self.transl, jnp.float32),
            )
            return jnp.sum(j**2)

        g = jax.grad(loss)(jnp.asarray(self.body_pose, jnp.float32))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestLoadSmplxNpz:
    """Round-trip the real SMPLX_NEUTRAL.npz on-disk layout through
    load_smplx_npz (reference loads the same file via the smplx package,
    smplx/body_models.py SMPLX.__init__). The file stores shapedirs with 400
    components (300 shape + 100 expression; loader truncates to 10 betas),
    posedirs as [V, 3, 486] (model stores the transposed [486, V*3]),
    kintree_table as uint32 with 2**32-1 at the root, and faces under 'f'."""

    def _write_npz(self, path, src, rng):
        v = src.num_verts
        shapedirs400 = np.zeros((v, 3, 400), np.float64)
        shapedirs400[..., :10] = np.asarray(src.shapedirs, np.float64)
        shapedirs400[..., 10:] = rng.normal(size=(v, 3, 390)) * 0.01  # expr/extra
        posedirs_file = (
            np.asarray(src.posedirs, np.float64).T.reshape(v, 3, 486)
        )
        kintree = np.zeros((2, NUM_JOINTS), np.uint32)
        kintree[0] = np.array([2**32 - 1] + list(SMPLX_PARENTS[1:]), np.int64).astype(np.uint32)
        kintree[1] = np.arange(NUM_JOINTS, dtype=np.uint32)
        faces = rng.integers(0, v, size=(2 * v, 3)).astype(np.uint32)
        np.savez(
            path,
            v_template=np.asarray(src.v_template, np.float64),
            shapedirs=shapedirs400,
            posedirs=posedirs_file,
            J_regressor=np.asarray(src.j_regressor, np.float64),
            weights=np.asarray(src.lbs_weights, np.float64),
            kintree_table=kintree,
            f=faces,
        )
        return faces

    def test_roundtrip_matches_direct_model(self, tmp_path):
        from rohm_tpu.body import load_smplx_npz

        rng = np.random.default_rng(7)
        src = synthetic_model(num_verts=96)
        path = str(tmp_path / "SMPLX_NEUTRAL.npz")
        faces = self._write_npz(path, src, rng)

        loaded = load_smplx_npz(path)
        assert loaded.parents == tuple(int(p) for p in SMPLX_PARENTS)
        np.testing.assert_array_equal(np.asarray(loaded.faces), faces.astype(np.int64))
        assert loaded.fingerprint.startswith("npz-")

        betas = rng.normal(size=(10,)).astype(np.float32)
        go = rng.normal(scale=0.4, size=(3,)).astype(np.float32)
        bp = rng.normal(scale=0.3, size=(21, 3)).astype(np.float32)
        tr = rng.normal(size=(3,)).astype(np.float32)
        jl = forward_joints(loaded, betas, go, bp, tr)
        js = forward_joints(src, betas, go, bp, tr)
        np.testing.assert_allclose(np.asarray(jl), np.asarray(js), atol=1e-5)
        vl, jl55 = forward_vertices(loaded, betas, go, bp, tr)
        vs, js55 = forward_vertices(src, betas, go, bp, tr)
        np.testing.assert_allclose(np.asarray(vl), np.asarray(vs), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jl55), np.asarray(js55), atol=1e-5)

    def test_fingerprint_tracks_file_content(self, tmp_path):
        from rohm_tpu.body import load_smplx_npz

        rng = np.random.default_rng(8)
        src = synthetic_model(num_verts=64, seed=1)
        p1 = str(tmp_path / "a.npz")
        self._write_npz(p1, src, rng)
        fp1 = load_smplx_npz(p1).fingerprint
        # same content elsewhere -> same fingerprint; different content -> different
        p2 = str(tmp_path / "b.npz")
        self._write_npz(p2, synthetic_model(num_verts=64, seed=2), rng)
        import shutil

        p3 = str(tmp_path / "c.npz")
        shutil.copy(p1, p3)
        assert load_smplx_npz(p3).fingerprint == fp1
        assert load_smplx_npz(p2).fingerprint != fp1
