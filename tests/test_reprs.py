"""Motion representation tests: schema, encode/decode round-trips, canonicalization, stats.

The encode->decode round-trip is the reference's own (disabled) debug check
("rec_ric_data should be same as cano_positions", dataloader_amass.py:230-236),
promoted here to a real unit test.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rohm_tpu.body import forward_joints, synthetic_model
from rohm_tpu.data import synthetic_motion
from rohm_tpu.reprs import (
    BODY_FEAT_DIM,
    POSE_FEAT_DIM,
    REPR_DIM_DICT,
    REPR_LIST,
    TRAJ_ABS_INDEX,
    TRAJ_FEAT_DIM_ABS,
    TRAJ_FEAT_DIM_FULL,
    block_slice,
    cano_seq_smplx,
    compute_stats,
    get_repr,
    load_stats,
    recover_from_repr,
    save_stats,
    scatter_traj_abs,
    split_repr,
)


@pytest.fixture(scope="module")
def body():
    return synthetic_model(num_verts=256, seed=0)


@pytest.fixture(scope="module")
def clip(body):
    positions, params = synthetic_motion(body, num_frames=40, seed=3)
    cano_pos, cano_params = cano_seq_smplx(positions, params)
    return cano_pos, cano_params


def encode_clip(cano_pos, cano_params):
    return get_repr(
        jnp.asarray(cano_pos, jnp.float32),
        global_orient=jnp.asarray(cano_params["global_orient"], jnp.float32),
        transl=jnp.asarray(cano_params["transl"], jnp.float32),
        body_pose=jnp.asarray(cano_params["body_pose"], jnp.float32),
        betas=jnp.asarray(cano_params["betas"], jnp.float32),
    )


class TestSchema:
    def test_dims(self):
        assert BODY_FEAT_DIM == 294
        assert TRAJ_FEAT_DIM_FULL == 22
        assert TRAJ_FEAT_DIM_ABS == 13
        assert POSE_FEAT_DIM == 272
        assert sum(REPR_DIM_DICT[k] for k in REPR_LIST) == 294

    def test_traj_abs_index(self):
        # [0], [2:4], [6], [7:13], [16:19] per reference trajnet.py:293-297
        want = [0, 2, 3, 6] + list(range(7, 13)) + list(range(16, 19))
        assert TRAJ_ABS_INDEX.tolist() == want

    def test_scatter_gather(self):
        x = np.zeros((2, 5, 294), np.float32)
        vals = np.ones((2, 5, 13), np.float32)
        out = scatter_traj_abs(x, vals)
        assert out[..., TRAJ_ABS_INDEX].sum() == 2 * 5 * 13
        assert out.sum() == 2 * 5 * 13

    def test_split(self):
        x = np.arange(294, dtype=np.float32)[None]
        d = split_repr(x)
        assert d["foot_contact"].tolist() == [[290, 291, 292, 293]]
        assert d["root_rot_angle"].tolist() == [[0]]


class TestCanonicalization:
    def test_invariants(self, clip):
        cano_pos, _ = clip
        # floor at z=0
        assert abs(cano_pos[:, :, 2].min()) < 1e-5
        # frame-0 pelvis xy at origin
        np.testing.assert_allclose(cano_pos[0, 0, :2], 0.0, atol=1e-6)
        # frame-0 faces y+: forward direction of frame 0 ~ [0, 1, 0]
        j0 = cano_pos[0]
        across = (j0[2] - j0[1]) + (j0[17] - j0[16])
        across[2] = 0
        fwd = np.cross([0, 0, 1.0], across)
        fwd /= np.linalg.norm(fwd)
        np.testing.assert_allclose(fwd, [0, 1, 0], atol=1e-5)

    def test_params_consistent_with_joints(self, body, clip):
        # FK of canonicalized params must reproduce canonicalized joints
        cano_pos, cano_params = clip
        fk = np.asarray(
            forward_joints(
                body,
                jnp.asarray(cano_params["betas"], jnp.float32),
                jnp.asarray(cano_params["global_orient"], jnp.float32),
                jnp.asarray(cano_params["body_pose"], jnp.float32),
                jnp.asarray(cano_params["transl"], jnp.float32),
            )
        )
        np.testing.assert_allclose(fk, cano_pos, atol=1e-4)


class TestEncodeDecode:
    def test_shapes(self, clip):
        cano_pos, cano_params = clip
        rep = encode_clip(cano_pos, cano_params)
        assert rep.shape == (len(cano_pos) - 1, 294)

    def test_roundtrip_abs_traj(self, clip):
        cano_pos, cano_params = clip
        rep = encode_clip(cano_pos, cano_params)
        rec = np.asarray(recover_from_repr(rep, mode="joint_abs_traj"))
        np.testing.assert_allclose(rec, cano_pos[:-1], atol=2e-4)

    def test_roundtrip_rel_traj(self, clip):
        cano_pos, cano_params = clip
        rep = encode_clip(cano_pos, cano_params)
        rec = np.asarray(recover_from_repr(rep, mode="joint_rel_traj"))
        np.testing.assert_allclose(rec, cano_pos[:-1], atol=5e-3)

    def test_roundtrip_smplx(self, body, clip):
        cano_pos, cano_params = clip
        rep = encode_clip(cano_pos, cano_params)
        rec = np.asarray(recover_from_repr(rep, mode="smplx_params", body_model=body))
        np.testing.assert_allclose(rec, cano_pos[:-1], atol=2e-4)

    def test_smplx_mode_with_verts(self, body, clip):
        cano_pos, cano_params = clip
        rep = encode_clip(cano_pos, cano_params)
        joints, verts = recover_from_repr(
            rep, mode="smplx_params", body_model=body, return_verts=True
        )
        assert joints.shape == (len(cano_pos) - 1, 22, 3)
        assert verts.shape == (len(cano_pos) - 1, body.num_verts, 3)

    @pytest.mark.slow
    def test_batched_encode(self, body):
        from rohm_tpu.data import synthetic_clip_batch

        positions, params = synthetic_clip_batch(body, batch_size=2, num_frames=12, seed=5)
        rep = get_repr(
            jnp.asarray(positions, jnp.float32),
            global_orient=jnp.asarray(params["global_orient"], jnp.float32),
            transl=jnp.asarray(params["transl"], jnp.float32),
            body_pose=jnp.asarray(params["body_pose"], jnp.float32),
            betas=jnp.asarray(params["betas"], jnp.float32),
        )
        assert rep.shape == (2, 11, 294)
        # batched == per-sample
        rep0 = get_repr(
            jnp.asarray(positions[0], jnp.float32),
            global_orient=jnp.asarray(params["global_orient"][0], jnp.float32),
            transl=jnp.asarray(params["transl"][0], jnp.float32),
            body_pose=jnp.asarray(params["body_pose"][0], jnp.float32),
            betas=jnp.asarray(params["betas"][0], jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(rep[0]), np.asarray(rep0), atol=1e-5)

    def test_contact_labels_binary(self, clip):
        cano_pos, cano_params = clip
        rep = np.asarray(encode_clip(cano_pos, cano_params))
        contact = rep[..., block_slice("foot_contact")]
        assert set(np.unique(contact)).issubset({0.0, 1.0})


class TestStats:
    def test_rules(self, rng):
        frames = rng.normal(size=(10, 20, 294)) * 3 + 1
        mean, std = compute_stats(frames)
        # foot contact: mean 0 / std 1
        np.testing.assert_allclose(mean[block_slice("foot_contact")], 0.0)
        np.testing.assert_allclose(std[block_slice("foot_contact")], 1.0)
        # non-betas blocks have scalar (collapsed) std
        lp = std[block_slice("local_positions")]
        assert np.allclose(lp, lp[0])
        # betas keep per-dim std
        sb = std[block_slice("smplx_betas")]
        assert not np.allclose(sb, sb[0])

    def test_save_load(self, tmp_path, rng):
        frames = rng.normal(size=(4, 8, 294))
        mean, std = compute_stats(frames)
        save_stats(str(tmp_path), mean, std)
        m2, s2 = load_stats(str(tmp_path))
        np.testing.assert_allclose(m2, mean)
        np.testing.assert_allclose(s2, std)
