"""Masking-curriculum tests: exhaustive index-map checks over the 294-d layout."""

import numpy as np

from rohm_tpu.reprs.schema import BODY_FEAT_DIM
from rohm_tpu.train.masking import (
    expand_joint_visibility,
    full_window_mask,
    joint_mask_to_vec,
    lower_body_mask,
    posenet_eval_cond_mask,
    posenet_train_cond_mask,
    random_joint_mask,
    traj_infill_mask,
    upper_body_mask,
)

TRAJ = 22


def test_joint_mask_to_vec_indices():
    masked = np.zeros((1, 22), bool)
    masked[0, 7] = True  # left ankle
    vis = joint_mask_to_vec(masked)[0]
    # local_positions dims for joint 7
    assert (vis[TRAJ + 7 * 3 : TRAJ + 7 * 3 + 3] == 0).all()
    # local_vel dims
    assert (vis[TRAJ + 66 + 7 * 3 : TRAJ + 66 + 7 * 3 + 3] == 0).all()
    # body_pose_6d dims for joint 7 -> slot 6
    assert (vis[TRAJ + 132 + 6 * 6 : TRAJ + 132 + 6 * 6 + 6] == 0).all()
    # left-foot contact masked, right visible
    assert (vis[-4:-2] == 0).all() and (vis[-2:] == 1).all()
    # traj + betas untouched
    assert (vis[:TRAJ] == 1).all() and (vis[280:290] == 1).all()
    # everything else visible
    assert vis.sum() == BODY_FEAT_DIM - 3 - 3 - 6 - 2


def test_random_joint_mask_never_pelvis():
    rng = np.random.default_rng(0)
    for _ in range(20):
        m = random_joint_mask(rng, 8)
        assert not m[:, 0].any()
        n_masked = m.sum(axis=1)
        assert (n_masked >= 1).all() and (n_masked <= 6).all()


def test_body_part_masks():
    low = joint_mask_to_vec(lower_body_mask(2))
    assert (low[:, TRAJ + 1 * 3 : TRAJ + 1 * 3 + 3] == 0).all()  # hip masked
    assert (low[:, TRAJ + 15 * 3 : TRAJ + 15 * 3 + 3] == 1).all()  # head visible
    rng = np.random.default_rng(0)
    up = joint_mask_to_vec(upper_body_mask(rng, 2))
    # wrists/hands always masked in the upper scheme
    for j in (18, 19, 20):
        assert (up[:, TRAJ + j * 3 : TRAJ + j * 3 + 3] == 0).all()


def test_full_window_mask_traj_preserved():
    rng = np.random.default_rng(0)
    vis = full_window_mask(rng, 4, 32, mask_len=10)
    assert vis.shape == (4, 32, BODY_FEAT_DIM)
    assert (vis[..., :TRAJ] == 1).all()
    # each sample has a zeroed pose window
    frames_masked = (vis[..., TRAJ:] == 0).all(axis=-1).sum(axis=-1)
    assert (frames_masked >= 1).all() and (frames_masked <= 10).all()


def test_traj_infill_mask():
    rng = np.random.default_rng(0)
    m = traj_infill_mask(rng, 16, 32, max_infill_ratio=0.5)
    assert m.shape == (16, 32)
    # masked run is contiguous
    for row in m:
        zeros = np.where(row == 0)[0]
        if len(zeros):
            assert (np.diff(zeros) == 1).all()
            assert len(zeros) <= 16  # <= clip_len * ratio


def test_expand_joint_visibility_contact_pairs():
    mask = np.ones((5, 22))
    mask[:, 10] = 0  # left toe occluded
    vis = expand_joint_visibility(mask)
    assert vis.shape == (5, BODY_FEAT_DIM)
    assert (vis[:, -4:-2] == 0).all()  # left contact pair hidden
    assert (vis[:, -2:] == 1).all()
    assert (vis[:, :22] == 1).all() and (vis[:, 280:290] == 1).all()


def test_posenet_curriculum_phases():
    rng = np.random.default_rng(0)
    early = posenet_train_cond_mask(rng, 4, 32, epoch=0, start_prox_mask_epoch=5,
                                    mask_scheme="lower", prox_bank=None, input_noise=True)
    assert early.shape == (4, 32, BODY_FEAT_DIM)
    assert (early[..., -4:] == 0).all()  # noisy input -> contact always hidden
    late = posenet_train_cond_mask(rng, 4, 32, epoch=10, start_prox_mask_epoch=5,
                                   mask_scheme="lower", prox_bank=None, input_noise=True)
    assert late.shape == (4, 32, BODY_FEAT_DIM)
    assert (late[..., :TRAJ] == 1).all() or (late[..., TRAJ:] == 0).any()


def test_posenet_prox_bank_branch():
    rng = np.random.default_rng(1)
    bank = np.ones((3, 32, BODY_FEAT_DIM), np.float32)
    bank[:, :, 30:33] = 0.0
    # scheme 'lower' picks prox with p<=0.7; try until the branch hits
    for _ in range(30):
        vis = posenet_train_cond_mask(rng, 2, 32, epoch=10, start_prox_mask_epoch=5,
                                      mask_scheme="lower", prox_bank=bank, input_noise=False)
        if (vis[..., 30:33] == 0).all():
            return
    raise AssertionError("prox branch never selected")


def test_eval_mask():
    rng = np.random.default_rng(0)
    vis = posenet_eval_cond_mask(rng, 4, 32, input_noise=True)
    assert vis.shape == (4, 32, BODY_FEAT_DIM)
    assert (vis[..., -4:] == 0).all()


def test_amass_eval_pose_mask_matches_reference_index_formulas():
    """amass_eval_pose_mask vs the reference's hand-written index arithmetic
    (test_amass_full.py:336-368), element-for-element on all three schemes.

    This is the load-bearing structural check for the eval cond assembly:
    the full-pipeline parity tests can't pin it through the guided chains
    (chaotic at state-eps scale, see tests/test_e2e_parity.py), so the mask
    content is proven here directly."""
    from rohm_tpu.pipeline import amass_eval_pose_mask

    B, T = 3, 15

    def ref_mask(scheme, start=None, length=None):
        cond = np.ones((B, T, 294), np.float32)
        if scheme in ("lower", "upper"):
            ids = np.asarray(
                [1, 2, 4, 5, 7, 8, 10, 11] if scheme == "lower"
                else [3, 6, 9, 12, 13, 14, 15, 16, 17, 18, 19, 20]
            )
            for k in range(3):
                cond[:, :, 22 + ids * 3 + k] = 0.0
            for k in range(3):
                cond[:, :, 22 + 66 + ids * 3 + k] = 0.0
            for k in range(6):
                cond[:, :, 22 + 132 + (ids - 1) * 6 + k] = 0.0
            cond[:, :, -4:] = 0.0
        else:  # 'full': fixed window over all pose dims (infill setup)
            cond[:, :, -4:] = 0.0
            for idx in range(B):
                cond[idx, start:start + length, 22:] = 0.0
        return cond

    for scheme in ("lower", "upper"):
        mine = amass_eval_pose_mask(scheme, B, T)
        np.testing.assert_array_equal(mine, ref_mask(scheme), err_msg=scheme)
    mine = amass_eval_pose_mask("full", B, T, window_start=np.full(B, 7), window_len=3)
    np.testing.assert_array_equal(mine, ref_mask("full", 7, 3), err_msg="full")
