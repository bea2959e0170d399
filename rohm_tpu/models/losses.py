"""Training losses for TrajNet and PoseNet, as pure JAX functions.

Parity targets: reference model/trajnet.py:278-400
(TrajNet.compute_losses_with_smpl) and model/posenet.py:99-193
(PoseNet.compute_losses_with_smpl). All losses are computed in the
*normalized* repr space for the repr-reconstruction terms and in metric space
(after denormalization + decode) for the global-joint terms, exactly as the
reference does.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.lax import stop_gradient

from rohm_tpu.body import SmplxModel
from rohm_tpu.geometry import rot6d_to_rotmat, skew_angular_velocity
from rohm_tpu.reprs import recover_from_repr, scatter_traj_abs, split_repr
from rohm_tpu.reprs.schema import FOOT_JOINT_INDEX, TRAJ_FEAT_DIM_FULL

FPS = 30.0
FOOT_SKATING_VEL_THRESH = 0.1


def _mse(a, b):
    return (a - b) ** 2


def merge_traj_output(
    motion_repr_clean: jnp.ndarray, model_output: jnp.ndarray, repr_abs_only: bool
) -> jnp.ndarray:
    """Scatter TrajNet output back into a full 294-d repr (pose part from GT)."""
    if repr_abs_only:
        return scatter_traj_abs(motion_repr_clean, model_output)
    return jnp.concatenate(
        [model_output, motion_repr_clean[..., TRAJ_FEAT_DIM_FULL:]], axis=-1
    )


def trajnet_losses(
    model_output: jnp.ndarray,  # [B, T, 13|22] normalized
    motion_repr_clean: jnp.ndarray,  # [B, T, 294] normalized
    mean: jnp.ndarray,
    std: jnp.ndarray,
    body_model: SmplxModel,
    weights: dict,
    repr_abs_only: bool = True,
) -> dict:
    """TrajNet loss dict; key 'loss' is the weighted total."""
    loss = {}
    full_rec = merge_traj_output(motion_repr_clean, model_output, repr_abs_only)
    l_all = _mse(motion_repr_clean, full_rec)

    loss["loss_repr_traj_root_rot_angle"] = l_all[..., 0].mean()
    loss["loss_repr_traj_root_l_pos"] = l_all[..., 2:4].mean()
    loss["loss_repr_traj_root_height"] = l_all[..., 6].mean()
    loss["loss_repr_traj_smplx_rot_6d"] = l_all[..., 7:13].mean()
    loss["loss_repr_traj_smplx_trans"] = l_all[..., 16:19].mean()
    if not repr_abs_only:
        loss["loss_repr_traj_root_rot_angle_vel"] = l_all[..., 1].mean()
        loss["loss_repr_traj_root_l_vel"] = l_all[..., 4:6].mean()
        loss["loss_repr_traj_smplx_rot_vel"] = l_all[..., 13:16].mean()
        loss["loss_repr_traj_smplx_trans_vel"] = l_all[..., 19:22].mean()
        loss["loss_repr_traj"] = l_all[..., :TRAJ_FEAT_DIM_FULL].mean()
    else:
        loss["loss_repr_traj"] = jnp.concatenate(
            [l_all[..., 0:1], l_all[..., 2:4], l_all[..., 6:7], l_all[..., 7:13], l_all[..., 16:19]],
            axis=-1,
        ).mean()

    clean_dn = motion_repr_clean * std + mean
    rec_dn = full_rec * std + mean
    d_clean = split_repr(clean_dn)
    d_rec = split_repr(rec_dn)

    root_clean = recover_from_repr(d_clean, mode="joint_abs_traj")[..., 0, :]
    root_abs = recover_from_repr(d_rec, mode="joint_abs_traj")[..., 0, :]
    root_rel = recover_from_repr(d_rec, mode="joint_rel_traj")[..., 0, :]
    root_smpl = recover_from_repr(d_rec, mode="smplx_params", body_model=body_model)[..., 0, :]

    loss["loss_root_pos_global_from_abs_traj"] = _mse(root_abs, root_clean).mean()
    loss["loss_root_pos_global_from_rel_traj"] = _mse(root_rel, root_clean).mean()
    loss["loss_root_pos_global_from_smpl"] = _mse(root_smpl, root_clean).mean()

    vel = lambda p: p[..., 1:, :] - p[..., :-1, :]
    v_clean = vel(root_clean)
    v_abs, v_rel, v_smpl = vel(root_abs), vel(root_rel), vel(root_smpl)
    loss["loss_root_vel_global_from_abs_traj"] = _mse(v_abs, v_clean).mean()
    loss["loss_root_vel_global_from_rel_traj"] = _mse(v_rel, v_clean).mean()
    loss["loss_root_vel_global_from_smpl"] = _mse(v_smpl, v_clean).mean()

    # smplx global-orient angular-velocity consistency
    rot_mats = rot6d_to_rotmat(d_rec["smplx_rot_6d"])
    drdt = rot_mats[..., 1:, :, :] - rot_mats[..., :-1, :, :]
    rot_vel = skew_angular_velocity(rot_mats[..., :-1, :, :], drdt)
    loss["loss_root_smplx_rot_vel"] = _mse(
        rot_vel, d_clean["smplx_rot_vel"][..., :-1, :]
    ).mean()

    transl_vel = d_rec["smplx_trans"][..., 1:, :] - d_rec["smplx_trans"][..., :-1, :]
    loss["loss_root_smplx_transl_vel"] = _mse(
        transl_vel, d_clean["smplx_trans_vel"][..., :-1, :]
    ).mean()

    # translational smoothness (squared accel)
    loss["loss_root_smooth_from_abs_traj"] = (vel(v_abs) ** 2).mean()
    loss["loss_root_smooth_from_rel_traj"] = (vel(v_rel) ** 2).mean()
    loss["loss_root_smooth_from_smpl"] = (vel(v_smpl) ** 2).mean()

    # heading smoothness on cos(2*half-angle) — continuous, no wrap jumps
    cosv = lambda d: jnp.cos(d["root_rot_angle"][..., 1:, :] * 2) - jnp.cos(
        d["root_rot_angle"][..., :-1, :] * 2
    )
    cos_vel_clean, cos_vel_rec = cosv(d_clean), cosv(d_rec)
    loss["loss_root_rot_cos_vel_from_abs_traj"] = _mse(cos_vel_clean, cos_vel_rec).mean()
    cos_acc = cos_vel_rec[..., 1:, :] - cos_vel_rec[..., :-1, :]
    loss["loss_root_rot_cos_smooth_from_abs_traj"] = (cos_acc**2).mean()

    if repr_abs_only:
        # rel-traj dims are GT in abs-only mode; their losses are defined as 0
        zero = jnp.zeros(())
        loss["loss_root_pos_global_from_rel_traj"] = zero
        loss["loss_root_vel_global_from_rel_traj"] = zero
        loss["loss_root_smooth_from_rel_traj"] = zero

    w = weights
    loss["loss"] = (
        w.get("weight_loss_root_rec_repr", 0.0) * loss["loss_repr_traj"]
        + w.get("weight_loss_root_pos_global", 0.0)
        * (
            loss["loss_root_pos_global_from_abs_traj"]
            + loss["loss_root_pos_global_from_rel_traj"]
            + loss["loss_root_pos_global_from_smpl"]
        )
        + w.get("weight_loss_root_vel_global", 0.0)
        * (
            loss["loss_root_vel_global_from_abs_traj"]
            + loss["loss_root_vel_global_from_rel_traj"]
            + loss["loss_root_vel_global_from_smpl"]
        )
        + w.get("weight_loss_root_rot_vel_from_abs_traj", 0.0)
        * loss["loss_root_rot_cos_vel_from_abs_traj"]
        + w.get("weight_loss_root_smplx_transl_vel", 0.0) * loss["loss_root_smplx_transl_vel"]
        + w.get("weight_loss_root_smplx_rot_vel", 0.0) * loss["loss_root_smplx_rot_vel"]
        + w.get("weight_loss_root_smooth", 0.0)
        * (
            loss["loss_root_smooth_from_abs_traj"]
            + loss["loss_root_smooth_from_rel_traj"]
            + loss["loss_root_smooth_from_smpl"]
        )
        + w.get("weight_loss_root_rot_cos_smooth_from_abs_traj", 0.0)
        * loss["loss_root_rot_cos_smooth_from_abs_traj"]
    )
    return loss


def foot_skating_loss(
    joints: jnp.ndarray, contact_gt: jnp.ndarray
) -> jnp.ndarray:
    """Masked mean foot speed where feet should be planted.

    joints [..., T, 22, 3]; contact_gt [..., T, 4] (order l_ankle/l_toe/
    r_ankle/r_toe). Mask = (speed > 0.1 m/s) AND gt contact; the mask itself
    carries no gradient (reference posenet.py:154-179).
    """
    foot = joints[..., FOOT_JOINT_INDEX, :]
    disp = (foot[..., 1:, :, :] - foot[..., :-1, :, :]) * FPS
    # grad-safe norm: d|v|/dv at v=0 is NaN in jax, and 0*NaN from the mask
    # would poison the whole gradient (guidance/training); the double-where
    # keeps both primal and gradient finite at exactly-zero displacement
    sq = jnp.sum(disp * disp, axis=-1)
    safe = jnp.where(sq > 0.0, sq, 1.0)
    vel = jnp.where(sq > 0.0, jnp.sqrt(safe), 0.0)  # [..., T-1, 4]
    mask = (vel > FOOT_SKATING_VEL_THRESH).astype(vel.dtype) * contact_gt[..., :-1, :]
    mask = stop_gradient(mask)
    denom = jnp.maximum(mask.sum(), 1.0)
    return (vel * mask).sum() / denom


def posenet_losses(
    model_output: jnp.ndarray,  # [B, T, 294] normalized
    motion_repr_clean: jnp.ndarray,  # [B, T, 294] normalized
    mean: jnp.ndarray,
    std: jnp.ndarray,
    body_model: SmplxModel,
    weights: dict,
    traj_feat_dim: int = TRAJ_FEAT_DIM_FULL,
    skating_active: bool | jnp.ndarray = True,
) -> dict:
    """PoseNet loss dict; key 'loss' is the weighted total.

    skating_active implements the `start_skating_loss_epoch` gate
    (posenet.py:181-184); pass a traced bool for epoch-dependent schedules.
    """
    loss = {}
    l_all = _mse(motion_repr_clean, model_output)
    loss["loss_repr_full_body"] = l_all[..., traj_feat_dim:-4].mean()
    loss["loss_repr_foot_contact_mse"] = l_all[..., -4:].mean()

    clean_dn = motion_repr_clean * std + mean
    rec_dn = model_output * std + mean
    d_clean = split_repr(clean_dn)
    d_rec = split_repr(rec_dn)

    j_clean = recover_from_repr(d_clean, mode="joint_abs_traj")
    j_abs = recover_from_repr(d_rec, mode="joint_abs_traj")
    j_rel = recover_from_repr(d_rec, mode="joint_rel_traj")
    j_smpl = recover_from_repr(d_rec, mode="smplx_params", body_model=body_model)

    loss["loss_joint_pos_global_from_abs_traj"] = _mse(j_abs, j_clean).mean()
    loss["loss_joint_pos_global_from_rel_traj"] = _mse(j_rel, j_clean).mean()
    loss["loss_joint_pos_global_from_smpl"] = _mse(j_smpl, j_clean).mean()

    vel = lambda p: p[..., 1:, :, :] - p[..., :-1, :, :]
    v_clean = vel(j_clean)
    v_abs, v_rel, v_smpl = vel(j_abs), vel(j_rel), vel(j_smpl)
    loss["loss_joint_vel_global_from_abs_traj"] = _mse(v_abs, v_clean).mean()
    loss["loss_joint_vel_global_from_rel_traj"] = _mse(v_rel, v_clean).mean()
    loss["loss_joint_vel_global_from_smpl"] = _mse(v_smpl, v_clean).mean()

    loss["loss_joint_smooth_from_abs_traj"] = (vel(v_abs) ** 2).mean()
    loss["loss_joint_smooth_from_rel_traj"] = (vel(v_rel) ** 2).mean()
    loss["loss_joint_smooth_from_smpl"] = (vel(v_smpl) ** 2).mean()

    contact_gt = d_clean["foot_contact"]
    loss["loss_foot_skating_from_abs_traj"] = foot_skating_loss(j_abs, contact_gt)
    loss["loss_foot_skating_from_rel_traj"] = foot_skating_loss(j_rel, contact_gt)
    loss["loss_foot_skating_from_smpl"] = foot_skating_loss(j_smpl, contact_gt)

    w = weights
    skating_w = w.get("weight_loss_foot_skating", 0.0) * jnp.asarray(
        skating_active, jnp.float32
    )
    loss["loss"] = (
        w.get("weight_loss_rec_repr_full_body", 0.0) * loss["loss_repr_full_body"]
        + w.get("weight_loss_repr_foot_contact_mse", 0.0) * loss["loss_repr_foot_contact_mse"]
        + w.get("weight_loss_joint_pos_global", 0.0)
        * (
            loss["loss_joint_pos_global_from_abs_traj"]
            + loss["loss_joint_pos_global_from_rel_traj"]
            + loss["loss_joint_pos_global_from_smpl"]
        )
        + w.get("weight_loss_joint_vel_global", 0.0)
        * (
            loss["loss_joint_vel_global_from_abs_traj"]
            + loss["loss_joint_vel_global_from_rel_traj"]
            + loss["loss_joint_vel_global_from_smpl"]
        )
        + w.get("weight_loss_joint_smooth", 0.0)
        * (
            loss["loss_joint_smooth_from_abs_traj"]
            + loss["loss_joint_smooth_from_rel_traj"]
            + loss["loss_joint_smooth_from_smpl"]
        )
        + skating_w
        * (
            loss["loss_foot_skating_from_abs_traj"]
            + loss["loss_foot_skating_from_rel_traj"]
            + loss["loss_foot_skating_from_smpl"]
        )
    )
    return loss
