"""Motion-repr decoder: 294-d frames -> joints / SMPL-X params.

Three recovery modes, matching reference
data_loaders/motion_representation.py:285-398:

- joint_abs_traj: root from absolute traj dims, local joints un-rotated
- joint_rel_traj: root integrated from velocity dims (cumsum)
- smplx_params: rot6d -> axis-angle -> SMPL-X forward kinematics

All pure JAX, batched, differentiable (losses + guidance run through here).
"""

from __future__ import annotations

import jax.numpy as jnp

from rohm_tpu.body import SmplxModel, forward_joints, forward_vertices
from rohm_tpu.geometry import qinv, qrot, rot6d_to_rotmat, rotmat_to_aa
from rohm_tpu.reprs.schema import split_repr


def recover_root_rot_pos(
    data: jnp.ndarray, mode: str = "abs", up_axis: str = "z"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Root heading quaternion + root position from a 4-d traj slice.

    data: [..., T, 4] = (rot_angle | rot_angle_vel, x?, y?, height) depending
    on mode. Returns (r_rot_quat [..., T, 4], r_pos [..., T, 3]).
    """
    if up_axis == "z":
        up_dim, face_dim, quat_sin_dim = 2, 1, 3
    elif up_axis == "y":
        up_dim, face_dim, quat_sin_dim = 1, 2, 2
    else:
        raise ValueError(f"bad up_axis {up_axis}")

    if mode == "abs":
        ang = data[..., 0]
    elif mode == "rel":
        # integrate heading velocity; frame 0 angle = 0
        vel = data[..., 0]
        ang = jnp.cumsum(jnp.concatenate([jnp.zeros_like(vel[..., :1]), vel[..., :-1]], axis=-1), axis=-1)
    else:
        raise ValueError(f"bad mode {mode}")

    quat = jnp.zeros(data.shape[:-1] + (4,), data.dtype)
    quat = quat.at[..., 0].set(jnp.cos(ang)).at[..., quat_sin_dim].set(jnp.sin(ang))

    pos = jnp.zeros(data.shape[:-1] + (3,), data.dtype)
    if mode == "abs":
        pos = pos.at[..., 0].set(data[..., 1]).at[..., face_dim].set(data[..., 2])
        pos = pos.at[..., up_dim].set(data[..., 3])
    else:
        # per-frame planar velocity, shifted by one (frame 0 at origin)
        vx = jnp.concatenate([jnp.zeros_like(data[..., :1, 1]), data[..., :-1, 1]], axis=-1)
        vy = jnp.concatenate([jnp.zeros_like(data[..., :1, 2]), data[..., :-1, 2]], axis=-1)
        pos = pos.at[..., 0].set(vx).at[..., face_dim].set(vy)
        pos = qrot(qinv(quat), pos)  # velocities were stored in heading-local frame
        pos = jnp.cumsum(pos, axis=-2)
        pos = pos.at[..., up_dim].set(data[..., 3])
    return quat, pos


def repr_to_smplx_params(repr_dict: dict) -> dict:
    """Convert smplx-based repr blocks to SMPL-X parameters (aa convention)."""
    rot6d = repr_dict["smplx_rot_6d"]
    global_orient = rotmat_to_aa(rot6d_to_rotmat(rot6d))
    pose6d = repr_dict["smplx_body_pose_6d"]
    pose_mats = rot6d_to_rotmat(pose6d.reshape(pose6d.shape[:-1] + (21, 6)))
    body_pose = rotmat_to_aa(pose_mats).reshape(pose6d.shape[:-1] + (63,))
    return {
        "global_orient": global_orient,
        "body_pose": body_pose,
        "transl": repr_dict["smplx_trans"],
        "betas": repr_dict["smplx_betas"],
    }


def recover_from_repr(
    x: jnp.ndarray | dict,
    mode: str = "joint_abs_traj",
    body_model: SmplxModel | None = None,
    return_verts: bool = False,
):
    """Recover joint (and optionally vertex) positions from a 294-d repr.

    x: flat [..., T, 294] array or pre-split block dict (denormalized).
    Returns joints [..., T, 22, 3]; with return_verts (smplx mode only),
    (joints, verts).
    """
    d = split_repr(x) if not isinstance(x, dict) else x

    if mode in ("joint_abs_traj", "joint_rel_traj"):
        if mode == "joint_abs_traj":
            traj = jnp.concatenate(
                [d["root_rot_angle"], d["root_l_pos"], d["root_height"]], axis=-1
            )
            quat, r_pos = recover_root_rot_pos(traj, mode="abs", up_axis="z")
        else:
            traj = jnp.concatenate(
                [d["root_rot_angle_vel"], d["root_l_vel"], d["root_height"]], axis=-1
            )
            quat, r_pos = recover_root_rot_pos(traj, mode="rel", up_axis="z")

        local = d["local_positions"][..., 3:]  # drop root slot
        local = local.reshape(local.shape[:-1] + (21, 3))
        local = qrot(qinv(quat)[..., None, :], local)
        local = local.at[..., 0].add(r_pos[..., None, 0])
        local = local.at[..., 1].add(r_pos[..., None, 1])
        return jnp.concatenate([r_pos[..., None, :], local], axis=-2)

    if mode == "smplx_params":
        assert body_model is not None, "smplx_params mode needs a body model"
        # rot6d -> rotmat feeds FK directly: the reference's extra
        # rotmat -> axis-angle -> rotmat round trip (motion_representation.py:
        # 373-389) is the identity but costs ops and a numerically delicate
        # gradient through rotation_matrix_to_angle_axis
        go_mat = rot6d_to_rotmat(d["smplx_rot_6d"])
        pose6d = d["smplx_body_pose_6d"]
        bp_mat = rot6d_to_rotmat(pose6d.reshape(pose6d.shape[:-1] + (21, 6)))
        zeros3 = jnp.zeros(d["smplx_trans"].shape[:-1] + (3,), d["smplx_trans"].dtype)
        zeros63 = jnp.zeros(d["smplx_trans"].shape[:-1] + (63,), d["smplx_trans"].dtype)
        if return_verts:
            verts, joints = forward_vertices(
                body_model,
                d["smplx_betas"],
                zeros3,
                zeros63,
                d["smplx_trans"],
                global_orient_mat=go_mat,
                body_pose_mat=bp_mat,
            )
            return joints[..., :22, :], verts
        return forward_joints(
            body_model,
            d["smplx_betas"],
            zeros3,
            zeros63,
            d["smplx_trans"],
            num_joints=22,
            global_orient_mat=go_mat,
            body_pose_mat=bp_mat,
        )

    raise ValueError(f"bad recover mode {mode}")
