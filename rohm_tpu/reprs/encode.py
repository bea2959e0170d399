"""Motion-repr encoder: canonical joints + SMPL-X params -> 294-d frames.

Pure-JAX, batched over leading dims, differentiable — this runs *inside* the
jitted iterative-inference pipeline (the traj->pose re-encoding bridge,
reference test_amass_full.py:282-311) as well as host-side during data prep.

Behavioral parity target: reference data_loaders/motion_representation.py
:23-44 (foot_detect) and :187-282 (get_repr_smplx). Output has T-1 frames for
T input frames (the last frame is dropped so velocity blocks align).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rohm_tpu.geometry import (
    aa_to_rotmat,
    qbetween,
    qinv,
    qmul,
    qrot,
    rotmat_to_rot6d,
    skew_angular_velocity,
)
from rohm_tpu.reprs.schema import REPR_LIST

# face-direction joints: r_hip=2, l_hip=1, sdr_r=17, sdr_l=16 — but note the
# encoder uses across = pos[1] - pos[2] + pos[17] - pos[16] (the reference
# unpacks the index list with swapped names at motion_representation.py:204;
# we reproduce the actual arithmetic, not the variable names).
_FWD_A, _FWD_B = (1, 17), (2, 16)
_FEET_L = (7, 10)
_FEET_R = (8, 11)


def _foot_contact(positions: jnp.ndarray, vel_thresh: float, up_axis: int = 2) -> jnp.ndarray:
    """Binary contact labels [..., T-1, 4] in order (l_ankle, l_toe, r_ankle, r_toe).

    contact = squared per-frame displacement < vel_thresh AND height < (0.18, 0.15).
    """
    heightfactor = jnp.asarray([0.18, 0.15], positions.dtype)

    def detect(idx):
        p = positions[..., idx, :]  # [..., T, 2, 3]
        disp_sq = jnp.sum((p[..., 1:, :, :] - p[..., :-1, :, :]) ** 2, axis=-1)
        height = p[..., :-1, :, up_axis]
        return ((disp_sq < vel_thresh) & (height < heightfactor)).astype(positions.dtype)

    return jnp.concatenate([detect(list(_FEET_L)), detect(list(_FEET_R))], axis=-1)


def _patch_degenerate_quats(quat: jnp.ndarray, raw_norm: jnp.ndarray) -> jnp.ndarray:
    """Replace frames where qbetween degenerated (antiparallel vectors) with the
    previous frame's quaternion (reference NaN patch, motion_representation.py:216-219).

    quat: [..., T, 4]; raw_norm: [..., T, 1] pre-normalization magnitude.
    """
    bad = raw_norm < 1e-6  # [..., T, 1]
    quat_t = jnp.moveaxis(quat, -2, 0)  # [T, ..., 4]
    bad_t = jnp.moveaxis(bad, -2, 0)  # [T, ..., 1]

    ident = jnp.zeros_like(quat_t[0]).at[..., 0].set(1.0)

    def step(prev, inp):
        q, b = inp
        cur = jnp.where(b, prev, q)
        return cur, cur

    _, out = jax.lax.scan(step, ident, (quat_t, bad_t))
    return jnp.moveaxis(out, 0, -2)


def heading_quat(positions: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-frame root-heading quaternion rotating the body's forward to y+.

    positions: [..., T, 22, 3] (z-up). Returns (quat [..., T, 4], forward [..., T, 3]).
    Frame 0 is forced to identity, matching the reference (the clip is
    canonicalized so frame 0 already faces y+).
    """
    across = (
        positions[..., _FWD_A[0], :]
        - positions[..., _FWD_B[0], :]
        + positions[..., _FWD_A[1], :]
        - positions[..., _FWD_B[1], :]
    )
    across = across / jnp.maximum(jnp.linalg.norm(across, axis=-1, keepdims=True), 1e-12)
    z_up = jnp.asarray([0.0, 0.0, 1.0], positions.dtype)
    forward = jnp.cross(jnp.broadcast_to(z_up, across.shape), across)
    forward = forward / jnp.maximum(jnp.linalg.norm(forward, axis=-1, keepdims=True), 1e-12)

    target = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], positions.dtype), forward.shape)
    # raw (unnormalized) qbetween to detect degenerate antiparallel frames
    v = jnp.cross(forward, target)
    w = 1.0 + jnp.sum(forward * target, axis=-1, keepdims=True)
    raw = jnp.concatenate([w, v], axis=-1)
    raw_norm = jnp.linalg.norm(raw, axis=-1, keepdims=True)
    quat = qbetween(forward, target)
    quat = _patch_degenerate_quats(quat, raw_norm)
    ident = jnp.zeros(4, positions.dtype).at[0].set(1.0)
    quat = quat.at[..., 0, :].set(jnp.broadcast_to(ident, quat[..., 0, :].shape))
    return quat, forward


def get_repr(
    positions: jnp.ndarray,
    global_orient: jnp.ndarray | None = None,
    transl: jnp.ndarray = None,
    body_pose: jnp.ndarray | None = None,
    betas: jnp.ndarray = None,
    feet_vel_thresh: float = 5e-5,
    global_orient_mat: jnp.ndarray | None = None,
    body_pose_mat: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Encode a canonical sequence into the flat 294-d representation.

    Args:
      positions: [..., T, 22, 3] canonical joints (z-up).
      global_orient: [..., T, 3] axis-angle (or pass global_orient_mat [..., T, 3, 3]).
      transl: [..., T, 3] SMPL-X translation.
      body_pose: [..., T, 63] axis-angle (or body_pose_mat [..., T, 21, 3, 3]).
      betas: [..., T, 10].

    Returns: [..., T-1, 294].
    """
    quat, _ = heading_quat(positions)  # [..., T, 4]
    quat_vel = qmul(quat[..., 1:, :], qinv(quat[..., :-1, :]))

    root = positions[..., 0, :]  # [..., T, 3]
    root_height = root[..., 2:3]
    root_vel = qrot(quat[..., 1:, :], root[..., 1:, :] - root[..., :-1, :])

    root_rot_angle = jnp.arctan2(quat[..., 3:4], quat[..., 0:1])  # half-angle
    root_rot_angle_vel = jnp.arctan2(quat_vel[..., 3:4], quat_vel[..., 0:1])

    # local pose: recenter xy on root, rotate each frame to face y+
    local = positions - root[..., None, :] * jnp.asarray([1.0, 1.0, 0.0], positions.dtype)
    local = qrot(quat[..., :, None, :], local)  # broadcast over 22 joints

    local_vel = qrot(
        quat[..., :-1, None, :], positions[..., 1:, :, :] - positions[..., :-1, :, :]
    )

    # smplx-based traj
    if global_orient_mat is None:
        global_orient_mat = aa_to_rotmat(global_orient)
    rot6d = rotmat_to_rot6d(global_orient_mat)
    drdt = global_orient_mat[..., 1:, :, :] - global_orient_mat[..., :-1, :, :]
    rot_vel = skew_angular_velocity(global_orient_mat[..., :-1, :, :], drdt)
    trans_vel = transl[..., 1:, :] - transl[..., :-1, :]

    if body_pose_mat is None:
        body_pose_mat = aa_to_rotmat(body_pose.reshape(body_pose.shape[:-1] + (21, 3)))
    body_pose_6d = rotmat_to_rot6d(body_pose_mat)  # [..., T, 21, 6]
    body_pose_6d = body_pose_6d.reshape(body_pose_6d.shape[:-2] + (126,))

    contact = _foot_contact(positions, feet_vel_thresh)

    t_m1 = positions.shape[-3] - 1
    blocks = {
        "root_rot_angle": root_rot_angle[..., :-1, :],
        "root_rot_angle_vel": root_rot_angle_vel,
        "root_l_pos": root[..., :-1, 0:2],
        "root_l_vel": root_vel[..., 0:2],
        "root_height": root_height[..., :-1, :],
        "smplx_rot_6d": rot6d[..., :-1, :],
        "smplx_rot_vel": rot_vel,
        "smplx_trans": transl[..., :-1, :],
        "smplx_trans_vel": trans_vel,
        "local_positions": local[..., :-1, :, :].reshape(local.shape[:-3] + (t_m1, 66)),
        "local_vel": local_vel.reshape(local_vel.shape[:-3] + (t_m1, 66)),
        "smplx_body_pose_6d": body_pose_6d[..., :-1, :],
        "smplx_betas": betas[..., :-1, :],
        "foot_contact": contact,
    }
    return jnp.concatenate([blocks[name] for name in REPR_LIST], axis=-1)
