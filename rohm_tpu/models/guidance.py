"""Test-time guidance losses: pure functions of the (normalized) repr.

The sampler differentiates these with `jax.grad` (see
rohm_tpu/diffusion/sampler.py), replacing the reference's
enable_grad/requires_grad/detach dance (model/posenet.py:196-317).

Conventions match the reference:
- gradients are taken wrt the model's predicted x0 (compute_grad='x_0')
- the resulting gradient is masked to zero on the trajectory dims [:22] and
  the contact-label dims [-4:] (posenet.py:251-252, 313-314)
- guidance weights/thresholds: 'amass' -> skating 3e6 at t<=50;
  'prox' -> 2-D reprojection 3e5 + skating 1e5 at t<=100
  (gaussian_diffusion_posenet.py:461-477)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.lax import stop_gradient

from rohm_tpu.body import SmplxModel
from rohm_tpu.diffusion import GuidanceSpec
from rohm_tpu.models.losses import foot_skating_loss
from rohm_tpu.reprs import recover_from_repr, split_repr
from rohm_tpu.reprs.schema import BODY_FEAT_DIM, TRAJ_FEAT_DIM_FULL

# joints entering the 2-D reprojection loss (posenet.py:308)
GUIDANCE_2D_JOINTS = np.array([16, 18, 20, 17, 19, 21, 4, 5, 7, 8])

AMASS_SKATING_WEIGHT = 3e6
AMASS_SKATING_T_THRESH = 50
PROX_PROJ2D_WEIGHT = 3e5
PROX_SKATING_WEIGHT = 1e5
PROX_T_THRESH = 100


def guidance_grad_mask(dtype=jnp.float32) -> jnp.ndarray:
    """[294] mask: 0 on traj dims and contact dims, 1 elsewhere."""
    m = np.ones(BODY_FEAT_DIM, np.float32)
    m[:TRAJ_FEAT_DIM_FULL] = 0.0
    m[-4:] = 0.0
    return jnp.asarray(m, dtype)


def skating_loss_fn(x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray, body_model: SmplxModel) -> jnp.ndarray:
    """Foot-skating guidance loss on a normalized repr x [B, T, 294].

    Contact labels are taken from x itself, thresholded at 0.5 and detached
    (posenet.py:220-222); skating is summed over the abs-traj and smplx joint
    decodings (posenet.py:223-248).
    """
    dn = x * std + mean
    d = split_repr(dn)
    contact = stop_gradient((dn[..., -4:] > 0.5).astype(x.dtype))
    j_abs = recover_from_repr(d, mode="joint_abs_traj")
    j_smpl = recover_from_repr(d, mode="smplx_params", body_model=body_model)
    return foot_skating_loss(j_abs, contact) + foot_skating_loss(j_smpl, contact)


def perspective_projection(
    points: jnp.ndarray, focal_length: jnp.ndarray, camera_center: jnp.ndarray
) -> jnp.ndarray:
    """Pinhole projection: points [..., N, 3] (camera coords) -> pixels [..., N, 2].

    (reference utils/other_utils.py:150-185 with identity rotation.)
    """
    uv = points[..., :2] / points[..., 2:3]
    return uv * focal_length[..., None, :] + camera_center[..., None, :]


def projection_2d_loss_fn(
    x: jnp.ndarray,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    body_model: SmplxModel,
    transf_matrix: jnp.ndarray,  # [B, 4, 4] scene->canonical
    cam_r: jnp.ndarray,  # [3, 3] scene->camera rotation basis
    cam_t: jnp.ndarray,  # [3] camera origin in scene coords
    focal_length: jnp.ndarray,  # [B, 2]
    camera_center: jnp.ndarray,  # [B, 2]
    keypoints_2d: jnp.ndarray,  # [B, T, 22, 3] (u, v, confidence)
) -> jnp.ndarray:
    """Confidence-weighted L1 between projected SMPL-X joints and 2-D keypoints.

    Joint path: canonical -> scene (inverse canonicalization transform)
    -> camera (cam_R^-1 (p - cam_t)) -> pixels (posenet.py:284-309).
    """
    dn = x * std + mean
    d = split_repr(dn)
    joints = recover_from_repr(d, mode="smplx_params", body_model=body_model)  # [B, T, 22, 3]

    inv = jnp.linalg.inv(transf_matrix)  # cano -> scene
    r = inv[:, None, :3, :3]
    t = inv[:, None, :3, 3]
    scene = jnp.einsum("b1ij,btnj->btni", r, joints) + t[:, :, None, :]

    cam = jnp.einsum("ij,btnj->btni", jnp.linalg.inv(cam_r), scene - cam_t)
    proj = perspective_projection(cam, focal_length[:, None, :], camera_center[:, None, :])

    seq_len = joints.shape[-3]
    kp = keypoints_2d[:, :seq_len]
    l1 = jnp.abs(proj - kp[..., :2]) * kp[..., 2:3]
    return l1[..., GUIDANCE_2D_JOINTS, :].mean()


def amass_guidance(mean, std, body_model) -> tuple[GuidanceSpec, ...]:
    """Guidance stack for AMASS evaluation (skating only)."""
    return (
        GuidanceSpec(
            loss_fn=lambda x: skating_loss_fn(x, mean, std, body_model),
            weight=AMASS_SKATING_WEIGHT,
            t_threshold=AMASS_SKATING_T_THRESH,
            grad_mask=guidance_grad_mask(),
        ),
    )


def prox_guidance(
    mean, std, body_model, transf_matrix, cam_r, cam_t, focal_length, camera_center, keypoints_2d
) -> tuple[GuidanceSpec, ...]:
    """Guidance stack for PROX/EgoBody (2-D reprojection + skating)."""
    mask = guidance_grad_mask()
    return (
        GuidanceSpec(
            loss_fn=lambda x: projection_2d_loss_fn(
                x, mean, std, body_model, transf_matrix, cam_r, cam_t,
                focal_length, camera_center, keypoints_2d,
            ),
            weight=PROX_PROJ2D_WEIGHT,
            t_threshold=PROX_T_THRESH,
            grad_mask=mask,
        ),
        GuidanceSpec(
            loss_fn=lambda x: skating_loss_fn(x, mean, std, body_model),
            weight=PROX_SKATING_WEIGHT,
            t_threshold=PROX_T_THRESH,
            grad_mask=mask,
        ),
    )
