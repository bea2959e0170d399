"""SMPL-X linear blend skinning as pure JAX functions.

Math follows the published SMPL/SMPL-X formulation (Pavlakos et al., CVPR
2019); behavior matches the reference's use of the `smplx` package with
``model_type='smplx', gender='neutral', flat_hand_mean=True, use_pca=False``
and zeroed hands/face (reference data_loaders/motion_representation.py:383-389):
only global_orient + 21 body-pose rotations are ever non-identity.

TPU notes:
- The joints fast path precomputes ``j_template = J_regressor @ v_template``
  and ``j_shapedirs = J_regressor @ shapedirs`` at load time, so per-call work
  is a (B, 10) x (10, 55*3) matmul plus an unrolled 22-joint kinematic chain
  of 3x3 matmuls — XLA fuses the whole thing into a few kernels.
- All functions broadcast over arbitrary leading batch dims and are
  differentiable (test-time guidance takes grads through here).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct

from rohm_tpu.geometry import aa_to_rotmat

NUM_BETAS = 10
NUM_BODY_JOINTS = 22  # pelvis + 21 body joints; all RoHM losses use these
NUM_JOINTS = 55  # full SMPL-X skeleton (body + jaw + eyes + 30 hand joints)

# Fixed SMPL-X kinematic tree (parent of joint i; -1 for pelvis root).
SMPLX_PARENTS = np.array(
    [
        -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
        18, 19,  # 22 body joints
        15, 15, 15,  # jaw, left eye, right eye
        20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,  # left hand
        21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53,  # right hand
    ],
    dtype=np.int32,
)


@struct.dataclass
class SmplxModel:
    """Immutable pytree of SMPL-X parameters (neutral gender unless loaded otherwise).

    Attributes with leading dimension V refer to the template mesh
    (V = 10475 for real SMPL-X; smaller for synthetic test models).
    """

    v_template: jnp.ndarray  # [V, 3]
    shapedirs: jnp.ndarray  # [V, 3, NUM_BETAS]
    posedirs: jnp.ndarray  # [(NUM_JOINTS-1)*9, V*3] pose-blend basis
    j_regressor: jnp.ndarray  # [NUM_JOINTS, V]
    lbs_weights: jnp.ndarray  # [V, NUM_JOINTS]
    parents: Any = struct.field(pytree_node=False)  # tuple[int], len NUM_JOINTS
    # precomputed joints fast path
    j_template: jnp.ndarray = None  # [NUM_JOINTS, 3]
    j_shapedirs: jnp.ndarray = None  # [NUM_JOINTS, 3, NUM_BETAS]
    # triangle table for mesh viz/rendering (None for synthetic models)
    faces: Any = struct.field(pytree_node=False, default=None)  # [F, 3] int np
    # host-computed content hash, stamped at construction: disk-cache keys
    # need it WITHOUT pulling device arrays back over a (possibly tunneled)
    # transport
    fingerprint: Any = struct.field(pytree_node=False, default=None)

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]


def _finalize(model: SmplxModel) -> SmplxModel:
    j_template = model.j_regressor @ model.v_template
    j_shapedirs = jnp.einsum("jv,vck->jck", model.j_regressor, model.shapedirs)
    return model.replace(j_template=j_template, j_shapedirs=j_shapedirs)


def load_smplx_npz(path: str, dtype=jnp.float32) -> SmplxModel:
    """Load a real SMPL-X .npz model file (e.g. SMPLX_NEUTRAL.npz).

    Mirrors the fields the `smplx` package reads; shape basis truncated to the
    first NUM_BETAS coefficients (expression/extra shape components are unused
    by RoHM, which zeroes expression).
    """
    with np.load(path, allow_pickle=True) as data:
        v_template = np.asarray(data["v_template"], np.float64)
        shapedirs = np.asarray(data["shapedirs"], np.float64)[..., :NUM_BETAS]
        posedirs = np.asarray(data["posedirs"], np.float64)  # [V, 3, 486]
        posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T  # [486, V*3]
        j_regressor = np.asarray(data["J_regressor"], np.float64)
        lbs_weights = np.asarray(data["weights"], np.float64)
        parents = np.asarray(data["kintree_table"], np.int64)[0]
        parents[0] = -1
        faces = np.asarray(data["f"], np.int64) if "f" in data else None
    model = SmplxModel(
        faces=faces,
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        j_regressor=jnp.asarray(j_regressor, dtype),
        lbs_weights=jnp.asarray(lbs_weights, dtype),
        parents=tuple(int(p) for p in parents),
        fingerprint=_file_fingerprint(path, dtype),
    )
    return _finalize(model)


def _file_fingerprint(path: str, dtype) -> str:
    import hashlib

    h = hashlib.sha1()
    h.update(str(jnp.dtype(dtype)).encode())
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return "npz-" + h.hexdigest()[:16]


def synthetic_model(num_verts: int = 512, seed: int = 0, dtype=jnp.float32) -> SmplxModel:
    """Deterministic synthetic SMPL-X-shaped model for tests/benchmarks.

    Real SMPL-X weights are license-gated and absent from this environment;
    this stand-in has identical tensor shapes/kinematics so every code path
    (FK, LBS, guidance grads) is exercised with realistic joint layout.
    """
    rng = np.random.default_rng(seed)
    # plausible humanoid rest skeleton (z-up-agnostic; y roughly vertical)
    base_joints = np.zeros((NUM_JOINTS, 3), np.float64)
    offsets = rng.normal(scale=0.08, size=(NUM_JOINTS, 3))
    offsets[:, 1] -= 0.05  # bias limbs downward a bit
    for j in range(1, NUM_JOINTS):
        base_joints[j] = base_joints[SMPLX_PARENTS[j]] + offsets[j]
    base_joints[0, 1] += 0.9  # pelvis above origin

    # scatter vertices around joints so the regressor is near-interpolatory
    owner = rng.integers(0, NUM_JOINTS, size=num_verts)
    v_template = base_joints[owner] + rng.normal(scale=0.05, size=(num_verts, 3))

    j_regressor = np.zeros((NUM_JOINTS, num_verts), np.float64)
    for j in range(NUM_JOINTS):
        mask = owner == j
        if mask.sum() == 0:  # guarantee nonempty support
            mask[rng.integers(0, num_verts)] = True
        j_regressor[j, mask] = 1.0 / mask.sum()
    # perturb the regressor so j_template != base_joints exactly
    j_regressor += np.abs(rng.normal(scale=1e-3, size=j_regressor.shape))
    j_regressor /= j_regressor.sum(axis=1, keepdims=True)

    shapedirs = rng.normal(scale=0.01, size=(num_verts, 3, NUM_BETAS))
    posedirs = rng.normal(scale=1e-3, size=((NUM_JOINTS - 1) * 9, num_verts * 3))

    lbs_w = np.zeros((num_verts, NUM_JOINTS), np.float64)
    lbs_w[np.arange(num_verts), owner] = 1.0
    parent_of_owner = np.maximum(SMPLX_PARENTS[owner], 0)
    lbs_w[np.arange(num_verts), parent_of_owner] += 0.5
    lbs_w /= lbs_w.sum(axis=1, keepdims=True)

    model = SmplxModel(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        j_regressor=jnp.asarray(j_regressor, dtype),
        lbs_weights=jnp.asarray(lbs_w, dtype),
        parents=tuple(int(p) for p in SMPLX_PARENTS),
        # construction is deterministic in (num_verts, seed, dtype)
        fingerprint=f"synthetic-{num_verts}-{seed}-{jnp.dtype(dtype)}",
    )
    return _finalize(model)


# ---------------------------------------------------------------------------
# forward kinematics
# ---------------------------------------------------------------------------


def _full_pose_rotmats(
    global_orient: jnp.ndarray, body_pose: jnp.ndarray, num_joints: int
) -> jnp.ndarray:
    """Assemble per-joint rotation matrices [..., num_joints, 3, 3].

    global_orient: [..., 3] axis-angle; body_pose: [..., 63] axis-angle.
    Hands/jaw/eyes are identity (RoHM zeroes them; flat_hand_mean=True).
    """
    batch = global_orient.shape[:-1]
    aa = jnp.concatenate(
        [global_orient[..., None, :], body_pose.reshape(batch + (21, 3))], axis=-2
    )  # [..., 22, 3]
    rots = aa_to_rotmat(aa)  # [..., 22, 3, 3]
    if num_joints > 22:
        eye = jnp.broadcast_to(
            jnp.eye(3, dtype=rots.dtype), batch + (num_joints - 22, 3, 3)
        )
        rots = jnp.concatenate([rots, eye], axis=-3)
    return rots


def _mat3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """3x3 matmul unrolled to elementwise mul/add.

    XLA routes tiny-K matmuls to the MXU with ~99% padding; the kinematic
    chain's 3x3 composes are then serialized MXU ops (measured 36 ms for the
    decode grad at [32,143]). Unrolled, they are VPU elementwise ops fully
    vectorized over batchxtime and fusable across the chain."""
    rows = []
    for i in range(3):
        rows.append(jnp.stack(
            [sum(a[..., i, k] * b[..., k, j] for k in range(3)) for j in range(3)],
            axis=-1,
        ))
    return jnp.stack(rows, axis=-2)


def _rot3(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors: a [..., 3, 3] @ v [..., 3], unrolled (see _mat3)."""
    return jnp.stack(
        [sum(a[..., i, k] * v[..., k] for k in range(3)) for i in range(3)], axis=-1
    )


def _rigid_transform(
    rot_mats: jnp.ndarray, joints: jnp.ndarray, parents
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unrolled kinematic chain.

    rot_mats: [..., J, 3, 3]; joints: [..., J, 3] rest positions.
    Returns (posed_joints [..., J, 3], rel_transforms [..., J, 4, 4]) where
    rel_transforms carry the skinning matrices A_k (world transform with the
    rest-joint contribution removed), as in standard LBS.
    """
    num_joints = rot_mats.shape[-3]
    rel_pos = joints - jnp.concatenate(
        [joints[..., :1, :], joints[..., np.maximum(np.asarray(parents[1:]), 0), :]],
        axis=-2,
    ) * jnp.asarray([0.0] + [1.0] * (num_joints - 1), joints.dtype)[..., :, None]

    world_rots = [rot_mats[..., 0, :, :]]
    world_pos = [joints[..., 0, :]]
    for j in range(1, num_joints):
        p = parents[j]
        world_rots.append(_mat3(world_rots[p], rot_mats[..., j, :, :]))
        world_pos.append(world_pos[p] + _rot3(world_rots[p], rel_pos[..., j, :]))
    posed = jnp.stack(world_pos, axis=-2)  # [..., J, 3]
    rots_w = jnp.stack(world_rots, axis=-3)  # [..., J, 3, 3]

    # skinning matrices: t_k = posed_k - R_k^w @ rest_k (unrolled, see _mat3)
    t = posed - _rot3(rots_w, joints)
    rel = jnp.concatenate([rots_w, t[..., None]], axis=-1)  # [..., J, 3, 4]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], rots_w.dtype), rel.shape[:-2] + (1, 4)
    )
    return posed, jnp.concatenate([rel, bottom], axis=-2)


def forward_joints(
    model: SmplxModel,
    betas: jnp.ndarray,
    global_orient: jnp.ndarray,
    body_pose: jnp.ndarray,
    transl: jnp.ndarray,
    num_joints: int = NUM_BODY_JOINTS,
    global_orient_mat: jnp.ndarray | None = None,
    body_pose_mat: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Posed skeleton joints [..., num_joints, 3] — the RoHM hot path.

    Equivalent to ``smplx_model(...).joints[:, :num_joints]`` for
    num_joints <= 55 with hands/face zeroed: SMPL-X skeleton joints are
    regressed from the *shaped* (not posed) template, so no vertex skinning is
    required (verified against reference semantics, see tests/test_body.py).

    Pass global_orient_mat [..., 3, 3] / body_pose_mat [..., 21, 3, 3] to skip
    the axis-angle conversion (used by the repr decode path, where rotations
    already live as rot6d-derived matrices).
    """
    joints_rest = model.j_template + jnp.einsum(
        "...k,jck->...jc", betas, model.j_shapedirs
    )  # [..., 55, 3]
    joints_rest = joints_rest[..., :num_joints, :]
    if global_orient_mat is not None and body_pose_mat is not None:
        rots = jnp.concatenate([global_orient_mat[..., None, :, :], body_pose_mat], axis=-3)
        if num_joints > 22:
            eye = jnp.broadcast_to(
                jnp.eye(3, dtype=rots.dtype), rots.shape[:-3] + (num_joints - 22, 3, 3)
            )
            rots = jnp.concatenate([rots, eye], axis=-3)
    else:
        rots = _full_pose_rotmats(global_orient, body_pose, num_joints)
    posed, _ = _rigid_transform(rots, joints_rest, model.parents[:num_joints])
    return posed + transl[..., None, :]


def forward_vertices(
    model: SmplxModel,
    betas: jnp.ndarray,
    global_orient: jnp.ndarray,
    body_pose: jnp.ndarray,
    transl: jnp.ndarray,
    global_orient_mat: jnp.ndarray | None = None,
    body_pose_mat: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full LBS: returns (vertices [..., V, 3], joints [..., 55, 3])."""
    v_shaped = model.v_template + jnp.einsum("...k,vck->...vc", betas, model.shapedirs)
    joints_rest = model.j_template + jnp.einsum("...k,jck->...jc", betas, model.j_shapedirs)

    if global_orient_mat is not None and body_pose_mat is not None:
        rots = jnp.concatenate([global_orient_mat[..., None, :, :], body_pose_mat], axis=-3)
        eye = jnp.broadcast_to(
            jnp.eye(3, dtype=rots.dtype), rots.shape[:-3] + (NUM_JOINTS - 22, 3, 3)
        )
        rots = jnp.concatenate([rots, eye], axis=-3)
    else:
        rots = _full_pose_rotmats(global_orient, body_pose, NUM_JOINTS)
    posed_joints, rel_tf = _rigid_transform(rots, joints_rest, model.parents)

    # pose blendshapes from the non-root rotations
    eye = jnp.eye(3, dtype=rots.dtype)
    pose_feature = (rots[..., 1:, :, :] - eye).reshape(rots.shape[:-3] + ((NUM_JOINTS - 1) * 9,))
    pose_offsets = (pose_feature @ model.posedirs).reshape(v_shaped.shape)
    v_posed = v_shaped + pose_offsets

    # skinning
    tf = jnp.einsum("vj,...jab->...vab", model.lbs_weights, rel_tf)  # [..., V, 4, 4]
    verts = (
        jnp.einsum("...vab,...vb->...va", tf[..., :3, :3], v_posed) + tf[..., :3, 3]
    )
    return verts + transl[..., None, :], posed_joints + transl[..., None, :]
