"""Pure-JAX rotation algebra (L0 math kernels).

Replaces the reference's vendored kornia transforms
(/root/reference/utils/konia_transform.py) and HumanML3D quaternion library
(/root/reference/data_loaders/common/quaternion.py) with batched, jit/vmap-safe,
differentiable jnp implementations.
"""

from rohm_tpu.geometry.rotations import (
    euler_to_quat,
    qeuler,
    qfix,
    qslerp,
    aa_to_quat,
    aa_to_rotmat,
    qbetween,
    qinv,
    qmul,
    qnormalize,
    qrot,
    quat_to_aa,
    quat_to_rotmat,
    rot6d_to_rotmat,
    rotmat_to_aa,
    rotmat_to_quat,
    rotmat_to_rot6d,
    skew_angular_velocity,
)

__all__ = [
    "qeuler",
    "qfix",
    "qslerp",
    "euler_to_quat",
    "aa_to_quat",
    "aa_to_rotmat",
    "qbetween",
    "qinv",
    "qmul",
    "qnormalize",
    "qrot",
    "quat_to_aa",
    "quat_to_rotmat",
    "rot6d_to_rotmat",
    "rotmat_to_aa",
    "rotmat_to_quat",
    "rotmat_to_rot6d",
    "skew_angular_velocity",
]
