"""Pure-JAX SMPL-X body model (L1).

Replaces the `smplx` pip dependency used throughout the reference
(e.g. /root/reference/model/posenet.py:57-58). Exact same math as SMPL-X
linear blend skinning, reorganized for TPU:

- `forward_joints`: joints-only fast path. The first 22 output joints of
  SMPL-X are the posed skeleton joints, which depend only on
  (betas -> joint regressor) and forward kinematics — no 10475-vertex
  skinning. We precompute ``J_regressor @ v_template`` and
  ``J_regressor @ shapedirs`` once, so a forward is a tiny matmul + a
  22-step unrolled kinematic chain. This is the op inside every training
  loss and every guided sampling step.
- `forward_vertices`: full LBS (shape + pose blendshapes + skinning) for
  evaluation / visualization / mesh export.
"""

from rohm_tpu.body.model import (
    NUM_BETAS,
    NUM_BODY_JOINTS,
    NUM_JOINTS,
    SMPLX_PARENTS,
    SmplxModel,
    forward_joints,
    forward_vertices,
    load_smplx_npz,
    synthetic_model,
)

__all__ = [
    "NUM_BETAS",
    "NUM_BODY_JOINTS",
    "NUM_JOINTS",
    "SMPLX_PARENTS",
    "SmplxModel",
    "forward_joints",
    "forward_vertices",
    "load_smplx_npz",
    "synthetic_model",
]
