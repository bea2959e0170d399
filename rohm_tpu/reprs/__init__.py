"""Motion representation (L2): the hybrid 294-dim per-frame encoding.

Mirrors the reference schema (utils/other_utils.py:17-37 and
data_loaders/motion_representation.py) with a TPU-first split:

- `schema`: dimension bookkeeping, slices, the 13-dim abs-only traj index map
- `encode`: joints+SMPL-X params -> 294-d repr (pure JAX, batched, diff'able —
  required on-device by the traj->pose re-encoding bridge)
- `decode`: repr -> joints, three modes (joint_abs_traj / joint_rel_traj /
  smplx_params)
- `canonicalize`: per-clip floor/origin/facing normalization (host-side numpy)
- `stats`: per-block Mean/Std with the reference's special-casing
"""

from rohm_tpu.reprs.schema import (
    BODY_FEAT_DIM,
    FOOT_JOINT_INDEX,
    POSE_FEAT_DIM,
    REPR_DIM_DICT,
    REPR_LIST,
    TRAJ_ABS_INDEX,
    TRAJ_FEAT_DIM_ABS,
    TRAJ_FEAT_DIM_FULL,
    block_slice,
    scatter_traj_abs,
    split_repr,
)
from rohm_tpu.reprs.encode import get_repr
from rohm_tpu.reprs.decode import (
    recover_from_repr,
    recover_root_rot_pos,
    repr_to_smplx_params,
)
from rohm_tpu.reprs.canonicalize import (
    cano_seq_smplx,
    cano_seq_smplx_egobody,
    update_global_rt,
)
from rohm_tpu.reprs.stats import compute_stats, load_stats, save_stats

__all__ = [
    "BODY_FEAT_DIM",
    "FOOT_JOINT_INDEX",
    "POSE_FEAT_DIM",
    "REPR_DIM_DICT",
    "REPR_LIST",
    "TRAJ_ABS_INDEX",
    "TRAJ_FEAT_DIM_ABS",
    "TRAJ_FEAT_DIM_FULL",
    "block_slice",
    "scatter_traj_abs",
    "split_repr",
    "get_repr",
    "recover_from_repr",
    "recover_root_rot_pos",
    "repr_to_smplx_params",
    "cano_seq_smplx",
    "cano_seq_smplx_egobody",
    "update_global_rt",
    "compute_stats",
    "load_stats",
    "save_stats",
]
