"""Training subsystem: masking curricula, jitted train steps, loops, checkpoints."""

from rohm_tpu.train.masking import (
    build_prox_mask_bank,
    expand_joint_visibility,
    lower_body_mask,
    posenet_eval_cond_mask,
    posenet_train_cond_mask,
    random_joint_mask,
    traj_infill_mask,
    upper_body_mask,
)
from rohm_tpu.train.state import TrainState, create_train_state
from rohm_tpu.train.steps import (
    make_posenet_grads_fn,
    make_posenet_train_step,
    make_trajnet_grads_fn,
    make_trajnet_train_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_trajnet_train_step",
    "make_posenet_train_step",
    "make_trajnet_grads_fn",
    "make_posenet_grads_fn",
    "traj_infill_mask",
    "random_joint_mask",
    "lower_body_mask",
    "upper_body_mask",
    "expand_joint_visibility",
    "build_prox_mask_bank",
    "posenet_train_cond_mask",
    "posenet_eval_cond_mask",
]
