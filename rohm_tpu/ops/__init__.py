"""Custom TPU kernels (Pallas).

Two generations of the fused PoseNet encoder layer:

- transformer_layer (f32): round 1. One sequence per program; keeps a whole
  layer's intermediates in VMEM, cutting per-layer HBM traffic.
- transformer_layer_bf16: round 2. Groups 8 sequences per
  program so the dense GEMMs run at 1152 rows (9 x 128 MXU tiles, zero row
  padding), stores weights/activations in bf16 with f32 accumulation and
  f32 softmax/LayerNorm, fuses q/k/v into one GEMM, and casts parameters
  ONCE outside the sampling scan (prepare_posenet_fused). Measured on v5e:
  ~790 denoise steps/s for the 1000-step chain vs ~690 for the f32 kernel.
- transformer_layer_int8: round 2 production path. Same structure, but the
  four dense projections run as W8A8 int8 GEMMs on the v5e int8 MXU (2x the
  bf16 multiply rate): per-output-column weight scales baked at prepare
  time, per-row (token) activation scales computed in-kernel, int32
  accumulation, attention/softmax/LayerNorm unchanged from the bf16 kernel.

posenet_apply_prepared dispatches on the prepared tree: use
prepare_posenet_fused(params) for bf16, prepare_posenet_int8(params) for
int8 — the apply path and cond hoisting (embed_cond) are shared.

- transformer_layer_train: round 3. custom-VJP fused layer for TRAINING —
  hand-written Pallas forward AND backward (full-recompute, in-kernel
  param-grad accumulation over the sequence-group grid, externally generated
  rbg dropout masks). posenet_apply_train is the train-mode counterpart of
  posenet_apply_fused; enabled via make_posenet_train_step(fused_train=...)
  / the --fused_train CLI flag.
"""

from rohm_tpu.ops.transformer_layer import (
    fused_encoder_layer,
    posenet_apply_fused,
)
from rohm_tpu.ops.transformer_layer_bf16 import (
    embed_cond,
    fused_encoder_layer_bf16,
    posenet_apply_prepared,
    prepare_posenet_fused,
)
from rohm_tpu.ops.transformer_layer_int8 import (
    fused_encoder_layer_int8,
    fused_encoder_stack_int8,
    prepare_posenet_int8,
)
from rohm_tpu.ops.transformer_layer_train import (
    fused_train_layer,
    posenet_apply_train,
)

__all__ = [
    "fused_encoder_layer",
    "posenet_apply_fused",
    "fused_encoder_layer_bf16",
    "fused_encoder_layer_int8",
    "fused_encoder_stack_int8",
    "prepare_posenet_fused",
    "prepare_posenet_int8",
    "posenet_apply_prepared",
    "embed_cond",
    "fused_train_layer",
    "posenet_apply_train",
]
