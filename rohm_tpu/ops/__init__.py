"""Custom TPU kernels (Pallas).

Two generations of the fused PoseNet encoder layer:

- transformer_layer (f32): round 1. One sequence per program; keeps a whole
  layer's intermediates in VMEM, cutting per-layer HBM traffic.
- transformer_layer_bf16: round 2 production path. Groups 8 sequences per
  program so the dense GEMMs run at 1152 rows (9 x 128 MXU tiles, zero row
  padding), stores weights/activations in bf16 with f32 accumulation and
  f32 softmax/LayerNorm, fuses q/k/v into one GEMM, and casts parameters
  ONCE outside the sampling scan (prepare_posenet_fused). Measured on v5e:
  ~790 denoise steps/s for the 1000-step chain vs ~690 for the f32 kernel.
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

__all__ = [
    "fused_encoder_layer",
    "posenet_apply_fused",
    "fused_encoder_layer_bf16",
    "prepare_posenet_fused",
    "posenet_apply_prepared",
    "embed_cond",
]
