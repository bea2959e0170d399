"""Custom TPU kernels (Pallas).

The PoseNet denoise step is overhead-bound, not matmul-bound (bf16 only buys
~6%): at [B, 145, 512] the per-op HBM round-trips between the ~30 XLA ops of
a transformer layer dominate. The fused layer kernel keeps a whole encoder
layer's intermediates in VMEM (weights ~8.4 MB + activations < 1 MB per batch
row), cutting per-layer HBM traffic to in + out + weights.
"""

from rohm_tpu.ops.transformer_layer import (
    fused_encoder_layer,
    posenet_apply_fused,
)

__all__ = ["fused_encoder_layer", "posenet_apply_fused"]
