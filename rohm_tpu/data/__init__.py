"""Data layer (L3): AMASS preprocessing, clip datasets, noise model, video data.

Host-side numpy/scipy; everything emitted to the device is a fixed-shape
float32 array (great fit for XLA: clips are always [clip_len-1, 294]).
"""

from rohm_tpu.data.synthetic import synthetic_motion, synthetic_clip_batch

__all__ = ["synthetic_motion", "synthetic_clip_batch"]
