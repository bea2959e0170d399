"""Data layer (L3): AMASS preprocessing, clip datasets, noise model, video data.

Host-side numpy/scipy; everything emitted to the device is a fixed-shape
float32 array (great fit for XLA: clips are always [clip_len-1, 294]).
"""

from rohm_tpu.data.amass import (
    AmassClipDataset,
    load_noise_dict,
    save_noise_dict,
)
from rohm_tpu.data.clips import divide_into_clips, overlapping_windows
from rohm_tpu.data.synthetic import (
    synthetic_amass_arrays,
    synthetic_clip_batch,
    synthetic_motion,
    write_synthetic_amass,
    write_synthetic_egobody,
    write_synthetic_prox,
)
from rohm_tpu.data.video import VideoClipDataset

__all__ = [
    "AmassClipDataset",
    "load_noise_dict",
    "save_noise_dict",
    "divide_into_clips",
    "overlapping_windows",
    "synthetic_motion",
    "synthetic_clip_batch",
    "synthetic_amass_arrays",
    "write_synthetic_amass",
    "write_synthetic_egobody",
    "write_synthetic_prox",
    "VideoClipDataset",
]
