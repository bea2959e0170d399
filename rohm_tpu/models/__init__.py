"""Models (L5): Flax denoisers + their losses + test-time guidance.

- `TrajNet`: conditional 1-D temporal U-Net (+ optional `ControlNet` branch)
  predicting the clean trajectory repr (reference model/trajnet.py)
- `PoseNet`: transformer-encoder denoiser for the full 294-d repr
  (reference model/posenet.py)
- `losses`: repr + global-joint losses computed through the SMPL-X decode
- `guidance`: foot-skating / 2-D reprojection losses for test-time gradients

Layout convention: [batch, time, features] everywhere (the reference's
[bs, D, 1, T] permute dance is a torch artifact and is not reproduced).
"""

from rohm_tpu.models.trajnet import TrajNet
from rohm_tpu.models.posenet import PoseNet

__all__ = ["TrajNet", "PoseNet"]
