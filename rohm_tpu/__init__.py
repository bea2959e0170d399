"""rohm_tpu: TPU-native framework for robust human motion reconstruction via diffusion.

A from-scratch JAX/XLA rebuild of the capabilities of RoHM (CVPR 2024):
conditional diffusion models for global trajectory (TrajNet) and local body pose
(PoseNet), coupled through a ControlNet-style branch (TrajControl) and an
iterative inference scheme, with test-time guidance gradients computed through a
pure-JAX SMPL-X body model.

Design is TPU-first: fixed shapes, `lax.scan` sampling loops, `jax.grad`
guidance, `jax.sharding.Mesh` data parallelism, bf16-friendly matmuls.
"""

__version__ = "0.1.0"
