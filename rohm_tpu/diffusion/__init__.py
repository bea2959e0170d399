"""Diffusion engine (L4): one generic DDPM core for both TrajNet and PoseNet.

The reference ships two ~95%-identical 1000-line classes
(diffusion/gaussian_diffusion_trajnet.py, _posenet.py); here they collapse to:

- `schedule`: beta schedules + respacing, precomputed in float64 on host
  (reference gaussian_diffusion_trajnet.py:14-58, 131-168; respace.py:10-63)
- `gaussian`: q_sample / posterior / single reverse step (x0-prediction,
  FIXED_SMALL variance — the only policy any RoHM config uses)
- `sampler`: the full reverse process as ONE `lax.scan`, with test-time
  guidance fused in via `jax.grad` + `lax.cond` (replaces the reference's
  python loop over t with enable_grad/detach dances)
"""

from rohm_tpu.diffusion.schedule import (
    DiffusionSchedule,
    get_named_beta_schedule,
    make_schedule,
    space_timesteps,
)
from rohm_tpu.diffusion.gaussian import (
    p_mean_from_x0,
    p_sample_step,
    q_posterior_mean,
    q_sample,
)
from rohm_tpu.diffusion.sampler import GuidanceSpec, ddim_sample_loop, p_sample_loop

__all__ = [
    "DiffusionSchedule",
    "get_named_beta_schedule",
    "make_schedule",
    "space_timesteps",
    "p_mean_from_x0",
    "p_sample_step",
    "q_posterior_mean",
    "q_sample",
    "GuidanceSpec",
    "p_sample_loop",
    "ddim_sample_loop",
]
