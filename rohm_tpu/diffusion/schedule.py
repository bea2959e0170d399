"""Beta schedules + timestep respacing, precomputed in float64 on host.

Array definitions match guided-diffusion exactly (reference
diffusion/gaussian_diffusion_trajnet.py:14-58 for schedules, :131-168 for the
derived arrays, respace.py:10-63 for timestep subset selection); the derived
arrays ship to device as float32 (the reference also casts to float on use).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import struct


def get_named_beta_schedule(
    schedule_name: str, num_diffusion_timesteps: int, scale_betas: float = 1.0
) -> np.ndarray:
    """'linear' (Ho et al., rescaled to any T) or 'cosine' (Nichol & Dhariwal)."""
    if schedule_name == "linear":
        scale = scale_betas * 1000 / num_diffusion_timesteps
        return np.linspace(
            scale * 0.0001, scale * 0.02, num_diffusion_timesteps, dtype=np.float64
        )
    if schedule_name == "cosine":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        max_beta = 0.999
        n = num_diffusion_timesteps
        betas = [
            min(1 - alpha_bar((i + 1) / n) / alpha_bar(i / n), max_beta) for i in range(n)
        ]
        return np.array(betas, dtype=np.float64)
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def space_timesteps(num_timesteps: int, section_counts) -> set:
    """Subset of original timesteps for respaced sampling ('ddimN' or counts)."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return set(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        frac_stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            all_steps.append(start_idx + round(cur))
            cur += frac_stride
        start_idx += size
    return set(all_steps)


@struct.dataclass
class DiffusionSchedule:
    """All precomputed schedule arrays, device-resident (float32).

    When respaced, `timestep_map[i]` is the original timestep the model should
    be conditioned on for internal step i (reference respace.py:183-195).
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    timestep_map: jnp.ndarray  # [num_timesteps] int32
    num_timesteps: int = struct.field(pytree_node=False)


def make_schedule(
    schedule_name: str = "cosine",
    num_diffusion_timesteps: int = 1000,
    timestep_respacing: str = "",
    scale_betas: float = 1.0,
    dtype=jnp.float32,
) -> DiffusionSchedule:
    """Build (optionally respaced) schedule; all math in float64 on host."""
    base_betas = get_named_beta_schedule(schedule_name, num_diffusion_timesteps, scale_betas)

    if timestep_respacing:
        use = space_timesteps(num_diffusion_timesteps, timestep_respacing)
        base_alphas_cumprod = np.cumprod(1.0 - base_betas)
        last = 1.0
        betas_list, tmap = [], []
        for i, ac in enumerate(base_alphas_cumprod):
            if i in use:
                betas_list.append(1 - ac / last)
                last = ac
                tmap.append(i)
        betas = np.array(betas_list, dtype=np.float64)
        timestep_map = np.array(tmap, dtype=np.int32)
    else:
        betas = base_betas
        timestep_map = np.arange(num_diffusion_timesteps, dtype=np.int32)

    assert (betas > 0).all() and (betas <= 1).all()
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.append(1.0, ac[:-1])

    posterior_variance = betas * (1.0 - ac_prev) / (1.0 - ac)
    posterior_log_variance_clipped = np.log(
        np.append(posterior_variance[1], posterior_variance[1:])
    )
    c1 = betas * np.sqrt(ac_prev) / (1.0 - ac)
    c2 = (1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac)

    as_dev = lambda a: jnp.asarray(a, dtype)
    return DiffusionSchedule(
        betas=as_dev(betas),
        alphas_cumprod=as_dev(ac),
        alphas_cumprod_prev=as_dev(ac_prev),
        sqrt_alphas_cumprod=as_dev(np.sqrt(ac)),
        sqrt_one_minus_alphas_cumprod=as_dev(np.sqrt(1.0 - ac)),
        sqrt_recip_alphas_cumprod=as_dev(np.sqrt(1.0 / ac)),
        sqrt_recipm1_alphas_cumprod=as_dev(np.sqrt(1.0 / ac - 1)),
        posterior_variance=as_dev(posterior_variance),
        posterior_log_variance_clipped=as_dev(posterior_log_variance_clipped),
        posterior_mean_coef1=as_dev(c1),
        posterior_mean_coef2=as_dev(c2),
        timestep_map=jnp.asarray(timestep_map),
        num_timesteps=len(betas),
    )
