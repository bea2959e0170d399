"""DDPM core math: forward noising, posterior, one reverse step.

Policy is fixed to what every RoHM config uses (reference
utils/model_util.py:6-40): the model predicts x0 (START_X), variance is
FIXED_SMALL (= posterior variance), loss is plain MSE on the model output.

`t` may be scalar (inside the sampling scan: same timestep for the whole
batch, as in the reference loop at gaussian_diffusion_trajnet.py:611-612) or a
per-sample [B] vector (training).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rohm_tpu.diffusion.schedule import DiffusionSchedule


def _bcast(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather arr[t] and right-pad dims for broadcasting against an ndim tensor."""
    vals = arr[t]
    extra = ndim - vals.ndim
    return vals.reshape(vals.shape + (1,) * extra)


def q_sample(
    sched: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Sample q(x_t | x_0) (reference gaussian_diffusion_trajnet.py:192-210)."""
    return (
        _bcast(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        + _bcast(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
    )


def q_posterior_mean(
    sched: DiffusionSchedule, x_start: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Mean of q(x_{t-1} | x_t, x_0) (reference :212-234)."""
    return (
        _bcast(sched.posterior_mean_coef1, t, x_t.ndim) * x_start
        + _bcast(sched.posterior_mean_coef2, t, x_t.ndim) * x_t
    )


def p_mean_from_x0(
    sched: DiffusionSchedule, pred_xstart: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(mean, variance, log_variance) of p(x_{t-1} | x_t) given predicted x0."""
    mean = q_posterior_mean(sched, pred_xstart, x_t, t)
    var = _bcast(sched.posterior_variance, t, x_t.ndim)
    log_var = _bcast(sched.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, var, log_var


def p_sample_step(
    sched: DiffusionSchedule,
    pred_xstart: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
    mean_shift: jnp.ndarray | float = 0.0,
) -> jnp.ndarray:
    """One reverse step: x_{t-1} ~ N(mean + mean_shift, sigma_t^2 I).

    mean_shift carries the guidance term (weight * variance * grad); no noise
    is added at t == 0 (reference :430-437).
    """
    mean, _, log_var = p_mean_from_x0(sched, pred_xstart, x_t, t)
    noise = jax.random.normal(key, x_t.shape, x_t.dtype)
    nonzero = (t != 0).astype(x_t.dtype)
    nonzero = nonzero.reshape(nonzero.shape + (1,) * (x_t.ndim - nonzero.ndim))
    return mean + mean_shift + nonzero * jnp.exp(0.5 * log_var) * noise
