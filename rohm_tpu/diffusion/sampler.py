"""The reverse diffusion process as a single `lax.scan` — the hot loop.

Replaces the reference's python for-loop over t
(gaussian_diffusion_*.py:559-627) plus the guidance branches of
GaussianDiffusionPoseNet.p_sample_with_grad (:445-480). One compiled program
runs all T steps on device: no per-step dispatch, no host sync, PRNG key
threaded through the carry.

Guidance: each `GuidanceSpec` contributes
    mean += weight * posterior_variance[t] * (-grad loss(pred_x0))
when t <= t_threshold, computed via `jax.grad` of a pure loss function and
gated with `lax.cond` so the (expensive) SMPL-X backward only runs on the
guided tail of the chain.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from rohm_tpu.diffusion.gaussian import p_mean_from_x0
from rohm_tpu.diffusion.schedule import DiffusionSchedule


@dataclass(frozen=True)
class GuidanceSpec:
    """One test-time guidance term.

    loss_fn(x [*shape]) -> scalar; differentiated wrt the model's pred_x0.
    grad_mask zeroes protected dims (traj + contact labels in RoHM,
    reference model/posenet.py:251-252); weight/t_threshold per
    gaussian_diffusion_posenet.py:461-477 ('amass': skating 3e6 @ t<=50,
    'prox': 2d-reproj 3e5 + skating 1e5 @ t<=100).
    """

    loss_fn: Callable[[jnp.ndarray], jnp.ndarray]
    weight: float
    t_threshold: int
    grad_mask: jnp.ndarray | None = None


def p_sample_loop(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    sched: DiffusionSchedule,
    shape: tuple,
    key: jax.Array,
    noise: jnp.ndarray | None = None,
    guidance: tuple[GuidanceSpec, ...] = (),
    early_stop_steps: int = 0,
    dtype=jnp.float32,
    step_noise: jnp.ndarray | None = None,
    unroll: int = 1,
) -> jnp.ndarray:
    """Run the full reverse chain.

    Args:
      model_fn(x_t, t_scalar) -> pred_x0, where t is the (respacing-mapped)
        original timestep as an int32 scalar.
      shape: static sample shape (B, T, D).
      key: PRNG key; per-step noise derives from fold_in(key, t).
      noise: optional fixed x_T (else sampled from N(0, I)).
      guidance: guidance terms (see GuidanceSpec).
      early_stop_steps: truncate the chain this many steps before t=0 and
        return pred_x0 instead of the stochastic sample (reference
        early_stop=True -> 980 of 1000 steps, _posenet.py:624-626, :568-571).
      step_noise: optional preset per-step noise [num_timesteps, *shape],
        indexed by internal timestep t (deterministic replay: reproduce a
        recorded chain exactly, or cross-check against another sampler
        implementation fed the same noise).
      unroll: lax.scan unroll factor — lets XLA overlap step t's noise
        generation / posterior math with step t-1's model compute. Math-
        identical to unroll=1 (same ops, same order per step).

    Returns: final sample [B, T, D] (or final pred_x0 when early stopping).
    """
    num_steps = sched.num_timesteps - int(early_stop_steps > 0) * early_stop_steps
    t_hi = sched.num_timesteps - 1  # first (noisiest) step
    t_lo = sched.num_timesteps - num_steps  # last step executed

    if noise is None:
        # step keys are fold_in(key, t) for t < num_timesteps; this one is distinct
        nkey = jax.random.fold_in(key, sched.num_timesteps)
        x_init = jax.random.normal(nkey, shape, dtype)
    else:
        x_init = noise

    # Guidance thresholds compare the INTERNAL (spaced) step index, exactly as
    # the reference does: `t[0] <= 50/100` runs inside the BASE class's
    # p_sample_with_grad on the raw loop index
    # (gaussian_diffusion_posenet.py:461-477); SpacedDiffusion's _WrappedModel
    # remaps ts for the MODEL call only (respace.py:183-195). So under
    # 'ddimN' respacing the reference guides the last thr+1 SPACED steps, not
    # original timesteps <= thr — identical with empty respacing (all shipped
    # configs). An earlier round mapped thresholds through timestep_map here;
    # that inverted the reference's semantics and guided ~10x fewer steps
    # under respacing.
    internal_thr = tuple(int(s.t_threshold) for s in guidance)

    def guidance_shift(pred_x0, t, var, active: tuple[bool, ...]):
        """Sum of guidance mean-shifts. `active[i]` statically includes spec i
        unconditionally; inactive specs with a threshold inside this scan
        segment fall back to a lax.cond gate."""
        shift = jnp.zeros_like(pred_x0)
        for spec, thr_i, is_active in zip(guidance, internal_thr, active):
            def apply(x0, s=spec):
                g = -jax.grad(s.loss_fn)(x0)
                if s.grad_mask is not None:
                    g = g * s.grad_mask
                return s.weight * var * g

            if is_active:
                shift = shift + apply(pred_x0)
            else:
                shift = shift + jax.lax.cond(
                    t <= thr_i,
                    apply,
                    lambda x0: jnp.zeros_like(x0),
                    pred_x0,
                )
        return shift

    def make_step(active: tuple[bool, ...] | None):
        def step(carry, t):
            x, _ = carry
            t_model = sched.timestep_map[t]
            pred_x0 = model_fn(x, t_model)
            mean, var, log_var = p_mean_from_x0(sched, pred_x0, x, t)
            if active is not None:
                mean = mean + guidance_shift(pred_x0, t, var, active)
            if step_noise is not None:
                noise_t = step_noise[t].astype(dtype)
            else:
                step_key = jax.random.fold_in(key, t)
                noise_t = jax.random.normal(step_key, shape, dtype)
            nonzero = (t != 0).astype(dtype)
            x_next = mean + nonzero * jnp.exp(0.5 * log_var) * noise_t
            # carry (not stack) the newest pred_x0 — stacking 1000 steps of
            # [B, T, 294] would not fit in HBM
            return (x_next, pred_x0), None

        return step

    carry = (x_init, x_init)
    if guidance:
        # split the chain at the highest guidance threshold: the upper segment
        # runs with no guidance machinery at all, the lower with each
        # spec applied (statically where its threshold covers the segment) —
        # leaner compile and no per-step cond dispatch (reference embeds the
        # t-threshold branches in p_sample_with_grad, _posenet.py:461-477)
        thr = max(internal_thr)
        split = min(thr, t_hi)  # last guided internal index
        if split < t_hi:
            ts_upper = jnp.arange(t_hi, max(split, t_lo - 1), -1)
            carry, _ = jax.lax.scan(make_step(None), carry, ts_upper,
                                    unroll=unroll)
        ts_lower = jnp.arange(min(split, t_hi), t_lo - 1, -1)
        active = tuple(t >= split for t in internal_thr)
        carry, _ = jax.lax.scan(make_step(active), carry, ts_lower,
                                unroll=unroll)
    else:
        timesteps = jnp.arange(t_hi, t_lo - 1, -1)
        carry, _ = jax.lax.scan(make_step(None), carry, timesteps,
                                unroll=unroll)
    x_final, pred_x0_last = carry
    if early_stop_steps > 0:
        return pred_x0_last
    return x_final


def ddim_sample_loop(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    sched: DiffusionSchedule,
    shape: tuple,
    key: jax.Array,
    eta: float = 0.0,
    noise: jnp.ndarray | None = None,
    dtype=jnp.float32,
    step_noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """DDIM reverse chain as one scan (reference keeps ddim loops at
    gaussian_diffusion_*.py:630-854 for 'ddimN' respacing; eta=0 =
    deterministic). Use with a respaced schedule (make_schedule(...,
    timestep_respacing='ddimN')). step_noise [num_timesteps, *shape] replays
    a fixed per-step noise realization (only consumed when eta > 0)."""
    timesteps = jnp.arange(sched.num_timesteps - 1, -1, -1)
    if noise is None:
        nkey = jax.random.fold_in(key, sched.num_timesteps)
        x_init = jax.random.normal(nkey, shape, dtype)
    else:
        x_init = noise

    def step(x, t):
        t_model = sched.timestep_map[t]
        pred_x0 = model_fn(x, t_model)
        eps = (
            sched.sqrt_recip_alphas_cumprod[t] * x - pred_x0
        ) / sched.sqrt_recipm1_alphas_cumprod[t]
        acp = sched.alphas_cumprod[t]
        acp_prev = sched.alphas_cumprod_prev[t]
        sigma = (
            eta
            * jnp.sqrt((1 - acp_prev) / (1 - acp))
            * jnp.sqrt(1 - acp / acp_prev)
        )
        mean = (
            jnp.sqrt(acp_prev) * pred_x0
            + jnp.sqrt(jnp.maximum(1.0 - acp_prev - sigma**2, 0.0)) * eps
        )
        if step_noise is not None:
            noise_t = step_noise[t].astype(dtype)
        else:
            step_key = jax.random.fold_in(key, t)
            noise_t = jax.random.normal(step_key, shape, dtype)
        nonzero = (t != 0).astype(dtype)
        return mean + nonzero * sigma * noise_t, None

    x_final, _ = jax.lax.scan(step, x_init, timesteps)
    return x_final
