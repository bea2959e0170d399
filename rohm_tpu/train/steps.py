"""Jitted training + eval-sampling steps for TrajNet and PoseNet.

One fused device program per optimizer step: uniform timestep draw, q_sample,
model forward, SMPL-X-in-the-loop losses, backward, AdamW update (the
reference splits this across python in training_loop_*.py:126-139 / :276-288).

Data parallelism: pass a Mesh and the step is wrapped so the batch is split on
the 'data' axis while state stays replicated — XLA inserts the gradient psum.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rohm_tpu.body import SmplxModel
from rohm_tpu.diffusion import DiffusionSchedule, p_sample_loop, q_sample
from rohm_tpu.models.losses import posenet_losses, trajnet_losses
from rohm_tpu.train.state import TrainState


def _timesteps(key, batch_size: int, num_timesteps: int) -> jnp.ndarray:
    """UniformSampler (reference resample.py:45-61): uniform t, unit weights."""
    return jax.random.randint(key, (batch_size,), 0, num_timesteps)


def _rbg_dropout_key(key: jax.Array) -> jax.Array:
    """Derive an rbg-impl PRNG key from a threefry key. Dropout draws ~43M
    mask bits per PoseNet forward (attention-probs masks dominate); threefry
    bit generation measured 13 ms of a 31 ms fwd+bwd at bs=64 on v5e, rbg
    makes it ~free (31.3 -> 18.5 ms). Any counter-based Bernoulli stream is a
    valid dropout distribution — the reference's torch RNG differs anyway."""
    bits = jax.random.bits(key, (4,), jnp.uint32)
    return jax.random.wrap_key_data(bits, impl="rbg")


def _shardings(mesh: Mesh | None):
    if mesh is None:
        return {}
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return {"rep": rep, "data": data}


def make_trajnet_grads_fn(
    model,
    sched: DiffusionSchedule,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    body_model: SmplxModel,
    loss_weights: dict,
    repr_abs_only: bool = True,
    traj_feat_dim: int = 13,
) -> Callable:
    """grads_and_losses(params, batch, t, noise) -> (grads, loss_dict).

    The exact per-step training math (q_sample slicing -> model forward ->
    SMPL-X-in-the-loop losses -> parameter gradients) with t and the q_sample
    noise as explicit inputs — the unit make_trajnet_train_step wraps and
    tests/test_train_parity.py compares against the real reference
    training_losses (gaussian_diffusion_trajnet.py:857-875 through
    model/trajnet.py:278-400) at identical weights/batch/t/noise.
    """

    def grads_and_losses(params, batch: dict, t: jnp.ndarray, noise: jnp.ndarray):
        clean = batch["motion_repr_clean"]
        # q_sample runs on the FIRST traj_feat_dim dims of the clean repr —
        # the reference does this even in abs-only mode where the model's
        # output is interpreted as the scattered abs-dims
        # (gaussian_diffusion_trajnet.py:869-872 vs model/trajnet.py:292-297).
        x0 = clean[..., :traj_feat_dim]
        x_t = q_sample(sched, x0, t, noise)

        def loss_fn(params):
            out = model.apply(
                params, x_t, batch["cond"], t, control_cond=batch.get("control_cond")
            )
            losses = trajnet_losses(
                out, clean, mean, std, body_model, loss_weights, repr_abs_only
            )
            return losses["loss"], losses

        return jax.grad(loss_fn, has_aux=True)(params)

    return grads_and_losses


def make_trajnet_train_step(
    model,
    sched: DiffusionSchedule,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    body_model: SmplxModel,
    loss_weights: dict,
    repr_abs_only: bool = True,
    traj_feat_dim: int = 13,
    mesh: Mesh | None = None,
) -> Callable:
    """step(state, batch, key) -> (state, loss_dict).

    batch keys: motion_repr_clean [B,T,294], cond [B,T,traj_feat_dim],
    optionally control_cond [B,T,272] (TrajControl fine-tuning).
    """
    grads_and_losses = make_trajnet_grads_fn(
        model, sched, mean, std, body_model, loss_weights, repr_abs_only, traj_feat_dim
    )

    def step(state: TrainState, batch: dict, key: jax.Array):
        t_key, n_key = jax.random.split(key)
        clean = batch["motion_repr_clean"]
        t = _timesteps(t_key, clean.shape[0], sched.num_timesteps)
        noise = jax.random.normal(
            n_key, clean[..., :traj_feat_dim].shape, clean.dtype
        )
        grads, losses = grads_and_losses(state.params, batch, t, noise)
        return state.apply_gradients(grads), losses

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    s = _shardings(mesh)
    return jax.jit(
        step,
        donate_argnums=(0,),
        in_shardings=(s["rep"], s["data"], s["rep"]),
        out_shardings=(s["rep"], s["rep"]),
    )


def make_posenet_grads_fn(
    model,
    sched: DiffusionSchedule,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    body_model: SmplxModel,
    loss_weights: dict,
    mesh: Mesh | None = None,
    fused_train: str | None = None,
) -> Callable:
    """grads_and_losses(params, batch, t, noise, drop_key, skating_active).

    The exact per-step training math (full-294-d q_sample -> model forward ->
    losses -> gradients) with t and the q_sample noise as explicit inputs —
    make_posenet_train_step wraps this and tests/test_train_parity.py compares
    it against the real reference training_losses
    (gaussian_diffusion_posenet.py:892-910 through model/posenet.py:99-193).

    fused_train: "bfloat16" / "float32" runs the encoder stack through the
    custom-VJP fused Pallas layers (ops/transformer_layer_train.py) with that
    GEMM dtype instead of flax autodiff — same math, hand-written backward.
    """
    if fused_train:
        from rohm_tpu.ops.transformer_layer_train import posenet_apply_train

        fused_dtype = jnp.dtype(fused_train)

        def _fused_apply(params, x_t, cond, t, drop_key):
            return posenet_apply_train(
                params, x_t, cond, t, drop_key,
                num_layers=model.num_layers, num_heads=model.num_heads,
                traj_feat_dim=model.traj_feat_dim, dropout_p=model.dropout,
                dtype=fused_dtype,
            )

        if mesh is not None:
            # Mosaic custom calls have no GSPMD partitioning rule; run the
            # fused fwd+bwd per-shard via shard_map (differentiable — its
            # transpose inserts the param-grad psum). Fold the shard index
            # into the dropout key so shards draw independent masks.
            def _shard_apply(params, x_t, cond, t, drop_key):
                drop_key = jax.random.fold_in(drop_key, jax.lax.axis_index("data"))
                return _fused_apply(params, x_t, cond, t, drop_key)

            apply_fn = jax.shard_map(
                _shard_apply, mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P("data"), P()),
                out_specs=P("data"), check_vma=False,
            )
        else:
            apply_fn = _fused_apply
    else:
        def apply_fn(params, x_t, cond, t, drop_key):
            return model.apply(
                params, x_t, cond, t, train=True, rngs={"dropout": drop_key}
            )

    def grads_and_losses(
        params, batch: dict, t: jnp.ndarray, noise: jnp.ndarray,
        drop_key: jax.Array, skating_active,
    ):
        clean = batch["motion_repr_clean"]
        x_t = q_sample(sched, clean, t, noise)

        def loss_fn(params):
            out = apply_fn(params, x_t, batch["cond"], t, drop_key)
            losses = posenet_losses(
                out, clean, mean, std, body_model, loss_weights,
                skating_active=skating_active,
            )
            return losses["loss"], losses

        return jax.grad(loss_fn, has_aux=True)(params)

    return grads_and_losses


def make_posenet_train_step(
    model,
    sched: DiffusionSchedule,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    body_model: SmplxModel,
    loss_weights: dict,
    mesh: Mesh | None = None,
    fused_train: str | None = None,
) -> Callable:
    """step(state, batch, key, skating_active) -> (state, loss_dict).

    batch keys: motion_repr_clean [B,T,294], cond [B,T,294] (masked).
    skating_active gates the foot-skating loss (start_skating_loss_epoch).
    """
    grads_and_losses = make_posenet_grads_fn(
        model, sched, mean, std, body_model, loss_weights, mesh, fused_train
    )

    def step(state: TrainState, batch: dict, key: jax.Array, skating_active: jnp.ndarray):
        t_key, n_key, d_key = jax.random.split(key, 3)
        clean = batch["motion_repr_clean"]
        t = _timesteps(t_key, clean.shape[0], sched.num_timesteps)
        noise = jax.random.normal(n_key, clean.shape, clean.dtype)
        grads, losses = grads_and_losses(
            state.params, batch, t, noise, _rbg_dropout_key(d_key), skating_active
        )
        return state.apply_gradients(grads), losses

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    s = _shardings(mesh)
    return jax.jit(
        step,
        donate_argnums=(0,),
        in_shardings=(s["rep"], s["data"], s["rep"], s["rep"]),
        out_shardings=(s["rep"], s["rep"]),
    )


def make_trajnet_sampler(
    model, sched: DiffusionSchedule, traj_feat_dim: int = 13, mesh: Mesh | None = None
) -> Callable:
    """sample(params, cond, key, control_cond=None) -> [B, T, traj_feat_dim].

    The whole (typically 100-step) reverse chain is one compiled scan."""

    def sample(params, cond, key, control_cond=None):
        def model_fn(x, t):
            return model.apply(params, x, cond, t, control_cond=control_cond)

        shape = (cond.shape[0], cond.shape[1], traj_feat_dim)
        return p_sample_loop(model_fn, sched, shape, key)

    if mesh is None:
        return jax.jit(sample)
    s = _shardings(mesh)
    return jax.jit(
        sample,
        in_shardings=(s["rep"], s["data"], s["rep"], s["data"]),
        out_shardings=s["data"],
    )


def make_posenet_sampler(
    model,
    sched: DiffusionSchedule,
    guidance: tuple = (),
    early_stop_steps: int = 0,
    mesh: Mesh | None = None,
    fused: bool = False,
) -> Callable:
    """sample(params, cond, key) -> [B, T, 294] (1000-step chain, one scan).

    fused=True runs the denoiser through the Pallas fused encoder layers
    (inference-only, ~23% faster on v5e; parity ~2e-5 vs flax)."""

    def sample(params, cond, key):
        if fused:
            from rohm_tpu.ops import posenet_apply_fused

            def model_fn(x, t):
                return posenet_apply_fused(
                    params, x, cond, t,
                    num_layers=model.num_layers, num_heads=model.num_heads,
                    traj_feat_dim=model.traj_feat_dim,
                )
        else:
            def model_fn(x, t):
                return model.apply(params, x, cond, t)

        return p_sample_loop(
            model_fn, sched, cond.shape, key,
            guidance=guidance, early_stop_steps=early_stop_steps,
        )

    if mesh is None:
        return jax.jit(sample)
    s = _shardings(mesh)
    return jax.jit(
        sample,
        in_shardings=(s["rep"], s["data"], s["rep"]),
        out_shardings=s["data"],
    )
