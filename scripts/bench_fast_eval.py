#!/usr/bin/env python
"""Full-pipeline throughput: parity schedule vs respaced "fast eval".

Drives RohmPipeline.run_batch — the exact jitted program test_amass_full
runs — at production shape (T=144, PoseNet 512d x 8L, TrajNet mid=512,
2 iterations, amass guidance, int8 fused PoseNet) and compares the parity
configuration (TrajNet 100 + PoseNet 1000 steps) against respaced schedules.

The reference supports timestep respacing (/root/reference/diffusion/
respace.py:10-63) but ships timestep_respacing='' in every config; our CLI
exposes the same knob as --timestep_respacing_eval. This script quantifies
what that flag buys on TPU: sampling cost is linear in retained steps, so
respacing '100' cuts the PoseNet chain 10x. Metric cost of respacing is a
property of trained checkpoints (standard DDPM-respacing tradeoff) and
cannot be judged with random weights — treat these as throughput numbers
for an OPT-IN mode, not a parity mode.

Usage: python scripts/bench_fast_eval.py [batch ...]   (default: 32)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

T = 144  # repr frames per 145-frame clip


def main():
    from rohm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from rohm_tpu.body import synthetic_model
    from rohm_tpu.diffusion import make_schedule
    from rohm_tpu.models import PoseNet, TrajNet
    from rohm_tpu.pipeline import RohmPipeline, amass_eval_pose_mask

    body = synthetic_model(num_verts=64)
    key = jax.random.PRNGKey(0)
    trajnet = TrajNet(traj_feat_dim=13, cond_dim=13)
    trajcontrol = TrajNet(traj_feat_dim=13, cond_dim=13, trajcontrol=True)
    posenet = PoseNet()
    p_traj = jax.jit(trajnet.init)(key, jnp.zeros((1, T, 13)), jnp.zeros((1, T, 13)),
                                   jnp.zeros((1,), jnp.int32))
    p_ctrl = jax.jit(trajcontrol.init)(
        key, jnp.zeros((1, T, 13)), jnp.zeros((1, T, 13)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, T, 272)))
    p_pose = jax.jit(posenet.init)(key, jnp.zeros((1, T - 1, 294)), jnp.zeros((1, T - 1, 294)),
                                   jnp.zeros((1,), jnp.int32))

    print(f"device: {jax.devices()[0].platform}", flush=True)
    batches = [int(b) for b in (sys.argv[1:] or ["32"])]
    for respacing in ("", "100", "50"):
        sched_t = make_schedule("cosine", 100, respacing)
        sched_p = make_schedule("cosine", 1000, respacing)
        pipeline = RohmPipeline(
            trajnet=trajnet, trajnet_params=p_traj,
            trajcontrol=trajcontrol, trajcontrol_params=p_ctrl,
            posenet=posenet, posenet_params=p_pose,
            sched_traj=sched_t, sched_pose=sched_p,
            body_model=body, mean=jnp.zeros(294), std=jnp.ones(294),
            repr_abs_only=True, traj_feat_dim=13, sample_iter=2,
            grad_type="amass", mask_scheme="lower", input_noise=True,
            fused_posenet="int8",
        )
        for batch in batches:
            args = (
                jnp.zeros((batch, T, 13)), jnp.zeros((batch, T, 294)),
                jnp.zeros((batch, T, 294)),
                jnp.asarray(amass_eval_pose_mask("lower", batch, T - 1)),
                jnp.ones((batch, T), jnp.float32),
            )

            def run(k):
                pose, traj = pipeline.run_batch(*args, k)
                return pose.block_until_ready()

            t0 = time.perf_counter()
            run(jax.random.PRNGKey(1))
            print(f"  [respace={respacing or 'none'} bs={batch}] "
                  f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
            n = 3
            t0 = time.perf_counter()
            for i in range(n):
                run(jax.random.PRNGKey(2 + i))
            dt = (time.perf_counter() - t0) / n
            steps = 2 * (len(sched_t.timestep_map) + len(sched_p.timestep_map))
            print(f"respace={respacing or 'none':>4}  bs={batch:4d}  "
                  f"full2iter={dt * 1e3:8.1f}ms  clips/s={batch / dt:7.1f}  "
                  f"({steps} denoise steps/clip)", flush=True)


if __name__ == "__main__":
    main()
