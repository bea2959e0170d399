#!/usr/bin/env python
"""Per-component timing of the inference pipeline on the attached device.

Times (compiled steady-state): TrajNet 100-step chain, PoseNet 1000-step chain
(unguided + amass-guided), the traj->pose bridge, and batch scaling. Guides
where optimization effort goes (SURVEY.md hard part #7)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rohm_tpu.body import synthetic_model
from rohm_tpu.diffusion import make_schedule, p_sample_loop
from rohm_tpu.models import PoseNet, TrajNet
from rohm_tpu.models.guidance import amass_guidance
from rohm_tpu.pipeline import traj_to_pose_bridge

T = 144


def timeit(fn, *args, n=3, tag=""):
    t0 = time.perf_counter()
    fn(*args).block_until_ready()  # compile
    print(f"  [{tag}] compile+first run: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        fn(*args).block_until_ready()
    return (time.perf_counter() - t0) / n


def main():
    from rohm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    body = synthetic_model(num_verts=64)
    mean = jnp.zeros(294)
    std = jnp.ones(294)
    key = jax.random.PRNGKey(0)

    print(f"device: {jax.devices()[0].platform}")
    batches = [int(b) for b in (sys.argv[1:] or ["32", "128"])]
    for batch in batches:
        trajnet = TrajNet(traj_feat_dim=13, cond_dim=13)
        p_traj = jax.jit(trajnet.init)(key, jnp.zeros((1, T, 13)), jnp.zeros((1, T, 13)),
                              jnp.zeros((1,), jnp.int32))
        posenet = PoseNet()
        p_pose = jax.jit(posenet.init)(key, jnp.zeros((1, T - 1, 294)), jnp.zeros((1, T - 1, 294)),
                              jnp.zeros((1,), jnp.int32))
        sched_t = make_schedule("cosine", 100)
        sched_p = make_schedule("cosine", 1000)
        cond_t = jnp.zeros((batch, T, 13))
        cond_p = jnp.zeros((batch, T - 1, 294))
        full = jnp.zeros((batch, T, 294))

        @jax.jit
        def run_traj(c, k):
            return p_sample_loop(lambda x, t: trajnet.apply(p_traj, x, c, t),
                                 sched_t, (batch, T, 13), k)

        @jax.jit
        def run_pose(c, k):
            return p_sample_loop(lambda x, t: posenet.apply(p_pose, x, c, t),
                                 sched_p, (batch, T - 1, 294), k)

        guidance = amass_guidance(mean, std, body)

        @jax.jit
        def run_pose_guided(c, k):
            return p_sample_loop(lambda x, t: posenet.apply(p_pose, x, c, t),
                                 sched_p, (batch, T - 1, 294), k, guidance=guidance)

        from rohm_tpu.ops import (
            embed_cond,
            posenet_apply_fused,
            posenet_apply_prepared,
            prepare_posenet_int8,
        )

        @jax.jit
        def run_pose_guided_fused(c, k):
            return p_sample_loop(
                lambda x, t: posenet_apply_fused(p_pose, x, c, t),
                sched_p, (batch, T - 1, 294), k, guidance=guidance)

        prep_int8 = prepare_posenet_int8(p_pose)

        @jax.jit
        def run_pose_guided_int8(c, k):
            ce = embed_cond(prep_int8, c)  # once, outside the scan
            return p_sample_loop(
                lambda x, t: posenet_apply_prepared(prep_int8, x, c, t, cond_emb=ce),
                sched_p, (batch, T - 1, 294), k, guidance=guidance)

        @jax.jit
        def run_bridge(tr, fl):
            return traj_to_pose_bridge(tr, fl, mean, std, body)

        tt = timeit(run_traj, cond_t, key, tag="traj")
        tp = timeit(run_pose, cond_p, key, tag="pose")
        tg = timeit(run_pose_guided, cond_p, key, tag="pose+guide")
        tgf = timeit(run_pose_guided_fused, cond_p, key, tag="pose+guide fused")
        tgi = timeit(run_pose_guided_int8, cond_p, key, tag="pose+guide int8")
        tb = timeit(run_bridge, jnp.zeros((batch, T, 13)), full, tag="bridge")
        total = 2 * (tt + tgf + tb)
        total_i8 = 2 * (tt + tgi + tb)
        print(
            f"bs={batch:4d}  trajnet100={tt*1e3:8.1f}ms  posenet1000={tp*1e3:8.1f}ms  "
            f"posenet1000+guide={tg*1e3:8.1f}ms  fused+guide={tgf*1e3:8.1f}ms  "
            f"int8+guide={tgi*1e3:8.1f}ms  bridge={tb*1e3:6.1f}ms  "
            f"full2iter(fused)~{total*1e3:8.1f}ms  clips/s={batch/total:7.1f}  "
            f"full2iter(int8)~{total_i8*1e3:8.1f}ms  clips/s={batch/total_i8:7.1f}"
        )


if __name__ == "__main__":
    main()
