#!/usr/bin/env python
"""Ablation: lax.scan `unroll` factor on the flagship PoseNet sampling chain.

Same setup as bench.py (int8 fused PoseNet 512d x 8L, bs=32, T=143, 1000
steps) run at unroll in {1, 2, 4}. Rationale: the round-2 int8 anatomy
(BASELINE.md) attributes ~60 us/step to the sampler wrapper (rbg noise gen +
posterior mean/variance math) on top of the 916 us model body; unrolling the
scan lets XLA schedule step t's noise generation (independent of x) behind
step t-1's model compute. This measures whether that overlap is real on v5e
or whether Mosaic/XLA already hide it at unroll=1.

Run on the real chip (no JAX_PLATFORMS override); one TPU process at a time.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = 32
T = 143
STEPS = 1000


def main():
    from rohm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from rohm_tpu.diffusion import make_schedule, p_sample_loop
    from rohm_tpu.models import PoseNet
    from rohm_tpu.ops import embed_cond, posenet_apply_prepared, prepare_posenet_int8

    model = PoseNet()
    x = jnp.zeros((BATCH, T, 294), jnp.float32)
    cond = jnp.zeros((BATCH, T, 294), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, cond, jnp.zeros((BATCH,), jnp.int32)
    )
    sched = make_schedule("cosine", STEPS)
    prep = prepare_posenet_int8(params)
    cond_emb = embed_cond(prep, cond)

    for unroll in (1, 2, 4):

        @jax.jit
        def sample(key, _unroll=unroll):
            def model_fn(xt, t):
                return posenet_apply_prepared(prep, xt, cond, t, cond_emb=cond_emb)

            return p_sample_loop(
                model_fn, sched, (BATCH, T, 294), key, unroll=_unroll
            )

        sample(jax.random.key(1, impl="rbg")).block_until_ready()
        n_rep = 3
        t0 = time.perf_counter()
        for i in range(n_rep):
            sample(jax.random.key(2 + i, impl="rbg")).block_until_ready()
        dt = (time.perf_counter() - t0) / n_rep
        print(
            f"unroll={unroll}: {dt * 1e3:8.1f} ms/chain  "
            f"{STEPS / dt:7.1f} steps/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
