"""DDIM sampler tests (respaced schedules)."""

import jax
import jax.numpy as jnp
import numpy as np

from rohm_tpu.diffusion import ddim_sample_loop, make_schedule


def test_ddim_respaced_runs():
    sched = make_schedule("cosine", 100, "ddim25")
    assert sched.num_timesteps == 25
    out = jax.jit(
        lambda k: ddim_sample_loop(lambda x, t: x * 0.0, sched, (2, 8, 4), k)
    )(jax.random.PRNGKey(0))
    assert out.shape == (2, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_ddim_eta0_deterministic():
    sched = make_schedule("cosine", 50, "ddim10")
    target = jnp.ones((1, 4, 3)) * 0.5

    def model_fn(x, t):
        return jnp.broadcast_to(target, x.shape)

    out1 = ddim_sample_loop(model_fn, sched, (1, 4, 3), jax.random.PRNGKey(0), eta=0.0)
    out2 = ddim_sample_loop(model_fn, sched, (1, 4, 3), jax.random.PRNGKey(9), eta=0.0,
                            noise=jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(0), 10), (1, 4, 3)))
    # eta=0: trajectory determined by x_T and the model — same x_T, same result
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
    # perfect constant model converges to its prediction
    np.testing.assert_allclose(np.asarray(out1), np.asarray(target), atol=1e-3)


def test_ddim_timestep_map_passed_to_model():
    sched = make_schedule("cosine", 100, "ddim10")
    seen = []

    def model_fn(x, t):
        seen.append(t)
        return x * 0.0

    ddim_sample_loop(model_fn, sched, (1, 2, 2), jax.random.PRNGKey(0))
    # the model is conditioned on ORIGINAL timesteps (respace.py:183-195)
    assert len(seen) == 1  # traced once inside scan
