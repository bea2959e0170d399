"""Diffusion engine tests: golden schedule arrays, q_sample math, scan sampler."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rohm_tpu.diffusion import (
    GuidanceSpec,
    get_named_beta_schedule,
    make_schedule,
    p_sample_loop,
    q_posterior_mean,
    q_sample,
    space_timesteps,
)


def golden_arrays(betas):
    """Independent float64 derivation straight from the DDPM formulas."""
    betas = np.asarray(betas, np.float64)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.append(1.0, ac[:-1])
    post_var = betas * (1 - ac_prev) / (1 - ac)
    return {
        "alphas_cumprod": ac,
        "sqrt_alphas_cumprod": np.sqrt(ac),
        "sqrt_one_minus_alphas_cumprod": np.sqrt(1 - ac),
        "posterior_variance": post_var,
        "posterior_log_variance_clipped": np.log(np.append(post_var[1], post_var[1:])),
        "posterior_mean_coef1": betas * np.sqrt(ac_prev) / (1 - ac),
        "posterior_mean_coef2": (1 - ac_prev) * np.sqrt(alphas) / (1 - ac),
    }


class TestSchedules:
    def test_cosine_formula(self):
        betas = get_named_beta_schedule("cosine", 100)
        alpha_bar = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        want = [min(1 - alpha_bar((i + 1) / 100) / alpha_bar(i / 100), 0.999) for i in range(100)]
        np.testing.assert_allclose(betas, want, rtol=1e-12)

    def test_linear_formula(self):
        betas = get_named_beta_schedule("linear", 1000)
        np.testing.assert_allclose(betas[0], 1e-4)
        np.testing.assert_allclose(betas[-1], 0.02)
        assert len(betas) == 1000

    @pytest.mark.parametrize("name,steps", [("cosine", 100), ("cosine", 1000), ("linear", 1000)])
    def test_derived_arrays_golden(self, name, steps):
        betas = get_named_beta_schedule(name, steps)
        sched = make_schedule(name, steps)
        gold = golden_arrays(betas)
        for key, want in gold.items():
            got = np.asarray(getattr(sched, key))
            np.testing.assert_allclose(got, want.astype(np.float32), rtol=2e-5, atol=1e-7)

    def test_space_timesteps_ddim(self):
        s = space_timesteps(100, "ddim25")
        assert s == set(range(0, 100, 4))

    def test_space_timesteps_sections(self):
        s = space_timesteps(300, [10, 15, 20])
        assert len(s) == 45

    def test_respaced_schedule(self):
        sched = make_schedule("cosine", 100, timestep_respacing="ddim25")
        assert sched.num_timesteps == 25
        assert np.asarray(sched.timestep_map).tolist() == list(range(0, 100, 4))
        # respaced alphas_cumprod equals base alphas_cumprod at kept steps
        base = make_schedule("cosine", 100)
        np.testing.assert_allclose(
            np.asarray(sched.alphas_cumprod),
            np.asarray(base.alphas_cumprod)[np.asarray(sched.timestep_map)],
            rtol=1e-5,
        )


class TestQSample:
    def test_t0_near_clean(self):
        sched = make_schedule("cosine", 1000)
        x0 = jnp.ones((2, 5, 3))
        noise = jnp.full((2, 5, 3), 10.0)
        xt = q_sample(sched, x0, jnp.array([0, 0]), noise)
        # at t=0 alphas_cumprod ~ 1 -> mostly clean
        assert np.abs(np.asarray(xt) - 1.0).max() < 0.7

    def test_variance_preserving(self):
        sched = make_schedule("cosine", 100)
        t = jnp.array([50])
        a = np.asarray(sched.sqrt_alphas_cumprod)[50]
        b = np.asarray(sched.sqrt_one_minus_alphas_cumprod)[50]
        np.testing.assert_allclose(a * a + b * b, 1.0, rtol=1e-6)

    def test_posterior_mean_interpolates(self):
        sched = make_schedule("cosine", 100)
        x0 = jnp.zeros((1, 4))
        xt = jnp.ones((1, 4))
        m = np.asarray(q_posterior_mean(sched, x0, xt, jnp.array([10])))
        c1 = np.asarray(sched.posterior_mean_coef1)[10]
        c2 = np.asarray(sched.posterior_mean_coef2)[10]
        np.testing.assert_allclose(m, c2, rtol=1e-6)
        np.testing.assert_allclose(c1 + c2, 1.0, rtol=1e-4)  # convex-ish weights


class TestSampler:
    def test_perfect_model_converges_exactly(self):
        # a model that always predicts x0=target: final sample == target,
        # because posterior_mean_coef1[0] == 1, coef2[0] == 0
        sched = make_schedule("cosine", 50)
        target = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, 4)), jnp.float32)
        out = p_sample_loop(
            lambda x, t: target, sched, target.shape, jax.random.PRNGKey(0)
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-5)

    def test_matches_python_loop(self):
        # scan wiring == hand-rolled python loop with identical keys
        sched = make_schedule("cosine", 10)
        shape = (1, 3, 2)
        key = jax.random.PRNGKey(42)

        w = jnp.asarray([[0.5, -0.2], [0.1, 0.3], [0.0, 1.0]], jnp.float32)

        def model_fn(x, t):
            return x * 0.9 + w * (t.astype(jnp.float32) / 10.0)

        got = p_sample_loop(model_fn, sched, shape, key)

        x = jax.random.normal(jax.random.fold_in(key, 10), shape)
        c1 = np.asarray(sched.posterior_mean_coef1)
        c2 = np.asarray(sched.posterior_mean_coef2)
        lv = np.asarray(sched.posterior_log_variance_clipped)
        for t in range(9, -1, -1):
            pred = model_fn(x, jnp.asarray(t))
            mean = c1[t] * pred + c2[t] * x
            noise = jax.random.normal(jax.random.fold_in(key, t), shape)
            x = mean + (t != 0) * np.exp(0.5 * lv[t]) * noise
        np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-5)

    def test_early_stop_returns_pred_x0(self):
        sched = make_schedule("cosine", 20)
        target = jnp.full((1, 2, 2), 3.0)
        out = p_sample_loop(
            lambda x, t: target, sched, (1, 2, 2), jax.random.PRNGKey(1), early_stop_steps=5
        )
        # pred_x0 of the perfect model is exactly the target even mid-chain
        np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-6)

    def test_fixed_noise_deterministic(self):
        sched = make_schedule("cosine", 10)
        noise = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4, 3)), jnp.float32)
        f = lambda: p_sample_loop(
            lambda x, t: x * 0.5, sched, (1, 4, 3), jax.random.PRNGKey(7), noise=noise
        )
        np.testing.assert_array_equal(np.asarray(f()), np.asarray(f()))

    def test_unroll_is_bitwise_identical(self):
        # unroll only changes XLA scheduling (overlap of noise gen with the
        # model body), never the math: plain and guided chains must match
        # unroll=1 exactly at every factor, including non-divisor ones
        sched = make_schedule("cosine", 20)
        shape = (2, 5, 8)
        model = lambda x, t: 0.5 * x
        key = jax.random.PRNGKey(3)
        spec = GuidanceSpec(
            loss_fn=lambda x: jnp.sum(x**2), weight=0.1, t_threshold=7
        )
        # (unroll, guidance) pairs kept small — each is a fresh XLA program:
        # 3 is the non-divisor edge (20 % 3 != 0), guided covers the
        # split-scan path
        ref_plain = p_sample_loop(model, sched, shape, key)
        ref_guided = p_sample_loop(model, sched, shape, key, guidance=(spec,))
        for guidance, ref, unroll in (
            ((), ref_plain, 3),
            ((spec,), ref_guided, 2),
        ):
            got = p_sample_loop(
                model, sched, shape, key, guidance=guidance, unroll=unroll
            )
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_guidance_shifts_mean(self):
        # guidance only reaches the output through the model reading x_t
        # (posterior variance is 0 at t=0), so the model must be x-dependent
        sched = make_schedule("cosine", 10)
        model = lambda x, t: 0.8 * x

        spec = GuidanceSpec(
            loss_fn=lambda x: jnp.sum((x - 5.0) ** 2), weight=50.0, t_threshold=9
        )
        base = p_sample_loop(model, sched, (1, 2, 2), jax.random.PRNGKey(0))
        guided = p_sample_loop(
            model, sched, (1, 2, 2), jax.random.PRNGKey(0), guidance=(spec,)
        )
        assert np.asarray(guided).mean() > np.asarray(base).mean() + 0.5

    def test_guidance_mask_and_threshold(self):
        sched = make_schedule("cosine", 10)
        model = lambda x, t: 0.8 * x
        mask = jnp.asarray([[1.0, 0.0]])
        spec = GuidanceSpec(
            loss_fn=lambda x: jnp.sum((x - 5.0) ** 2),
            weight=50.0,
            t_threshold=9,
            grad_mask=mask,
        )
        guided = p_sample_loop(
            model, sched, (1, 2), jax.random.PRNGKey(0), guidance=(spec,)
        )
        base = p_sample_loop(model, sched, (1, 2), jax.random.PRNGKey(0))
        d = np.asarray(guided) - np.asarray(base)
        assert d[0, 0] > 0.1  # guided dim moved
        np.testing.assert_allclose(d[0, 1], 0.0, atol=1e-6)  # masked dim untouched

        # threshold -1: guidance never active
        spec_off = GuidanceSpec(spec.loss_fn, 50.0, t_threshold=-1)
        off = p_sample_loop(
            model, sched, (1, 2), jax.random.PRNGKey(0), guidance=(spec_off,)
        )
        np.testing.assert_allclose(np.asarray(off), np.asarray(base), atol=1e-6)


class TestRespacedGuidanceThreshold:
    """Guidance t-thresholds compare the INTERNAL spaced step index, like the
    reference: `t[0] <= thr` runs in the BASE class on the raw loop index
    (gaussian_diffusion_posenet.py:461-477); SpacedDiffusion's _WrappedModel
    (respace.py:183-195) remaps ts for the MODEL call only. Under 'ddimN'
    the reference guides the last thr+1 SPACED steps."""

    def _run(self, thr, respacing="ddim100"):
        import jax

        from rohm_tpu.diffusion import make_schedule
        from rohm_tpu.diffusion.sampler import GuidanceSpec, p_sample_loop

        sched = make_schedule("cosine", 1000, timestep_respacing=respacing)
        spec = GuidanceSpec(
            loss_fn=lambda x: -jnp.sum(x), weight=1.0, t_threshold=thr
        )
        # model must pass state through: with pred_x0 == 0 the t=0 posterior
        # collapses to exactly 0 and guidance from earlier steps is invisible
        model_fn = lambda x, t: 0.5 * x  # noqa: E731
        return np.asarray(
            p_sample_loop(
                model_fn, sched, (1, 2, 4), jax.random.PRNGKey(3), guidance=(spec,)
            )
        )

    def test_threshold_counts_spaced_steps(self):
        # internal semantics: thresholds 50 and 59 guide DIFFERENT numbers of
        # spaced steps (51 vs 60 of the 100 retained) and must differ; under
        # the (wrong) original-timestep mapping both land in internal bucket 5
        # and would be identical
        assert np.abs(self._run(50) - self._run(59)).max() > 1e-8

    def test_no_respacing_unchanged(self):
        # with empty respacing internal == original; both semantics agree
        a = self._run(50, respacing="")
        b = self._run(50, respacing="")
        np.testing.assert_array_equal(a, b)


class TestStepNoiseReplay:
    """step_noise/noise presets must reproduce the key-driven chain exactly:
    step_noise[t] is defined to equal the draw fold_in(key, t) would make, and
    `noise` the fold_in(key, num_timesteps) init draw. This alignment is what
    lets the torch-twin parity harness feed one noise realization to both the
    JAX scan and the reference's python loop. Equality is allclose at f32-ulp
    tolerance, not bitwise: the preset-noise program gathers from a constant
    where the key path generates inline, so XLA fuses the two chains
    differently (measured max |delta| ~2e-7 over a 12-step chain)."""

    def _chain(self, guidance=()):
        sched = make_schedule("cosine", 12)
        shape = (2, 5, 7)
        w = jnp.linspace(0.2, 0.8, 7)

        def model_fn(x, t):
            return x * w

        return sched, shape, model_fn

    @pytest.mark.parametrize("early_stop", [0, 3])
    def test_replay_matches_key_path(self, early_stop):
        sched, shape, model_fn = self._chain()
        key = jax.random.PRNGKey(3)
        want = p_sample_loop(model_fn, sched, shape, key, early_stop_steps=early_stop)

        init = jax.random.normal(jax.random.fold_in(key, sched.num_timesteps), shape)
        step = jnp.stack(
            [jax.random.normal(jax.random.fold_in(key, t), shape)
             for t in range(sched.num_timesteps)]
        )
        other_key = jax.random.PRNGKey(999)  # must be ignored entirely
        got = p_sample_loop(
            model_fn, sched, shape, other_key, noise=init, step_noise=step,
            early_stop_steps=early_stop,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    def test_replay_with_guidance(self):
        sched, shape, model_fn = self._chain()
        spec = GuidanceSpec(loss_fn=lambda x: (x**2).sum(), weight=2.0, t_threshold=5)
        key = jax.random.PRNGKey(7)
        want = p_sample_loop(model_fn, sched, shape, key, guidance=(spec,))
        init = jax.random.normal(jax.random.fold_in(key, sched.num_timesteps), shape)
        step = jnp.stack(
            [jax.random.normal(jax.random.fold_in(key, t), shape)
             for t in range(sched.num_timesteps)]
        )
        got = p_sample_loop(
            model_fn, sched, shape, jax.random.PRNGKey(0), guidance=(spec,),
            noise=init, step_noise=step,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)
