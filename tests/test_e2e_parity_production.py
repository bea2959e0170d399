"""Production-WIDTH cross-framework pipeline parity (opt-in, slow).

Round 3's verdict: "the production-scale cross-framework gap is bridged by
argument, not measurement" — the torch-twin e2e harness ran at width 64 /
2 layers / T=17. These tests run the SAME harness at the real model scale:

    PoseNet 512d x 8 layers x 4 heads / ff 1024, TrajNet mid_dim 512,
    T = 145-frame clips (144 traj / 143 pose frames), bs=2,
    full 2 iterations x (100 + 1000) diffusion steps, amass guidance.

Reference anchor: /root/reference/test_amass_full.py:200-466 at the shipped
model hyperparameters (test_amass_full.py:132-158). The torch side runs the
real reference code on CPU (~10-30 min per config); select with

    pytest tests/test_e2e_parity_production.py -m production_shapes

Two configs:
- lower-mask (parity-stable guided chains): tight iter-0/bridge gates + eval
  metrics at the 1% production budget (measured r4: metric rel deltas
  <= 1.2e-7 — recorded in BASELINE.md).
- SHIPPED flagship config (infill_traj + mask_scheme='full', the paper's
  Table-1 setup, at the REAL frame-65 infill window): the guided chains sit
  on discrete guidance-threshold knife edges with random weights (see
  tests/test_e2e_parity.py), so the decisive gate is the self-sensitivity
  inequality + chaos-budget metrics, same structure as the small-width test.
"""

from __future__ import annotations

import time
import types

import numpy as np
import pytest

pytest.importorskip("torch")
pytest.importorskip("einops")

import tests.test_e2e_parity as h  # noqa: E402  (the harness, module-scoped)

pytestmark = pytest.mark.production_shapes

PROD = dict(
    B=2, CLIP_LEN=145, T_TRAJ=144, T_POSE=143,
    STEPS_TRAJ=100, STEPS_POSE=1000,
    MID=512, LATENT=512, FF=1024, LAYERS=8, HEADS=4,
    # the REAL fixed infill window (reference test_amass_full.py:218-229:
    # frames 65..65+int(0.1*145)); only the shipped config reads these
    TRAJ_MASK_START=65, TRAJ_MASK_LEN=14,
)


class _TPF:
    def mktemp(self, name):
        import pathlib
        import tempfile

        return pathlib.Path(tempfile.mkdtemp(prefix=f"prod_{name}_"))


@pytest.fixture(scope="module", autouse=True)
def _prod_scale():
    saved = {k: getattr(h, k) for k in PROD}
    for k, v in PROD.items():
        setattr(h, k, v)
    yield
    for k, v in saved.items():
        setattr(h, k, v)


@pytest.fixture(scope="module")
def env(_prod_scale):
    t0 = time.monotonic()
    body = h.body.__wrapped__()
    twin = h.twin.__wrapped__(body)
    gen = h.ref.__wrapped__(twin)
    ref = next(gen)
    data = h.data.__wrapped__(body, _TPF())
    noise = h.noise.__wrapped__()
    models = h.torch_models.__wrapped__(ref, data)
    fp = h.flax_params.__wrapped__(models)
    print(f"[prod-parity] fixtures built in {time.monotonic() - t0:.0f} s "
          f"(noise arrays ~{noise['pose_step'].nbytes / 2**20:.0f} MB)")
    return types.SimpleNamespace(
        body=body, twin=twin, ref=ref, data=data, noise=noise,
        models=models, fp=fp,
    )


def _run_both(env, cfg, label):
    t0 = time.monotonic()
    ref_out = h.run_reference(env.ref, env.models, env.twin, env.data, env.noise, **cfg)
    t_ref = time.monotonic() - t0
    t0 = time.monotonic()
    jax_out = h.run_jax(env.fp, env.body, env.data, env.noise, **cfg)
    print(f"[prod-parity:{label}] torch reference {t_ref:.0f} s, "
          f"jax {time.monotonic() - t0:.0f} s")
    return ref_out, jax_out


def test_production_width_pipeline_parity(env):
    ref_out, jax_out = _run_both(env, {}, "lower")

    d0 = h._maxdiff(ref_out["traj_iter0"], jax_out["traj_iter0"])
    db = h._maxdiff(ref_out["bridge_iter0"], jax_out["bridge_iter0"])
    d0p = np.abs(ref_out["pose_iter0"] - jax_out["pose_iter0"])
    dt = h._maxdiff(ref_out["traj_iter1"], jax_out["traj_final"])
    dp = np.abs(ref_out["pose_iter1"] - jax_out["pose_final"])
    print(
        f"[prod-parity] iter0 traj={d0:.2e} bridge={db:.2e} "
        f"pose max={d0p.max():.2e} mean={d0p.mean():.2e} | final "
        f"traj={dt:.2e} pose max={dp.max():.2e} mean={dp.mean():.2e}"
    )
    assert d0 < 5e-4, f"production-width TrajNet iter-0 chain diverged: {d0}"
    assert db < 5e-3, f"production-width bridge diverged: {db}"
    for k in ("pose_final", "traj_final"):
        assert np.isfinite(jax_out[k]).all(), k

    m_ref = h._pipeline_metrics(ref_out)
    m_jax = h._pipeline_metrics(jax_out)
    for k in m_ref:
        a, b = float(m_ref[k]), float(m_jax[k])
        rel = abs(a - b) / max(abs(a), 1e-9)
        print(f"[prod-parity] metric {k}: ref={a:.6f} jax={b:.6f} rel={rel:.2e}")
        assert rel < 1e-2 or abs(a - b) < 1e-6, (
            f"production-width metric {k} parity broken: "
            f"ref {a} vs jax {b} (rel {rel})"
        )


def test_production_width_shipped_config_parity(env):
    """The paper's Table-1 configuration (amass_occ_0.1_noise_3.yaml:
    infill_traj=True, mask_scheme='full', iter2_cond_noisy_traj=False) at
    production width AND the production frame-65/len-14 infill window —
    the exact setup the reference's published results come from.

    Self-sensitivity lever is "step" (the TRAJ chain's per-step noise at
    the measured 1e-5 cross-framework per-step difference size), not
    "init": at production width an init-state eps perturbation CONTRACTS
    before the guided tail begins (measured 1e-6 -> 4.4e-6) and
    under-reports the chain's sensitivity. The CPU cascade measurement
    (see _perturbed_jax): traj-step eps -> final pose mean 1.59e-2, while
    pose-step eps alone -> 2.98e-6 (the pose chain is contraction-stable;
    the chaos is the infill traj chain cascading through the bridge into
    the TrajControl cond). The measured cross-framework delta (1.61e-2
    mean) sits at 1.0x that sensitivity — within the 2x gate."""
    ref_out, jax_out = _run_both(env, h.SHIPPED_CFG, "shipped")
    t0 = time.monotonic()
    pert = h._perturbed_jax(env.fp, env.body, env.data, env.noise,
                            h.SHIPPED_CFG, lever="step")
    print(f"[prod-parity:shipped] self-sensitivity control run "
          f"{time.monotonic() - t0:.0f} s")
    h._assert_pipeline_parity(ref_out, jax_out, pert,
                              "prod-shipped-full-infill", metric_rtol=0.15)
