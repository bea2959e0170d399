"""Production-WIDTH cross-framework pipeline parity (opt-in, slow).

Round 3's verdict: "the production-scale cross-framework gap is bridged by
argument, not measurement" — the torch-twin e2e harness ran at width 64 /
2 layers / T=17. This test runs the SAME harness at the real model scale:

    PoseNet 512d x 8 layers x 4 heads / ff 1024, TrajNet mid_dim 512,
    T = 145-frame clips (144 traj / 143 pose frames), bs=2,
    full 2 iterations x (100 + 1000) diffusion steps, amass guidance.

Reference anchor: /root/reference/test_amass_full.py:200-466 at the shipped
model hyperparameters (test_amass_full.py:132-158). The torch side runs the
real reference code on CPU (~10-30 min); select with

    pytest tests/test_e2e_parity_production.py -m production_shapes

Gates: iter-0 TrajNet chain + re-encode bridge tight; eval metrics at the
1% production parity budget (BASELINE.json). The lower-mask config is used
because its guided chains are parity-stable (measured round 3/4: the
full/upper configs sit on discrete guidance-threshold knife edges with
random weights — see tests/test_e2e_parity.py for that analysis).
"""

from __future__ import annotations

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
)


class _TPF:
    def mktemp(self, name):
        import pathlib
        import tempfile

        return pathlib.Path(tempfile.mkdtemp(prefix=f"prod_{name}_"))


def test_production_width_pipeline_parity():
    saved = {k: getattr(h, k) for k in PROD}
    for k, v in PROD.items():
        setattr(h, k, v)
    try:
        import time

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

        t0 = time.monotonic()
        ref_out = h.run_reference(ref, models, twin, data, noise)
        t_ref = time.monotonic() - t0
        t0 = time.monotonic()
        jax_out = h.run_jax(fp, body, data, noise)
        t_jax = time.monotonic() - t0
        print(f"[prod-parity] torch reference {t_ref:.0f} s, jax {t_jax:.0f} s")

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
    finally:
        for k, v in saved.items():
            setattr(h, k, v)
