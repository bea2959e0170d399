"""Cross-framework e2e parity with a FULLY TRAINED stack (shipped config).

Round 4 trained only the PoseNet and measured that its contact outputs
saturate (guidance stops sitting on knife edges). Its own cascade analysis,
however, identified the TRAJ chain as the remaining sensitivity lever:
traj_step eps 1e-5 → final pose 1.3e-1 through guidance amplification of
bridge-scale cond differences. This module closes that half-measured claim:
it trains ALL THREE networks with the real reference training pipeline —

  1. TrajNet vanilla at the stage-3 recipe (shipped loss weights of
     cfg_files/train_cfg/trajnet_train_vanilla_stage3.yaml, INCLUDING the
     random infill curriculum of train/training_loop_trajnet.py:69-82 that
     stage 3 enables via start_infill_epoch=0),
  2. TrajControl: graft the trained vanilla weights exactly as the
     reference bootstrap (train_trajnet.py:157-175 — load_state_dict
     strict=False, copy diff_* → controlnet.control_*, zero-init zero
     convs, freeze + .eval() every non-controlnet module), then fine-tune
     only the ControlNet branch at the trajnet_ft_trajcontrol.yaml weights
     with control_cond = clean local pose (dataloader_amass.py:339),
  3. PoseNet at the shipped posenet_train_stage*.yaml weights (as round 4),

converts everything with the standard checkpoint converter, and reruns the
SHIPPED flagship config (infill+full, the paper's Table-1 configuration) in
both frameworks with identical injected noise at n=8 eval clips (round 4's
n=2 made the contact/accel metrics untestable below ~1e-2: one label flip
of 120 was 8.3e-3; at n=8 the discreteness floor is 4x smaller).

Measured findings this test pins (2026-08-20, CPU, tiny widths, n=8):

- Contact outputs saturate: |c-0.5| mean 0.470, MIN 0.220 (4000 steps; at
  the round-4 1500 steps the n=8 minimum was 0.098 — close enough to the
  threshold for chain flips, which is why the deeper run matters).
- Cascade UPDATE (the round-4 open question): with the all-trained stack
  the traj_step 1e-5 lever gives traj 1.5e-7 -> bridge 2.9e-6 -> iter-0
  pose 2.3e-2 -> final 5.7e-2. A trained TrajNet+TrajControl CONTRACTS the
  traj chain (~100x: iter-0 response 1.7e-5 -> 1.5e-7) and the bridge
  (~50x: 1.4e-4 -> 2.9e-6), but the guided pose chain's cond gain GROWS
  (~400x -> ~8000x bridge->pose: saturated contacts make the heavily
  weighted skating guidance fire consistently, and its pull toward the
  sharper trained manifold amplifies cond differences more, not less).
  Net: the final-pose response roughly halves (1.3e-1 -> 5.7e-2); the
  traj-chain lever remains the entry point but the AMPLIFIER is the
  guidance loop itself.
- The init-lever response is 4.3e-2 — below random-weight knife-edge chaos
  (0.056) but far above the trained-PoseNet-only harness's 2.1e-5: the
  full loop keeps a smooth cond-amplification path (iter-0 pose ->
  TrajControl -> bridge -> guided iter-1 pose) that round 4's half-trained
  configuration did not exercise.
- Cross-framework deltas RIDE the lever (pose0 3.0e-2 vs lever 2.3e-2 =
  1.3x; final 5.1e-2 vs 5.7e-2 = 0.9x) — amplified legitimate bridge-scale
  differences, not implementation divergence.
- Eval metrics at n=8: mpjpe_from_smpl 2.3e-3, mpjpe_from_abs 1.7e-3,
  accel 1.6e-3, contact_acc 8.9e-3 (= 4 flips of 480 labels), skating 0.0
  relative — the VERDICT-requested few-1e-3 scale with ALL THREE nets
  trained.
"""

from __future__ import annotations

import time
import types

import numpy as np
import pytest

pytest.importorskip("torch")
pytest.importorskip("einops")

import torch  # noqa: E402

import tests.test_e2e_parity as h  # noqa: E402

pytestmark = pytest.mark.slow

N_CLIPS = 8  # n>=8 eval clips: contact-label discreteness floor = 1/(8*15*4)

# shipped stage-3 TrajNet weights (cfg_files/train_cfg/trajnet_train_vanilla_stage3.yaml)
TRAJ_WEIGHTS = {
    "weight_loss_root_rec_repr": 1.0,
    "weight_loss_root_pos_global": 100.0,
    "weight_loss_root_vel_global": 1000.0,
    "weight_loss_root_rot_vel_from_abs_traj": 1.0,
    "weight_loss_root_smplx_transl_vel": 1000.0,
    "weight_loss_root_smplx_rot_vel": 1.0,
    "weight_loss_root_smooth": 10.0,
    "weight_loss_root_rot_cos_smooth_from_abs_traj": 1.0,
}
# TrajControl fine-tune deltas (trajnet_ft_trajcontrol.yaml)
CTRL_WEIGHTS = {**TRAJ_WEIGHTS,
                "weight_loss_root_smooth": 1.0,
                "weight_loss_root_rot_cos_smooth_from_abs_traj": 0.0}
# shipped PoseNet curriculum weights (cfg_files/train_cfg/posenet*.yaml)
POSE_WEIGHTS = {
    "weight_loss_rec_repr_full_body": 1.0,
    "weight_loss_repr_foot_contact_mse": 1.0,
    "weight_loss_joint_pos_global": 100.0,
    "weight_loss_joint_vel_global": 1000.0,
    "weight_loss_joint_smooth": 10.0,
    "weight_loss_foot_skating": 0.1,
}
TRAIN_STEPS_TRAJ = 600
TRAIN_STEPS_CTRL = 300
# 1500 steps (the round-4 value, tuned at n=2) leaves the n=8 model's worst
# contact at margin 0.098 from the 0.5 threshold — close enough for chain
# flips; 4000 steps saturates the minimum too (n=8 has 4x the labels to fit;
# 1500 steps cost 75 s, so the deeper run stays cheap)
TRAIN_STEPS_POSE = 4000
# stage-3 infill curriculum, scaled: the reference masks up to 10% of a
# 145-frame clip with prob 0.4 (training_loop_trajnet.py:69-82); at T=16 a
# 10% window is <2 frames, so scale the ratio so training sees windows the
# size of the eval harness's fixed infill window (TRAJ_MASK_LEN=3 of 16)
MASK_PROB, MAX_INFILL_RATIO = 0.4, 0.25


class _TPF:
    def mktemp(self, name):
        import pathlib
        import tempfile

        return pathlib.Path(tempfile.mkdtemp(prefix=f"trained_{name}_"))


def _data_n(body, n_clips):
    """h.data's build at a configurable clip count (one build feeds both
    frameworks AND all three training loops)."""
    from rohm_tpu.data import AmassClipDataset, synthetic_amass_arrays

    clips = synthetic_amass_arrays(body, n_clips=n_clips, clip_len=h.CLIP_LEN, seed=0)
    logdir = str(_TPF().mktemp("stats"))
    kw = dict(
        body_model=body, clip_len=h.CLIP_LEN, input_noise=True,
        noise_std_smplx_global_rot=3.0, noise_std_smplx_body_rot=3.0,
        noise_std_smplx_trans=0.03, noise_std_smplx_betas=0.1, clips=clips,
    )
    ds_traj = AmassClipDataset(split="train", task="traj", repr_abs_only=True,
                               logdir=logdir, **kw)
    ds_pose = AmassClipDataset(split="train", task="pose", repr_abs_only=False,
                               logdir=logdir, **kw)
    bt = next(ds_traj.batches(n_clips, shuffle=False))
    pose_items = [ds_pose[i] for i in range(n_clips)]
    return types.SimpleNamespace(
        traj_cond=np.asarray(bt["cond"], np.float32),
        traj_clean=np.asarray(bt["motion_repr_clean"], np.float32),
        traj_noisy=np.asarray(bt["motion_repr_noisy"], np.float32),
        pose_clean=np.stack([it["motion_repr_clean"] for it in pose_items]).astype(np.float32),
        pose_noisy=np.stack([it["motion_repr_noisy"] for it in pose_items]).astype(np.float32),
        mean=np.asarray(ds_pose.mean, np.float32),
        std=np.asarray(ds_pose.std, np.float32),
    )


def _noise_n(n_clips):
    """h.noise's recorded-draw layout at n_clips."""
    rng = np.random.default_rng(1234)
    return {
        "traj_init": rng.standard_normal((2, n_clips, h.T_TRAJ, 13), np.float32),
        "traj_step": rng.standard_normal((2, h.STEPS_TRAJ, n_clips, h.T_TRAJ, 13), np.float32),
        "pose_init": rng.standard_normal((2, n_clips, h.T_POSE, 294), np.float32),
        "pose_step": rng.standard_normal((2, h.STEPS_POSE, n_clips, h.T_POSE, 294), np.float32),
    }


@pytest.fixture(scope="module")
def env():
    """Fresh harness instances for this module (training mutates the torch
    models and the clean reprs in place)."""
    body = h.body.__wrapped__()
    twin = h.twin.__wrapped__(body)
    gen = h.ref.__wrapped__(twin)
    ref = next(gen)
    data = _data_n(body, N_CLIPS)
    noise = _noise_n(N_CLIPS)
    models = h.torch_models.__wrapped__(ref, data)
    return types.SimpleNamespace(
        body=body, twin=twin, ref=ref, data=data, noise=noise, models=models,
    )


def _mk_diffusion(ref, gd, klass, steps):
    args_ns = types.SimpleNamespace(noise_schedule="cosine", sigma_small=True)
    return ref.model_util.create_gaussian_diffusion(
        args_ns, gd=gd, return_class=klass,
        num_diffusion_timesteps=steps, timestep_respacing="", device="cpu",
    )


class _DS:
    """The dataset-attribute surface the reference losses read."""

    def __init__(self, mean, std):
        self.Mean, self.Std = mean, std
        self.traj_feat_dim, self.pose_feat_dim, self.joints_num = 22, 272, 22


def _train_trajnet(model, diff, twin, data, steps, *, infill, seed, label):
    """training_loop_trajnet.py:60-139 at tiny scale: per-step random infill
    masking (stage 3), UniformSampler-equivalent t, AdamW."""
    clean = torch.from_numpy(data.traj_clean.copy())
    cond_base = torch.from_numpy(data.traj_cond.copy())
    control_cond = torch.from_numpy(
        data.traj_clean[:, :, -272:].copy()) if model.trajcontrol else None
    bs, clip_len = cond_base.shape[0], cond_base.shape[1]

    params = [p for p in model.parameters() if p.requires_grad]
    opt = torch.optim.AdamW(params, lr=1e-3)
    torch.manual_seed(seed)
    model.train() if not model.trajcontrol else None  # ctrl: frozen parts stay eval
    t0 = time.monotonic()
    for _ in range(steps):
        batch = {"motion_repr_clean": clean, "cond": cond_base.clone()}
        if control_cond is not None:
            batch["control_cond"] = control_cond
        if infill and float(torch.rand(())) > 1 - MASK_PROB:
            start = (torch.rand(bs) * (clip_len - 1)).long()
            mask_len = (clip_len * torch.rand(bs) * MAX_INFILL_RATIO).long()
            end = torch.clamp(start + mask_len, max=clip_len)
            mask = torch.ones(bs, clip_len)
            for i in range(bs):
                mask[i, start[i]:end[i]] = 0
            batch["cond"][:, :, 0:13] = batch["cond"][:, :, 0:13] * mask[..., None]
        t = torch.randint(0, h.STEPS_TRAJ, (bs,))
        losses = diff.training_losses(model=model, batch=batch, t=t,
                                      traj_feat_dim=13, smplx_model=twin)
        opt.zero_grad(set_to_none=True)
        losses["loss"].backward()
        opt.step()
    model.eval()
    final = float(losses["loss"].detach())
    print(f"[trained-parity] {label}: {steps} reference train steps in "
          f"{time.monotonic() - t0:.0f} s (final loss {final:.4f})")
    return final


def _graft_trajcontrol(ctrl, trained_vanilla_sd):
    """The reference TrajControl bootstrap, statement-for-statement
    (train_trajnet.py:157-175)."""
    ctrl.load_state_dict(trained_vanilla_sd, strict=False)
    copy = {}
    for key in trained_vanilla_sd:
        if key.split(".")[0].split("_")[0] == "diff":
            copy["controlnet.control" + key[4:]] = trained_vanilla_sd[key]
    ctrl.load_state_dict(copy, strict=False)
    # a freshly constructed TrajControl has zero-init zero convs
    # (model/heads.py:12-18 zero_module); the random-weight fixture
    # randomized them, so restore the true bootstrap state
    with torch.no_grad():
        for name, p in ctrl.controlnet.named_parameters():
            if "zero_conv" in name:
                p.zero_()
    for name, param in ctrl.named_parameters():
        param.requires_grad = name.split(".")[0].split("_")[0] == "controlnet"
    for name, layer in ctrl.named_modules():
        if name.split(".")[0].split("_")[0] in ["cond", "diff", "time"]:
            layer.eval()


@pytest.fixture(scope="module")
def trained(env):
    ref, models, twin, data = env.ref, env.models, env.twin, env.data
    ds = _DS(data.mean, data.std)

    # plant GT foot contact in BOTH task views (synthetic foot_detect labels
    # are all-zero -> the skating losses would 0/0 and contacts would only
    # saturate at 0); the traj view's contacts feed control_cond
    data.pose_clean[:, 3:9, -4:] = 1.0
    data.traj_clean[:, 3:9, -4:] = 1.0

    # ---- 1. TrajNet vanilla, stage-3 recipe (shipped weights + infill)
    for k, v in TRAJ_WEIGHTS.items():
        setattr(models.trajnet, k, v)
    models.trajnet.dataset = ds
    diff_traj = _mk_diffusion(ref, ref.gd_traj, ref.SpacedDiffusionTrajNet, h.STEPS_TRAJ)
    _train_trajnet(models.trajnet, diff_traj, twin, data, TRAIN_STEPS_TRAJ,
                   infill=True, seed=11, label="trajnet-stage3")

    # ---- 2. TrajControl: reference bootstrap graft + ControlNet-only ft
    _graft_trajcontrol(models.trajcontrol, models.trajnet.state_dict())
    for k, v in CTRL_WEIGHTS.items():
        setattr(models.trajcontrol, k, v)
    models.trajcontrol.dataset = ds
    _train_trajnet(models.trajcontrol, diff_traj, twin, data, TRAIN_STEPS_CTRL,
                   infill=False, seed=12, label="trajcontrol-ft")
    # the graft invariant: backbone stayed frozen at the vanilla weights
    sd_v, sd_c = models.trajnet.state_dict(), models.trajcontrol.state_dict()
    for key in sd_v:
        assert torch.equal(sd_v[key], sd_c[key]), f"frozen backbone moved: {key}"

    # ---- 3. PoseNet, shipped curriculum weights (as round 4)
    for k, v in POSE_WEIGHTS.items():
        setattr(models.posenet, k, v)
    models.posenet.start_skating_loss_epoch = 0
    pose_cond = data.pose_noisy.copy()
    pose_cond[:, :, -4:] = 0.0  # contacts zeroed on noisy input
    perm = lambda a: np.ascontiguousarray(a.transpose(0, 2, 1)[:, :, None, :])  # noqa: E731
    diff_pose = _mk_diffusion(ref, ref.gd_pose, ref.SpacedDiffusionPoseNet, h.STEPS_POSE)
    batch_t = {
        "motion_repr_clean": torch.from_numpy(perm(data.pose_clean)),
        "cond": torch.from_numpy(perm(pose_cond)),
    }
    models.posenet.train()
    opt = torch.optim.AdamW(models.posenet.parameters(), lr=1e-3)
    torch.manual_seed(123)
    t0 = time.monotonic()
    for _ in range(TRAIN_STEPS_POSE):
        t = torch.randint(0, h.STEPS_POSE, (batch_t["cond"].shape[0],))
        losses, _ = diff_pose.training_losses(
            model=models.posenet, batch=batch_t, t=t, smplx_model=twin, epoch=1,
        )
        opt.zero_grad(set_to_none=True)
        losses["loss"].backward()
        opt.step()
    models.posenet.eval()
    print(f"[trained-parity] posenet: {TRAIN_STEPS_POSE} reference train steps in "
          f"{time.monotonic() - t0:.0f} s (final loss "
          f"{float(losses['loss'].detach()):.3f})")

    # contact-saturation probe: the model's x0 prediction on a mid-chain
    # x_t — the quantity the guidance thresholds at 0.5
    g = torch.Generator().manual_seed(9)
    with torch.no_grad():
        x0 = batch_t["motion_repr_clean"]
        t = torch.full((x0.shape[0],), 25, dtype=torch.long)
        x_t = diff_pose.q_sample(x0, t, noise=torch.randn(x0.shape, generator=g))
        out = models.posenet({"x_t": x_t, "cond": batch_t["cond"]}, t)
        margin = np.abs(out[:, -4:, 0, :].numpy() - 0.5)
    print(f"[trained-parity] contact saturation |c-0.5|: mean={margin.mean():.3f} "
          f"min={margin.min():.3f}")
    fp = h.flax_params.__wrapped__(models)
    return types.SimpleNamespace(fp=fp, contact_margin=margin)


@pytest.fixture(scope="module")
def trained_runs(env, trained):
    """One reference + one flax-jax run of the shipped config on the trained
    weights (shared by the parity test and the fused-mode gate)."""
    ref_out = h.run_reference(env.ref, env.models, env.twin, env.data,
                              env.noise, **h.SHIPPED_CFG)
    jax_out = h.run_jax(trained.fp, env.body, env.data, env.noise,
                        **h.SHIPPED_CFG)
    return ref_out, jax_out


def test_trained_full_stack_shipped_config_parity(env, trained, trained_runs):
    body, data, noise = env.body, env.data, env.noise
    # (1) the saturation claim, measured (random weights sit near 0.5)
    assert trained.contact_margin.mean() > 0.4, (
        f"trained contact outputs did not saturate: "
        f"mean margin {trained.contact_margin.mean()}"
    )

    ref_out, jax_out = trained_runs

    # (2) deterministic-input stages stay tight with trained weights
    d0t = h._maxdiff(ref_out["traj_iter0"], jax_out["traj_iter0"])
    db = h._maxdiff(ref_out["bridge_iter0"], jax_out["bridge_iter0"])
    assert d0t < 1e-4, f"trained iter-0 traj chain diverged: {d0t}"
    assert db < 2e-3, f"trained re-encode bridge diverged: {db}"

    # (3) init-lever self-sensitivity, MEASURED (diagnostic + contraction
    # gate). Round 4's trained-PoseNet-only harness measured 2.1e-5 here and
    # concluded "not state-chaotic"; with the FULL trained stack the lever
    # reads ~4.3e-2 (n=8, 2026-08-20) — not threshold chaos (contacts
    # saturate to min margin 0.22, far from 0.5) but the SMOOTH
    # cond-amplification loop the round-4 cascade analysis identified
    # (iter-0 pose -> TrajControl cond -> bridge -> guided iter-1 pose, with
    # consistently-firing guidance), now applied to the init perturbation's
    # propagated effect. The parity claim therefore rests on (4)-(6): the
    # cross-framework delta must ride the same amplification (lever
    # dominance) and the metrics must agree. Gate here: the response stays
    # below the random-weight knife-edge chaos level (0.056 mean), i.e.
    # trained weights must not ADD chaos on top of the smooth gain.
    pert_init = h._perturbed_jax(trained.fp, body, data, noise,
                                 h.SHIPPED_CFG, lever="init")
    d_init = np.abs(jax_out["pose_final"] - pert_init["pose_final"])
    assert d_init.mean() < 0.056, (
        f"trained chain MORE state-sensitive than random-weight chaos: "
        f"init-lever {d_init.mean()}"
    )

    # (4) cascade-analysis UPDATE (the round-4 open question): measure the
    # traj_step lever through the ALL-TRAINED stack and print the
    # amplification chain traj -> bridge -> iter-0 pose -> final
    rng = np.random.default_rng(7)
    pn = dict(noise)
    pn["traj_step"] = noise["traj_step"] + np.float32(1e-5) * (
        rng.standard_normal(noise["traj_step"].shape).astype(np.float32))
    pert_traj = h.run_jax(trained.fp, body, data, pn,
                          intermediates=True, **h.SHIPPED_CFG)
    lever_traj = np.abs(jax_out["traj_iter0"] - pert_traj["traj_iter0"]).mean()
    lever_bridge = np.abs(jax_out["bridge_iter0"] - pert_traj["bridge_iter0"]).mean()
    s0p = np.abs(jax_out["pose_iter0"] - pert_traj["pose_iter0"])
    spf = np.abs(jax_out["pose_final"] - pert_traj["pose_final"])
    gain = s0p.mean() / max(lever_bridge, 1e-12)
    print(f"[trained-parity] CASCADE (all-trained): traj_step 1e-5 -> "
          f"traj {lever_traj:.2e} -> bridge {lever_bridge:.2e} -> "
          f"pose0 {s0p.mean():.2e} (gain {gain:.0f}x) -> final {spf.mean():.2e}")

    # (5) cross-framework deltas sit at/below the chain's own lever response
    d0p = np.abs(ref_out["pose_iter0"] - jax_out["pose_iter0"])
    dpf = np.abs(ref_out["pose_iter1"] - jax_out["pose_final"])
    print(f"[trained-parity] iter0 traj={d0t:.2e} bridge={db:.2e} "
          f"pose0 mean={d0p.mean():.2e} (lever {s0p.mean():.2e}) | "
          f"final mean={dpf.mean():.2e} (lever {spf.mean():.2e}) | "
          f"init-lever {d_init.mean():.2e}")
    assert d0p.mean() < 2.0 * max(s0p.mean(), 1e-6), (
        f"trained iter-0 pose delta {d0p.mean()} exceeds the chain's own "
        f"traj_step-lever sensitivity {s0p.mean()}"
    )
    assert dpf.mean() < 2.0 * max(spf.mean(), 1e-6), (
        f"trained final pose delta {dpf.mean()} exceeds the chain's own "
        f"traj_step-lever sensitivity {spf.mean()}"
    )

    # (6) metrics at n=8: the VERDICT gate — all five rel deltas at the
    # few-1e-3 scale (measured: mpjpe 2.7e-5/5.5e-5, accel 2.3e-3,
    # contact 0, skating 0); gated at 1e-2 = the production parity budget
    m_ref, m_jax = h._pipeline_metrics(ref_out), h._pipeline_metrics(jax_out)
    for k in m_ref:
        a, b = float(m_ref[k]), float(m_jax[k])
        rel = abs(a - b) / max(abs(a), 1e-9)
        print(f"[trained-parity] metric {k}: ref={a:.6f} jax={b:.6f} rel={rel:.2e}")
        assert rel < 1e-2 or abs(a - b) < 1e-6, (
            f"trained-model metric {k} parity broken: ref {a} vs jax {b}"
        )


def test_fused_modes_metric_budget_trained(env, trained, trained_runs):
    """VERDICT round-4 #3: metric-gate the fused Pallas PoseNet modes against
    trained (saturated) weights — the regime the throughput mode ships in,
    where the skating guidance fires on every guided step (contact margins
    asserted >0.4 by the main test; reference thresholds model/posenet.py:224,
    gaussian_diffusion_posenet.py:461-477). The random-weight budget test
    (tests/test_cli_e2e.py) needed sample_iter=1 to dodge knife-edge chaos;
    here the full shipped 2-iteration config runs at PRODUCTION chain lengths
    (2x(100+1000) steps) through the same pipeline with only fused_posenet
    varying, so any metric delta is attributable to kernel numerics in the
    trained regime.

    A CLI-scale attempt at this gate (training a fresh tiny PoseNet through
    train_posenet on grounded synthetic data) could NOT reach the saturated
    regime: structured contact labels are 4 of 294 dims at loss weight 1 and
    the model hedged at the base rate (max contact 0.49 after 8000 steps) —
    this harness's planted-contact training is what produces the
    production-like saturation, so the gate lives here.

    Measured (2026-08-20, CPU interpret mode, production chain lengths):
    bf16 rels — mpjpe_smpl 2.5e-3, mpjpe_abs 1.2e-2, accel 2.1e-2, contact
    6.7e-3, skating 0; int8 rels — mpjpe_smpl 4.1e-3, mpjpe_abs 1.3e-2,
    accel 1.8e-2, contact 0, skating 0. Both modes' deltas sit AT the
    chain's own eps-amplification scatter (traj_step lever: final 5.7e-2
    repr units; flax-vs-torch contact delta itself is 8.9e-3), i.e. kernel
    rounding enters like eps-scale noise and is amplified by the same
    guidance loop — not int8-specific numeric error."""
    _, jax_flax = trained_runs
    m_flax = h._pipeline_metrics(jax_flax)
    for mode in ("bf16", "int8"):
        out = h.run_jax(trained.fp, env.body, env.data, env.noise,
                        intermediates=False, fused_posenet=mode,
                        **h.SHIPPED_CFG)
        m = h._pipeline_metrics(out)
        for k in m_flax:
            a, b = float(m_flax[k]), float(m[k])
            rel = abs(a - b) / max(abs(a), 1e-9)
            print(f"[fused-trained] {mode} {k}: flax={a:.6f} fused={b:.6f} "
                  f"rel={rel:.2e}")
            budget = 2e-2 if k.startswith("mpjpe") else 8e-2
            assert rel < budget or abs(a - b) < 1e-6, (
                f"{mode}: trained-regime metric {k} off budget: "
                f"flax {a} vs fused {b}"
            )


def test_trained_egobody_chain_parity(env, trained):
    """EgoBody trained/guided depth to the AMASS level (beyond the round-4
    ask, which covered the video loop at random weights): the COMPLETE
    egobody_rgb driver loop — visibility masks at iteration 0 only,
    prediction-fed traj AND pose conds at iteration 1, TrajControl, 2-D
    reprojection + skating guidance, early_stop — with ALL THREE nets
    TRAINED, at n=8 clips. With saturated contacts the prox-type skating
    term fires consistently, so this is the production regime of the video
    path. Measured (2026-08-20, CPU): final traj 2.3e-5, final pose max
    6.2e-3 / mean 2.2e-5 — the trained video chain is far tighter than the
    random-weight one (mean 1.9e-4): saturated contacts keep the skating
    term's threshold far from its knife edge."""
    data, body = env.data, env.body
    t_pose = data.traj_cond.shape[1] - 1
    cam = h.make_prox_cam(body, data, N_CLIPS, t_pose)
    vis = h.make_vis_mask(N_CLIPS, t_pose)
    noise = h.make_video_noise(N_CLIPS)

    ref_out = h.run_reference_egobody(
        env.ref, env.models, env.twin, data, noise, cam, vis)
    jax_out = h.run_jax_egobody(trained.fp, body, data, noise, cam, vis)

    dt = h._maxdiff(ref_out["traj_iter1"], jax_out["traj_final"])
    dp = np.abs(ref_out["pose_iter1"] - jax_out["pose_final"])
    print(f"[trained-egobody] final traj={dt:.2e} final pose "
          f"max={dp.max():.2e} mean={dp.mean():.2e}")
    assert np.isfinite(jax_out["pose_final"]).all()
    assert dt < 5e-3, f"trained egobody final traj diverged: {dt}"
    assert dp.max() < 5e-2, f"trained egobody final pose diverged: {dp.max()}"
