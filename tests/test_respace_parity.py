"""Cross-framework chain parity for timestep RESPACING and the DDIM loop.

`--timestep_respacing_eval` is this framework's fast-eval lever (101.8
clips/s at respacing '100', BASELINE.md); until now the respaced chain was
only unit-tested against its own semantics. These tests run the REAL
reference SpacedDiffusion{PoseNet,TrajNet} (diffusion/respace.py:67-195:
rebuilt betas on the retained subset + _WrappedModel t-remapping) through its
actual p_sample loop on CPU with the same converted weights and the same
noise at every draw, against make_schedule(..., timestep_respacing=...) +
p_sample_loop here — unguided AND with the amass skating guidance (whose
t<=50 threshold compares INTERNAL spaced indices on both sides, see
rohm_tpu/diffusion/sampler.py:87-97).

DDIM: the reference's ddim loops (gaussian_diffusion_posenet.py:630-854) are
BROKEN dead code — `ddim_sample` calls `self.p_mean_variance(model, x, t)`
against the signature `p_mean_variance(self, model, batch, x, t, ...)`
(:236-237), so `x` binds to `batch` and the call crashes; nothing in the
repo ever invokes it (eval_losses keeps the branch commented out,
:948-951). To still parity-check the DDIM math (eps re-derivation, sigma,
Equation 12, the t!=0 noise mask, :695-715) we run the reference's
ddim_sample verbatim with a one-line shim that fixes only the broken call
by inserting the missing `batch` argument, and compare at eta=0
(deterministic) and eta=0.5 (same per-step noise).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("einops")

import flax  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rohm_tpu.body import synthetic_model  # noqa: E402
from rohm_tpu.data import AmassClipDataset, synthetic_amass_arrays  # noqa: E402
from rohm_tpu.diffusion import make_schedule  # noqa: E402
from rohm_tpu.diffusion.sampler import ddim_sample_loop, p_sample_loop  # noqa: E402
from rohm_tpu.models import PoseNet, TrajNet  # noqa: E402
from rohm_tpu.models.guidance import amass_guidance  # noqa: E402
from rohm_tpu.utils.convert_torch_ckpt import convert_posenet, convert_trajnet  # noqa: E402

from tests._ref_twin import TorchSmplxTwin  # noqa: E402
from tests.test_e2e_parity import _patched_noise  # noqa: E402

pytestmark = pytest.mark.slow

B = 2
CLIP_LEN = 17
T = CLIP_LEN - 1  # 16
STEPS_POSE = 1000
STEPS_TRAJ = 100
MID = 64
LATENT, FF, LAYERS, HEADS = 64, 128, 2, 2


@pytest.fixture(scope="module")
def body():
    return synthetic_model(num_verts=64)


@pytest.fixture(scope="module")
def twin(body):
    return TorchSmplxTwin(body)


@pytest.fixture(scope="module")
def ref(twin):
    if "smplx" not in sys.modules or not hasattr(sys.modules["smplx"], "_rohm_stub"):
        stub = types.ModuleType("smplx")
        stub._rohm_stub = True
        sys.modules["smplx"] = stub
    stub = sys.modules["smplx"]
    prev_create = getattr(stub, "create", None)
    stub.create = lambda *a, **k: twin
    sys.path.insert(0, "/root/reference")
    try:
        import diffusion.gaussian_diffusion_posenet as gd_pose
        import diffusion.gaussian_diffusion_trajnet as gd_traj
        import model.posenet as ref_posenet
        import model.trajnet as ref_trajnet
        import utils.model_util as model_util
        from diffusion.respace import SpacedDiffusionPoseNet, SpacedDiffusionTrajNet
    finally:
        sys.path.remove("/root/reference")
    yield types.SimpleNamespace(
        gd_pose=gd_pose, gd_traj=gd_traj, posenet=ref_posenet,
        trajnet=ref_trajnet, model_util=model_util,
        SpacedDiffusionPoseNet=SpacedDiffusionPoseNet,
        SpacedDiffusionTrajNet=SpacedDiffusionTrajNet,
    )
    if prev_create is not None:
        stub.create = prev_create


@pytest.fixture(scope="module")
def data(body, tmp_path_factory):
    clips = synthetic_amass_arrays(body, n_clips=B, clip_len=CLIP_LEN, seed=0)
    logdir = str(tmp_path_factory.mktemp("stats"))
    kw = dict(
        body_model=body, clip_len=CLIP_LEN, input_noise=True,
        noise_std_smplx_global_rot=3.0, noise_std_smplx_body_rot=3.0,
        noise_std_smplx_trans=0.03, noise_std_smplx_betas=0.1, clips=clips,
    )
    ds_traj = AmassClipDataset(split="train", task="traj", repr_abs_only=True, logdir=logdir, **kw)
    ds_pose = AmassClipDataset(split="train", task="pose", repr_abs_only=False, logdir=logdir, **kw)
    bt = next(ds_traj.batches(B, shuffle=False))
    items = [ds_pose[i] for i in range(B)]
    pose_noisy = np.stack([it["motion_repr_noisy"] for it in items]).astype(np.float32)
    pose_cond = pose_noisy.copy()
    pose_cond[:, :, -4:] = 0.0  # contact dims zeroed when input is noisy
    return types.SimpleNamespace(
        traj_cond=np.asarray(bt["cond"], np.float32),
        traj_clean=np.asarray(bt["motion_repr_clean"], np.float32),
        pose_clean=np.stack([it["motion_repr_clean"] for it in items]).astype(np.float32),
        pose_cond=pose_cond,
        mean=np.asarray(ds_pose.mean, np.float32),
        std=np.asarray(ds_pose.std, np.float32),
    )


@pytest.fixture(scope="module")
def torch_models(ref, data):
    class _DS:
        Mean, Std = data.mean, data.std
        traj_feat_dim, pose_feat_dim, joints_num = 22, 272, 22

    torch.manual_seed(0)
    posenet = ref.posenet.PoseNet(
        dataset=_DS(), body_feat_dim=294, latent_dim=LATENT, ff_size=FF,
        num_layers=LAYERS, num_heads=HEADS, dropout=0.1, activation="gelu",
        body_model_path="", device="cpu", traj_feat_dim=22,
    ).eval()
    torch.manual_seed(1)
    trajnet = ref.trajnet.TrajNet(
        time_dim=32, mid_dim=MID, cond_dim=13, traj_feat_dim=13,
        trajcontrol=False, device="cpu", dataset=None, repr_abs_only=True,
    ).eval()
    return types.SimpleNamespace(posenet=posenet, trajnet=trajnet)


def _to_flax(flat):
    return flax.traverse_util.unflatten_dict(
        {k: jnp.asarray(v) for k, v in flat.items()}, sep="/"
    )


@pytest.fixture(scope="module")
def flax_params(torch_models):
    sd = lambda m, skip=(): {  # noqa: E731
        k: v.detach().numpy() for k, v in m.state_dict().items()
        if not k.startswith(skip)
    }
    return types.SimpleNamespace(
        trajnet=_to_flax(convert_trajnet(sd(torch_models.trajnet), trajcontrol=False)),
        posenet=_to_flax(convert_posenet(
            sd(torch_models.posenet, skip=("sequence_pos_encoder.", "smplx_model.")),
            num_layers=LAYERS, num_heads=HEADS, latent_dim=LATENT,
        )),
    )


def _perm(a):  # [B, T, 294] -> reference layout [B, 294, 1, T]
    return np.ascontiguousarray(a.transpose(0, 2, 1)[:, :, None, :])


def _make_diff(ref, gd, return_class, steps, respacing):
    args_ns = types.SimpleNamespace(noise_schedule="cosine", sigma_small=True)
    return ref.model_util.create_gaussian_diffusion(
        args_ns, gd=gd, return_class=return_class,
        num_diffusion_timesteps=steps, timestep_respacing=respacing, device="cpu",
    )


# --------------------------------------------------------------------------
# respaced p_sample chains
# --------------------------------------------------------------------------


@pytest.mark.parametrize("respacing,guided", [("50", False), ("50", True), ("100", False)])
def test_posenet_respaced_chain_parity(ref, torch_models, twin, flax_params, data, body, respacing, guided):
    """PoseNet 1000-step schedule respaced to '50'/'100' sections: rebuilt
    betas + _WrappedModel t-remap (respace.py:67-195) vs make_schedule's
    respacing, same weights/cond/noise. guided=True additionally runs the
    amass skating guidance through SMPL-X at every spaced step whose INTERNAL
    index <= 50 (the reference compares the raw loop index,
    gaussian_diffusion_posenet.py:473-477)."""
    diff = _make_diff(ref, ref.gd_pose, ref.SpacedDiffusionPoseNet, STEPS_POSE, respacing)
    n = diff.num_timesteps
    rng = np.random.default_rng(100 + n + int(guided))
    init = rng.standard_normal((B, T, 294)).astype(np.float32)
    step = rng.standard_normal((n, B, T, 294)).astype(np.float32)

    batch = {
        "motion_repr_clean": torch.from_numpy(_perm(data.pose_clean)),
        "cond": torch.from_numpy(_perm(data.pose_cond)),
    }
    shape = list(batch["motion_repr_clean"].shape)
    feed = [_perm(init)] + [_perm(step[t]) for t in range(n - 1, -1, -1)]
    with _patched_noise(feed):
        _, out_ref = diff.eval_losses(
            model=torch_models.posenet, batch=batch, shape=shape, progress=False,
            clip_denoised=False, timestep_respacing="",
            cond_fn_with_grad=guided, grad_type="amass" if guided else None,
            early_stop=False, compute_loss=False, smplx_model=twin,
        )
    ref_out = out_ref[:, :, 0].permute(0, 2, 1).detach().numpy()

    sched = make_schedule("cosine", STEPS_POSE, timestep_respacing=respacing)
    assert sched.num_timesteps == n
    model = PoseNet(latent_dim=LATENT, ff_size=FF, num_layers=LAYERS, num_heads=HEADS)
    cond_j = jnp.asarray(data.pose_cond)

    def model_fn(x, t):
        return model.apply(flax_params.posenet, x, cond_j, t)

    specs = amass_guidance(jnp.asarray(data.mean), jnp.asarray(data.std), body) if guided else ()

    def run_jax_chain(x_init):
        return np.asarray(p_sample_loop(
            model_fn, sched, (B, T, 294), jax.random.PRNGKey(0),
            noise=jnp.asarray(x_init), step_noise=jnp.asarray(step), guidance=specs,
        ))

    jax_out = run_jax_chain(init)
    d = np.abs(ref_out - jax_out)
    print(f"[respace-parity] posenet '{respacing}' guided={guided}: "
          f"max={d.max():.2e} mean={d.mean():.2e}")
    assert np.isfinite(jax_out).all()
    if not guided:
        assert d.max() < 5e-4, f"respaced chain diverged: {d.max()}"
    else:
        # Under respacing EVERY spaced step is guided (internal index <= 50),
        # and with a random-weight model the skating guidance's discrete
        # thresholds (contact>0.5, vel>0.1 m/s) sit on knife edges, making
        # the chain chaotic at state-eps scale — exactly as measured for the
        # full-pipeline upper/full-mask configs (tests/test_e2e_parity.py).
        # Decisive gate: cross-framework delta must not exceed the chain's
        # own sensitivity to an eps-scale init perturbation.
        pert = init + np.float32(1e-6) * np.random.default_rng(1).standard_normal(
            init.shape
        ).astype(np.float32)
        d_self = np.abs(jax_out - run_jax_chain(pert))
        print(f"[respace-parity] guided self-sensitivity @1e-6 init: "
              f"max={d_self.max():.2e} mean={d_self.mean():.2e}")
        assert d.mean() < 2.0 * max(d_self.mean(), 1e-6), (
            f"guided respaced chain delta {d.mean()} EXCEEDS its own "
            f"eps-perturbation sensitivity {d_self.mean()} — implementation "
            "divergence, not chaos"
        )


def test_trajnet_respaced_chain_parity(ref, torch_models, twin, flax_params, data):
    """TrajNet 100-step schedule respaced to '10' sections through the real
    SpacedDiffusionTrajNet (same remap machinery, U-Net model)."""
    respacing = "10"
    diff = _make_diff(ref, ref.gd_traj, ref.SpacedDiffusionTrajNet, STEPS_TRAJ, respacing)
    n = diff.num_timesteps
    rng = np.random.default_rng(7)
    init = rng.standard_normal((B, T, 13)).astype(np.float32)
    step = rng.standard_normal((n, B, T, 13)).astype(np.float32)

    batch = {
        "motion_repr_clean": torch.from_numpy(data.traj_clean.copy()),
        "cond": torch.from_numpy(data.traj_cond.copy()),
    }
    shape = list(batch["motion_repr_clean"][:, :, 0:13].shape)
    feed = [init] + [step[t] for t in range(n - 1, -1, -1)]
    with _patched_noise(feed):
        _, out_ref = diff.eval_losses(
            model=torch_models.trajnet, batch=batch, shape=shape, progress=False,
            clip_denoised=False, timestep_respacing="",
            cond_fn_with_grad=False, compute_loss=False, smplx_model=twin,
        )
    ref_out = out_ref.detach().numpy()

    sched = make_schedule("cosine", STEPS_TRAJ, timestep_respacing=respacing)
    assert sched.num_timesteps == n
    model = TrajNet(traj_feat_dim=13, cond_dim=13, mid_dim=MID)
    cond_j = jnp.asarray(data.traj_cond)

    def model_fn(x, t):
        return model.apply(flax_params.trajnet, x, cond_j, t)

    jax_out = np.asarray(p_sample_loop(
        model_fn, sched, (B, T, 13), jax.random.PRNGKey(0),
        noise=jnp.asarray(init), step_noise=jnp.asarray(step),
    ))
    d = np.abs(ref_out - jax_out)
    print(f"[respace-parity] trajnet '{respacing}': max={d.max():.2e} mean={d.mean():.2e}")
    assert d.max() < 5e-4, f"respaced trajnet chain diverged: {d.max()}"


# --------------------------------------------------------------------------
# DDIM chains (reference formulas via the un-breaking shim)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("eta", [0.0, 0.5])
def test_ddim_chain_parity(ref, torch_models, twin, flax_params, data, eta):
    """ddim25 respacing of the 1000-step PoseNet schedule: the reference's
    ddim_sample math (gaussian_diffusion_posenet.py:695-715 — eps
    re-derivation from pred_xstart, eta-scaled sigma, Equation 12, t!=0
    noise mask) vs ddim_sample_loop here, same weights/cond/noise.

    The reference ddim path is dead code with a broken internal call (see
    module docstring); the shim below re-binds p_mean_variance with the
    missing `batch` argument and changes nothing else."""
    respacing = "ddim25"
    diff = _make_diff(ref, ref.gd_pose, ref.SpacedDiffusionPoseNet, STEPS_POSE, respacing)
    n = diff.num_timesteps
    assert n == 25
    rng = np.random.default_rng(500 + int(eta * 10))
    init = rng.standard_normal((B, T, 294)).astype(np.float32)
    step = rng.standard_normal((n, B, T, 294)).astype(np.float32)

    batch = {
        "motion_repr_clean": torch.from_numpy(_perm(data.pose_clean)),
        "cond": torch.from_numpy(_perm(data.pose_cond)),
    }
    shape = list(batch["motion_repr_clean"].shape)

    orig_pmv = diff.p_mean_variance  # bound SpacedDiffusion method

    def _fixed_pmv(model, x, t, **kw):
        return orig_pmv(model, batch, x, t, **kw)

    diff.p_mean_variance = _fixed_pmv
    try:
        feed = [_perm(step[t]) for t in range(n - 1, -1, -1)]
        with _patched_noise(feed):
            out_ref = diff.ddim_sample_loop(
                model=torch_models.posenet, shape=shape,
                noise=torch.from_numpy(_perm(init)), clip_denoised=False,
                device="cpu", eta=eta, progress=False,
            )
    finally:
        del diff.p_mean_variance  # restore the (broken) class attribute
    ref_out = out_ref[:, :, 0].permute(0, 2, 1).detach().numpy()

    sched = make_schedule("cosine", STEPS_POSE, timestep_respacing=respacing)
    model = PoseNet(latent_dim=LATENT, ff_size=FF, num_layers=LAYERS, num_heads=HEADS)
    cond_j = jnp.asarray(data.pose_cond)

    def model_fn(x, t):
        return model.apply(flax_params.posenet, x, cond_j, t)

    jax_out = np.asarray(ddim_sample_loop(
        model_fn, sched, (B, T, 294), jax.random.PRNGKey(0), eta=eta,
        noise=jnp.asarray(init), step_noise=jnp.asarray(step),
    ))
    d = np.abs(ref_out - jax_out)
    print(f"[ddim-parity] eta={eta}: max={d.max():.2e} mean={d.mean():.2e}")
    assert d.max() < 5e-4, f"ddim chain diverged at eta={eta}: {d.max()}"
    assert np.isfinite(jax_out).all()
