"""End-to-end CLI driver runs on synthetic data + golden self-regression.

VERDICT r1 #8: one seeded synthetic test_amass_full run whose metrics are
asserted against committed golden values (tests/golden/amass_full_tiny.json)
so numeric drift across rounds is detectable without the license-gated
datasets. Regenerate with REGEN_GOLDEN=1 python -m pytest tests/test_cli_e2e.py -m ''.

Also the only tests that execute the full test_amass_full / test_prox_egobody
driver mains (argument parsing -> dataset -> pipeline -> pickle).
"""

import json
import os
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "amass_full_tiny.json")


def test_amass_full_cli_and_golden(tmp_path, monkeypatch):
    from rohm_tpu.cli import test_amass_full as cli
    from rohm_tpu.cli.eval_amass_full import evaluate

    monkeypatch.chdir(tmp_path)  # no body-model weights -> synthetic fallback
    pkl_path = cli.main([
        "--synthetic_data=True",
        f"--dataset_root={tmp_path / 'amass'}",
        "--clip_len=17",
        "--batch_size=4",
        "--diffusion_steps_posenet=8",
        "--diffusion_steps_trajnet=5",
        "--mid_dim=64",
        "--latent_dim=32",
        "--load_noise=False",
        "--mask_scheme=lower",
        f"--save_root={tmp_path / 'results'}",
        "--seed=0",
    ])
    with open(pkl_path, "rb") as f:
        saved = pickle.load(f)

    # 3 test datasets x 1 seq x 1 clip, T = 17 - 2 = 15
    assert saved["rec_ric_data_rec_list_from_smpl"].shape == (3, 15, 22, 3)
    assert saved["rec_ric_data_clean_list"].shape == (3, 15, 22, 3)
    assert saved["motion_repr_rec_list"].shape == (3, 15, 294)
    for k in ("motion_repr_noisy_list", "rec_ric_data_noisy_list",
              "rec_ric_data_rec_list_from_abs_traj", "motion_repr_clean_list"):
        assert np.isfinite(saved[k]).all(), k

    metrics = evaluate(saved, saved["mask_scheme"])
    metrics = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in metrics.values())

    if os.environ.get("REGEN_GOLDEN"):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(metrics, f, indent=1, sort_keys=True)
        pytest.skip(f"golden regenerated at {GOLDEN}")

    assert os.path.exists(GOLDEN), "golden fixture missing; run with REGEN_GOLDEN=1"
    import jax
    if jax.default_backend() != "cpu":
        # The golden was generated with CPU f32 arithmetic; TPU default matmul
        # precision deviates ~0.03 at pipeline level (BASELINE.md), which would
        # fail the 1% tolerance for backend reasons, not math changes.
        pytest.skip("golden values are CPU-backend only")
    with open(GOLDEN) as f:
        golden = json.load(f)
    assert set(metrics) == set(golden)
    for k, v in golden.items():
        # float32 pipeline on a fixed seed: drift beyond 1% of the metric's
        # magnitude (or 1e-3 absolute for near-zero ratios) means the math
        # changed, not the arithmetic
        tol = max(abs(v) * 0.01, 1e-3)
        assert abs(metrics[k] - v) <= tol, f"{k}: {metrics[k]} vs golden {v}"


def test_fused_modes_metric_budget(tmp_path, monkeypatch):
    """The fused Pallas PoseNet modes (bf16 accuracy mode, int8/int8qa
    throughput modes — the bench.py headline) must keep eval METRICS close to
    the flax-f32 path, not just a repr-space envelope.
    Reference metric definitions: /root/reference/eval_amass_full.py:72-147.

    Same seeded synthetic config for all runs; only --fused_posenet varies,
    so any metric delta is attributable to the kernel numerics. sample_iter=1
    isolates those numerics: the 2-iteration pipeline feeds its own output
    back as condition, which amplifies ANY rounding difference chaotically at
    this tiny random-weight scale (tests/test_e2e_parity.py measures the
    chain's self-sensitivity at ~0.48 mean repr units for a 1e-2 input
    perturbation — mode-independent chaos, not kernel error). Tolerances are
    set from measured single-iteration deltas (mpjpe rel <=1.2%, accel
    <=0.7%, contact-label flips <=0.044 — discrete 0.5-threshold labels flip
    on near-boundary logits that trained weights saturate) with ~2x margin;
    a real kernel-numerics break (e.g. a wrong quantization scale) shows up
    as >>10% on every metric."""
    from rohm_tpu.cli import test_amass_full as cli
    from rohm_tpu.cli.eval_amass_full import evaluate

    monkeypatch.chdir(tmp_path)

    def run(mode: str) -> dict:
        pkl_path = cli.main([
            "--synthetic_data=True",
            f"--dataset_root={tmp_path / 'amass'}",
            "--clip_len=17",
            "--batch_size=4",
            "--diffusion_steps_posenet=8",
            "--diffusion_steps_trajnet=5",
            "--mid_dim=64",
            "--latent_dim=32",
            "--load_noise=False",
            "--mask_scheme=lower",
            "--sample_iter=1",
            f"--fused_posenet={mode}",
            f"--save_root={tmp_path / ('results_' + mode)}",
            "--seed=0",
        ])
        with open(pkl_path, "rb") as f:
            saved = pickle.load(f)
        return {k: float(v) for k, v in evaluate(saved, saved["mask_scheme"]).items()}

    base = run("false")
    # (key, tolerance): keys as returned by evaluate() — a missing key is a
    # FAILURE, not a skip (an earlier version listed keys evaluate() never
    # produces, silently asserting nothing)
    gated = {
        "mpjpe_global_mm": max(abs(base.get("mpjpe_global_mm", 0.0)) * 0.02, 4.0),
        "mpjpe_global_vis_mm": max(abs(base.get("mpjpe_global_vis_mm", 0.0)) * 0.02, 4.0),
        "accel_error_ms2": max(abs(base.get("accel_error_ms2", 0.0)) * 0.02, 2.5),
        "skating_rec_ratio": 0.02,
        "contact_lbl_acc": 0.08,
        "ground_pene_freq_pct": 0.5,
        "ground_pene_dist_mm": 0.5,
    }
    missing = [k for k in gated if k not in base]
    assert not missing, f"metric keys absent from evaluate(): {missing}"
    for mode in ("bf16", "int8", "int8qa"):
        got = run(mode)
        for k, tol in gated.items():
            assert abs(got[k] - base[k]) <= tol, (
                f"{mode}: metric {k} off budget: {got[k]} vs flax {base[k]} "
                f"(tol {tol})"
            )


def test_prox_egobody_cli_runs(tmp_path, monkeypatch):
    from rohm_tpu.body import synthetic_model
    from rohm_tpu.cli import test_prox_egobody as cli
    from rohm_tpu.data import AmassClipDataset, synthetic_amass_arrays, write_synthetic_prox

    clip_len = 17
    body = synthetic_model(num_verts=64)
    init_root = str(tmp_path / "init")
    base_dir = str(tmp_path / "base")
    write_synthetic_prox(init_root, base_dir, body, recording_name="MPH11_00034_01",
                         n_frames=40, seed=0)
    # stats (travel with the "checkpoint"): synthetic AMASS train run
    clips = synthetic_amass_arrays(body, n_clips=2, clip_len=clip_len, seed=1)
    logdir = tmp_path / "ckpt"
    AmassClipDataset(body_model=body, split="train", clip_len=clip_len,
                     input_noise=False, task="pose", logdir=str(logdir), clips=clips)

    monkeypatch.chdir(tmp_path)  # synthetic body-model fallback
    pkl_path = cli.main([
        "--dataset=prox",
        f"--dataset_root={base_dir}",
        f"--init_root={init_root}",
        "--recording_name=MPH11_00034_01",
        f"--clip_len={clip_len}",
        "--batch_size=2",
        "--diffusion_steps_posenet=8",
        "--diffusion_steps_trajnet=5",
        "--mid_dim=64",
        "--latent_dim=32",
        f"--model_path_posenet={logdir / 'model000000001'}",
        "--allow_missing_ckpt=True",  # path exists only for its stats dir
        f"--save_root={tmp_path / 'results'}",
        "--use_scene_floor_height=False",
        "--seed=0",
    ])
    with open(pkl_path, "rb") as f:
        saved = pickle.load(f)

    t_out = clip_len - 2
    n = saved["motion_repr_rec_list"].shape[0]
    assert n >= 2  # overlapping windows over 40 frames
    assert saved["rec_ric_data_rec_list_from_smpl"].shape == (n, t_out, 22, 3)
    assert saved["motion_repr_rec_list"].shape == (n, t_out, 294)
    assert len(saved["frame_name_list"]) == n
    assert saved["recording_name"] == "MPH11_00034_01"
    for k in ("rec_ric_data_noisy_list", "rec_ric_data_rec_list_from_abs_traj",
              "trans_scene2cano_list", "mask_joint_vis_list"):
        assert np.isfinite(np.asarray(saved[k], np.float64)).all(), k

def test_amass_full_cli_data_parallel(tmp_path, monkeypatch):
    """--data_parallel: the full driver runs the pipeline over the virtual
    8-device mesh (batch sharded on 'data') and produces finite results."""
    from rohm_tpu.cli import test_amass_full as cli

    monkeypatch.chdir(tmp_path)
    pkl_path = cli.main([
        "--synthetic_data=True",
        f"--dataset_root={tmp_path / 'amass'}",
        "--clip_len=17",
        "--batch_size=8",
        "--diffusion_steps_posenet=8",
        "--diffusion_steps_trajnet=5",
        "--mid_dim=64",
        "--latent_dim=32",
        "--load_noise=False",
        "--mask_scheme=lower",
        "--data_parallel=True",
        f"--save_root={tmp_path / 'results'}",
        "--seed=0",
    ])
    with open(pkl_path, "rb") as f:
        saved = pickle.load(f)
    assert saved["rec_ric_data_rec_list_from_smpl"].shape == (3, 15, 22, 3)
    assert np.isfinite(saved["motion_repr_rec_list"]).all()


def test_egobody_cli_runs_and_evals(tmp_path, monkeypatch, capsys):
    """Golden EgoBody end-to-end: the real test_prox_egobody driver with
    --dataset=egobody on a synthetic EgoBody tree (y-up canonicalization,
    kinect calibration chain, gendered GT in the master frame — reference
    dataloader_video.py:233-259), chained into the real eval_prox_egobody
    CLI (G-MPJPE/MPJPE vs GT in scene coords + the 4-number mm line,
    reference eval_prox_egobody.py:229-254, 486-490)."""
    from rohm_tpu.body import synthetic_model
    from rohm_tpu.cli import eval_prox_egobody as eval_cli
    from rohm_tpu.cli import test_prox_egobody as cli
    from rohm_tpu.data import AmassClipDataset, synthetic_amass_arrays, write_synthetic_egobody

    clip_len = 17
    rec = "recording_20211004_S12_S20_01"
    body = synthetic_model(num_verts=64)
    init_root = str(tmp_path / "init")
    base_dir = str(tmp_path / "base")
    write_synthetic_egobody(init_root, base_dir, body, recording_name=rec,
                            n_frames=40, seed=0)
    clips = synthetic_amass_arrays(body, n_clips=2, clip_len=clip_len, seed=1)
    logdir = tmp_path / "ckpt"
    AmassClipDataset(body_model=body, split="train", clip_len=clip_len,
                     input_noise=False, task="pose", logdir=str(logdir), clips=clips)

    monkeypatch.chdir(tmp_path)  # synthetic body-model fallback
    pkl_path = cli.main([
        "--dataset=egobody",
        f"--dataset_root={base_dir}",
        f"--init_root={init_root}",
        f"--recording_name={rec}",
        f"--clip_len={clip_len}",
        "--batch_size=2",
        "--diffusion_steps_posenet=8",
        "--diffusion_steps_trajnet=5",
        "--mid_dim=64",
        "--latent_dim=32",
        f"--model_path_posenet={logdir / 'model000000001'}",
        "--allow_missing_ckpt=True",
        f"--save_root={tmp_path / 'results'}",
        "--use_scene_floor_height=False",
        "--seed=0",
    ])
    with open(pkl_path, "rb") as f:
        saved = pickle.load(f)
    t_out = clip_len - 2
    n = saved["motion_repr_rec_list"].shape[0]
    assert n >= 2
    assert saved["gender_gt"] == "female"  # gendered-GT metadata travels
    # GT joints stay at input-frame resolution (clip_len frames/window);
    # the eval crops them to the t_out rec frames
    assert saved["joints_gt_scene_coord_list"].shape == (n, clip_len, 22, 3)
    assert saved["rec_ric_data_rec_list_from_smpl"].shape == (n, t_out, 22, 3)
    assert np.isfinite(saved["joints_gt_scene_coord_list"]).all()

    # chain into the real eval CLI ('all'-style aggregation over the
    # recording list; G-MPJPE line printed in mm)
    agg = eval_cli.main([
        "--dataset=egobody",
        f"--saved_data_dir={os.path.dirname(pkl_path)}",
        f"--recording_list={rec}",
    ])
    out = capsys.readouterr().out
    assert "gmpjpe/mpjpe" in out
    for k in ("gmpjpe", "mpjpe", "mpjpe_vis", "skating", "acc_error",
              "pene_freq", "pene_dist"):
        assert k in agg and np.isfinite(float(agg[k])), (k, agg)
