"""End-to-end runs of the single-net test CLIs (reference test_trajnet.py /
test_posenet.py drivers): tiny synthetic data, real sampling chains, checking
the printed diagnostic contract and the result-pickle schema."""

import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_trajnet_cli_diagnostics(tmp_path, capsys):
    """Root-error/jitter printout keys (reference test_trajnet.py:332-366) and
    finite diagnostic values for all three decodings."""
    from rohm_tpu.cli import test_trajnet as cli

    results = cli.main([
        "--synthetic_data=True",
        f"--dataset_root={tmp_path / 'amass'}",
        "--clip_len=17",
        "--batch_size=2",
        "--diffusion_steps=5",
        "--mid_dim=64",
        "--input_noise=True",
        "--seed=0",
    ])
    for tag in ("abs", "rel", "smpl"):
        for axis in ("x", "y", "z"):
            assert np.isfinite(results[f"{axis}_{tag}"])
        assert np.isfinite(results[f"jitter_{tag}"])
    assert np.isfinite(results["root_rot"])
    out = capsys.readouterr().out
    assert "root_rot_err_rec (deg):" in out
    assert "root x/y/z err from smpl (mm):" in out
    assert "root jitter clean/noisy (m/s^3):" in out


def test_trajnet_cli_infill(tmp_path):
    """--infill_traj masks a window of the conditioning (test_trajnet.py:139-149)."""
    from rohm_tpu.cli import test_trajnet as cli

    results = cli.main([
        "--synthetic_data=True",
        f"--dataset_root={tmp_path / 'amass'}",
        "--clip_len=17",
        "--batch_size=2",
        "--diffusion_steps=5",
        "--mid_dim=64",
        "--infill_traj=True",
        "--max_infill_ratio=0.3",
        "--seed=0",
    ])
    assert np.isfinite(results["x_abs"])


def test_posenet_cli_pickle(tmp_path, capsys):
    """GT-traj PoseNet test: printed MPJPE + result-pickle keys match the
    reference's save schema (test_posenet.py:229-257)."""
    from rohm_tpu.cli import test_posenet as cli

    mpjpe = cli.main([
        "--synthetic_data=True",
        f"--dataset_root={tmp_path / 'amass'}",
        "--clip_len=17",
        "--batch_size=2",
        "--diffusion_steps=6",
        "--latent_dim=32",
        "--mask_scheme=lower",
        "--save_results=True",
        f"--save_root={tmp_path / 'res'}",
        "--seed=0",
    ])
    assert np.isfinite(mpjpe) and mpjpe >= 0
    assert "mpjpe_global (mm):" in capsys.readouterr().out
    pkl = tmp_path / "res" / "test_posenet_mask_lower_grad_False_seed_0.pkl"
    assert pkl.exists()
    with open(pkl, "rb") as f:
        saved = pickle.load(f)
    for k in ("mask_scheme", "repr_name_list", "repr_dim_dict",
              "rec_ric_data_clean_list", "rec_ric_data_rec_list_from_smpl",
              "motion_repr_clean_list", "motion_repr_rec_list",
              "rec_ric_data_noisy_list"):
        assert k in saved, k
    n, t = saved["motion_repr_rec_list"].shape[:2]
    assert saved["motion_repr_rec_list"].shape[2] == 294
    assert saved["rec_ric_data_rec_list_from_smpl"].shape == (n, t, 22, 3)
