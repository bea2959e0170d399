"""Train-CLI end-to-end tests: run the real `train_trajnet`/`train_posenet`
mains on tiny synthetic data and check the reference run-artifact contract
(reference train_trajnet.py:196-206 + training_loop_*.py:142-152): a fresh
runs/<id> logdir with params.json, a run_*.log file, AMASS_mean/std pkls
written at dataset build, periodic orbax checkpoints, and a finite loss.
Also covers --resume_from (optimizer-state restore, a beyond-reference
upgrade) and the TrajControl bootstrap-freeze path end-to-end."""

import json
import os
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow

COMMON = [
    "--synthetic_data=True",
    "--debug=True",  # 1 train + 1 test subset
    "--clip_len=17",
    "--batch_size=2",
    "--diffusion_steps=6",
    "--num_steps=4",
    "--save_interval=2",
    "--log_interval=100",  # skip eval-during-training (chain compile)
    "--seed=0",
]


def _logdir_artifacts(save_dir):
    runs = os.listdir(save_dir)
    assert len(runs) == 1
    logdir = os.path.join(save_dir, runs[0])
    files = os.listdir(logdir)
    assert "params.json" in files
    assert any(f.startswith("run_") and f.endswith(".log") for f in files)
    assert "AMASS_mean.pkl" in files and "AMASS_std.pkl" in files
    ckpts = sorted(f for f in files if f.startswith("model"))
    return logdir, files, ckpts


def test_train_trajnet_cli(tmp_path):
    from rohm_tpu.cli import train_trajnet as cli

    loop = cli.main(COMMON + [
        f"--dataset_root={tmp_path / 'amass'}",
        f"--save_dir={tmp_path / 'runs'}",
        "--mid_dim=64",
    ])
    logdir, files, ckpts = _logdir_artifacts(tmp_path / "runs")
    # periodic saves at steps 2 and 4 (save_interval=2, num_steps=4) plus the
    # final save() — orbax dirs named model{step:09d}
    assert "model000000002" in ckpts and "model000000004" in ckpts
    with open(os.path.join(logdir, "params.json")) as f:
        params = json.load(f)
    assert params["mid_dim"] == 64 and params["num_steps"] == 4
    from rohm_tpu.reprs.stats import load_stats

    mean, std = load_stats(logdir)
    assert np.asarray(mean).shape[-1] == 294 and np.asarray(std).shape[-1] == 294
    # pkl payload is the reference's per-block dict format
    with open(os.path.join(logdir, "AMASS_mean.pkl"), "rb") as f:
        assert isinstance(pickle.load(f), dict)
    assert np.isfinite(float(loop.last_losses["loss"]))


def test_train_posenet_cli_and_resume(tmp_path):
    from rohm_tpu.cli import train_posenet as cli

    loop = cli.main(COMMON + [
        f"--dataset_root={tmp_path / 'amass'}",
        f"--save_dir={tmp_path / 'runs'}",
        "--latent_dim=32",
        "--save_optimizer=True",
    ])
    logdir, files, ckpts = _logdir_artifacts(tmp_path / "runs")
    assert "model000000004" in ckpts
    assert np.isfinite(float(loop.last_losses["loss"]))

    # resume from the optimizer-state checkpoint: step counter continues
    resume_flags = [f for f in COMMON if not f.startswith("--num_steps")]
    loop2 = cli.main(resume_flags + [
        f"--dataset_root={tmp_path / 'amass'}",
        f"--save_dir={tmp_path / 'runs2'}",
        "--latent_dim=32",
        f"--resume_from={os.path.join(logdir, 'model000000004')}",
        "--num_steps=6",
    ])
    assert loop2.step >= 6
    p0 = loop.state.params["params"]["input_process"]["kernel"]
    p2 = loop2.state.params["params"]["input_process"]["kernel"]
    assert p0.shape == p2.shape
    assert not np.allclose(np.asarray(p0), np.asarray(p2))  # kept training


def test_train_trajcontrol_bootstrap_freeze(tmp_path):
    """Stage-4 TrajControl fine-tune: bootstrap from a trained backbone ckpt,
    freeze everything outside the ControlNet branch (reference
    train_trajnet.py:149-175)."""
    from rohm_tpu.cli import train_trajnet as cli

    loop = cli.main(COMMON + [
        f"--dataset_root={tmp_path / 'amass'}",
        f"--save_dir={tmp_path / 'runs'}",
        "--mid_dim=64",
    ])
    logdir, _, ckpts = _logdir_artifacts(tmp_path / "runs")
    backbone_ckpt = os.path.join(logdir, "model000000004")

    loop2 = cli.main(COMMON + [
        f"--dataset_root={tmp_path / 'amass'}",
        f"--save_dir={tmp_path / 'runs_tc'}",
        "--mid_dim=64",
        "--trajcontrol=True",
        "--load_pretrained_backbone=True",
        f"--pretrained_backbone_path={backbone_ckpt}",
    ])
    import flax

    flat0 = flax.traverse_util.flatten_dict(loop.state.params)
    flat2 = flax.traverse_util.flatten_dict(loop2.state.params)
    # frozen backbone leaves keep the bootstrap values bit-for-bit
    moved = frozen_same = 0
    for k, v in flat2.items():
        if k[1].startswith("ControlNet_0"):
            continue
        if k in flat0:
            if np.allclose(np.asarray(v), np.asarray(flat0[k])):
                frozen_same += 1
            else:
                moved += 1
    assert moved == 0, f"{moved} frozen backbone leaves changed during finetune"
    assert frozen_same > 10


def test_train_posenet_cli_fused_train(tmp_path):
    """--fused_train routes the step through the custom-VJP Pallas layers
    (interpret mode on CPU); the run-artifact contract is unchanged and the
    loss is finite."""
    from rohm_tpu.cli import train_posenet as cli

    loop = cli.main(COMMON + [
        f"--dataset_root={tmp_path / 'amass'}",
        f"--save_dir={tmp_path / 'runs'}",
        "--latent_dim=32",
        "--fused_train=float32",
    ])
    logdir, files, ckpts = _logdir_artifacts(tmp_path / "runs")
    assert "model000000004" in ckpts
    assert np.isfinite(float(loop.last_losses["loss"]))
    with open(os.path.join(logdir, "params.json")) as f:
        assert json.load(f)["fused_train"] == "float32"
