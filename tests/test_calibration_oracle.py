"""Hand-computed oracles for the video calibration chain and undistortion.

The other video tests round-trip against trees produced by
rohm_tpu/data/synthetic.py, whose calibration matrices have IDENTITY
rotations — a transposed rotation convention in both writer and loader would
cancel out and pass. These tests overwrite the calibration files with
non-trivial rigid transforms and assert against values computed inline with
the reference's convention (p_world = R @ p_cam + t,
/root/reference/data_loaders/dataloader_video.py:131 and the EgoBody chain
cam2world = master2world @ sub2master, :240-250), and invert a textbook
Brown–Conrady distortion through undistort_keypoints_prox.
"""

import json
import os
import pickle

import numpy as np
import pytest

from rohm_tpu.body import forward_joints, synthetic_model
from rohm_tpu.data import (
    VideoClipDataset,
    synthetic_amass_arrays,
    write_synthetic_egobody,
    write_synthetic_prox,
)
from rohm_tpu.data.amass import AmassClipDataset
from rohm_tpu.data.video import undistort_keypoints_prox

CLIP_LEN = 17
N_FRAMES = 40

# a non-trivial proper rotation (about a skew axis) so any transpose /
# inverse confusion in the loader shows up as centimetre-scale error
def _rot(axis, deg):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.deg2rad(deg)
    k = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(a) * k + (1 - np.cos(a)) * (k @ k)


@pytest.fixture(scope="module")
def body():
    return synthetic_model(num_verts=64)


@pytest.fixture(scope="module")
def stats_logdir(body, tmp_path_factory):
    root = tmp_path_factory.mktemp("stats")
    clips = synthetic_amass_arrays(body, n_clips=2, clip_len=CLIP_LEN, seed=1)
    logdir = str(root / "run")
    AmassClipDataset(body_model=body, split="train", clip_len=CLIP_LEN,
                     input_noise=False, task="pose", logdir=logdir, clips=clips)
    return logdir


def _fk_frames(body, fitting_dir, frame_names):
    """Independent camera-coord joints straight from the frame pickles."""
    params = {k: [] for k in ("global_orient", "transl", "betas", "body_pose")}
    for name in frame_names:
        with open(os.path.join(fitting_dir, name, "000.pkl"), "rb") as f:
            p = pickle.load(f)
        params["global_orient"].append(np.reshape(p["global_orient"], -1)[:3])
        params["transl"].append(np.reshape(p["transl"], -1)[:3])
        params["betas"].append(np.reshape(p["betas"], -1)[:10])
        params["body_pose"].append(np.reshape(p["body_pose"], -1)[:63])
    params = {k: np.stack(v).astype(np.float32) for k, v in params.items()}
    return np.asarray(
        forward_joints(body, params["betas"], params["global_orient"],
                       params["body_pose"], params["transl"], num_joints=22)
    ).astype(np.float64)


def test_prox_cam2world_rotation_oracle(body, stats_logdir, tmp_path):
    """Loader must apply p_world = R p_cam + t with the json's R as written
    (not R.T, not the inverse transform)."""
    init_root = str(tmp_path / "init")
    base_dir = str(tmp_path / "base")
    write_synthetic_prox(init_root, base_dir, body, recording_name="MPH11_00034_01",
                         n_frames=N_FRAMES, seed=0)
    R = _rot([1.0, 2.0, 0.5], 73.0)
    t = np.array([1.5, -2.0, 0.75])
    cam2world = np.eye(4)
    cam2world[:3, :3] = R
    cam2world[:3, 3] = t
    with open(os.path.join(base_dir, "cam2world", "MPH11.json"), "w") as f:
        json.dump(cam2world.tolist(), f)

    ds = VideoClipDataset(
        body_model=body, dataset="prox", init_root=init_root, base_dir=base_dir,
        recording_name="MPH11_00034_01", task="traj", repr_abs_only=True,
        overlap_len=2, clip_len=CLIP_LEN, logdir=stats_logdir,
    )
    fitting_dir = os.path.join(init_root, "MPH11_00034_01", "results")
    frame_names = sorted(os.listdir(fitting_dir))
    joints_cam = _fk_frames(body, fitting_dir, frame_names)

    expected_world = np.einsum("ij,tkj->tki", R, joints_cam) + t
    got = ds[0]["noisy_joints_scene_coord"].astype(np.float64)  # window 0 = frames [0:CLIP_LEN]
    np.testing.assert_allclose(got, expected_world[:CLIP_LEN], atol=1e-4)


def test_egobody_chain_composition_oracle(body, stats_logdir, tmp_path):
    """Sub-view chain must be world = M2W @ S2M applied as p -> M(S p)."""
    init_root = str(tmp_path / "init")
    base_dir = str(tmp_path / "base")
    rec = "recording_20211004_S12_S20_01"
    write_synthetic_egobody(init_root, base_dir, body, recording_name=rec,
                            scene_name="seminar_g110", view="sub_1",
                            n_frames=N_FRAMES, seed=0)
    Rm, tm = _rot([0.0, 0.0, 1.0], 90.0), np.array([0.2, 3.0, -0.1])
    Rs, ts = _rot([1.0, 0.0, 0.0], -35.0), np.array([-1.0, 0.4, 0.6])
    m2w = np.eye(4); m2w[:3, :3] = Rm; m2w[:3, 3] = tm
    s2m = np.eye(4); s2m[:3, :3] = Rs; s2m[:3, 3] = ts
    calib = os.path.join(base_dir, "calibrations", rec, "cal_trans")
    with open(os.path.join(calib, "kinect12_to_world", "seminar_g110.json"), "w") as f:
        json.dump({"trans": m2w.tolist()}, f)
    with open(os.path.join(calib, "kinect_11to12_color.json"), "w") as f:
        json.dump({"trans": s2m.tolist()}, f)

    ds = VideoClipDataset(
        body_model=body, dataset="egobody", init_root=init_root, base_dir=base_dir,
        recording_name=rec, task="traj", repr_abs_only=True,
        overlap_len=2, clip_len=CLIP_LEN, logdir=stats_logdir,
    )
    fitting_dir = os.path.join(init_root, rec, "body_idx_0", "results")
    frame_names = sorted(os.listdir(fitting_dir))
    joints_cam = _fk_frames(body, fitting_dir, frame_names)

    # init body: sub-cam coords -> master -> world (applied in that order)
    in_master = np.einsum("ij,tkj->tki", Rs, joints_cam) + ts
    expected_world = np.einsum("ij,tkj->tki", Rm, in_master) + tm
    got = ds[0]["noisy_joints_scene_coord"].astype(np.float64)
    np.testing.assert_allclose(got, expected_world[:CLIP_LEN], atol=1e-4)

    # GT body lives in the MASTER frame: only master2world applies
    expected_gt = np.einsum("ij,tkj->tki", Rm, joints_cam) + tm
    got_gt = ds[0]["gt_joints_scene_coord"].astype(np.float64)
    np.testing.assert_allclose(got_gt, expected_gt[:CLIP_LEN], atol=1e-4)


def test_undistort_inverts_brown_distortion():
    """Forward-distort ideal pixels with an inline Brown–Conrady model
    (OpenCV's k1,k2,p1,p2,k3 convention), push them through
    undistort_keypoints_prox, and require recovery of the ideal pixels —
    including the PROX mirror-flip dance (dataloader_video.py:442-458)."""
    W = 1920
    fx, fy, cx, cy = 1060.0, 1061.5, 958.2, 541.7
    k1, k2, p1, p2, k3 = -0.08, 0.03, 1.5e-3, -8e-4, -0.004
    color_cam = {
        "camera_mtx": [[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]],
        "k": [k1, k2, p1, p2, k3],
    }
    rng = np.random.default_rng(3)
    T, J = 4, 22
    # ideal (undistorted) pixels in the FLIPPED frame, comfortably in-image
    ideal = np.empty((T, J, 2))
    ideal[..., 0] = rng.uniform(300, 1600, (T, J))
    ideal[..., 1] = rng.uniform(200, 900, (T, J))

    # textbook forward model on normalized coords
    x = (ideal[..., 0] - cx) / fx
    y = (ideal[..., 1] - cy) / fy
    r2 = x * x + y * y
    radial = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    distorted = np.stack([xd * fx + cx, yd * fy + cy], axis=-1)

    # what OpenPose-on-PROX-mirrored-images would report: flip x back
    kp = np.zeros((T, J, 3))
    kp[..., 0] = W - 1 - distorted[..., 0]
    kp[..., 1] = distorted[..., 1]
    kp[..., 2] = 0.9

    out = undistort_keypoints_prox(kp, color_cam)
    np.testing.assert_allclose(out[..., 0], W - 1 - ideal[..., 0], atol=0.05)
    np.testing.assert_allclose(out[..., 1], ideal[..., 1], atol=0.05)
    np.testing.assert_array_equal(out[..., 2], kp[..., 2])
