"""EgoBody video-dataset tests over a synthetic recording tree (y-up path,
kinect calibration chain, gendered GT bodies)."""

import numpy as np
import pytest

from rohm_tpu.body import synthetic_model
from rohm_tpu.data import VideoClipDataset, synthetic_amass_arrays, write_synthetic_egobody
from rohm_tpu.data.amass import AmassClipDataset
from rohm_tpu.reprs.schema import BODY_FEAT_DIM

CLIP_LEN = 17
N_FRAMES = 40
REC = "recording_20211004_S12_S20_01"


@pytest.fixture(scope="module")
def body():
    return synthetic_model(num_verts=64)


@pytest.fixture(scope="module")
def tree(body, tmp_path_factory):
    root = tmp_path_factory.mktemp("egobody")
    init_root = str(root / "init")
    base_dir = str(root / "base")
    write_synthetic_egobody(init_root, base_dir, body, recording_name=REC, n_frames=N_FRAMES)
    clips = synthetic_amass_arrays(body, n_clips=2, clip_len=CLIP_LEN, seed=1)
    logdir = str(root / "run")
    AmassClipDataset(body_model=body, split="train", clip_len=CLIP_LEN,
                     input_noise=False, task="pose", logdir=logdir, clips=clips)
    return init_root, base_dir, logdir


@pytest.fixture(scope="module")
def dataset(body, tree):
    init_root, base_dir, logdir = tree
    return VideoClipDataset(
        body_model=body, dataset="egobody", init_root=init_root, base_dir=base_dir,
        recording_name=REC, task="pose", repr_abs_only=False,
        overlap_len=2, clip_len=CLIP_LEN, logdir=logdir,
        gendered_models={"female": body, "male": body},
    )


def test_metadata_resolved(dataset):
    assert dataset.kinect_view == "sub_1"
    assert callable(dataset.view)  # the view() method must not be shadowed
    assert dataset.gender_gt == "female"
    assert dataset.scene_name == "seminar_g110"
    assert len(dataset) == 2


def test_item_has_gt_joints(dataset):
    item = dataset[0]
    assert item["gt_joints_scene_coord"].shape == (CLIP_LEN, 22, 3)
    assert item["motion_repr_noisy"].shape == (CLIP_LEN - 1, BODY_FEAT_DIM)
    assert np.isfinite(item["motion_repr_noisy"]).all()
    # init body and GT body are the same synthetic motion, but init lives in
    # the SUB camera's world lift while GT uses the MASTER transform; the
    # difference is exactly the sub->master offset
    d = np.abs(item["noisy_joints_scene_coord"] - item["gt_joints_scene_coord"])
    assert d.max() < 0.2


def test_cano_transform_consistency(dataset):
    item = dataset[0]
    tf = item["transf_matrix"].astype(np.float64)
    mapped = item["noisy_joints_scene_coord"] @ tf[:3, :3].T + tf[:3, 3]
    np.testing.assert_allclose(mapped, item["noisy_joints"], atol=1e-4)
    # canonical frame is z-up with floor at ~0 (y-up scene converted,
    # reprs/canonicalize.py cano_seq_smplx_egobody)
    z_min = item["noisy_joints"][..., 2].min()
    assert -0.3 < z_min < 0.5


def test_kinect_chain_calibration_oracle(body, tmp_path):
    """Hand oracle for the EgoBody multi-kinect calibration chain
    (reference dataloader_video.py:233-259): with ROTATED (non-identity)
    master->world and sub->master transforms, the loader must lift the init
    body through cam2world = master2world @ sub2master while the gendered GT
    body (which lives in the MASTER kinect frame) is lifted through
    master2world alone. Expected joints are composed by hand from the raw
    synthetic params."""
    import json

    from rohm_tpu.data.amass import _fk_jit
    from rohm_tpu.data.synthetic import synthetic_motion

    init_root = str(tmp_path / "init")
    base_dir = str(tmp_path / "base")
    write_synthetic_egobody(init_root, base_dir, body, recording_name=REC,
                            n_frames=N_FRAMES, seed=0)

    def roty(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    m2w = np.eye(4)
    m2w[:3, :3] = roty(0.4)  # rotations about the y-up axis keep up = up
    m2w[:3, 3] = [0.3, 0.05, -0.2]
    s2m = np.eye(4)
    s2m[:3, :3] = roty(-0.15)
    s2m[:3, 3] = [0.08, -0.02, 0.12]
    calib = f"{base_dir}/calibrations/{REC}/cal_trans"
    with open(f"{calib}/kinect12_to_world/seminar_g110.json", "w") as f:
        json.dump({"trans": m2w.tolist()}, f)
    with open(f"{calib}/kinect_11to12_color.json", "w") as f:
        json.dump({"trans": s2m.tolist()}, f)

    clips = synthetic_amass_arrays(body, n_clips=2, clip_len=CLIP_LEN, seed=1)
    logdir = str(tmp_path / "run")
    AmassClipDataset(body_model=body, split="train", clip_len=CLIP_LEN,
                     input_noise=False, task="pose", logdir=logdir, clips=clips)
    ds = VideoClipDataset(
        body_model=body, dataset="egobody", init_root=init_root, base_dir=base_dir,
        recording_name=REC, task="pose", repr_abs_only=False,
        overlap_len=2, clip_len=CLIP_LEN, logdir=logdir,
        gendered_models={"female": body, "male": body},
    )

    # hand-composed expectation from the same synthetic params
    _, params = synthetic_motion(body, N_FRAMES, seed=0)
    fk = _fk_jit(body, 22)
    joints_cam = np.asarray(fk(params["betas"], params["global_orient"],
                               params["body_pose"], params["transl"]))
    chain = m2w @ s2m
    exp_init = joints_cam @ chain[:3, :3].T + chain[:3, 3]
    exp_gt = joints_cam @ m2w[:3, :3].T + m2w[:3, 3]

    np.testing.assert_allclose(ds.joints_clip_world[0], exp_init[:CLIP_LEN], atol=1e-5)
    np.testing.assert_allclose(ds.joints_clip_world_gt[0], exp_gt[:CLIP_LEN], atol=1e-5)
    # the two lifts must genuinely differ (the sub->master leg is not a no-op)
    assert np.abs(exp_init - exp_gt).max() > 0.05
