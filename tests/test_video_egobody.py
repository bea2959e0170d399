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
    assert dataset.view == "sub_1"
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
