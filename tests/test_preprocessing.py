"""preprocessing_amass tests: both AMASS npz key formats -> [T,25,3]+[T,178]."""

import numpy as np
import pytest

from rohm_tpu.body import synthetic_model
from rohm_tpu.cli.preprocessing_amass import amass_to_pose


@pytest.fixture(scope="module")
def body():
    return synthetic_model(num_verts=64)


def _base(t=8):
    rng = np.random.default_rng(0)
    return {
        "mocap_frame_rate": 60.0,
        "trans": rng.normal(size=(t, 3)),
        "betas": rng.normal(size=16),
    }, rng, t


def test_smplx_release_format(tmp_path, body):
    d, rng, t = _base()
    d.update(
        root_orient=rng.normal(scale=0.3, size=(t, 3)),
        pose_body=rng.normal(scale=0.2, size=(t, 63)),
        pose_hand=rng.normal(scale=0.1, size=(t, 90)),
        pose_jaw=rng.normal(scale=0.1, size=(t, 3)),
        pose_eye=rng.normal(scale=0.1, size=(t, 6)),
    )
    path = tmp_path / "a.npz"
    np.savez(path, **d)
    joints, params = amass_to_pose(str(path), body, target_fps=30)
    assert joints.shape == (4, 25, 3)  # 60->30 fps halves 8 frames
    assert params.shape == (4, 178)
    np.testing.assert_allclose(params[:, 0:3], d["root_orient"][::2])
    np.testing.assert_allclose(params[:, 16:79], d["pose_body"][::2])
    np.testing.assert_allclose(params[:, 79:169], d["pose_hand"][::2])


def test_flat_poses_format(tmp_path, body):
    d, rng, t = _base()
    d["poses"] = rng.normal(scale=0.2, size=(t, 165))
    path = tmp_path / "b.npz"
    np.savez(path, **d)
    joints, params = amass_to_pose(str(path), body, target_fps=30)
    assert joints.shape == (4, 25, 3) and params.shape == (4, 178)
    np.testing.assert_allclose(params[:, 0:3], d["poses"][::2, 0:3])
    np.testing.assert_allclose(params[:, 79:169], d["poses"][::2, 75:165])


def test_bad_file_returns_none(tmp_path, body):
    path = tmp_path / "bad.npz"
    np.savez(path, unrelated=np.zeros(3))
    assert amass_to_pose(str(path), body) is None


class TestSkipRules:
    """Exact reproduction of the reference's skip decisions
    (preprocessing_amass.py:120-134)."""

    @pytest.mark.parametrize(
        "dataset,name,skip",
        [
            ("ACCAD", "neutral_stagei", True),
            ("HDM05", "neutral_stagei", True),
            ("HDM05", "HDM_dg_07-01_01_120", True),  # inline skating
            ("HDM05", "HDM_dg_07-02_01_120", False),
            ("HDM05", "HDM_bd_07-01_01_120", False),
            ("BMLrub", "rub001_treadmill_fast", True),
            ("BMLrub", "rub002_normal_walk", True),
            ("BMLrub", "rub003_jumping_01", False),
            ("BMLrub", "rub004", False),  # no underscore: kept
            ("CMU", "01_01_treadmill", False),  # rule is BMLrub-only
            ("ACCAD", "Female1General_c3d", False),
        ],
    )
    def test_skip(self, dataset, name, skip):
        from rohm_tpu.cli.preprocessing_amass import should_skip_recording

        assert should_skip_recording(dataset, name) is skip


class TestDownsampleStride:
    """Exact reproduction of the reference's fps handling
    (preprocessing_amass.py:31-40): SSM 59.99->2 / 120.00->4, everything else
    must be an integer multiple of 30 fps."""

    @pytest.mark.parametrize(
        "dataset,fps,stride",
        [
            ("SSM", 59.9944, 2),
            ("SSM", 120.0041, 4),
            ("ACCAD", 120.0, 4),
            ("CMU", 60.0, 2),
            ("TotalCapture", 60.0, 2),
            ("KIT", 100.0, None),  # 100/30 not integer -> rejected
            ("CNRS", 100.0, None),
            ("Eyes_Japan_Dataset", 250.0, None),
            ("BMLmovi", 120.0, 4),
            ("ACCAD", 59.99, None),  # non-SSM near-60 -> rejected, not rounded
            ("ACCAD", 30.0, 1),
        ],
    )
    def test_stride(self, dataset, fps, stride):
        from rohm_tpu.cli.preprocessing_amass import downsample_stride

        assert downsample_stride(dataset, fps) == stride


def test_ssm_120fps_downsampled_to_30(tmp_path, body):
    """An SSM sequence at 120.00 fps must come out with stride 4 (the round-1
    code hardcoded fps=60 and produced 60 fps output)."""
    d, rng, t = _base(t=16)
    d["mocap_frame_rate"] = 120.0041
    d.update(
        root_orient=rng.normal(scale=0.3, size=(t, 3)),
        pose_body=rng.normal(scale=0.2, size=(t, 63)),
        pose_hand=rng.normal(scale=0.1, size=(t, 90)),
        pose_jaw=rng.normal(scale=0.1, size=(t, 3)),
        pose_eye=rng.normal(scale=0.1, size=(t, 6)),
    )
    path = tmp_path / "ssm.npz"
    np.savez(path, **d)
    joints, params = amass_to_pose(str(path), body, target_fps=30, dataset_name="SSM")
    assert joints.shape == (4, 25, 3)
    np.testing.assert_allclose(params[:, 0:3], d["root_orient"][::4])


def test_non_neutral_gender_rejected(tmp_path, body):
    d, rng, t = _base()
    d["gender"] = "female"
    d["poses"] = rng.normal(scale=0.2, size=(t, 165))
    path = tmp_path / "g.npz"
    np.savez(path, **d)
    assert amass_to_pose(str(path), body) is None
