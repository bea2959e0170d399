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
