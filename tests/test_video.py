"""Video (PROX-format) dataset tests over a synthetic recording tree."""

import numpy as np
import pytest

from rohm_tpu.body import synthetic_model
from rohm_tpu.data import VideoClipDataset, synthetic_amass_arrays, write_synthetic_prox
from rohm_tpu.data.amass import AmassClipDataset
from rohm_tpu.reprs.schema import BODY_FEAT_DIM

CLIP_LEN = 17
N_FRAMES = 40


@pytest.fixture(scope="module")
def body():
    return synthetic_model(num_verts=64)


@pytest.fixture(scope="module")
def prox_tree(body, tmp_path_factory):
    root = tmp_path_factory.mktemp("prox")
    init_root = str(root / "init")
    base_dir = str(root / "base")
    write_synthetic_prox(init_root, base_dir, body, recording_name="MPH11_00034_01",
                         n_frames=N_FRAMES, seed=0)
    # stats come from an AMASS-trained run; emulate with a synthetic train set
    clips = synthetic_amass_arrays(body, n_clips=2, clip_len=CLIP_LEN, seed=1)
    logdir = str(root / "run")
    AmassClipDataset(body_model=body, split="train", clip_len=CLIP_LEN,
                     input_noise=False, task="pose", logdir=logdir, clips=clips)
    return init_root, base_dir, logdir


@pytest.fixture(scope="module")
def dataset(body, prox_tree):
    init_root, base_dir, logdir = prox_tree
    return VideoClipDataset(
        body_model=body, dataset="prox", init_root=init_root, base_dir=base_dir,
        recording_name="MPH11_00034_01", task="traj", repr_abs_only=True,
        overlap_len=2, clip_len=CLIP_LEN, logdir=logdir,
    )


def test_window_count(dataset):
    # stride = 17 - 2 = 15 over 40 frames -> windows at 0 and 15
    assert len(dataset) == 2


def test_item_contents(dataset):
    item = dataset[0]
    assert item["motion_repr_noisy"].shape == (CLIP_LEN - 1, BODY_FEAT_DIM)
    assert item["noisy_joints"].shape == (CLIP_LEN, 22, 3)
    assert item["noisy_joints_scene_coord"].shape == (CLIP_LEN, 22, 3)
    assert item["transf_matrix"].shape == (4, 4)
    assert item["keypoints_2d"].shape == (CLIP_LEN, 22, 3)
    assert item["mask_joint_vis"].shape == (CLIP_LEN, 22)
    assert item["mask_vec_vis"].shape == (CLIP_LEN, BODY_FEAT_DIM)
    assert item["cond"].shape == (CLIP_LEN - 1, 13)
    assert item["control_cond"].shape == (CLIP_LEN - 1, 272)
    assert np.isfinite(item["motion_repr_noisy"]).all()
    assert item["focal_length"].shape == (2,) and item["camera_center"].shape == (2,)


def test_scene_to_cano_transform_consistent(dataset):
    """transf_matrix maps scene joints onto the canonical joints."""
    item = dataset[0]
    tf = item["transf_matrix"].astype(np.float64)
    scene = item["noisy_joints_scene_coord"].astype(np.float64)
    cano = item["noisy_joints"].astype(np.float64)
    mapped = scene @ tf[:3, :3].T + tf[:3, 3]
    np.testing.assert_allclose(mapped, cano, atol=1e-4)


def test_visibility_mask_semantics(dataset):
    item = dataset[0]
    vis = item["mask_joint_vis"]
    # synthetic tree occludes leg joints (1, 4, 7, 10) for a 10-frame window
    assert vis.min() == 0.0 and vis.max() == 1.0
    occluded_any = (vis == 0).any(axis=0)
    assert occluded_any[[1, 4, 7, 10]].any()
    # mask_vec_vis: traj dims always visible
    assert (item["mask_vec_vis"][:, :22] == 1).all()


def test_undistort_identity_when_no_distortion(dataset):
    """With zero distortion coeffs, keypoints pass through unchanged."""
    item = dataset[0]
    raw = dataset.keypoints_clips[0]
    np.testing.assert_allclose(item["keypoints_2d"][..., :2], raw[..., :2], atol=1e-3)
    np.testing.assert_allclose(item["keypoints_2d"][..., 2], raw[..., 2], atol=1e-6)


def test_keypoints_match_projection(dataset, body):
    """Synthetic keypoints were made by projecting camera-coord joints; verify
    the guidance projection math reproduces them from the scene-coord joints."""
    item = dataset[0]
    scene = item["noisy_joints_scene_coord"].astype(np.float64)
    # scene -> camera: cam_R^-1 (p - cam_t)
    cam = (scene - dataset.cam_t) @ np.linalg.inv(dataset.cam_r).T
    z = np.maximum(np.abs(cam[..., 2]), 0.5)
    uv = cam[..., :2] / z[..., None] * item["focal_length"] + item["camera_center"]
    kp = item["keypoints_2d"][..., :2]
    conf = item["keypoints_2d"][..., 2]
    err = np.abs(uv - kp)[conf > 0]
    assert np.median(err) < 1.0, f"median reprojection error {np.median(err)}"


def test_video_disk_cache_roundtrip(body, prox_tree, tmp_path):
    """disk_cache_dir: second construction loads the pickled recording state
    (no FK/encode) and serves identical items; config changes re-key."""
    import os

    init_root, base_dir, logdir = prox_tree
    cache = str(tmp_path / "vcache")
    kw = dict(
        body_model=body, dataset="prox", init_root=init_root, base_dir=base_dir,
        recording_name="MPH11_00034_01", task="traj", repr_abs_only=True,
        overlap_len=2, clip_len=CLIP_LEN, logdir=logdir, disk_cache_dir=cache,
    )
    ds1 = VideoClipDataset(**kw)
    assert len(os.listdir(cache)) == 1
    ds2 = VideoClipDataset(**kw)
    assert len(ds1) == len(ds2)
    a, b = ds1[0], ds2[0]
    for k in ("motion_repr_noisy", "noisy_joints", "noisy_joints_scene_coord",
              "transf_matrix", "keypoints_2d", "mask_vec_vis", "cond"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    assert a["frame_name"] == b["frame_name"]

    # different clip_len -> separate cache entry
    VideoClipDataset(**{**kw, "clip_len": CLIP_LEN - 2})
    assert len(os.listdir(cache)) == 2


def test_video_disk_cache_does_not_clobber_view_config(body, prox_tree, tmp_path):
    """The cache key is view-independent; a cache written by a pose-view build
    must not overwrite a traj-view constructor's task/repr_abs_only."""
    import os

    init_root, base_dir, logdir = prox_tree
    cache = str(tmp_path / "vcache2")
    kw = dict(
        body_model=body, dataset="prox", init_root=init_root, base_dir=base_dir,
        recording_name="MPH11_00034_01", overlap_len=2, clip_len=CLIP_LEN,
        logdir=logdir, disk_cache_dir=cache,
    )
    ds_pose = VideoClipDataset(task="pose", repr_abs_only=False, **kw)
    assert len(os.listdir(cache)) == 1
    ds_traj = VideoClipDataset(task="traj", repr_abs_only=True, **kw)
    assert len(os.listdir(cache)) == 1  # shared entry, no rebuild
    assert ds_traj.task == "traj" and ds_traj.repr_abs_only is True
    assert ds_traj.traj_feat_dim == 13
    item = ds_traj[0]
    assert item["cond"].shape == (CLIP_LEN - 1, 13)
    assert "control_cond" in item
    assert "cond" not in ds_pose[0]


def test_video_disk_cache_keys_on_body_model(body, prox_tree, tmp_path):
    """A different body model must re-key the cache (FK outputs depend on it)."""
    import os

    from rohm_tpu.body import synthetic_model

    init_root, base_dir, logdir = prox_tree
    cache = str(tmp_path / "vcache3")
    kw = dict(
        dataset="prox", init_root=init_root, base_dir=base_dir,
        recording_name="MPH11_00034_01", task="traj", repr_abs_only=True,
        overlap_len=2, clip_len=CLIP_LEN, logdir=logdir, disk_cache_dir=cache,
    )
    VideoClipDataset(body_model=body, **kw)
    VideoClipDataset(body_model=synthetic_model(num_verts=48), **kw)
    assert len(os.listdir(cache)) == 2


def test_walk_fingerprint_ignores_cache_dirs(tmp_path):
    """A cache file written INSIDE a fingerprinted tree must not change the
    fingerprint (ADVICE r2: the sorted(os.walk()) variant materialized the
    walk before the prune, so a run's own cache write re-keyed run 2)."""
    import hashlib
    import os

    from rohm_tpu.data.amass import _walk_fingerprint

    root = tmp_path / "tree"
    (root / "sub").mkdir(parents=True)
    (root / "sub" / "a.npy").write_bytes(b"data")

    def fp():
        h = hashlib.sha1()
        _walk_fingerprint(h, str(root))
        return h.hexdigest()

    before = fp()
    (root / "_repr_cache").mkdir()
    (root / "_repr_cache" / "cache0.pkl").write_bytes(b"cached")
    (root / "sub" / "_stats_cache").mkdir()
    (root / "sub" / "_stats_cache" / "stats.pkl").write_bytes(b"s")
    assert fp() == before
    # but a real data change still re-keys
    (root / "sub" / "b.npy").write_bytes(b"more")
    assert fp() != before


def test_video_disk_cache_hits_when_cache_inside_base_dir(body, prox_tree):
    """test_prox_egobody puts disk_cache_dir inside dataset_root; run 2 must
    HIT run 1's cache entry rather than accumulate a new pickle per run."""
    import os

    init_root, base_dir, logdir = prox_tree
    cache = os.path.join(base_dir, "_repr_cache")
    kw = dict(
        body_model=body, dataset="prox", init_root=init_root, base_dir=base_dir,
        recording_name="MPH11_00034_01", task="traj", repr_abs_only=True,
        overlap_len=2, clip_len=CLIP_LEN, logdir=logdir, disk_cache_dir=cache,
    )
    VideoClipDataset(**kw)
    assert len(os.listdir(cache)) == 1
    VideoClipDataset(**kw)
    assert len(os.listdir(cache)) == 1


def test_model_fingerprint_stamps_unstamped_models():
    """The leaf-hash fallback writes its result onto the model (frozen
    dataclass) so a recycled id can never serve a stale hash (ADVICE r2)."""
    from rohm_tpu.body import synthetic_model
    from rohm_tpu.data.amass import model_fingerprint

    m = synthetic_model(num_verts=32)
    object.__setattr__(m, "fingerprint", None)  # simulate an unstamped model
    fp1 = model_fingerprint(m)
    assert m.fingerprint == fp1  # stamped back
    m2 = synthetic_model(num_verts=32)
    object.__setattr__(m2, "fingerprint", None)
    assert model_fingerprint(m2) == fp1  # content-identical -> same hash
    m3 = synthetic_model(num_verts=48)
    object.__setattr__(m3, "fingerprint", None)
    assert model_fingerprint(m3) != fp1
