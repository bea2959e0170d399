"""Oracle test for the occlusion-mask tool (reference utils/get_occlusion_mask.py).

pyrender/trimesh are absent from this environment, so they are replaced with
minimal fakes whose OffscreenRenderer returns HAND-CONSTRUCTED depth maps.
The depth-test rule under test (reference :137-143): a joint is occluded
(mask 0) iff its pixel has scene depth != 0 AND body depth exceeds scene
depth by > 0.1 m; out-of-image joints and zero-scene-depth pixels stay
visible."""

import json
import os
import pickle
import sys
import types

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from rohm_tpu.body import synthetic_model  # noqa: E402
from rohm_tpu.cli import get_occlusion_mask as tool  # noqa: E402

W, H = tool.IMG_W, tool.IMG_H


class _FakeDepthRenderer:
    """Returns depth maps from a queue: first render = scene, then one per
    frame body render (matching main()'s render order)."""

    queue: list = []

    def __init__(self, viewport_width, viewport_height):
        assert (viewport_width, viewport_height) == (W, H)

    def render(self, scene):
        return None, _FakeDepthRenderer.queue.pop(0)

    def delete(self):
        pass


def _fake_modules(monkeypatch):
    pyrender = types.ModuleType("pyrender")
    pyrender.camera = types.SimpleNamespace(
        IntrinsicsCamera=lambda **kw: ("camera", kw)
    )
    pyrender.DirectionalLight = lambda **kw: ("light", kw)

    class Scene:
        def __init__(self):
            self.nodes = []

        def add(self, obj, name=None, pose=None):
            self.nodes.append(obj)

    pyrender.Scene = Scene
    pyrender.Mesh = types.SimpleNamespace(from_trimesh=lambda tm: ("mesh", tm))
    pyrender.OffscreenRenderer = _FakeDepthRenderer

    trimesh = types.ModuleType("trimesh")

    class FakeTrimesh:
        def __init__(self, verts=None, faces=None, process=False):
            self.vertices = verts
            self.transform = None

        @property
        def convex_hull(self):
            return self

        def apply_transform(self, m):
            self.transform = m

    trimesh.Trimesh = FakeTrimesh
    trimesh.load = lambda path: FakeTrimesh()

    monkeypatch.setitem(sys.modules, "pyrender", pyrender)
    monkeypatch.setitem(sys.modules, "trimesh", trimesh)


def test_depth_rule_and_output(tmp_path, monkeypatch):
    _fake_modules(monkeypatch)
    body = synthetic_model(num_verts=32)
    monkeypatch.setattr(
        "rohm_tpu.cli.common.resolve_body_model", lambda p: body
    )
    monkeypatch.setattr(tool, "resolve_body_model", lambda p: body)

    prox_root = tmp_path / "PROX"
    (prox_root / "cam2world").mkdir(parents=True)
    (prox_root / "calibration").mkdir()
    (prox_root / "scenes").mkdir()
    with open(prox_root / "cam2world" / "MPH11.json", "w") as f:
        json.dump(np.eye(4).tolist(), f)
    # distortion-free PROX color camera
    color_cam = {
        "camera_mtx": [[1060.53, 0, 951.30], [0, 1060.38, 536.77], [0, 0, 1]],
        "k": [0.0, 0.0, 0.0, 0.0, 0.0],
    }
    with open(prox_root / "calibration" / "Color.json", "w") as f:
        json.dump(color_cam, f)
    (prox_root / "scenes" / "MPH11.ply").touch()

    # one frame of init-body params
    init_dir = tmp_path / "init" / "seq" / "results" / "frame_0001"
    init_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    params = {
        "betas": rng.normal(size=(1, 10)) * 0.1,
        "global_orient": np.zeros((1, 3)),
        "body_pose": np.zeros((1, 63)),
        "transl": np.array([[0.0, 0.0, 2.5]]),  # in front of the camera
    }
    with open(init_dir / "000.pkl", "wb") as f:
        pickle.dump(params, f)

    # find where the 25 joints project, to hand-craft the depth maps
    import jax.numpy as jnp

    from rohm_tpu.body import forward_vertices

    _, joints = forward_vertices(
        body,
        jnp.asarray(params["betas"][:, :10], jnp.float32),
        jnp.asarray(params["global_orient"], jnp.float32),
        jnp.asarray(params["body_pose"], jnp.float32),
        jnp.asarray(params["transl"], jnp.float32),
    )
    joints = np.asarray(joints)[0][:25]
    uv = tool.project_points_distorted(joints, color_cam).astype(int)
    in_img = (uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0) & (uv[:, 1] < H)
    assert in_img.sum() >= 10, "test body must project mostly in-image"

    # scene depth 5.0 everywhere; body depth:
    #   joint 0 pixel -> 5.2 (0.2 beyond scene: OCCLUDED)
    #   joint 1 pixel -> 5.05 (within the 0.1 threshold: visible)
    #   joint 2 pixel -> scene depth 0 there (no scene geometry: visible)
    #   all other pixels -> 4.0 (in front of scene: visible)
    vis_idx = np.flatnonzero(in_img)
    j_occ, j_near, j_hole = vis_idx[0], vis_idx[1], vis_idx[2]
    depth_scene = np.full((H, W), 5.0)
    x, y = uv[j_hole]
    depth_scene[y, x] = 0.0
    depth_body = np.full((H, W), 4.0)
    x, y = uv[j_occ]
    depth_body[y, x] = 5.2
    x, y = uv[j_near]
    depth_body[y, x] = 5.05
    _FakeDepthRenderer.queue = [depth_scene, depth_body]

    tool.main([
        f"--prox_root={prox_root}",
        f"--init_body_path={tmp_path / 'init'}",
        "--seq_name=seq",
        "--scene_name=MPH11",
        f"--save_mask_path={tmp_path / 'masks'}",
    ])

    mask = np.load(tmp_path / "masks" / "seq" / "mask_joint.npy")
    assert mask.shape == (1, 25)
    assert mask[0, j_occ] == 0, "joint 0.2 m behind scene depth must be occluded"
    assert mask[0, j_near] == 1, "0.05 m is inside the 0.1 m threshold"
    assert mask[0, j_hole] == 1, "zero scene depth means no occluder"
    others = np.setdiff1d(np.arange(25), [j_occ])
    assert mask[0, others].all(), "everything else visible"


def test_distorted_projection_matches_pinhole_when_k_zero():
    """project_points_distorted with zero distortion must equal the pinhole
    projection (oracle for the cv2.projectPoints plumbing)."""
    color_cam = {
        "camera_mtx": [[1000.0, 0, 960.0], [0, 1000.0, 540.0], [0, 0, 1]],
        "k": [0.0] * 5,
    }
    pts = np.array([[0.1, -0.2, 2.0], [-0.3, 0.4, 3.0]])
    uv = tool.project_points_distorted(pts, color_cam)
    expect = pts[:, :2] / pts[:, 2:] * 1000.0 + np.array([960.0, 540.0])
    np.testing.assert_allclose(uv, expect, atol=1e-6)
