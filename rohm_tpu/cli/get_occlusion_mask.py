"""get_occlusion_mask — standalone tool: depth-test joint visibility masks.

Parity with reference utils/get_occlusion_mask.py:49-180: render PROX scene
depth and per-frame body depth with pyrender, project the 25 body joints with
the distorted PROX color camera, and mark a joint occluded when the body
depth at its pixel exceeds the scene depth by >0.1 m. Writes mask_joint.npy
([T, 25], 1 = visible). The SMPL-X forward runs through the pure-JAX body
model; pyrender/trimesh are required at runtime.
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np

from rohm_tpu.body import forward_vertices
from rohm_tpu.cli.common import resolve_body_model
from rohm_tpu.utils import ConfigParser

DEPTH_THRESH = 0.1
IMG_W, IMG_H = 1920, 1080


def build_parser() -> ConfigParser:
    p = ConfigParser("RoHM-TPU occlusion mask tool")
    p.add_argument("--prox_root", type=str, default="datasets/PROX")
    p.add_argument("--init_body_path", type=str, default="data/init_motions/init_prox_rgb")
    p.add_argument("--body_model_path", type=str, default="data/body_models/smplx_model")
    p.add_argument("--seq_name", type=str, default="MPH11_00034_01")
    p.add_argument("--scene_name", type=str, default="MPH11")
    p.add_argument("--save_mask_path", type=str, default="datasets/PROX/mask_joint")
    p.add_argument("--max_frames", type=int, default=0)
    return p


def project_points_distorted(points: np.ndarray, color_cam: dict) -> np.ndarray:
    """Project camera-coord points with the full PROX distortion model
    (reference utils/get_occlusion_mask.py projectPoints / other_utils)."""
    import cv2

    rvec = np.zeros(3)
    tvec = np.zeros(3)
    mtx = np.asarray(color_cam["camera_mtx"])
    dist = np.asarray(color_cam["k"])
    proj, _ = cv2.projectPoints(points.reshape(-1, 1, 3), rvec, tvec, mtx, dist)
    return proj.reshape(-1, 2)


def main(argv=None):
    import pyrender
    import trimesh

    args = build_parser().parse_args(argv)
    body = resolve_body_model(args.body_model_path)

    with open(os.path.join(args.prox_root, "cam2world", args.scene_name + ".json")) as f:
        cam2world = np.array(json.load(f))
    with open(os.path.join(args.prox_root, "calibration", "Color.json")) as f:
        color_cam = json.load(f)

    camera = pyrender.camera.IntrinsicsCamera(fx=1060.53, fy=1060.38, cx=951.30, cy=536.77)
    camera_pose = np.eye(4) * np.array([1.0, -1.0, -1.0, 1.0]).reshape(-1, 1)
    light = pyrender.DirectionalLight(color=np.ones(3), intensity=2.0)

    static_scene = trimesh.load(
        os.path.join(args.prox_root, "scenes", args.scene_name + ".ply")
    )
    static_scene.apply_transform(np.linalg.inv(cam2world))
    scene_mesh = pyrender.Mesh.from_trimesh(static_scene)

    def render_depth(mesh):
        scene = pyrender.Scene()
        scene.add(camera, pose=camera_pose)
        scene.add(light, pose=camera_pose)
        scene.add(mesh, "mesh")
        r = pyrender.OffscreenRenderer(viewport_width=IMG_W, viewport_height=IMG_H)
        _, depth = r.render(scene)
        r.delete()
        return depth

    depth_scene = render_depth(scene_mesh)

    import jax.numpy as jnp

    results_dir = os.path.join(args.init_body_path, args.seq_name, "results")
    frames = sorted(os.listdir(results_dir))
    if args.max_frames:
        frames = frames[: args.max_frames]
    seq_mask = []
    faces = getattr(body, "faces", None)
    for frame in frames:
        with open(os.path.join(results_dir, frame, "000.pkl"), "rb") as f:
            p = pickle.load(f)
        verts, joints = forward_vertices(
            body,
            jnp.asarray(np.asarray(p["betas"]).reshape(1, -1)[:, :10], jnp.float32),
            jnp.asarray(np.asarray(p["global_orient"]).reshape(1, 3), jnp.float32),
            jnp.asarray(np.asarray(p["body_pose"]).reshape(1, -1)[:, :63], jnp.float32),
            jnp.asarray(np.asarray(p["transl"]).reshape(1, 3), jnp.float32),
        )
        verts = np.asarray(verts)[0]
        joints = np.asarray(joints)[0][:25]
        if faces is None:
            # body model without a face table: convex hull as depth proxy
            body_tm = trimesh.Trimesh(verts, process=False).convex_hull
        else:
            body_tm = trimesh.Trimesh(verts, faces, process=False)
        depth_body = render_depth(pyrender.Mesh.from_trimesh(body_tm))

        uv = project_points_distorted(joints, color_cam).astype(int)
        mask = np.ones(25)
        for j in range(25):
            x, y = uv[j]
            if 0 <= x < IMG_W and 0 <= y < IMG_H:
                if depth_scene[y][x] != 0 and depth_body[y][x] - depth_scene[y][x] > DEPTH_THRESH:
                    mask[j] = 0
        seq_mask.append(mask)

    out_dir = os.path.join(args.save_mask_path, args.seq_name)
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "mask_joint.npy"), np.asarray(seq_mask))
    print(f"saved {len(seq_mask)}-frame mask to {out_dir}/mask_joint.npy")


if __name__ == "__main__":
    main()
