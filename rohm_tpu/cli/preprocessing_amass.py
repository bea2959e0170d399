"""preprocessing_amass — raw AMASS npz -> per-sequence joints/params npys.

CLI parity with reference preprocessing_amass.py:16-155: 30 fps downsampling
(SSM special-cased at 60->30), SMPL-X forward for 25 joints, outputs
pose_data_fps_30/<dataset>/<seq>/<name>.npy ([T, 25, 3]) and
smpl_data_fps_30/... ([T, 178]: 3 global_orient + 3 transl + 10 betas +
63 body_pose + 90 hands + 9 jaw/eyes). The FK runs as one batched JAX call
per sequence instead of the reference's per-frame torch loop.
"""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from rohm_tpu.body import forward_joints
from rohm_tpu.cli.common import resolve_body_model
from rohm_tpu.utils import ConfigParser

# ice-skating/treadmill sequences excluded from training (reference :129-134)
BLACKLIST_KEYWORDS = ["ice_skating", "icestaking", "treadmill"]


def build_parser() -> ConfigParser:
    p = ConfigParser("RoHM-TPU AMASS preprocessing")
    p.add_argument("--amass_root", type=str, default="datasets/AMASS_smplx_raw")
    p.add_argument("--out_root", type=str, default="datasets/AMASS_smplx_preprocessed")
    p.add_argument("--body_model_path", type=str, default="data/body_models/smplx_model")
    p.add_argument("--datasets", type=str, default="", help="comma-separated subset names ('' = all)")
    p.add_argument("--target_fps", type=int, default=30)
    return p


def amass_to_pose(npz_path: str, body, target_fps: int = 30, dataset_name: str = ""):
    """One sequence: returns (joints [T, 25, 3], params [T, 178]) or None."""
    try:
        with np.load(npz_path, allow_pickle=True) as data:
            fps = float(data.get("mocap_frame_rate", data.get("mocap_framerate", 0)))
            if fps == 0:
                return None
            trans = np.asarray(data["trans"], np.float64)
            betas = np.asarray(data["betas"], np.float64)[:10]
            if "root_orient" in data:
                # SMPL-X AMASS release format (the one the reference reads:
                # root_orient/pose_body/pose_hand/pose_jaw/pose_eye)
                global_orient = np.asarray(data["root_orient"], np.float64)
                body_pose = np.asarray(data["pose_body"], np.float64)
                hands = np.asarray(data["pose_hand"], np.float64)
                jaw = np.asarray(data["pose_jaw"], np.float64)
                eye = np.asarray(data["pose_eye"], np.float64)
                jaw_eyes = np.concatenate([jaw, eye[:, 0:3], eye[:, 0:3]], axis=-1)
            else:
                # flat 'poses' [T, 165] layout (go, body, jaw, eyes, hands)
                poses = np.asarray(data["poses"], np.float64)
                global_orient = poses[:, 0:3]
                body_pose = poses[:, 3:66]
                jaw_eyes = poses[:, 66:75]
                hands = poses[:, 75:165]
    except Exception:
        return None

    if dataset_name == "SSM":
        # SSM is 60 fps despite metadata (reference :31-37)
        fps = 60.0
    stride = max(int(round(fps / target_fps)), 1)
    sl = slice(None, None, stride)
    global_orient, body_pose = global_orient[sl], body_pose[sl]
    hands, jaw_eyes, trans = hands[sl], jaw_eyes[sl], trans[sl]
    t = len(trans)
    if t < 2:
        return None

    betas_t = np.tile(betas[None], (t, 1))

    joints = np.asarray(
        forward_joints(
            body,
            jnp.asarray(betas_t, jnp.float32),
            jnp.asarray(global_orient, jnp.float32),
            jnp.asarray(body_pose, jnp.float32),
            jnp.asarray(trans, jnp.float32),
            num_joints=25,
        )
    )

    params = np.zeros((t, 178))
    params[:, 0:3] = global_orient
    params[:, 3:6] = trans
    params[:, 6:16] = betas_t
    params[:, 16:79] = body_pose
    params[:, 79:169] = hands
    params[:, 169:178] = jaw_eyes
    return joints, params


def main(argv=None):
    args = build_parser().parse_args(argv)
    body = resolve_body_model(args.body_model_path)
    datasets = (
        [d for d in args.datasets.split(",") if d]
        or sorted(os.listdir(args.amass_root))
    )
    n_done = 0
    for dataset_name in datasets:
        seq_files = sorted(
            glob.glob(os.path.join(args.amass_root, dataset_name, "*/*.npz"))
        )
        for path in seq_files:
            low = path.lower()
            if any(k in low for k in BLACKLIST_KEYWORDS):
                continue
            out = amass_to_pose(path, body, args.target_fps, dataset_name)
            if out is None:
                continue
            joints, params = out
            seq_name = os.path.basename(os.path.dirname(path))
            npy_name = os.path.basename(path).replace(".npz", ".npy")
            jdir = os.path.join(args.out_root, "pose_data_fps_30", dataset_name, seq_name)
            pdir = os.path.join(args.out_root, "smpl_data_fps_30", dataset_name, seq_name)
            os.makedirs(jdir, exist_ok=True)
            os.makedirs(pdir, exist_ok=True)
            np.save(os.path.join(jdir, npy_name), joints)
            np.save(os.path.join(pdir, npy_name), params)
            n_done += 1
    print(f"preprocessed {n_done} sequences -> {args.out_root}")


if __name__ == "__main__":
    main()
