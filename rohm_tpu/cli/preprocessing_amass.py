"""preprocessing_amass — raw AMASS npz -> per-sequence joints/params npys.

CLI parity with reference preprocessing_amass.py:16-155: 30 fps downsampling
(SSM special-cased: 59.99->stride 2, 120.00->stride 4; all other datasets
rejected unless fps is an exact integer multiple of 30), the reference's
exact skip rules (neutral_stagei / HDM05 inline skating / BMLrub
treadmill+normal), SMPL-X forward for 25 joints, outputs
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

def should_skip_recording(dataset_name: str, recording_name: str) -> bool:
    """Exact reference skip rules (preprocessing_amass.py:120-134):
    SMPL-X staging artifacts, HDM05 inline-skating clips (named by code
    HDM_dg_07-01*), and BMLrub treadmill/normal (walking-in-place) clips."""
    if recording_name == "neutral_stagei":
        return True
    if dataset_name == "HDM05" and recording_name[0:12] == "HDM_dg_07-01":
        return True
    if dataset_name == "BMLrub":
        parts = recording_name.split("_")
        if len(parts) > 1 and parts[1] in ("treadmill", "normal"):
            return True
    return False


def downsample_stride(dataset_name: str, fps: float, target_fps: int = 30):
    """Frame stride for downsampling to target_fps, or None to reject.

    Reference preprocessing_amass.py:31-40: SSM's metadata fps is 59.99xx or
    120.00xx, special-cased to stride 2/4; every other dataset must have an
    fps that is an exact integer multiple of 30 or the sequence is skipped.
    """
    if dataset_name == "SSM":
        # SSM's fractional metadata fps only maps onto the 30-fps pipeline;
        # the reference hardcodes these strides (preprocessing_amass.py:31-37)
        if target_fps != 30:
            return None
        return 2 if fps - 60 < 1 else 4
    stride = int(fps / target_fps)
    if stride != fps / target_fps:
        return None
    return stride


def build_parser() -> ConfigParser:
    p = ConfigParser("RoHM-TPU AMASS preprocessing")
    p.add_argument("--amass_root", type=str, default="datasets/AMASS_smplx_raw")
    # reference flag names (preprocessing_amass.py:148-153) + round-1 aliases
    p.add_argument(
        "--save_root", "--out_root", type=str,
        default="datasets/AMASS_smplx_preprocessed",
    )
    p.add_argument("--body_model_path", type=str, default="data/body_models/smplx_model")
    p.add_argument(
        "--dataset_name", "--datasets", type=str, default="",
        help="subset name, or comma-separated list ('' = all)",
    )
    p.add_argument("--target_fps", type=int, default=30)
    return p


def amass_to_pose(npz_path: str, body, target_fps: int = 30, dataset_name: str = ""):
    """One sequence: returns (joints [T, 25, 3], params [T, 178]) or None."""
    try:
        with np.load(npz_path, allow_pickle=True) as data:
            fps = float(data.get("mocap_frame_rate", data.get("mocap_framerate", 0)))
            if fps == 0:
                return None
            # reference :22-28: neutral smplx sequences only
            if "gender" in data and str(data["gender"]) != "neutral":
                return None
            if (
                "surface_model_type" in data
                and str(data["surface_model_type"]) != "smplx"
            ):
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

    stride = downsample_stride(dataset_name, fps, target_fps)
    if stride is None:
        return None
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
        [d for d in args.dataset_name.split(",") if d]
        or sorted(os.listdir(args.amass_root))
    )
    n_done = 0
    for dataset_name in datasets:
        seq_files = sorted(
            glob.glob(os.path.join(args.amass_root, dataset_name, "*/*.npz"))
        )
        for path in seq_files:
            recording_name = os.path.basename(path)[:-4]
            if should_skip_recording(dataset_name, recording_name):
                continue
            out = amass_to_pose(path, body, args.target_fps, dataset_name)
            if out is None:
                continue
            joints, params = out
            seq_name = os.path.basename(os.path.dirname(path))
            npy_name = recording_name + ".npy"
            # output tree name carries the actual fps: downstream loaders
            # locate data by "pose_data_fps_30", so a non-30 target must not
            # silently masquerade as 30-fps data
            jdir = os.path.join(args.save_root, f"pose_data_fps_{args.target_fps}", dataset_name, seq_name)
            pdir = os.path.join(args.save_root, f"smpl_data_fps_{args.target_fps}", dataset_name, seq_name)
            os.makedirs(jdir, exist_ok=True)
            os.makedirs(pdir, exist_ok=True)
            np.save(os.path.join(jdir, npy_name), joints)
            np.save(os.path.join(pdir, npy_name), params)
            n_done += 1
    print(f"preprocessed {n_done} sequences -> {args.save_root}")


if __name__ == "__main__":
    main()
