"""PROX / EgoBody video clip dataset (L3).

Behavioral parity target: reference data_loaders/dataloader_video.py:11-498.
TPU-first redesign: per-frame init SMPL-X pkls are read host-side, then ALL
frames run through one batched JAX FK call (the reference calls the torch
smplx model once per frame); cv2 undistortion and pandas CSV plumbing stay on
the host; __getitem__ emits only fixed-shape float32 arrays.

Item dict (dataloader_video.py:421-498):
  motion_repr_noisy [T-1, 294] normalized   noisy_joints [T, 22, 3] (cano)
  noisy_joints_scene_coord [T, 22, 3]       transf_matrix [4, 4]
  focal_length [2] / camera_center [2]      keypoints_2d [T, 22, 3]
  mask_joint_vis [T, 22]                    mask_vec_vis [T-1, 294]
  cond / control_cond (traj task)           gt_joints_scene_coord (egobody)
"""

from __future__ import annotations

import glob
import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from rohm_tpu.body import SmplxModel, forward_joints
from rohm_tpu.data.clips import overlapping_windows
from rohm_tpu.reprs import (
    cano_seq_smplx,
    cano_seq_smplx_egobody,
    get_repr,
)
from rohm_tpu.reprs.canonicalize import update_global_rt
from rohm_tpu.reprs.schema import gather_traj_abs
from rohm_tpu.reprs.stats import load_stats
from rohm_tpu.train.masking import expand_joint_visibility

# per-scene floor heights (reference utils/other_utils.py:41-60)
PROX_FLOOR_HEIGHT = {
    "N0Sofa": -0.9843093165454873,
    "MPH1Library": -0.34579620031341207,
    "N3Library": -0.6736229583361132,
    "N3Office": -0.7772727989022952,
    "BasementSittingBooth": -0.767080139846674,
    "MPH8": -0.41432886722717904,
    "MPH11": -0.7169139211234009,
    "MPH16": -0.8408992040141058,
    "MPH112": -0.6419028605753081,
    "N0SittingBooth": -0.6677103008966809,
    "N3OpenArea": -1.0754909672969915,
    "Werkraum": -0.6777057869851316,
}
EGOBODY_FLOOR_HEIGHT = {  # y-up
    "seminar_g110": -1.660,
    "seminar_d78": -0.810,
    "seminar_j716": -0.8960,
    "seminar_g110_0315": -0.73,
    "seminar_d78_0318": -1.03,
    "seminar_g110_0415": -0.77,
}

# openpose BODY_25 index for each smpl joint (dataloader_video.py:50)
OPENPOSE_TO_SMPL = [8, 12, 9, 8, 13, 10, 8, 14, 11, 1, 20, 23, 1, 5, 2, 0, 5, 2, 6, 3, 7, 4][:22]

KEYPOINT_CONF_THRESH = 0.2
PROX_IMG_WIDTH = 1920


def _load_frame_params(pkl_path: str) -> dict:
    with open(pkl_path, "rb") as f:
        p = pickle.load(f)
    return {
        "global_orient": np.asarray(p["global_orient"], np.float64).reshape(-1)[:3],
        "transl": np.asarray(p["transl"], np.float64).reshape(-1)[:3],
        "betas": np.asarray(p["betas"], np.float64).reshape(-1)[:10],
        "body_pose": np.asarray(p["body_pose"], np.float64).reshape(-1)[:63],
    }


def _load_keypoints(path: str, body_idx: int, joints_num: int) -> np.ndarray:
    try:
        with open(path) as f:
            data = json.load(f)
        if not data["people"]:
            return np.zeros((joints_num, 3))
        kp = np.array(data["people"][body_idx]["pose_keypoints_2d"], np.float32).reshape(-1, 3)
        return kp[OPENPOSE_TO_SMPL][:joints_num]
    except (FileNotFoundError, KeyError, IndexError):
        return np.zeros((joints_num, 3))


def undistort_keypoints_prox(keypoints: np.ndarray, color_cam: dict) -> np.ndarray:
    """PROX keypoint undistortion with the flip/undistort/flip-back dance
    (dataloader_video.py:442-458); keypoints [T, 22, 3]."""
    import cv2

    kp = np.array(keypoints, np.float64)
    flipped = kp.copy()
    flipped[..., 0] = PROX_IMG_WIDTH - 1 - kp[..., 0]
    mtx = np.asarray(color_cam["camera_mtx"])
    pts = cv2.undistortPoints(
        src=flipped[..., :2].copy().reshape(-1, 1, 2),
        cameraMatrix=mtx,
        distCoeffs=np.asarray(color_cam["k"]),
        P=mtx,
    ).reshape(flipped.shape[0], -1, 2)
    out = flipped.copy()
    out[..., :2] = pts
    out[..., 0] = PROX_IMG_WIDTH - 1 - out[..., 0]
    return out


class VideoClipDataset:
    """Overlapping-window clip dataset over one PROX/EgoBody recording."""

    def __init__(
        self,
        body_model: SmplxModel,
        dataset: str = "prox",
        init_root: str = "",
        base_dir: str = "",
        recording_name: str = "",
        use_scene_floor_height: bool = False,
        repr_abs_only: bool = False,
        task: str = "traj",
        overlap_len: int = 2,
        clip_len: int = 150,
        joints_num: int = 22,
        logdir: str | None = None,
        gendered_models: dict | None = None,
        fk_chunk: int = 512,
        disk_cache_dir: str | None = None,
    ):
        assert dataset in ("prox", "egobody"), f"bad dataset {dataset}"
        assert task in ("traj", "pose")
        self.dataset = dataset
        self.body_model = body_model
        self.recording_name = recording_name
        self.clip_len = clip_len
        self.overlap_len = overlap_len
        self.task = task
        self.repr_abs_only = repr_abs_only
        self.joints_num = joints_num
        self.traj_feat_dim = 13 if repr_abs_only else 22
        self.pose_feat_dim = 272
        self.use_scene_floor_height = use_scene_floor_height
        self.gendered_models = gendered_models or {}
        self._fk_chunk = fk_chunk

        # optional on-disk cache of the built recording (FK + canonicalize +
        # encode over a tunneled TPU costs seconds-to-minutes per recording;
        # deterministic given the tree + config)
        cache_path = None
        if disk_cache_dir is not None:
            key = self._disk_cache_key(init_root, base_dir)
            cache_path = os.path.join(disk_cache_dir, f"video_{key}.pkl")
        # per-view / per-process config must never be clobbered by a cache
        # load (the key is deliberately view-independent so pose/traj views
        # share one entry) and never pinned into the pickle
        _UNCACHED = ("body_model", "gendered_models", "task", "repr_abs_only",
                     "traj_feat_dim", "pose_feat_dim", "_fk_chunk")
        if cache_path is not None and os.path.exists(cache_path):
            with open(cache_path, "rb") as f:
                state = pickle.load(f)
            self.__dict__.update({k: v for k, v in state.items() if k not in _UNCACHED})
        else:
            if dataset == "prox":
                self._read_prox(init_root, base_dir)
            else:
                self._read_egobody(init_root, base_dir)
            self._create_body_repr()
            if cache_path is not None:
                os.makedirs(disk_cache_dir, exist_ok=True)
                state = {
                    k: v for k, v in self.__dict__.items() if k not in _UNCACHED
                }
                tmp = cache_path + ".tmp"
                with open(tmp, "wb") as f:
                    pickle.dump(state, f, protocol=4)
                os.replace(tmp, cache_path)

        assert logdir is not None, "video datasets need the train-stats logdir"
        self.mean, self.std = load_stats(logdir)

    def _disk_cache_key(self, init_root: str, base_dir: str) -> str:
        """Fingerprint: config + body model(s) + listing (path/size/mtime) of
        every file under the init/base trees (cache dirs pruned so a cache
        stored under base_dir doesn't invalidate itself). View config (task /
        repr_abs_only) is deliberately NOT keyed — views share the entry."""
        import hashlib
        import json

        from rohm_tpu.data.amass import _walk_fingerprint, model_fingerprint

        h = hashlib.sha1()
        cfg = dict(dataset=self.dataset, recording=self.recording_name,
                   clip_len=self.clip_len, overlap_len=self.overlap_len,
                   joints_num=self.joints_num,
                   scene_floor=self.use_scene_floor_height,
                   model=model_fingerprint(self.body_model),
                   genders={g: model_fingerprint(m)
                            for g, m in sorted(self.gendered_models.items())})
        h.update(json.dumps(cfg, sort_keys=True).encode())
        for root in (init_root, base_dir):
            _walk_fingerprint(h, root)
        return h.hexdigest()[:16]

    # ------------------------------------------------------------------
    def _fk_world(self, params: dict, cam_r: np.ndarray, cam_t: np.ndarray, model=None):
        """Batched FK for all frames + rigid lift to world coords.

        Returns (joints_world [T, 22, 3], params_world dict)."""
        from rohm_tpu.data.amass import _fk_jit

        model = model if model is not None else self.body_model
        fk = _fk_jit(model, self.joints_num)
        n = len(params["transl"])
        outs = []
        for s in range(0, n, self._fk_chunk):
            outs.append(
                np.asarray(
                    fk(
                        jnp.asarray(params["betas"][s : s + self._fk_chunk]),
                        jnp.asarray(params["global_orient"][s : s + self._fk_chunk]),
                        jnp.asarray(params["body_pose"][s : s + self._fk_chunk]),
                        jnp.asarray(params["transl"][s : s + self._fk_chunk]),
                    )
                )
            )
        joints_cam = np.concatenate(outs).astype(np.float64)  # [T, 22, 3]
        joints_world = joints_cam @ cam_r.T + cam_t

        cam2world = np.eye(4)
        cam2world[:3, :3] = cam_r
        cam2world[:3, 3] = cam_t
        delta_t = joints_cam[:, 0] - params["transl"]
        params_world = update_global_rt(params, cam2world, delta_t)
        params_world["betas"] = params["betas"]
        params_world["body_pose"] = params["body_pose"]
        return joints_world, params_world

    def _read_prox(self, init_root: str, base_dir: str):
        fitting_dir = os.path.join(init_root, self.recording_name, "results")
        scene_name = self.recording_name.split("_")[0]
        self.scene_name = scene_name
        self.scene_floor_height = PROX_FLOOR_HEIGHT.get(scene_name)
        with open(os.path.join(base_dir, "cam2world", scene_name + ".json")) as f:
            cam2world = np.array(json.load(f))
        self.cam_r = cam2world[:3, :3]
        self.cam_t = cam2world[:3, 3]
        with open(os.path.join(base_dir, "calibration", "Color.json")) as f:
            self.color_cam = json.load(f)

        frame_names = sorted(os.listdir(fitting_dir))
        params = {k: [] for k in ("global_orient", "transl", "betas", "body_pose")}
        keypoints = []
        for name in frame_names:
            p = _load_frame_params(os.path.join(fitting_dir, name, "000.pkl"))
            for k in params:
                params[k].append(p[k])
            keypoints.append(
                _load_keypoints(
                    os.path.join(base_dir, "keypoints_openpose", self.recording_name,
                                 name + "_keypoints.json"),
                    0, self.joints_num,
                )
            )
        params = {k: np.stack(v) for k, v in params.items()}
        joints_world, params_world = self._fk_world(params, self.cam_r, self.cam_t)
        keypoints = np.stack(keypoints)
        joint_mask = np.load(
            os.path.join(base_dir, "mask_joint", self.recording_name, "mask_joint.npy")
        )[:, : self.joints_num]

        self._cut_windows(frame_names, joints_world, params_world, keypoints, joint_mask)

    def _read_egobody(self, init_root: str, base_dir: str):
        import pandas as pd

        df = pd.read_csv(os.path.join(base_dir, "egobody_rohm_info.csv"))
        row = df[df["recording_name"] == self.recording_name].iloc[0]
        self.kinect_view = row["view"]  # NOT `self.view` — that would shadow the view() method
        self.body_idx = int(row["target_idx"])
        self.scene_name = row["scene_name"]
        self.gender_gt = row["target_gender"]
        interactee_idx = int(str(row["body_idx_fpv"]).split(" ")[0])
        self.scene_floor_height = EGOBODY_FLOOR_HEIGHT.get(self.scene_name)

        splits = pd.read_csv(os.path.join(base_dir, "data_splits.csv"))
        split = None
        for s in ("train", "val", "test"):
            if self.recording_name in list(splits[s]):
                split = s
        assert split is not None, f"{self.recording_name} not in any split"
        role = "interactee" if self.body_idx == interactee_idx else "camera_wearer"
        fitting_gt_root = os.path.join(
            base_dir, f"smplx_{role}_{split}", self.recording_name, f"body_idx_{self.body_idx}"
        )

        calib_dir = os.path.join(base_dir, "calibrations", self.recording_name)
        with open(os.path.join(calib_dir, "cal_trans", "kinect12_to_world",
                               self.scene_name + ".json")) as f:
            master2world = np.asarray(json.load(f)["trans"])
        if self.kinect_view != "master":
            sub_kinect = {"sub_1": 11, "sub_2": 13, "sub_3": 14, "sub_4": 15}[self.kinect_view]
            with open(os.path.join(calib_dir, "cal_trans",
                                   f"kinect_{sub_kinect}to12_color.json")) as f:
                sub2master = np.asarray(json.load(f)["trans"])
            cam2world = master2world @ sub2master
        else:
            cam2world = master2world
        self.cam_r = cam2world[:3, :3]
        self.cam_t = cam2world[:3, 3]
        with open(os.path.join(base_dir, "kinect_cam_params", f"kinect_{self.kinect_view}",
                               "Color.json")) as f:
            self.color_cam = json.load(f)

        fitting_dir = os.path.join(
            init_root, self.recording_name, f"body_idx_{self.body_idx}", "results"
        )
        frame_names = sorted(os.listdir(fitting_dir))
        params = {k: [] for k in ("global_orient", "transl", "betas", "body_pose")}
        params_gt = {k: [] for k in ("global_orient", "transl", "betas", "body_pose")}
        keypoints = []
        for name in frame_names:
            p = _load_frame_params(os.path.join(fitting_dir, name, "000.pkl"))
            pg = _load_frame_params(os.path.join(fitting_gt_root, "results", name, "000.pkl"))
            for k in params:
                params[k].append(p[k])
                params_gt[k].append(pg[k])
            keypoints.append(
                _load_keypoints(
                    os.path.join(base_dir, "keypoints_cleaned", self.recording_name,
                                 self.kinect_view, name + "_keypoints.json"),
                    self.body_idx, self.joints_num,
                )
            )
        params = {k: np.stack(v) for k, v in params.items()}
        params_gt = {k: np.stack(v) for k, v in params_gt.items()}
        joints_world, params_world = self._fk_world(params, self.cam_r, self.cam_t)
        # GT body uses the gendered model and lives in the MASTER kinect frame
        gt_model = self.gendered_models.get(self.gender_gt, self.body_model)
        joints_world_gt, _ = self._fk_world(
            params_gt, master2world[:3, :3], master2world[:3, 3], model=gt_model
        )
        keypoints = np.stack(keypoints)
        joint_mask = np.load(
            os.path.join(base_dir, "mask_joint", self.recording_name, self.kinect_view, "mask_joint.npy")
        )[:, : self.joints_num]

        self._cut_windows(
            frame_names, joints_world, params_world, keypoints, joint_mask, joints_world_gt
        )

    def _cut_windows(self, frame_names, joints_world, params_world, keypoints,
                     joint_mask, joints_world_gt=None):
        spans = overlapping_windows(len(joints_world), self.clip_len, self.overlap_len)
        self.frame_name_list = [frame_names[s:e] for s, e in spans]
        self.joints_clip_world = np.stack([joints_world[s:e] for s, e in spans]) if spans else np.zeros((0, self.clip_len, 22, 3))
        self.params_clip_world = [
            {k: params_world[k][s:e] for k in params_world} for s, e in spans
        ]
        self.keypoints_clips = np.stack([keypoints[s:e] for s, e in spans]) if spans else np.zeros((0, self.clip_len, 22, 3))
        self.joint_mask_clips = np.stack([joint_mask[s:e] for s, e in spans]) if spans else np.zeros((0, self.clip_len, 22))
        if joints_world_gt is not None:
            self.joints_clip_world_gt = np.stack([joints_world_gt[s:e] for s, e in spans])
        else:
            self.joints_clip_world_gt = None
        self.n_samples = len(spans)

    # ------------------------------------------------------------------
    def _create_body_repr(self):
        cano_fn = cano_seq_smplx if self.dataset == "prox" else cano_seq_smplx_egobody
        floor = self.scene_floor_height if self.use_scene_floor_height else None
        cano_pos, cano_params_list, transf_list = [], [], []
        for i in range(self.n_samples):
            pos, cp, tf = cano_fn(
                self.joints_clip_world[i], self.params_clip_world[i],
                preset_floor_height=floor, return_transf_mat=True,
            )
            cano_pos.append(pos)
            cano_params_list.append(cp)
            transf_list.append(tf)
        self.cano_joints = np.stack(cano_pos) if cano_pos else np.zeros((0, self.clip_len, 22, 3))
        self.cano_params_list = cano_params_list
        self.transf_matrix = np.stack(transf_list) if transf_list else np.zeros((0, 4, 4))

        if self.n_samples:
            from rohm_tpu.data.amass import _enc_jit

            params = {
                k: np.stack([cp[k].reshape(self.clip_len, -1) for cp in cano_params_list])
                for k in ("global_orient", "transl", "body_pose", "betas")
            }
            enc = _enc_jit()
            self.repr_input = np.asarray(
                enc(
                    jnp.asarray(self.cano_joints), jnp.asarray(params["global_orient"]),
                    jnp.asarray(params["transl"]), jnp.asarray(params["body_pose"]),
                    jnp.asarray(params["betas"]),
                )
            ).astype(np.float32)
        else:
            self.repr_input = np.zeros((0, self.clip_len - 1, 294), np.float32)

    # ------------------------------------------------------------------
    def view(self, task: str, repr_abs_only: bool | None = None) -> "VideoClipDataset":
        """Second task view sharing the same preprocessed recording arrays."""
        assert task in ("traj", "pose")
        import copy

        v = copy.copy(self)
        v.task = task
        if repr_abs_only is not None:
            v.repr_abs_only = repr_abs_only
            v.traj_feat_dim = 13 if repr_abs_only else 22
        return v

    def __len__(self):
        return self.n_samples

    def __getitem__(self, index: int) -> dict:
        item = {}
        noisy = ((self.repr_input[index] - self.mean) / self.std).astype(np.float32)
        item["motion_repr_noisy"] = noisy
        item["noisy_joints"] = self.cano_joints[index].astype(np.float32)
        item["noisy_joints_scene_coord"] = self.joints_clip_world[index].astype(np.float32)
        if self.joints_clip_world_gt is not None:
            item["gt_joints_scene_coord"] = self.joints_clip_world_gt[index].astype(np.float32)
        item["transf_matrix"] = self.transf_matrix[index].astype(np.float32)
        item["cano_smplx_params_dict"] = {
            k: np.asarray(v, np.float32).reshape(self.clip_len, -1)
            for k, v in self.cano_params_list[index].items()
        }
        item["frame_name"] = self.frame_name_list[index]
        item["focal_length"] = np.asarray(
            [self.color_cam["f"][0], self.color_cam["f"][1]], np.float32
        )
        item["camera_center"] = np.asarray(
            [self.color_cam["c"][0], self.color_cam["c"][1]], np.float32
        )

        kp = self.keypoints_clips[index]
        if self.dataset == "prox":
            item["keypoints_2d"] = undistort_keypoints_prox(kp, self.color_cam).astype(np.float32)
        else:
            item["keypoints_2d"] = kp.astype(np.float32)

        conf_vis = (kp[:, :, -1] > KEYPOINT_CONF_THRESH).astype(np.float32)
        mask_joint_vis = conf_vis * self.joint_mask_clips[index]
        item["mask_joint_vis"] = mask_joint_vis.astype(np.float32)
        item["mask_vec_vis"] = expand_joint_visibility(mask_joint_vis).astype(np.float32)

        if self.task == "traj":
            if self.repr_abs_only:
                item["cond"] = gather_traj_abs(noisy)
            else:
                item["cond"] = noisy[:, : self.traj_feat_dim]
            item["control_cond"] = noisy[:, -self.pose_feat_dim :]
        return item

    def batches(self, batch_size: int, shuffle: bool = False, seed: int = 0,
                drop_last: bool = False, pad_last=False, pad_multiple: int = 1):
        from rohm_tpu.data.clips import pad_tail_size

        order = np.arange(self.n_samples)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        if pad_last:
            drop_last = False  # padding a dropped tail is contradictory
        stop = self.n_samples - (self.n_samples % batch_size if drop_last else 0)
        skip_keys = {"cano_smplx_params_dict", "frame_name"}
        for s in range(0, stop, batch_size):
            idx = order[s : s + batch_size]
            valid = len(idx)
            if pad_last and valid < batch_size:
                pad_to = pad_tail_size(valid, batch_size, pad_last, pad_multiple)
                idx = np.concatenate([idx, np.full(pad_to - valid, idx[-1])])
            items = [self[int(i)] for i in idx]
            out = {
                k: np.stack([it[k] for it in items])
                for k in items[0]
                if k not in skip_keys
            }
            out["cano_smplx_params_dict"] = [it["cano_smplx_params_dict"] for it in items]
            out["frame_name"] = [it["frame_name"] for it in items]
            if pad_last:
                out["_valid"] = valid
            yield out
