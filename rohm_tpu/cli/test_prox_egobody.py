"""test_prox_egobody — full RoHM pipeline on video data (PROX / EgoBody).

CLI parity with reference test_prox_egobody.py:20-73; result pickles match
:356-393 (per-recording, with scene<->cano transforms). Guidance is the 'prox'
stack: 2-D keypoint reprojection + foot skating, both through the SMPL-X body,
computed as jax.grad inside the fused sampling scan.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from rohm_tpu.cli.common import (
    build_posenet,
    build_trajnet,
    init_posenet_params,
    init_trajnet_params,
    load_or_init,
    maybe_via_server,
    resolve_body_model,
)
from rohm_tpu.data.video import VideoClipDataset
from rohm_tpu.diffusion import make_schedule
from rohm_tpu.pipeline import RohmPipeline
from rohm_tpu.reprs import recover_from_repr, split_repr
from rohm_tpu.reprs.schema import REPR_DIM_DICT, REPR_LIST
from rohm_tpu.utils import ConfigParser
from rohm_tpu.utils.config import fused_mode


def build_parser() -> ConfigParser:
    p = ConfigParser("RoHM-TPU PROX/EgoBody test")
    p.add_argument("--device", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--diffusion_steps_posenet", type=int, default=1000)
    p.add_argument("--diffusion_steps_trajnet", type=int, default=100)
    p.add_argument("--noise_schedule", type=str, default="cosine")
    p.add_argument("--timestep_respacing_eval", type=str, default="")
    p.add_argument("--sigma_small", type=bool, default=True)
    p.add_argument("--body_model_path", type=str, default="data/body_models/smplx_model")
    p.add_argument("--dataset", type=str, default="egobody")
    p.add_argument("--dataset_root", type=str, default="")
    p.add_argument("--init_root", type=str, default="data/init_motions/init_prox_rgb")
    p.add_argument("--clip_len", type=int, default=145)
    p.add_argument("--repr_abs_only", type=bool, default=True)
    p.add_argument("--model_path_trajnet", type=str, default="")
    p.add_argument("--model_path_trajnet_control", type=str, default="")
    p.add_argument("--model_path_posenet", type=str, default="")
    p.add_argument("--batch_size", type=int, default=20)
    p.add_argument("--cond_fn_with_grad", type=bool, default=True)
    p.add_argument("--save_root", type=str, default="test_results/results_egobody")
    p.add_argument("--sample_iter", type=int, default=2)
    p.add_argument("--iter2_cond_noisy_traj", type=bool, default=False)
    p.add_argument("--iter2_cond_noisy_pose", type=bool, default=False)
    p.add_argument("--early_stop", type=bool, default=True)
    p.add_argument("--window_size", type=int, default=2)
    p.add_argument("--recording_name", type=str, default="recording_20211004_S12_S20_01")
    p.add_argument("--use_scene_floor_height", type=bool, default=True)
    # TPU-build extensions
    p.add_argument("--mid_dim", type=int, default=512)
    p.add_argument("--latent_dim", type=int, default=512)
    p.add_argument("--max_batches", type=int, default=0)
    p.add_argument("--fused_posenet", type=fused_mode, default=False)
    p.add_argument("--data_parallel", type=bool, default=False)
    p.add_argument("--allow_missing_ckpt", type=bool, default=False)
    p.add_argument("--via_server", type=bool, default=False)
    return p


def main(argv=None):
    from rohm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    handled, result = maybe_via_server("test_prox_egobody", args, argv)
    if handled:
        return result
    body = resolve_body_model(args.body_model_path)

    stats_dir = os.path.dirname(args.model_path_posenet) if args.model_path_posenet else None
    assert stats_dir and os.path.exists(os.path.join(stats_dir, "AMASS_mean.pkl")), (
        "video testing needs AMASS train stats next to the PoseNet checkpoint "
        "(reference couples them: dataloader_video.py:405-414)"
    )

    common = dict(
        body_model=body, dataset=args.dataset, init_root=args.init_root,
        base_dir=args.dataset_root, recording_name=args.recording_name,
        use_scene_floor_height=args.use_scene_floor_height,
        overlap_len=args.window_size, clip_len=args.clip_len, logdir=stats_dir,
        disk_cache_dir=(
            os.path.join(args.dataset_root, "_repr_cache") if args.dataset_root else None
        ),
    )
    test_pose_dataset = VideoClipDataset(task="pose", repr_abs_only=False, **common)
    test_traj_dataset = test_pose_dataset.view("traj", repr_abs_only=args.repr_abs_only)
    mean, std = test_pose_dataset.mean, test_pose_dataset.std
    traj_feat_dim = test_traj_dataset.traj_feat_dim
    t_repr = args.clip_len - 1

    model_trajnet = build_trajnet(args, traj_feat_dim, False)
    model_trajcontrol = build_trajnet(args, traj_feat_dim, True)
    model_posenet = build_posenet(args)

    def load(model, init_fn, path, name):
        return load_or_init(model, init_fn, path, args.clip_len, args.seed,
                            allow_missing=args.allow_missing_ckpt, name=name)

    mesh = None
    if args.data_parallel:
        from rohm_tpu.parallel import data_parallel_mesh

        if len(jax.devices()) > 1:
            mesh = data_parallel_mesh()
            assert args.batch_size % mesh.size == 0, (
                f"batch_size {args.batch_size} must divide the {mesh.size}-device mesh"
            )
            print(f"[test_prox_egobody] data-parallel over {mesh.size} devices")

    pipeline = RohmPipeline(
        mesh=mesh,
        trajnet=model_trajnet,
        trajnet_params=load(model_trajnet, init_trajnet_params, args.model_path_trajnet, "trajnet"),
        trajcontrol=model_trajcontrol,
        trajcontrol_params=load(model_trajcontrol, init_trajnet_params, args.model_path_trajnet_control, "trajcontrol"),
        posenet=model_posenet,
        posenet_params=load(model_posenet, init_posenet_params, args.model_path_posenet, "posenet"),
        sched_traj=make_schedule(args.noise_schedule, args.diffusion_steps_trajnet, args.timestep_respacing_eval),
        sched_pose=make_schedule(args.noise_schedule, args.diffusion_steps_posenet, args.timestep_respacing_eval),
        body_model=body, mean=jnp.asarray(mean), std=jnp.asarray(std),
        repr_abs_only=args.repr_abs_only, traj_feat_dim=traj_feat_dim,
        sample_iter=args.sample_iter, early_stop=args.early_stop,
        grad_type="prox" if args.cond_fn_with_grad else None,
        mask_scheme="video",  # real visibility masks from data, not schemes
        input_noise=True,
        iter2_cond_noisy_pose=args.iter2_cond_noisy_pose,
        iter2_cond_noisy_traj=args.iter2_cond_noisy_traj,
        fused_posenet=args.fused_posenet,
    )

    out = {
        "trans_scene2cano_list": [], "rec_ric_data_noisy_list": [],
        "rec_ric_data_rec_list_from_abs_traj": [], "rec_ric_data_rec_list_from_smpl": [],
        "joints_input_scene_coord_list": [], "joints_gt_scene_coord_list": [],
        "motion_repr_rec_list": [], "motion_repr_noisy_list": [], "mask_joint_vis_list": [],
    }
    key = jax.random.PRNGKey(args.seed)

    # jitted pickle decode (mean/std as args -> compilation-cache-stable);
    # batches padded to one shape so every recording reuses one program
    mean_d, std_d = jnp.asarray(mean), jnp.asarray(std)

    @jax.jit
    def decode_batch(val_pose, pose_noisy, mean_a, std_a):
        noisy = pose_noisy[:, : t_repr - 1] * std_a + mean_a
        rec = val_pose * std_a + mean_a
        return (
            noisy, rec,
            recover_from_repr(split_repr(noisy), mode="smplx_params", body_model=body),
            recover_from_repr(split_repr(rec), mode="joint_abs_traj"),
            recover_from_repr(split_repr(rec), mode="smplx_params", body_model=body),
        )

    # bounded async window (see test_amass_full.py): device outputs of at
    # most MAX_PENDING batches stay alive; older ones drain to host numpy
    MAX_PENDING = 3
    frame_names = []

    def drain(e):
        v, bp = e["valid"], e["bp"]
        frame_names.extend(bp["frame_name"][:v])
        out["trans_scene2cano_list"].append(bp["transf_matrix"][:v])
        out["rec_ric_data_noisy_list"].append(np.asarray(e["rec_ric_data_noisy"])[:v])
        out["rec_ric_data_rec_list_from_abs_traj"].append(np.asarray(e["rec_from_abs_traj"])[:v])
        out["rec_ric_data_rec_list_from_smpl"].append(np.asarray(e["rec_from_smpl"])[:v])
        out["joints_input_scene_coord_list"].append(bp["noisy_joints_scene_coord"][:v])
        if args.dataset == "egobody":
            out["joints_gt_scene_coord_list"].append(bp["gt_joints_scene_coord"][:v])
        out["motion_repr_rec_list"].append(np.asarray(e["motion_repr_rec"])[:v])
        out["motion_repr_noisy_list"].append(np.asarray(e["motion_repr_noisy"])[:v])
        out["mask_joint_vis_list"].append(bp["mask_joint_vis"][:v, : t_repr - 1])

    pending = []
    # power-of-two tail buckets: don't pay full-batch device compute for a
    # short final window batch (see test_amass_full.py)
    pose_batches = test_pose_dataset.batches(args.batch_size, pad_last="bucket")
    traj_batches = test_traj_dataset.batches(args.batch_size, pad_last="bucket")
    for step, (bp, bt) in enumerate(zip(pose_batches, traj_batches)):
        if args.max_batches and step >= args.max_batches:
            break
        valid = bp.pop("_valid")
        bt.pop("_valid")
        # mask_vec_vis[:, :-2] masks the T-2=143-frame PoseNet condition
        # (test_prox_egobody.py:306-309)
        pose_mask = bp["mask_vec_vis"][:, : t_repr - 1].copy()
        pose_mask[..., -4:] = 0.0
        guidance_data = {
            "transf_matrix": bp["transf_matrix"],
            "cam_r": test_pose_dataset.cam_r.astype(np.float32),
            "cam_t": test_pose_dataset.cam_t.astype(np.float32),
            "focal_length": bp["focal_length"],
            "camera_center": bp["camera_center"],
            "keypoints_2d": bp["keypoints_2d"],
        }
        key, sub = jax.random.split(key)
        val_pose, _ = pipeline.run_batch(
            bt["cond"], bt["motion_repr_noisy"], bp["motion_repr_noisy"],
            pose_mask, np.ones(bt["cond"].shape[:2], np.float32), sub,
            guidance_data=guidance_data,
        )
        entry = {"valid": valid, "bp": bp}
        (
            entry["motion_repr_noisy"], entry["motion_repr_rec"],
            entry["rec_ric_data_noisy"], entry["rec_from_abs_traj"], entry["rec_from_smpl"],
        ) = decode_batch(val_pose, jnp.asarray(bp["motion_repr_noisy"]), mean_d, std_d)
        pending.append(entry)
        while len(pending) > MAX_PENDING:
            drain(pending.pop(0))
        print(f"[test_prox_egobody] batch {step}: dispatched")

    for e in pending:
        drain(e)

    save_data = {
        "repr_name_list": REPR_LIST,
        "repr_dim_dict": REPR_DIM_DICT,
        "recording_name": args.recording_name,
        "frame_name_list": frame_names,
        # scene name travels with the results so eval can use the per-scene
        # preset floor height (reference eval_prox_egobody.py:256-264) and
        # intrinsics so --render needs no dataset access
        "scene_name": getattr(test_pose_dataset, "scene_name", ""),
        "color_cam": getattr(test_pose_dataset, "color_cam", None),
        # input-frame stride between consecutive windows (for stitching)
        "window_stride": args.clip_len - args.window_size,
    }
    if args.dataset == "egobody":
        save_data["gender_gt"] = test_pose_dataset.gender_gt
    for k, v in out.items():
        if v:
            save_data[k] = np.concatenate(v, axis=0)

    save_dir = os.path.join(
        args.save_root,
        f"test_{args.dataset}_grad_{args.cond_fn_with_grad}_iter_{args.sample_iter}"
        f"_iter2trajnoisy_{args.iter2_cond_noisy_traj}_iter2posenoisy_{args.iter2_cond_noisy_pose}"
        f"_earlystop_{args.early_stop}_seed_{args.seed}",
    )
    os.makedirs(save_dir, exist_ok=True)
    pkl_path = os.path.join(save_dir, f"{args.recording_name}.pkl")
    with open(pkl_path, "wb") as f:
        pickle.dump(save_data, f, protocol=2)
    print(f"results saved to {pkl_path}")
    return pkl_path


if __name__ == "__main__":
    main()
