"""test_trajnet — TrajNet-only AMASS test with root-trajectory diagnostics.

CLI/metric parity with reference test_trajnet.py (infill masking :139-149,
error printouts :332-366). The 100-step sampling chain is one compiled scan.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from rohm_tpu.cli.common import (
    AMASS_TEST_DATASETS,
    build_trajnet,
    init_trajnet_params,
    load_or_init,
    maybe_via_server,
    resolve_body_model,
)
from rohm_tpu.data import AmassClipDataset, load_noise_dict, write_synthetic_amass
from rohm_tpu.diffusion import make_schedule
from rohm_tpu.models.losses import merge_traj_output
from rohm_tpu.reprs import recover_from_repr, scatter_traj_abs, split_repr
from rohm_tpu.reprs.schema import TRAJ_FEAT_DIM_FULL
from rohm_tpu.train.masking import traj_infill_mask
from rohm_tpu.train.steps import make_trajnet_sampler
from rohm_tpu.utils import ConfigParser

FPS = 30


def build_parser() -> ConfigParser:
    p = ConfigParser("RoHM-TPU TrajNet test")
    p.add_argument("--device", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--diffusion_steps", type=int, default=100)
    p.add_argument("--noise_schedule", type=str, default="cosine")
    p.add_argument("--timestep_respacing_eval", type=str, default="")
    p.add_argument("--sigma_small", type=bool, default=True)
    p.add_argument("--body_model_path", type=str, default="data/body_models/smplx_model")
    p.add_argument("--dataset_root", type=str, default="datasets/AMASS_smplx_preprocessed")
    p.add_argument("--clip_len", type=int, default=145)
    p.add_argument("--repr_abs_only", type=bool, default=True)
    p.add_argument("--trajcontrol", type=bool, default=False)
    p.add_argument("--model_path", type=str, default="")
    p.add_argument("--input_noise", type=bool, default=True)
    p.add_argument("--noise_std_smplx_global_rot", type=float, default=1)
    p.add_argument("--noise_std_smplx_body_rot", type=float, default=1)
    p.add_argument("--noise_std_smplx_trans", type=float, default=0.01)
    p.add_argument("--noise_std_smplx_betas", type=float, default=0.1)
    p.add_argument("--load_noise", type=bool, default=False)
    p.add_argument("--load_noise_level", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--infill_traj", type=bool, default=False)
    p.add_argument("--max_infill_ratio", type=float, default=0.1)
    p.add_argument("--visualize", type=bool, default=False)
    # TPU-build extensions
    p.add_argument("--synthetic_data", type=bool, default=False)
    p.add_argument("--mid_dim", type=int, default=512)
    p.add_argument("--max_batches", type=int, default=0)
    p.add_argument("--allow_missing_ckpt", type=bool, default=False)
    p.add_argument("--via_server", type=bool, default=False)
    return p


def main(argv=None):
    from rohm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    handled, result = maybe_via_server("test_trajnet", args, argv)
    if handled:
        return result
    rng = np.random.default_rng(args.seed)
    body = resolve_body_model(args.body_model_path)

    if args.synthetic_data and not os.path.isdir(
        os.path.join(args.dataset_root, "pose_data_fps_30")
    ):
        write_synthetic_amass(
            args.dataset_root, body,
            datasets={name: 1 for name in AMASS_TEST_DATASETS},
            seq_len=args.clip_len + 4,
        )

    loaded_noise = None
    if args.load_noise:
        path = os.path.join("data", "eval_noise_smplx", f"smplx_noise_level_{args.load_noise_level}.pkl")
        loaded_noise = load_noise_dict(path) if os.path.exists(path) else None
        if loaded_noise is None:
            args.load_noise = False

    stats_dir = os.path.dirname(args.model_path) if args.model_path else None
    if not (stats_dir and os.path.exists(os.path.join(stats_dir, "AMASS_mean.pkl"))):
        stats_dir = None
    common = dict(
        body_model=body, preprocessed_amass_root=args.dataset_root,
        amass_datasets=AMASS_TEST_DATASETS, clip_len=args.clip_len,
        repr_abs_only=args.repr_abs_only, task="traj", seed=args.seed,
        input_noise=args.input_noise,
        noise_std_smplx_global_rot=args.noise_std_smplx_global_rot,
        noise_std_smplx_body_rot=args.noise_std_smplx_body_rot,
        noise_std_smplx_trans=args.noise_std_smplx_trans,
        noise_std_smplx_betas=args.noise_std_smplx_betas,
        load_noise=args.load_noise, loaded_smplx_noise_dict=loaded_noise,
    )
    if stats_dir is None:
        ds_stats = AmassClipDataset(split="train", logdir=None, **common)
        import tempfile

        from rohm_tpu.reprs.stats import save_stats

        stats_dir = tempfile.mkdtemp(prefix="rohm_stats_")
        save_stats(stats_dir, ds_stats.mean, ds_stats.std)
    test_dataset = AmassClipDataset(split="test", logdir=stats_dir, **common)
    mean, std = test_dataset.mean, test_dataset.std
    traj_feat_dim = test_dataset.traj_feat_dim

    model = build_trajnet(args, traj_feat_dim, args.trajcontrol)
    params = load_or_init(model, init_trajnet_params, args.model_path, args.clip_len,
                          args.seed, allow_missing=args.allow_missing_ckpt,
                          name="trajnet")

    sched = make_schedule(args.noise_schedule, args.diffusion_steps, args.timestep_respacing_eval)
    sampler = make_trajnet_sampler(model, sched, traj_feat_dim)
    key = jax.random.PRNGKey(args.seed)

    errs = {k: [] for k in [
        "root_rot", "x_abs", "y_abs", "z_abs", "x_rel", "y_rel", "z_rel",
        "x_smpl", "y_smpl", "z_smpl", "jitter_clean", "jitter_noisy",
        "jitter_abs", "jitter_rel", "jitter_smpl",
    ]}

    def decode(repr_dn, mode):
        return np.asarray(
            recover_from_repr(split_repr(jnp.asarray(repr_dn)), mode=mode, body_model=body)
        )

    for step, batch in enumerate(test_dataset.batches(args.batch_size, shuffle=False, drop_last=False)):
        if args.max_batches and step >= args.max_batches:
            break
        cond = batch["cond"].copy()
        bs, clip_len = cond.shape[:2]
        if args.infill_traj:
            m = traj_infill_mask(rng, bs, clip_len, args.max_infill_ratio)
            cond = cond * m[..., None]
        key, sub = jax.random.split(key)
        cc = batch.get("control_cond") if args.trajcontrol else None
        val_output = np.asarray(sampler(params, jnp.asarray(cond), sub, cc))

        clean_n = batch["motion_repr_clean"]
        rec_n = np.asarray(merge_traj_output(jnp.asarray(clean_n), jnp.asarray(val_output), args.repr_abs_only))
        if args.repr_abs_only:
            noisy_n = np.asarray(scatter_traj_abs(jnp.asarray(clean_n), jnp.asarray(batch["cond"])))
        else:
            noisy_n = clean_n.copy()
            noisy_n[..., :traj_feat_dim] = batch["cond"]

        clean = clean_n * std + mean
        rec = rec_n * std + mean
        noisy = noisy_n * std + mean

        j_clean = decode(clean, "smplx_params")
        j_noisy = decode(noisy, "smplx_params")
        j_abs = decode(rec, "joint_abs_traj")
        j_rel = decode(rec, "joint_rel_traj")
        j_smpl = decode(rec, "smplx_params")

        root = lambda j: j[:, :, 0]
        jitter = lambda p: np.linalg.norm(
            (p[:, 3:] - 3 * p[:, 2:-1] + 3 * p[:, 1:-2] - p[:, :-3]) * FPS**3, axis=-1
        )
        errs["root_rot"].append(np.abs(rec[..., 0] * 2 - clean[..., 0] * 2))
        for tag, j in [("abs", j_abs), ("rel", j_rel), ("smpl", j_smpl)]:
            d = np.abs(root(j) - root(j_clean))
            errs[f"x_{tag}"].append(d[..., 0])
            errs[f"y_{tag}"].append(d[..., 1])
            errs[f"z_{tag}"].append(d[..., 2])
            errs[f"jitter_{tag}"].append(jitter(root(j)))
        errs["jitter_clean"].append(jitter(root(j_clean)))
        errs["jitter_noisy"].append(jitter(root(j_noisy)))

        if args.visualize:
            from rohm_tpu.viz import animate_skeletons
            from rohm_tpu.viz.skeleton import COLOR_GT, COLOR_OCC, COLOR_VIS

            # [red GT] [yellow noisy] [blue rec] (test_trajnet.py:265-328)
            animate_skeletons(
                [j_clean[0], j_noisy[0], j_smpl[0]],
                [COLOR_GT, COLOR_OCC, COLOR_VIS],
            )

    results = {k: float(np.concatenate(v).mean()) for k, v in errs.items() if v}
    print("root_rot_err_rec (deg): {:0.3f}".format(np.rad2deg(results["root_rot"])))
    for tag in ["abs", "rel", "smpl"]:
        print("root x/y/z err from {} (mm): {:0.1f} / {:0.1f} / {:0.1f}".format(
            tag, results[f"x_{tag}"] * 1000, results[f"y_{tag}"] * 1000, results[f"z_{tag}"] * 1000))
        print("root jitter from {} (m/s^3): {:0.1f}".format(tag, results[f"jitter_{tag}"]))
    print("root jitter clean/noisy (m/s^3): {:0.1f} / {:0.1f}".format(
        results["jitter_clean"], results["jitter_noisy"]))
    return results


if __name__ == "__main__":
    main()
