"""test_posenet — PoseNet-only AMASS test with GT trajectory in the condition.

CLI parity with reference test_posenet.py (mask schemes :142-172, metrics via
the saved pickle / printed MPJPE). The 1000-step chain is one compiled scan.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from rohm_tpu.cli.common import (
    AMASS_TEST_DATASETS,
    build_posenet,
    init_posenet_params,
    load_or_init,
    maybe_via_server,
    resolve_body_model,
)
from rohm_tpu.data import AmassClipDataset, load_noise_dict, write_synthetic_amass
from rohm_tpu.diffusion import make_schedule
from rohm_tpu.evals.metrics import mpjpe_global
from rohm_tpu.pipeline import amass_eval_pose_mask
from rohm_tpu.reprs import recover_from_repr, split_repr
from rohm_tpu.reprs.schema import REPR_DIM_DICT, REPR_LIST
from rohm_tpu.train.steps import make_posenet_sampler
from rohm_tpu.utils import ConfigParser


def build_parser() -> ConfigParser:
    p = ConfigParser("RoHM-TPU PoseNet test")
    p.add_argument("--device", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--noise_schedule", type=str, default="cosine")
    p.add_argument("--timestep_respacing_eval", type=str, default="")
    p.add_argument("--sigma_small", type=bool, default=True)
    p.add_argument("--body_model_path", type=str, default="data/body_models/smplx_model")
    p.add_argument("--dataset_root", type=str, default="datasets/AMASS_smplx_preprocessed")
    p.add_argument("--clip_len", type=int, default=145)
    p.add_argument("--model_path", type=str, default="")
    p.add_argument("--input_noise", type=bool, default=True)
    p.add_argument("--noise_std_smplx_global_rot", type=float, default=3)
    p.add_argument("--noise_std_smplx_body_rot", type=float, default=2)
    p.add_argument("--noise_std_smplx_trans", type=float, default=0.01)
    p.add_argument("--noise_std_smplx_betas", type=float, default=0.2)
    p.add_argument("--load_noise", type=bool, default=False)
    p.add_argument("--load_noise_level", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--mask_scheme", type=str, default="lower")
    p.add_argument("--cond_fn_with_grad", type=bool, default=False)
    p.add_argument("--early_stop", type=bool, default=False)
    p.add_argument("--save_results", type=bool, default=False)
    p.add_argument("--save_root", type=str, default="test_results/results_posenet")
    p.add_argument("--visualize", type=bool, default=False)
    # TPU-build extensions
    p.add_argument("--synthetic_data", type=bool, default=False)
    p.add_argument("--latent_dim", type=int, default=512)
    p.add_argument("--max_batches", type=int, default=0)
    p.add_argument("--fused_posenet", type=bool, default=False)
    p.add_argument("--allow_missing_ckpt", type=bool, default=False)
    p.add_argument("--via_server", type=bool, default=False)
    return p


def main(argv=None):
    from rohm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    handled, result = maybe_via_server("test_posenet", args, argv)
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
        repr_abs_only=False, task="pose", seed=args.seed,
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

    model = build_posenet(args)
    params = load_or_init(model, init_posenet_params, args.model_path, args.clip_len,
                          args.seed, allow_missing=args.allow_missing_ckpt,
                          name="posenet")

    sched = make_schedule(args.noise_schedule, args.diffusion_steps, args.timestep_respacing_eval)
    guidance = ()
    if args.cond_fn_with_grad:
        from rohm_tpu.models.guidance import amass_guidance

        guidance = amass_guidance(jnp.asarray(mean), jnp.asarray(std), body)
    sampler = make_posenet_sampler(
        model, sched, guidance=guidance,
        early_stop_steps=20 if args.early_stop else 0,
        fused=args.fused_posenet,
    )
    key = jax.random.PRNGKey(args.seed)

    all_clean, all_rec, all_noisy, all_repr_clean, all_repr_rec = [], [], [], [], []
    for step, batch in enumerate(test_dataset.batches(args.batch_size, shuffle=False, drop_last=False)):
        if args.max_batches and step >= args.max_batches:
            break
        bs, clip_len = batch["motion_repr_noisy"].shape[:2]
        vis = amass_eval_pose_mask(args.mask_scheme, bs, clip_len, rng=rng)
        cond = batch["motion_repr_noisy"] * vis
        key, sub = jax.random.split(key)
        val_output = np.asarray(sampler(params, jnp.asarray(cond), sub))

        clean = batch["motion_repr_clean"] * std + mean
        rec = val_output * std + mean
        d_clean = split_repr(jnp.asarray(clean))
        d_rec = split_repr(jnp.asarray(rec))
        j_clean = np.asarray(recover_from_repr(d_clean, mode="smplx_params", body_model=body))
        j_rec = np.asarray(recover_from_repr(d_rec, mode="smplx_params", body_model=body))
        all_clean.append(j_clean)
        all_rec.append(j_rec)
        all_repr_clean.append(clean)
        all_repr_rec.append(rec)

        if args.visualize:
            from rohm_tpu.viz import animate_skeletons
            from rohm_tpu.viz.skeleton import COLOR_GT, COLOR_VIS

            animate_skeletons(
                [j_clean[0], j_rec[0]], [COLOR_GT, COLOR_VIS],
                contact=(rec[0, :, -4:] > 0.5).astype(float),
            )
        if args.input_noise:
            noisy = batch["motion_repr_noisy"] * std + mean
            all_noisy.append(
                np.asarray(recover_from_repr(split_repr(jnp.asarray(noisy)), mode="smplx_params", body_model=body))
            )

    clean = np.concatenate(all_clean)
    rec = np.concatenate(all_rec)
    print("mpjpe_global (mm): {:0.1f}".format(mpjpe_global(clean, rec) * 1000))

    if args.save_results:
        os.makedirs(args.save_root, exist_ok=True)
        save_data = {
            "mask_scheme": args.mask_scheme,
            "repr_name_list": REPR_LIST,
            "repr_dim_dict": REPR_DIM_DICT,
            "rec_ric_data_clean_list": clean,
            "rec_ric_data_rec_list_from_smpl": rec,
            "motion_repr_clean_list": np.concatenate(all_repr_clean),
            "motion_repr_rec_list": np.concatenate(all_repr_rec),
        }
        if all_noisy:
            save_data["rec_ric_data_noisy_list"] = np.concatenate(all_noisy)
        pkl_path = os.path.join(
            args.save_root,
            f"test_posenet_mask_{args.mask_scheme}_grad_{args.cond_fn_with_grad}_seed_{args.seed}.pkl",
        )
        with open(pkl_path, "wb") as f:
            pickle.dump(save_data, f, protocol=2)
        print(f"results saved to {pkl_path}")
    return mpjpe_global(clean, rec)


if __name__ == "__main__":
    main()
