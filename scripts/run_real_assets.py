"""One-command real-asset runbook: preprocess -> convert -> infer -> eval -> compare.

The environment this framework was built in has NO real AMASS data, SMPL-X
weights, released RoHM checkpoints, or released result pickles (all
license-gated downloads; the machine has zero egress). Everything here is
staged so that THE DAY assets land, one command produces the full
cross-framework comparison against the reference release
(/root/reference/README.md:83: `data/test_results_release`):

    python scripts/run_real_assets.py \
        --amass_root       /path/to/AMASS_smplx_neutral       # raw npz tree
        --smplx_npz        /path/to/SMPLX_NEUTRAL.npz          # body model
        --ckpt_trajnet     /path/to/runs/<id>/model000450000.pt
        --ckpt_trajcontrol /path/to/runs/<id>/model000400000.pt
        --ckpt_posenet     /path/to/runs/<id>/model000200000.pt
        --stats_dir        /path/to/runs/<posenet_id>           # AMASS_{mean,std}.pkl
        --eval_noise_pkl   /path/to/data/eval_noise_smplx/smplx_noise_level_3.pkl
        --release_pickle   /path/to/data/test_results_release/results_amass_full/....pkl
        --work_dir         /tmp/rohm_real_run
        [--config cfg_files/test_cfg/amass_occ_leg_noise_3.yaml]
        [--skip_preprocess]  # reuse an existing preprocessed tree

Steps (each prints its wall-clock):
  1. preprocessing_amass.py on the raw tree -> work_dir/preprocessed
     (reference preprocessing_amass.py:16-155 parity; 30 fps, SSM special
     case, blacklist).
  2. convert the three released torch checkpoints -> flax npz via
     rohm_tpu.utils.convert_torch_ckpt (layer-parity-tested converter).
  3. test_amass_full with --load_noise (the released preset noise pickle
     makes the benchmark deterministic up to sampler RNG,
     reference dataloader_amass.py:161-163) -> result pickle.
  4. eval_amass_full on OUR pickle and on the RELEASED pickle; print both
     metric tables and the relative deltas against the 1% parity budget
     (BASELINE.json "accuracy parity").

The asset-gated pytest twin of this script is tests/test_real_assets.py
(auto-skips unless ROHM_REAL_ASSETS points at a directory with this layout).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PARITY_BUDGET = 0.01  # BASELINE.json: metrics within 1% of the reference


def _stage(name):
    print(f"\n=== [{name}] ===", flush=True)
    return time.monotonic()


def _done(t0):
    print(f"    ({time.monotonic() - t0:.1f} s)", flush=True)


def run(args=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--amass_root", required=True)
    p.add_argument("--smplx_npz", required=True)
    p.add_argument("--ckpt_trajnet", required=True)
    p.add_argument("--ckpt_trajcontrol", required=True)
    p.add_argument("--ckpt_posenet", required=True)
    p.add_argument("--stats_dir", required=True,
                   help="directory holding AMASS_mean.pkl / AMASS_std.pkl "
                        "(the reference writes them into the train logdir "
                        "next to the checkpoint, dataloader_amass.py:264-276)")
    p.add_argument("--eval_noise_pkl", required=True)
    p.add_argument("--release_pickle", default="",
                   help="released reference result pickle to compare against "
                        "(omit to skip the cross-framework table)")
    p.add_argument("--work_dir", default="/tmp/rohm_real_run")
    p.add_argument("--config", default="cfg_files/test_cfg/amass_occ_leg_noise_3.yaml")
    p.add_argument("--dataset_name", default="TestSet",
                   help="subdirectory name under amass_root to preprocess")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--fused_posenet", default="False",
                   help="False (f32 parity mode, default) / bf16 / int8")
    p.add_argument("--skip_preprocess", action="store_true")
    a = p.parse_args(args)

    os.makedirs(a.work_dir, exist_ok=True)
    pre_root = os.path.join(a.work_dir, "preprocessed")

    # ---- 1. preprocess ------------------------------------------------
    if a.skip_preprocess and os.path.isdir(pre_root):
        print(f"[preprocess] skipped, reusing {pre_root}")
    else:
        t0 = _stage("preprocess AMASS")
        from rohm_tpu.cli import preprocessing_amass

        preprocessing_amass.main([
            f"--amass_root={a.amass_root}",
            f"--save_root={pre_root}",
            f"--dataset_name={a.dataset_name}",
            f"--body_model_path={a.smplx_npz}",
        ])
        _done(t0)

    # ---- 2. convert checkpoints ---------------------------------------
    t0 = _stage("convert torch checkpoints")
    from rohm_tpu.utils import convert_torch_ckpt as cvt

    ckpts = {}
    for name, path, extra in (
        ("trajnet", a.ckpt_trajnet, []),
        ("trajnet_control", a.ckpt_trajcontrol, ["--trajcontrol=True"]),
        ("posenet", a.ckpt_posenet, []),
    ):
        out = os.path.join(a.work_dir, f"{name}.npz")
        model_kind = "trajnet" if name.startswith("trajnet") else "posenet"
        cvt.main([f"--model={model_kind}", f"--torch_path={path}",
                  f"--out_path={out}", *extra])
        ckpts[name] = out
    # stats must sit next to the converted checkpoints (the CLI derives the
    # stats dir from the model path, mirroring test_amass_full.py:91-92)
    for pkl in ("AMASS_mean.pkl", "AMASS_std.pkl"):
        src = os.path.join(a.stats_dir, pkl)
        if not os.path.exists(src):
            raise FileNotFoundError(
                f"{src} not found — the normalization stats travel with the "
                "checkpoint (reference writes them into the train logdir)")
        shutil.copy(src, os.path.join(a.work_dir, pkl))
    _done(t0)

    # ---- 3. full-pipeline inference with preset noise -------------------
    t0 = _stage("test_amass_full (preset noise)")
    noise_dir = os.path.join(a.work_dir, "data", "eval_noise_smplx")
    os.makedirs(noise_dir, exist_ok=True)
    shutil.copy(a.eval_noise_pkl, os.path.join(
        noise_dir, os.path.basename(a.eval_noise_pkl)))
    level = "".join(c for c in os.path.basename(a.eval_noise_pkl) if c.isdigit()) or "3"
    save_root = os.path.join(a.work_dir, "results_amass_full")
    cwd = os.getcwd()
    os.chdir(a.work_dir)  # the CLI resolves data/eval_noise_smplx relative to cwd
    try:
        from rohm_tpu.cli import test_amass_full

        test_amass_full.main([
            f"--config={os.path.join(REPO, a.config)}",
            f"--dataset_root={pre_root}",
            f"--body_model_path={a.smplx_npz}",
            f"--model_path_trajnet={ckpts['trajnet']}",
            f"--model_path_trajnet_control={ckpts['trajnet_control']}",
            f"--model_path_posenet={ckpts['posenet']}",
            f"--load_noise=True", f"--load_noise_level={level}",
            f"--batch_size={a.batch_size}",
            f"--fused_posenet={a.fused_posenet}",
            f"--save_root={save_root}",
        ])
    finally:
        os.chdir(cwd)
    pickles = [os.path.join(save_root, f) for f in sorted(os.listdir(save_root))
               if f.endswith(".pkl")]
    assert pickles, f"no result pickle written under {save_root}"
    ours = pickles[-1]
    print(f"[infer] result pickle: {ours}")
    _done(t0)

    # ---- 4. eval + 1%-budget comparison ---------------------------------
    t0 = _stage("eval_amass_full")
    from rohm_tpu.cli import eval_amass_full

    print("\n--- THIS FRAMEWORK ---")
    m_ours = eval_amass_full.main([
        f"--config={os.path.join(REPO, a.config.replace('test_cfg', 'eval_cfg'))}",
        f"--saved_data_path={ours}",
        f"--body_model_path={a.smplx_npz}",
    ])
    if a.release_pickle:
        print("\n--- REFERENCE RELEASE ---")
        m_ref = eval_amass_full.main([
            f"--config={os.path.join(REPO, a.config.replace('test_cfg', 'eval_cfg'))}",
            f"--saved_data_path={a.release_pickle}",
            f"--body_model_path={a.smplx_npz}",
        ])
        print(f"\n--- 1%-BUDGET COMPARISON (budget {PARITY_BUDGET:.0%}) ---")
        worst = 0.0
        for k in sorted(m_ref):
            r, o = float(m_ref[k]), float(m_ours[k])
            rel = abs(r - o) / max(abs(r), 1e-9)
            worst = max(worst, rel)
            flag = "OK " if rel <= PARITY_BUDGET else "FAIL"
            print(f"  [{flag}] {k:28s} ref={r:10.4f} ours={o:10.4f} rel={rel:.2%}")
        print(f"\nworst relative delta: {worst:.2%} "
              f"({'WITHIN' if worst <= PARITY_BUDGET else 'EXCEEDS'} the 1% budget)")
    _done(t0)
    return m_ours


if __name__ == "__main__":
    run()
