"""Day-one v5e-8 runbook: the exact multi-chip commands + the north-star check.

This environment exposes ONE physical TPU chip (multi-chip hardware is not
reachable), so multi-chip execution is validated on a virtual CPU mesh
(__graft_entry__.dryrun_multichip — the driver runs it at production shapes
every round). THE DAY a real v5e-8 (or larger) slice is attached, this one
command runs the full AMASS eval data-parallel and checks the BASELINE.json
north star — full test_amass_full wall-clock >= 10x the A100 PyTorch
derivation — plus near-linear scaling efficiency against the measured
single-chip rate:

    python scripts/run_multichip.py                        # real multi-chip
    python scripts/run_multichip.py --dryrun [--full]      # virtual 8-dev mesh
    python scripts/run_multichip.py --dataset_root=/path/to/AMASS ...  # real data

Reference cost model (documented in BASELINE.md "Reference throughput"):
the A100 PyTorch reference at bs=32 is generously estimated at 300 denoise
steps/s; a full-pipeline clip costs 2*(100+1000)=2200 steps, so the A100
processes ~300/2200*32 = 4.4 clips/s. The north star (>=10x) is therefore
>=44 clips/s across the slice. Measured single-chip rates (BASELINE.md):
11.0 clips/s steady-state bf16 at bs=128, 17.0 int8; the v5e-8 int8
projection (~136 clips/s) clears the bar ~3x — this script converts that
projection into a measurement the moment hardware exists.

Scaling-efficiency gate: data-parallel inference has NO cross-chip
collectives in the hot loop (each chip denoises its own clips; the only
sharing is replicated params), so efficiency should be near-linear; the
gate is a conservative 70% to absorb host-side batch assembly.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

A100_CLIPS_PER_SEC = 300.0 / 2200.0 * 32  # ~4.4, see module docstring
NORTH_STAR_X = 10.0
SINGLE_CHIP_CLIPS_PER_SEC = 12.2  # measured warm-server 135-clip e2e (BASELINE.md)
SCALING_EFF_GATE = 0.70


def run(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dryrun", action="store_true",
                   help="force the virtual-mesh dryrun path (no TPU slice needed)")
    p.add_argument("--full", action="store_true",
                   help="dryrun: include the production-shape compiles (~5 min)")
    p.add_argument("--n_virtual", type=int, default=8)
    p.add_argument("--dataset_root", default="",
                   help="real preprocessed AMASS root (default: synthetic tree)")
    p.add_argument("--model_path_trajnet", default="")
    p.add_argument("--model_path_trajnet_control", default="")
    p.add_argument("--model_path_posenet", default="")
    p.add_argument("--batch_size_per_chip", type=int, default=32)
    p.add_argument("--fused_posenet", default="int8",
                   help="throughput mode for the measurement (int8 | bf16 | false)")
    p.add_argument("--work_dir", default="/tmp/rohm_multichip")
    args = p.parse_args(argv)

    import jax

    n = len(jax.devices())
    if args.dryrun or n <= 1:
        if not args.dryrun:
            print(f"[run_multichip] only {n} device(s) visible — falling back "
                  "to the virtual-mesh dryrun (attach a v5e-8 slice and rerun "
                  "for the real measurement)")
        import __graft_entry__ as ge

        ge.dryrun_multichip(args.n_virtual, fast=not args.full)
        print("[run_multichip] virtual-mesh dryrun green. On real hardware "
              "this script continues into the timed north-star run.")
        return None

    # ---------------- real multi-chip measurement
    from rohm_tpu.cli import test_amass_full as cli

    bs = args.batch_size_per_chip * n
    cmd = [
        f"--dataset_root={args.dataset_root or os.path.join(args.work_dir, 'amass')}",
        f"--batch_size={bs}",
        "--data_parallel=True",
        f"--fused_posenet={args.fused_posenet}",
        f"--save_root={os.path.join(args.work_dir, 'results')}",
        "--seed=0",
    ]
    if not args.dataset_root:
        cmd.append("--synthetic_data=True")
        cmd.append("--load_noise=False")
    for k in ("model_path_trajnet", "model_path_trajnet_control", "model_path_posenet"):
        v = getattr(args, k)
        if v:
            cmd.append(f"--{k}={v}")
    if not args.model_path_posenet:
        cmd.append("--allow_missing_ckpt=True")
    print(f"[run_multichip] {n} devices; running: test_amass_full " + " ".join(cmd))

    t0 = time.monotonic()
    pkl_path = cli.main(cmd)
    wall = time.monotonic() - t0

    import pickle

    import numpy as np

    with open(pkl_path, "rb") as f:
        saved = pickle.load(f)
    n_clips = len(np.asarray(saved["motion_repr_rec_list"]))
    rate = n_clips / wall
    eff = rate / (n * SINGLE_CHIP_CLIPS_PER_SEC)
    vs_a100 = rate / A100_CLIPS_PER_SEC
    print(f"[run_multichip] {n_clips} clips in {wall:.1f} s = {rate:.1f} clips/s "
          f"on {n} chips")
    print(f"[run_multichip] scaling efficiency vs {SINGLE_CHIP_CLIPS_PER_SEC} "
          f"clips/s/chip: {eff:.0%}")
    print(f"[run_multichip] vs A100 reference ({A100_CLIPS_PER_SEC:.1f} clips/s): "
          f"{vs_a100:.1f}x (north star: >={NORTH_STAR_X}x)")
    assert vs_a100 >= NORTH_STAR_X, (
        f"north star missed: {vs_a100:.1f}x < {NORTH_STAR_X}x the A100 derivation"
    )
    assert eff >= SCALING_EFF_GATE, (
        f"scaling efficiency {eff:.0%} below the {SCALING_EFF_GATE:.0%} gate — "
        "host-side batch assembly or sharding layout is eating the slice"
    )
    print("[run_multichip] NORTH STAR MET")
    return {"clips_per_sec": rate, "vs_a100": vs_a100, "efficiency": eff}


if __name__ == "__main__":
    run()
