"""Tests for the run-logging utilities (reference other_utils.py:101-117,
train_trajnet.py:196-206) and the eval-noise fixture pkl round-trip
(reference dataloader_amass.py:57-58,161-163,238-245), plus skeleton-topology
parity against the REAL reference constant table."""

import json
import os
import sys

import numpy as np
import pytest

from rohm_tpu.data import load_noise_dict, save_noise_dict
from rohm_tpu.utils.runlog import make_logdir, save_params_json, setup_logger


class TestRunlog:
    def test_make_logdir_reference_format(self, tmp_path):
        """runs/<random int 1..100000>, fresh dir (train_trajnet.py:197-198)."""
        d1 = make_logdir(str(tmp_path / "runs"), seed=0)
        d2 = make_logdir(str(tmp_path / "runs"), seed=0)
        assert os.path.isdir(d1) and os.path.isdir(d2) and d1 != d2
        for d in (d1, d2):
            run_id = int(os.path.basename(d))
            assert 1 <= run_id <= 100000

    def test_save_params_json(self, tmp_path):
        class A:
            pass

        a = A()
        a.lr, a.name, a.steps = 1e-4, "x", 100
        save_params_json(str(tmp_path), a)
        with open(tmp_path / "params.json") as f:
            got = json.load(f)
        assert got == {"lr": 1e-4, "name": "x", "steps": 100}
        assert list(got) == sorted(got)

    def test_setup_logger_writes_file(self, tmp_path):
        logger = setup_logger(str(tmp_path))
        logger.info("hello-parity")
        for h in logger.handlers:
            h.flush()
        logs = [p for p in os.listdir(tmp_path) if p.startswith("run_")]
        assert len(logs) == 1
        assert "hello-parity" in open(tmp_path / logs[0]).read()


class TestEvalNoiseFixtures:
    def test_pkl_roundtrip_and_shapes(self, tmp_path):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from scripts.make_eval_noise import make_noise

        noise = make_noise(n_clips=4, clip_len=9, level=3, seed=0)
        # reference pkl schema (dataloader_amass.py:161-163 consumption)
        assert noise["transl"].shape == (4, 9, 3)
        assert noise["betas"].shape == (4, 9, 10)
        assert noise["global_orient"].shape == (4, 9, 3)
        assert noise["body_pose"].shape == (4, 9, 21, 3)
        # rotation stds in degrees ~ level; transl in meters ~ level/100
        assert abs(noise["body_pose"].std() - 3.0) < 0.2
        assert abs(noise["transl"].std() - 0.03) < 0.005
        p = str(tmp_path / "noise.pkl")
        save_noise_dict(p, noise)
        got = load_noise_dict(p)
        assert set(got) == set(noise)
        for k in noise:
            np.testing.assert_array_equal(got[k], noise[k])

    def test_determinism(self):
        from scripts.make_eval_noise import make_noise

        a = make_noise(2, 5, 5, seed=7)
        b = make_noise(2, 5, 5, seed=7)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_skeleton_topology_matches_reference():
    """LIMBS_BODY_SMPL edge list == the reference constant
    (/root/reference/utils/other_utils.py:62-89) — the table IS the spec."""
    from rohm_tpu.viz.skeleton import LIMBS_BODY_SMPL

    ref_path = "/root/reference/utils/other_utils.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference unavailable")
    src = open(ref_path).read()
    start = src.index("LIMBS_BODY_SMPL")
    open_i = src.index("[", start)
    block = src[open_i : src.index("]", open_i) + 1]  # tuples only, no nesting
    # parse the literal without importing the reference module (cv2/open3d deps)
    import ast

    edges = ast.literal_eval(
        "[" + "".join(
            line.split("#")[0] for line in block[1:-1].splitlines()
        ) + "]"
    )
    assert [tuple(e) for e in LIMBS_BODY_SMPL] == [tuple(e) for e in edges]


def test_profile_kv_accumulates():
    """profile_kv / @profile / get_timings (reference logger.py:294-309 role)."""
    import time

    from rohm_tpu.utils.profiling import (
        get_timings, profile, profile_kv, reset_timings,
    )

    reset_timings()
    with profile_kv("block"):
        time.sleep(0.01)
    with profile_kv("block"):
        time.sleep(0.01)

    @profile
    def work():
        time.sleep(0.005)

    work()
    t = get_timings()
    assert t["block"][1] == 2 and t["block"][0] >= 0.02
    assert t["work"][1] == 1 and t["work"][0] >= 0.005
    reset_timings()
    assert get_timings() == {}
