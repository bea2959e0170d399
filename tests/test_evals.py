"""Video-path metric tests (axis-aware skating, EgoBody MPJPE set)."""

import numpy as np

from rohm_tpu.evals.metrics import (
    egobody_mpjpe_set,
    ground_penetration_fixed_floor,
    skating_ratio_fixed_floor,
)


def _static_feet_clip(n=2, t=20, up=2):
    """Feet planted at floor height, body above — no skating."""
    j = np.zeros((n, t, 22, 3))
    j[..., up] = 1.0
    for f in (7, 10, 8, 11):
        j[:, :, f, up] = 0.02
    return j


def test_skating_fixed_floor_zero_when_static():
    j = _static_feet_clip()
    assert skating_ratio_fixed_floor(j, ground_height=0.0, up_axis=2) == 0.0


def test_skating_fixed_floor_detects_sliding():
    j = _static_feet_clip()
    # slide ALL foot joints horizontally while low
    t = np.arange(j.shape[1])
    for f in (7, 10, 8, 11):
        j[:, :, f, 0] = 0.02 * t  # 0.6 m/s at 30 fps
    assert skating_ratio_fixed_floor(j, ground_height=0.0, up_axis=2) > 0.9


def test_skating_y_up_axis():
    j = _static_feet_clip(up=1)
    t = np.arange(j.shape[1])
    for f in (7, 10, 8, 11):
        j[:, :, f, 2] = 0.02 * t  # horizontal for y-up is x/z
    assert skating_ratio_fixed_floor(j, ground_height=0.0, up_axis=1) > 0.9


def test_ground_penetration_fixed_floor():
    j = _static_feet_clip()
    j[:, :, 10, 2] = -0.2  # left toe deep under floor
    freq, dist = ground_penetration_fixed_floor(j, ground_height=0.0, up_axis=2)
    assert freq == 0.5  # one of the two toe joints
    assert dist < 0


def test_egobody_mpjpe_set():
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(2, 10, 22, 3))
    m = egobody_mpjpe_set(gt, gt, np.ones((2, 10, 22)))
    assert m["gmpjpe"] == 0.0 and m["mpjpe"] == 0.0

    # pure translation offset: gmpjpe grows, root-relative mpjpe stays 0
    rec = gt + np.array([0.1, 0.0, 0.0])
    m = egobody_mpjpe_set(gt, rec, np.ones((2, 10, 22)))
    assert abs(m["gmpjpe"] - 0.1) < 1e-6
    assert m["mpjpe"] < 1e-6

    # vis/occ split: corrupt one joint, mark it occluded
    rec = gt.copy()
    rec[:, :, 5] += 1.0
    mask = np.ones((2, 10, 22))
    mask[:, :, 5] = 0
    m = egobody_mpjpe_set(gt, rec, mask)
    assert m["mpjpe_vis"] < 1e-6
    assert m["mpjpe_occ"] > 0.5
