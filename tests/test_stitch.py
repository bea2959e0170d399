"""Window stitching: overlapping pipeline outputs -> one continuous sequence."""

import numpy as np

from rohm_tpu.evals.stitch import stitch_windows


def _cut(seq, length, stride):
    n = (len(seq) - length) // stride + 1
    return np.stack([seq[k * stride : k * stride + length] for k in range(n)])


def test_reconstructs_continuous_sequence_with_overlap():
    """Windows cut from one continuous signal stitch back to it exactly
    (crossfading identical values is the identity)."""
    t = np.arange(100, dtype=np.float64)
    seq = np.stack([np.sin(0.1 * t), np.cos(0.07 * t)], axis=-1)  # [100, 2]
    win = _cut(seq, length=20, stride=16)  # 4-frame output overlap
    out = stitch_windows(win, stride=16)
    total = 16 * (len(win) - 1) + 20
    np.testing.assert_allclose(out, seq[:total], atol=1e-12)


def test_zero_overlap_is_concatenation():
    """stride == window length (the shipped window_size=2 geometry gives
    exactly this after the encode truncations): plain concatenation."""
    win = np.arange(3 * 5 * 2, dtype=np.float64).reshape(3, 5, 2)
    out = stitch_windows(win, stride=5)
    np.testing.assert_array_equal(out, win.reshape(15, 2))


def test_crossfade_blends_disagreeing_windows():
    """Where windows disagree, the seam blends monotonically between them."""
    a = np.zeros((10, 1))
    b = np.ones((10, 1))
    out = stitch_windows(np.stack([a, b]), stride=6)  # 4-frame overlap
    assert out.shape == (16, 1)
    np.testing.assert_array_equal(out[:6], 0.0)  # a only
    np.testing.assert_array_equal(out[10:], 1.0)  # b only
    seam = out[6:10, 0]
    assert np.all(np.diff(seam) > 0) and 0.0 < seam[0] < seam[-1] < 1.0
    # complementary ramps: blend = ramp_b / (ramp_a + ramp_b)
    ramp = np.arange(1, 5) / 5.0
    np.testing.assert_allclose(seam, ramp[::1] / (ramp + ramp[::-1]), atol=1e-12)


def test_joint_shaped_windows():
    win = np.random.default_rng(0).normal(size=(3, 8, 22, 3))
    out = stitch_windows(win, stride=6)
    assert out.shape == (20, 22, 3)
    np.testing.assert_array_equal(out[:6], win[0, :6])
