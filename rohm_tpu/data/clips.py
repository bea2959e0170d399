"""Sequence -> fixed-length clip cutting (shared by AMASS + video loaders)."""

from __future__ import annotations

import numpy as np


def divide_into_clips(
    seq_joints: np.ndarray, seq_params: np.ndarray, clip_len: int
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Cut a sequence into non-overlapping clip_len windows; drop the remainder
    (reference dataloader_amass.py:121-131)."""
    n = len(seq_joints)
    joints, params = [], []
    for i in range(n // clip_len):
        joints.append(seq_joints[clip_len * i : clip_len * (i + 1)])
        params.append(seq_params[clip_len * i : clip_len * (i + 1)])
    return joints, params


def overlapping_windows(n_frames: int, clip_len: int, overlap_len: int) -> list[tuple[int, int]]:
    """Start/end indices of overlapping sliding windows over a long recording
    (reference dataloader_video.py:160-179: stride = clip_len - overlap_len)."""
    stride = clip_len - overlap_len
    assert stride > 0
    spans = []
    start = 0
    while start + clip_len <= n_frames:
        spans.append((start, start + clip_len))
        start += stride
    return spans
