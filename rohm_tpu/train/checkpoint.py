"""Checkpointing: orbax for pytrees, with reference-compatible naming.

The reference saves torch state_dicts as `runs/<id>/model{step:09d}.pt` every
save_interval steps (training_loop_trajnet.py:142-152) and keeps the
normalization stats (`AMASS_mean.pkl`/`AMASS_std.pkl`) in the same directory;
tests load stats from the checkpoint's directory (dataloader_amass.py:264-276).
We preserve that coupling: checkpoints are `model{step:09d}` orbax dirs inside
the logdir, next to the stats pkls written by the dataset.
"""

from __future__ import annotations

import os
import re

import numpy as np
import orbax.checkpoint as ocp


def ckpt_name(step: int) -> str:
    return f"model{step:09d}"


def save_checkpoint(logdir: str, step: int, params, opt_state=None) -> str:
    """Save params (and optionally optimizer state — the reference saves only
    model weights, so resume-with-optimizer is an upgrade, not a break)."""
    path = os.path.abspath(os.path.join(logdir, ckpt_name(step)))
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    with ocp.StandardCheckpointer() as saver:
        saver.save(path, payload)
    return path


def load_checkpoint(path: str, like=None):
    """Restore a checkpoint dict; `like` (same-structure pytree of arrays)
    enables exact dtype/shape restoration."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as loader:
        if like is not None:
            return loader.restore(path, like)
        return loader.restore(path)


def latest_checkpoint(logdir: str) -> str | None:
    """Highest-step model* checkpoint dir inside logdir, or None."""
    best, best_step = None, -1
    if not os.path.isdir(logdir):
        return None
    for name in os.listdir(logdir):
        m = re.fullmatch(r"model(\d{9})", name)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(logdir, name), int(m.group(1))
    return best


def load_params_into(params_like, ckpt_path: str):
    """Restore only the params subtree shaped like `params_like`."""
    restored = load_checkpoint(ckpt_path)
    out = restored["params"] if "params" in restored else restored

    import jax

    return jax.tree.map(lambda like, got: np.asarray(got, like.dtype), params_like, out)
