"""Training loops for TrajNet and PoseNet.

Parity targets: reference train/training_loop_trajnet.py:16-153 and
train/training_loop_posenet.py:15-303. Differences by design:
- masking curricula are vectorized numpy (rohm_tpu/train/masking.py), not
  per-sample python loops
- the optimizer step is one fused jitted program (rohm_tpu/train/steps.py)
- eval-during-training samples the full reverse chain as one compiled scan
- checkpoints are orbax dirs named model{step:09d} next to the stats pkls
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from rohm_tpu.diffusion import DiffusionSchedule
from rohm_tpu.models.losses import posenet_losses, trajnet_losses
from rohm_tpu.reprs.schema import TRAJ_FEAT_DIM_FULL
from rohm_tpu.train.checkpoint import save_checkpoint
from rohm_tpu.train.masking import (
    posenet_eval_cond_mask,
    posenet_train_cond_mask,
    traj_infill_mask,
)
from rohm_tpu.train.state import TrainState, create_train_state
from rohm_tpu.train.steps import (
    make_posenet_sampler,
    make_posenet_train_step,
    make_trajnet_sampler,
    make_trajnet_train_step,
)

logger = logging.getLogger("rohm_tpu.train")


def _log_losses(writer, logger_, tag, losses, step, epoch):
    for key, val in losses.items():
        v = float(val)
        if writer is not None:
            writer.add_scalar(f"{tag}/{key}", v, step)
        msg = f"[Step {step:d}/ Epoch {epoch:d}] [{tag}]  {key}: {v:.10f}"
        logger_.info(msg)


class _CheckpointMixin:
    """Shared save/restore for both train loops (identical semantics)."""

    last_losses: dict = None  # most recent train-step loss dict (tests/monitoring)

    def save(self):
        save_checkpoint(
            self.logdir, self.step, self.state.params,
            opt_state=self.state.opt_state if self.save_optimizer else None,
        )
        self.logger.info("[*] model saved")

    def restore(self, ckpt_path: str):
        """Resume params (+ optimizer state when present) from an orbax dir;
        step resumes from the checkpoint's name."""
        import os
        import re

        from rohm_tpu.train.checkpoint import load_checkpoint

        like = {"params": self.state.params, "opt_state": self.state.opt_state}
        try:
            restored = load_checkpoint(ckpt_path, like)
            self.state = self.state.replace(
                params=restored["params"], opt_state=restored["opt_state"]
            )
            self.logger.info("restored params + optimizer state from %s", ckpt_path)
        except Exception:
            restored = load_checkpoint(ckpt_path, {"params": self.state.params})
            self.state = self.state.replace(params=restored["params"])
            self.logger.info("restored params (no optimizer state) from %s", ckpt_path)
        m = re.search(r"model(\d+)$", os.path.basename(ckpt_path.rstrip("/")))
        if m:
            self.step = int(m.group(1))


class TrainLoopTrajNet(_CheckpointMixin):
    """Reference train/training_loop_trajnet.py:16-153."""

    def __init__(
        self,
        model,
        params,
        sched_train: DiffusionSchedule,
        sched_eval: DiffusionSchedule,
        train_dataset,
        test_dataset,
        body_model,
        loss_weights: dict,
        logdir: str,
        batch_size: int = 64,
        lr: float = 1e-4,
        weight_decay: float = 0.0,
        num_steps: int = 100,
        log_interval: int = 100,
        save_interval: int = 25000,
        start_infill_epoch: int = 10**9,
        mask_prob: float = 0.0,
        max_infill_ratio: float = 0.0,
        repr_abs_only: bool = True,
        trajcontrol: bool = False,
        frozen_mask=None,
        writer=None,
        seed: int = 0,
        mesh=None,
        run_logger=None,
        save_optimizer: bool = False,
    ):
        self.model = model
        self.logger = run_logger or logger
        self.save_optimizer = save_optimizer
        self.train_dataset = train_dataset
        self.test_dataset = test_dataset
        self.batch_size = batch_size
        self.num_steps = num_steps
        self.log_interval = log_interval
        self.save_interval = save_interval
        self.start_infill_epoch = start_infill_epoch
        self.mask_prob = mask_prob
        self.max_infill_ratio = max_infill_ratio
        self.trajcontrol = trajcontrol
        self.logdir = logdir
        self.writer = writer
        self.repr_abs_only = repr_abs_only
        self.traj_feat_dim = train_dataset.traj_feat_dim
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.mesh = mesh

        self.state: TrainState = create_train_state(params, lr, weight_decay, frozen_mask)
        mean = jnp.asarray(train_dataset.mean)
        std = jnp.asarray(train_dataset.std)
        self.train_step = make_trajnet_train_step(
            model, sched_train, mean, std, body_model, loss_weights,
            repr_abs_only, self.traj_feat_dim, mesh,
        )
        self.sampler = make_trajnet_sampler(model, sched_eval, self.traj_feat_dim, mesh)
        self.eval_loss_fn = jax.jit(
            lambda out, clean: trajnet_losses(
                out, clean, mean, std, body_model, loss_weights, repr_abs_only
            )
        )
        self.step = 0

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def run_loop(self):
        # batches() drops a short tail (drop_last, fixed shapes for jit), so a
        # batch_size larger than the dataset would yield ZERO batches and the
        # loop would silently save a step-0 (untrained) checkpoint — fail loud
        assert len(self.train_dataset) >= self.batch_size, (
            f"batch_size {self.batch_size} exceeds the train dataset "
            f"({len(self.train_dataset)} clips): the epoch loader would be "
            "empty and no training would happen"
        )
        steps_per_epoch = max(len(self.train_dataset) // self.batch_size, 1)
        num_epochs = self.num_steps // steps_per_epoch + 1
        for epoch in range(num_epochs):
            for batch in self.train_dataset.batches(self.batch_size, seed=epoch):
                if epoch >= self.start_infill_epoch and self.rng.uniform() > 1 - self.mask_prob:
                    bs, clip_len = batch["cond"].shape[:2]
                    m = traj_infill_mask(self.rng, bs, clip_len, self.max_infill_ratio)
                    batch["cond"] = batch["cond"] * m[..., None]
                if not self.trajcontrol:
                    batch.pop("control_cond", None)

                self.state, losses = self.train_step(self.state, batch, self._next_key())
                self.last_losses = losses

                if self.step % self.log_interval == 0 and self.step > 0:
                    _log_losses(self.writer, self.logger, "train", losses, self.step, epoch)
                    self._eval(epoch)
                if self.step % self.save_interval == 0 and self.step > 0:
                    self.save()
                self.step += 1
                if self.step >= self.num_steps:
                    break

    def _eval(self, epoch):
        agg, n = None, 0
        for batch in self.test_dataset.batches(self.batch_size, shuffle=False):
            cc = batch.get("control_cond") if self.trajcontrol else None
            out = self.sampler(
                self.state.params, jnp.asarray(batch["cond"]), self._next_key(), cc
            )
            losses = self.eval_loss_fn(out, jnp.asarray(batch["motion_repr_clean"]))
            losses = {k: float(v) for k, v in losses.items()}
            agg = losses if agg is None else {k: agg[k] + losses[k] for k in agg}
            n += 1
        if agg:
            _log_losses(self.writer, self.logger, "eval", {k: v / n for k, v in agg.items()}, self.step, epoch)



class TrainLoopPoseNet(_CheckpointMixin):
    """Reference train/training_loop_posenet.py:15-303."""

    def __init__(
        self,
        model,
        params,
        sched_train: DiffusionSchedule,
        sched_eval: DiffusionSchedule,
        train_dataset,
        test_dataset,
        body_model,
        loss_weights: dict,
        logdir: str,
        batch_size: int = 64,
        lr: float = 1e-4,
        weight_decay: float = 0.0,
        num_steps: int = 100,
        log_interval: int = 100,
        save_interval: int = 25000,
        input_noise: bool = True,
        start_prox_mask_epoch: int = 10**9,
        start_skating_loss_epoch: int = 0,
        mask_scheme: str = "lower",
        prox_mask_bank: np.ndarray | None = None,
        writer=None,
        seed: int = 0,
        mesh=None,
        run_logger=None,
        save_optimizer: bool = False,
        fused_train: str = "",
    ):
        self.model = model
        self.logger = run_logger or logger
        self.save_optimizer = save_optimizer
        self.train_dataset = train_dataset
        self.test_dataset = test_dataset
        self.batch_size = batch_size
        self.num_steps = num_steps
        self.log_interval = log_interval
        self.save_interval = save_interval
        self.input_noise = input_noise
        self.start_prox_mask_epoch = start_prox_mask_epoch
        self.start_skating_loss_epoch = start_skating_loss_epoch
        self.mask_scheme = mask_scheme
        self.prox_mask_bank = prox_mask_bank
        self.logdir = logdir
        self.writer = writer
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)

        self.state: TrainState = create_train_state(params, lr, weight_decay)
        mean = jnp.asarray(train_dataset.mean)
        std = jnp.asarray(train_dataset.std)
        self.train_step = make_posenet_train_step(
            model, sched_train, mean, std, body_model, loss_weights, mesh,
            fused_train=fused_train or None,
        )
        self.sampler = make_posenet_sampler(model, sched_eval, mesh=mesh)
        self.eval_loss_fn = jax.jit(
            lambda out, clean: posenet_losses(
                out, clean, mean, std, body_model, loss_weights
            )
        )
        self.step = 0

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _make_cond(self, batch, epoch, train=True):
        """Condition = (noisy|clean) repr x curriculum visibility mask."""
        cond = (
            batch["motion_repr_noisy"] if self.input_noise else batch["motion_repr_clean"]
        ).copy()
        bs, clip_len = cond.shape[:2]
        if train:
            vis = posenet_train_cond_mask(
                self.rng, bs, clip_len, epoch, self.start_prox_mask_epoch,
                self.mask_scheme, self.prox_mask_bank, self.input_noise,
            )
        else:
            vis = posenet_eval_cond_mask(self.rng, bs, clip_len, self.input_noise)
        return cond * vis

    def run_loop(self):
        assert len(self.train_dataset) >= self.batch_size, (
            f"batch_size {self.batch_size} exceeds the train dataset "
            f"({len(self.train_dataset)} clips): the epoch loader would be "
            "empty and no training would happen"
        )
        steps_per_epoch = max(len(self.train_dataset) // self.batch_size, 1)
        num_epochs = self.num_steps // steps_per_epoch + 1
        for epoch in range(num_epochs):
            skating = jnp.asarray(float(epoch >= self.start_skating_loss_epoch))
            for batch in self.train_dataset.batches(self.batch_size, seed=epoch):
                step_batch = {
                    "motion_repr_clean": batch["motion_repr_clean"],
                    "cond": self._make_cond(batch, epoch, train=True),
                }
                self.state, losses = self.train_step(
                    self.state, step_batch, self._next_key(), skating
                )
                self.last_losses = losses
                if self.step % self.log_interval == 0 and self.step > 0:
                    _log_losses(self.writer, self.logger, "train", losses, self.step, epoch)
                    self._eval(epoch)
                if self.step % self.save_interval == 0 and self.step > 0:
                    self.save()
                self.step += 1
                if self.step >= self.num_steps:
                    break

    def _eval(self, epoch):
        agg, n = None, 0
        for batch in self.test_dataset.batches(self.batch_size, shuffle=False):
            cond = jnp.asarray(self._make_cond(batch, epoch, train=False))
            out = self.sampler(self.state.params, cond, self._next_key())
            losses = self.eval_loss_fn(out, jnp.asarray(batch["motion_repr_clean"]))
            losses = {k: float(v) for k, v in losses.items()}
            agg = losses if agg is None else {k: agg[k] + losses[k] for k in agg}
            n += 1
        if agg:
            _log_losses(self.writer, self.logger, "eval", {k: v / n for k, v in agg.items()}, self.step, epoch)

