"""TrajNet: conditional 1-D temporal U-Net predicting the clean traj repr x0.

Structure mirrors reference model/trajnet.py:80-275:
- a condition encoder ingests the noisy/masked input trajectory; its four
  per-scale feature maps are concatenated into every U-Net encoder downsample
- the diffusion U-Net denoises x_t given the timestep embedding
- optional ControlNet branch (TrajControl, trajnet.py:10-75): a copy of the
  U-Net encoder fed with local-pose features through a zero conv, producing
  five zero-conv residuals added at the mid block and each decoder stage.

Layout: [B, T, traj_feat_dim]; T must be divisible by 16 (4 downsamples).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from rohm_tpu.models.blocks import (
    Conv1dBlock,
    Downsample1d,
    ResidualTemporalBlock,
    TimeMlp,
    Upsample1d,
    ZeroConv1x1,
)


class CondEncoder(nn.Module):
    """Noisy-trajectory encoder; returns 4 feature maps at T, T/2, T/4, T/8."""

    mid_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cond: jnp.ndarray) -> list[jnp.ndarray]:
        m, dt = self.mid_dim, self.dtype
        h = []
        x = ResidualTemporalBlock(m // 8, input_t=False, dtype=dt)(cond, None)
        h.append(x)
        x = Downsample1d(dtype=dt)(x)
        x = ResidualTemporalBlock(m // 4, input_t=False, dtype=dt)(x, None)
        h.append(x)
        x = Downsample1d(dtype=dt)(x)
        x = ResidualTemporalBlock(m // 2, input_t=False, dtype=dt)(x, None)
        h.append(x)
        x = Downsample1d(dtype=dt)(x)
        x = ResidualTemporalBlock(m, input_t=False, dtype=dt)(x, None)
        h.append(x)
        return h


class ControlNet(nn.Module):
    """TrajControl branch: zero-conv'd copy of the U-Net encoder."""

    traj_feat_dim: int
    mid_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, control_cond: jnp.ndarray, h_cond: list[jnp.ndarray], t_embed: jnp.ndarray
    ) -> tuple[jnp.ndarray, ...]:
        m = self.mid_dim
        x = ZeroConv1x1(self.traj_feat_dim)(control_cond)

        x = ResidualTemporalBlock(m // 8, dtype=self.dtype)(x, t_embed)
        zc1 = ZeroConv1x1(32)(x)
        x = Downsample1d(dtype=self.dtype)(jnp.concatenate([x, h_cond[0]], axis=-1))

        x = ResidualTemporalBlock(m // 4, dtype=self.dtype)(x, t_embed)
        zc2 = ZeroConv1x1(m // 8)(x)
        x = Downsample1d(dtype=self.dtype)(jnp.concatenate([x, h_cond[1]], axis=-1))

        x = ResidualTemporalBlock(m // 2, dtype=self.dtype)(x, t_embed)
        zc3 = ZeroConv1x1(m // 4)(x)
        x = Downsample1d(dtype=self.dtype)(jnp.concatenate([x, h_cond[2]], axis=-1))

        x = ResidualTemporalBlock(m, dtype=self.dtype)(x, t_embed)
        zc4 = ZeroConv1x1(m // 2)(x)
        x = Downsample1d(dtype=self.dtype)(jnp.concatenate([x, h_cond[3]], axis=-1))

        x = ResidualTemporalBlock(m, dtype=self.dtype)(x, t_embed)
        x = ResidualTemporalBlock(m, dtype=self.dtype)(x, t_embed)
        zc_mid = ZeroConv1x1(m)(x)
        return zc1, zc2, zc3, zc4, zc_mid


class TrajNet(nn.Module):
    """U-Net denoiser for the trajectory repr (13-d abs-only or 22-d full)."""

    traj_feat_dim: int = 13
    cond_dim: int = 13
    mid_dim: int = 512
    time_dim: int = 32
    trajcontrol: bool = False
    control_cond_dim: int = 272
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x_t: jnp.ndarray,  # [B, T, traj_feat_dim]
        cond: jnp.ndarray,  # [B, T, cond_dim]
        t: jnp.ndarray,  # [B] or scalar int timesteps
        control_cond: jnp.ndarray | None = None,  # [B, T, 272]
        train: bool = False,
    ) -> jnp.ndarray:
        if t.ndim == 0:
            t = jnp.broadcast_to(t, (x_t.shape[0],))
        t_embed = TimeMlp(self.time_dim, dtype=self.dtype)(t)  # [B, 32]
        m = self.mid_dim

        h_cond = CondEncoder(self.mid_dim, dtype=self.dtype)(cond)

        if self.trajcontrol:
            assert control_cond is not None, "trajcontrol model needs control_cond"
            zc1, zc2, zc3, zc4, zc_mid = ControlNet(self.traj_feat_dim, self.mid_dim, dtype=self.dtype)(
                control_cond, h_cond, t_embed
            )

        # encoder
        x = ResidualTemporalBlock(m // 8, dtype=self.dtype)(x_t, t_embed)
        h1 = x
        x = Downsample1d(dtype=self.dtype)(jnp.concatenate([x, h_cond[0]], axis=-1))
        x = ResidualTemporalBlock(m // 4, dtype=self.dtype)(x, t_embed)
        h2 = x
        x = Downsample1d(dtype=self.dtype)(jnp.concatenate([x, h_cond[1]], axis=-1))
        x = ResidualTemporalBlock(m // 2, dtype=self.dtype)(x, t_embed)
        h3 = x
        x = Downsample1d(dtype=self.dtype)(jnp.concatenate([x, h_cond[2]], axis=-1))
        x = ResidualTemporalBlock(m, dtype=self.dtype)(x, t_embed)
        h4 = x
        x = Downsample1d(dtype=self.dtype)(jnp.concatenate([x, h_cond[3]], axis=-1))

        # middle
        x = ResidualTemporalBlock(m, dtype=self.dtype)(x, t_embed)
        x = ResidualTemporalBlock(m, dtype=self.dtype)(x, t_embed)
        if self.trajcontrol:
            x = x + zc_mid

        # decoder
        x = Upsample1d(dtype=self.dtype)(x)
        x = ResidualTemporalBlock(m // 2, dtype=self.dtype)(jnp.concatenate([x, h4], axis=-1), t_embed)
        if self.trajcontrol:
            x = x + zc4
        x = Upsample1d(dtype=self.dtype)(x)
        x = ResidualTemporalBlock(m // 4, dtype=self.dtype)(jnp.concatenate([x, h3], axis=-1), t_embed)
        if self.trajcontrol:
            x = x + zc3
        x = Upsample1d(dtype=self.dtype)(x)
        x = ResidualTemporalBlock(m // 8, dtype=self.dtype)(jnp.concatenate([x, h2], axis=-1), t_embed)
        if self.trajcontrol:
            x = x + zc2
        x = Upsample1d(dtype=self.dtype)(x)
        x = ResidualTemporalBlock(32, dtype=self.dtype)(jnp.concatenate([x, h1], axis=-1), t_embed)
        if self.trajcontrol:
            x = x + zc1

        x = Conv1dBlock(32, kernel_size=5, dtype=self.dtype)(x)
        return nn.Conv(self.traj_feat_dim, (1,))(x.astype(jnp.float32))
