"""PoseNet: transformer-encoder denoiser for the full 294-d body repr.

Structure mirrors reference model/posenet.py:11-96:
- x_t and condition each pass their own linear embedding, then are SUMMED
- a timestep token (PE-table lookup -> SiLU MLP) is prepended to the sequence
- sinusoidal positional encoding over the T+1 tokens, dropout
- 8-layer post-LN transformer (d=512, 4 heads, ff=1024, gelu)
- linear head emits the 272-d pose part; the given trajectory (first 22 dims
  of the condition) is concatenated back so the output is the full 294 dims.

Layout: [B, T, 294]; any T (no downsampling).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from rohm_tpu.models.blocks import TransformerEncoderLayer, transformer_pe_table
from rohm_tpu.reprs.schema import TRAJ_FEAT_DIM_FULL


class PoseNet(nn.Module):
    body_feat_dim: int = 294
    pose_feat_dim: int = 272
    traj_feat_dim: int = TRAJ_FEAT_DIM_FULL  # 22: traj dims passed through
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    dropout: float = 0.1
    max_len: int = 5000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x_t: jnp.ndarray,  # [B, T, 294]
        cond: jnp.ndarray,  # [B, T, 294]
        t: jnp.ndarray,  # [B] or scalar int timesteps
        train: bool = False,
    ) -> jnp.ndarray:
        bsz, seq_len, _ = x_t.shape
        if t.ndim == 0:
            t = jnp.broadcast_to(t, (bsz,))

        pe = jnp.asarray(transformer_pe_table(self.max_len, self.latent_dim))

        # timestep token: PE lookup + SiLU MLP (heads.py:132-147)
        emb = nn.Dense(self.latent_dim, dtype=self.dtype)(pe[t])
        emb = nn.silu(emb)
        emb = nn.Dense(self.latent_dim, dtype=self.dtype)(emb)  # [B, latent]

        x = nn.Dense(self.latent_dim, name="input_process", dtype=self.dtype)(x_t)
        c = nn.Dense(self.latent_dim, name="input_process_cond", dtype=self.dtype)(cond)
        h = x + c  # [B, T, latent]

        seq = jnp.concatenate([emb[:, None, :], h], axis=1)  # [B, T+1, latent]
        seq = seq + pe[None, : seq_len + 1, :]
        seq = nn.Dropout(self.dropout, deterministic=not train)(seq)

        for i in range(self.num_layers):
            seq = TransformerEncoderLayer(
                self.latent_dim, self.num_heads, self.ff_size, self.dropout,
                dtype=self.dtype, name=f"layer_{i}",
            )(seq, train=train)

        out = nn.Dense(self.pose_feat_dim, name="output_process")(
            seq[:, 1:].astype(jnp.float32)
        )  # drop t token
        given_traj = cond[..., : self.traj_feat_dim]
        return jnp.concatenate([given_traj, out], axis=-1)  # [B, T, 294]
