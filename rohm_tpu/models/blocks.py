"""Shared NN blocks (reference model/heads.py), Flax edition, NWC layout.

Structural parity notes:
- Conv1dBlock = Conv(k, SAME) -> GroupNorm(8) -> Mish (heads.py:90-106)
- ResidualTemporalBlock = 2x Conv1dBlock + mid-injected time MLP + 1x1
  residual conv (heads.py:20-54)
- Downsample1d = stride-2 conv k=3; Upsample1d = stride-2 transposed conv k=4
  (heads.py:72-87)
- SinusoidalPosEmb (heads.py:57-69); PositionalEncoding / TimestepEmbedder
  (heads.py:112-147)
- zero-initialized 1x1 convs for the ControlNet branch (heads.py:12-18)
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
import jax.numpy as jnp
from flax import linen as nn


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(nn.softplus(x))


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Diffuser-style timestep embedding: t [B] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) / (half - 1) * jnp.arange(half))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def transformer_pe_table(max_len: int, d_model: int) -> np.ndarray:
    """Classic sin/cos interleaved positional table [max_len, d_model]."""
    # float32 like the reference (heads.py:117-122): the f64 table differs by
    # ~1e-4 in fast-frequency dims at large positions/timesteps
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * np.float32(-np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe.astype(np.float32)


# Implementation of the k-tap SAME convs in Conv1dBlock: "native" (XLA conv)
# or "im2col" (unfold + one matmul — same math, same param tree; its backward
# is two plain matmuls, dodging XLA's slow bf16 conv-backward path on v5e,
# see scripts/bench_conv_im2col.py). Module-level default so ablations can
# flip every block at once without threading a field through each model.
#
# TRACE-TIME SEMANTICS: this global is read inside Conv1dBlock.__call__, i.e.
# at jax TRACE time, and is NOT part of any jit cache key. Set it BEFORE the
# first jit trace of a model apply (as scripts/profile_train_trajnet.py does)
# and do not flip it afterwards in the same process: an already-traced
# program silently keeps the impl it was traced with, and the flip is not
# thread-safe. For per-model control that survives retracing, pass
# Conv1dBlock(conv_impl=...) explicitly instead.
DEFAULT_CONV_IMPL = "native"


class Im2colConv(nn.Module):
    """Conv1d(k, SAME, correlation) as unfold + one [B*T, k*C] @ [k*C, F]
    matmul. Param tree is IDENTICAL to flax nn.Conv (kernel [k, C, F],
    bias [F], same initializers) so checkpoints interchange freely; when used
    inside Conv1dBlock it is instantiated as name="Conv_0" to keep the exact
    native tree path.

    Memory cost: the unfolded [B, T, k*C] activation is materialized in the
    forward pass AND saved for the backward (k× the input activation, k=5 in
    Conv1dBlock), so at production widths this trades peak HBM for the faster
    bf16 matmul backward — part of the speed-vs-HBM ablation, not a free win."""

    features: int
    kernel_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, C = x.shape
        k = self.kernel_size
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, C, self.features), jnp.float32
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        lo = (k - 1) // 2  # flax SAME padding for odd/even k
        xp = jnp.pad(x, ((0, 0), (lo, k - 1 - lo), (0, 0)))
        # tap-major column order matches kernel.reshape(k*C, F) row-major
        cols = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(xp, i, T, axis=1) for i in range(k)],
            axis=-1,
        )  # [B, T, k*C]
        y = cols.astype(self.dtype) @ w.reshape(k * C, self.features).astype(self.dtype)
        return y + b.astype(self.dtype)


class Conv1dBlock(nn.Module):
    """Conv1d(k, SAME) -> GroupNorm(8) -> Mish, on [B, T, C].

    dtype: computation dtype for the conv (bf16 rides the MXU on TPU);
    GroupNorm statistics always accumulate in float32.
    conv_impl: "native" | "im2col" (None -> DEFAULT_CONV_IMPL); both produce
    the same params and the same math — im2col trades the XLA conv op for an
    unfold+matmul whose bf16 backward is fast on v5e."""

    features: int
    kernel_size: int = 5
    n_groups: int = 8
    dtype: Any = jnp.float32
    conv_impl: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        impl = self.conv_impl or DEFAULT_CONV_IMPL
        if impl == "im2col":
            x = Im2colConv(self.features, self.kernel_size, dtype=self.dtype,
                           name="Conv_0")(x)
        else:
            x = nn.Conv(self.features, (self.kernel_size,), padding="SAME", dtype=self.dtype)(x)
        # epsilon matches torch nn.GroupNorm's default 1e-5 (flax defaults
        # to 1e-6) so converted reference checkpoints reproduce exactly.
        # dtype rides the block dtype: flax force-promotes the mean/var
        # reductions to f32 internally regardless, so bf16 here only avoids
        # materializing f32 activations between bf16 convs (the cast
        # ping-pong that made bf16 TrajNet REGRESS in round 3)
        x = nn.GroupNorm(num_groups=self.n_groups, epsilon=1e-5, dtype=self.dtype)(x)
        return mish(x)


class ResidualTemporalBlock(nn.Module):
    """Two Conv1dBlocks with a timestep embedding injected between them."""

    features: int
    input_t: bool = True
    kernel_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t_embed: jnp.ndarray | None) -> jnp.ndarray:
        out = Conv1dBlock(self.features, self.kernel_size, dtype=self.dtype)(x)
        if self.input_t:
            assert t_embed is not None
            h = nn.Dense(self.features, dtype=self.dtype)(mish(t_embed))  # [B, C]
            out = out + h[:, None, :]
        out = Conv1dBlock(self.features, self.kernel_size, dtype=self.dtype)(out)
        if x.shape[-1] != self.features:
            res = nn.Conv(self.features, (1,), dtype=self.dtype)(x)
        else:
            res = x
        return out + res


class Downsample1d(nn.Module):
    """Stride-2 conv k=3, explicit pad (1,1): bit-exact torch Conv1d(3,2,1)
    window alignment (heads.py:72-78); T even -> T/2."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(x.shape[-1], (3,), strides=(2,), padding=((1, 1),), dtype=self.dtype)(x)


class Upsample1d(nn.Module):
    """Transposed conv k=4 s=2 p=1 with exact torch ConvTranspose1d semantics
    (heads.py:81-87): input dilated by 2, padded (k-1-p)=2, convolved with the
    flipped kernel; T -> 2T. Kernel stored in flax layout [k, in, out]."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (4, c, c))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            jnp.flip(kernel, axis=0).astype(self.dtype),
            window_strides=(1,),
            padding=((2, 2),),
            lhs_dilation=(2,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias


class ZeroConv1x1(nn.Module):
    """1x1 conv with zero-initialized weights (ControlNet residual taps)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.features,
            (1,),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(x)


class TimeMlp(nn.Module):
    """Sinusoidal embedding -> Linear(4x) -> Mish -> Linear (trajnet.py:120-125)."""

    time_dim: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        h = sinusoidal_pos_emb(t, self.time_dim)
        h = nn.Dense(self.time_dim * 4, dtype=self.dtype)(h)
        h = mish(h)
        return nn.Dense(self.time_dim, dtype=self.dtype)(h)


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer (PyTorch default norm placement, activation gelu)."""

    d_model: int
    num_heads: int
    ff_size: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=not train,
            dtype=self.dtype,
        )(x, x)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        # epsilon 1e-5 = torch TransformerEncoderLayer's layer_norm_eps default
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x + attn)

        h = nn.Dense(self.ff_size, dtype=self.dtype)(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x + h)
