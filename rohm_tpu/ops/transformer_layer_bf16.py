"""bf16 fused PoseNet encoder layer — the MXU-saturating production path.

Why a second kernel next to ops/transformer_layer.py (f32): on v5e the MXU's
native multiply is bf16 (197 TFLOP/s peak); the f32 kernel runs one sequence
per program, so every GEMM has 144 rows and pads to 2 sublane tiles of 128
(56% row utilization, measured ~123 TFLOP/s effective). This kernel:

  * groups G=8 sequences per program -> 1152-row GEMMs (9 x 128, zero pad)
  * stores weights and activations in bf16 (cast ONCE, outside the sampling
    scan, via `prepare_posenet_fused`), accumulates every matmul in f32
    (`preferred_element_type`), keeps softmax / LayerNorm / residuals in f32
  * fuses the q/k/v projections into one [D, 3D] GEMM

Numerics: bf16 operands + f32 accumulation is the same arithmetic the MXU
already used for the f32 kernel's multiplies (TPU default matmul precision);
the extra rounding is on stored activations only. Parity with the flax path
is asserted in tests/test_ops.py within the 1%-metric envelope.

Inference-only, like the f32 kernel (sampling never differentiates through
model params; guidance takes grads wrt pred_x0 outside the model).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rohm_tpu.ops.kernel_common import (
    attention_bf16,
    fuse_qkv,
    gelu_tanh,
    posenet_prep_tail,
    post_ln,
)
from rohm_tpu.ops.transformer_layer import _default_interpret


def _layer_kernel_bf16(
    x_ref,                 # [G, S, D] bf16
    wqkv_ref, bqkv_ref,    # [D, 3D] bf16, [3D] bf16 (the dot result is
                           # already rounded to bf16 before the bias add, so
                           # a f32 bias would buy nothing; the int8 kernel's
                           # f32 bias adds onto a f32 accumulator instead)
    wo_ref, bo_ref,        # [D, D] bf16, [D] f32
    ln1_s_ref, ln1_b_ref,  # [D] f32
    w1_ref, b1_ref,        # [D, F] bf16, [F] f32
    w2_ref, b2_ref,        # [F, D] bf16, [D] f32
    ln2_s_ref, ln2_b_ref,  # [D] f32
    out_ref,               # [G, S, D] bf16
    *, num_heads: int,
):
    g, s, d = x_ref.shape

    x = x_ref[:].reshape(g * s, d)  # bf16
    # f32 accumulate (Mosaic requires a 32-bit acc), single rounding to bf16.
    # The attention scale 1/sqrt(dh) is folded into W_q at prepare time.
    qkv = (
        jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
        .astype(jnp.bfloat16)
        + bqkv_ref[:]
    )
    q = qkv[:, :d]
    k = qkv[:, d : 2 * d]
    v = qkv[:, 2 * d :]

    # attention per (sequence, head): [S, dh] x [dh, S] -> f32 softmax ->
    # bf16 probs x [S, dh]. Static python loops: G*H is small (32) and every
    # GEMM operand is a static slice; outputs reassemble via concatenation.
    attn = attention_bf16(q, k, v, g, s, num_heads)
    attn = jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32) + bo_ref[:]

    # post-LN residual 1 (f32 stats)
    y = post_ln(x.astype(jnp.float32) + attn, ln1_s_ref[:], ln1_b_ref[:])

    # feed-forward (bf16 GEMMs; tanh-gelu — its deviation from exact-erf gelu
    # (<=1e-3) is below the bf16 activation rounding already accepted here)
    yb = y.astype(jnp.bfloat16)
    h1 = jnp.dot(yb, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h1 = gelu_tanh(h1)
    h2 = (
        jnp.dot(h1.astype(jnp.bfloat16), w2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[:]
    )

    # post-LN residual 2 (f32), emit bf16 for the next layer
    out = post_ln(y + h2, ln2_s_ref[:], ln2_b_ref[:])
    out_ref[:] = out.astype(jnp.bfloat16).reshape(g, s, d)


def prepare_layer_bf16(layer: dict) -> tuple:
    """Cast/fuse one flax encoder-layer scope for the bf16 kernel. Call ONCE
    outside the sampling scan (round-1 lesson: per-step casts inside the scan
    cost more than they save)."""
    d = layer["LayerNorm_0"]["scale"].shape[-1]
    attn = layer["MultiHeadDotProductAttention_0"]
    wqkv, bqkv = fuse_qkv(attn, d)
    f32 = lambda a: a.astype(jnp.float32)
    bf16 = lambda a: a.astype(jnp.bfloat16)
    return (
        bf16(wqkv), bf16(bqkv),
        bf16(attn["out"]["kernel"].reshape(d, d)), f32(attn["out"]["bias"]),
        f32(layer["LayerNorm_0"]["scale"]), f32(layer["LayerNorm_0"]["bias"]),
        bf16(layer["Dense_0"]["kernel"]), f32(layer["Dense_0"]["bias"]),
        bf16(layer["Dense_1"]["kernel"]), f32(layer["Dense_1"]["bias"]),
        f32(layer["LayerNorm_1"]["scale"]), f32(layer["LayerNorm_1"]["bias"]),
    )


def fused_encoder_layer_bf16(
    x: jnp.ndarray, prepared: tuple, num_heads: int = 4,
    interpret: bool | None = None, group: int | None = None,
) -> jnp.ndarray:
    """One fused bf16 encoder layer. x [B, S, D] bf16 -> [B, S, D] bf16."""
    if interpret is None:
        interpret = _default_interpret()
    b, s, d = x.shape
    if group is None:
        group = next(gr for gr in (8, 4, 2, 1) if b % gr == 0)
    f = prepared[6].shape[-1]

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((group, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ]
    in_specs += [full(a.shape) for a in prepared]

    flops = 2 * s * d * (4 * d + 2 * f) + 4 * s * s * d
    return pl.pallas_call(
        partial(_layer_kernel_bf16, num_heads=num_heads),
        grid=(b // group,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (group, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * flops,
            bytes_accessed=2 * (2 * b * s * d + 4 * d * d + 2 * d * f),
            transcendentals=b * s * (f + s * num_heads),
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), *prepared)


def prepare_posenet_fused(params: dict, num_layers: int = 8, max_len: int = 5000):
    """One-time preprocessing of a PoseNet param tree for the bf16 path:
    per-layer fused/cast weights + f32 embedding/head params + PE table."""
    p = params["params"]
    return {
        "layers": tuple(prepare_layer_bf16(p[f"layer_{i}"]) for i in range(num_layers)),
        **posenet_prep_tail(params, max_len),
    }


def embed_cond(prep: dict, cond: jnp.ndarray) -> jnp.ndarray:
    """Project the (step-invariant) condition once, OUTSIDE the sampling scan
    — the reference recomputes input_process_cond every one of its 1000 steps
    (posenet.py:86-87); here it is hoisted out entirely."""
    return cond @ prep["inc_w"] + prep["inc_b"]


def posenet_apply_prepared(
    prep: dict, x_t: jnp.ndarray, cond: jnp.ndarray, t: jnp.ndarray,
    num_heads: int = 4, traj_feat_dim: int = 22, interpret: bool | None = None,
    cond_emb: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """PoseNet forward on a `prepare_posenet_fused` tree (eval mode).

    Same contract as models/posenet.py PoseNet.apply / reference
    model/posenet.py:76-96: x_t/cond [B, T, 294] -> [B, T, 294] with the
    cond's traj dims passed through. Pass `cond_emb=embed_cond(prep, cond)`
    when calling inside a sampling scan to hoist the constant projection.
    """
    bsz, seq_len, _ = x_t.shape
    if t.ndim == 0:
        t = jnp.broadcast_to(t, (bsz,))
    pe = prep["pe"]

    emb = pe[t] @ prep["t_w0"] + prep["t_b0"]
    emb = jax.nn.silu(emb)
    emb = emb @ prep["t_w1"] + prep["t_b1"]

    if cond_emb is None:
        cond_emb = embed_cond(prep, cond)
    h = x_t @ prep["in_w"] + prep["in_b"] + cond_emb
    seq = jnp.concatenate([emb[:, None, :], h], axis=1)
    seq = (seq + pe[None, : seq_len + 1, :]).astype(jnp.bfloat16)

    # kernel selection is structural (pytree-safe under jit): the int8-mega
    # prep carries "layers_stacked" (16 arrays with a leading [L] dim, whole
    # stack in one Pallas program); per-layer int8 preps carry 16-tuples
    # under "layers"; bf16 preps carry 12-tuples
    if "layers_stacked" in prep:
        from rohm_tpu.ops.transformer_layer_int8 import fused_encoder_stack_int8

        seq = fused_encoder_stack_int8(
            seq, prep["layers_stacked"], num_heads, interpret=interpret
        )
    elif "layers_qattn" in prep:
        from rohm_tpu.ops.transformer_layer_int8 import fused_encoder_layer_int8

        for layer in prep["layers_qattn"]:
            seq = fused_encoder_layer_int8(
                seq, layer, num_heads, interpret=interpret, qattn=True
            )
    else:
        if len(prep["layers"][0]) == 16:
            from rohm_tpu.ops.transformer_layer_int8 import fused_encoder_layer_int8

            layer_fn = fused_encoder_layer_int8
        else:
            layer_fn = fused_encoder_layer_bf16
        for layer in prep["layers"]:
            seq = layer_fn(seq, layer, num_heads, interpret=interpret)

    out = seq[:, 1:].astype(jnp.float32) @ prep["out_w"] + prep["out_b"]
    return jnp.concatenate([cond[..., :traj_feat_dim], out], axis=-1)
