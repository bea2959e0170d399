"""Shared building blocks of the fused PoseNet encoder-layer kernels.

The bf16 and int8 kernels (and the int8 whole-stack variant) differ only in
how the four dense projections run (bf16 MXU vs W8A8 int8 MXU); attention,
the post-LN residual blocks and the tanh-gelu are identical and live here so
a numerics fix lands in one place.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LN_EPS = 1e-5  # torch layer_norm_eps default, matches the flax models


def attention_bf16(q, k, v, g: int, s: int, num_heads: int) -> jnp.ndarray:
    """Per-(sequence, head) attention. q/k/v [g*s, d] bf16 -> [g*s, d] bf16.

    bf16 GEMMs with f32 softmax; the 1/sqrt(dh) scale is folded into W_q at
    prepare time. Static python loops: g*num_heads is small (<=32) and every
    GEMM operand is a static slice."""
    d = q.shape[-1]
    dh = d // num_heads
    seq_outs = []
    for gi in range(g):
        r = slice(gi * s, (gi + 1) * s)
        head_outs = []
        for h in range(num_heads):
            c = slice(h * dh, (h + 1) * dh)
            scores = jax.lax.dot_general(
                q[r, c], k[r, c],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [S, S]
            probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
            head_outs.append(
                jnp.dot(probs, v[r, c], preferred_element_type=jnp.float32)
                .astype(jnp.bfloat16)
            )
        seq_outs.append(jnp.concatenate(head_outs, axis=-1))  # [S, D]
    return jnp.concatenate(seq_outs, axis=0)  # [g*s, D] bf16


def post_ln(y: jnp.ndarray, scale, bias) -> jnp.ndarray:
    """Post-LN in f32 with one-pass var = E[y^2] - mu^2 (y already residual-summed)."""
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(y * y, axis=-1, keepdims=True) - mu * mu
    return (y - mu) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-approx gelu — deviation from exact-erf gelu (<=1e-3) is below the
    bf16 activation rounding accepted by these kernels."""
    return 0.5 * x * (1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x)))


def fuse_qkv(attn: dict, d: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fuse a flax MultiHeadDotProductAttention scope's q/k/v projections into
    one [D, 3D] weight + [3D] bias (f32), with the attention scale 1/sqrt(dh)
    folded into W_q/b_q so the kernel skips the multiply."""
    num_heads = attn["query"]["kernel"].shape[-2] if attn["query"]["kernel"].ndim == 3 else 4
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)
    wqkv = jnp.concatenate(
        [
            attn["query"]["kernel"].reshape(d, d) * scale,
            attn["key"]["kernel"].reshape(d, d),
            attn["value"]["kernel"].reshape(d, d),
        ],
        axis=-1,
    ).astype(jnp.float32)
    bqkv = jnp.concatenate(
        [
            attn["query"]["bias"].reshape(d) * scale,
            attn["key"]["bias"].reshape(d),
            attn["value"]["bias"].reshape(d),
        ]
    ).astype(jnp.float32)
    return wqkv, bqkv


def posenet_prep_tail(params: dict, max_len: int) -> dict:
    """Embedding/head/timestep params shared by every fused-PoseNet prepare
    (tiny GEMMs, stay f32)."""
    from rohm_tpu.models.blocks import transformer_pe_table

    p = params["params"]
    d = p["input_process"]["kernel"].shape[-1]
    return {
        "pe": jnp.asarray(transformer_pe_table(max_len, d)),
        "t_w0": p["Dense_0"]["kernel"], "t_b0": p["Dense_0"]["bias"],
        "t_w1": p["Dense_1"]["kernel"], "t_b1": p["Dense_1"]["bias"],
        "in_w": p["input_process"]["kernel"], "in_b": p["input_process"]["bias"],
        "inc_w": p["input_process_cond"]["kernel"], "inc_b": p["input_process_cond"]["bias"],
        "out_w": p["output_process"]["kernel"], "out_b": p["output_process"]["bias"],
    }
