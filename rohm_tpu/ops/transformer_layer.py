"""Fused PoseNet transformer encoder layer as a Pallas TPU kernel.

One kernel per (layer, batch-row): attention (qkv + softmax + out-proj),
post-LN residual, feed-forward (gelu), post-LN residual — all intermediates
live in VMEM. Numerically equivalent to models/blocks.py
TransformerEncoderLayer in eval mode (dropout off); parameters are read from
the SAME flax param tree, so converted checkpoints work unchanged.

Inference-only (no custom VJP): sampling never differentiates through the
model — test-time guidance takes grads of the loss wrt pred_x0, not params.
Training keeps the flax path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5  # torch layer_norm_eps default, matches the flax models


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """erf via Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7) — Pallas TPU has
    no erf/erfc lowering; only exp is needed."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _layer_kernel(
    x_ref,          # [1, S, D] input sequence block
    wq_ref, bq_ref,  # [D, D], [D]
    wk_ref, bk_ref,
    wv_ref, bv_ref,
    wo_ref, bo_ref,
    ln1_s_ref, ln1_b_ref,   # [D]
    w1_ref, b1_ref,          # [D, F], [F]
    w2_ref, b2_ref,          # [F, D], [D]
    ln2_s_ref, ln2_b_ref,
    out_ref,        # [1, S, D]
    *, num_heads: int,
):
    x = x_ref[0]  # [S, D]
    d = x.shape[-1]
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)

    q = jnp.dot(x, wq_ref[:], preferred_element_type=jnp.float32) + bq_ref[:]
    k = jnp.dot(x, wk_ref[:], preferred_element_type=jnp.float32) + bk_ref[:]
    v = jnp.dot(x, wv_ref[:], preferred_element_type=jnp.float32) + bv_ref[:]

    heads = []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        scores = jnp.dot(q[:, sl] * scale, k[:, sl].T,
                         preferred_element_type=jnp.float32)  # [S, S]
        probs = jax.nn.softmax(scores, axis=-1)
        heads.append(jnp.dot(probs, v[:, sl], preferred_element_type=jnp.float32))
    attn = jnp.concatenate(heads, axis=-1)  # [S, D]
    attn = jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32) + bo_ref[:]

    # post-LN residual 1
    y = x + attn
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    y = (y - mu) * jax.lax.rsqrt(var + LN_EPS) * ln1_s_ref[:] + ln1_b_ref[:]

    # feed-forward; exact-gelu via polynomial erf (no erf lowering in Pallas TPU)
    h1 = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h1 = 0.5 * h1 * (1.0 + _erf(h1 * 0.7071067811865476))
    h2 = jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]

    # post-LN residual 2
    z = y + h2
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean((z - mu) ** 2, axis=-1, keepdims=True)
    out_ref[0] = (z - mu) * jax.lax.rsqrt(var + LN_EPS) * ln2_s_ref[:] + ln2_b_ref[:]


def _layer_params(layer: dict, d: int):
    """Flatten one flax TransformerEncoderLayer param scope into kernel args."""
    attn = layer["MultiHeadDotProductAttention_0"]
    wq = attn["query"]["kernel"].reshape(d, d)
    wk = attn["key"]["kernel"].reshape(d, d)
    wv = attn["value"]["kernel"].reshape(d, d)
    bq = attn["query"]["bias"].reshape(d)
    bk = attn["key"]["bias"].reshape(d)
    bv = attn["value"]["bias"].reshape(d)
    wo = attn["out"]["kernel"].reshape(d, d)
    bo = attn["out"]["bias"].reshape(d)
    return (
        wq, bq, wk, bk, wv, bv, wo, bo,
        layer["LayerNorm_0"]["scale"], layer["LayerNorm_0"]["bias"],
        layer["Dense_0"]["kernel"], layer["Dense_0"]["bias"],
        layer["Dense_1"]["kernel"], layer["Dense_1"]["bias"],
        layer["LayerNorm_1"]["scale"], layer["LayerNorm_1"]["bias"],
    )


def _default_interpret() -> bool:
    """Pallas TPU kernels need a real TPU; interpret elsewhere (CPU tests)."""
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:
        return True


def fused_encoder_layer(x: jnp.ndarray, layer: dict, num_heads: int = 4,
                        interpret: bool | None = None) -> jnp.ndarray:
    """Apply one fused encoder layer. x [B, S, D]; layer = flax scope dict."""
    if interpret is None:
        interpret = _default_interpret()
    b, s, d = x.shape
    args = _layer_params(layer, d)
    f = layer["Dense_0"]["kernel"].shape[-1]

    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
    for a in args:
        in_specs.append(full(a.shape))

    flops = 2 * s * d * (4 * d + 2 * f) + 4 * s * s * d
    return pl.pallas_call(
        partial(_layer_kernel, num_heads=num_heads),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b * flops,
            bytes_accessed=4 * (2 * b * s * d + 4 * d * d + 2 * d * f),
            transcendentals=b * s * (f + s * num_heads),
        ),
        interpret=interpret,
    )(x.astype(jnp.float32), *args)


def posenet_apply_fused(params: dict, x_t: jnp.ndarray, cond: jnp.ndarray,
                        t: jnp.ndarray, num_layers: int = 8, num_heads: int = 4,
                        max_len: int = 5000, traj_feat_dim: int = 22,
                        interpret: bool | None = None) -> jnp.ndarray:
    """PoseNet forward with fused Pallas encoder layers (eval mode).

    Drop-in for PoseNet.apply on the same param tree
    (rohm_tpu/models/posenet.py): embeddings and output head stay as plain
    matmuls (XLA fuses those fine); the 8-layer stack runs as 8 kernels.
    """
    from rohm_tpu.models.blocks import transformer_pe_table

    p = params["params"]
    d = p["input_process"]["kernel"].shape[-1]
    bsz, seq_len, _ = x_t.shape
    if t.ndim == 0:
        t = jnp.broadcast_to(t, (bsz,))
    pe = jnp.asarray(transformer_pe_table(max_len, d))

    emb = pe[t] @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"]
    emb = jax.nn.silu(emb)
    emb = emb @ p["Dense_1"]["kernel"] + p["Dense_1"]["bias"]

    h = (
        x_t @ p["input_process"]["kernel"] + p["input_process"]["bias"]
        + cond @ p["input_process_cond"]["kernel"] + p["input_process_cond"]["bias"]
    )
    seq = jnp.concatenate([emb[:, None, :], h], axis=1)
    seq = seq + pe[None, : seq_len + 1, :]

    for i in range(num_layers):
        seq = fused_encoder_layer(seq, p[f"layer_{i}"], num_heads, interpret=interpret)

    out = seq[:, 1:] @ p["output_process"]["kernel"] + p["output_process"]["bias"]
    return jnp.concatenate([cond[..., :traj_feat_dim], out], axis=-1)
