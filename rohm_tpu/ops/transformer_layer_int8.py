"""int8 fused PoseNet encoder layer — W8A8 dense GEMMs on the v5e int8 MXU.

The bf16 kernel (transformer_layer_bf16.py) is dense-GEMM-bound: the four
projections (QKV, out, FF1, FF2) cost ~118 us of its ~157 us/layer at the
production shape, and the v5e MXU's bf16 peak (197 TFLOP/s) caps the whole
1000-step chain near ~1170 steps/s even at 100% utilization. The int8 MXU
path doubles the multiply rate (394 TOPS), so the dense floor halves.

Quantization scheme (chosen for robustness through a 1000-step iterative
sampler):
  * weights:   symmetric int8, ONE scale PER OUTPUT COLUMN, computed once at
               prepare time (prepare_layer_int8)
  * activations: symmetric int8, ONE scale PER ROW (token), computed inside
               the kernel right before each GEMM (dynamic; robust to
               per-token outliers)
  * every GEMM accumulates int32 and dequantizes to f32 as
               acc * (row_scale x col_scale) before the bias add
  * attention (scores/probs/PV) stays bf16 with f32 softmax — it is small
               (~17 us/layer) and the most numerically delicate part
  * LayerNorm / residuals / gelu stay f32, exactly as in the bf16 kernel

Inference-only, like the bf16 kernel. Parity envelope asserted in
tests/test_ops.py / tests/test_pipeline.py.
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


def _quant_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f32/bf16 [R, C] -> (int8 [R, C], f32 row scales [R, 1])."""
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
    q = jnp.clip(jnp.round(xf * (127.0 / amax)), -127.0, 127.0).astype(jnp.int8)
    return q, amax * (1.0 / 127.0)


def _dot_i8(qx, row_scale, w_q, col_scale):
    """int8 x int8 -> f32 with (row x col) rescale."""
    acc = jax.lax.dot_general(
        qx, w_q, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * row_scale * col_scale


def _quant_probs(p: jnp.ndarray) -> jnp.ndarray:
    """Softmax probs (in [0,1]) -> int8 at the FIXED scale 1/127 — no dynamic
    amax needed, so quantizing probs costs one round per element."""
    return jnp.round(p * 127.0).astype(jnp.int8)


def attention_int8(q, k, v, g: int, s: int, num_heads: int) -> jnp.ndarray:
    """Fully quantized attention: scores = i8(q) x i8(k)^T with per-row
    scales, f32 softmax, probs at fixed 1/127 scale x per-column-quantized V.

    Experimental throughput variant (qattn=True): moves the last bf16 GEMMs
    of the int8 layer onto the int8 MXU. Accuracy cost is bounded by the
    probs quantization step (1/254 absolute on attention weights); gate any
    production use on the e2e metric tests."""
    d = q.shape[-1]
    dh = d // num_heads
    seq_outs = []
    for gi in range(g):
        r = slice(gi * s, (gi + 1) * s)
        head_outs = []
        for h in range(num_heads):
            col = slice(h * dh, (h + 1) * dh)
            qq, rq = _quant_rows(q[r, col])
            kk, rk = _quant_rows(k[r, col])
            acc = jax.lax.dot_general(
                qq, kk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            scores = acc.astype(jnp.float32) * rq * rk.reshape(1, -1)
            pi = _quant_probs(jax.nn.softmax(scores, axis=-1))
            vf = v[r, col].astype(jnp.float32)
            vmax = jnp.maximum(jnp.max(jnp.abs(vf), axis=0, keepdims=True), 1e-12)
            vv = jnp.clip(jnp.round(vf * (127.0 / vmax)), -127.0, 127.0).astype(jnp.int8)
            o = jax.lax.dot_general(
                pi, vv, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            head_outs.append(
                (o.astype(jnp.float32) * (vmax / (127.0 * 127.0))).astype(jnp.bfloat16)
            )
        seq_outs.append(jnp.concatenate(head_outs, axis=-1))
    return jnp.concatenate(seq_outs, axis=0)  # [g*s, D] bf16


def _layer_kernel_int8(
    x_ref,                     # [G, S, D] bf16
    wqkv_ref, sqkv_ref, bqkv_ref,  # [D, 3D] i8, [3D] f32, [3D] f32
    wo_ref, so_ref, bo_ref,        # [D, D] i8, [D] f32, [D] f32
    ln1_s_ref, ln1_b_ref,          # [D] f32
    w1_ref, s1_ref, b1_ref,        # [D, F] i8, [F] f32, [F] f32
    w2_ref, s2_ref, b2_ref,        # [F, D] i8, [D] f32, [D] f32
    ln2_s_ref, ln2_b_ref,          # [D] f32
    out_ref,                   # [G, S, D] bf16
    *, num_heads: int, qattn: bool = False,
):
    g, s, d = x_ref.shape
    rows = g * s

    x = x_ref[:].reshape(rows, d)
    qx, rs = _quant_rows(x)
    qkv = (_dot_i8(qx, rs, wqkv_ref[:], sqkv_ref[:]) + bqkv_ref[:]).astype(jnp.bfloat16)
    q = qkv[:, :d]
    k = qkv[:, d : 2 * d]
    v = qkv[:, 2 * d :]

    if qattn:
        attn = attention_int8(q, k, v, g, s, num_heads)
    else:
        # attention stays bf16 GEMMs + f32 softmax — small (~17 us/layer) and
        # the most numerically delicate part (1/sqrt(dh) folded into the QKV
        # scales)
        attn = attention_bf16(q, k, v, g, s, num_heads)
    qa, ra = _quant_rows(attn)
    attn = _dot_i8(qa, ra, wo_ref[:], so_ref[:]) + bo_ref[:]

    # post-LN residual 1 (f32)
    y = post_ln(x.astype(jnp.float32) + attn, ln1_s_ref[:], ln1_b_ref[:])

    # feed-forward (int8 GEMMs, tanh-gelu in f32)
    qy, ry = _quant_rows(y)
    h1 = gelu_tanh(_dot_i8(qy, ry, w1_ref[:], s1_ref[:]) + b1_ref[:])
    qh, rh = _quant_rows(h1)
    h2 = _dot_i8(qh, rh, w2_ref[:], s2_ref[:]) + b2_ref[:]

    # post-LN residual 2 (f32), emit bf16 for the next layer
    out = post_ln(y + h2, ln2_s_ref[:], ln2_b_ref[:])
    out_ref[:] = out.astype(jnp.bfloat16).reshape(g, s, d)


def _mega_kernel_int8(
    x_ref,  # [G, S, D] bf16
    wqkv_ref, sqkv_ref, bqkv_ref,
    wo_ref, so_ref, bo_ref,
    ln1_s_ref, ln1_b_ref,
    w1_ref, s1_ref, b1_ref,
    w2_ref, s2_ref, b2_ref,
    ln2_s_ref, ln2_b_ref,   # all stacked with leading [L] dim
    out_ref,                # [G, S, D] bf16
    *, num_heads: int, num_layers: int,
):
    """All encoder layers in ONE program: activations stay VMEM-resident
    across layers (the per-layer kernel writes/reads [G,S,D] bf16 to HBM at
    every layer boundary — 7 round trips x 2 x 1.2 MB x (B/G) groups per
    step saved), and 7 of 8 kernel launches disappear."""
    g, s, d = x_ref.shape
    rows = g * s

    x = x_ref[:].reshape(rows, d)
    for l in range(num_layers):
        qx, rs = _quant_rows(x)
        qkv = (_dot_i8(qx, rs, wqkv_ref[l], sqkv_ref[l]) + bqkv_ref[l]).astype(jnp.bfloat16)
        attn = attention_bf16(qkv[:, :d], qkv[:, d : 2 * d], qkv[:, 2 * d :],
                              g, s, num_heads)
        qa, ra = _quant_rows(attn)
        attn = _dot_i8(qa, ra, wo_ref[l], so_ref[l]) + bo_ref[l]

        y = post_ln(x.astype(jnp.float32) + attn, ln1_s_ref[l], ln1_b_ref[l])

        qy, ry = _quant_rows(y)
        h1 = gelu_tanh(_dot_i8(qy, ry, w1_ref[l], s1_ref[l]) + b1_ref[l])
        qh, rh = _quant_rows(h1)
        h2 = _dot_i8(qh, rh, w2_ref[l], s2_ref[l]) + b2_ref[l]

        x = post_ln(y + h2, ln2_s_ref[l], ln2_b_ref[l]).astype(jnp.bfloat16)
    out_ref[:] = x.reshape(g, s, d)


def fused_encoder_stack_int8(
    x: jnp.ndarray, stacked: tuple, num_heads: int = 4,
    interpret: bool | None = None, group: int | None = None,
) -> jnp.ndarray:
    """The whole encoder stack (all layers) as one Pallas program.
    x [B, S, D] bf16 -> [B, S, D] bf16; stacked = 16 arrays with leading [L]."""
    if interpret is None:
        interpret = _default_interpret()
    b, s, d = x.shape
    num_layers = stacked[0].shape[0]
    if group is None:
        group = next(gr for gr in (8, 4, 2, 1) if b % gr == 0)
    f = stacked[8].shape[-1]

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((group, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ]
    in_specs += [full(a.shape) for a in stacked]

    flops = num_layers * (2 * s * d * (4 * d + 2 * f) + 4 * s * s * d)
    return pl.pallas_call(
        partial(_mega_kernel_int8, num_heads=num_heads, num_layers=num_layers),
        grid=(b // group,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (group, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * flops,
            bytes_accessed=2 * b * s * d * 2 + num_layers * (4 * d * d + 2 * d * f),
            transcendentals=num_layers * b * s * (f + s * num_heads),
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), *stacked)


def _quant_cols(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f32 [K, N] -> (int8 [K, N], f32 col scales [N])."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12)
    q = jnp.clip(jnp.round(w * (127.0 / amax)), -127.0, 127.0).astype(jnp.int8)
    return q, amax * (1.0 / 127.0)


def prepare_layer_int8(layer: dict) -> tuple:
    """Quantize one flax encoder-layer scope for the int8 kernel (call once,
    outside the sampling scan)."""
    d = layer["LayerNorm_0"]["scale"].shape[-1]
    attn = layer["MultiHeadDotProductAttention_0"]
    wqkv, bqkv = fuse_qkv(attn, d)
    f32 = lambda a: a.astype(jnp.float32)
    wqkv_q, sqkv = _quant_cols(wqkv)
    wo_q, so = _quant_cols(attn["out"]["kernel"].reshape(d, d))
    w1_q, s1 = _quant_cols(layer["Dense_0"]["kernel"])
    w2_q, s2 = _quant_cols(layer["Dense_1"]["kernel"])
    return (
        wqkv_q, sqkv, bqkv,
        wo_q, so, f32(attn["out"]["bias"]),
        f32(layer["LayerNorm_0"]["scale"]), f32(layer["LayerNorm_0"]["bias"]),
        w1_q, s1, f32(layer["Dense_0"]["bias"]),
        w2_q, s2, f32(layer["Dense_1"]["bias"]),
        f32(layer["LayerNorm_1"]["scale"]), f32(layer["LayerNorm_1"]["bias"]),
    )


def fused_encoder_layer_int8(
    x: jnp.ndarray, prepared: tuple, num_heads: int = 4,
    interpret: bool | None = None, group: int | None = None,
    qattn: bool = False,
) -> jnp.ndarray:
    """One fused int8 encoder layer. x [B, S, D] bf16 -> [B, S, D] bf16.

    qattn=True additionally quantizes the attention GEMMs (attention_int8)."""
    if interpret is None:
        interpret = _default_interpret()
    b, s, d = x.shape
    if group is None:
        group = next(gr for gr in (8, 4, 2, 1) if b % gr == 0)
    f = prepared[8].shape[-1]

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((group, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ]
    in_specs += [full(a.shape) for a in prepared]

    flops = 2 * s * d * (4 * d + 2 * f) + 4 * s * s * d
    return pl.pallas_call(
        partial(_layer_kernel_int8, num_heads=num_heads, qattn=qattn),
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
            bytes_accessed=2 * b * s * d * 2 + 4 * d * d + 2 * d * f,
            transcendentals=b * s * (f + s * num_heads),
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), *prepared)


def prepare_posenet_int8(
    params: dict, num_layers: int = 8, max_len: int = 5000, mega: bool = False,
    qattn: bool = False,
):
    """One-time quantization of a PoseNet param tree for the int8 path.
    Embedding/head/timestep params stay f32 (tiny GEMMs).

    mega=True stacks all layers' weights with a leading [L] dim so
    posenet_apply_prepared runs the whole stack as ONE Pallas program
    (fused_encoder_stack_int8). Measured on v5e it is throughput-neutral
    (1023 vs 1030 steps/s — Mosaic already overlaps the per-layer HBM
    round-trips with compute across grid iterations), so the per-layer
    kernels (mega=False) stay the production default."""
    p = params["params"]
    layers = tuple(prepare_layer_int8(p[f"layer_{i}"]) for i in range(num_layers))
    if mega:
        layer_entry = {"layers_stacked": tuple(
            jnp.stack([lay[i] for lay in layers]) for i in range(len(layers[0]))
        )}
    elif qattn:
        # structural marker (pytree-safe under jit): posenet_apply_prepared
        # dispatches on the key name, enabling attention_int8 in the kernel
        layer_entry = {"layers_qattn": layers}
    else:
        layer_entry = {"layers": layers}
    return {**layer_entry, **posenet_prep_tail(params, max_len)}
