"""Custom-VJP fused PoseNet encoder layer for TRAINING (fwd + bwd Pallas).

The inference kernels (transformer_layer_bf16/int8) are forward-only; under
``jax.grad`` the training step falls back to flax/XLA, which runs the
fwd+bwd of the 8-layer stack at ~37% of bf16 peak (13.0 ms of the 16.4 ms
bs=64 step on v5e). This module gives the encoder layer a hand-written
backward so training too runs through VMEM-resident fused kernels:

- ``jax.custom_vjp`` around one encoder layer (reference model/posenet.py:63-69
  semantics: post-LN, exact-erf gelu, dropout on attention probs + after the
  out-projection + after gelu + after the second dense).
- Dropout masks are generated OUTSIDE the kernel from an rbg key (counter-based
  bits are ~free on TPU, and the masks regenerate bit-identically in the
  backward pass from the same seed — nothing is stored between fwd and bwd
  except the layer input).
- Backward is full-recompute (flash-attention-style): the bwd kernel re-runs
  the forward internals in VMEM, then computes input + parameter gradients.
  Parameter gradients are accumulated across the sequence-group grid inside
  the kernel (constant output block, ``@pl.when(i == 0)`` init).
- GEMM operands run in bf16 (MXU rate) or f32 via the ``dtype`` knob;
  accumulation, softmax, LayerNorm and residuals are always f32. bf16 is the
  throughput mode; f32 exists for tight grad-parity testing vs flax.

Parity: tests/test_ops_train.py checks fwd outputs and ALL gradients against
a pure-JAX mirror using identical masks, and against flax at p=0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rohm_tpu.ops.kernel_common import LN_EPS
from rohm_tpu.ops.transformer_layer import _default_interpret

_SQRT_2 = 1.4142135623730951
_INV_SQRT_2PI = 0.3989422804014327


def _erf(x):
    """erf via the Abramowitz–Stegun 7.1.26 rational approximation (max abs
    error 1.5e-7) — jax.lax.erf has no Pallas TPU lowering; exp does."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_erf(x):
    """erf gelu — matches flax nn.gelu(approximate=False), which the flax
    PoseNet layer uses (models/blocks.py:177), to ~1.5e-7."""
    return 0.5 * x * (1.0 + _erf(x / _SQRT_2))


def _gelu_erf_grad(x):
    return 0.5 * (1.0 + _erf(x / _SQRT_2)) + x * _INV_SQRT_2PI * jnp.exp(
        -0.5 * x * x
    )


def _ln_fwd(r, gamma, beta):
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean(r * r, axis=-1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + LN_EPS)
    norm = (r - mu) * rstd
    return norm * gamma + beta, norm, rstd


def _ln_bwd(dy, norm, rstd, gamma):
    """d(loss)/d(r) for y = norm(r)*gamma+beta; also per-row gamma/beta grads."""
    gdy = dy * gamma
    m1 = jnp.mean(gdy, axis=-1, keepdims=True)
    m2 = jnp.mean(gdy * norm, axis=-1, keepdims=True)
    dr = (gdy - m1 - norm * m2) * rstd
    return dr, dy * norm, dy


def _forward_body(x, params, masks, *, num_heads, inv_keep, gemm_dtype, keep):
    """Shared fwd recompute (runs inside both kernels). x [R, D] f32 where
    R = G*S rows. Weight MATRICES arrive pre-cast to the GEMM dtype (casting
    them in-kernel would repeat the cast every grid iteration — measured ~5 ms
    of pure weight-cast VPU work per step at bs=64); biases/LN params are f32.
    keep=False (forward pass) retains nothing, so VMEM liveness stays minimal;
    keep=True (backward recompute) returns every intermediate the grads need.
    """
    (wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2, b2, g2, be2) = params
    mask_p, mask_o, mask_h, mask_f = masks  # 0/1, pre-sliced to the group
    r_rows, d = x.shape
    g = mask_p.shape[0]
    s = r_rows // g
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)

    c = lambda a: a.astype(gemm_dtype)
    qkv = jax.lax.dot_general(
        c(x), wqkv, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv
    q, k, v = qkv[:, :d], qkv[:, d : 2 * d], qkv[:, 2 * d :]

    # per-(sequence, head) attention with probs-dropout; static loops (g*H<=32)
    probs_d = []  # (p, pd) pairs, retained only when keep=True (bwd: dv/dpd)
    seq_outs = []
    for gi in range(g):
        r = slice(gi * s, (gi + 1) * s)
        head_outs = []
        for h in range(num_heads):
            col = slice(h * dh, (h + 1) * dh)
            scores = jax.lax.dot_general(
                c(q[r, col]), c(k[r, col]), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            p = jax.nn.softmax(scores, axis=-1)
            pd = p * (mask_p[gi, h].astype(jnp.float32) * inv_keep)
            if keep:
                probs_d.append((p, pd))
            head_outs.append(
                jax.lax.dot_general(
                    c(pd), c(v[r, col]), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        seq_outs.append(jnp.concatenate(head_outs, axis=-1))
    attn = jnp.concatenate(seq_outs, axis=0)  # [R, D] f32

    o = jax.lax.dot_general(
        c(attn), wo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + bo
    od = o * (mask_o.astype(jnp.float32) * inv_keep)
    r1 = x + od
    y1, norm1, rstd1 = _ln_fwd(r1, g1, be1)

    h1 = jax.lax.dot_general(
        c(y1), w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1
    gl = _gelu_erf(h1)
    gld = gl * (mask_h.astype(jnp.float32) * inv_keep)
    ff = jax.lax.dot_general(
        c(gld), w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b2
    ffd = ff * (mask_f.astype(jnp.float32) * inv_keep)
    r2 = y1 + ffd
    y, norm2, rstd2 = _ln_fwd(r2, g2, be2)

    if not keep:
        return dict(y=y)
    return dict(
        qkv=qkv, probs_d=probs_d, attn=attn, y1=y1, norm1=norm1, rstd1=rstd1,
        h1=h1, gld=gld, norm2=norm2, rstd2=rstd2, y=y,
    )


def _fwd_kernel(x_ref, *refs, num_heads, inv_keep, gemm_dtype):
    params = tuple(r[:] for r in refs[:12])
    mask_refs = refs[12:16]
    y_ref = refs[16]
    g, s, d = x_ref.shape
    x = x_ref[:].reshape(g * s, d).astype(jnp.float32)
    masks = (
        mask_refs[0][:],
        mask_refs[1][:].reshape(g * s, -1),
        mask_refs[2][:].reshape(g * s, -1),
        mask_refs[3][:].reshape(g * s, -1),
    )
    inter = _forward_body(
        x, params, masks, num_heads=num_heads, inv_keep=inv_keep,
        gemm_dtype=gemm_dtype, keep=False,
    )
    y_ref[:] = inter["y"].reshape(g, s, d)


def _bwd_kernel(x_ref, dy_ref, *refs, num_heads, inv_keep, gemm_dtype):
    params = tuple(r[:] for r in refs[:12])
    mask_refs = refs[12:16]
    out_refs = refs[16:]  # dx + 12 param grads
    dx_ref = out_refs[0]
    grad_refs = out_refs[1:]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for gr in grad_refs:
            gr[:] = jnp.zeros_like(gr)

    (wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2, b2, g2, be2) = params
    g, s, d = x_ref.shape
    f = w1.shape[-1]
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)
    rows = g * s

    x = x_ref[:].reshape(rows, d).astype(jnp.float32)
    dy = dy_ref[:].reshape(rows, d).astype(jnp.float32)
    mask_p = mask_refs[0][:]
    mask_o = mask_refs[1][:].reshape(rows, -1).astype(jnp.float32)
    mask_h = mask_refs[2][:].reshape(rows, -1).astype(jnp.float32)
    mask_f = mask_refs[3][:].reshape(rows, -1).astype(jnp.float32)

    inter = _forward_body(
        x, params, (mask_p, mask_o, mask_h, mask_f),
        num_heads=num_heads, inv_keep=inv_keep, gemm_dtype=gemm_dtype, keep=True,
    )
    qkv = inter["qkv"]
    q, k, v = qkv[:, :d], qkv[:, d : 2 * d], qkv[:, 2 * d :]
    c = lambda a: a.astype(gemm_dtype)

    # ---- LN2 backward
    dr2, dg2_rows, dbe2_rows = _ln_bwd(dy, inter["norm2"], inter["rstd2"], g2)
    dy1 = dr2
    df = dr2 * mask_f * inv_keep  # grad into ff (pre-dropout)

    # ---- second dense
    dw2 = jax.lax.dot_general(
        c(inter["gld"]), c(df), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2 = jnp.sum(df, axis=0)
    dgld = jax.lax.dot_general(
        c(df), c(w2), (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dgl = dgld * mask_h * inv_keep
    dh1 = dgl * _gelu_erf_grad(inter["h1"])

    # ---- first dense
    dw1 = jax.lax.dot_general(
        c(inter["y1"]), c(dh1), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1 = jnp.sum(dh1, axis=0)
    dy1 = dy1 + jax.lax.dot_general(
        c(dh1), c(w1), (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    # ---- LN1 backward
    dr1, dg1_rows, dbe1_rows = _ln_bwd(dy1, inter["norm1"], inter["rstd1"], g1)
    dx = dr1
    do = dr1 * mask_o * inv_keep

    # ---- out projection
    dwo = jax.lax.dot_general(
        c(inter["attn"]), c(do), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbo = jnp.sum(do, axis=0)
    dattn = jax.lax.dot_general(
        c(do), c(wo), (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    # ---- attention backward (per sequence, per head; recomputed probs)
    dq_blocks, dk_blocks, dv_blocks = [], [], []
    idx = 0
    for gi in range(g):
        r = slice(gi * s, (gi + 1) * s)
        dq_heads, dk_heads, dv_heads = [], [], []
        for h in range(num_heads):
            col = slice(h * dh, (h + 1) * dh)
            p, pd = inter["probs_d"][idx]
            idx += 1
            da = dattn[r, col]
            dpd = jax.lax.dot_general(
                c(da), c(v[r, col]), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dv_heads.append(
                jax.lax.dot_general(
                    c(pd), c(da), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
            dp = dpd * (mask_p[gi, h].astype(jnp.float32) * inv_keep)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds = ds * scale
            dq_heads.append(
                jax.lax.dot_general(
                    c(ds), c(k[r, col]), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
            dk_heads.append(
                jax.lax.dot_general(
                    c(ds), c(q[r, col]), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        dq_blocks.append(jnp.concatenate(dq_heads, axis=-1))
        dk_blocks.append(jnp.concatenate(dk_heads, axis=-1))
        dv_blocks.append(jnp.concatenate(dv_heads, axis=-1))
    dq = jnp.concatenate(dq_blocks, axis=0)
    dk = jnp.concatenate(dk_blocks, axis=0)
    dv = jnp.concatenate(dv_blocks, axis=0)
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)  # [R, 3D]

    # ---- qkv projection
    dwqkv = jax.lax.dot_general(
        c(x), c(dqkv), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbqkv = jnp.sum(dqkv, axis=0)
    dx = dx + jax.lax.dot_general(
        c(dqkv), c(wqkv), (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    dx_ref[:] = dx.reshape(g, s, d)

    contribs = (
        dwqkv, dbqkv.reshape(1, -1), dwo, dbo.reshape(1, -1),
        jnp.sum(dg1_rows, axis=0).reshape(1, -1), jnp.sum(dbe1_rows, axis=0).reshape(1, -1),
        dw1, db1.reshape(1, -1), dw2, db2.reshape(1, -1),
        jnp.sum(dg2_rows, axis=0).reshape(1, -1), jnp.sum(dbe2_rows, axis=0).reshape(1, -1),
    )
    for gr, contrib in zip(grad_refs, contribs):
        gr[:] = gr[:] + contrib


def _pick_group(b: int) -> int:
    return next(gr for gr in (8, 4, 2, 1) if b % gr == 0)


def gen_dropout_masks(seed: jnp.ndarray, b: int, s: int, d: int, f: int,
                      num_heads: int, p: float) -> tuple:
    """int8 keep-masks for one layer from raw rbg key data (uint32 [4]).

    Outside-kernel rbg bits are ~free on TPU and regenerate bit-identically in
    the backward from the same seed, so masks are never stored. The TPU Pallas
    in-kernel PRNG is unavailable in interpret mode (bits come back all-zero),
    which would silently disable dropout in CPU tests — external masks keep
    CPU/TPU behavior identical."""
    key = jax.random.wrap_key_data(seed, impl="rbg")
    kp, ko, kh, kf = jax.random.split(key, 4)
    keep = 1.0 - p
    mk = lambda k, shape: jax.random.bernoulli(k, keep, shape).astype(jnp.int8)
    return (
        mk(kp, (b, num_heads, s, s)),
        mk(ko, (b, s, d)),
        mk(kh, (b, s, f)),
        mk(kf, (b, s, d)),
    )


def _grad_shapes(d: int, f: int):
    return (
        jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),
        jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),
        jax.ShapeDtypeStruct((d, d), jnp.float32),
        jax.ShapeDtypeStruct((1, d), jnp.float32),
        jax.ShapeDtypeStruct((1, d), jnp.float32),
        jax.ShapeDtypeStruct((1, d), jnp.float32),
        jax.ShapeDtypeStruct((d, f), jnp.float32),
        jax.ShapeDtypeStruct((1, f), jnp.float32),
        jax.ShapeDtypeStruct((f, d), jnp.float32),
        jax.ShapeDtypeStruct((1, d), jnp.float32),
        jax.ShapeDtypeStruct((1, d), jnp.float32),
        jax.ShapeDtypeStruct((1, d), jnp.float32),
    )


def _mask_specs(g: int, s: int, d: int, f: int, num_heads: int):
    return [
        pl.BlockSpec((g, num_heads, s, s), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((g, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((g, s, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((g, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]


def _full(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)


# cfg = (num_heads, dropout_p, gemm_dtype_name, interpret) — hashable statics
@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _layer_train(cfg, x, wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2, b2, g2, be2, seed):
    y, _ = _layer_train_fwd(
        cfg, x, wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2, b2, g2, be2, seed
    )
    return y


def _cast_weight_mats(params, gemm_dtype):
    """Weight MATRICES to the GEMM dtype once, OUTSIDE the kernel (an
    in-kernel cast would repeat per grid iteration); biases/LN stay f32."""
    wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2, b2, g2, be2 = params
    cw = lambda a: a.astype(gemm_dtype)
    return (cw(wqkv), bqkv, cw(wo), bo, g1, be1, cw(w1), b1, cw(w2), b2, g2, be2)


def _layer_train_fwd(cfg, x, *args):
    num_heads, p, dtype_name, interpret = cfg
    params, seed = args[:12], args[12]
    gemm_dtype = jnp.dtype(dtype_name)
    b, s, d = x.shape
    f = params[6].shape[-1]
    g = _pick_group(b)
    inv_keep = 1.0 / (1.0 - p) if p > 0 else 1.0
    masks = gen_dropout_masks(seed, b, s, d, f, num_heads, p)
    kparams = _cast_weight_mats(params, gemm_dtype)

    grp = pl.BlockSpec((g, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [grp] + [_full(a.shape) for a in kparams] + _mask_specs(g, s, d, f, num_heads)
    y = pl.pallas_call(
        partial(_fwd_kernel, num_heads=num_heads, inv_keep=inv_keep,
                gemm_dtype=gemm_dtype),
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=grp,
        out_shape=jax.ShapeDtypeStruct((b, s, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(x.astype(jnp.float32), *kparams, *masks)
    return y, (x, *params, seed)


def _layer_train_bwd(cfg, res, dy):
    num_heads, p, dtype_name, interpret = cfg
    x, *rest = res
    params, seed = tuple(rest[:12]), rest[12]
    gemm_dtype = jnp.dtype(dtype_name)
    b, s, d = x.shape
    f = params[6].shape[-1]
    g = _pick_group(b)
    inv_keep = 1.0 / (1.0 - p) if p > 0 else 1.0
    masks = gen_dropout_masks(seed, b, s, d, f, num_heads, p)
    kparams = _cast_weight_mats(params, gemm_dtype)

    grp = pl.BlockSpec((g, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    in_specs = (
        [grp, grp] + [_full(a.shape) for a in kparams]
        + _mask_specs(g, s, d, f, num_heads)
    )
    out_shapes = [jax.ShapeDtypeStruct((b, s, d), jnp.float32)] + list(_grad_shapes(d, f))
    out_specs = [grp] + [_full(sh.shape) for sh in _grad_shapes(d, f)]
    outs = pl.pallas_call(
        partial(_bwd_kernel, num_heads=num_heads, inv_keep=inv_keep,
                gemm_dtype=gemm_dtype),
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(x.astype(jnp.float32), dy.astype(jnp.float32), *kparams, *masks)

    dx = outs[0]
    gws = outs[1:]
    # vector grads were accumulated as [1, N]
    dwqkv, dbqkv, dwo, dbo, dg1, dbe1, dw1, db1, dw2, db2, dg2, dbe2 = gws
    squeeze = lambda a: a.reshape(a.shape[-1])
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return (
        dx, dwqkv, squeeze(dbqkv), dwo, squeeze(dbo), squeeze(dg1), squeeze(dbe1),
        dw1, squeeze(db1), dw2, squeeze(db2), squeeze(dg2), squeeze(dbe2), dseed,
    )


_layer_train.defvjp(_layer_train_fwd, _layer_train_bwd)


def fused_train_layer(
    layer: dict, x: jnp.ndarray, seed: jnp.ndarray, num_heads: int = 4,
    dropout_p: float = 0.1, dtype=jnp.bfloat16, interpret: bool | None = None,
) -> jnp.ndarray:
    """One trainable fused encoder layer on a flax layer scope dict.

    x [B, S, D] f32 -> [B, S, D] f32. seed: raw rbg key data (uint32 [4])
    for this layer's dropout masks. Differentiable wrt x and every leaf of
    `layer` (the q/k/v fusion below is plain traced ops, so autodiff splits
    the fused gradients back onto the flax leaves).
    """
    if interpret is None:
        interpret = _default_interpret()
    d = layer["LayerNorm_0"]["scale"].shape[-1]
    attn = layer["MultiHeadDotProductAttention_0"]
    wqkv = jnp.concatenate(
        [
            attn["query"]["kernel"].reshape(d, d),
            attn["key"]["kernel"].reshape(d, d),
            attn["value"]["kernel"].reshape(d, d),
        ],
        axis=-1,
    ).astype(jnp.float32)
    bqkv = jnp.concatenate(
        [
            attn["query"]["bias"].reshape(d),
            attn["key"]["bias"].reshape(d),
            attn["value"]["bias"].reshape(d),
        ]
    ).astype(jnp.float32)
    cfg = (num_heads, float(dropout_p), jnp.dtype(dtype).name, bool(interpret))
    return _layer_train(
        cfg, x, wqkv, bqkv,
        attn["out"]["kernel"].reshape(d, d).astype(jnp.float32),
        attn["out"]["bias"].astype(jnp.float32),
        layer["LayerNorm_0"]["scale"].astype(jnp.float32),
        layer["LayerNorm_0"]["bias"].astype(jnp.float32),
        layer["Dense_0"]["kernel"].astype(jnp.float32),
        layer["Dense_0"]["bias"].astype(jnp.float32),
        layer["Dense_1"]["kernel"].astype(jnp.float32),
        layer["Dense_1"]["bias"].astype(jnp.float32),
        layer["LayerNorm_1"]["scale"].astype(jnp.float32),
        layer["LayerNorm_1"]["bias"].astype(jnp.float32),
        seed,
    )


def reference_layer(layer: dict, x: jnp.ndarray, masks: tuple,
                    num_heads: int = 4, dropout_p: float = 0.1) -> jnp.ndarray:
    """Pure-JAX mirror of the fused layer using EXTERNALLY provided masks —
    the test oracle for fwd/grad parity (tests/test_ops_train.py). Follows
    the flax TransformerEncoderLayer composition (models/blocks.py:154-181)
    with f32 math throughout."""
    d = layer["LayerNorm_0"]["scale"].shape[-1]
    attn_p = layer["MultiHeadDotProductAttention_0"]
    b, s, _ = x.shape
    dh = d // num_heads
    inv_keep = 1.0 / (1.0 - dropout_p) if dropout_p > 0 else 1.0
    mask_p, mask_o, mask_h, mask_f = [m.astype(jnp.float32) for m in masks]

    q = (x @ attn_p["query"]["kernel"].reshape(d, d) + attn_p["query"]["bias"].reshape(d))
    k = (x @ attn_p["key"]["kernel"].reshape(d, d) + attn_p["key"]["bias"].reshape(d))
    v = (x @ attn_p["value"]["kernel"].reshape(d, d) + attn_p["value"]["bias"].reshape(d))
    qh = q.reshape(b, s, num_heads, dh)
    kh = k.reshape(b, s, num_heads, dh)
    vh = v.reshape(b, s, num_heads, dh)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / (dh ** 0.5)
    p = jax.nn.softmax(scores, axis=-1)
    pd = p * mask_p * inv_keep
    ah = jnp.einsum("bhqk,bkhd->bqhd", pd, vh).reshape(b, s, d)
    o = ah @ attn_p["out"]["kernel"].reshape(d, d) + attn_p["out"]["bias"]
    o = o * mask_o * inv_keep

    def ln(r, scope):
        mu = jnp.mean(r, -1, keepdims=True)
        var = jnp.mean((r - mu) ** 2, -1, keepdims=True)
        return (r - mu) / jnp.sqrt(var + LN_EPS) * scope["scale"] + scope["bias"]

    y1 = ln(x + o, layer["LayerNorm_0"])
    h = y1 @ layer["Dense_0"]["kernel"] + layer["Dense_0"]["bias"]
    # exact erf here (the kernel uses a 1.5e-7 approximation) — keeps the
    # oracle independent of the kernel's transcendental implementation
    h = (0.5 * h * (1.0 + jax.lax.erf(h / _SQRT_2))) * mask_h * inv_keep
    h = h @ layer["Dense_1"]["kernel"] + layer["Dense_1"]["bias"]
    h = h * mask_f * inv_keep
    return ln(y1 + h, layer["LayerNorm_1"])


def posenet_apply_train(
    params: dict, x_t: jnp.ndarray, cond: jnp.ndarray, t: jnp.ndarray,
    dropout_key: jax.Array, num_layers: int = 8, num_heads: int = 4,
    max_len: int = 5000, traj_feat_dim: int = 22, dropout_p: float = 0.1,
    dtype=jnp.bfloat16, interpret: bool | None = None,
) -> jnp.ndarray:
    """PoseNet TRAINING forward on the flax param tree, encoder layers running
    through the custom-VJP fused kernels. Same contract as
    PoseNet.apply(..., train=True, rngs={'dropout': key}); dropout_key must be
    an rbg-impl PRNG key (train/steps.py _rbg_dropout_key).
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

    keys = jax.random.split(dropout_key, num_layers + 1)
    if dropout_p > 0:
        keep = jax.random.bernoulli(keys[0], 1.0 - dropout_p, seq.shape)
        seq = jnp.where(keep, seq / (1.0 - dropout_p), 0.0)

    for i in range(num_layers):
        seed = jax.random.key_data(keys[i + 1])
        seq = fused_train_layer(
            p[f"layer_{i}"], seq, seed, num_heads=num_heads,
            dropout_p=dropout_p, dtype=dtype, interpret=interpret,
        )

    out = seq[:, 1:] @ p["output_process"]["kernel"] + p["output_process"]["bias"]
    return jnp.concatenate([cond[..., :traj_feat_dim], out], axis=-1)
