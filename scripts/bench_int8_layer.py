"""Microbench: where does the int8 fused layer's time go?

Times a 1000-iteration lax.scan of the per-layer int8 Pallas kernel at the
production shape ([8, 144, 512], heads=4, ff=1024) and of ablated variants
(attention stubbed, softmax stubbed, dynamic quantization replaced by a fixed
scale, gelu replaced by identity) to attribute the ~125 us/layer.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from rohm_tpu.utils import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rohm_tpu.ops.kernel_common import LN_EPS
from rohm_tpu.ops.transformer_layer_int8 import (
    _dot_i8, _quant_rows, prepare_layer_int8,
)

G, S, D, H, F = 8, 144, 512, 4, 1024


def make_kernel(no_attn=False, no_softmax=False, fixed_quant=False, no_gelu=False):
    def quant(x):
        if fixed_quant:
            xf = x.astype(jnp.float32)
            q = jnp.clip(jnp.round(xf * 8.0), -127.0, 127.0).astype(jnp.int8)
            return q, jnp.full((xf.shape[0], 1), 1.0 / 8.0, jnp.float32)
        return _quant_rows(x)

    def kernel(x_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
               ln1_s_ref, ln1_b_ref, w1_ref, s1_ref, b1_ref,
               w2_ref, s2_ref, b2_ref, ln2_s_ref, ln2_b_ref, out_ref,
               *, num_heads):
        g, s, d = x_ref.shape
        dh = d // num_heads
        rows = g * s
        x = x_ref[:].reshape(rows, d)
        qx, rs = quant(x)
        qkv = (_dot_i8(qx, rs, wqkv_ref[:], sqkv_ref[:]) + bqkv_ref[:]).astype(jnp.bfloat16)
        q = qkv[:, :d]; k = qkv[:, d:2*d]; v = qkv[:, 2*d:]
        if no_attn:
            attn_in = q
        else:
            seq_outs = []
            for gi in range(g):
                r = slice(gi * s, (gi + 1) * s)
                head_outs = []
                for h in range(num_heads):
                    c = slice(h * dh, (h + 1) * dh)
                    scores = jax.lax.dot_general(
                        q[r, c], k[r, c],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if no_softmax:
                        probs = (scores * 0.01).astype(jnp.bfloat16)
                    else:
                        probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
                    head_outs.append(
                        jnp.dot(probs, v[r, c], preferred_element_type=jnp.float32)
                        .astype(jnp.bfloat16))
                seq_outs.append(jnp.concatenate(head_outs, axis=-1))
            attn_in = jnp.concatenate(seq_outs, axis=0)
        qa, ra = quant(attn_in)
        attn = _dot_i8(qa, ra, wo_ref[:], so_ref[:]) + bo_ref[:]
        y = x.astype(jnp.float32) + attn
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(y * y, axis=-1, keepdims=True) - mu * mu
        y = (y - mu) * jax.lax.rsqrt(var + LN_EPS) * ln1_s_ref[:] + ln1_b_ref[:]
        qy, ry = quant(y)
        h1 = _dot_i8(qy, ry, w1_ref[:], s1_ref[:]) + b1_ref[:]
        if not no_gelu:
            h1 = 0.5 * h1 * (1.0 + jnp.tanh(0.7978845608028654 * (h1 + 0.044715 * h1 * h1 * h1)))
        qh, rh = quant(h1)
        h2 = _dot_i8(qh, rh, w2_ref[:], s2_ref[:]) + b2_ref[:]
        z = y + h2
        mu = jnp.mean(z, axis=-1, keepdims=True)
        var = jnp.mean(z * z, axis=-1, keepdims=True) - mu * mu
        out = (z - mu) * jax.lax.rsqrt(var + LN_EPS) * ln2_s_ref[:] + ln2_b_ref[:]
        out_ref[:] = out.astype(jnp.bfloat16).reshape(g, s, d)
    return kernel


def run_variant(name, prepared, x, **kw):
    kern = make_kernel(**kw)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((G, S, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
    in_specs += [full(a.shape) for a in prepared]

    def layer(xx):
        return pl.pallas_call(
            partial(kern, num_heads=H),
            grid=(1,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((G, S, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, S, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=False,
        )(xx, *prepared)

    @jax.jit
    def chain(x0):
        def body(c, _):
            return layer(c), ()
        out, _ = jax.lax.scan(body, x0, None, length=1000)
        return out

    chain(x).block_until_ready()
    t0 = time.perf_counter()
    r = chain(x).block_until_ready()
    dt = time.perf_counter() - t0
    print(f"{name:28s} {dt*1e6/1000:8.1f} us/layer", flush=True)
    return dt


from rohm_tpu.ops.transformer_layer_int8 import _quant_cols

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 4)
wqkv_q, sqkv = _quant_cols(jax.random.normal(ks[0], (D, 3 * D)) * 0.02)
wo_q, so = _quant_cols(jax.random.normal(ks[1], (D, D)) * 0.02)
w1_q, s1 = _quant_cols(jax.random.normal(ks[2], (D, F)) * 0.02)
w2_q, s2 = _quant_cols(jax.random.normal(ks[3], (F, D)) * 0.02)
prepared = (
    wqkv_q, sqkv, jnp.zeros(3 * D, jnp.float32),
    wo_q, so, jnp.zeros(D, jnp.float32),
    jnp.ones(D, jnp.float32), jnp.zeros(D, jnp.float32),
    w1_q, s1, jnp.zeros(F, jnp.float32),
    w2_q, s2, jnp.zeros(D, jnp.float32),
    jnp.ones(D, jnp.float32), jnp.zeros(D, jnp.float32),
)

x = (jax.random.normal(jax.random.PRNGKey(1), (G, S, D)) * 0.5).astype(jnp.bfloat16)

run_variant("full", prepared, x)
run_variant("no_attention", prepared, x, no_attn=True)
run_variant("no_softmax", prepared, x, no_softmax=True)
run_variant("fixed_quant", prepared, x, fixed_quant=True)
run_variant("no_gelu", prepared, x, no_gelu=True)
run_variant("no_attn+fixed_quant", prepared, x, no_attn=True, fixed_quant=True)
run_variant("bare_gemms", prepared, x, no_attn=True, fixed_quant=True, no_gelu=True)
