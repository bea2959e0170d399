"""Probe: is the int8 GEMM floor row-count physics or a design artifact?

Round-4 state: the isolated int8 fused layer spends 48.7 us in its bare
GEMMs at 1152 rows (8-seq group x 144 tokens) vs ~12 us MXU-ideal at the
v5e's 394 int8 TOPS (~25% MXU utilization), and BASELINE.md asserts the gap
is row-count/DMA physics. The round-4 verdict demanded a falsifiable probe
before "design ceiling" becomes final: measure the SAME bare GEMM chain at
2x and 4x the row count inside the kernel (16-/32-seq grouping, same VMEM
budget structure) — if us/row drops materially with more rows, the layer
should regroup its GEMMs; if it is flat, the floor is pinned by physics.

The kernel is the int8 layer's GEMM skeleton only (dynamic row quant +
W8A8 qkv/attn-out/ff1/ff2 matmuls, int32 accumulate, rescale) with
attention/softmax/LN stripped — exactly the 48.7 us ablation of
scripts/bench_int8_layer.py, parameterized by group size.

Usage: python scripts/bench_int8_gemm_rows.py   (needs the TPU)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from rohm_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from functools import partial  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from rohm_tpu.ops.transformer_layer_int8 import (  # noqa: E402
    _dot_i8,
    _quant_cols,
    _quant_rows,
)

S, D, F = 144, 512, 1024
ITERS = 1000


def gemm_kernel(x_ref, wqkv_ref, sqkv_ref, wo_ref, so_ref,
                w1_ref, s1_ref, w2_ref, s2_ref, out_ref):
    g, s, d = x_ref.shape
    rows = g * s
    x = x_ref[:].reshape(rows, d)
    qx, rs = _quant_rows(x)
    qkv = _dot_i8(qx, rs, wqkv_ref[:], sqkv_ref[:]).astype(jnp.bfloat16)
    q = qkv[:, :d]  # attention replaced by a passthrough of q (the ablation)
    qa, ra = _quant_rows(q)
    o = _dot_i8(qa, ra, wo_ref[:], so_ref[:]).astype(jnp.bfloat16)
    qh, rh = _quant_rows(o)
    h = _dot_i8(qh, rh, w1_ref[:], s1_ref[:]).astype(jnp.bfloat16)
    qg, rg = _quant_rows(h)
    y = _dot_i8(qg, rg, w2_ref[:], s2_ref[:]).astype(jnp.bfloat16)
    out_ref[:] = y.reshape(g, s, d)


def build(group: int, b: int):
    rng = np.random.default_rng(0)
    wqkv, sqkv = _quant_cols(jnp.asarray(rng.normal(size=(D, 3 * D)), jnp.float32))
    wo, so = _quant_cols(jnp.asarray(rng.normal(size=(D, D)), jnp.float32))
    w1, s1 = _quant_cols(jnp.asarray(rng.normal(size=(D, F)), jnp.float32))
    w2, s2 = _quant_cols(jnp.asarray(rng.normal(size=(F, D)), jnp.float32))
    x = jnp.asarray(rng.normal(size=(b, S, D)), jnp.bfloat16)

    vmem = partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    rep = lambda shape: vmem(shape, lambda i: tuple(0 for _ in shape))  # noqa: E731
    call = pl.pallas_call(
        gemm_kernel,
        grid=(b // group,),
        in_specs=[
            vmem((group, S, D), lambda i: (i, 0, 0)),
            rep(wqkv.shape), rep(sqkv.shape), rep(wo.shape), rep(so.shape),
            rep(w1.shape), rep(s1.shape), rep(w2.shape), rep(s2.shape),
        ],
        out_specs=vmem((group, S, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, S, D), jnp.bfloat16),
    )

    @jax.jit
    def run(x):
        def body(c, _):
            return call(c, wqkv, sqkv, wo, so, w1, s1, w2, s2), None

        y, _ = jax.lax.scan(body, x, None, length=ITERS)
        return y

    return run, x


def main():
    print(f"backend={jax.default_backend()}")
    macs_per_row = D * 3 * D + D * D + D * F + F * D
    ideal_us_per_group = {}
    results = {}
    for group in (4, 8, 16, 32):
        # one group per call (grid=1): measures the isolated-group GEMM time
        # exactly like the 48.7 us round-4 ablation, and keeps the scan
        # carry small enough that XLA's VMEM carry placement cannot OOM
        # (a [64,144,512] bf16 carry + output hit the 16 MB scoped limit)
        b = group
        run, x = build(group, b)
        run(x).block_until_ready()  # compile
        t0 = time.perf_counter()
        run(x).block_until_ready()
        dt = time.perf_counter() - t0
        per_call = dt / ITERS
        rows = group * S
        per_group = per_call  # grid=1: one group per call
        ops = 2 * rows * macs_per_row
        ideal = ops / 394e12
        ideal_us_per_group[group] = ideal * 1e6
        mfu = ideal / per_group
        results[group] = (per_group * 1e6, per_call * 1e6, mfu)
        print(
            f"group={group:2d} rows={rows:5d}: {per_group * 1e6:7.1f} us/group "
            f"| ideal {ideal * 1e6:5.1f} us "
            f"| MFU {mfu:6.1%} | {per_group / rows * 1e9:6.1f} ns/row"
        )
    g8, g16 = results[8], results[16]
    verdict = (
        "REGROUP WINS — larger GEMM rows materially beat group=8; "
        "the layer should regroup its GEMMs"
        if g16[2] > 1.15 * g8[2]
        else "FLOOR PINNED — us/row is flat with row count; the 25% GEMM MFU "
        "at 1152 rows is row-count/DMA physics of this shape, not a "
        "grouping artifact"
    )
    print(verdict)


if __name__ == "__main__":
    main()
