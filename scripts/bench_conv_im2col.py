"""Can an im2col-matmul Conv1d dodge XLA's slow bf16 conv BACKWARD on v5e?

Round-3/4 negative result (BASELINE.md): the bf16 TrajNet U-Net loses on
the train step because XLA's bf16 conv backward picks a ~2.3x slower path
than f32's at these small-channel NWC shapes (fwd wins, bwd loses). A
k-tap Conv1d is a [B*T, k*C] x [k*C, F] matmul after an im2col unfold,
whose backward is two plain matmuls — the op class XLA/Mosaic handles
best in bf16. This script measures fwd and fwd+bwd of both formulations
at every (C -> F, T) shape the TrajNet U-Net (mid=512, bs=64) actually
runs, in f32 and bf16.

Run on the TPU (no other TPU process may be active):
    python scripts/bench_conv_im2col.py [--bs 64]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
from rohm_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--bs", type=int, default=64)
ap.add_argument("--k", type=int, default=5)
args = ap.parse_args()

# (C_in -> C_out, T) pairs of the TrajNet mid=512 U-Net at bs=64 (each
# ResidualTemporalBlock runs two k=5 SAME convs at its level's T)
SHAPES = [
    (13, 64, 144), (64, 64, 144),       # enc level 0
    (64, 128, 72), (128, 128, 72),      # enc level 1
    (128, 256, 36), (256, 256, 36),     # enc level 2
    (256, 512, 18), (512, 512, 18),     # mid
    (768, 256, 36), (256, 256, 36),     # dec level 2 (skip concat)
    (384, 128, 72), (128, 128, 72),     # dec level 1
    (192, 64, 144), (64, 64, 144),      # dec level 0
]


class ConvNative(nn.Module):
    features: int
    k: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.k,), padding="SAME", dtype=self.dtype)(x)


class ConvIm2col(nn.Module):
    """Conv1d(k, SAME) as unfold + one dense matmul (bias folded in)."""
    features: int
    k: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.k * C, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        lo = (self.k - 1) // 2
        xp = jnp.pad(x, ((0, 0), (lo, self.k - 1 - lo), (0, 0)))
        cols = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(xp, i, T, axis=1) for i in range(self.k)],
            axis=-1,
        )  # [B, T, k*C]
        y = cols.astype(self.dtype) @ w.astype(self.dtype)
        return (y + b.astype(self.dtype)).astype(self.dtype)


def bench(fn, *a, n=30):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


key = jax.random.PRNGKey(0)
print(f"backend={jax.default_backend()} bs={args.bs} k={args.k}", flush=True)
totals = {}
for dt_name in ("float32", "bfloat16"):
    dt = jnp.dtype(dt_name)
    for Mod, tag in ((ConvNative, "native"), (ConvIm2col, "im2col")):
        tot_f = tot_fb = 0.0
        for cin, cout, T in SHAPES:
            x = jax.random.normal(key, (args.bs, T, cin), jnp.float32)
            m = Mod(cout, args.k, dt)
            p = jax.jit(m.init)(key, x)

            fwd = jax.jit(lambda p, x, m=m: m.apply(p, x))

            @jax.jit
            def fb(p, x, m=m):
                return jax.grad(lambda q: jnp.sum(m.apply(q, x).astype(jnp.float32) ** 2))(p)

            tot_f += bench(fwd, p, x)
            tot_fb += bench(fb, p, x)
        totals[(dt_name, tag)] = (tot_f, tot_fb)
        print(f"[{dt_name:8s} {tag}] U-Net conv total: fwd {tot_f:6.2f} ms  "
              f"fwd+bwd {tot_fb:6.2f} ms", flush=True)

f32n = totals[("float32", "native")][1]
bf16i = totals[("bfloat16", "im2col")][1]
print(f"\nbf16-im2col fwd+bwd vs f32-native: {f32n / max(bf16i, 1e-9):.2f}x", flush=True)
