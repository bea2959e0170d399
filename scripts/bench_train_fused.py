"""Fused custom-VJP training layer vs flax: fwd+bwd and full-step timing.

Production shape: PoseNet 512d x 8L, bs=64, T=144 (S=145 tokens) on v5e.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from rohm_tpu.utils import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from rohm_tpu.models import PoseNet
from rohm_tpu.ops.transformer_layer_train import posenet_apply_train

B, T = 64, 144

def timeit(tag, fn, *a, n=20):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    print(f"[{tag}] {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)

key = jax.random.PRNGKey(0)
x_t = jnp.zeros((B, T, 294)); cond = jnp.zeros((B, T, 294)); t = jnp.zeros((B,), jnp.int32)
rbg_key = jax.random.key(1, impl="rbg")

for dtype_name, dtype in [("bf16", jnp.bfloat16), ("f32", jnp.float32)]:
    m = PoseNet(dtype=dtype if dtype_name == "bf16" else jnp.float32)
    p = jax.jit(m.init)(key, x_t[:1], cond[:1], t[:1])

    def fb_flax(params):
        def loss(pp):
            out = m.apply(pp, x_t, cond, t, train=True, rngs={"dropout": rbg_key})
            return jnp.mean(out ** 2)
        return jax.grad(loss)(params)

    def fb_fused(params):
        def loss(pp):
            out = posenet_apply_train(pp, x_t, cond, t, rbg_key, dtype=dtype)
            return jnp.mean(out ** 2)
        return jax.grad(loss)(params)

    timeit(f"flax fwd+bwd {dtype_name}", jax.jit(fb_flax), p)
    timeit(f"fused fwd+bwd {dtype_name}", jax.jit(fb_fused), p)

    fwd = jax.jit(lambda pp: posenet_apply_train(pp, x_t, cond, t, rbg_key, dtype=dtype))
    timeit(f"fused fwd only {dtype_name}", fwd, p)
