"""int8 vs int8qa (quantized-attention) full sampling chain on TPU.

Same shape as bench.py (PoseNet 512d x 8L, bs=32, T=143, 1000-step scan).
Prints steps/s for both prepared modes so the faster one can become the
bench.py headline mode.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from rohm_tpu.utils import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from rohm_tpu.diffusion import make_schedule, p_sample_loop
from rohm_tpu.models import PoseNet
from rohm_tpu.ops import embed_cond, posenet_apply_prepared, prepare_posenet_int8

BATCH, T, STEPS = 32, 143, 1000
x = jnp.zeros((BATCH, T, 294), jnp.float32)
cond = jnp.zeros((BATCH, T, 294), jnp.float32)
sched = make_schedule("cosine", STEPS)
model = PoseNet()
params = jax.jit(model.init)(jax.random.PRNGKey(0), x, cond, jnp.zeros((BATCH,), jnp.int32))

for tag, kw in [("int8", {}), ("int8qa", {"qattn": True})]:
    prep = prepare_posenet_int8(params, **kw)
    cond_emb = embed_cond(prep, cond)

    @jax.jit
    def sample(key, prep=prep, cond_emb=cond_emb):
        return p_sample_loop(
            lambda xt, t: posenet_apply_prepared(prep, xt, cond, t, cond_emb=cond_emb),
            sched, (BATCH, T, 294), key)

    t0 = time.perf_counter(); sample(jax.random.key(1, impl="rbg")).block_until_ready()
    print(f"[{tag}] compile+1st {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(3):
        sample(jax.random.key(2 + i, impl="rbg")).block_until_ready()
    print(f"[{tag}] {STEPS/((time.perf_counter()-t0)/3):.1f} steps/s", flush=True)
