import sys, time
sys.path.insert(0, "/root/repo")
from rohm_tpu.utils import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from rohm_tpu.diffusion import make_schedule, p_sample_loop
from rohm_tpu.models import PoseNet
from rohm_tpu.ops import posenet_apply_fused
BATCH, T, STEPS = 32, 143, 1000
x = jnp.zeros((BATCH, T, 294), jnp.float32)
cond = jnp.zeros((BATCH, T, 294), jnp.float32)
sched = make_schedule("cosine", STEPS)
model = PoseNet()
params = jax.jit(model.init)(jax.random.PRNGKey(0), x, cond, jnp.zeros((BATCH,), jnp.int32))

@jax.jit
def sample_fused(key):
    return p_sample_loop(
        lambda xt, t: posenet_apply_fused(params, xt, cond, t),
        sched, (BATCH, T, 294), key)

t0=time.perf_counter(); sample_fused(jax.random.PRNGKey(1)).block_until_ready()
print("fused compile+1st %.1fs" % (time.perf_counter()-t0), flush=True)
t0=time.perf_counter()
for i in range(3): sample_fused(jax.random.PRNGKey(2+i)).block_until_ready()
print("fused", round(STEPS/((time.perf_counter()-t0)/3),1), "steps/s", flush=True)
