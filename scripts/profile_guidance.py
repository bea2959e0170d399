import sys, time
sys.path.insert(0, "/root/repo")
from rohm_tpu.utils import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from rohm_tpu.body import synthetic_model
from rohm_tpu.models.guidance import skating_loss_fn
B, T = 32, 143
body = synthetic_model(num_verts=64)
mean, std = jnp.zeros(294), jnp.ones(294)
x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 294))

g = jax.jit(jax.grad(lambda xx: skating_loss_fn(xx, mean, std, body)))
t0=time.perf_counter(); g(x).block_until_ready()
print("guidance grad compile %.1fs" % (time.perf_counter()-t0), flush=True)
t0=time.perf_counter()
for _ in range(20): g(x).block_until_ready()
print("guidance grad per call: %.2f ms" % ((time.perf_counter()-t0)/20*1e3), flush=True)

from rohm_tpu.reprs import recover_from_repr, split_repr
f_fk = jax.jit(lambda xx: recover_from_repr(split_repr(xx), mode="smplx_params", body_model=body).sum())
gfk = jax.jit(jax.grad(f_fk))
gfk(x).block_until_ready()
t0=time.perf_counter()
for _ in range(20): gfk(x).block_until_ready()
print("smpl decode grad per call: %.2f ms" % ((time.perf_counter()-t0)/20*1e3), flush=True)
