"""Ablate the TrajNet train step (bs=64): where do the 11.4 ms go?

Components timed separately, each as its own jitted program on the TPU:
  full        q_sample -> U-Net fwd -> SMPL-X-in-loop losses -> bwd -> AdamW
  model_fb    U-Net fwd+bwd only (loss = mean(out^2))
  model_fwd   U-Net fwd only
  losses_fb   trajnet_losses fwd+bwd wrt a dummy model-output array
  adam        optimizer update alone

Run variants with --dtype=bfloat16 to measure the bf16 conv path (VERDICT r3:
bf16 regressed due to layout casts around the f32 GroupNorm).
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
from rohm_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rohm_tpu.body import synthetic_model  # noqa: E402
from rohm_tpu.diffusion import make_schedule, q_sample  # noqa: E402
from rohm_tpu.models import TrajNet  # noqa: E402
from rohm_tpu.models.losses import trajnet_losses  # noqa: E402
from rohm_tpu.train import create_train_state, make_trajnet_train_step  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--dtype", default="float32")
ap.add_argument("--bs", type=int, default=64)
ap.add_argument("--conv_impl", default="native", choices=["native", "im2col"])
args = ap.parse_args()

if args.conv_impl != "native":
    from rohm_tpu.models import blocks

    blocks.DEFAULT_CONV_IMPL = args.conv_impl

B, T = args.bs, 144
dt = jnp.dtype(args.dtype)
body = synthetic_model(num_verts=64)
mean, std = jnp.zeros(294), jnp.ones(294)
key = jax.random.PRNGKey(0)
W = {"weight_loss_root_rec_repr": 1.0, "weight_loss_root_pos_global": 100.0,
     "weight_loss_root_vel_global": 1000.0, "weight_loss_root_smplx_transl_vel": 1000.0,
     "weight_loss_root_smplx_rot_vel": 1.0, "weight_loss_root_rot_vel_from_abs_traj": 1.0}

model = TrajNet(traj_feat_dim=13, cond_dim=13, dtype=dt)
params = jax.jit(model.init)(key, jnp.zeros((1, T, 13)), jnp.zeros((1, T, 13)),
                             jnp.zeros(1, jnp.int32))
sched = make_schedule("cosine", 100)
clean = jax.random.normal(key, (B, T, 294)) * 0.3
cond = clean[..., :13]
batch = {"motion_repr_clean": clean, "cond": cond}
t = jax.random.randint(key, (B,), 0, 100)
x_t = q_sample(sched, clean[..., :13], t, jax.random.normal(key, (B, T, 13)))


def bench(tag, fn, *a, n=20):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    dtms = (time.perf_counter() - t0) / n * 1e3
    print(f"[{tag:10s}] {dtms:7.2f} ms", flush=True)
    return dtms


# full step (donated state: give it its OWN param copy — donation would
# delete the original `params` buffers the other benches still use — and
# thread the returned state through the loop)
state = create_train_state(jax.tree.map(jnp.copy, params), lr=1e-4)
step = make_trajnet_train_step(model, sched, mean, std, body, W)
state, _ = step(state, batch, key)
jax.block_until_ready(state.params)
t0 = time.perf_counter()
N = 20
for _ in range(N):
    state, _ = step(state, batch, key)
jax.block_until_ready(state.params)
print(f"[{'full':10s}] {(time.perf_counter() - t0) / N * 1e3:7.2f} ms", flush=True)

# model fwd+bwd
@jax.jit
def model_fb(params):
    def loss(p):
        out = model.apply(p, x_t, cond, t)
        return jnp.mean(out**2)
    return jax.grad(loss)(params)


bench("model_fb", model_fb, params)

# model fwd only
@jax.jit
def model_fwd(params):
    return model.apply(params, x_t, cond, t)


bench("model_fwd", model_fwd, params)

# losses fwd+bwd wrt the model output
out0 = model_fwd(params)


@jax.jit
def losses_fb(out):
    def loss(o):
        return trajnet_losses(o, clean, mean, std, body, W)["loss"]
    return jax.grad(loss)(out)


bench("losses_fb", losses_fb, out0)

# optimizer update alone
@jax.jit
def adam(state, grads):
    return state.apply_gradients(grads).params


g0 = model_fb(params)
bench("adam", adam, state, g0)
